package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.{PinnedHyperplaneSig, VectorOps}

/** The codegen pinned-signature kernel must be bit-identical to the
  * declarative definition it replaced: sig[b] bit k set iff
  * sum_i pinnedSign(b*bits+k, i) * code_i >= 0. */
class PinnedHyperplaneSigSuite extends SparkSuite {

  private def reference(codes: Array[Double], bits: Int,
      bands: Int): Array[Long] =
    Array.tabulate(bands) { b =>
      (0 until bits).map { k =>
        val j = b * bits + k
        val d = codes.indices.map(i =>
          VectorOps.pinnedSign(j, i) * codes(i)).sum
        if (d >= 0.0) 1L << k else 0L
      }.sum
    }

  test("kernel equals the pinnedSign declarative definition, " +
      "including the >= 0 boundary") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val dim = Seq(8, 64, 64, 3)(trial % 4)
      val codes = Array.fill(dim)((rnd.nextInt(255) - 127).toDouble)
      val got = PinnedHyperplaneSig.compute(
        new GenericArrayData(codes), bits = 8, bands = 32, dim = dim)
      val want = reference(codes, bits = 8, bands = 32)
      assert(got.toSeq == want.toSeq, s"trial $trial dim $dim")
    }
    // the >= 0 boundary: an all-zero vector has every dot == 0, so
    // every bit must be SET (>= 0, not > 0 — the oracle's rule)
    val zeros = PinnedHyperplaneSig.compute(
      new GenericArrayData(Array.fill(64)(0.0)), bits = 8, bands = 4,
      dim = 64)
    assert(zeros.forall(_ == 0xFFL), s"zero-vector sigs: ${zeros.toSeq}")
  }

  test("a vector whose length differs from the declared dim fails LOUDLY") {
    // the declarative form signed over min(vector, planes) lengths; the
    // kernel would happily derive weights for any index — but the
    // oracle's plane family is exactly dim wide, so a mismatch must be
    // an error, never silently-divergent signatures
    val e = intercept[IllegalArgumentException] {
      PinnedHyperplaneSig.compute(
        new GenericArrayData(Array.fill(128)(1.0)), bits = 8, bands = 32,
        dim = 64)
    }
    assert(e.getMessage.contains("128 elements"), e.getMessage)
    assert(e.getMessage.contains("64-wide"), e.getMessage)
  }

  test("codegen and interpreted paths agree through SQL") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 50L).map(i =>
      (i, Array.fill(64)((rnd.nextInt(255) - 127).toDouble).toSeq))
    val df = rows.toDF("id", "c")
    val viaExpr = df.select(col("id"),
        PinnedHyperplaneSig.column(spark, col("c"), 8, 32, 64).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    rows.foreach { case (id, c) =>
      assert(viaExpr(id) == reference(c.toArray, 8, 32).toSeq, s"id $id")
    }
  }

  test("two signature expressions coexist in one generated method " +
      "(freshName, no fixed local)") {
    // the fixed `long[] sigs` local would make janino reject a stage
    // evaluating two of these (or one plus a HyperplaneSig) with a
    // non-nullable child — run exactly that shape with codegen
    // fallback disabled so a redefinition fails loudly
    import spark.implicits._
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.fallback", "false")
    val df = s.createDataset(
        Seq((1L, Seq.fill(64)(1.0), Seq("a b c", "b c d"), "abcdef")))
      .toDF("id", "c", "sh", "t")
      .select(col("id"),
        PinnedHyperplaneSig.column(s, col("c"), 8, 4, 64).as("s1"),
        PinnedHyperplaneSig.column(s, col("c"), 4, 4, 64).as("s2"),
        graft.functions.HyperplaneSig.column(s, col("c"), 8, 4).as("s3"),
        graft.functions.HyperplaneSig.column(s, col("c"), 4, 4, seed = 7L)
          .as("s4"),
        // the other array-returning kernels shared the fixed-local
        // pattern — two of each must coexist in the same method too
        graft.functions.MinHashSig.column(s, col("sh"), 8).as("s5"),
        graft.functions.MinHashSig.column(s, col("sh"), 4).as("s6"),
        graft.functions.DeletionSigs.column(s, col("t")).as("s7"),
        graft.functions.DeletionSigs.column(s, concat(col("t"), lit("x")))
          .as("s8"))
    assert(df.collect().length == 1)
  }
}
