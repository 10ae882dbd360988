package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{ScaleOps, TextOps}

/** Property-based coverage of the text/layout primitives: randomized
  * inputs generated deterministically (raw ScalaCheck, seeded — the
  * scalatest bridge is not in the offline dependency set), evaluated in
  * ONE Spark job per property so the suite stays fast. */
class TextPropertiesSuite extends SparkSuite {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val messyText: Gen[String] =
    for {
      words <- Gen.listOf(Gen.oneOf("Foo", "BAR", "baz", "q", "LongerWord", ""))
      seps <- Gen.listOfN(math.max(words.size, 1), Gen.oneOf(" ", "  ", "\t", " \n "))
    } yield words.zipAll(seps, "", " ").map { case (w, s) => w + s }.mkString

  test("normalize is idempotent and kills runs of whitespace") {
    val df = samples(messyText, 300).toDF("t")
      .withColumn("n1", TextOps.normalize(col("t")))
      .withColumn("n2", TextOps.normalize(TextOps.normalize(col("t"))))
    assert(df.where(col("n1") =!= col("n2")).count() == 0)
    assert(df.where(col("n1").contains("  ") || col("n1").contains("\t"))
      .count() == 0)
  }

  test("shingle count is max(0, distinct n-grams); short docs are empty") {
    val n = 3
    val df = samples(messyText, 300).toDF("t")
      .withColumn("toks", TextOps.tokens(col("t")))
      .withColumn("sh", TextOps.shingles(col("toks"), n))
    val rows = df.select(col("toks"), col("sh"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (toks, sh) =>
      val expected = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq.distinct
      assert(sh.sorted == expected.sorted, s"toks=$toks")
    }
  }

  test("zorderKey equals the reference interleave on random longs") {
    def ref(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    val pair = for {
      a <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      b <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (a, b)
    val rows = samples(pair, 500)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ScaleOps.zorderKey(col("a"), col("b"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ref(a & 0xFFFFL, b & 0xFFFFL, 16), s"a=$a b=$b")
      assert(z >= 0 && z < (1L << 32), s"key out of range: $z")
    }
  }

  test("packSequences invariants hold on random workloads") {
    val workload = Gen.listOfN(200, Gen.chooseNum(1L, 150L))
    for (seed <- 1 to 3) {
      val toks = workload.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "tok")
      val packed = TextOps.packSequences(df, "doc_id", "tok",
        buckets = 4, capacity = 100L)
      assert(packed.count() == 200)
      val bad = packed.groupBy("bucket", "seq_id")
        .agg(sum("n_tokens").as("fill"), count(lit(1)).as("m"))
        .where(col("fill") > 100L && col("m") > 1)
      assert(bad.count() == 0, s"seed=$seed overfilled a multi-doc sequence")
    }
  }

  test("repeated-passage stats: bounds hold; a doubled corpus repeats fully") {
    val texts = samples(messyText, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val out = TextOps.repeatedPassageStats(df, "doc_id", "text", n = 3)
      .as[(Long, Long, Long)].collect()
    assert(out.length == texts.size)
    out.foreach { case (id, nw, nr) =>
      assert(nw >= 0 && nr >= 0 && nr <= nw, s"doc $id: windows=$nw rep=$nr") }
    // duplicate every doc under fresh ids: now EVERY window of every doc
    // occurs in at least 2 documents, so n_repeated == n_windows
    // everywhere (docs whose text collides already satisfied it before)
    val doubled = df.union(
      texts.map { case (i, t) => (i + 100000L, t) }.toDF("doc_id", "text"))
    val out2 = TextOps.repeatedPassageStats(doubled, "doc_id", "text", n = 3)
      .as[(Long, Long, Long)].collect()
    assert(out2.length == 2 * texts.size)
    out2.foreach { case (id, nw, nr) =>
      assert(nr == nw, s"doc $id in a doubled corpus: windows=$nw rep=$nr") }
  }
}
