package graft

import org.apache.spark.sql.functions._
import graft.tools.ScaleUpData

/** The two fidelity claims SCALING.md's sf1.0 replica leans on, pinned:
  * the per-copy embedding sign-flip is an EXACT intra-copy isometry
  * (dedup/ANN structure bit-preserved) that scatters cross-copy
  * cosines, and the per-copy name tag preserves intra-copy edit
  * distances exactly while keeping cross-copy pairs out of the
  * edit-distance-1 join. */
class ScaleUpSuite extends SparkSuite {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .where(col("vec_id") < 60)

  /** All pairwise double-dot-products of `vc` against itself, keyed. */
  private def pairDots(vc: String, df: org.apache.spark.sql.DataFrame) = {
    val a = df.select(col("vec_id").as("ia"), col(vc).as("va"))
    val b = df.select(col("vec_id").as("ib"), col(vc).as("vb"))
    a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"), expr(
        "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * y)," +
          " 0D, (acc, v) -> acc + v)").as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
  }

  test("signFlip preserves every intra-copy dot product bit-exactly") {
    val plain = emb.select(col("vec_id"), col("embedding"))
    val flipped = emb.select(col("vec_id"),
      ScaleUpData.signFlip("embedding", 3).as("embedding"))
    val before = pairDots("embedding", plain)
    val after = pairDots("embedding", flipped)
    assert(before.nonEmpty && before.size == after.size)
    // EXACT equality, not a tolerance: (-a)*(-b) = a*b in IEEE floats,
    // term by term, so the whole geometry the dedup/ANN operators see
    // is unchanged down to the last bit
    before.foreach { case (k, d) =>
      assert(after(k) == d, s"pair $k dot changed: $d -> ${after(k)}")
    }
  }

  test("signFlip scatters cross-copy cosines away from the near-dup band") {
    val cos = emb.select(col("vec_id"), col("embedding").as("a"),
        ScaleUpData.signFlip("embedding", 1).as("b"))
      .select(expr(
        """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y),
             0D, (acc, v) -> acc + v) /
           (sqrt(aggregate(a, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * x)) *
            sqrt(aggregate(b, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * x)))
        """).as("cos"))
      .collect().map(_.getDouble(0))
    // every vector vs its own other-copy image: nothing may remain in
    // the near-dup band a semantic-dedup threshold would catch
    assert(cos.nonEmpty && cos.forall(c => math.abs(c) < 0.9),
      s"cross-copy cosine too high: ${cos.map(math.abs).max}")
  }

  test("nameTag preserves intra-copy edit distances and separates copies") {
    import spark.implicits._
    val names = Seq("Customer#0001", "Customer#0002", "Custoner#0001",
      "Supplier#77", "Supplier#78").toDF("n")
    val pairs = names.select(col("n").as("a"))
      .crossJoin(names.select(col("n").as("b"))).where(col("a") < col("b"))
    val checked = pairs.select(
      levenshtein(col("a"), col("b")).as("plain"),
      levenshtein(ScaleUpData.nameTag("a", 4), ScaleUpData.nameTag("b", 4))
        .as("tagged"),
      levenshtein(ScaleUpData.nameTag("a", 1), ScaleUpData.nameTag("a", 2))
        .as("cross")).collect()
    checked.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"same-copy tag changed an edit distance: ${r.getInt(0)} -> ${r.getInt(1)}")
      assert(r.getInt(2) >= 2,
        s"cross-copy tags of the SAME name within the d07 threshold: ${r.getInt(2)}")
    }
  }
}
