package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchOps

/** Count-Min sketch: one-sided error and determinism. */
class SketchOpsSuite extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat and the dog met on the mat",
    "a completely different sentence here"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("CMS estimates are an upper bound on the true counts") {
    val out = SketchOps.cmsHeavyHitters(docs, "text", depth = 4,
      width = 64, topK = 8).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (tok, trueN, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= trueN, s"CMS must never under-count: $tok $est < $trueN")
    }
    // 'the' dominates this corpus and must rank first with its exact count
    val head = out.head
    assert(head.getString(0) == "the" && head.getLong(1) == 7L, head.toString)
  }

  test("the sketch is integer-deterministic across runs") {
    val a = SketchOps.cmsHeavyHitters(docs, "text", width = 64).collect().toSeq
    val b = SketchOps.cmsHeavyHitters(docs, "text", width = 64).collect().toSeq
    assert(a == b)
  }

  // r20 optimization pin: the sketch is built by summing the exact
  // per-token counts into cells (one corpus pass) — value-identical to
  // counting token INSTANCES per cell directly, because a cell's counter
  // is the sum of the counts of the tokens hashing into it. Replay the
  // instance-counting definition by hand and compare every top-K
  // estimate.
  test("count-derived sketch equals the instance-counted definition") {
    val depth = 4; val width = 64
    val out = SketchOps.cmsHeavyHitters(docs, "text",
      depth = depth, width = width, topK = 8).collect()
    // instance-counted reference: every token instance drops one count
    // into its (r, bucket) cell; estimate = min over rows of the cell
    val toks = docs.select(explode(
        graft.functions.TextOps.tokens(col("text"))).as("tok"))
      .collect().map(_.getString(0)).toSeq
    // every distinct token's depth bucket hashes in ONE job (the same
    // md5 scheme the operator uses)
    val buckets = toks.distinct.toDF("tok")
      .select(col("tok"), array((0 until depth).map(r =>
        graft.functions.TextOps.tokenHash64(concat(lit(s"$r:"), col("tok")))
          .bitwiseAND(width - 1)): _*).as("bs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (t <- toks; r <- 0 until depth) {
      val k = (r, buckets(t)(r))
      cells(k) = cells.getOrElse(k, 0L) + 1L
    }
    out.foreach { row =>
      val (tok, est) = (row.getString(0), row.getLong(2))
      val ref = (0 until depth).map(r => cells((r, buckets(tok)(r)))).min
      assert(est == ref,
        s"count-derived estimate for '$tok' ($est) != instance-counted ($ref)")
    }
  }

  test("explicit HLL (p10): estimates land within the m=32 error envelope") {
    val sf = "/root/testdata/sf0.01"
    val est = SparkEntry.queries("p10_hll_sketch")(spark, sf)
      .select("lang", "est_distinct").as[(String, Long)].collect().toMap
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").agg(countDistinct("doc_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet == truth.keySet)
    // raw-estimator sigma at m=32 is 1.04/sqrt(32) ~ 18.4%; 2 sigma
    // bound keeps the gate meaningful without flaking on the tails
    truth.foreach { case (lang, n) =>
      val e = est(lang)
      val rel = math.abs(e - n).toDouble / n
      assert(rel <= 0.37, s"$lang: est $e vs true $n (rel err $rel)")
    }
  }

  test("explicit HLL is partitioning-invariant (pure fold over a set)") {
    val sf = "/root/testdata/sf0.01"
    val a = SparkEntry.queries("p10_hll_sketch")(spark, sf)
      .collect().toSeq
    // registers are max-folds of per-row values: any repartitioning of
    // the input must produce the identical sketch and estimate
    val sp2 = spark.newSession()
    sp2.conf.set("spark.sql.shuffle.partitions", "3")
    val b = SparkEntry.queries("p10_hll_sketch")(sp2, sf).collect().toSeq
    assert(a == b)
  }

  test("histogram quantiles (p13): each estimate within one bin of exact") {
    val sf = "/root/testdata/sf0.01"
    val est = SparkEntry.queries("p13_histogram_quantiles")(spark, sf)
      .select("q", "est").as[(String, Double)].collect().toMap
    val xs = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_extendedprice").as[Double].collect().sorted
    val binWidth = (xs.last - xs.head) / 4096.0
    for ((lbl, q) <- Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))) {
      val exact = xs(math.min(xs.length - 1, math.ceil(q * xs.length).toInt - 1))
      assert(math.abs(est(lbl) - exact) <= binWidth,
        s"$lbl: sketch ${est(lbl)} vs exact $exact (bin $binWidth)")
    }
  }

  test("width must be a power of two") {
    intercept[IllegalArgumentException] {
      SketchOps.cmsHeavyHitters(docs, "text", width = 100)
    }
  }
}
