package graft

import org.apache.spark.sql.functions._

class PipelineSuite extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("corpus pipeline output is a subset of the raw corpus stats") {
    val out = SparkEntry.queries("p01_corpus_pipeline")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val rawDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_._2).sum < rawDocs, "pipeline must drop something")
    assert(out.map(_._2).sum > rawDocs / 2, "pipeline dropped too much")
  }

  test("approx_count_distinct stays within the configured error bound") {
    val joined = SparkEntry.queries("p02_approx_distinct")(spark, sf)
      .join(
        Tables(spark, sf, "lineitem").groupBy("l_returnflag")
          .agg(countDistinct(col("l_orderkey")).as("exact")),
        "l_returnflag")
      .select(col("approx_orders"), col("exact"))
      .as[(Long, Long)].collect()
    joined.foreach { case (approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"approx=$approx exact=$exact err=$err")
    }
  }

  test("approx quantiles land within a 2% rank window of the exact percentiles") {
    // GK with accuracy=10000 guarantees rank error <= 1/10000; verify the
    // far looser 2%-rank envelope so the test pins behavior, not internals
    val bounds = Tables(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.48, 0.52, 0.93, 0.97, 0.97, 1.0))")
        .as("b"))
      .select(col("l_returnflag"), col("b"))
      .as[(String, Seq[Double])].collect().toMap
    val approx = SparkEntry.queries("p05_approx_quantiles")(spark, sf)
      .select(col("l_returnflag"), col("p50"), col("p95"), col("p99"))
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (flag, p50, p95, p99) =>
      val b = bounds(flag)
      assert(p50 >= b(0) && p50 <= b(1), s"$flag p50=$p50 outside [${b(0)},${b(1)}]")
      assert(p95 >= b(2) && p95 <= b(3), s"$flag p95=$p95 outside [${b(2)},${b(3)}]")
      assert(p99 >= b(4) && p99 <= b(5), s"$flag p99=$p99 outside [${b(4)},${b(5)}]")
    }
  }

  test("p21: z-order layout skips on BOTH dims; single-column sort cannot") {
    // the reason Z-ordering exists: a suppkey-range query must scan
    // every partkey-sorted bucket, but prunes most z-order buckets;
    // a partkey-range query prunes well on both layouts.
    val rows = SparkEntry.queries("p21_zorder_skipping")(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
      .map { case (layout, query, total, scanned, nr) =>
        (layout, query) -> (total, scanned, nr)
      }.toMap
    val (pTot, pScan, _) = rows(("partsort", "supp_low"))
    assert(pScan == pTot,
      s"partkey-sorted layout should scan ALL buckets for a suppkey query ($pScan/$pTot)")
    // at sf0.001 the suppkey domain is 0..9, so the [2,5) box covers
    // ~30% of all rows — a perfect layout could not scan less than
    // that; pin "skips at least half" plus "3x fewer than the
    // partkey-sorted layout's full scan"
    val (zTot, zScan, _) = rows(("zorder", "supp_low"))
    assert(zScan * 2 <= zTot,
      s"z-order should skip >= 50% of buckets for the suppkey query ($zScan/$zTot)")
    assert(zScan * 3 <= pScan,
      s"z-order should scan >= 3x fewer buckets than partkey sort ($zScan vs $pScan)")
    val (zTot2, zScan2, _) = rows(("zorder", "part_mid"))
    assert(zScan2 * 2 <= zTot2,
      s"z-order should still skip >= 50% for the partkey query ($zScan2/$zTot2)")
    val (sTot2, sScan2, _) = rows(("partsort", "part_mid"))
    assert(sScan2 * 2 <= sTot2,
      s"partkey sort should skip its own dimension ($sScan2/$sTot2)")
  }

  test("p23: KMV estimates land near the true distinct counts (k=128, ~9% std)") {
    // sf0.01 has 150 users per event type — ABOVE k, so the estimator
    // (not the exact small-set path) is under test; both types cover
    // all users, so union == view == click and jaccard == 1.
    val got = SparkEntry.queries("p23_kmv_distinct")(spark, "/root/testdata/sf0.01")
      .as[(String, Long)].collect().toMap
    val truth = 150.0
    for (m <- Seq("distinct_view", "distinct_click", "distinct_union",
        "distinct_intersection")) {
      val e = got(m).toDouble
      assert(math.abs(e - truth) / truth <= 0.25,
        s"$m estimate ${got(m)} too far from $truth")
    }
    assert(math.abs(got("jaccard6") - 1000000L) <= 150000L,
      s"jaccard6 ${got("jaccard6")} should be ~1e6 (identical user sets)")
  }
}
