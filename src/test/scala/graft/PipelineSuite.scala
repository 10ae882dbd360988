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
}
