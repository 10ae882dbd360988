package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALING.md: explain-string size and plan-copy
  * cost of the d22 scoring projection with a production-sized 2^27-bit
  * bloom bitmap, literal form vs broadcast form. */
object PlanSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val words = new Array[Long]((1 << 27) / 64) // 2^27 bits = 2M longs
    java.util.Arrays.fill(words, 0x5a5a5a5a5a5a5a5aL)

    def measure(label: String,
        mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = mk()
      val planStr = df.queryExecution.optimizedPlan.toString
      val t1 = System.nanoTime()
      val c0 = System.nanoTime()
      var i = 0
      while (i < 5) { df.queryExecution.optimizedPlan.canonicalized; i += 1 }
      val c1 = System.nanoTime()
      println(f"$label: optimizedPlan string = ${planStr.length}%,d chars, " +
        f"analyze+tostring = ${(t1 - t0) / 1e6}%.0f ms, " +
        f"5x canonicalize = ${(c1 - c0) / 1e6}%.0f ms")
    }

    import graft.functions.{BloomBroadcastTextHits, BloomTextHits, TextOps}
    measure("literal (r13 form)", () => docs
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 4).as("__sh"))
      .select(col("doc_id"),
        BloomTextHits.column(spark, typedlit(words.toSeq), col("__sh"), 5)))
    val bc = spark.sparkContext.broadcast(words)
    measure("broadcast (r14 form)", () => docs
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 4).as("__sh"))
      .select(col("doc_id"),
        org.apache.spark.sql.GraftSqlBridge.column(
          BloomBroadcastTextHits(
            org.apache.spark.sql.GraftSqlBridge.expression(col("__sh")), bc, 5))))
    spark.stop()
  }
}
