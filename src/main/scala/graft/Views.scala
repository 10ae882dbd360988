package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface entry point: registers every test table as a temp view
  * and installs the graft SQL functions, so the whole engine is usable
  * from `spark.sql(...)` alone — `SELECT graft_dot(a.embedding,
  * b.embedding) FROM embeddings a JOIN ...` works with no DataFrame
  * code. Views are session-scoped temp views over the parquet scans, so
  * every query keeps pushdown/pruning. */
object Views {
  def register(spark: SparkSession, sfDir: String): Unit = {
    GraftExtensions.install(spark)
    Tables.all.foreach { t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
  }
}
