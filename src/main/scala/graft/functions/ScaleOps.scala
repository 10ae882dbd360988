package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioning strategies for the shapes that break at 100 TB: skewed
  * join keys and repeated co-located joins.
  */
object ScaleOps {

  /** Salted equi-join for a skewed fact side: the fact's rows get a
    * deterministic salt in [0, saltFactor), the dimension side is
    * replicated saltFactor ways, and the join key becomes (key, salt) —
    * one hot key's rows now land on saltFactor reducers instead of one.
    *
    * AQE's skew-join splitting handles moderate skew automatically; this
    * is for the pathological case (a single key holding a double-digit
    * percentage of the table) where even one split is too large, at the
    * cost of replicating the dimension. Salt is derived from xxhash64 of
    * the whole row, so it is deterministic across retries (a rand()
    * salt breaks task-retry idempotence). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val expanded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(expanded, Seq(key, "__salt")).drop("__salt")
  }

  /** Writes `df` as a bucketed+sorted catalog table: joins and
    * aggregations on `key` between tables bucketed the same way need no
    * shuffle (verified in ScaleOpsSuite by asserting the join plan has
    * zero Exchange nodes). This is the persisted-layout half of the
    * co-location story; `repartition` is the transient half. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True when the physical plan contains no shuffle exchange — the
    * property bucketed/co-partitioned plans are built to achieve. */
  def shuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
