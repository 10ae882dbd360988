package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events loader must accept every `ts` layout the driver's testdata
  * generator has shipped: TIMESTAMP(NANOS) (arrives as LongType under
  * `nanosAsLong`) and plain timestamp[us] (arrives as TIMESTAMP_NTZ).
  * Round 7 regressed 19 queries because the loader assumed nanos forever.
  */
class TablesSuite extends SparkSuite {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tables_").toString

  test("events loader accepts plain TIMESTAMP_NTZ ts (current testdata)") {
    val dir = tmpDir()
    Seq(("u1", "click", "2024-01-01 00:00:01.500000"),
        ("u2", "view",  "2024-01-01 00:00:02.250000"))
      .toDF("user_id", "kind", "s")
      .withColumn("ts", col("s").cast(TimestampNTZType)).drop("s")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    // UTC session: NTZ→LTZ is a pure re-tag; micros must be preserved
    val micros = df.orderBy("user_id").select(unix_micros(col("ts")))
      .as[Long].collect().toSeq
    assert(micros === Seq(1704067201500000L, 1704067202250000L))
  }

  test("events loader accepts TIMESTAMP(NANOS)-as-long ts (older testdata)") {
    val dir = tmpDir()
    // what nanosAsLong produces: the raw nano count in an int64 column
    Seq(("u1", 1704067201500000123L), ("u2", 1704067202250000987L))
      .toDF("user_id", "ts")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    // nanos truncate (not round) to micros — same as DuckDB
    val micros = df.orderBy("user_id").select(unix_micros(col("ts")))
      .as[Long].collect().toSeq
    assert(micros === Seq(1704067201500000L, 1704067202250000L))
  }

  test("events loader passes through an already-LTZ ts unchanged") {
    val dir = tmpDir()
    Seq(("u1", "2024-01-01 00:00:01.5"))
      .toDF("user_id", "s")
      .withColumn("ts", col("s").cast(TimestampType)).drop("s")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].head() ===
      1704067201500000L)
  }
}
