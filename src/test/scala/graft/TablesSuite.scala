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

  // ---- driver-testdata schema pin -----------------------------------------
  // One labeled assertion per table × scale factor, so the NEXT silent
  // testdata regeneration flips a named expectation here instead of N
  // opaque query failures (round 7 lost 19 queries to exactly that).
  // Types compared as catalogString: nullability and array-element
  // flags are reader details, not contract. events.ts is pinned to
  // "timestamp" — the LOADER's output contract — regardless of which
  // physical encoding (NANOS or timestamp[us]) the generation shipped.
  private val expectedSchemas: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"),
  )

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
       name <- Tables.all
       if new java.io.File(s"/root/testdata/$sf").isDirectory) {
    test(s"driver testdata schema pin: $sf/$name") {
      val got = Tables(spark, s"/root/testdata/$sf", name)
        .schema.fields.toSeq
        .map(f => f.name -> f.dataType.catalogString)
      assert(got == expectedSchemas(name),
        s"$sf/$name schema drifted — update the queries that consume it " +
          "(and this pin) deliberately, not via 19 opaque failures")
    }
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
