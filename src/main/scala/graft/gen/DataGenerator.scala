package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic-row generator — the Spark-native form of the reference's
  * DataGenerator (test_data_generator.py:9-92): a `{column: typetag}`
  * struct with per-column defaults and string prefixes.
  *
  * Divergence (documented): the reference draws from Python's global RNG
  * (irreproducible); here every value is a pure function of
  * (seed, row id, column name) via an md5-derived hash, so generated
  * frames are deterministic, partition-count-independent, and scale
  * linearly — `spark.range(n)` distributes rows with no shuffle and no
  * driver materialization (the reference builds the full list in driver
  * memory). md5 (not xxhash64) on purpose: DuckDB computes the identical
  * digest, so the whole generator is ORACLE-EXPRESSIBLE — the m05 gate
  * replays every generated value bit-for-bit with
  * `('0x' || substr(md5(key),1,15))::BIGINT` (60 bits, safely inside a
  * signed long — the same scheme as TextOps.tokenHash64).
  *
  * Type tags (test_data_generator.py:10-21):
  *   - `text`       → 20-char uppercase-hex string (subset of the
  *                    reference's A-Z0-9 alphabet)
  *   - `int`        → uniform in [10000, 100000] (call-site defaults,
  *                    test_data_generator.py:74)
  *   - `date`       → timestamp uniform in [2000-01-01 13:30,
  *                    2017-01-01 13:30] (test_data_generator.py:88-92)
  *   - `ObjectName` → the object name as a literal column
  *                    (test_data_generator.py:55-58)
  */
object DataGenerator {

  private val DateStartSec = 946733400L  // 2000-01-01 13:30:00 UTC
  private val DateEndSec = 1483277400L   // 2017-01-01 13:30:00 UTC

  /** The per-(row, seed, column) hash key — string form so DuckDB's
    * concat_ws produces the identical bytes. */
  private def key(seed: Long, colName: String): Column =
    concat_ws("|", col("id").cast("string"), lit(seed.toString), lit(colName))

  /** Non-negative 60-bit value from the md5 of the key: 15 hex chars
    * parsed base-16 — always < 2^60, so the signed-long bit pattern and
    * DuckDB's hex-literal BIGINT cast agree exactly. */
  private def pos(seed: Long, colName: String): Column =
    conv(substring(md5(key(seed, colName)), 1, 15), 16, 10).cast("long")

  /** Uppercase pseudo-random string of `len` hex chars. */
  private def genString(seed: Long, colName: String, len: Int): Column =
    upper(substring(md5(key(seed, colName)), 1, len))

  private def genInt(seed: Long, colName: String, min: Long, max: Long): Column =
    (pos(seed, colName) % (max - min + 1) + min).cast("int")

  private def genDate(seed: Long, colName: String): Column =
    timestamp_seconds(pos(seed, colName) % (DateEndSec - DateStartSec) + DateStartSec)

  /** Generates `n` rows for `struct`; precedence per column mirrors
    * test_data_generator.py:46-80: ObjectName tag > default > prefix >
    * type tag. Column order follows `struct`. */
  def generate(
      spark: SparkSession,
      struct: Seq[(String, String)],
      defaults: Map[String, String],
      prefixes: Map[String, String],
      n: Long,
      objectName: String,
      seed: Long = 42L): DataFrame = {

    val base = spark.range(n)
    val cols: Seq[Column] = struct.map { case (name, tag) =>
      val c: Column =
        if (tag == "ObjectName") lit(objectName)
        else defaults.get(name).map(lit(_): Column).getOrElse {
          prefixes.get(name) match {
            case Some(p) => concat(lit(p), genString(seed, name, 10))
            case None => tag match {
              case "text" => genString(seed, name, 20)
              case "int" => genInt(seed, name, 10000L, 100000L)
              case "date" => genDate(seed, name)
              case other => throw new IllegalArgumentException(
                s"unknown type tag '$other' for column $name")
            }
          }
        }
      c.as(name)
    }
    base.select(cols: _*)
  }
}
