package graft

import org.apache.spark.sql.functions._
import graft.engine.Profile

/** Edge behavior of the table profiler beyond the m07 oracle. */
class ProfileSuite extends SparkSuite {
  import spark.implicits._

  test("all-null and empty-string columns profile without error") {
    val df = Seq(
      (1L, Option.empty[String], ""),
      (2L, Option.empty[String], "x"),
      (3L, Option.empty[String], ""))
      .toDF("id", "dead", "s")
    val p = Profile.profile(df, Seq("id", "dead", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("dead").getLong(1) == 3L) // n_nulls
    assert(p("dead").getLong(2) == 0L) // distinct ignores nulls
    assert(p("dead").isNullAt(3) && p("dead").isNullAt(4))
    assert(p("s").getLong(1) == 0L && p("s").getLong(2) == 2L)
    assert(p("id").getDouble(3) == 1.0 && p("id").getDouble(4) == 3.0)
  }

  test("profiling an empty table yields zero counts, null extremes") {
    val df = spark.range(0).select(col("id"))
    val p = Profile.profile(df, Seq("id")).collect()
    assert(p.length == 1)
    assert(p.head.getLong(1) == 0L && p.head.getLong(2) == 0L)
    assert(p.head.isNullAt(3) && p.head.isNullAt(4))
  }
}
