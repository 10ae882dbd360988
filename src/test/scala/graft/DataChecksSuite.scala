package graft

import org.apache.spark.sql.functions._
import graft.engine.DataChecks
import graft.engine.DataChecks.{NotNull, Unique, InRange, Accepted, RefIntegrity}

/** The declarative quality gate (p22): per-check semantics on a
  * hand-built table with known violations, and the one-scan shape for
  * the conditional family. */
class DataChecksSuite extends SparkSuite {
  import spark.implicits._

  private lazy val t = Seq(
    (Some(1L), Some("a"), Some(5.0)),
    (Some(1L), Some("a"), Some(500.0)), // dup key (1,a); out of range
    (Some(2L), None, Some(10.0)),       // null col2
    (Some(3L), Some("z"), Some(20.0)),  // 'z' not accepted; no ref 3
    (None, Some("b"), None)             // null col1; null value passes range
  ).toDF("k", "c", "v")

  private lazy val ref = Seq(1L, 2L).toDF("rk")

  test("each check counts exactly its violations") {
    val got = DataChecks.run(t, Seq(
        NotNull("nn", Seq("k", "c")),
        Unique("uq", Seq("k", "c")),
        InRange("rg", "v", 0, 100),
        Accepted("ac", "c", Seq("a", "b")),
        RefIntegrity("fk", "k", ref, "rk")))
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "nn" -> 2L, // null k row + null c row
      "uq" -> 1L, // one duplicated key group (1, a)
      "rg" -> 1L, // 500.0 (nulls pass)
      "ac" -> 1L, // 'z' (null passes)
      "fk" -> 1L  // k=3 absent from ref (null k passes)
    ), s"got $got")
  }

  test("clean table reports zero violations per check (coalesce paths)") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "c")
    val got = DataChecks.run(clean, Seq(
        NotNull("nn", Seq("k")),
        Unique("uq", Seq("k")),
        Accepted("ac", "c", Seq("a", "b")),
        RefIntegrity("fk", "k", ref, "rk")))
      .as[(String, Long)].collect().toMap
    assert(got.values.forall(_ == 0L), s"got $got")
  }

  test("conditional checks share ONE aggregation scan") {
    val df = DataChecks.run(t, Seq(
      NotNull("nn", Seq("k")),
      InRange("rg", "v", 0, 100),
      Accepted("ac", "c", Seq("a", "b"))))
    // three conditional checks -> one Aggregate over one scan, unioned
    // as three projections of the SAME single-row aggregate
    val scans = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case s if s.getClass.getSimpleName.contains("Relation") => s
    }
    val p = df.queryExecution.optimizedPlan.toString
    val aggCount = "Aggregate".r.findAllIn(p).size
    assert(aggCount <= 3, s"conditional family must not scan per check:\n$p")
    assert(scans.nonEmpty)
  }
}
