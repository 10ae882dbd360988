package graft

import graft.engine.Scd2

/** Unit pins for the SCD2 merge: the four key dispositions, null-safe
  * attr compare, and idempotence (re-merging the same snapshot is a
  * no-op on the open rows). */
class Scd2Suite extends SparkSuite {
  import spark.implicits._

  private def cur(rows: (Long, Long, String, Option[String])*) =
    rows.toDF("k", "version_from", "a", "b")
  private def inc(rows: (Long, String, Option[String])*) =
    rows.toDF("k", "a", "b")

  test("changed keys close + reopen; unchanged and departed ride; new insert") {
    val current = cur(
      (1L, 0L, "x", Some("p")),  // unchanged
      (2L, 0L, "y", Some("q")),  // changed attr a
      (3L, 0L, "z", None),       // departed (not in incoming)
      (5L, 0L, "w", None))       // null attr equal -> unchanged
    val incoming = inc(
      (1L, "x", Some("p")),
      (2L, "y2", Some("q")),
      (4L, "new", None),         // brand-new key
      (5L, "w", None))
    val out = Scd2.merge(current, incoming, "k", Seq("a", "b"), newVersion = 7L)
      .as[(Long, Long, Long, String, Option[String], Boolean)]
      .collect().sortBy(r => (r._1, r._2))

    assert(out.toSeq == Seq(
      (1L, 0L, Scd2.OpenVersion, "x", Some("p"), true),
      (2L, 0L, 7L, "y", Some("q"), false),       // closed old
      (2L, 7L, Scd2.OpenVersion, "y2", Some("q"), true), // reopened new
      (3L, 0L, Scd2.OpenVersion, "z", None, true),       // departed rides open
      (4L, 7L, Scd2.OpenVersion, "new", None, true),     // insert
      (5L, 0L, Scd2.OpenVersion, "w", None, true)))
  }

  test("re-merging the identical snapshot changes nothing (idempotence)") {
    val current = cur((1L, 0L, "x", Some("p")), (2L, 3L, "y", None))
    val snap = inc((1L, "x", Some("p")), (2L, "y", None))
    val once = Scd2.merge(current, snap, "k", Seq("a", "b"), 9L)
    val twice = Scd2.merge(
      once.where($"is_current").drop("version_to", "is_current"),
      snap, "k", Seq("a", "b"), 10L)
    assert(twice.where(!$"is_current").count() == 0L)
    assert(twice.count() == 2L)
  }

  test("null -> value and value -> null both register as changes") {
    val current = cur((1L, 0L, "x", None), (2L, 0L, "y", Some("q")))
    val incoming = inc((1L, "x", Some("now")), (2L, "y", None))
    val out = Scd2.merge(current, incoming, "k", Seq("a", "b"), 1L)
    assert(out.where(!$"is_current").count() == 2L, "both rows must close")
    assert(out.count() == 4L)
  }
}
