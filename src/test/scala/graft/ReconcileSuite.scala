package graft

import graft.engine.Reconcile

/** Keyed snapshot diff: classification and null-safe comparison. */
class ReconcileSuite extends SparkSuite {
  import spark.implicits._

  test("diff classifies added/removed/changed and lists differing columns") {
    val left = Seq(
      (1L, "a", Some(10.0)), (2L, "b", Some(20.0)),
      (3L, "c", None: Option[Double]), (4L, "d", Some(40.0)))
      .toDF("k", "name", "bal")
    val right = Seq(
      (1L, "a", Some(10.0)),              // same -> dropped
      (2L, "B", Some(21.0)),              // changed: name AND bal
      (3L, "c", Some(30.0)),              // changed: null -> value
      (5L, "e", Some(50.0)))              // added; 4 removed
      .toDF("k", "name", "bal")
    val out = Reconcile.diff(left, right, "k").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (2L, "changed", "name,bal"),
      (3L, "changed", "bal"),
      (4L, "removed", ""),
      (5L, "added", "")))
  }

  test("identical tables diff to empty, null keys do not collide") {
    val t = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    assert(Reconcile.diff(t, t, "k").count() == 0)
    // explicit compare-column subset
    val l = Seq((1L, "x", 5)).toDF("k", "v", "w")
    val r = Seq((1L, "x", 9)).toDF("k", "v", "w")
    assert(Reconcile.diff(l, r, "k", compareCols = Seq("v")).count() == 0)
    assert(Reconcile.diff(l, r, "k").collect().head.getString(2) == "w")
  }

  test("checksum: partitioning- and order-independent; any change flips it") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val c0 = Reconcile.checksum(base)
    // row order and partitioning must not matter
    assert(Reconcile.checksum(base.orderBy(org.apache.spark.sql.functions.col("k").desc)
      .repartition(7)) == c0)
    // column ORDER must not matter (names are canonicalized)
    assert(Reconcile.checksum(base.select("v", "k")) == c0)
    // any value change flips the checksum
    val changed = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v")
    assert(Reconcile.checksum(changed) != c0)
    // empty table is stable
    assert(Reconcile.checksum(base.where("k < 0")) == 0L)
  }
}
