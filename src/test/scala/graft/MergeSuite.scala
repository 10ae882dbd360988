package graft

import org.apache.spark.sql.functions._
import graft.engine.Merge

/** MERGE INTO semantics (m12): matched update / keep / insert, schema
  * union by name, and the duplicate-source-key precondition. */
class MergeSuite extends SparkSuite {
  import spark.implicits._

  test("matched rows update, unmatched keep, new keys insert") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "seg", "bal")
    val delta = Seq((2L, "B2", 99.0), (3L, "c", 30.0)).toDF("k", "seg", "bal")
    val got = Merge.into(target, delta, "k")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0)))
  }

  test("schema union by name: columns absent on one side read as null") {
    val target = Seq((1L, "a")).toDF("k", "seg")
    val delta = Seq((2L, 5.0)).toDF("k", "score") // no seg, new score col
    val got = Merge.into(target, delta, "k")
      .select(col("k"), col("seg"), col("score"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(got == Set((1L, Some("a"), None), (2L, None, Some(5.0))))
  }

  test("intoChecked rejects duplicate source keys loudly") {
    val target = Seq((1L, "a")).toDF("k", "seg")
    val dupDelta = Seq((2L, "x"), (2L, "y")).toDF("k", "seg")
    val e = intercept[IllegalArgumentException] {
      Merge.intoChecked(target, dupDelta, "k")
    }
    assert(e.getMessage.contains("duplicated"))
  }

  test("merge of a delta with only inserts equals union") {
    val target = Seq((1L, "a")).toDF("k", "seg")
    val delta = Seq((2L, "b"), (3L, "c")).toDF("k", "seg")
    val got = Merge.into(target, delta, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("applyCdc: U upserts, D deletes, tombstone of a missing key no-ops") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "seg")
    val changes = Seq(
      (2L, "B2", "U"),  // matched update
      (3L, null, "D"),  // matched delete
      (4L, "d", "U"),   // unmatched insert
      (9L, null, "D")   // unmatched tombstone -> no-op
    ).toDF("k", "seg", "op")
    val got = Merge.applyCdc(target, changes, "k", "op")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (4L, "d")))
  }

  test("applyCdcChecked rejects unknown op codes and duplicate keys loudly") {
    val target = Seq((1L, "a")).toDF("k", "seg")
    val badOp = Seq((2L, "b", "u")).toDF("k", "seg", "op") // lowercase op
    val e1 = intercept[IllegalArgumentException] {
      Merge.applyCdcChecked(target, badOp, "k", "op")
    }
    assert(e1.getMessage.contains("op codes"))
    val dupKey = Seq((2L, "b", "U"), (2L, "c", "D")).toDF("k", "seg", "op")
    val e2 = intercept[IllegalArgumentException] {
      Merge.applyCdcChecked(target, dupKey, "k", "op")
    }
    assert(e2.getMessage.contains("duplicated"))
    val good = Seq((2L, "b", "U")).toDF("k", "seg", "op")
    assert(Merge.applyCdcChecked(target, good, "k", "op").count() == 2)
  }

  test("applyCdc with no tombstones equals plain merge") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "seg")
    val changes = Seq((2L, "B2", "U"), (3L, "c", "U")).toDF("k", "seg", "op")
    val cdc = Merge.applyCdc(target, changes, "k", "op")
      .as[(Long, String)].collect().toSet
    val plain = Merge.into(target, changes.drop("op"), "k")
      .as[(Long, String)].collect().toSet
    assert(cdc == plain)
  }
}
