package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Invariants of the greedy sequence-packing operator. */
class PackingSuite extends SparkSuite {
  import spark.implicits._

  private val cap = 100L

  private lazy val docs = Seq.tabulate(400) { i =>
    (i.toLong, (i * 37 % 160 + 1).toLong) // tok in [1, 160], some oversize
  }.toDF("doc_id", "tok")

  private lazy val packed =
    TextOps.packSequences(docs, "doc_id", "tok", buckets = 4, capacity = cap)

  test("every doc is assigned exactly once") {
    assert(packed.count() === 400)
    assert(packed.select("doc_id").distinct().count() === 400)
  }

  test("no sequence exceeds capacity unless it is a single oversize doc") {
    val bad = packed.groupBy("bucket", "seq_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
      .where(col("fill") > cap && col("n") > 1)
    assert(bad.count() === 0)
  }

  test("greedy is tight: consecutive sequences cannot merge") {
    // for each bucket, the first doc of sequence k+1 must NOT fit into
    // sequence k's remaining budget (otherwise greedy would have kept it)
    val fills = packed.groupBy("bucket", "seq_id")
      .agg(sum("n_tokens").as("fill")).as[(Long, Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3))
    val heads = packed.orderBy("bucket", "seq_id", "doc_id")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._2, r._3)).view.mapValues(_.minBy(_._1)._4)
    for {
      (bucket, fs) <- fills
      k <- fs.indices.dropRight(1)
    } {
      val nextHead = heads((bucket, k + 1L))
      assert(fs(k) + nextHead > cap,
        s"bucket $bucket seq $k fill ${fs(k)} could absorb next head $nextHead")
    }
  }

  test("assignment is repartition-invariant (deterministic)") {
    val again = TextOps
      .packSequences(docs.repartition(13), "doc_id", "tok", 4, cap)
    assert(packed.exceptAll(again).count() === 0)
    assert(again.exceptAll(packed).count() === 0)
  }

  test("empty input packs to an empty result, not an error") {
    val empty = docs.where(col("doc_id") < 0)
    assert(TextOps.packSequences(empty, "doc_id", "tok", 4, cap).count() === 0)
  }

  test("a single bucket still packs every doc (degenerate sharding)") {
    val one = TextOps.packSequences(docs, "doc_id", "tok", buckets = 1, capacity = cap)
    assert(one.count() === 400)
    assert(one.select("bucket").distinct().count() === 1)
  }

  test("oversize docs land alone in their own sequence") {
    val oversizeSeqs = packed.where(col("n_tokens") > cap)
      .select("bucket", "seq_id")
    val members = packed.join(oversizeSeqs, Seq("bucket", "seq_id"))
      .groupBy("bucket", "seq_id").agg(count(lit(1)).as("n"))
    assert(members.where(col("n") > 1).count() === 0)
  }
}
