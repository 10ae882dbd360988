package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.streaming.Streams.rowsOfSorted

/** The persisted-IVF index lifecycle under FAILURE: the r10 ADVICE
  * found the old compaction's delete-then-rename left an unreadable
  * window and destroyed concurrent appends. The rework commits via a
  * `_consumed` manifest; these tests drive every crash window through
  * the fault-injection stop points and assert the serving view stays
  * readable AND exact at each, that recovery converges, that an append
  * landing mid-compaction survives, and that the tombstone delete path
  * serves correctly both before and after physical application. */
class IndexLifecycleSuite extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables(spark, sf, "embeddings")

  private def served(path: String): Seq[String] =
    rowsOfSorted(VectorOps.queryPinnedIvfIndex(
      spark, path, emb.where(col("vec_id") < 20), "vec_id", "embedding",
      k = 5, nprobe = 6))

  private def inPlace(corpus: org.apache.spark.sql.DataFrame): Seq[String] =
    rowsOfSorted(VectorOps.ivfTopKPinned(
      emb.where(col("vec_id") < 20), corpus, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6))

  // ids 190-199 are RESERVED for the tests' late append — freshIndex
  // never ingests them, so appending them later cannot duplicate rows
  private val reserved = col("vec_id") >= 190 && col("vec_id") < 200
  // doomed slice is disjoint from the reserved late-append range, so a
  // post-compaction append can never resurrect a tombstoned id
  private val isDoomed =
    col("vec_id") >= 100 && col("vec_id") < 190 && col("vec_id") % 5 === 2

  /** Fresh index with a batch append + a streamed batch + a pending
    * tombstone slice — every input species a compaction consumes. */
  private def freshIndex(): (String, Seq[String]) = {
    val path = java.nio.file.Files.createTempDirectory("idx_crash_").toString
    val isLate = col("vec_id") >= 200
    VectorOps.buildPinnedIvfIndex(emb.where(!isLate && !reserved),
      "vec_id", "embedding", nlist = 16, path = path)
    VectorOps.appendPinnedIvfIndex(
      emb.where(isLate && col("vec_id") % 2 === 0), "vec_id", "embedding", path)
    VectorOps.appendPinnedIvfIndexBatch(
      emb.where(isLate && col("vec_id") % 2 =!= 0), "vec_id", "embedding",
      path, 3L)
    VectorOps.deleteFromPinnedIvfIndex(emb.where(isDoomed), "vec_id", path)
    (path, inPlace(emb.where(!isDoomed && !reserved)))
  }

  test("every compaction crash window serves a readable, exact index") {
    // windows: 1 = tmp written (no manifest — uncommitted), 2 = manifest
    // written (committed, swap not started), 3 = old compacted deleted
    // (mid-swap: only the manifest-bearing tmp has the compacted rows),
    // 4 = renamed into place (inputs not yet cleaned)
    for (stopAfter <- 1 to 4) {
      val (path, expected) = freshIndex()
      // a PRIOR compaction so every window exercises the re-compaction
      // shape (old compacted dir present) — the delete-then-rename bug's
      // home turf; fresh appends keep non-compacted inputs in play
      VectorOps.compactPinnedIvfIndex(spark, path)
      VectorOps.appendPinnedIvfIndex(
        emb.where(reserved), "vec_id", "embedding", path)
      val full = inPlace(emb.where(!isDoomed))
      VectorOps.compactPinnedIvfIndexSteps(spark, path, stopAfter)
      assert(served(path) == full,
        s"index wrong or unreadable after crash window $stopAfter")
      // the NEXT compaction must repair (complete or roll back) and end
      // converged: no tmp, no manifest, answers unchanged
      VectorOps.compactPinnedIvfIndex(spark, path)
      assert(served(path) == full,
        s"recovery after crash window $stopAfter changed answers")
      val root = new java.io.File(path)
      assert(!new java.io.File(root, "assignments_by_bucket__compacting").exists(),
        s"tmp dir survived recovery after window $stopAfter")
      assert(!new java.io.File(
        new java.io.File(root, "assignments_by_bucket"), "_consumed").exists(),
        s"manifest survived recovery after window $stopAfter")
      assert(expected.nonEmpty && full.nonEmpty)
    }
  }

  test("an append landing mid-compaction survives and is served exactly once") {
    val (path, _) = freshIndex()
    // crash after the swap (window 4): the captured inputs are masked
    // but not yet deleted — the state in which the OLD code had already
    // destroyed any late append. Land one now.
    VectorOps.compactPinnedIvfIndexSteps(spark, path, stopAfter = 4)
    VectorOps.appendPinnedIvfIndex(
      emb.where(reserved), "vec_id", "embedding", path)
    val full = inPlace(emb.where(!isDoomed))
    assert(served(path) == full,
      "append landed during the cleanup window was lost or double-served")
    // recovery cleans the consumed inputs but must keep the late append
    VectorOps.compactPinnedIvfIndex(spark, path)
    assert(served(path) == full,
      "recovery destroyed an append that landed mid-compaction")
  }

  test("tombstoned ids vanish from serving before AND after compaction") {
    val path = java.nio.file.Files.createTempDirectory("idx_del_").toString
    // half the non-query corpus: big enough that top-5 MUST move
    val isDoomed = col("vec_id") >= 20 && col("vec_id") % 2 === 0
    VectorOps.buildPinnedIvfIndex(emb, "vec_id", "embedding",
      nlist = 16, path = path)
    val full = inPlace(emb)
    val surviving = inPlace(emb.where(!isDoomed))
    assert(full != surviving, "slice choice must actually change top-k")
    VectorOps.deleteFromPinnedIvfIndex(emb.where(isDoomed), "vec_id", path)
    assert(served(path) == surviving, "anti-join serving path wrong")
    VectorOps.compactPinnedIvfIndex(spark, path)
    assert(served(path) == surviving, "compaction mis-applied tombstones")
    // tombstones were consumed: the steady state has no tombstone dir
    assert(!new java.io.File(path, "tombstones").exists(),
      "applied tombstones must be cleaned up")
  }
}
