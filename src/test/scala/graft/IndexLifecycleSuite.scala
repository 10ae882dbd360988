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

  /** Live ingest_batch partitions. The PARTITION set is the claim the
    * redelivery tests pin — an empty assignments_stream parent is
    * allowed to linger (every reader content-guards; sweeping it raced
    * a concurrent appender's fresh partition into data loss). */
  private def streamPartitions(path: String): Seq[String] =
    Option(new java.io.File(path, "assignments_stream").listFiles)
      .map(_.filter(_.isDirectory).map(_.getName).toSeq.sorted)
      .getOrElse(Nil)

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
      path, 3L, "t-lineage")
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

  test("a second compactor aborts on a live lease, index intact") {
    val (path, _) = freshIndex()
    val before = served(path)
    // simulate an in-flight compactor: a fresh lease under the root
    val lease = new java.io.File(path, "_compaction.lock")
    java.nio.file.Files.write(lease.toPath,
      System.currentTimeMillis().toString.getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      VectorOps.compactPinnedIvfIndex(spark, path)
    }
    assert(e.getMessage.contains("concurrent compaction refused"),
      s"wrong guard message: ${e.getMessage}")
    // the loser must have aborted BEFORE the capture step: no tmp, no
    // manifest, lease untouched, answers unchanged
    assert(!new java.io.File(path, "assignments_by_bucket__compacting")
      .exists(), "racing compactor left a tmp layout")
    assert(lease.exists(), "racing compactor broke the holder's lease")
    assert(served(path) == before, "racing compactor corrupted the index")
  }

  test("an expired lease is broken and compaction proceeds") {
    val (path, expected) = freshIndex()
    val lease = new java.io.File(path, "_compaction.lock")
    // a stale lease from a crashed holder: stamped older than the ttl
    java.nio.file.Files.write(lease.toPath,
      (System.currentTimeMillis() - 10000).toString.getBytes("UTF-8"))
    VectorOps.compactPinnedIvfIndexSteps(spark, path,
      stopAfter = Int.MaxValue, leaseTtlMs = 5000)
    assert(!lease.exists(), "completed compaction must release the lease")
    assert(served(path) == expected, "post-break compaction wrong")
  }

  test("a slow compaction outliving the TTL heartbeats its lease and is never fenced out") {
    // the r12 verdict's scale-killer: with expiry judged by CREATE
    // time, a compaction longer than the TTL had its live lease
    // legitimately broken by a rival MID-WRITE. Here the holder runs
    // with a 3s TTL and ~1s of injected delay between every step
    // (total = 2x TTL) while a rival hammers claim attempts the
    // whole time — every attempt must be refused (the heartbeat keeps
    // the lease young), the holder must complete unfenced, and the
    // result must be exact. Starvation budget: a tick renews every
    // ttl/4 = 750ms, so the heartbeat thread may be stalled up to
    // ~2.25s (GC + a loaded full-suite run) without the lease aging
    // past the TTL — the 1.5s-TTL version of this test flaked exactly
    // that way under a parallel full-suite run.
    val (path, expected) = freshIndex()
    val ttl = 3000L
    val started = new java.util.concurrent.CountDownLatch(1)
    val holderDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val rival = new Thread(() => {
      started.await()
      while (!holderDone.get()) {
        try {
          VectorOps.compactPinnedIvfIndexSteps(spark, path,
            stopAfter = Int.MaxValue, leaseTtlMs = ttl)
          outcomes.add("acquired")
        } catch {
          case e: IllegalStateException
              if e.getMessage.contains("concurrent compaction refused") =>
            outcomes.add("refused")
          case e: Throwable => outcomes.add(s"error: $e")
        }
        Thread.sleep(150)
      }
    }, "rival-compactor")
    rival.setDaemon(true)
    rival.start()
    try {
      VectorOps.compactPinnedIvfIndexSteps(spark, path,
        stopAfter = Int.MaxValue, leaseTtlMs = ttl, stepDelayMs = 1000L,
        onAfterAcquire = () => started.countDown())
    } finally holderDone.set(true)
    rival.join(15000)
    val seen = outcomes.toArray(Array.empty[String]).toSeq
    // termination race (code-review finding): a rival iteration that
    // passed the !holderDone check between the holder's own lease
    // RELEASE (inside compactPinnedIvfIndexSteps) and the finally
    // above may legitimately acquire the freed lease — drop trailing
    // acquisitions, they are post-release, not a fence breach (the
    // layout stays exact either way: `served` is asserted below)
    val contended = seen.reverse.dropWhile(_ == "acquired").reverse
    // the holder held the lease for 6 paced steps (~6s) against a
    // 3s TTL: without renewal the rival would have broken it
    assert(contended.count(_ == "refused") >= 2,
      s"rival never contended while the holder was slow: $seen")
    assert(contended.forall(_ == "refused"),
      s"rival got past a live heartbeating lease: $seen")
    assert(served(path) == expected, "slow heartbeating compaction wrong")
    assert(!new java.io.File(path, "_compaction.lock").exists(),
      "slow compaction must still release its lease")
  }

  test("a holder whose lease is stolen aborts before its next destructive step") {
    // the heartbeat's OTHER face: if a breaker does claim the lease
    // out from under a live holder (pathological heartbeat gap), the
    // holder must detect the foreign token at its next tick and abort
    // into an ordinary repair-covered crash window — never fight the
    // new writer over the layout. Simulate the theft right after
    // acquisition; the injected step delay guarantees a tick runs
    // before the first destructive step.
    val (path, expected) = freshIndex()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(s"$path/_compaction.lock")
    val e = intercept[IllegalStateException] {
      VectorOps.compactPinnedIvfIndexSteps(spark, path,
        stopAfter = Int.MaxValue, leaseTtlMs = 400L, stepDelayMs = 600L,
        onAfterAcquire = () => {
          // the theft, via the chain's own CAS: claim the next version
          // with a foreign uuid (what a breaker does after judging the
          // holder expired)
          val (n, _, _) = VectorOps.leaseTopVersion(fs, lease)
            .getOrElse(fail("holder must have a chain top"))
          assert(VectorOps.claimLeaseVersion(fs, lease, n + 1,
            "feedface-stolen-uuid"), "theft CAS must win a free version")
        })
    }
    assert(e.getMessage.contains("fenced out"),
      s"wrong abort message: ${e.getMessage}")
    // the thief's claim survives the loser's release (the chain release
    // CASes a marker onto ITS OWN top only — a foreign top is untouched)
    val after = VectorOps.leaseTopVersion(fs, lease)
    assert(after.exists(_._3 == "feedface-stolen-uuid"),
      s"fenced-out holder's release touched the thief's lease: $after")
    // the abort left an uncommitted tmp at worst: recovery converges
    fs.delete(lease, true) // the simulated thief 'crashes'
    VectorOps.compactPinnedIvfIndexSteps(spark, path,
      stopAfter = Int.MaxValue, leaseTtlMs = 400L)
    assert(served(path) == expected,
      "recovery after a fenced-out abort changed answers")
  }

  test("a zombie's late commit loses at the commit point itself — " +
      "synchronously, without any heartbeat tick") {
    // r16 verdict prescription 7: the async fenced flag is set by the
    // heartbeat THREAD, so a GC pause that stalls the whole JVM leaves
    // it stale — the zombie wakes, passes the flag check, and its late
    // destructive write races the breaker. The fence at each commit
    // point is now a synchronous lease-version CAS on the calling
    // thread. Simulated here with a HUGE ttl (heartbeat interval ttl/4
    // = 15 min: it cannot tick during the test, so only the synchronous
    // fence can catch the theft) and the steal injected right after
    // acquisition — the first destructive step must refuse.
    val (path, expected) = freshIndex()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(s"$path/_compaction.lock")
    val e = intercept[IllegalStateException] {
      VectorOps.compactPinnedIvfIndexSteps(spark, path,
        stopAfter = Int.MaxValue, leaseTtlMs = 60L * 60 * 1000,
        onAfterAcquire = () => {
          val (n, _, _) = VectorOps.leaseTopVersion(fs, lease)
            .getOrElse(fail("holder must have a chain top"))
          assert(VectorOps.claimLeaseVersion(fs, lease, n + 1,
            "cafebabe-breaker-uuid"), "theft CAS must win a free version")
        })
    }
    assert(e.getMessage.contains("fenced"),
      s"the commit must refuse synchronously on a stolen lease: " +
        s"${e.getMessage}")
    // the breaker's claim survives the zombie's release path untouched
    assert(VectorOps.leaseTopVersion(fs, lease)
      .exists(_._3 == "cafebabe-breaker-uuid"),
      "the fenced zombie must not touch the breaker's chain")
    // the abort landed in an ordinary repair-covered window: once the
    // simulated breaker is gone, compaction converges to exact serving
    fs.delete(lease, true)
    VectorOps.compactPinnedIvfIndexSteps(spark, path,
      stopAfter = Int.MaxValue)
    assert(served(path) == expected,
      "recovery after a commit-point fence changed answers")
  }

  test("fence.around: the commit thunk NEVER runs on a stolen lease, " +
      "and runs exactly once inside the lock on a held one") {
    // r17 verdict item 8: the commit step now executes INSIDE the lease
    // lock adjacent to the winning CAS. The property that refactor must
    // preserve forever: when the CAS loses, the commit has not happened
    // — not "happened then detected", not "raced" — so a zombie's
    // staged rename can never land on a layout a breaker owns.
    val root = java.nio.file.Files
      .createTempDirectory("idx_fence_around_").toString
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(s"$root/_compaction.lock")
    var ran = 0
    val e = intercept[IllegalStateException] {
      VectorOps.withMaintenanceLease(fs, root, ttlMs = 60L * 60 * 1000) {
        fence =>
          // steal the chain mid-body — the GC-pause zombie window
          val (n, _, _) = VectorOps.leaseTopVersion(fs, lease)
            .getOrElse(fail("holder must have a chain top"))
          assert(VectorOps.claimLeaseVersion(fs, lease, n + 1,
            "deadbeef-thief-uuid"), "theft CAS must win a free version")
          fence.around { ran += 1 }
      }
    }
    assert(e.getMessage.contains("fenced"), e.getMessage)
    assert(ran == 0, "the commit thunk must not run when the CAS loses")
    assert(VectorOps.leaseTopVersion(fs, lease)
      .exists(_._3 == "deadbeef-thief-uuid"),
      "the fenced holder's release must not touch the thief's chain")
    // winner path: the commit runs exactly once and its value returns
    fs.delete(lease, true)
    val out = VectorOps.withMaintenanceLease(fs, root) { fence =>
      fence.around { ran += 1; 42 }
    }
    assert(out == 42 && ran == 1,
      "a held lease must run the commit once and pass its value through")
  }

  test("chain release: a successor's claim is never touched; a released " +
      "chain reads as free") {
    // the chain twin of the legacy rename-aside release test below:
    // ownership is the CAS marker, so releasing against a foreign top
    // is a no-op and releasing our own top removes the whole chain
    val root = java.nio.file.Files.createTempDirectory("idx_chain_").toString
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(s"$root/_compaction.lock")
    assert(VectorOps.claimLeaseVersion(fs, lease, 0L, "successor-uuid"))
    VectorOps.releaseCompactionLease(fs, lease, "not-the-owner")
    assert(VectorOps.leaseTopVersion(fs, lease)
      .exists(_._3 == "successor-uuid"),
      "release with a foreign uuid must leave the successor's chain")
    // a second claim of the SAME version loses the CAS
    assert(!VectorOps.claimLeaseVersion(fs, lease, 0L, "racer-uuid"),
      "the version CAS must have a single winner")
    VectorOps.releaseCompactionLease(fs, lease, "successor-uuid")
    assert(!new java.io.File(root, "_compaction.lock").exists(),
      "owner's release must remove its chain")
    // the renewal path's guard: a claim that refuses to create the
    // directory must read a RELEASED (deleted) chain as a lost race,
    // never resurrect it — the zombie-heartbeat-tick case
    assert(!VectorOps.claimLeaseVersion(fs, lease, 1L, "zombie-uuid",
      createDir = false),
      "a dir-less claim must lose, not recreate a released chain")
    assert(!new java.io.File(root, "_compaction.lock").exists(),
      "the refused claim must leave nothing behind")
  }

  test("acquire races an ordinary release: the chain dir vanishing " +
      "between exists() and listStatus reads as FREE, not unreadable") {
    // ADVICE r14: a concurrent releaseLeaseChain's recursive delete can
    // land exactly between leaseTopVersion's exists() check and its
    // listStatus — the FileNotFoundException is the normal signature of
    // a just-freed chain, and converting it into the hard 'lease chain
    // unreadable' refusal gave the claimer a spurious
    // concurrent-compaction error instead of the lease.
    val root = java.nio.file.Files.createTempDirectory("idx_fnf_").toString
    val raw = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(s"$root/_compaction.lock")
    raw.mkdirs(lease) // the chain dir a releaser is about to delete
    val fnfOnce = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      @volatile private var armed = true
      override def listStatus(p: org.apache.hadoop.fs.Path)
          : Array[org.apache.hadoop.fs.FileStatus] =
        if (armed && p.getName == "_compaction.lock") {
          armed = false // one-shot: the re-verify after the claim reads clean
          throw new java.io.FileNotFoundException(
            s"$p (deleted by a concurrent release)")
        } else super.listStatus(p)
    }
    val (_, uuid) = VectorOps.acquireCompactionLease(fnfOnce, root,
      ttlMs = 60000L)
    assert(VectorOps.leaseTopVersion(raw, lease).exists(_._3 == uuid),
      "the claimer must hold the freed chain after the FNF race")
    VectorOps.releaseCompactionLease(raw, lease, uuid)
  }

  test("release leaves a successor's lease untouched (atomic rename-aside)") {
    // ADVICE r12: read-then-delete release could delete a successor's
    // fresh lease. The release path must verify ownership via the
    // renamed-aside copy and restore what is not ours.
    val root = java.nio.file.Files.createTempDirectory("idx_lease_").toString
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val lease = new org.apache.hadoop.fs.Path(s"$root/_compaction.lock")
    val successorBody =
      s"${System.currentTimeMillis()} 11111111-2222-3333-4444-555555555555"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_compaction.lock"),
      successorBody.getBytes("UTF-8"))
    // our (stale) holder releases with a DIFFERENT uuid: the
    // successor's lease must survive, body intact
    VectorOps.releaseCompactionLease(fs, lease, "deadbeef-our-uuid")
    val after = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/_compaction.lock")), "UTF-8")
    assert(after == successorBody,
      s"release touched a successor's lease: '$after'")
    // and releasing with the OWNING uuid removes it
    VectorOps.releaseCompactionLease(fs, lease,
      "11111111-2222-3333-4444-555555555555")
    assert(!new java.io.File(root, "_compaction.lock").exists(),
      "owner's release must delete its own lease")
  }

  test("a torn manifest is uncommitted: inputs keep serving, repair rolls back") {
    // the ADVICE r11 torn-write window: first-ever compaction, crash
    // mid-manifest-write on a store with non-atomic create. Simulate by
    // hand-writing a terminator-less manifest into a data-complete tmp.
    val (path, expected) = freshIndex()
    VectorOps.compactPinnedIvfIndexSteps(spark, path, stopAfter = 1)
    val tmp = new java.io.File(path, "assignments_by_bucket__compacting")
    assert(tmp.exists(), "window-1 tmp missing")
    val datum = new java.io.File(tmp, "_consumed")
    java.nio.file.Files.write(datum.toPath,
      s"$path/assignments/part-torn.parquet\n".getBytes("UTF-8"))
    // a torn manifest must NOT activate the tmp (that would double-count
    // against an unmasked input set) — the original layout serves alone
    assert(served(path) == expected,
      "torn manifest double-counted or hid rows")
    // and the next compaction treats the tmp as never-committed: rolls
    // it back, re-runs, converges
    VectorOps.compactPinnedIvfIndex(spark, path)
    assert(served(path) == expected, "recovery from torn manifest wrong")
    assert(!tmp.exists(), "torn tmp survived recovery")
  }

  test("tombstone anti-join exists pending and vanishes from the steady-state plan") {
    // the delete path's cost claim, pinned as a PLAN property: pending
    // tombstones serve via a broadcast anti-join (delta-sized), and
    // compaction physically applies them so the steady-state query
    // carries NO anti-join at all — a regression that left the join in
    // place would silently tax every post-compaction query.
    val path = java.nio.file.Files.createTempDirectory("idx_plan_").toString
    VectorOps.buildPinnedIvfIndex(emb, "vec_id", "embedding",
      nlist = 16, path = path)
    VectorOps.deleteFromPinnedIvfIndex(
      emb.where(col("vec_id") >= 20 && col("vec_id") % 2 === 0),
      "vec_id", path)
    def servedPlan(): String = {
      val df = VectorOps.queryPinnedIvfIndex(spark, path,
        emb.where(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nprobe = 6)
      df.collect() // finalize the adaptive plan before rendering
      df.queryExecution.executedPlan.toString
    }
    assert(servedPlan().contains("LeftAnti"),
      "pending tombstones must serve through the broadcast anti-join")
    VectorOps.compactPinnedIvfIndex(spark, path)
    val post = servedPlan()
    assert(!post.contains("LeftAnti"),
      s"steady-state post-compaction plan must carry no anti-join:\n$post")
  }

  test("compaction interleaved with live streamed maintenance stays exact") {
    // compaction under TRAFFIC, end to end: the corpus streams in one
    // file per micro-batch, every batch appends + tombstones its
    // doomed slice (the w23 body), and foreachBatch fires a FULL
    // compaction after every second batch — so compactions run between
    // (and interleave with) live appends and pending tombstones, each
    // one capturing whatever inputs exist at that instant under the
    // writer lease. The final answer must equal compute-in-place over
    // survivors, and the steady state must be fully applied (no
    // tombstone dir left behind).
    import graft.functions.VectorOps
    import graft.streaming.Streams
    val emb = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("w23_compact_").toString
    emb.repartition(4).write.parquet(s"$dir/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("idx_live_").toString
    VectorOps.buildPinnedIvfIndex(emb.where(col("vec_id") < 16),
      "vec_id", "embedding", nlist = 16, path = path)
    val isDoomed = col("vec_id") >= 100 && col("vec_id") % 5 === 2
    val q = Streams.eventStream(spark, s"$dir/embeddings.parquet", Some(1))
      .where(col("vec_id") >= 16)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        VectorOps.appendPinnedIvfIndexBatch(batch, "vec_id", "embedding",
          path, id, "t-lineage")
        VectorOps.deleteFromPinnedIvfIndex(batch.where(isDoomed),
          "vec_id", path)
        if (id % 2 == 1) VectorOps.compactPinnedIvfIndex(spark, path)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    VectorOps.compactPinnedIvfIndex(spark, path) // final maintenance pass
    assert(served(path) == inPlace(emb.where(!isDoomed)),
      "mid-stream compaction lost or duplicated rows")
    assert(!new java.io.File(path, "tombstones").exists(),
      "final compaction must consume all tombstones")
  }

  test("randomized op sequences: serving always equals compute-in-place") {
    // model-based check over a seeded random interleaving of the whole
    // op surface — append fresh ids, append RESURRECTED ids, delete,
    // compact — with the serving view compared to compute-in-place over
    // the model's live set as the sequence unfolds. The scripted tests
    // pin specific windows; this sweeps interleavings nobody scripted
    // (e.g. delete → append → delete same slice → compact → append).
    // Ids 0-15 stay live forever so the pinned codebook of the oracle
    // side (16 lowest ids of its corpus) matches the index's bootstrap.
    import graft.functions.VectorOps
    val rnd = new scala.util.Random(42) // seeded: failures reproduce
    val allIds = (16L until 500L).toVector
    val path = java.nio.file.Files.createTempDirectory("idx_rand_").toString
    var live = Set.empty[Long]   // ids currently expected to serve
    var dead = Set.empty[Long]   // tombstoned, eligible for resurrection
    // streamed-batch bookkeeping: a REDELIVERY must replay the same id
    // set under the same batch id — the model says it never changes the
    // served set (unconsumed: overwrite with identical rows; consumed:
    // ledger no-op — including after a fold merged the ledger files)
    var batches = Map.empty[Long, Set[Long]]
    var nextBatch = 0L
    def embIn(ids: Set[Long]) = {
      val keep = ids + -1L // non-empty literal list
      emb.where(col("vec_id") < 16 || col("vec_id").isin(keep.toSeq: _*))
    }
    VectorOps.buildPinnedIvfIndex(embIn(Set.empty), "vec_id", "embedding",
      nlist = 16, path = path)
    def check(step: String): Unit =
      assert(served(path) == inPlace(embIn(live)),
        s"serving diverged from model after $step (live=${live.size})")
    for (step <- 1 to 14) {
      val free = allIds.filterNot(live).filterNot(dead)
      val op = rnd.nextInt(12)
      if (op < 3 && free.nonEmpty) {            // append fresh
        val s = rnd.shuffle(free).take(1 + rnd.nextInt(60)).toSet
        VectorOps.appendPinnedIvfIndex(embIn(s).where(col("vec_id") >= 16),
          "vec_id", "embedding", path)
        live ++= s
      } else if (op < 5 && dead.nonEmpty) {
        // append copies of PENDING-deleted ids: the resurrection
        // contract says a pending tombstone masks every ingested copy,
        // and the next compaction removes the late copy with the rest —
        // so the model keeps these ids dead. (True resurrection — a
        // fresh append AFTER the tombstone is consumed — happens via
        // the fresh-append branch once a compaction clears `dead`.)
        val s = rnd.shuffle(dead.toVector).take(1 + rnd.nextInt(20)).toSet
        VectorOps.appendPinnedIvfIndex(embIn(s).where(col("vec_id") >= 16),
          "vec_id", "embedding", path)
      } else if (op < 7 && live.nonEmpty) {     // delete a live slice
        val s = rnd.shuffle(live.toVector).take(1 + rnd.nextInt(40)).toSet
        VectorOps.deleteFromPinnedIvfIndex(embIn(s).where(col("vec_id") >= 16),
          "vec_id", path)
        live --= s; dead ++= s
      } else if (op < 9 && free.nonEmpty) {     // streamed-batch append
        val s = rnd.shuffle(free).take(1 + rnd.nextInt(40)).toSet
        VectorOps.appendPinnedIvfIndexBatch(
          embIn(s).where(col("vec_id") >= 16), "vec_id", "embedding",
          path, nextBatch, "t-lineage")
        batches += nextBatch -> s; nextBatch += 1
        live ++= s
      } else if (op < 10 && batches.nonEmpty) { // redeliver a past batch
        val (id, s) = batches.toVector(rnd.nextInt(batches.size))
        VectorOps.appendPinnedIvfIndexBatch(
          embIn(s).where(col("vec_id") >= 16), "vec_id", "embedding",
          path, id, "t-lineage")
        // model unchanged: identical-overwrite or ledger no-op
      } else {                                  // maintenance
        VectorOps.compactPinnedIvfIndex(spark, path)
        dead = Set.empty // applied tombstones cannot resurrect by append
      }
      if (step % 3 == 0) check(s"step $step")
    }
    VectorOps.compactPinnedIvfIndex(spark, path)
    check("final compaction")
    // the consumed-batch ids must still no-op after the final fold
    batches.foreach { case (id, s) =>
      VectorOps.appendPinnedIvfIndexBatch(
        embIn(s).where(col("vec_id") >= 16), "vec_id", "embedding",
        path, id, "t-lineage")
    }
    check("post-fold redelivery of every consumed batch")
    assert(live.size > 50, "sequence degenerated: too few live ids to be meaningful")
  }

  test("a crash MID-step-3 (partial compacted delete) loses nothing") {
    // the code-review window: a re-compaction committed its tmp, then
    // crashed PARTWAY through the recursive delete of the old compacted
    // dir (recursive delete is not atomic). The old repair saw the
    // compacted remnant and rolled the tmp — the only complete copy —
    // back, permanently losing every row whose part-file the delete had
    // already removed. The reader must prefer the committed tmp, and
    // repair must roll FORWARD.
    val (path, _) = freshIndex()
    VectorOps.compactPinnedIvfIndex(spark, path) // prior compacted layout
    VectorOps.appendPinnedIvfIndex(
      emb.where(reserved), "vec_id", "embedding", path)
    val full = inPlace(emb.where(!isDoomed))
    // stop after the manifest commit (window 2: compacted intact)...
    VectorOps.compactPinnedIvfIndexSteps(spark, path, stopAfter = 2)
    // ...then hand-interrupt step 3: delete SOME of the old compacted
    // dir's data files, simulating the torn recursive delete
    val compacted = new java.io.File(path, "assignments_by_bucket")
    val victims = compacted.listFiles().filter(_.isDirectory).take(3)
    assert(victims.nonEmpty, "setup: no bucket dirs to tear")
    victims.foreach { d =>
      d.listFiles().foreach(_.delete()); d.delete()
    }
    assert(served(path) == full,
      "reader served the torn compacted remnant instead of the committed tmp")
    VectorOps.compactPinnedIvfIndex(spark, path)
    assert(served(path) == full,
      "repair rolled back the only complete copy (mid-step-3 data loss)")
    assert(!new java.io.File(path, "assignments_by_bucket__compacting").exists(),
      "tmp survived roll-forward recovery")
  }

  test("a batch redelivered AFTER a compaction consumed it must no-op") {
    // the code-review retry window: foreachBatch appends batch N, a
    // compaction in the SAME batch (the w23/interleaved pattern) consumes
    // ingest_batch=N, then the batch fails later and Spark redelivers it.
    // The batch-keyed overwrite would recreate the partition whose rows
    // now also live in the compacted layout — served twice, and baked in
    // permanently by the next compaction. The consumed-batch ledger makes
    // the redelivery a no-op instead.
    val (path, _) = freshIndex() // carries ingest_batch=3
    VectorOps.compactPinnedIvfIndex(spark, path) // consumes batch 3
    val expected = inPlace(emb.where(!isDoomed && !reserved))
    assert(served(path) == expected)
    // the redelivery: same batch id, same rows
    val isLate = col("vec_id") >= 200
    VectorOps.appendPinnedIvfIndexBatch(
      emb.where(isLate && col("vec_id") % 2 =!= 0), "vec_id", "embedding",
      path, 3L, "t-lineage")
    assert(streamPartitions(path).isEmpty,
      "redelivered consumed batch recreated its partition")
    assert(served(path) == expected,
      "redelivered consumed batch double-served its rows")
    // and the next compaction must not bake anything in
    VectorOps.compactPinnedIvfIndex(spark, path)
    assert(served(path) == expected,
      "compaction after a redelivered consumed batch duplicated rows")
    // a FRESH batch id still appends normally
    VectorOps.appendPinnedIvfIndexBatch(
      emb.where(reserved), "vec_id", "embedding", path, 4L,
      "t-lineage")
    assert(served(path) == inPlace(emb.where(!isDoomed)),
      "ledger must only suppress consumed ids, not fresh ones")
  }

  test("a fresh stream lineage on a ledger-bearing root fails loudly") {
    // the r12 verdict's unenforced footnote: a FRESH stream (checkpoint
    // wiped, batch ids restarting at 0) pointed at a root an earlier
    // lineage fed would silently no-op its first N batches — data loss
    // with no error. The lineage stamp turns it into a loud failure.
    val (path, _) = freshIndex() // stamps lineage "t-lineage"
    VectorOps.compactPinnedIvfIndex(spark, path) // ledger gains batch 3
    val isLate = col("vec_id") >= 200
    val e = intercept[IllegalStateException] {
      VectorOps.appendPinnedIvfIndexBatch(
        emb.where(isLate), "vec_id", "embedding", path, 0L,
        "a-DIFFERENT-lineage")
    }
    assert(e.getMessage.contains("stream-lineage mismatch"),
      s"wrong guard message: ${e.getMessage}")
    // nothing was written by the refused appender
    assert(streamPartitions(path).isEmpty,
      "refused appender left a partition behind")
    // and an UNSTAMPED ledger (pre-stamp-era root) also refuses: no
    // appender can prove it is the lineage that fed it
    val stamp = new java.io.File(path, "_compacted_batches/_lineage")
    assert(stamp.exists(), "first append must have stamped the lineage")
    stamp.delete()
    val e2 = intercept[IllegalStateException] {
      VectorOps.appendPinnedIvfIndexBatch(
        emb.where(isLate), "vec_id", "embedding", path, 9L, "t-lineage")
    }
    assert(e2.getMessage.contains("unstamped batch ledger"),
      s"wrong migration guard message: ${e2.getMessage}")
  }

  test("compaction folds ledger files into one; ids survive the fold") {
    // ADVICE r12: one ledger file per cleanup forever made every
    // streamed append pay O(#compactions) opens. cleanupConsumed now
    // folds them under the lease; the id set must be unchanged (the
    // redelivery no-op still holds for an OLD consumed id after folds).
    val (path, _) = freshIndex() // ingest_batch=3
    VectorOps.compactPinnedIvfIndex(spark, path)          // ledger file 1
    VectorOps.appendPinnedIvfIndexBatch(
      emb.where(reserved), "vec_id", "embedding", path, 4L, "t-lineage")
    VectorOps.compactPinnedIvfIndex(spark, path)          // ledger file 2
    val dir = new java.io.File(path, "_compacted_batches")
    def ledgerFiles = dir.listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(ledgerFiles.length == 1,
      s"ledger not folded: ${ledgerFiles.map(_.getName).toSeq}")
    val expected = inPlace(emb.where(!isDoomed))
    // BOTH consumed ids still no-op after the fold
    val isLate = col("vec_id") >= 200
    VectorOps.appendPinnedIvfIndexBatch(
      emb.where(isLate && col("vec_id") % 2 =!= 0), "vec_id", "embedding",
      path, 3L, "t-lineage")
    VectorOps.appendPinnedIvfIndexBatch(
      emb.where(reserved), "vec_id", "embedding", path, 4L, "t-lineage")
    assert(streamPartitions(path).isEmpty,
      "folded ledger lost a consumed id: a redelivery recreated rows")
    assert(served(path) == expected, "fold changed answers")
  }

  test("a redelivery racing the compactor's cleanup cannot double-count") {
    // ADVICE r12's exact interleaving: the redelivery reads the ledger
    // BEFORE cleanupConsumed records its id (check passes), the
    // compaction then consumes + deletes the partition, and the
    // redelivery recreates it afterwards — permanently double-counted
    // at the next compaction under the old code. The hook runs the full
    // compaction inside that window; the appender's post-write re-read
    // must detect the now-recorded id and drop its own partition.
    val (path, _) = freshIndex() // carries ingest_batch=3
    val expected = inPlace(emb.where(!isDoomed && !reserved))
    val isLate = col("vec_id") >= 200
    VectorOps.appendPinnedIvfIndexBatchHooked(
      emb.where(isLate && col("vec_id") % 2 =!= 0), "vec_id", "embedding",
      path, 3L, "t-lineage",
      afterLedgerCheck = () => VectorOps.compactPinnedIvfIndex(spark, path))
    assert(streamPartitions(path).isEmpty,
      "mid-cleanup redelivery left a recreated partition")
    assert(served(path) == expected,
      "mid-cleanup redelivery double-served its rows")
    VectorOps.compactPinnedIvfIndex(spark, path)
    assert(served(path) == expected,
      "next compaction baked the recreated partition in")
  }

  test("a query overlapping a compaction swap retries and answers exactly") {
    // the r12 verdict's gap 2: a query PLANS against the pre-swap
    // layout lazily, the compaction swap/cleanup deletes those inputs,
    // and execution hits FileNotFoundException. withMaintenanceRetry
    // must re-plan against the post-swap layout and return the exact
    // answer — reads safe under maintenance, not scheduled around it.
    val (path, expected) = freshIndex()
    var attempts = 0
    val got = VectorOps.withMaintenanceRetry {
      attempts += 1
      val df = VectorOps.queryPinnedIvfIndex(spark, path,
        emb.where(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nprobe = 6)
      if (attempts == 1) {
        // maintenance lands between plan and execute: every input the
        // plan listed (plain assignments, the streamed partition, the
        // tombstones) is consumed and deleted
        VectorOps.compactPinnedIvfIndex(spark, path)
        // the stale plan must actually FAIL (else this test would pass
        // vacuously with the window never provoked)
        val e = intercept[Throwable] { rowsOfSorted(df) }
        assert(VectorOps.fnfCaused(e),
          s"expected an FNF-caused failure from the stale plan, got: $e")
        rowsOfSorted(df) // rethrows inside the wrapper -> triggers retry
      } else rowsOfSorted(df)
    }
    assert(attempts == 2, s"retry did not fire (attempts=$attempts)")
    assert(got == expected,
      "maintenance-window retry served a wrong or incomplete answer")
    // non-FNF failures must NOT retry
    var calls = 0
    val boom = intercept[IllegalArgumentException] {
      VectorOps.withMaintenanceRetry {
        calls += 1; throw new IllegalArgumentException("not a file error")
      }
    }
    assert(calls == 1 && boom.getMessage == "not a file error")
  }

  test("lineageOfCheckpoint reads the stream id; a wiped checkpoint changes it") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_").toString
    def writeMeta(id: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$ckpt/metadata"),
        s"""{"id" : "$id"}""".getBytes("UTF-8"))
    writeMeta("aaaa-bbbb")
    assert(VectorOps.lineageOfCheckpoint(spark, ckpt) == "aaaa-bbbb")
    // a wiped + recreated checkpoint carries a NEW id -> new lineage,
    // which is what makes the mismatch guard fire for restarted streams
    writeMeta("cccc-dddd")
    assert(VectorOps.lineageOfCheckpoint(spark, ckpt) == "cccc-dddd")
  }

  test("a torn manifest at the COMMITTED dir fails queries loudly") {
    // at the committed dir a manifest arrives whole by construction, so
    // torn = external corruption: cleanup already refuses to delete
    // inputs against the partial list, and the reader must refuse to
    // serve a double-counted view against it (code-review finding) —
    // not silently treat it as an empty consumed set.
    val (path, expected) = freshIndex()
    VectorOps.compactPinnedIvfIndex(spark, path)
    assert(served(path) == expected)
    val mf = new java.io.File(
      new java.io.File(path, "assignments_by_bucket"), "_consumed")
    java.nio.file.Files.write(mf.toPath,
      s"$path/assignments/part-torn.parquet\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] { served(path) }
    assert(e.getMessage.contains("torn _consumed manifest"),
      s"wrong guard message: ${e.getMessage}")
  }

  test("a content-less lease falls back to mtime: fresh aborts, stale breaks") {
    // a holder that crashed between lease-create and token-write leaves
    // an EMPTY lease. Treating it as expired would break a live holder
    // in that window; refusing forever would deadlock every future
    // compactor. The mtime fallback does both jobs.
    val (path, expected) = freshIndex()
    val lease = new java.io.File(path, "_compaction.lock")
    assert(lease.createNewFile(), "setup: lease create failed")
    val fresh = intercept[IllegalStateException] {
      VectorOps.compactPinnedIvfIndex(spark, path)
    }
    assert(fresh.getMessage.contains("is held"),
      s"fresh empty lease must read as live via mtime: ${fresh.getMessage}")
    // age it past the ttl: now it breaks and compaction proceeds
    assert(lease.setLastModified(System.currentTimeMillis() - 10000))
    VectorOps.compactPinnedIvfIndexSteps(spark, path,
      stopAfter = Int.MaxValue, leaseTtlMs = 5000)
    assert(served(path) == expected, "post-break compaction wrong")
  }

  test("re-appending a tombstoned id after compaction re-serves it") {
    // pins the RESURRECTION CONTRACT stated on deleteFromPinnedIvfIndex:
    // tombstones mask rows, not ids — delete-then-reinsert is legal and
    // the reinserted copy serves. A "deletes are permanent" refactor
    // must consciously break this test.
    val path = java.nio.file.Files.createTempDirectory("idx_resur_").toString
    val isDoomed = col("vec_id") >= 20 && col("vec_id") % 2 === 0
    VectorOps.buildPinnedIvfIndex(emb, "vec_id", "embedding",
      nlist = 16, path = path)
    VectorOps.deleteFromPinnedIvfIndex(emb.where(isDoomed), "vec_id", path)
    VectorOps.compactPinnedIvfIndex(spark, path) // tombstones applied+consumed
    assert(served(path) == inPlace(emb.where(!isDoomed)))
    VectorOps.appendPinnedIvfIndex(emb.where(isDoomed), "vec_id", "embedding",
      path)
    assert(served(path) == inPlace(emb),
      "re-appended id after tombstone consumption must serve again")
  }
}
