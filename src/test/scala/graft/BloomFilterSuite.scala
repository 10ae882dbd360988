package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomAgg, BloomFilterOps, BloomMightContain}

/** The runtime bloom-filter semi-join reduction (q47): correctness of
  * the kernel (no false negatives, bounded false positives), bitmap
  * determinism under partitioning/merge order, and the property the
  * operator exists for — the prefilter passes only a dim-proportional
  * fraction of the fact side. */
class BloomFilterSuite extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("kernel: inserted keys always hit; non-keys rarely do") {
    val bits = new Array[Long]((1 << 14) / 64)
    val keys = (0L until 500L).map(_ * 7919L + 13L)
    keys.foreach(BloomFilterOps.add(bits, _, 3))
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(bits)
    keys.foreach { k =>
      assert(BloomFilterOps.mightContain(ad, k, 3), s"false negative on $k")
    }
    // 500 keys in 2^14 bits, k=3: fpp ~ (1-e^(-3*500/16384))^3 ~ 6e-4
    val fps = (1L to 10000L).map(_ * 104729L + 7L)
      .filterNot(keys.contains)
      .count(BloomFilterOps.mightContain(ad, _, 3))
    assert(fps <= 100, s"false-positive count $fps implausibly high")
  }

  test("bitmap aggregate is partitioning- and merge-order-invariant") {
    val keys = (0L until 1000L).toDF("k")
    def bm(parts: Int): Seq[Long] =
      keys.repartition(parts)
        .select(BloomAgg.column(spark, col("k"), 1 << 14, 3))
        .head().getSeq[Long](0)
    val one = bm(1)
    assert(one == bm(7) && one == bm(32), "bitmap depends on partitioning")
    // and it equals the driver-side kernel run serially
    val local = new Array[Long]((1 << 14) / 64)
    (0L until 1000L).foreach(BloomFilterOps.add(local, _, 3))
    assert(one == local.toSeq, "distributed bitmap != serial kernel")
  }

  test("prefilter: no false negatives, dim-proportional survivor fraction") {
    val lineitem = Tables(spark, sf, "lineitem")
    val hot = Tables(spark, sf, "orders").where(col("o_totalprice") > 450000)
    val nFact = lineitem.count()
    val pre = BloomFilterOps.bloomPrefilter(
      lineitem, "l_orderkey", hot, "o_orderkey")
    // every truly-matching row survives (no false negatives): the
    // prefiltered join equals the plain join row-for-row
    val plain = lineitem.join(hot, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Long)].collect().sorted.toSeq
    val viaBloom = pre.join(hot, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaBloom == plain, "bloom prefilter changed the join result")
    // the reduction: ~10% of orders pass the predicate, so only ~10% of
    // fact rows (+ tiny fp at 2^17 bits) should survive the prefilter
    val dimFrac = hot.count().toDouble /
      Tables(spark, sf, "orders").count()
    val passFrac = pre.count().toDouble / nFact
    assert(passFrac <= dimFrac + 0.05,
      f"prefilter passed $passFrac%.3f of fact rows vs dim fraction $dimFrac%.3f")
  }

  test("membership expression survives codegen and matches interpreted eval") {
    val bits = new Array[Long]((1 << 10) / 64)
    (0L until 64L).foreach(BloomFilterOps.add(bits, _, 3))
    val df = (0L until 256L).toDF("k")
      .withColumn("hit", BloomMightContain.column(spark,
        typedlit(bits.toSeq), col("k"), 3))
    val got = df.where(col("hit")).select("k").as[Long].collect().toSet
    assert((0L until 64L).toSet.subsetOf(got), "codegen path lost inserted keys")
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(bits)
    val expected = (0L until 256L).filter(BloomFilterOps.mightContain(ad, _, 3)).toSet
    assert(got == expected, "codegen and interpreted membership diverge")
  }

  // ---- md5-position path (d22 bloom decontamination) ----------------------

  test("md5 kernel hashes match the column-side md5-hex bridge") {
    // the kernel's digest-byte arithmetic must equal what DuckDB (and
    // Spark's conv-over-md5-hex) computes, or the d22 oracle is fiction
    val words = Seq("alpha beta gamma delta", "x", "", "tok97 tok3 tok41 tok5")
    val viaCols = words.toDF("s")
      .select(col("s"),
        (graft.functions.TextOps.tokenHash64(col("s"))
          .bitwiseAND(lit(Long.MaxValue))).as("h1"),
        (shiftleft(conv(substring(md5(col("s")), 17, 8), 16, 10).cast("long"), 32) +
          conv(substring(md5(col("s")), 25, 8), 16, 10).cast("long"))
          .bitwiseAND(lit(Long.MaxValue)).as("h2"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    words.foreach { w =>
      // replicate md5Pair through the only public surface: a 1-element
      // saturating add against a 64-bit bitmap pins (h1%64 + j*h2%64)%64
      val bits = new Array[Long](1)
      BloomFilterOps.md5Add(bits,
        org.apache.spark.unsafe.types.UTF8String.fromString(w), 5)
      val (h1, h2) = viaCols(w)
      val expected = new Array[Long](1)
      (0 until 5).foreach { j =>
        val pos = ((h1 % 64) + j.toLong * (h2 % 64)) % 64
        expected(0) |= (1L << pos.toInt)
      }
      assert(bits(0) == expected(0), s"md5 position drift for '$w'")
    }
  }

  test("md5 bitmap aggregate is partitioning-invariant and equals the serial kernel") {
    import graft.functions.Md5BloomAgg
    val words = (0 until 1000).map(i => s"tok$i gram${i % 37}")
    def bm(parts: Int): Seq[Long] =
      words.toDF("s").repartition(parts)
        .select(Md5BloomAgg.column(spark, col("s"), 1 << 14, 5))
        .head().getSeq[Long](0)
    val one = bm(1)
    assert(one == bm(7) && one == bm(32), "md5 bitmap depends on partitioning")
    val local = new Array[Long]((1 << 14) / 64)
    words.foreach(w => BloomFilterOps.md5Add(local,
      org.apache.spark.unsafe.types.UTF8String.fromString(w), 5))
    assert(one == local.toSeq, "distributed md5 bitmap != serial kernel")
  }

  test("bloomDecontaminate: no false negatives, scorecard covers every train doc") {
    val docs = Seq(
      (1L, "shared gram one two padding words here"), // shares 4-gram with eval
      (2L, "completely different text with no overlap at all"),
      (3L, "tiny"),                                   // < n tokens: 0 shingles
      (50L, "shared gram one two eval document body") // eval side (id%50==0)
    ).toDF("doc_id", "text")
    val out = graft.functions.TextOps.bloomDecontaminate(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L), "scorecard must list every train doc")
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 >= 1, "doc 1 shares 'shared gram one two' — a hit is mandatory")
    assert(byId(3L) == ((3L, 0L, 0L)), "sub-n doc must report 0 shingles, 0 hits")
    // the whole operator replays serially: build the eval bitmap with the
    // driver kernel, score each train doc's distinct shingles against it,
    // and the distributed scorecard must agree row for row — at a tiny
    // mBits where collisions and false positives are guaranteed to occur
    def shingleSet(t: String): Seq[String] =
      t.trim.split("\\s+").toSeq.sliding(4).withFilter(_.size == 4)
        .map(_.mkString(" ")).toSeq.distinct
    val tiny = 256
    val bits = new Array[Long](tiny / 64)
    shingleSet("shared gram one two eval document body").foreach(s =>
      BloomFilterOps.md5Add(bits,
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 5))
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(bits)
    val expected = Seq(
      1L -> "shared gram one two padding words here",
      2L -> "completely different text with no overlap at all",
      3L -> "tiny").map { case (id, t) =>
      val sh = shingleSet(t)
      val hits = sh.count { s =>
        val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        BloomFilterOps.md5HitCount(ad, a, 5) == 1
      }
      (id, sh.size.toLong, hits.toLong)
    }
    val got = graft.functions.TextOps.bloomDecontaminate(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 4, mBits = tiny)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == expected, "distributed scorecard != serial kernel replay")
  }

  test("bitmap broadcast lifecycle: repeated calls reuse ONE broadcast; " +
      "eviction unpersists without breaking held frames") {
    // ADVICE r14 #2: every bloomDecontaminate call used to create a
    // SparkContext.broadcast it never destroyed — bench reps and
    // periodic jobs accumulated bitmap-sized blocks for the app
    // lifetime. The bitmap is now cached by (eval plan, parameters).
    val docs = Seq(
      (1L, "shared gram one two padding words here"),
      (2L, "completely different text with no overlap at all"),
      (50L, "shared gram one two eval document body")
    ).toDF("doc_id", "text")
    def evalDf = docs.where(col("doc_id") % 50 === 0) // FRESH frame per call
    val train = docs.where(col("doc_id") % 50 =!= 0)
    val bc1 = graft.functions.TextOps.bloomBitmapBroadcast(evalDf, "text", 4)
    val bc2 = graft.functions.TextOps.bloomBitmapBroadcast(evalDf, "text", 4)
    assert(bc1 eq bc2,
      "semantically-equal eval frames must share one cached broadcast")
    val sizeBefore = graft.functions.TextOps.bloomBitmapCacheSize
    (1 to 3).foreach { _ =>
      graft.functions.TextOps.bloomDecontaminate(
        train, evalDf, "doc_id", "text", n = 4).count()
    }
    assert(graft.functions.TextOps.bloomBitmapCacheSize == sizeBefore,
      "repeated scoring calls against the same eval must not add entries")
    assert(org.apache.spark.GraftTestBridge
        .liveBroadcastIds(spark.sparkContext).contains(bc1.id),
      "the cached bitmap's blocks must be live while it is cached")
    // push bc1 out with 8 DISTINCT families (cap = 8, access-ordered):
    // eviction UNPERSISTS (executor copies released) but must NOT
    // destroy — a DataFrame returned against the evicted entry stays
    // executable (the API's results were always-valid before the cache
    // existed; destroy would turn them into time-bombs triggered by
    // unrelated calls — code-review finding). Full reclamation is the
    // ContextCleaner's job once the last reference is collected.
    val held = graft.functions.TextOps.bloomDecontaminate(
      train, evalDf, "doc_id", "text", n = 4) // references bc1's entry
    val before = held.orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    (0 until 8).foreach { i =>
      graft.functions.TextOps.bloomBitmapBroadcast(
        evalDf, "text", 4, mBits = 512 << i)
    }
    assert(graft.functions.TextOps.bloomBitmapCacheSize <= 8,
      "the cache must hold at most its cap")
    val after = held.orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(after == before,
      "a frame held across eviction must stay executable and identical " +
        "(unpersist re-broadcasts lazily; destroy would break it)")
  }

  test("a plan mixing a file leaf with a non-stable leaf bypasses the " +
      "bitmap cache; an all-file plan still caches") {
    // ADVICE r16 (medium): the fingerprint used to vouch for any plan
    // with non-empty inputFiles — but a parquet eval suite joined to a
    // mutable source (JDBC blocklist; here an RDD-backed frame, same
    // non-file leaf class) can change rows under an unchanged plan and
    // file listing, so the cache would serve stale bitmaps. Every leaf
    // must now be a file relation or an immutable local node.
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")) // parquet: file leaves only
    val b1 = graft.functions.TextOps.bloomBitmapBroadcast(docs, "text", 4)
    val b2 = graft.functions.TextOps.bloomBitmapBroadcast(docs, "text", 4)
    assert(b1 eq b2, "an all-file-leaf eval frame must hit the cache")
    // RDD-backed block list: a LogicalRDD leaf — neither a file relation
    // nor LocalRelation/Range, so not provably stable across calls
    val blockRdd = spark.sparkContext.parallelize(Seq(Tuple1(1L)))
    val block = spark.createDataFrame(blockRdd.map(t =>
      org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bad_id",
          org.apache.spark.sql.types.LongType))))
    val mixed = docs.join(block, col("doc_id") === col("bad_id"), "left_anti")
    assert(mixed.inputFiles.nonEmpty, "precondition: the mixed plan " +
      "still reports input files — exactly the shape that fooled the " +
      "old fingerprint")
    // the non-stable leaf must bypass the PLAN-keyed cache — but the
    // r18 content-addressed path still folds identical rows into ONE
    // broadcast (see the zero-growth test below); what it must NEVER do
    // is serve a stale bitmap when the mutable side actually changes
    val m1 = graft.functions.TextOps.bloomBitmapBroadcast(mixed, "text", 4)
    val m2 = graft.functions.TextOps.bloomBitmapBroadcast(mixed, "text", 4)
    assert(m1 eq m2,
      "identical rows from a mutable source must fold to one broadcast " +
        "via the content key")
    // a CHANGED mutable side ⇒ different shingle content ⇒ a fresh
    // broadcast — the staleness the old plan-fingerprint refusal
    // guarded against, now guarded by content equality instead
    val blockRdd2 = spark.sparkContext.parallelize(Seq(Tuple1(2L)))
    val block2 = spark.createDataFrame(blockRdd2.map(t =>
      org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bad_id",
          org.apache.spark.sql.types.LongType))))
    val mixed2 = docs.join(block2, col("doc_id") === col("bad_id"), "left_anti")
    val m3 = graft.functions.TextOps.bloomBitmapBroadcast(mixed2, "text", 4)
    assert(!(m1 eq m3),
      "changed mutable-side rows must produce a fresh bitmap broadcast, " +
        "never a stale cache hit")
  }

  test("mutable-source scoring loop: zero broadcast growth across " +
      "repeated calls (r17 verdict item 6)") {
    // the r14→r16 residual, now closed: a loop scoring against a
    // mutable (non-file-leaf) eval suite used to accumulate one
    // frame-lifetime broadcast per call. The content-addressed cache
    // folds every identical-content call into ONE broadcast handle and
    // ONE cache entry.
    val evalRdd = spark.sparkContext.parallelize(Seq(
      (50L, "shared gram one two eval document body")))
    val eval_ = spark.createDataFrame(evalRdd.map(t =>
      org.apache.spark.sql.Row(t._1, t._2)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val first = graft.functions.TextOps.bloomBitmapBroadcast(eval_, "text", 4)
    val entries0 = graft.functions.TextOps.bloomContentCacheSize
    (1 to 5).foreach { _ =>
      val bc = graft.functions.TextOps.bloomBitmapBroadcast(eval_, "text", 4)
      // reference equality IS the zero-growth proof: the same Broadcast
      // handle means no new broadcast was registered with the manager
      // (Spark's own per-job task-binary broadcasts churn regardless,
      // so counting liveBroadcastIds here would be flaky)
      assert(bc eq first,
        "every identical-content call must return the SAME broadcast")
    }
    assert(graft.functions.TextOps.bloomContentCacheSize == entries0,
      "repeated identical-content calls must not add cache entries")
  }

  /** Block removal after destroy() propagates asynchronously — poll. */
  private def broadcastGone(id: Long): Boolean = {
    val deadline = System.currentTimeMillis() + 10_000
    while (System.currentTimeMillis() < deadline) {
      if (!org.apache.spark.GraftTestBridge
          .liveBroadcastIds(spark.sparkContext).contains(id)) return true
      Thread.sleep(100)
    }
    false
  }

  test("a caller-managed bitmap scores identically and dies on demand") {
    val docs = Seq(
      (1L, "shared gram one two padding words here"),
      (2L, "completely different text with no overlap at all"),
      (50L, "shared gram one two eval document body")
    ).toDF("doc_id", "text")
    val train = docs.where(col("doc_id") % 50 =!= 0)
    val ev = docs.where(col("doc_id") % 50 === 0)
    val viaCache = graft.functions.TextOps.bloomDecontaminate(
      train, ev, "doc_id", "text", n = 4).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val own = graft.functions.TextOps.bloomBitmapBroadcast(
      ev, "text", 4, cache = false)
    val viaOwn = graft.functions.TextOps.bloomDecontaminateWith(
      train, "doc_id", "text", 4, own).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaOwn == viaCache)
    own.destroy() // caller-owned: the cache never touches it
    assert(broadcastGone(own.id))
  }

  test("BloomTextHits codegen matches interpreted eval") {
    import graft.functions.BloomTextHits
    val bits = new Array[Long]((1 << 10) / 64)
    (0 until 40).foreach(i => BloomFilterOps.md5Add(bits,
      org.apache.spark.unsafe.types.UTF8String.fromString(s"g$i"), 5))
    val rows = (0 until 100).map(i => (i.toLong, Seq(s"g$i", s"g${i + 1}", s"h$i")))
    val df = rows.toDF("id", "sh")
      .withColumn("hits", BloomTextHits.column(spark,
        typedlit(bits.toSeq), col("sh"), 5))
    val got = df.select("id", "hits").as[(Long, Int)].collect().toMap
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(bits)
    rows.foreach { case (id, sh) =>
      val exp = sh.count { s =>
        val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        BloomFilterOps.md5HitCount(ad, a, 5) == 1
      }
      assert(got(id) == exp, s"codegen/interpreted divergence on row $id")
    }
  }

  test("BloomTextHits rejects numHashes < 1 — a vacuous all-set loop would " +
      "count every shingle as a hit") {
    import graft.functions.{BloomTextHits, BloomBroadcastTextHits}
    val bits = new Array[Long](16)
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "sh")
    // analysis-time rejection for a literal k (the SQL surface's path)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.withColumn("hits",
        BloomTextHits.column(spark, typedlit(bits.toSeq), col("sh"), 0))
        .collect()
    }
    assert(e.getMessage.contains("numHashes"), e.getMessage)
    // kernel backstop for the non-literal path
    intercept[IllegalArgumentException] {
      BloomFilterOps.md5HitCount(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(bits),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("a"))),
        0)
    }
    // and the broadcast-read variant refuses at construction
    intercept[IllegalArgumentException] {
      BloomBroadcastTextHits(
        org.apache.spark.sql.GraftSqlBridge.expression(col("sh")),
        spark.sparkContext.broadcast(bits), 0)
    }
  }

  test("BloomBroadcastTextHits equals the literal-bitmap expression bit for bit") {
    import graft.functions.{BloomTextHits, BloomBroadcastTextHits}
    val bits = new Array[Long]((1 << 10) / 64)
    (0 until 40).foreach(i => BloomFilterOps.md5Add(bits,
      org.apache.spark.unsafe.types.UTF8String.fromString(s"g$i"), 5))
    val rows = (0 until 100).map(i => (i.toLong, Seq(s"g$i", s"g${i + 1}", s"h$i")))
    val df = rows.toDF("id", "sh")
    val lit = df.withColumn("hits", BloomTextHits.column(spark,
        typedlit(bits.toSeq), col("sh"), 5))
      .select("id", "hits").as[(Long, Int)].collect().toMap
    val bc = df.withColumn("hits",
        org.apache.spark.sql.GraftSqlBridge.column(BloomBroadcastTextHits(
          org.apache.spark.sql.GraftSqlBridge.expression(col("sh")),
          spark.sparkContext.broadcast(bits), 5)))
      .select("id", "hits").as[(Long, Int)].collect().toMap
    assert(bc == lit, "broadcast-read kernel diverged from the literal path")
  }
}
