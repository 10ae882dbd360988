package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSuite extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val media =
    Multimodal.syntheticMedia(spark, spark.read.parquet(s"$sf/documents.parquet"))

  test("synthetic media: schema, kinds, payload bytes") {
    val df = media.toDF()
    assert(df.columns.toSeq == Seq("media_id", "meta", "bytes"))
    val kinds = media.map(_.meta.kind).distinct().collect().sorted.toSeq
    assert(kinds == Seq("audio", "image", "video"))
    assert(media.filter(_.bytes.nonEmpty).count() == media.count())
  }

  test("decodeImages touches only images, deterministic luma") {
    val dec = Multimodal.decodeImages(media, batchSize = 7)
    val nImages = media.filter(_.meta.kind == "image").count()
    assert(dec.count() == nImages)
    val a = dec.orderBy("media_id").collect()
    val b = Multimodal.decodeImages(media, batchSize = 64).orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq, "batch size must not change results")
    assert(a.forall(d => d.channels == 3 && d.meanLuma > 0))
  }

  test("real PNG payloads decode with true dimensions and pixel luma") {
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    // an 8x4 gradient PNG built in-test: luma is exactly computable
    def png(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val grey128 = png(8, 4, (_, _) => 0x808080) // every pixel luma = 128
    val rows = Seq(
      MediaRow(1L, MediaMeta("image", 999, 999, 0, 0L), grey128),
      // not a decodable image -> deterministic fallback path
      MediaRow(2L, MediaMeta("image", 10, 10, 0, 0L), "not a png".getBytes("UTF-8")))
    val dec = Multimodal.decodeImages(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    // real decode: TRUE dimensions (not the metadata's 999x999), exact luma
    assert(dec(0).width == 8 && dec(0).height == 4)
    assert(math.abs(dec(0).meanLuma - 128.0) < 1e-9, dec(0).meanLuma.toString)
    assert(dec(0).channels == 3)
    // fallback keeps metadata dims
    assert(dec(1).width == 10 && dec(1).height == 10)
  }

  test("real PNG resize resamples pixels and halves dimensions") {
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    val img = new java.awt.image.BufferedImage(
      16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, 0x404040)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val rows = Seq(MediaRow(1L, MediaMeta("image", 16, 8, 0, 0L), buf.toByteArray))
    val out = Multimodal.resize(spark.createDataset(rows), maxSide = 8).collect().head
    assert(out.meta.width == 8 && out.meta.height == 4)
    // the resized payload is a REAL decodable PNG of the new size
    val re = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.bytes))
    assert(re.getWidth == 8 && re.getHeight == 4)
    assert((re.getRGB(3, 2) & 0xffffff) == 0x404040, "uniform grey must survive resampling")
  }

  test("extractFeatures: fixed dim, unit norm, deterministic") {
    val f = Multimodal.extractFeatures(media, dim = 64).collect()
    assert(f.length == media.count())
    assert(f.forall(_.feature.length == 64))
    f.foreach { mf =>
      val norm = math.sqrt(mf.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"norm $norm for ${mf.media_id}")
    }
  }

  test("real image features: different images far apart, resized copy stays near") {
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    def png(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    // horizontal gradient vs checkerboard: visually unrelated
    val gradient = png(128, 128, (x, _) => { val v = x * 2; (v << 16) | (v << 8) | v })
    val checker = png(128, 128, (x, y) =>
      if (((x / 16) + (y / 16)) % 2 == 0) 0xffffff else 0x000000)
    val rows = Seq(
      MediaRow(1L, MediaMeta("image", 128, 128, 0, 0L), gradient),
      MediaRow(2L, MediaMeta("image", 128, 128, 0, 0L), checker))
    val ds = spark.createDataset(rows)
    // resized copy of the gradient via the REAL resize path (64px side)
    val resized = Multimodal.resize(
      spark.createDataset(Seq(rows.head.copy(media_id = 3L))), maxSide = 64)
    val feats = Multimodal.extractFeatures(ds.union(resized), dim = 64)
      .collect().map(f => f.media_id -> f.feature).toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val farPair = cos(feats(1L), feats(2L))
    val nearPair = cos(feats(1L), feats(3L))
    assert(nearPair > 0.95, s"resized copy should stay near, cos=$nearPair")
    assert(farPair < 0.8, s"different images should be far, cos=$farPair")
    assert(nearPair - farPair > 0.2,
      s"feature space must separate: near=$nearPair far=$farPair")
  }

  test("pHash: resized copy within hamming 10, different images far; near-dup join finds the pair") {
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    def png(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val gradient = png(128, 128, (x, _) => { val v = x * 2; (v << 16) | (v << 8) | v })
    val blobs = png(128, 128, (x, y) =>
      if (math.hypot(x - 40, y - 70) < 30 || math.hypot(x - 100, y - 30) < 20)
        0xffffff else 0x101010)
    val rows = Seq(
      MediaRow(1L, MediaMeta("image", 128, 128, 0, 0L), gradient),
      MediaRow(2L, MediaMeta("image", 128, 128, 0, 0L), blobs))
    val resized = Multimodal.resize(
      spark.createDataset(Seq(rows.head.copy(media_id = 3L))), maxSide = 64)
    val all = spark.createDataset(rows).union(resized)
    val hashes = Multimodal.perceptualHashes(all)
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(3L)) <= 10,
      s"resized copy drifted ${ham(hashes(1L), hashes(3L))} bits")
    assert(ham(hashes(1L), hashes(2L)) > 16,
      s"unrelated images only ${ham(hashes(1L), hashes(2L))} bits apart")
    // the banded join surfaces exactly the (original, resized) pair
    val pairs = Multimodal.imageNearDupPairs(all, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L)), pairs.toString)
  }

  test("readMediaDir ingests files via binaryFile and decode works end to end") {
    import graft.multimodal.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("graft_media_").toFile
    for (i <- 1 to 3) {
      val bytes = Multimodal.syntheticPng(i.toLong, 0)
      java.nio.file.Files.write(
        new java.io.File(dir, s"img_$i.png").toPath, bytes)
    }
    java.nio.file.Files.write(
      new java.io.File(dir, "notes.txt").toPath, "not an image".getBytes)
    val media = Multimodal.readMediaDir(
      spark, dir.toString, "image", glob = Some("*.png"))
    assert(media.count() == 3, "glob must exclude the txt file")
    assert(media.collect().forall(m => m.meta.kind == "image" && m.bytes.nonEmpty))
    // distinct stable ids, real decode downstream
    assert(media.map(_.media_id).distinct().count() == 3)
    val decoded = Multimodal.decodeImages(media)
    assert(decoded.count() == 3)
    assert(decoded.collect().forall(d => d.width == 16 && d.height == 16))
  }

  test("features feed the ANN operators end to end") {
    val feats = Multimodal.extractFeatures(media, dim = 64)
      .toDF("vec_id", "embedding")
    val top = graft.functions.VectorOps.bruteForceTopK(
      feats.where(col("vec_id") < 3), feats, "vec_id", "embedding", k = 2)
    assert(top.count() == 6)
  }

  test("embedFeatures: deterministic, unit-norm, JL-preserves cosines") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(media, dim = 64)
    val a = Multimodal.embedFeatures(feats, outDim = 32)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val b = Multimodal.embedFeatures(feats, outDim = 32)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(a.map(_._1).sameElements(b.map(_._1)))
    a.zip(b).foreach { case ((_, va), (_, vb)) =>
      assert(va.sameElements(vb), "same seed must give identical embeddings") }
    a.foreach { case (id, v) =>
      assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5,
        s"embedding of $id not unit-norm") }
    // JL sanity: feature-space cosine and embedding-space cosine agree
    // within the k=32 distortion envelope on sampled pairs
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      val nx = math.sqrt(x.map(p => p.toDouble * p).sum)
      val ny = math.sqrt(y.map(p => p.toDouble * p).sum)
      d / (nx * ny)
    }
    val fm = feats.collect().map(f => f.media_id -> f.feature).toMap
    val em = a.toMap
    val ids = a.map(_._1).take(12)
    for (i <- ids; j <- ids if i < j) {
      val cf = cos(fm(i), fm(j)); val ce = cos(em(i), em(j))
      assert(math.abs(cf - ce) < 0.45,
        s"pair ($i,$j): feature cos $cf vs embedding cos $ce")
    }
  }

  test("mm05: every resized image pairs with its original in embedding space") {
    val pairs = SparkEntry.queries("mm05_media_embed_ann")(spark, sf)
      .collect()
    val nImages = media.filter(_.meta.kind == "image").count()
    assert(pairs.length == nImages,
      s"recall must be total: $nImages planted, ${pairs.length} recovered")
    assert(pairs.forall(_.getDouble(2) >= 0.8))
  }

  test("mm06: SQ8-compressed media retrieval returns the original at rank 1") {
    val rows = SparkEntry.queries("mm06_media_sq8")(spark, sf).collect()
    val nImages = media.filter(_.meta.kind == "image").count()
    assert(rows.length == nImages, s"$nImages queries, got ${rows.length}")
    assert(rows.forall(_.getBoolean(2)),
      "every resized query must retrieve its original from 1-byte/dim codes:\n" +
        rows.filterNot(_.getBoolean(2)).mkString("\n"))
    spark.catalog.clearCache()
  }

  test("resize shrinks only oversized media and preserves aspect bound") {
    val out = Multimodal.resize(media, maxSide = 128)
    assert(out.count() == media.count())
    assert(out.collect().forall(m =>
      math.max(m.meta.width, m.meta.height) <= 128 || m.bytes.nonEmpty))
    val untouched = media.filter(m => math.max(m.meta.width, m.meta.height) <= 128)
      .map(m => (m.media_id, m.bytes.length)).collect().toMap
    val after = out.map(m => (m.media_id, m.bytes.length)).collect().toMap
    untouched.foreach { case (id, len) => assert(after(id) == len) }
  }

  test("sampleFrames: one row per sampled frame, ordered and disjoint") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    val vids = media.filter(_.meta.kind == "video")
      .map(m => (m.media_id, math.max(1, (m.meta.durationMs / 500).toInt)))
      .collect().toMap
    val counts = frames.groupByKey(_.media_id).count().collect().toMap
    assert(counts == vids.map { case (k, v) => k -> v.toLong })
    // frame indices are dense 0..n-1
    val idx = frames.filter(_.media_id == vids.keys.head)
      .map(_.frame_idx).collect().sorted.toSeq
    assert(idx == idx.indices.toSeq)
  }

  test("payload stays distributed: plan has no collect-shaped exchange to driver") {
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("CollectLimit"))
  }

  test("audio features come from real PCM decode, tone energy in the right bin") {
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    // two tones an octave+ apart and a byte-identical re-synth of the first
    val low = Multimodal.syntheticWav(2L)   // 200 + 2*100 = 400 Hz
    val high = Multimodal.syntheticWav(30L) // 3200 Hz
    val rows = Seq(
      MediaRow(1L, MediaMeta("audio", 0, 0, 16000, 128L), low),
      MediaRow(2L, MediaMeta("audio", 0, 0, 16000, 128L), high),
      MediaRow(3L, MediaMeta("audio", 0, 0, 16000, 128L),
        Multimodal.syntheticWav(2L)))
    val feats = Multimodal.extractFeatures(spark.createDataset(rows), dim = 64)
      .collect().map(f => f.media_id -> f.feature).toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(feats(1L), feats(3L)) > 0.999, "same tone must match itself")
    assert(cos(feats(1L), feats(2L)) < 0.5,
      s"different tones must separate, cos=${cos(feats(1L), feats(2L))}")
    // the 400 Hz tone's energy concentrates at bin freq ~= 400 Hz
    val peak = feats(1L).zipWithIndex.maxBy(_._1)._2
    val peakFreq = (peak + 1).toDouble * 8000.0 / 65
    assert(math.abs(peakFreq - 400.0) < 8000.0 / 65,
      s"peak bin at $peakFreq Hz, expected ~400")
    // decodePcm really parses the WAV (rate + sample count)
    val (rate, samples) = Multimodal.decodePcm(low).get
    assert(rate == 16000 && samples.length == 2048)
    assert(samples.max <= 1.0 && samples.min >= -1.0)
  }

  test("video container demux: sampled frames are real decodable images") {
    import Multimodal._
    import spark.implicits._
    // 3 solid-color frames at 0/1000/2000 ms, sampled every 600 ms over
    // a 3000 ms clip: samples at 0,600,1200,1800,2400 map as-of to
    // frames 0,0,1,1,2
    val pngs = (0 until 3).map(i => Multimodal.syntheticPng(7L, i, size = 8))
    val clip = VideoContainer.encode(
      Seq((0L, pngs(0)), (1000L, pngs(1)), (2000L, pngs(2))))
    val row = MediaRow(7L, MediaMeta("video", 8, 8, 0, 3000L), clip)
    val out = sampleFrames(Seq(row).toDS(), everyMs = 600L)
      .collect().sortBy(_.frame_idx)
    assert(out.length == 5)
    assert(out.map(_.frame_bytes.toSeq).toSeq ==
      Seq(pngs(0), pngs(0), pngs(1), pngs(1), pngs(2)).map(_.toSeq))
    // every emitted payload decodes as an actual 8x8 image
    out.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame_bytes))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8)
    }
    // round-trip: container decode returns the exact frames
    assert(VideoContainer.decode(clip).get.map(_._2.toSeq) == pngs.map(_.toSeq))
    // non-container payloads keep the slice fallback, not an error
    val raw = MediaRow(8L, MediaMeta("video", 8, 8, 0, 1000L),
      Array.fill[Byte](100)(3))
    assert(sampleFrames(Seq(raw).toDS(), 500L).collect().length == 2)
  }

  test("audio spectral hash is gain-invariant; near-dup join finds scaled copies") {
    import Multimodal._
    // invariance at the kernel: a half-volume copy of the same recording
    // hashes identically (band magnitudes and their median scale equally)
    val wav = syntheticWav(7L)
    val quiet = scaleWavGain(wav, 0.5)
    def hashOf(bytes: Array[Byte]): Long = {
      val (rate, samples) = decodePcm(bytes).get
      spectralHashOf(audioFeature(rate, samples, 64))
    }
    assert(hashOf(wav) == hashOf(quiet),
      "gain scaling must not move the spectral sign hash")
    // and a different tone hashes differently
    assert(hashOf(wav) != hashOf(syntheticWav(8L)))

    // end to end: every planted gain-scaled duplicate pairs with its
    // original through the banded Hamming join
    val meta = MediaMeta("audio", 0, 0, 16000, 128L)
    val clips = (0L until 12L).map(i =>
      MediaRow(i, meta, syntheticWav(i))).toDS()
    val dupes = clips.map(m => m.copy(media_id = m.media_id + 1000L,
      bytes = scaleWavGain(m.bytes, 0.5)))
    val pairs = audioNearDupPairs(clips.union(dupes), maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    for (i <- 0L until 12L)
      assert(pairs.contains((i, i + 1000L)),
        s"planted scaled copy of clip $i not recovered: $pairs")
  }

  test("sampleFrames clamps to frame 0 when the container starts late") {
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow, VideoContainer}
    // a container whose FIRST frame starts at 700ms: samples at t=0 and
    // t=500 precede every frame timestamp and must clamp to frame 0 (the
    // as-of rule's floor), not vanish — the mm12 oracle replays this
    // clamp with a LEFT join + COALESCE (ADVICE r10)
    val f0 = Multimodal.syntheticPng(42L, 0)
    val f1 = Multimodal.syntheticPng(42L, 1)
    val late = VideoContainer.encode(Seq((700L, f0), (1400L, f1)))
    val m = MediaRow(42L, MediaMeta("video", 16, 16, 0, 2000L), late)
    val frames = Multimodal.sampleFrames(spark.createDataset(Seq(m)), 500L)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 4) // 2000ms / 500ms
    assert(frames(0).frame_bytes.sameElements(f0), "t=0 must clamp to frame 0")
    assert(frames(1).frame_bytes.sameElements(f0), "t=500 must clamp to frame 0")
    assert(frames(2).frame_bytes.sameElements(f0)) // 700 <= 1000
    assert(frames(3).frame_bytes.sameElements(f1)) // 1400 <= 1500
  }

  // ---- float-vs-pinned drift rot guards (r10 verdict item 4) ------------
  // The float kernels (mm01-mm06) are the production path; the pinned
  // fixed-point twins (mm07-mm15) are the oracle-gated path. These pin
  // the two TOGETHER on the committed fixture corpus, so a refactor of
  // either side that drifts from the other fails here — the
  // DedupOpsSuite trained-vs-pinned recall-floor pattern applied to the
  // media kernels.

  /** Fixture planes → the grayscale PNG they came from (the synthetic
    * frames are grayscale and the plane keeps one channel, so RGB =
    * (v,v,v) reconstructs luma EXACTLY — 0.299+0.587+0.114 = 1). */
  private def planesToPng(px: Map[(Int, Int), Int], size: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (((y, x), v) <- px) img.setRGB(x, y, (v << 16) | (v << 8) | v)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** Float 16-point orthonormal DCT-II zigzag coefficients of a plane —
    * the test-local float replay of the PINNED integer transform
    * ([[graft.multimodal.PinnedMediaMath.dctBasis16]] is this basis
    * fixed-pointed at 2^15), used to pin float math against pinned math
    * sign by sign. */
  private def floatDctZigzag(px: Map[(Int, Int), Int]): Array[Double] = {
    val n = 16
    val c = Array.tabulate(n, n)((k, i) =>
      math.sqrt((if (k == 0) 1.0 else 2.0) / n) *
        StrictMath.cos(math.Pi * (2 * i + 1) * k / (2 * n)))
    val tmp = Array.tabulate(n, n)((u, y) =>
      (0 until n).map(x => px((y, x)) * c(u)(x)).sum)
    val spec = Array.tabulate(n, n)((u, v) =>
      (0 until n).map(y => tmp(u)(y) * c(v)(y)).sum)
    graft.multimodal.PinnedMediaMath.zigzag16
      .map { case (u, v, _, _) => spec(u)(v) }.toArray
  }

  private def fixtureImagePlanes(path: String): Map[Long, Map[(Int, Int), Int]] =
    spark.read.parquet(path)
      .select("media_id", "y", "x", "v").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => ((r.getInt(1), r.getInt(2)), r.getInt(3))).toMap
      }

  test("rot guard: float image pHash cannot drift from the fixture boundary or the pinned DCT") {
    import graft.multimodal.{MediaFixture, PinnedMediaMath}
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    val planes = fixtureImagePlanes(s"${MediaFixture.dir}/image_planes")
    assert(planes.size == 80, s"fixture image corpus changed size: ${planes.size}")
    // (a) decode-boundary pin at the HASH level: the float kernel over
    // the live payloads must equal the float kernel over the committed
    // planes exactly — any live-decoder or channel-handling drift lands
    // as nonzero hamming here even if the raw-plane gate (mm07) is edited
    val live = Multimodal.perceptualHashes(
        MediaFixture.media(spark).filter(_.meta.kind == "image"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val replayRows = planes.toSeq.map { case (id, px) =>
      MediaRow(id, MediaMeta("image", 16, 16, 0, 0L), planesToPng(px))
    }
    val replay = Multimodal.perceptualHashes(
        spark.createDataset(replayRows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live.keySet == replay.keySet && live.size == 80)
    for ((id, h) <- live)
      assert(h == replay(id),
        s"image $id: live-decode float pHash != fixture-replay float pHash " +
          s"(hamming ${java.lang.Long.bitCount(h ^ replay(id))})")
    // (b) float-math-vs-pinned-math pin: the float 16-grid DCT's zigzag
    // coefficient SIGNS must agree with the pinned integer transform's
    // (fixed-point error can straddle zero only within a whisker)
    val pinnedCoeffs = PinnedMediaMath.dctCoeffs(spark)
      .select("media_id", "z", "o").collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    var checked = 0
    for ((id, px) <- planes) {
      val fl = floatDctZigzag(px)
      for (z <- 0 until 64) {
        val p = pinnedCoeffs((id, z))
        // pinned = float * 2^30 ± rounding; skip sums within the whisker
        if (math.abs(p) > (1L << 20)) {
          assert(fl(z).sign == p.sign.toDouble,
            s"DCT sign drift: image $id z=$z float=${fl(z)} pinned=$p")
          checked += 1
        }
      }
    }
    // on the r18 md5-noise corpus nearly every coefficient carries real
    // energy (the gradient corpus cleared ~38%); either way the guard
    // cannot pass vacuously
    assert(checked > 1500, s"only $checked coefficient signs were checkable")
  }

  test("rot guard: float video frame pHash cannot drift from the fixture boundary") {
    import graft.multimodal.{MediaFixture, PinnedMediaMath}
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    // demux each fixture video LIVE, hash every frame with the float
    // kernel; replay the same kernel over the committed frame planes —
    // keyed media_id*4+frame_idx (GVC1 clips carry 4 frames). Equality
    // pins demux + per-frame decode + hash input handling end to end.
    val liveFrames = MediaFixture.media(spark).filter(_.meta.kind == "video")
      .flatMap { m =>
        Multimodal.VideoContainer.decode(m.bytes).toSeq.flatMap {
          _.zipWithIndex.map { case ((_, png), idx) =>
            MediaRow(m.media_id * 4 + idx,
              MediaMeta("image", 16, 16, 0, 0L), png)
          }
        }
      }
    val live = Multimodal.perceptualHashes(liveFrames)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // frame planes carry (media_id, frame_idx): re-key to match
    val framePlanes = spark.read.parquet(s"${MediaFixture.dir}/video_frames")
      .select((col("media_id") * 4 + col("frame_idx")).as("media_id"),
        col("y"), col("x"), col("v")).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => ((r.getInt(1), r.getInt(2)), r.getInt(3))).toMap
      }
    assert(framePlanes.size == 320,
      s"fixture frame corpus changed size: ${framePlanes.size}")
    val replayRows = framePlanes.toSeq.map { case (id, px) =>
      MediaRow(id, MediaMeta("image", 16, 16, 0, 0L), planesToPng(px))
    }
    val replay = Multimodal.perceptualHashes(spark.createDataset(replayRows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live.keySet == replay.keySet && live.size == 320)
    for ((id, h) <- live)
      assert(h == replay(id),
        s"frame $id: live-demux float pHash != fixture-replay float pHash " +
          s"(hamming ${java.lang.Long.bitCount(h ^ replay(id))})")
  }

  test("rot guard: float quadrature band signs agree with the pinned audio twin") {
    import graft.multimodal.{MediaFixture, PinnedMediaMath}
    // pinned: integer quadrature sums over the committed samples; float:
    // the same 64-phase comb over the LIVE decodePcm doubles — the two
    // differ only by the fixed-point tables (2^14) and sample scale
    // (2^15), so every band's re/im SIGN must agree except where the sum
    // is a rounding-scale whisker
    val pinned = PinnedMediaMath.spectrum(spark)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val clips = MediaFixture.media(spark).filter(_.meta.kind == "audio")
      .collect()
    assert(clips.length == 80 && pinned.size == 80 * 8)
    var checked = 0
    clips.foreach { m =>
      val (_, samples) = Multimodal.decodePcm(m.bytes).get
      for (band <- 1 to 8) {
        var re = 0.0; var im = 0.0
        var i = 0
        while (i < samples.length) {
          val ph = 2 * math.Pi * ((band.toLong * i) % 64) / 64.0
          re += samples(i) * StrictMath.cos(ph)
          im += samples(i) * StrictMath.sin(ph)
          i += 1
        }
        val (pRe, pIm) = pinned((m.media_id, band))
        // fixed-point whisker: |pinned| below ~1 sample-unit (32768*16384
        // per unit float) can legitimately straddle zero
        val whisker = 32768.0 * 16384.0 * 0.5
        if (math.abs(pRe) > whisker) {
          assert(re.sign == pRe.sign.toDouble,
            s"re sign drift: clip ${m.media_id} band $band float=$re pinned=$pRe")
          checked += 1
        }
        if (math.abs(pIm) > whisker) {
          assert(im.sign == pIm.sign.toDouble,
            s"im sign drift: clip ${m.media_id} band $band float=$im pinned=$pIm")
          checked += 1
        }
      }
    }
    // the guard must not be vacuous: on the r18 md5-noise corpus the
    // band random walks are far outside the whisker almost everywhere
    // (the sine corpus cleared ~half)
    assert(checked > 500, s"only $checked band signs were checkable")
  }

  test("video near-dup (mm16): the pair set is EXACTLY the planted " +
      "copies, each on ALL frames at hamming 0") {
    // the oracle proves Spark == DuckDB; this pins the semantics being
    // right at all. Over the r18 md5-noise fixture the gate is
    // edge-set-EXACT: identical frame planes must survive the banded
    // join, the alignment filter, and the every-frame rule as a
    // max_hamming-0 pair for every planted video — and near-uniform
    // hashes mean NOTHING ELSE may pair (incidental ≤4-hamming pairs
    // on all 4 aligned frames are ~(2^-44)^4 per pair).
    import graft.multimodal.{MediaFixture, PinnedMediaMath}
    val pairs = PinnedMediaMath.videoNearDupPinned(spark, maxHamming = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toSet
    val videoIds = MediaFixture.media(spark)
      .filter(_.meta.kind == "video").collect().map(_.media_id).toSet
    assert(videoIds.nonEmpty)
    assert(pairs == videoIds.map(id => ((id, id + 1000000L), 0)),
      s"pair set must be exactly the planted copies; got ${pairs.size} " +
        s"pairs for ${videoIds.size} videos")
  }

  test("noise fixture: mm14/mm15 pair sets are EXACTLY the planted " +
      "copies at hamming 0") {
    // the r18 fixture regeneration's point (r17 verdict item 2): the
    // gradient corpus had 1712 of 3160 image base pairs at hamming 0,
    // so the near-dup gates could only assert planted-pairs-APPEAR.
    // md5-noise payloads hash ~uniformly, so the full output IS the
    // planted edge set — an exclusive-pair oracle, per modality.
    import graft.multimodal.{MediaFixture, PinnedMediaMath}
    val byKind = MediaFixture.media(spark).collect()
      .groupBy(_.meta.kind).view.mapValues(_.map(_.media_id).toSet).toMap
    val img = PinnedMediaMath.imageNearDupPinned(spark, maxHamming = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toSet
    assert(img == byKind("image").map(id => ((id, id + 1000000L), 0)),
      s"image pair set must be exactly the 80 planted copies; got ${img.size}")
    val aud = PinnedMediaMath.audioNearDupPinned(spark, maxHamming = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toSet
    assert(aud == byKind("audio").map(id => ((id, id + 1000000L), 0)),
      s"audio pair set must be exactly the 80 planted copies; got ${aud.size}")
  }

  test("fused VideoFrameHashes expression: bit-equal to the per-frame " +
      "SQL twin; junk and truncated containers are NULL") {
    // w31's kernel: GVC1 demux + per-frame decode + per-frame pinned
    // pHash in one pass. The declarative twin is framePhashOf over the
    // committed frame-planes fixture, packed per frame.
    import graft.multimodal.{MediaFixture, PinnedMediaMath, VideoFrameHashes}
    val clips = MediaFixture.media(spark)
      .filter(_.meta.kind == "video").toDF()
      .select("media_id", "bytes")
    val fused = clips.select(col("media_id"),
        VideoFrameHashes.column(spark, col("bytes")).as("hashes"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaSql = PinnedMediaMath.framePhashOf(spark,
        spark.read.parquet(s"${MediaFixture.dir}/video_frames")
          .select(col("media_id"), col("frame_idx"), col("y"), col("x"),
            col("v")))
      .select(col("media_id"), col("frame_idx"),
        PinnedMediaMath.packSimhash(col("hash_hi"), col("hash_lo"))
          .as("simhash"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(fused.nonEmpty && fused == viaSql,
      "fused demux+decode+hash kernel diverged from the per-frame twin")
    // dead-letter contract: junk bytes AND a truncated GVC1 container
    // both hash to NULL (a throwing poisonous payload would wedge an
    // at-least-once stream in a retry loop forever)
    val goodClip = clips.as[(Long, Array[Byte])].head()._2
    // a length-field bomb: 'GVC1' + 1 frame whose declared PNG length
    // is ~2 GB — must fail as a framing error mapped to NULL, never as
    // a multi-GB allocation (OutOfMemoryError escapes every dead-letter
    // catch and kills the executor — code-review finding)
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.write("GVC1".getBytes("US-ASCII"))
      out.writeInt(1); out.writeLong(0L); out.writeInt(0x7FF00000)
      out.flush(); bos.toByteArray
    }
    val junk = Seq(
      (1L, "not a container".getBytes("UTF-8")),
      (2L, goodClip.take(goodClip.length / 2)), // GVC1 magic, torn framing
      (3L, bomb)
    ).toDF("media_id", "bytes")
    val nulls = junk
      .select(VideoFrameHashes.column(spark, col("bytes")).as("h"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)),
      s"undecodable video payloads must hash to NULL: ${nulls.toSeq}")
  }

  test("fused MediaPhash expression: bit-equal to the pixel-row SQL " +
      "twin; undecodable bytes are NULL, not an exception") {
    // r16 verdict prescription 5: the streamed sink's hot path is now
    // one codegen'd bytes→hash expression (no per-pixel rows). The
    // pixel-row dataflow (PinnedMediaMath.phashOf — DuckDB-replayed by
    // the mm08/mm14/w28 oracles) stays the twin; the fused kernel must
    // reproduce it bit for bit on the real ImageIO-decoded fixture.
    import graft.multimodal.{MediaFixture, MediaPhash, PinnedMediaMath}
    val images = MediaFixture.media(spark)
      .filter(_.meta.kind == "image").toDF()
      .select("media_id", "bytes")
    val fused = images.select(col("media_id"),
        MediaPhash.column(spark, col("bytes")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val viaSql = PinnedMediaMath.phash(spark)
      .select(col("media_id"),
        PinnedMediaMath.packSimhash(col("hash_hi"), col("hash_lo"))
          .as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(fused.nonEmpty && fused == viaSql,
      "fused decode+DCT+sign kernel diverged from the pinned SQL twin")
    // dead-letter contract: a payload ImageIO rejects maps to NULL so
    // the sink can spool it, never to a mid-stage exception
    val junk = Seq(
      (1L, Array[Byte](0x50, 0x4E, 0x47)), // a PNG magic fragment
      (2L, Array.emptyByteArray)
    ).toDF("media_id", "bytes")
    val nulls = junk
      .select(MediaPhash.column(spark, col("bytes")).as("h")).collect()
    assert(nulls.forall(_.isNullAt(0)),
      "undecodable payloads must hash to NULL (dead-letter), got " +
        nulls.mkString(","))
    // the shared kernel drives both eval paths: the driver-side call
    // must agree with the codegen'd column result per id
    val viaKernel = images.as[(Long, Array[Byte])].collect().map {
      case (id, b) =>
        id -> Option(MediaPhash.computeOrNull(b)).map(_.longValue())
    }.toMap
    assert(viaKernel.forall { case (id, h) => h.contains(fused(id)) },
      "interpreted kernel disagrees with the codegen'd column path")
  }

  test("fused AudioBandHash expression: bit-equal to the sample-row SQL " +
      "twin; undecodable bytes are NULL") {
    // w29's kernel: PCM decode + 32-band quadrature sign hash in one
    // pass. The declarative sample-row dataflow below is the band+sign
    // stage of PinnedMediaMath.audioNearDupPinned (the mm15/w29
    // oracles' Spark half) over the committed fixture, un-planted —
    // the fused kernel must reproduce it bit for bit from raw bytes.
    import graft.multimodal.{AudioBandHash, MediaFixture, PinnedMediaMath}
    val clips = MediaFixture.media(spark)
      .filter(_.meta.kind == "audio").toDF()
      .select("media_id", "bytes")
    val fused = clips.select(col("media_id"),
        AudioBandHash.column(spark, col("bytes")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val cs = PinnedMediaMath.cosSin64.toDF("j2", "cc", "ss")
    val bp = PinnedMediaMath.bandPow32.toDF("band", "pw")
    val viaSql = spark.read.parquet(s"${MediaFixture.dir}/audio_samples")
      .withColumn("band", explode(array((1 to 32).map(lit): _*)))
      .withColumn("j", pmod(col("band") * col("i"), lit(64)))
      .join(broadcast(cs), col("j") === col("j2"))
      .groupBy(col("media_id"), col("band"))
      .agg(sum(col("s") * col("cc")).as("x_re"),
        sum(col("s") * col("ss")).as("x_im"))
      .join(broadcast(bp), "band")
      .groupBy("media_id")
      .agg(sum(when(col("x_re") > 0, col("pw")).otherwise(0L)).as("lo"),
        sum(when(col("x_im") > 0, col("pw")).otherwise(0L)).as("hi"))
      .select(col("media_id"),
        PinnedMediaMath.packSimhash(col("hi"), col("lo")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(fused.nonEmpty && fused == viaSql,
      "fused decode+band-sign kernel diverged from the sample-row twin")
    // dead-letter contract: junk bytes hash to NULL, never an exception
    val junk = Seq((1L, Array[Byte](0x52, 0x49, 0x46, 0x46)))
      .toDF("media_id", "bytes")
    assert(junk.select(AudioBandHash.column(spark, col("bytes")))
      .head().isNullAt(0),
      "undecodable audio must hash to NULL (dead-letter)")
  }

  test("mm17 cross-modal closure: the derivatives co-cluster ONLY " +
      "through the base item") {
    // the oracle proves Spark == DuckDB; this pins the planted
    // structure being right at all: per base image m, exactly ONE image
    // edge (m, m+1e6) — the re-encode — and exactly ONE text edge
    // (m, m+2e6) — the caption-only repost. The derivatives share no
    // modality (one has no image; their captions are unrelated), so
    // their co-clustering is the transitive closure doing real work.
    import graft.multimodal.PinnedMediaMath
    val baseIds = (0L until 80L).toSet
    val (img, txt, items) = PinnedMediaMath.crossModalEdges(spark, 4)
    val imgPairs = img.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val txtPairs = txt.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(imgPairs == baseIds.map(m => (m, m + 1000000L)),
      "image edges must be exactly base <-> re-encode")
    assert(txtPairs == baseIds.map(m => (m, m + 2000000L)),
      "text edges must be exactly base <-> repost")
    assert(items.count() == baseIds.size * 3L)
    val clusters = PinnedMediaMath.crossModalDedupPinned(spark, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == baseIds.size * 3)
    baseIds.foreach { m =>
      assert(clusters(m) == m && clusters(m + 1000000L) == m &&
        clusters(m + 2000000L) == m,
        s"all three items of $m must fold to cluster $m")
    }
  }

  test("mm19 pinned resize drift: every structured image's hash stays " +
      "far inside the random-hash expectation") {
    // the invariance CLAIM behind mm03's float suite pin, restated on
    // the pinned chain: box-resizing a structured plane moves its
    // 64-bit pHash by at most ~20 bits (measured 10..20 over the 80-id
    // gradient corpus) where unrelated hashes sit at expectation 32.
    // The pipeline is fully deterministic, so the bound is a pin, not
    // a statistic.
    val drift = graft.multimodal.PinnedMediaMath.resizeDriftPinned(spark)
      .select("hamming").as[Int].collect()
    assert(drift.length == 80)
    assert(drift.max <= 20,
      s"resize drift regressed: max ${drift.max} bits (pinned <= 20)")
  }

  test("mm20 pinned resized retrieval: every resized query recovers its " +
      "original at rank 1 under the quantized cosine") {
    // mm05/mm06's invariance-of-retrieval claim on the pinned serving
    // stack: 80/80 recovery, deterministic (and hash-gated by the mm20
    // oracle; this pin states the CLAIM the hash alone wouldn't).
    val r = graft.multimodal.PinnedMediaMath.resizedRetrievalPinned(spark)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect()
    assert(r.length == 80)
    val missed = r.filter { case (q, n) => n != q - 1000000L }
    assert(missed.isEmpty, s"resized queries lost their originals: " +
      missed.take(5).mkString(", "))
  }
}
