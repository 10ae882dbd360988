package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads travel as opaque `binary` columns beside a typed metadata
  * struct; decode / feature-extract / resize / frame-sample are
  * per-partition batch operators.
  *
  * Image decode, resize AND feature extraction are REAL for every
  * format the JDK's `javax.imageio` reads (PNG/JPEG/BMP/GIF) — actual
  * pixel decode, actual luma, actual resampling, and histogram+DCT
  * perceptual features from the decoded grid — with a deterministic
  * fallback for payloads that aren't decodable images (formats needing
  * native codecs). Video frame sampling is REAL for the documented
  * [[VideoContainer]] format (timestamped length-prefixed PNG frames —
  * the container stands in for codec demuxing, which needs native
  * libraries this environment does not ship): frames are selected
  * as-of each sample timestamp and every emitted payload is an
  * ImageIO-decodable image. Non-image feature embedding remains a
  * deterministic STUB kernel; swapping it changes a function body,
  * none of the dataflow.
  *
  * Scale notes: payload bytes stay in executors end to end (no
  * collect); per-partition `grouped(batchSize)` mirrors how a real
  * vectorized decode (GPU/native batch API) wants its input; frame
  * sampling is an explode — linear output, shuffle-free.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  final case class MediaMeta(
      kind: String,        // image | audio | video
      width: Int, height: Int,          // image/video
      sampleRate: Int,                  // audio
      durationMs: Long)                 // audio/video

  final case class MediaRow(media_id: Long, meta: MediaMeta, bytes: Array[Byte])

  final case class DecodedImage(
      media_id: Long, width: Int, height: Int, channels: Int,
      meanLuma: Double)

  final case class MediaFeature(media_id: Long, feature: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Minimal deterministic video container: `GVC1` magic, frame count,
    * then (timestampMs: i64, length: i32, png bytes) per frame. A stand-
    * in for real demuxing (mp4/mkv need native codec libraries), but the
    * framing, timestamps, and per-frame image payloads are all real —
    * a decoder swap touches only this object. */
  object VideoContainer {
    private val Magic = Array[Byte]('G', 'V', 'C', '1')

    def encode(frames: Seq[(Long, Array[Byte])]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.write(Magic)
      out.writeInt(frames.size)
      frames.foreach { case (ts, png) =>
        out.writeLong(ts); out.writeInt(png.length); out.write(png)
      }
      out.flush()
      bos.toByteArray
    }

    /** Frames as (timestampMs, pngBytes); None when `bytes` is not a
      * GVC1 payload (malformed framing is an error, not a None — silent
      * coercion of a corrupt container would hide data loss). */
    def decode(bytes: Array[Byte]): Option[Seq[(Long, Array[Byte])]] =
      if (bytes.length < 8 || !bytes.startsWith(Magic)) None
      else {
        val in = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes, 4, bytes.length - 4))
        val n = in.readInt()
        require(n >= 0, s"negative frame count $n")
        Some((0 until n).map { _ =>
          val ts = in.readLong()
          val len = in.readInt()
          // bound BEFORE allocating: a corrupt length field must fail
          // as the usual framing error (readFully would catch it a
          // moment later anyway), never as a multi-GB allocation — an
          // OutOfMemoryError escapes every dead-letter catch and kills
          // the executor (code-review finding)
          require(len >= 0 && len <= bytes.length,
            s"frame length $len outside container of ${bytes.length} bytes")
          val png = new Array[Byte](len)
          in.readFully(png)
          (ts, png)
        })
      }
  }

  /** Solid-color PNG — the deterministic synthetic frame payload (color
    * from the (id, index) hash), decodable by any ImageIO consumer. */
  private[graft] def syntheticPng(id: Long, idx: Int, size: Int = 16): Array[Byte] = {
    // id-seeded low-frequency gradient (never all-black: luma floor 16),
    // so each image has structure a perceptual hash can latch onto and
    // distinct ids produce distinct patterns
    val seed = (id * 31 + idx) * 2654435761L
    val (dx, dy, base) =
      (((seed >> 8) & 7).toInt + 1, ((seed >> 16) & 7).toInt + 1,
        ((seed >> 24) & 0x7F).toInt + 16)
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        val v = (base + x * dx + y * dy) & 0xFF
        val v2 = math.max(v, 16)
        img.setRGB(x, y, (v2 << 16) | (v2 << 8) | v2)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** First md5 byte of `key` (0..255) — the fixture corpus' payload
    * entropy source. md5 noise makes perceptual hashes
    * NEAR-UNIFORM across ids (expected pairwise Hamming 32), which the
    * gradient/sine payloads are not: the r17 sf-fixture measurement
    * found 1712 of 3160 gradient-image base pairs at Hamming 0, so
    * exclusive planted-pair oracles were impossible over them (the mm17
    * finding; r17 verdict item 2). */
  private def md5NoiseByte(key: String): Int =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("US-ASCII"))(0) & 0xFF

  /** md5-noise sibling of [[syntheticPng]]: grayscale PNG with pixel
    * v(y,x) = first md5 byte of "p:id:idx:y:x" — per-pixel independent
    * noise, so distinct ids hash ~uniformly and incidental near-dup
    * pairs at Hamming ≤ 4 are ~2^-44 per pair. The NOISE corpus backs
    * the committed [[MediaFixture]] (exclusive edge-set oracles);
    * [[syntheticPng]]'s low-frequency gradient stays the corpus for the
    * resize-invariance faces (mm03/mm05/mm06), which need structure
    * that survives resampling. */
  private[graft] def noisePng(id: Long, idx: Int, size: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        val v = md5NoiseByte(s"p:$id:$idx:$y:$x")
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** md5-noise sibling of [[syntheticWav]]: 16-bit mono PCM WAV whose
    * sample i is the first two md5 bytes of "a:id:i" read big-endian as
    * a signed short — full-range independent noise, so the 32 quadrature
    * band sums are independent random walks per id and the 64-bit sign
    * hash is ~uniform (the audio face of [[noisePng]]'s entropy
    * argument). Still gain-invariant-hashable and losslessly
    * PCM-round-trippable like any short-valued WAV. */
  private[graft] def noiseWav(id: Long, sampleRate: Int = 16000,
      nSamples: Int = 2048): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"a:$id:$i".getBytes("US-ASCII"))
      buf.putShort((((d(0) & 0xFF) << 8) | (d(1) & 0xFF)).toShort)
      i += 1
    }
    buf.array()
  }

  /** 16-bit mono PCM WAV of a pure sine tone — the deterministic
    * synthetic audio payload, decodable by `javax.sound.sampled`. */
  private[graft] def syntheticWav(id: Long, sampleRate: Int = 16000,
      nSamples: Int = 2048): Array[Byte] = {
    val freq = 200.0 + (id % 40) * 100.0
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      // StrictMath: Math.sin is allowed 1-ulp platform variance, and the
      // committed MediaFixture planes pin these samples bit-for-bit
      val s = StrictMath.sin(2 * math.Pi * freq * i / sampleRate)
      buf.putShort((s * 20000).toShort)
      i += 1
    }
    buf.array()
  }

  /** PCM samples in [-1, 1] plus the sample rate, decoded with the
    * JDK's `javax.sound.sampled` (WAV/AIFF/AU — no native deps); None
    * when the payload isn't a supported audio container. */
  private[graft] def decodePcm(bytes: Array[Byte]): Option[(Int, Array[Double])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16) None
      else {
        val raw = in.readAllBytes()
        val order =
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        val sb = java.nio.ByteBuffer.wrap(raw).order(order).asShortBuffer()
        val ch = math.max(1, fmt.getChannels)
        val out = new Array[Double](sb.remaining() / ch)
        var i = 0
        while (i < out.length) {
          out(i) = sb.get(i * ch) / 32768.0 // first channel
          i += 1
        }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Goertzel magnitude spectrum at `dim` evenly spaced frequencies up
    * to Nyquist, unit-normalized — a real signal-domain feature (pure
    * tones land their energy in the matching bin), no FFT library. */
  private[graft] def audioFeature(sampleRate: Int,
      samples: Array[Double], dim: Int): Array[Float] = {
    val n = math.min(samples.length, 4096)
    val v = new Array[Float](dim)
    var k = 0
    while (k < dim) {
      val freq = (k + 1).toDouble * (sampleRate / 2.0) / (dim + 1)
      val w = 2 * math.Pi * freq / sampleRate
      val coeff = 2 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < n) {
        s0 = samples(i) + coeff * s1 - s2
        s2 = s1; s1 = s0
        i += 1
      }
      v(k) = math.sqrt(s1 * s1 + s2 * s2 - coeff * s1 * s2).toFloat
      k += 1
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum).max(1e-9)
    v.map(x => (x / norm).toFloat)
  }

  /** Deterministic synthetic media corpus derived from the documents
    * table: text bytes become the payload, metadata from doc stats. Kind
    * cycles image/audio/video so every operator has coverage.
    *
    * `noisePayloads = true` swaps the gradient/sine payload generators
    * for their md5-noise siblings ([[noisePng]]/[[noiseWav]]) — the
    * committed-fixture corpus ([[MediaFixture]]), whose near-uniform
    * perceptual hashes let the near-dup oracles (mm14/mm15/mm16 and the
    * streamed twins) pin EXACT edge sets. The default gradient/sine
    * corpus stays for the resize/gain-invariance faces, which need
    * low-frequency structure. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame,
      noisePayloads: Boolean = false): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        col("text"),
        (col("doc_id") % 3).as("k"))
      .select(col("media_id"),
        struct(
          when(col("k") === 0, "image").when(col("k") === 1, "audio")
            .otherwise("video").as("kind"),
          (pmod(col("media_id"), lit(64)) * 16 + 16).cast("int").as("width"),
          (pmod(col("media_id"), lit(48)) * 16 + 16).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (length(col("text")) * 10).cast("long").as("durationMs")).as("meta"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
      // every payload is REAL media: images are PNGs, video payloads are
      // containers of 4 evenly spaced PNG frames, audio payloads are
      // sine-tone WAVs — so downstream decode/demux exercises actual
      // codecs; executed per-row in executors, never on the driver
      .map { m =>
        def png(idx: Int): Array[Byte] =
          if (noisePayloads) noisePng(m.media_id, idx)
          else syntheticPng(m.media_id, idx)
        m.meta.kind match {
          case "video" =>
            val dur = math.max(4L, m.meta.durationMs)
            val frames = (0 until 4).map(i => (i * dur / 4, png(i)))
            m.copy(bytes = VideoContainer.encode(frames))
          case "audio" =>
            m.copy(bytes =
              if (noisePayloads) noiseWav(m.media_id, m.meta.sampleRate)
              else syntheticWav(m.media_id, m.meta.sampleRate))
          case _ =>
            m.copy(bytes = png(0))
        }
      }
  }

  /** Ingest a directory of media files as [[MediaRow]]s through Spark's
    * `binaryFile` source — the production loading path for raw media
    * sitting in object storage: distributed file listing, per-file
    * binary content rows, pushdown on path glob and modifiedAfter.
    * media_id is the stable xxhash64 of the file path; width/height and
    * duration are filled by downstream decode (metadata here records
    * only payload size). */
  def readMediaDir(spark: SparkSession, path: String, kind: String,
      glob: Option[String] = None): Dataset[MediaRow] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile")
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(path)
      .select(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("path")).as("media_id"),
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.lit(kind).as("kind"),
          org.apache.spark.sql.functions.lit(0).as("width"),
          org.apache.spark.sql.functions.lit(0).as("height"),
          org.apache.spark.sql.functions.lit(0).as("sampleRate"),
          org.apache.spark.sql.functions.col("length").as("durationMs"))
          .as("meta"),
        org.apache.spark.sql.functions.col("content").as("bytes"))
      .as[MediaRow]
  }

  /** Decodes a payload with the JDK's ImageIO (PNG/JPEG/BMP/GIF, no
    * native deps); None when the bytes aren't a supported image. */
  private[multimodal] def decodeWithImageIO(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes.length < 8) None
    else
      try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          .map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                // Rec. 601 luma from the sRGB pixel
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            DecodedImage(0L, w, h,
              channels = img.getColorModel.getNumComponents,
              meanLuma = sum / (w.toLong * h))
          }
      } catch { case _: java.io.IOException => None }

  /** Image decode: REAL for JDK-readable formats (dimensions, channel
    * count and mean luma from actual pixels); deterministic fallback
    * (metadata dims, byte-mean luma) for undecodable payloads. The
    * batched per-partition shape is the contract a vectorized/native
    * decode drops into. */
  def decodeImages(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          decodeWithImageIO(m.bytes) match {
            case Some(d) => d.copy(media_id = m.media_id)
            case None =>
              // fallback for non-image payloads: deterministic fake so
              // the pipeline shape stays testable without real media
              val luma =
                if (m.bytes.isEmpty) 0.0
                else m.bytes.map(b => (b & 0xff).toDouble).sum / m.bytes.length
              DecodedImage(m.media_id, m.meta.width, m.meta.height,
                channels = 3, meanLuma = luma)
          }
        }
      }
    }
  }

  /** REAL image feature kernel: grayscale histogram + low-frequency 2D
    * DCT coefficients (the pHash family) computed from the actual ImageIO
    * decode — resampled to a fixed grid so a resized copy of an image
    * lands near the original while visually different images land far
    * apart (pinned in MultimodalSuite). Layout: `dim/2` luma-histogram
    * bins followed by `dim - dim/2` zigzag DCT coefficients (DC excluded
    * — brightness alone shouldn't dominate), L2-normalized. */
  private[multimodal] def imageFeature(
      img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val grid = 32
    // resample to grid×grid (bilinear) and take Rec. 601 luma
    val small = new java.awt.image.BufferedImage(
      grid, grid, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, grid, grid, null)
    g.dispose()
    val luma = Array.ofDim[Double](grid, grid)
    var y = 0
    while (y < grid) {
      var x = 0
      while (x < grid) {
        val rgb = small.getRGB(x, y)
        luma(y)(x) = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val histBins = dim / 2
    val hist = new Array[Double](histBins)
    luma.foreach(_.foreach { v =>
      hist(math.min(histBins - 1, (v / 256.0 * histBins).toInt)) += 1
    })
    val histNorm = hist.map(_ / (grid.toDouble * grid))
    // separable orthonormal 2D DCT-II; zigzag low-freq scan skipping DC
    val dct = dct2(luma, grid)
    val want = dim - histBins
    val coeffs = new Array[Double](want)
    var taken = 0
    var s = 1 // zigzag diagonal index (u+v); s=0 is DC
    while (taken < want && s <= 2 * (grid - 1)) {
      var u = math.min(s, grid - 1)
      while (taken < want && u >= math.max(0, s - (grid - 1))) {
        coeffs(taken) = dct(u)(s - u) / 255.0
        taken += 1
        u -= 1
      }
      s += 1
    }
    val v = histNorm ++ coeffs
    val norm = math.sqrt(v.map(x => x * x).sum).max(1e-9)
    v.map(x => (x / norm).toFloat)
  }

  /** 64-bit perceptual hash (pHash family) of a decoded image: 32x32
    * bilinear luma resample -> orthonormal 2D DCT -> first 64 zigzag
    * low-frequency coefficients (DC excluded) -> bit i = coeff_i above
    * the median. Resizes and mild perturbations move few bits; distinct
    * images are ~32 bits apart (random). */
  private[multimodal] def phashOf(img: java.awt.image.BufferedImage): Long = {
    val grid = 32
    val small = new java.awt.image.BufferedImage(
      grid, grid, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, grid, grid, null)
    g.dispose()
    val luma = Array.ofDim[Double](grid, grid)
    var y = 0
    while (y < grid) {
      var x = 0
      while (x < grid) {
        val rgb = small.getRGB(x, y)
        luma(y)(x) = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val dct = dct2(luma, grid)
    val coeffs = new Array[Double](64)
    var taken = 0
    var s = 1
    while (taken < 64 && s <= 2 * (grid - 1)) {
      var u = math.min(s, grid - 1)
      while (taken < 64 && u >= math.max(0, s - (grid - 1))) {
        coeffs(taken) = dct(u)(s - u)
        taken += 1
        u -= 1
      }
      s += 1
    }
    val sorted = coeffs.sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var h = 0L
    var i = 0
    while (i < 64) {
      if (coeffs(i) > median) h |= (1L << i)
      i += 1
    }
    h
  }

  /** (media_id, simhash=pHash) for every ImageIO-decodable payload —
    * column named to feed [[graft.functions.TextOps.simHashPairs]]
    * directly, so image near-dup detection reuses the banded Hamming
    * join (pigeonhole candidates + exact bit_count verify) unchanged. */
  def perceptualHashes(media: Dataset[MediaRow],
      batchSize: Int = 64): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { m =>
        try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.bytes)))
            .map(img => (m.media_id, phashOf(img)))
        } catch { case _: java.io.IOException => None }
      })
    }.toDF("media_id", "simhash")
  }

  /** Image near-duplicate pairs: pHash + banded Hamming join — the
    * multimodal face of SimHash dedup. */
  def imageNearDupPairs(media: Dataset[MediaRow],
      maxHamming: Int): org.apache.spark.sql.DataFrame =
    graft.functions.TextOps.simHashPairs(
      perceptualHashes(media), "media_id", maxHamming)

  /** 64-bit spectral sign-hash of a PCM clip: bit i set when the
    * Goertzel magnitude at band i exceeds the clip's MEDIAN band
    * magnitude. Gain-invariant by construction — scaling the waveform
    * scales every band and the median equally (and [[audioFeature]]
    * unit-normalizes besides), so a volume-renormalized duplicate
    * hashes identically (pinned in MultimodalSuite). */
  private[graft] def spectralHashOf(spec: Array[Float]): Long = {
    val sorted = spec.clone().sorted
    val median =
      (sorted(spec.length / 2 - 1) + sorted(spec.length / 2)) / 2.0
    var h = 0L
    var i = 0
    while (i < spec.length) {
      if (spec(i) > median) h |= (1L << i)
      i += 1
    }
    h
  }

  /** (media_id, simhash) for every PCM-decodable payload — the audio
    * sibling of [[perceptualHashes]], column-named to feed
    * [[graft.functions.TextOps.simHashPairs]] unchanged. */
  def spectralHashes(media: Dataset[MediaRow],
      batchSize: Int = 64): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { m =>
        decodePcm(m.bytes).map { case (rate, samples) =>
          (m.media_id, spectralHashOf(audioFeature(rate, samples, 64)))
        }
      })
    }.toDF("media_id", "simhash")
  }

  /** Audio near-duplicate pairs: spectral sign-hash + the SAME banded
    * Hamming join (pigeonhole candidates, exact bit_count verify) the
    * text and image dedup paths ride. */
  def audioNearDupPairs(media: Dataset[MediaRow],
      maxHamming: Int): org.apache.spark.sql.DataFrame =
    graft.functions.TextOps.simHashPairs(
      spectralHashes(media), "media_id", maxHamming)

  /** Gain-scaled copy of a canonical-header PCM16 WAV (the synthetic
    * writer's 44-byte layout) — the plant/test helper for
    * gain-invariance checks. */
  private[graft] def scaleWavGain(bytes: Array[Byte], gain: Double): Array[Byte] = {
    val out = bytes.clone()
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 44
    while (i + 1 < out.length) {
      bb.putShort(i, (bb.getShort(i) * gain).toShort)
      i += 2
    }
    out
  }

  /** Orthonormal 2D DCT-II of an n×n grid (separable, O(n³)). */
  private def dct2(a: Array[Array[Double]], n: Int): Array[Array[Double]] = {
    val c = Array.tabulate(n, n)((k, i) =>
      math.sqrt((if (k == 0) 1.0 else 2.0) / n) *
        math.cos(math.Pi * (2 * i + 1) * k / (2.0 * n)))
    // rows then columns: out = C * a * C^T
    val tmp = Array.tabulate(n, n) { (y, u) =>
      var acc = 0.0; var x = 0
      while (x < n) { acc += c(u)(x) * a(y)(x); x += 1 }
      acc
    }
    Array.tabulate(n, n) { (u, v) =>
      var acc = 0.0; var y = 0
      while (y < n) { acc += c(u)(y) * tmp(y)(v); y += 1 }
      acc
    }
  }

  /** Feature extraction over a media batch — every shipped modality runs
    * a REAL kernel: images through [[imageFeature]] (histogram+DCT),
    * audio through PCM decode + Goertzel spectrum, video through the
    * container demux with the middle frame pushed through the image
    * kernel (the standard keyframe-embedding shape). The deterministic
    * byte-window hash remains ONLY for payloads no decoder recognizes —
    * the slot where a production deployment plugs batched model
    * inference. Output schema and batch shape match what an ANN index
    * ingests ([[graft.functions.VectorOps]]). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
      batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val decoded =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.bytes)))
            catch { case _: java.io.IOException => None }
          decoded match {
            case Some(img) => MediaFeature(m.media_id, imageFeature(img, dim))
            case None => decodePcm(m.bytes) match {
              // REAL audio features: decoded PCM -> Goertzel spectrum
              case Some((rate, samples)) =>
                MediaFeature(m.media_id, audioFeature(rate, samples, dim))
              // REAL video features: demux the container, embed the
              // middle frame with the image kernel (keyframe shape)
              case None if VideoContainer.decode(m.bytes).exists(_.nonEmpty) =>
                val frames = VideoContainer.decode(m.bytes).get
                val mid = frames(frames.size / 2)._2
                val img =
                  try Option(javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(mid)))
                  catch { case _: java.io.IOException => None }
                img match {
                  case Some(f) => MediaFeature(m.media_id, imageFeature(f, dim))
                  case None => MediaFeature(m.media_id, byteHashFeature(m.bytes, dim))
                }
              case None =>
                // --- STUB KERNEL (payloads no decoder recognizes):
                // replace with real batched model inference;
                // deterministic byte-window hash ---
                MediaFeature(m.media_id, byteHashFeature(m.bytes, dim))
            }
          }
        }
      }
    }
  }

  /** The model-inference head over [[extractFeatures]] output: project a
    * modality feature vector to a `outDim`-dim L2-normalized embedding
    * through a fixed seeded random-projection matrix. By the
    * Johnson-Lindenstrauss lemma the projection preserves cosines/
    * distances within ~1/sqrt(outDim), so downstream ANN (the s0x
    * machinery) ranks media the same way it ranks text embeddings.
    *
    * This is the REAL inference plumbing — broadcast weights, batched
    * matrix-vector per partition, normalization, ANN-composable output —
    * with a seeded Gaussian matrix standing in for learned weights (the
    * container ships no model runtime; `java.util.Random.nextGaussian`
    * is algorithm-specified in the JDK docs, so the matrix is
    * deterministic across JVMs). Swapping in a trained head is a
    * weights-file change, not a plumbing change. */
  def embedFeatures(feats: Dataset[MediaFeature], outDim: Int = 32,
      seed: Long = 42L): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val inDim = 64 // extractFeatures' fixed feature width
    val rnd = new java.util.Random(seed)
    val w = Array.fill(outDim, inDim)(rnd.nextGaussian().toFloat)
    val bw = spark.sparkContext.broadcast(w)
    feats.mapPartitions { it =>
      val m = bw.value
      it.map { f =>
        val out = new Array[Float](outDim)
        var i = 0
        while (i < outDim) {
          val row = m(i)
          var j = 0
          var acc = 0.0
          val n = math.min(row.length, f.feature.length)
          while (j < n) { acc += row(j) * f.feature(j); j += 1 }
          out(i) = acc.toFloat
          i += 1
        }
        val norm = math.sqrt(out.map(x => x.toDouble * x).sum).max(1e-9)
        (f.media_id, out.map(x => (x / norm).toFloat))
      }
    }.toDF("media_id", "embedding")
  }

  private def byteHashFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      val j = (bytes(i) & 0xff) % dim
      v(j) += 1.0f / (1 + i % 7)
      i += 1
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum).max(1e-9)
    v.map(x => (x / norm).toFloat)
  }

  /** Resize to `maxSide` on the longer edge: REAL bilinear resample +
    * PNG re-encode for JDK-readable images; proportional payload
    * truncation as the deterministic fallback for non-image bytes. */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val decoded =
        if (m.meta.kind == "image")
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes)))
          catch { case _: java.io.IOException => None }
        else None
      decoded match {
        case Some(img) =>
          val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight).max(1)
          if (scale >= 1.0)
            m.copy(meta = m.meta.copy(width = img.getWidth, height = img.getHeight))
          else {
            val w = math.max(1, (img.getWidth * scale).toInt)
            val h = math.max(1, (img.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            m.copy(meta = m.meta.copy(width = w, height = h),
              bytes = buf.toByteArray)
          }
        case None =>
          val scale = maxSide.toDouble / math.max(m.meta.width, m.meta.height).max(1)
          if (scale >= 1.0) m
          else {
            val w = math.max(1, (m.meta.width * scale).toInt)
            val h = math.max(1, (m.meta.height * scale).toInt)
            // fallback for non-image payloads: truncate proportionally so
            // the pipeline shape stays testable without real media
            val keep = math.max(1, (m.bytes.length * scale * scale).toInt)
            m.copy(meta = m.meta.copy(width = w, height = h),
              bytes = m.bytes.take(keep))
          }
      }
    }
  }

  /** Frame sampling for video payloads: one output row per sample
    * timestamp, `everyMs` apart — the explode-shaped operator a video
    * pipeline needs before per-frame work. [[VideoContainer]] payloads
    * get REAL demuxing: each sample emits the container frame as-of its
    * timestamp (latest frame at-or-before), so every output payload is
    * a decodable image. Non-container payloads keep the byte-slice
    * fallback (formats needing native demuxers). Linear output, no
    * shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video").flatMap { m =>
      val n = math.max(1, (m.meta.durationMs / math.max(1L, everyMs)).toInt)
      VideoContainer.decode(m.bytes) match {
        case Some(frames) if frames.nonEmpty =>
          (0 until n).iterator.map { i =>
            val t = i.toLong * everyMs
            val at = frames.lastIndexWhere(_._1 <= t)
            Frame(m.media_id, i, frames(math.max(at, 0))._2)
          }
        case _ =>
          val span = math.max(1, m.bytes.length / n)
          (0 until n).iterator.map(i =>
            Frame(m.media_id, i, m.bytes.slice(i * span, i * span + span)))
      }
    }
  }
}
