package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads travel as opaque `binary` columns beside a typed metadata
  * struct; decode / feature-extract / resize / frame-sample are
  * per-partition batch operators whose Spark-side shape (schema,
  * partitioning, batch iteration) is real and tested, while the codec
  * kernels themselves are STUBS — deterministic fakes standing in for
  * the image/audio libraries this environment does not ship. Swapping a
  * stub for a real decoder changes one function body, none of the
  * dataflow.
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

  /** Deterministic synthetic media corpus derived from the documents
    * table: text bytes become the payload, metadata from doc stats. Kind
    * cycles image/audio/video so every operator has coverage. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
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
  }

  /** STUB image decode — ??? in spirit: a real implementation calls a
    * codec (JPEG/PNG) here; the fake derives channel count and mean luma
    * deterministically from the payload so tests can pin behavior. The
    * batched per-partition shape is the real contract. */
  def decodeImages(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // --- STUB KERNEL: replace with real batched decode ---
        batch.map { m =>
          val luma =
            if (m.bytes.isEmpty) 0.0
            else m.bytes.map(b => (b & 0xff).toDouble).sum / m.bytes.length
          DecodedImage(m.media_id, m.meta.width, m.meta.height,
            channels = 3, meanLuma = luma)
        }
      }
    }
  }

  /** STUB feature extraction: a real implementation runs a vision/audio
    * model over the batch; the fake hashes byte windows into a fixed-dim
    * float vector (deterministic, unit-scale). Output schema and batch
    * shape match what an ANN index ingests ([[graft.functions.VectorOps]]). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
      batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // --- STUB KERNEL: replace with real batched model inference ---
        batch.map { m =>
          val v = new Array[Float](dim)
          var i = 0
          while (i < m.bytes.length) {
            val j = (m.bytes(i) & 0xff) % dim
            v(j) += 1.0f / (1 + i % 7)
            i += 1
          }
          val norm = math.sqrt(v.map(x => x.toDouble * x).sum).max(1e-9)
          MediaFeature(m.media_id, v.map(x => (x / norm).toFloat))
        }
      }
    }
  }

  /** STUB resize: recomputes metadata exactly (real work), fakes the
    * pixel transform by truncating the payload proportionally. */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val scale = maxSide.toDouble / math.max(m.meta.width, m.meta.height).max(1)
      if (scale >= 1.0) m
      else {
        val w = math.max(1, (m.meta.width * scale).toInt)
        val h = math.max(1, (m.meta.height * scale).toInt)
        // --- STUB KERNEL: real implementation resamples pixels ---
        val keep = math.max(1, (m.bytes.length * scale * scale).toInt)
        m.copy(meta = m.meta.copy(width = w, height = h),
          bytes = m.bytes.take(keep))
      }
    }
  }

  /** Frame sampling for video payloads: one output row per sampled
    * frame, `everyMs` apart — the explode-shaped operator a video
    * pipeline needs before per-frame decode. Slicing is the STUB; the
    * row multiplication and ordering are real. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video").flatMap { m =>
      val n = math.max(1, (m.meta.durationMs / math.max(1L, everyMs)).toInt)
      val span = math.max(1, m.bytes.length / n)
      (0 until n).iterator.map { i =>
        // --- STUB KERNEL: real implementation decodes frame i ---
        Frame(m.media_id, i, m.bytes.slice(i * span, i * span + span))
      }
    }
  }
}
