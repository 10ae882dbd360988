package graft.multimodal

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** FUSED bytes→band-sign-hash kernel for streamed AUDIO ingest — the
  * audio sibling of [[MediaPhash]] (r16 verdict item 8: the
  * mediaPhashBatch pattern generalizes): javax.sound PCM decode + the
  * 32 fixed-point quadrature band sums + sign-bit pack in ONE
  * executor-side pass, clip bytes in, one 64-bit hash out. Nothing
  * sample-shaped is materialized between stages — per-clip state is two
  * 32-long accumulator arrays regardless of clip length.
  *
  * Bit-identical to the pinned sample-row dataflow
  * ([[PinnedMediaMath.audioNearDupPinned]]'s band stage, DuckDB-replayed
  * by the mm15/w29 oracles):
  *   - samples are the decoder's exact short/32768 quotients re-scaled
  *     by round(d * 32768) — the lossless round trip
  *     [[MediaFixture.audioSamples]] pins;
  *   - band b (1..32) accumulates x_re = Σ s_i·cos64[(b·i) mod 64],
  *     x_im = Σ s_i·sin64[(b·i) mod 64] over the shared fixed-point
  *     tables ([[PinnedMediaMath.cosSin64]] — one source of truth);
  *   - bit (b-1) of the lo half is set iff x_re > 0, of the hi half iff
  *     x_im > 0; the packed word is (hi << 32) | lo
  *     ([[PinnedMediaMath.packSimhash]]).
  *
  * NULL (not an error) for a payload the decoder rejects — the streamed
  * sink's dead-letter contract, same as [[MediaPhash]]. */
case class AudioBandHash(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary audio bytes, got $other")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_band_hash"

  override protected def nullSafeEval(input: Any): Any =
    AudioBandHash.computeOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val obj = AudioBandHash.getClass.getName.stripSuffix("$") + "$"
    val boxed = ctx.freshName("graftBandHash") // freshName: the r16 lesson
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        java.lang.Long $boxed = $obj.MODULE$$.computeOrNull(${childGen.value});
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.longValue();
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): AudioBandHash =
    copy(child = newChild)
}

object AudioBandHash {

  // the shared 64-phase fixed-point quadrature tables, flattened — read
  // from the oracle-side source of truth so the paths cannot drift
  private val Cos = new Array[Long](64)
  private val Sin = new Array[Long](64)
  locally {
    PinnedMediaMath.cosSin64.foreach { case (j, c, s) =>
      Cos(j) = c; Sin(j) = s
    }
  }

  /** The pinned 32-band sign hash of one decoded clip. Public so the
    * twin test can drive it against the SQL replay directly. Takes the
    * decoder's [-1,1] doubles and re-scales by round(d·32768) — the
    * exact integers the committed sample fixture carries. */
  def bandHashOfSamples(samples: Array[Double]): Long = {
    val re = new Array[Long](32)
    val im = new Array[Long](32)
    var i = 0
    while (i < samples.length) {
      val s = Math.round(samples(i) * 32768.0) // lossless short round trip
      var b = 0
      while (b < 32) {
        // (band · i) mod 64 with band = b+1; Long math so a pathological
        // clip length cannot overflow the phase product
        val j = (((b + 1).toLong * i) % 64L).toInt
        re(b) += s * Cos(j)
        im(b) += s * Sin(j)
        b += 1
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) {
      val pw = 1L << b // bandPow32: band k carries 2^(k-1)
      if (re(b) > 0) lo |= pw
      if (im(b) > 0) hi |= pw
      b += 1
    }
    (hi << 32) | lo
  }

  /** Decode + hash; null when the decoder rejects the payload (the
    * dead-letter contract). Shared by interpreted and generated paths. */
  def computeOrNull(bytes: Array[Byte]): java.lang.Long =
    Multimodal.decodePcm(bytes) match {
      case Some((_, samples)) =>
        java.lang.Long.valueOf(bandHashOfSamples(samples))
      case None => null
    }

  private val ident = new FunctionIdentifier("graft_audio_band_hash")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[AudioBandHash].getName,
          "graft_audio_band_hash"),
        (children: Seq[Expression]) => AudioBandHash(children.head))
    }
  }

  def column(spark: SparkSession, bytes: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions
      .call_function("graft_audio_band_hash", bytes)
  }
}
