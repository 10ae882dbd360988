package graft.multimodal

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** FUSED video-bytes→per-frame-hash kernel — the VIDEO member of the
  * fused ingest family ([[MediaPhash]] image, [[AudioBandHash]] audio):
  * GVC1 demux + per-frame ImageIO decode + the pinned 16×16 integer
  * DCT pHash ([[MediaPhash.phashOfPlane]] — the single shared frame
  * kernel) in ONE executor-side pass. Container bytes in, one 64-bit
  * hash PER FRAME out (array position = demux order = the fixture's
  * `frame_idx`); nothing frame- or pixel-shaped is materialized
  * between stages.
  *
  * NULL (the dead-letter contract) when the payload is not a GVC1
  * container, a frame's PNG fails to decode, or the framing is torn —
  * a video near-dup semantics of "EVERY aligned frame within budget"
  * cannot honestly hash a clip it only partially decoded. */
case class VideoFrameHashes(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary video bytes, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_frame_hashes"

  override protected def nullSafeEval(input: Any): Any =
    VideoFrameHashes.computeOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val obj = VideoFrameHashes.getClass.getName.stripSuffix("$") + "$"
    val arr = ctx.freshName("graftFrameHashes") // freshName: the r16 lesson
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $arr =
          (org.apache.spark.sql.catalyst.util.ArrayData)
            $obj.MODULE$$.computeOrNull(${childGen.value});
        if ($arr != null) {
          ${ev.isNull} = false;
          ${ev.value} = $arr;
        }
      }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): VideoFrameHashes = copy(child = newChild)
}

object VideoFrameHashes {

  /** Demux + per-frame decode + per-frame pinned pHash; null when the
    * container or ANY frame is undecodable. Shared by interpreted and
    * generated paths.
    *
    * Unlike the batch-side [[Multimodal.VideoContainer.decode]] —
    * where torn GVC1 framing is a loud error — torn framing here maps
    * to NULL like every other undecodable payload: in an
    * at-least-once STREAM a poisonous payload that throws wedges the
    * query in a retry loop forever, which is exactly the failure mode
    * the dead-letter spool exists to absorb (the id is preserved
    * there, so nothing is silent). */
  def computeOrNull(bytes: Array[Byte]): GenericArrayData =
    try Multimodal.VideoContainer.decode(bytes) match {
      case None => null
      case Some(frames) =>
        val out = new Array[Long](frames.length)
        var i = 0
        while (i < frames.length) {
          MediaFixture.decodePx(frames(i)._2) match {
            case Some(px) => out(i) = MediaPhash.phashOfPlane(px)
            case None     => return null // a torn frame dead-letters the clip
          }
          i += 1
        }
        new GenericArrayData(out)
    } catch {
      case _: java.io.IOException => null         // truncated container
      case _: IllegalArgumentException => null    // corrupt framing fields
    }

  private val ident = new FunctionIdentifier("graft_video_frame_hashes")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[VideoFrameHashes].getName,
          "graft_video_frame_hashes"),
        (children: Seq[Expression]) => VideoFrameHashes(children.head))
    }
  }

  def column(spark: SparkSession, bytes: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions
      .call_function("graft_video_frame_hashes", bytes)
  }
}
