package graft.multimodal

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** FUSED bytes→pHash kernel for the streamed media sink (r16 verdict
  * prescription 5): ImageIO decode + 16×16 integer DCT + median sign
  * bits in ONE executor-side pass — media bytes in, one 64-bit hash
  * out, nothing pixel-shaped ever materialized between stages.
  *
  * The previous hot path flatMapped every payload into `(id, y, x, v)`
  * rows and localCheckpointed them before the SQL transform — correct
  * and linear, but ~10⁶ block-manager-resident rows per megapixel image
  * per micro-batch. This kernel keeps the per-image state inside one
  * function frame (two 16-row accumulator arrays), so per-batch memory
  * is one ROW PER MEDIA regardless of resolution.
  *
  * Bit-identical to the pinned pixel-row dataflow
  * ([[PinnedMediaMath.phashOf]] — which stays as the oracle-replayed
  * twin gating mm08/mm14/w28):
  *   - basis/zigzag constants are read from [[PinnedMediaMath]] itself
  *     (one source of truth; a drifted copy cannot exist);
  *   - only pixels with x < 16 and y < 16 contribute (the SQL joins on
  *     the 16-point basis index, which prunes the same set);
  *   - coefficients rank by (o, z); the integral median pair is ranks
  *     32 and 33; bit z set iff 2*o_z > that pair's sum; z < 32 fills
  *     the lo half, z >= 32 the hi half; the packed word is
  *     (hi << 32) | lo ([[PinnedMediaMath.packSimhash]]).
  *
  * NULL result (not an error) for a payload the decoder rejects — the
  * streamed sink routes those to its dead-letter directory, the same
  * contract [[MediaFixture.decodePx]] gave the per-pixel path. */
case class MediaPhash(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary media bytes, got $other")
  }

  override def dataType: DataType = LongType
  // nullable even under a non-null child: an undecodable payload maps
  // to NULL (dead-letter), not to an exception mid-stage
  override def nullable: Boolean = true
  override def prettyName: String = "graft_media_phash"

  override protected def nullSafeEval(input: Any): Any =
    MediaPhash.computeOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val obj = MediaPhash.getClass.getName.stripSuffix("$") + "$"
    // freshName, not a fixed local (the r16 MinHashSig lesson): two of
    // these expressions in one generated method must not collide
    val boxed = ctx.freshName("graftPhash")
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

  override protected def withNewChildInternal(newChild: Expression): MediaPhash =
    copy(child = newChild)
}

object MediaPhash {

  // the pinned DCT basis, flattened for the tight loop — READ FROM the
  // oracle-side table so the two paths share one set of integers
  private val C: Array[Long] = {
    val a = new Array[Long](256)
    PinnedMediaMath.dctBasis16.foreach { case (k, i, v) => a(k * 16 + i) = v }
    a
  }
  // zigzag order: z -> (u, v); z IS the position, so arrays index by it
  private val ZigU = new Array[Int](64)
  private val ZigV = new Array[Int](64)
  locally {
    PinnedMediaMath.zigzag16.foreach { case (u, v, z, _) =>
      ZigU(z) = u; ZigV(z) = v
    }
  }

  /** The pinned pHash of one decoded plane — the whole
    * [[PinnedMediaMath.phashOf]] dataflow in one frame. Public so the
    * twin test can drive it against the SQL replay directly. */
  def phashOfPlane(px: Array[Array[Int]]): Long = {
    // tmp(u, y) = sum_x v(y, x) * c(u, x) — only x < 16, y < 16
    // contribute (the SQL's join on the basis index prunes the same)
    val h = math.min(16, px.length)
    val tmp = new Array[Long](256) // u * 16 + y
    var y = 0
    while (y < h) {
      val row = px(y)
      val w = math.min(16, row.length)
      var u = 0
      while (u < 16) {
        var s = 0L
        var x = 0
        while (x < w) { s += row(x) * C(u * 16 + x); x += 1 }
        tmp(u * 16 + y) = s
        u += 1
      }
      y += 1
    }
    // only the 64 zigzag coefficients are ever ranked/hashed, so only
    // those are computed: o_z = sum_y tmp(u_z, y) * c(v_z, y)
    val os = new Array[Long](64)
    var z = 0
    while (z < 64) {
      val u = ZigU(z); val v = ZigV(z)
      var s = 0L
      var yy = 0
      while (yy < h) { s += tmp(u * 16 + yy) * C(v * 16 + yy); yy += 1 }
      os(z) = s
      z += 1
    }
    // integral median pair: ranks 32 and 33 of the (o, z) order — z is
    // the tiebreak, exactly the SQL ROW_NUMBER's ORDER BY o, z
    val sorted = Array.range(0, 64).sortBy(zz => (os(zz), zz))
    val m2 = os(sorted(31)) + os(sorted(32))
    var lo = 0L
    var hi = 0L
    z = 0
    while (z < 64) {
      if (2 * os(z) > m2) {
        val p = 1L << (z % 32)
        if (z < 32) lo |= p else hi |= p
      }
      z += 1
    }
    (hi << 32) | lo
  }

  /** Decode + hash; null when the decoder rejects the payload (the
    * dead-letter contract). Shared by the interpreted and generated
    * paths. */
  def computeOrNull(bytes: Array[Byte]): java.lang.Long =
    MediaFixture.decodePx(bytes) match {
      case Some(px) => java.lang.Long.valueOf(phashOfPlane(px))
      case None     => null
    }

  private val ident = new FunctionIdentifier("graft_media_phash")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[MediaPhash].getName, "graft_media_phash"),
        (children: Seq[Expression]) => MediaPhash(children.head))
    }
  }

  def column(spark: SparkSession, bytes: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_media_phash", bytes)
  }
}
