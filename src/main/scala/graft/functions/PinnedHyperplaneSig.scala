package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen PINNED hyperplane signatures — [[HyperplaneSig]]'s
  * twin for the oracle-replayable plane family: output element `b` is
  * the `bits`-bit signature of band `b`, where bit `k` is set iff
  * `sum_i w(b*bits+k, i) * v(i) >= 0` with ±1 weights from
  * [[graft.functions.VectorOps.pinnedSign]]'s integer-parity formula
  * (`bit_count(j*2654435761 + i*40503) % 2` — the same integers a
  * DuckDB oracle rebuilds, unlike the splitmix family).
  *
  * Replaces the `transform(typedlit(planes), ...)` + band-fold
  * formulation in the s14 path: Spark's higher-order functions are
  * CodegenFallback, so every plane dot over the 16K-element nested
  * literal ran INTERPRETED — ~3.5x the trained sibling's wall time at
  * sf0.1. One generated loop of O(dim × bands × bits) multiply-adds
  * (each weight one bitCount instruction) brings the pinned family
  * onto the same cost curve as [[HyperplaneSig]]. Sums are exact: SQ8
  * codes are integral with |code| <= 127, so a 64-dim signed sum stays
  * far inside the double's integer range — the sign decision is the
  * same exact integer arithmetic the oracle replays.
  */
case class PinnedHyperplaneSig(child: Expression, bits: Int, bands: Int,
    dim: Int) extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if bits > 0 && bits <= 63 && bands > 0 && dim > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, 0 < bits <= 63, bands > 0, " +
        "dim > 0")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pinned_hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(PinnedHyperplaneSig.compute(
      input.asInstanceOf[ArrayData], bits, bands, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = PinnedHyperplaneSig.getClass.getName.stripSuffix("$") + "$"
      // freshName, NOT a fixed local (the DotProduct pattern): with a
      // non-nullable child nullSafeCodeGen emits this bare — a second
      // signature expression in the same generated method would
      // redefine a fixed name and janino would reject the whole stage
      val sigs = ctx.freshName("pinnedSigs")
      s"""
        long[] $sigs = $cls.MODULE$$.compute($a, $bits, $bands, $dim);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): PinnedHyperplaneSig = copy(child = newChild)
}

object PinnedHyperplaneSig {

  /** Shared kernel for interpreted and generated paths. Exactly
    * [[graft.functions.VectorOps.pinnedSign]]'s weights and the
    * declarative form's `>= 0` sign rule (NOT [[HyperplaneSig]]'s
    * `> 0` — the pinned oracle replays `d >= 0`). `dim` is ENFORCED,
    * not advisory: the oracle's plane family is exactly dim wide, so a
    * vector of any other length must fail loudly here rather than fold
    * extra dimensions into silently-divergent signatures. Elements are
    * hoisted into a local array once — the band×bit loops would
    * otherwise pay bands×bits×dim ArrayData interface calls per row. */
  def compute(arr: ArrayData, bits: Int, bands: Int,
      dim: Int): Array[Long] = {
    val n = arr.numElements()
    require(n == dim,
      s"graft_pinned_hyperplane_sig: vector has $n elements but the " +
        s"pinned plane family is $dim-wide — signatures would diverge " +
        "from the dim-wide oracle silently")
    val v = new Array[Double](dim)
    var i0 = 0
    while (i0 < dim) { v(i0) = arr.getDouble(i0); i0 += 1 }
    val sigs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var k = 0
      while (k < bits) {
        val j = (b * bits + k).toLong
        var d = 0.0
        var i = 0
        while (i < dim) {
          if (java.lang.Long.bitCount(j * 2654435761L + i.toLong * 40503L)
              % 2 == 0) d += v(i)
          else d -= v(i)
          i += 1
        }
        if (d >= 0.0) sig |= (1L << k)
        k += 1
      }
      sigs(b) = sig
      b += 1
    }
    sigs
  }

  private val ident = new FunctionIdentifier("graft_pinned_hyperplane_sig")

  /** Idempotent session registration (see [[DotProduct.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[PinnedHyperplaneSig].getName,
          "graft_pinned_hyperplane_sig"),
        (children: Seq[Expression]) => {
          def intLit(e: Expression, what: String): Int = e match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_pinned_hyperplane_sig: $what must be an integer " +
                s"literal, got $other")
          }
          PinnedHyperplaneSig(children(0),
            intLit(children(1), "bits"), intLit(children(2), "bands"),
            intLit(children(3), "dim"))
        })
    }
  }

  def column(spark: SparkSession, vec: Column, bits: Int, bands: Int,
      dim: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_pinned_hyperplane_sig", vec,
      org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(bands),
      org.apache.spark.sql.functions.lit(dim))
  }
}
