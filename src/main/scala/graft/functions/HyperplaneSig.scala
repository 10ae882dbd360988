package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen signed-random-projection (hyperplane LSH) signatures:
  * output element `b` is the `bits`-bit signature of band `b`, where bit
  * `j` is the sign of `sum_i v(i) * w(i, b*bits+j)` with Rademacher
  * weights `w = ±1` derived from a splitmix64 mix of (element index,
  * global bit index, seed) — deterministic, no stored projection matrix.
  *
  * The declarative formulation (one `aggregate(zip_with(...))` per bit)
  * needs bands×bits separate higher-order expressions — 32 was already
  * the practical ceiling for codegen, capping the LSH at weak parameters
  * (VERDICT r2: bits=4/bands=8 ≈ n²/4 candidates). This expression
  * computes ALL band signatures in one generated loop over
  * O(dim × bands × bits) multiply-adds, so parameter choice is governed
  * by recall/candidate math, not expression-tree limits.
  */
case class HyperplaneSig(child: Expression, bits: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if bits > 0 && bits <= 63 && bands > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, 0 < bits <= 63, bands > 0")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HyperplaneSig.compute(input.asInstanceOf[ArrayData], bits, bands, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = HyperplaneSig.getClass.getName.stripSuffix("$") + "$"
      // freshName, NOT a fixed local: with a non-nullable child
      // nullSafeCodeGen emits this bare, so a second signature
      // expression in the same generated method would redefine the
      // name and janino would reject the whole stage
      val sigs = ctx.freshName("hyperplaneSigs")
      s"""
        long[] $sigs = $cls.MODULE$$.compute($a, $bits, $bands, ${seed}L);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {

  /** splitmix64 finalizer — full-avalanche mixing. */
  @inline private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Shared kernel for interpreted and generated paths. */
  def compute(arr: ArrayData, bits: Int, bands: Int, seed: Long): Array[Long] = {
    val total = bands * bits
    val acc = new Array[Double](total)
    val dim = arr.numElements()
    var i = 0
    while (i < dim) {
      val x = arr.getDouble(i)
      var g = 0
      while (g < total) {
        // sign bit of the mixed (i, g, seed) hash -> Rademacher ±1
        val w = mix(seed ^ (i.toLong * 0xc2b2ae3d27d4eb4fL) ^
          (g.toLong * 0x9e3779b97f4a7c15L))
        if (w < 0) acc(g) -= x else acc(g) += x
        g += 1
      }
      i += 1
    }
    val sigs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        if (acc(b * bits + j) > 0) sig |= (1L << j)
        j += 1
      }
      sigs(b) = sig
      b += 1
    }
    sigs
  }

  private val ident = new FunctionIdentifier("graft_hyperplane_sig")

  /** Idempotent session registration (see [[DotProduct.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
        (children: Seq[Expression]) => {
          def intLit(e: Expression, what: String): Int = e match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_hyperplane_sig: $what must be an integer literal, got $other")
          }
          val seed = children(3) match {
            case Literal(v: Long, _) => v
            case Literal(v: Int, _) => v.toLong
            case other => throw new IllegalArgumentException(
              s"graft_hyperplane_sig: seed must be a long literal, got $other")
          }
          HyperplaneSig(children(0),
            intLit(children(1), "bits"), intLit(children(2), "bands"), seed)
        })
    }
  }

  def column(spark: SparkSession, vec: Column, bits: Int, bands: Int,
      seed: Long = 42L): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_hyperplane_sig",
      vec, org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(bands),
      org.apache.spark.sql.functions.lit(seed))
  }
}
