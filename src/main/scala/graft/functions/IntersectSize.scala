package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen intersection SIZE of two SORTED long arrays.
  *
  * The built-in `size(array_intersect(a, b))` materializes the
  * intersection array (an OpenHashSet + ArrayBuffer per row) only to
  * take its length — at hundreds of thousands of candidate pairs per
  * partition that allocation churn dominated the Jaccard verify stage.
  * Over sorted inputs the size is a two-pointer merge count: no
  * allocation, no hashing, branch-predictable, and it runs inside
  * whole-stage codegen.
  *
  * CONTRACT: both inputs must be sorted ascending with distinct
  * elements ([[TextOps.hashedShingleSets]] emits exactly that form);
  * unsorted input silently undercounts.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $nx = $a.numElements();
        int $ny = $b.numElements();
        int $i = 0; int $j = 0; int $c = 0;
        while ($i < $nx && $j < $ny) {
          long $xv = $a.getLong($i);
          long $yv = $b.getLong($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; }
          else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

object IntersectSize {
  private val ident = new FunctionIdentifier("graft_intersect_size")

  /** Registers graft_intersect_size in the session's function registry
    * (idempotent) — same pattern as [[DotProduct.ensureRegistered]]. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[IntersectSize].getName, "graft_intersect_size"),
        (children: Seq[Expression]) => IntersectSize(children(0), children(1)))
    }
  }

  def column(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_intersect_size", a, b)
  }
}
