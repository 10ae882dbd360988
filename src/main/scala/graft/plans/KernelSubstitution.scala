package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the canonical declarative dot product
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)`
  *
  * into the whole-stage-codegen [[graft.functions.DotProduct]] kernel —
  * the higher-order form runs in the interpreted lambda evaluator and
  * allocates an intermediate array per row (measured ~10x slower on
  * candidate-pair scoring; see DotProduct's scaladoc). Users who write
  * the idiomatic Spark formulation get the kernel silently.
  *
  * The rewrite preserves semantics EXACTLY, not just approximately:
  *
  *   - the kernel accumulates left-to-right like the fold, so equal
  *     inputs produce bit-identical sums;
  *   - it fires only when both arrays are `array<double>` with
  *     `containsNull = false` (a null ELEMENT makes the fold null — the
  *     kernel has no null lanes);
  *   - ragged lengths differ (`zip_with` null-pads → fold returns null;
  *     the kernel loops the shorter length), so the replacement is
  *     guarded by `size(a) = size(b)` with the ORIGINAL expression as
  *     the fallback branch — and only attribute inputs are rewritten,
  *     so the guard's re-references cost nothing;
  *   - null ARRAYS: `size(null)` is null → the guard's `If` takes the
  *     fallback, which evaluates to null exactly as before.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule` —
  * the Rule[LogicalPlan] face of the engine's extension surface (the
  * expressions themselves are the function face).
  */
object KernelSubstitution extends Rule[LogicalPlan] {

  private def isDoubleArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  private def sameVars(args: Seq[NamedLambdaVariable],
      l: Expression, r: Expression): Boolean = (l, r) match {
    case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
      val ids = args.map(_.exprId).toSet
      Set(lv.exprId, rv.exprId) == ids && ids.size == 2
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  // bottom-up: the replacement If CONTAINS the original aggregate as
  // its fallback branch, so a top-down transform would re-match it
  // forever; transformExpressionsUp never revisits a replacement node
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp { case p => p.transformExpressionsUp {
      case agg @ ArrayAggregate(
          ZipWith(a: Attribute, b: Attribute,
            LambdaFunction(Multiply(ml, mr, _), zipArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _), mergeArgs, _),
          finish)
        if isDoubleArrayNoNulls(a) && isDoubleArrayNoNulls(b) &&
          sameVars(zipArgs.collect { case v: NamedLambdaVariable => v }, ml, mr) &&
          sameVars(mergeArgs.collect { case v: NamedLambdaVariable => v }, al, ar) &&
          isIdentityFinish(finish) =>
        If(EqualTo(Size(a), Size(b)), DotProduct(a, b), agg)
    } }
}
