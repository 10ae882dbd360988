package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, SpecifiedWindowFrame, UnboundedFollowing, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Static scale-discipline linter: walks a query's OPTIMIZED logical
  * plan and reports the anti-patterns that break at 100 TB, so the
  * whole registry can be audited systematically instead of by
  * per-query spot checks (PlanAuditSuite pins specific shapes; this
  * pins the ABSENCE of the bad ones everywhere).
  *
  * Rules:
  *   - `cross-join`: a Join with no condition where BOTH sides can
  *     exceed one row. Scalar broadcasts (an ungrouped Aggregate,
  *     `maxRows == 1`) are the legitimate pattern and pass.
  *   - `global-window`: a Window whose partitionSpec is empty — the
  *     single-partition sort that serializes at any scale
  *     ([[graft.functions.ScaleOps.runningTotal]] is the fix).
  *   - `inner-global-sort`: a global Sort that feeds FURTHER
  *     computation (not the root presentation ORDER BY) — a full
  *     range-shuffle whose order is then consumed by something that
  *     re-shuffles anyway.
  *   - `skewed-window`: a whole-partition-frame window (frame upper
  *     bound = UNBOUNDED FOLLOWING, i.e. min/max/sum-over-partition)
  *     on ANY partition key. A window partition must be fully
  *     co-located on ONE task with no map-side partial aggregation, so
  *     the shape is only safe when the key's population is provably
  *     bounded — and skew hides behind every representation: a Zipf
  *     stop-gram is just as hot keyed by `xxhash64(gram)` (a long) as
  *     by the gram string, so the rule does NOT look at the key's
  *     type. The fix is the aggregate formulation:
  *     `groupBy(key).agg(min/max/...)` gets partial aggregation,
  *     collapsing the hot key per map task (the t23/p20 de-skew).
  *     Bounded dimensions (lang, type codes, histogram bins) are
  *     allowlisted per query with a justification.
  *     Ordered-frame windows (row_number etc.) are out of scope here:
  *     they carry a per-partition sort semantics no aggregate can
  *     replace, and the registry uses them on bounded or uniform keys.
  */
object PlanLint {

  final case class Violation(rule: String, node: String) {
    override def toString = s"[$rule] $node"
  }

  def lint(df: DataFrame): Seq[Violation] = {
    val plan = df.queryExecution.optimizedPlan
    val out = Seq.newBuilder[Violation]

    def scalar(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= 1L)

    plan.foreach {
      case j: Join if j.condition.isEmpty =>
        if (!scalar(j.left) && !scalar(j.right))
          out += Violation("cross-join", j.simpleStringWithNodeId())
      case w: Window if w.partitionSpec.isEmpty =>
        out += Violation("global-window", w.simpleStringWithNodeId())
      case w: Window =>
        // whole-partition frame (no ordering semantics an aggregate
        // couldn't replace) — the skew shape, whatever the key's type
        def wholePartitionFrame(e: Expression): Boolean = e match {
          case we: WindowExpression =>
            we.windowSpec.frameSpecification match {
              case SpecifiedWindowFrame(_, _, UnboundedFollowing) => true
              case _ => false
            }
          case Alias(child, _) => wholePartitionFrame(child)
          case _ => false
        }
        if (w.windowExpressions.exists(wholePartitionFrame))
          out += Violation("skewed-window", w.simpleStringWithNodeId())
      case _ => ()
    }

    // root presentation sort is fine, as is the root ORDER BY + LIMIT
    // top-k (physically TakeOrderedAndProject — no full global sort
    // ever materializes); any global sort deeper in the plan is not.
    def stripRoot(p: LogicalPlan): LogicalPlan = p match {
      case Sort(_, true, child, _) => stripRoot(child)
      case Project(_, child) => stripRoot(child)
      case GlobalLimit(_, child) => stripRoot(child)
      case LocalLimit(_, child) => stripRoot(child)
      case _ => p
    }
    stripRoot(plan).foreach {
      case s @ Sort(_, true, _, _) =>
        out += Violation("inner-global-sort", s.simpleStringWithNodeId())
      case _ => ()
    }
    out.result()
  }
}
