package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Backward as-of join as a FIRST-CLASS physical operator — the full
  * custom-operator stack ([[AsOfJoinNode]] logical plan →
  * [[AsOfJoinStrategy]] → [[AsOfJoinExec]] physical plan), the
  * whole-operator extension face next to the engine's expression face
  * (codegen kernels) and rule face ([[KernelSubstitution]]).
  *
  * Semantics (equality with [[graft.functions.ScaleOps.asofJoin]]
  * pinned in AsOfJoinExecSuite on null-free keys/timestamps): for every
  * left row, the single latest right row of the same key with
  * `right.ts <= left.ts` (nulls when none, stale matches nulled by the
  * optional tolerance). Ties on `right.ts` break toward the greatest
  * payload — the merge formulation's running-`last` under (ts, payload)
  * order. NULL semantics deliberately follow SQL joins and therefore
  * DIVERGE from the composed window form on two edges: a null KEY never
  * matches here (the window form groups null keys together and matches
  * within the group), and a null right TIMESTAMP never matches (the
  * window form's running-last can pick it up). Pinned in the suite's
  * null-semantics test.
  *
  * Why a physical operator when the composed form exists: the union+
  * window plan materializes BOTH sides through one window sort and
  * carries the payload struct through the shuffle twice (once in the
  * union, once in the running-last frame). The exec node declares
  * `ClusteredDistribution`(key) + per-key (key, ts) ordering and lets
  * EnsureRequirements plan ONE hash shuffle + in-partition sort per
  * side, then streams a two-pointer merge with O(1) state per key —
  * no window buffer, no union blow-up, and the output keeps the left
  * side's partitioning for downstream reuse. That is the shape a
  * 100 TB as-of (quotes×trades-class) needs.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    toleranceMicros: Option[Long],
    forward: Boolean) extends BinaryNode {

  /** Output attrs for the matched payload: right's exprIds (so physical
    * binding resolves), `asof_` names, nullable (a left row may have no
    * match). Deterministic per payload attr — stable across copies. */
  val payloadOut: Seq[Attribute] =
    payload.map(a => a.withName("asof_" + a.name).withNullability(true))

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]. Registered per session
  * via `spark.experimental.extraStrategies` (public API, idempotent —
  * see [[AsOfJoinOp.ensureRegistered]]) and by
  * [[graft.GraftExtensions]] for extension-configured sessions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.rightKey, n.leftTime, n.rightTime,
        n.payload, n.payloadOut, n.toleranceMicros, n.forward) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    toleranceMicros: Option[Long],
    forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  /** One hash shuffle per side on the key — the same contract
    * SortMergeJoinExec declares, so EnsureRequirements co-partitions
    * the children (and AQE's coalescing respects the pairing). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** In-partition (key, ts) sort; the right side additionally orders by
    * the payload so duplicate right timestamps resolve deterministically
    * (last under payload-asc = greatest payload — the composed form's
    * tie-break). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      (Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        payload.map(SortOrder(_, Ascending))) :: Nil

  /** The merge neither re-partitions nor re-orders the left side —
    * downstream per-key operators reuse the exchange. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  private def timeGetter(a: Attribute): Boolean = a.dataType match {
    case TimestampType | TimestampNTZType | LongType => true
    case _ => false
  }
  require(timeGetter(leftTime) && timeGetter(rightTime),
    "as-of time columns must be timestamp- or long-typed")
  // the merge compares raw longs, so the two time columns must share a
  // representation: TimestampType micros vs LongType epoch-millis would
  // silently match everything instead of erroring
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must have the SAME type, got " +
      s"${leftTime.dataType} vs ${rightTime.dataType}")
  // the tolerance is expressed in SECONDS and converted to micros —
  // only meaningful when the columns are micros-backed timestamps; for
  // raw long time columns the unit would be whatever the caller stored
  require(toleranceMicros.isEmpty || leftTime.dataType != LongType,
    "tolerance requires timestamp-typed time columns (long columns have " +
      "caller-defined units)")
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key columns must have the SAME type, got " +
      s"${leftKey.dataType} vs ${rightKey.dataType}")

  /** The operator reports through the standard SQLMetrics surface —
    * match rate is the one signal an as-of user actually tunes on
    * (tolerance too tight / clocks skewed ⇒ matched collapses). */
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val out = output
    val lKey = leftKey; val rKey = rightKey
    val lTime = leftTime; val rTime = rightTime
    val tol = toleranceMicros
    val fwd = forward
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lRdd = left.execute()
    val rRdd = right.execute()
    // the merge pairs partitions positionally, so both shuffles must
    // land on the SAME partition count — EnsureRequirements guarantees
    // that and AsOfJoinExecSuite pins symmetric AQE coalescing, but an
    // AQE change that coalesced the sides differently would otherwise
    // surface as zipPartitions' opaque "unequal numbers of partitions"
    if (lRdd.getNumPartitions != rRdd.getNumPartitions)
      throw new IllegalStateException(
        s"as-of join children diverged to ${lRdd.getNumPartitions} vs " +
          s"${rRdd.getNumPartitions} partitions — the per-key merge needs " +
          "co-partitioned sides; check AQE coalescing/skew settings " +
          "(spark.sql.adaptive.coalescePartitions, skewJoin) for a rule " +
          "that re-planned one side only")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](lKey), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](rKey), rightOut)
      val lTimeProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKey.dataType))
      // bind with the right side forced nullable: unmatched left rows read
      // the null row, and a non-null right attr would codegen WITHOUT the
      // null check (reading garbage zeros instead of null)
      val resultProj = UnsafeProjection.create(out,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      // right-side cursor: the projected key/time views are only read
      // between advances, so they borrow the projections' buffers
      var rRow: InternalRow = null
      var rKeyRow: InternalRow = null
      var rTimeNull = false
      var rTimeVal = 0L
      def advanceR(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKeyRow = rKeyProj(rRow)
          val t = rTimeProj(rRow)
          rTimeNull = t.isNullAt(0)
          if (!rTimeNull) rTimeVal = t.getLong(0)
        } else { rRow = null; rKeyRow = null }
      advanceR()

      // latest at-or-before right row for the key currently in scope
      // (copied: the iterators reuse their row buffers)
      var matchRow: InternalRow = null
      var matchKey: InternalRow = null
      var matchTime = 0L

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lkNull = lk.isNullAt(0)
        val lt = lTimeProj(l)
        val ltNull = lt.isNullAt(0)
        val ltVal = if (ltNull) 0L else lt.getLong(0)
        if (fwd) {
          // forward: consume right rows strictly before lt (and
          // null-time rows, which sort first and can never match); the
          // surviving head is the earliest at-or-after candidate —
          // PEEKED, not consumed, because it may match several left rows
          var cont = !ltNull
          while (cont && rRow != null) {
            val c = keyOrd.compare(rKeyRow, lk)
            if (c < 0 || (c == 0 && (rTimeNull || rTimeVal < ltVal)))
              advanceR()
            else cont = false
          }
          val ok = rRow != null && !lkNull && !ltNull &&
            keyOrd.compare(rKeyRow, lk) == 0 &&
            tol.forall(t => rTimeVal - ltVal <= t)
          numOutputRows += 1
          if (ok) numMatched += 1
          resultProj(joined(l, if (ok) rRow else nullRight))
        } else {
          // a match held from a previous key is stale
          if (matchRow != null && keyOrd.compare(matchKey, lk) != 0) {
            matchRow = null; matchKey = null
          }
          // consume right rows up to (key, ts) — rows of earlier keys are
          // skipped, rows of THIS key at-or-before lt become the match.
          // Null keys never match (SQL join semantics); null right times
          // sort first and are consumed without matching.
          var cont = !ltNull
          while (cont && rRow != null) {
            val c = keyOrd.compare(rKeyRow, lk)
            if (c < 0 || (c == 0 && (rTimeNull || rTimeVal <= ltVal))) {
              if (c == 0 && !lkNull && !rTimeNull) {
                matchRow = rRow.copy(); matchKey = lk.copy()
                matchTime = rTimeVal
              }
              advanceR()
            } else cont = false
          }
          val ok = matchRow != null && !lkNull && !ltNull &&
            tol.forall(t => ltVal - matchTime <= t)
          numOutputRows += 1
          if (ok) numMatched += 1
          resultProj(joined(l, if (ok) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the physical as-of join. */
object AsOfJoinOp {

  /** Adds [[AsOfJoinStrategy]] to the session's extra strategies once
    * (public `experimental` surface — works on any getOrCreate'd
    * session, the same lazy-registration contract as the engine's
    * codegen functions). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** As-of join `left` ← nearest `right` per key: backward = latest
    * at-or-before, forward = earliest at-or-after. `payload` right
    * columns arrive as `asof_<name>` (null when no match, or when the
    * match is further than `toleranceSec`). Tie-breaks and the trailing
    * (direction, toleranceSec) parameter order mirror
    * [[graft.functions.ScaleOps.asofJoin]]: greatest payload backward,
    * smallest forward. */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, payload: Seq[String],
      direction: String = "backward",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    // both sides often derive from the same source (self as-of join), so
    // their attribute ids COLLIDE — the analyzer's DeduplicateRelations
    // only fixes that for node types it knows. Re-alias the right side
    // with fresh exprIds so left/right attributes can never alias each
    // other through the binary node. Catalyst cannot column-prune
    // through the unknown node, so the right side is ALSO projected down
    // to exactly (key, ts, payload) here — otherwise every right column
    // rides the shuffle, the sort, and the retained match row.
    val rAnalyzed = right.queryExecution.analyzed
    val needed = (Seq(keyCol, rightTsCol) ++ payload).distinct
    // name-based resolution, so ambiguity must be an error: a side that
    // carries a duplicate column name (common after joins) would
    // otherwise silently bind the first match / project a column twice
    def unique(side: String, out: Seq[Attribute], n: String): Attribute =
      out.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() =>
          throw new IllegalArgumentException(s"$side side has no column $n")
        case many =>
          throw new IllegalArgumentException(
            s"$side side has ${many.size} columns named $n — disambiguate " +
              "(select/alias) before the as-of join")
      }
    val rAliases = needed.map(n => Alias(unique("right", rAnalyzed.output, n), n)())
    val rPlan: LogicalPlan = Project(rAliases, rAnalyzed)
    val rAttrs = rAliases.map(_.toAttribute)
    def lAttr(n: String): Attribute = unique("left", lPlan.output, n)
    def rAttr(n: String): Attribute =
      rAttrs.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"right side has no column $n"))
    GraftSqlBridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan,
      lAttr(keyCol), rAttr(keyCol),
      lAttr(leftTsCol), rAttr(rightTsCol),
      payload.map(rAttr),
      toleranceSec.map(_ * 1000000L),
      direction == "forward"))
  }
}
