package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ScaleOps
import graft.plans.AsOfJoinOp

/** The physical as-of join (plans/AsOfJoin.scala) against the composed
  * union+window formulation (ScaleOps.asofJoin) — same semantics, pinned
  * row-for-row, plus plan-shape and partitioning-invariance checks. */
class AsOfJoinExecSuite extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def sides(): (DataFrame, DataFrame) = {
    val ev = Tables(spark, sf, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"))
    (purchases, views)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("asof_view_event_id"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("exec node equals the composed union+window as-of join") {
    val (p, v) = sides()
    val exec = AsOfJoinOp.asof(p, v, "user_id", "ts", "ts", Seq("view_event_id"))
    val composed = ScaleOps.asofJoin(p, v, "user_id", "ts", "ts", Seq("view_event_id"))
    assert(canon(exec) == canon(composed))
    assert(exec.count() == p.count(), "left join: every left row survives")
  }

  test("tolerance nulls stale matches identically in both forms") {
    val (p, v) = sides()
    val exec = AsOfJoinOp.asof(p, v, "user_id", "ts", "ts",
      Seq("view_event_id"), toleranceSec = Some(3600L))
    val composed = ScaleOps.asofJoin(p, v, "user_id", "ts", "ts",
      Seq("view_event_id"), toleranceSec = Some(3600L))
    assert(canon(exec) == canon(composed))
    // the tolerance must actually bite somewhere or the test is vacuous
    val unbounded = AsOfJoinOp.asof(p, v, "user_id", "ts", "ts", Seq("view_event_id"))
    assert(exec.where(col("asof_view_event_id").isNull).count() >
      unbounded.where(col("asof_view_event_id").isNull).count())
  }

  test("forward mode equals the composed forward as-of join") {
    val ev = Tables(spark, sf, "events")
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    def c(df: DataFrame): Seq[String] =
      df.select(col("event_id"), unix_micros(col("ts")), col("asof_pid"))
        .collect().map(_.mkString("|")).sorted.toSeq
    val exec = AsOfJoinOp.asof(views, purchases, "user_id", "ts", "ts",
      Seq("pid"), direction = "forward")
    val composed = ScaleOps.asofJoin(views, purchases, "user_id", "ts", "ts",
      Seq("pid"), direction = "forward")
    assert(c(exec) == c(composed))
    val execTol = AsOfJoinOp.asof(views, purchases, "user_id", "ts", "ts",
      Seq("pid"), toleranceSec = Some(3600L), direction = "forward")
    val compTol = ScaleOps.asofJoin(views, purchases, "user_id", "ts", "ts",
      Seq("pid"), direction = "forward", toleranceSec = Some(3600L))
    assert(c(execTol) == c(compTol))
  }

  test("property: exec == composed on random data across direction x tolerance") {
    import spark.implicits._
    // seeded random workload engineered for collisions: 20 keys, ts drawn
    // from 300 distinct seconds (duplicate (key, ts) pairs guaranteed), so
    // the tie-break contract (greatest payload backward, smallest forward)
    // is exercised, not dodged. Null-free by construction.
    val rnd = new scala.util.Random(20260814L)
    val base = 1700000000L
    def mkTs(sec: Long) = new java.sql.Timestamp((base + sec) * 1000L)
    val leftRows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(20).toLong, mkTs(rnd.nextInt(300).toLong))
    }
    val rightRows = (0 until 400).map { i =>
      (rnd.nextInt(20).toLong, mkTs(rnd.nextInt(300).toLong), i.toLong)
    }
    val l = leftRows.toDF("event_id", "user_id", "ts").repartition(5)
    val r = rightRows.toDF("user_id", "ts", "payload").repartition(3)
    def c(df: DataFrame): Seq[String] =
      df.select(col("event_id"), col("user_id"),
          unix_micros(col("ts")), col("asof_payload"))
        .collect().map(_.mkString("|")).sorted.toSeq
    for {
      direction <- Seq("backward", "forward")
      tol <- Seq(None, Some(30L), Some(100000L))
    } {
      val exec = AsOfJoinOp.asof(l, r, "user_id", "ts", "ts",
        Seq("payload"), direction, tol)
      val composed = ScaleOps.asofJoin(l, r, "user_id", "ts", "ts",
        Seq("payload"), direction, tol)
      val (ce, cc) = (c(exec), c(composed))
      assert(ce == cc,
        s"exec != composed at direction=$direction tolerance=$tol: " +
          s"first diff ${ce.zip(cc).find(p => p._1 != p._2)}")
      assert(ce.size == 400, s"left join must keep all left rows, got ${ce.size}")
    }
  }

  test("result is invariant to input partitioning") {
    val (p, v) = sides()
    val base = canon(AsOfJoinOp.asof(p, v, "user_id", "ts", "ts", Seq("view_event_id")))
    val shuffled = canon(AsOfJoinOp.asof(
      p.repartition(7, col("event_id")), v.repartition(3),
      "user_id", "ts", "ts", Seq("view_event_id")))
    assert(base == shuffled)
  }

  test("plan: custom exec node, one exchange + sort per side, left partitioning kept") {
    val (p, v) = sides()
    val df = AsOfJoinOp.asof(p, v, "user_id", "ts", "ts", Seq("view_event_id"))
    // AQE wraps the plan in AdaptiveSparkPlanExec (collect doesn't
    // descend into it) — assert on the rendered tree instead
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin "), s"AsOfJoinExec missing:\n$s")
    // EnsureRequirements plans the declared contract: a hash exchange
    // and an in-partition sort per side, nothing else
    assert(s.contains("Exchange hashpartitioning"), s)
    assert(s.contains("Sort ["), s)
    assert(!s.contains("Window"), s"the physical form must not window:\n$s")
    // the merge's output advertises the left child's partitioning, so a
    // downstream per-key aggregate reuses the exchange
    val agg = df.groupBy("user_id").agg(count(lit(1)))
    val aggPlan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(aggPlan).size
    assert(exchanges <= 2,
      s"downstream per-key agg must reuse the as-of exchange:\n$aggPlan")
  }

  test("SQL metrics: numOutputRows = left count, numMatched = non-null matches") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val (p, v) = sides()
    val df = AsOfJoinOp.asof(p, v, "user_id", "ts", "ts", Seq("view_event_id"))
    val total = df.count()
    val matched = df.where(col("asof_view_event_id").isNotNull).count()
    df.collect()
    // query stages are leaves for collect — unwrap them explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def find(p: SparkPlan): Seq[graft.plans.AsOfJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case e: graft.plans.AsOfJoinExec => Seq(e)
      case other => other.children.flatMap(find)
    }
    val execs = find(df.queryExecution.executedPlan)
    assert(execs.nonEmpty,
      s"AsOfJoinExec missing:\n${df.queryExecution.executedPlan}")
    // AQE's partition coalescing must keep BOTH sides co-partitioned for
    // the zip merge — the executed plan showing coalesced reads feeding
    // the node (and the correct counts above) pins that interplay
    val s2 = df.queryExecution.executedPlan.toString
    assert(!s2.contains("AQEShuffleRead") ||
      execs.head.left.toString.contains("AQEShuffleRead") ==
        execs.head.right.toString.contains("AQEShuffleRead"),
      s"asymmetric AQE coalescing under the merge:\n$s2")
    val m = execs.head.metrics
    assert(m("numOutputRows").value == total,
      s"numOutputRows ${m("numOutputRows").value} != $total")
    assert(m("numMatched").value == matched,
      s"numMatched ${m("numMatched").value} != $matched")
  }

  test("rows with no at-or-before match carry nulls; null keys never match") {
    import spark.implicits._
    AsOfJoinOp.ensureRegistered(spark)
    val l = Seq((1L, Some(10L), 100L), (2L, Some(10L), 50L), (3L, None, 100L))
      .toDF("id", "k", "t")
      .select(col("id"), col("k").as("user_id"), col("t").as("ts"))
    val r = Seq((Some(10L), 60L, 7L), (Some(10L), 60L, 9L), (None.asInstanceOf[Option[Long]], 1L, 8L))
      .toDF("k", "t", "pid")
      .select(col("k").as("user_id"), col("t").as("ts"), col("pid"))
    val out = AsOfJoinOp.asof(l, r, "user_id", "ts", "ts", Seq("pid"))
      .select("id", "asof_pid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(9L), "duplicate right ts resolves to greatest payload")
    assert(out(2L) == None, "no at-or-before match -> null")
    assert(out(3L) == None, "null key never matches")
  }

  test("divergent child partitioning trips the guard, not an opaque zip error") {
    // PROVOKE the co-partitioning guard (VERDICT r11 #4): hand-build the
    // exec node over children EnsureRequirements never saw — explicit
    // repartition(3) vs repartition(5) (numbered repartitions, which AQE
    // never coalesces) stands in for an AQE rule re-planning one side
    // only. The merge must refuse with ITS message, not surface
    // zipPartitions' "unequal numbers of partitions".
    import spark.implicits._
    val l = Seq((10L, 100L, 1L), (20L, 50L, 2L)).toDF("k", "t", "id")
      .repartition(3, col("k"))
    val r = Seq((10L, 60L, 7L), (20L, 40L, 9L)).toDF("k", "t", "pid")
      .repartition(5, col("k"))
    val lPlan = l.queryExecution.executedPlan
    val rPlan = r.queryExecution.executedPlan
    def attr(p: org.apache.spark.sql.execution.SparkPlan, n: String) =
      p.output.find(_.name == n).get
    val exec = graft.plans.AsOfJoinExec(
      lPlan, rPlan,
      leftKey = attr(lPlan, "k"), rightKey = attr(rPlan, "k"),
      leftTime = attr(lPlan, "t"), rightTime = attr(rPlan, "t"),
      payload = Seq(attr(rPlan, "pid")), payloadOut = Seq(attr(rPlan, "pid")),
      toleranceMicros = None, forward = false)
    val e = intercept[IllegalStateException] { exec.execute() }
    assert(e.getMessage.contains("as-of join children diverged to 3 vs 5"),
      s"guard message missing or wrong: ${e.getMessage}")
    assert(e.getMessage.contains("AQE coalescing"),
      "guard must point at the AQE settings to check")
  }
}
