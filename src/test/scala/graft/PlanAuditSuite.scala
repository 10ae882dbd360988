package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Physical-plan audits — the properties that decide 100x-scale
  * behavior, asserted against the actual executed plans so regressions
  * in pushdown, broadcast choice, or cache barriers fail loudly instead
  * of silently degrading. */
class PlanAuditSuite extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull"), p)
    // pruned read schema — the scan must not read all 16 lineitem columns
    val readSchema = "ReadSchema: struct<(.*?)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length <= 6,
      s"scan reads more columns than the projection needs: $readSchema")
  }

  test("q03: dimension join is broadcast, not shuffled") {
    val p = plan("q03_top_customers")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q07: both dimension joins broadcast; single shuffle for the agg") {
    val p = plan("q07_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "dimension joins must not degrade to sort-merge:\n" + p)
  }

  test("d02: shingle cache is an InMemoryRelation barrier below the joins") {
    val df = SparkEntry.queries("d02_ngram_jaccard")(spark, sf)
    val cached = df.queryExecution.optimizedPlan.collect {
      case r: InMemoryRelation => r
    }
    assert(cached.nonEmpty,
      "d02 must read the shingle sets through a cache barrier (pushdown " +
        "pitfall: inferred filters re-evaluate the whole chain otherwise)")
    spark.catalog.clearCache()
  }

  test("t02: quality scoring runs inside whole-stage codegen") {
    // AQE only materializes codegen spans in the FINAL plan — execute,
    // then audit
    val df = SparkEntry.queries("t02_quality")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n) Operator" is the tree-string marker for a WholeStageCodegen span
    assert(p.contains("*("), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ArrowEvalPython"),
      "no Python UDFs in the hot path")
  }

  test("m04: IN-list lookup pushes an isin filter to the scan") {
    val p = plan("m04_inlist_lookup")
    assert(p.contains("PushedFilters: [") && p.contains("In("), p)
  }
}
