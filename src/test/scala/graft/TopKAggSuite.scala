package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** Pins the custom top-k aggregate: buffer order/tie semantics, merge
  * equals a global sort under arbitrary partitioning, and the plan
  * actually partial-aggregates (the scale claim). */
class TopKAggSuite extends SparkSuite {
  import spark.implicits._

  test("buffer keeps (value desc, id asc) order through offers and merges") {
    val b = new TopKAgg.Buffer(3)
    Seq((1.0, 10L), (5.0, 7L), (5.0, 3L), (2.0, 1L), (9.0, 99L))
      .foreach { case (v, id) => b.offer(v, id) }
    assert(b.size == 3)
    assert((0 until 3).map(i => (b.values(i), b.ids(i))) ==
      Seq((9.0, 99L), (5.0, 3L), (5.0, 7L)), "ties break by id asc")
    val o = new TopKAgg.Buffer(3)
    o.offer(5.0, 1L); o.offer(0.5, 2L)
    val merged = new TopKAgg.Buffer(3)
    Seq((9.0, 99L), (5.0, 3L), (5.0, 7L)).foreach { case (v, id) => merged.offer(v, id) }
    var i = 0
    while (i < o.size) { merged.offer(o.values(i), o.ids(i)); i += 1 }
    assert((0 until 3).map(j => (merged.values(j), merged.ids(j))) ==
      Seq((9.0, 99L), (5.0, 1L), (5.0, 3L)))
  }

  test("NaN values order as the largest double, matching the window formulation") {
    val rows = Seq(
      (1L, Double.NaN, 10L), (1L, 5.0, 11L), (1L, 9.0, 12L), (1L, 7.0, 13L))
    val got = rows.toDF("g", "v", "id").groupBy("g")
      .agg(TopKAgg.column(spark, col("v"), col("id"), 3).as("ids"))
      .select(posexplode(col("ids")).as(Seq("r0", "id")))
      .as[(Int, Long)].collect().toSeq.sortBy(_._1).map(_._2)
    // Spark's ORDER BY v DESC ranks NaN first, then 9.0, then 7.0
    assert(got == Seq(10L, 12L, 13L), s"got $got")
  }

  test("-0.0 ties 0.0 (SQL ordering), so the id tie-break decides") {
    val got = Seq((1L, 0.0, 5L), (1L, -0.0, 1L), (1L, -1.0, 9L))
      .toDF("g", "v", "id").groupBy("g")
      .agg(TopKAgg.column(spark, col("v"), col("id"), 2).as("ids"))
      .select(posexplode(col("ids")).as(Seq("r0", "id")))
      .as[(Int, Long)].collect().toSeq.sortBy(_._1).map(_._2)
    // window formulation: 0.0 and -0.0 tie -> id asc -> 1 then 5
    assert(got == Seq(1L, 5L), s"got $got")
  }

  test("aggregate equals the window formulation under any partitioning") {
    val rnd = new scala.util.Random(23)
    val rows = (1L to 2000L).map(i =>
      (i % 37, rnd.nextInt(50).toDouble, i)) // heavy ties across groups
    for (parts <- Seq(1, 5, 32)) {
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val got = df.groupBy("g")
        .agg(TopKAgg.column(spark, col("v"), col("id"), 4).as("ids"))
        .select(col("g"), posexplode(col("ids")).as(Seq("r0", "id")))
        .as[(Long, Int, Long)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy { case (_, v, id) => (-v, id) }.take(4).zipWithIndex
          .map { case ((_, _, id), r0) => (g, r0, id) }
      }.toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("plan partial-aggregates: k rows per group per map task, not all rows") {
    val df = spark.range(0, 10000).select(
        (col("id") % 10).as("g"), col("id").cast("double").as("v"), col("id"))
      .groupBy("g")
      .agg(TopKAgg.column(spark, col("v"), col("id"), 3).as("ids"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_top_k") || plan.contains("partial graft_top_k")
        || plan.toLowerCase.contains("objecthashaggregate"),
      "top-k must run as a two-phase (partial + final) aggregate:\n" + plan)
    // and the result is right
    val r = df.select(col("g"), posexplode(col("ids")).as(Seq("r0", "id")))
      .as[(Long, Int, Long)].collect().toSet
    val expected = (0L until 10L).flatMap(g =>
      (0 until 3).map(i => (g, i, 9990L + g - 10L * i))).toSet
    assert(r == expected)
  }
}
