package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** Complex plan shapes modeled on the harder TPC-H queries: correlated
  * aggregates resolved per-group (Q2/Q17), join-then-histogram (Q13) —
  * the shapes that exercise subquery decorrelation, multi-level
  * aggregation, and window-over-join plans.
  */
object Complex {

  private def money(c: String) = col(c).cast("decimal(12,2)")

  val defs: Seq[QueryDef] = Seq(

    // ---- c01 (Q2 shape): best supplier per part via correlated max -------
    QueryDef(
      "c01_min_cost_supplier",
      (s, d) => {
        val pairs = Tables(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val sup = Tables(s, d, "supplier")
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        pairs.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") === 1 && col("l_partkey") <= 200)
          .select(col("l_partkey"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
          .orderBy("l_partkey")
      },
      Some("""
        SELECT l_partkey, s_suppkey, s_name, s_acctbal FROM (
          SELECT l_partkey, s_suppkey, s_name, s_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY l_partkey
                   ORDER BY s_acctbal DESC, s_suppkey) AS rk
          FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
          JOIN supplier ON l_suppkey = s_suppkey
          WHERE l_partkey <= 200) t
        WHERE rk = 1
        ORDER BY l_partkey""")),

    // ---- c02 (Q17 shape): small-quantity orders vs per-part average ------
    QueryDef(
      "c02_avg_yearly",
      (s, d) => {
        val l = Tables(s, d, "lineitem")
        val avgQty = l.groupBy(col("l_partkey").as("pk"))
          .agg((sum(money("l_quantity")).cast("double") / count(lit(1)))
            .as("avg_qty"))
        l.join(avgQty, col("l_partkey") === col("pk"))
          .where(col("l_quantity") < col("avg_qty") * 0.5)
          .agg((sum(money("l_extendedprice")).cast("double") / 7.0)
            .as("avg_yearly"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n
        FROM lineitem l
        JOIN (SELECT l_partkey AS pk,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
              FROM lineitem GROUP BY l_partkey) a
          ON l.l_partkey = a.pk
        WHERE l_quantity < avg_qty * 0.5""")),

    // ---- c03 (Q13 shape): order-count histogram over a left join ---------
    QueryDef(
      "c03_customer_distribution",
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""),
      bench = true),

    // ---- c04 (Q20 shape): suppliers shipping excess volume of a part -----
    // per-(part,supplier) volume vs 1.5x the part's cross-supplier average:
    // two aggregation levels + a join back, then a dimension join — the
    // "nested aggregate feeding a semi-join" decorrelation shape
    QueryDef(
      "c04_excess_volume",
      (s, d) => {
        val vols = Tables(s, d, "lineitem")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(money("l_quantity")).cast("double").as("vol"))
        val avgPart = vols.groupBy(col("l_partkey").as("pk"))
          .agg((sum(col("vol")) / count(lit(1))).as("part_avg"))
        vols.join(avgPart, col("l_partkey") === col("pk"))
          .where(col("vol") > col("part_avg") * 1.5)
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
            col("vol"), col("part_avg"))
          .orderBy("l_partkey", "l_suppkey")
      },
      Some("""
        WITH vols AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS vol
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ), avg_part AS (
          SELECT l_partkey AS pk, SUM(vol) / COUNT(*) AS part_avg
          FROM vols GROUP BY l_partkey
        )
        SELECT l_partkey, l_suppkey, s_name, vol, part_avg
        FROM vols JOIN avg_part ON l_partkey = pk
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE vol > part_avg * 1.5
        ORDER BY l_partkey, l_suppkey""")),

    // ---- c05 (Q21 shape): sole-blame supplier on multi-supplier orders ---
    // the EXISTS / NOT-EXISTS double correlation, decorrelated by hand
    // into ONE per-order aggregate (distinct suppliers, distinct
    // suppliers-with-returns): the blame condition becomes n_supp >= 2
    // AND n_ret = 1 — one shuffle where the textbook plan does two
    // correlated semi/anti joins against the fact table. The oracle
    // keeps the classic correlated-subquery text, proving equivalence.
    QueryDef(
      "c05_sole_blame_supplier",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val perOrder = li.groupBy("l_orderkey").agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("n_ret"))
        val returned = li.where(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        returned.join(perOrder, "l_orderkey")
          .where(col("n_supp") >= 2 && col("n_ret") === 1)
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait FROM (
          SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          FROM lineitem l1
          WHERE l1.l_returnflag = 'R'
            AND EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lineitem l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_returnflag = 'R')) q
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20"""))
  )
}
