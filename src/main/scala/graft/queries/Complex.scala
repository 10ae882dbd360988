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
  private def disc1(c: String) =
    lit(1).cast("decimal(8,2)") - col(c).cast("decimal(8,2)")
  private val oDisc1 =
    "(CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))"

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
        LIMIT 20""")),

    // ---- c06 (Q7 shape): bilateral volume shipping between two nations ---
    // the dim filter moves INTO the broadcast side (2-row nation dims)
    // so the fact join itself prunes; the textbook OR-of-pairs predicate
    // reduces to `supp_nation <> cust_nation` after the pre-filter — no
    // post-join OR over two dim columns for Catalyst to fail to push.
    QueryDef(
      "c06_volume_shipping",
      (s, d) => {
        val pair = Seq("NATION_1", "NATION_2")
        val n1 = Tables(s, d, "nation").where(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = Tables(s, d, "nation").where(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        Tables(s, d, "lineitem")
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .join(broadcast(n2), col("c_nationkey") === col("ck"))
          .where(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(money("l_extendedprice") * disc1("l_discount"))
            .cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year"""),
      bench = true),

    // ---- c07 (Q8 shape): national market share inside a region ----------
    // numerator and denominator come out of ONE aggregate over the joined
    // fact (conditional sum), not two passes; every dim side is filtered
    // before its broadcast. Decimal sums stay exact until the final
    // double division, so the oracle agrees bit-for-bit after rounding.
    QueryDef(
      "c07_market_share",
      (s, d) => {
        def r4(c: org.apache.spark.sql.Column) =
          floor(c * 10000.0 + 0.5) / 10000.0
        val asiaNations = Tables(s, d, "nation")
          .join(broadcast(Tables(s, d, "region").where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("ck_nat"))
        val suppNation = Tables(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val vol = money("l_extendedprice") * disc1("l_discount")
        Tables(s, d, "lineitem")
          .join(broadcast(Tables(s, d, "part").where(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNations), col("c_nationkey") === col("ck_nat"))
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3", vol)
              .otherwise(lit(0).cast("decimal(12,2)"))).as("nat_vol"),
            sum(vol).as("tot_vol"))
          .select(col("o_year"),
            r4(col("nat_vol").cast("double") / col("tot_vol").cast("double"))
              .as("mkt_share"))
          .orderBy("o_year")
      },
      Some(s"""
        WITH f AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1 AS vol,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        )
        SELECT o_year,
               floor((CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
                      CAST(SUM(vol) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS mkt_share
        FROM f GROUP BY o_year ORDER BY o_year""")),

    // ---- c08 (Q15 shape): top-revenue supplier(s) via a reused view ------
    // the revenue aggregate is computed ONCE; the scalar-max comparison is
    // a window max over the aggregate (25 rows post-agg), not a second
    // scan of the fact table.
    QueryDef(
      "c08_top_supplier",
      (s, d) => {
        val rev = Tables(s, d, "lineitem")
          .where(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1997-01-01")
          .groupBy(col("l_suppkey"))
          .agg(sum(money("l_extendedprice") * disc1("l_discount"))
            .cast("double").as("total_revenue"))
        val top = rev.agg(max(col("total_revenue")).as("mx"))
        rev.join(broadcast(top), col("total_revenue") === col("mx"))
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(s"""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey""")),

    // ---- c09 (Q19 shape): disjunction of multi-column conjunctions -------
    // the OR-of-ANDs predicate spans both join sides; the partkey join
    // stays an equi-join with the disjunction as a post-join filter, and
    // the common conjunct (quantity <= 40) is factored out so at least
    // one selective predicate reaches the lineitem scan.
    QueryDef(
      "c09_disjunctive_filter",
      (s, d) => {
        val li = Tables(s, d, "lineitem").where(col("l_quantity") <= 40)
        val p = Tables(s, d, "part")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .where(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 15)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 25)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
              col("l_quantity").between(25, 40)))
          .agg(
            sum(money("l_extendedprice") * disc1("l_discount"))
              .cast("double").as("revenue"),
            count(lit(1)).as("n"))
      },
      Some(s"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 25 AND 40)""")),

    // ---- c10 (Q22 shape): above-average balances with no orders ----------
    // the scalar "avg positive balance" threshold is applied as the
    // DIVISION-FREE form bal * n_pos > sum_pos (decimal-exact on both
    // engines — a double avg would make borderline rows engine-dependent);
    // the "recently inactive" test is an anti join against the filtered
    // order stream, not a correlated probe (every synthetic customer has
    // SOME order, so the classic no-orders form would be vacuous).
    QueryDef(
      "c10_global_sales_opportunity",
      (s, d) => {
        val c = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").cast("decimal(12,2)").as("bal"))
        val thr = c.where(col("bal") > 0)
          .agg(sum(col("bal")).as("sum_pos"), count(lit(1)).as("n_pos"))
        c.join(broadcast(thr), col("bal") * col("n_pos") > col("sum_pos"))
          .join(Tables(s, d, "orders")
              .where(col("o_orderdate") >= "2001-01-01"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal")).cast("double").as("totacctbal"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH thr AS (
          SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_pos,
                 COUNT(*) AS n_pos
          FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0)
        SELECT c_mktsegment, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer, thr
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_pos > sum_pos
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // ---- c11 (Q9 shape): product-line profit by nation and year ----------
    // lineitem x supplier x nation with a part-name substring filter: the
    // part filter prunes FIRST (broadcast semi via the small filtered dim)
    // so only matching line items flow into the fact-side aggregation;
    // supplier and nation stay broadcast dimension joins. (The reference
    // schema has no partsupp, so profit omits supplycost.)
    QueryDef(
      "c11_profit_by_nation",
      (s, d) => {
        val redParts = Tables(s, d, "part")
          .where(col("p_name").like("%red%")).select(col("p_partkey"))
        val li = Tables(s, d, "lineitem")
        li.join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("l_shipdate")).as("o_year"))
          .agg(sum(money("l_extendedprice") * disc1("l_discount"))
            .cast("double").as("profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS o_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC"""),
      bench = true),

    // ---- c12 (Q18 shape): large-volume orders -----------------------------
    // the HAVING aggregate runs on lineitem alone (map-side combinable,
    // one shuffle on l_orderkey), and only the few qualifying keys join
    // back to orders/customer — never the full fact-to-fact join.
    QueryDef(
      "c12_large_volume_orders",
      (s, d) => {
        val big = Tables(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(money("l_quantity")).cast("double").as("total_qty"))
          .where(col("total_qty") > 180)
        big.join(Tables(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM (SELECT l_orderkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 180) big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100""")),

    // ---- c13 (Q14 shape): promotion revenue share --------------------------
    // conditional aggregate over a broadcast part join inside one month;
    // the date range reaches the lineitem scan as a pushed filter. The
    // division runs on the two decimal-exact sums cast to double — one
    // IEEE op on identical operands, so both engines agree bitwise.
    QueryDef(
      "c13_promo_revenue",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .where(col("l_shipdate") >= "1997-03-01" &&
            col("l_shipdate") < "1997-04-01")
        li.join(broadcast(Tables(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .agg(
            (sum(when(col("p_type") === "PROMO",
              money("l_extendedprice") * disc1("l_discount"))
              .otherwise(lit(0).cast("decimal(20,4)"))).cast("double") * 100.0 /
              sum(money("l_extendedprice") * disc1("l_discount")).cast("double"))
              .as("promo_pct"),
            count(lit(1)).as("n"))
      },
      Some(s"""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1
                      ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE) * 100.0 /
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1) AS DOUBLE) AS promo_pct,
               COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'""")),

    // ---- c14 (Q16 shape): supplier diversity per part profile -------------
    // COUNT(DISTINCT) per group with an anti-joined supplier exclusion:
    // the exclusion list (negative balances) broadcasts, the distinct
    // runs as the standard two-phase expand/aggregate on (brand,size).
    QueryDef(
      "c14_supplier_diversity",
      (s, d) => {
        val badSup = Tables(s, d, "supplier")
          .where(col("s_acctbal") < 0).select(col("s_suppkey"))
        Tables(s, d, "lineitem")
          .join(broadcast(Tables(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .where(col("p_brand") =!= "Brand#1" && col("p_size") <= 25)
          .join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .groupBy(col("p_brand"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      },
      Some("""
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size <= 25
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size""")),

    // ---- c15 (Q10 shape): returned-item revenue by customer ---------------
    // fact filter (returnflag) + order-date quarter both push to their
    // scans; customer and nation broadcast; one shuffle for the group-by,
    // top-20 via the sort-limit (TakeOrderedAndProject at execution).
    QueryDef(
      "c15_returned_items",
      (s, d) => {
        val li = Tables(s, d, "lineitem").where(col("l_returnflag") === "R")
        val o = Tables(s, d, "orders")
          .where(col("o_orderdate") >= "1998-01-01" &&
            col("o_orderdate") < "1998-04-01")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(money("l_extendedprice") * disc1("l_discount"))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1998-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    // ---- c16 (Q4 shape): order-priority count with EXISTS ------------------
    // the correlated EXISTS (an order has at least one late-value line
    // item) decorrelates to a LEFT SEMI join on the filtered lineitem —
    // never a fact-to-fact row-multiplying join; the quarter filter
    // pushes to the orders scan.
    QueryDef(
      "c16_priority_count",
      (s, d) => {
        val o = Tables(s, d, "orders")
          .where(col("o_orderdate") >= "1997-01-01" &&
            col("o_orderdate") < "1997-04-01")
        val lateLines = Tables(s, d, "lineitem")
          .where(col("l_quantity") >= 45).select(col("l_orderkey"))
        o.join(lateLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- c17 (Q5 shape): local-supplier volume (full snowflake join) ------
    // the 6-way join: lineitem->orders is the one fact-fact shuffle;
    // customer/supplier/nation/region all broadcast, and the
    // same-nation constraint (customer and supplier co-located) rides
    // the supplier join condition.
    QueryDef(
      "c17_local_volume",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val o = Tables(s, d, "orders")
          .where(col("o_orderdate") >= "1997-01-01" &&
            col("o_orderdate") < "1998-01-01")
        val c = Tables(s, d, "customer")
        val sup = Tables(s, d, "supplier")
        val nr = Tables(s, d, "nation")
          .join(broadcast(Tables(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "AMERICA")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(money("l_extendedprice") * disc1("l_discount"))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * $oDisc1) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name"""))
  )
}
