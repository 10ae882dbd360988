package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** Relational operator coverage matrix: scans, projections, filters,
  * joins (inner/left/semi/anti/outer), aggregation (group/rollup/cube/
  * distinct/having/conditional), windows (ranking/analytic/frames),
  * sorts/top-k, set ops, subqueries, scalar string/date/math/array/json
  * functions.
  *
  * Every query is expressed with `org.apache.spark.sql.functions` so the
  * whole plan stays inside whole-stage codegen, filters/projections push
  * into the parquet scan, and Catalyst is free to pick broadcast joins.
  *
  * Float-determinism convention (hash-matched against a DuckDB oracle):
  * monetary/quantity doubles are cast to DECIMAL before aggregation —
  * decimal arithmetic is exact and associative, so Spark and DuckDB agree
  * bit-for-bit; the final value is cast back to DOUBLE (both engines do
  * correctly-rounded decimal→double, yielding identical bits). Raw
  * double SUM/AVG would depend on partition/accumulation order.
  * Every query ends in a fully-deterministic ORDER BY (unique key suffix)
  * mirrored in the oracle SQL.
  */
object Relational {

  private def money(c: String): Column = col(c).cast("decimal(12,2)")
  private def factor1(sign: String, c: String): Column =
    if (sign == "-") lit(1).cast("decimal(8,2)") - col(c).cast("decimal(8,2)")
    else lit(1).cast("decimal(8,2)") + col(c).cast("decimal(8,2)")
  private def T(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  // oracle-side decimal cast helpers (DuckDB dialect)
  private def oMoney(c: String) = s"CAST($c AS DECIMAL(12,2))"
  private def oF(sign: String, c: String) =
    s"(CAST(1 AS DECIMAL(8,2)) $sign CAST($c AS DECIMAL(8,2)))"

  /** LOUD headroom guard on q01's rounded money sums (ADVICE r17): the
    * round-to-cents fix sidesteps DuckDB's wide-DECIMAL→DOUBLE
    * double-rounding only while the CENTS-scaled sum stays exactly
    * representable in a double, i.e. |sum| < 2^53 cents. That headroom
    * is ~3 orders of magnitude past sf1.0 — real, but finite — so a
    * future sf crossing it must fail the run loudly instead of quietly
    * re-introducing the 1-ulp cross-engine divergence the r17 session
    * spent a day isolating. */
  private def centsGuarded(c: Column): Column =
    when(abs(c) < lit(9007199254740992.0 / 100.0), c)
      .otherwise(raise_error(concat(
        lit("q01 money sum exceeds the 2^53-cents double headroom; " +
          "compare these columns as decimals/strings instead: "),
        c.cast("string"))))

  val defs: Seq[QueryDef] = Seq(

    // ---- 1. full scan + group aggregate (TPC-H Q1 shape) ------------------
    QueryDef(
      "q01_pricing_summary",
      (s, d) => {
        T(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(money("l_quantity")).cast("double").as("sum_qty"),
            sum(money("l_extendedprice")).cast("double").as("sum_base_price"),
            // the scale-4/6 product sums are ROUNDED back to cents
            // before the double cast: past ~2^53 (first crossed at
            // sf1.0) DuckDB's wide-DECIMAL->DOUBLE conversion double-
            // rounds (hugeint->double, then /10^s) and lands 1 ulp off
            // the correctly-rounded value Spark produces — rounding to
            // scale 2 keeps the scaled integer exact in a double for
            // ~3 more orders of magnitude, on both engines
            centsGuarded(round(sum(money("l_extendedprice") *
              factor1("-", "l_discount")), 2).cast("double"))
              .as("sum_disc_price"),
            centsGuarded(round(sum(money("l_extendedprice") *
              factor1("-", "l_discount") * factor1("+", "l_tax")), 2)
              .cast("double")).as("sum_charge"),
            (sum(money("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(${oMoney("l_quantity")}) AS DOUBLE) AS sum_qty,
          CAST(SUM(${oMoney("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
          CAST(ROUND(SUM(${oMoney("l_extendedprice")} * ${oF("-", "l_discount")}), 2) AS DOUBLE) AS sum_disc_price,
          CAST(ROUND(SUM(${oMoney("l_extendedprice")} * ${oF("-", "l_discount")} * ${oF("+", "l_tax")}), 2) AS DOUBLE) AS sum_charge,
          CAST(SUM(${oMoney("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    // ---- 2. projection + filter pushdown ----------------------------------
    QueryDef(
      "q02_filter_project",
      (s, d) =>
        T(s, d, "lineitem")
          .filter(col("l_quantity") > 45 &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- 3. 3-way join + agg + top-k (broadcast dims) ---------------------
    QueryDef(
      "q03_top_customers",
      (s, d) => {
        val c = T(s, d, "customer")
        val o = T(s, d, "orders")
        val l = T(s, d, "lineitem")
        // reduce BEFORE the fact-fact join: per-order revenue first
        // (map-side combinable, 4x fewer join rows since lineitem:orders
        // is ~4:1), then the order->customer rollup — decimal sums are
        // associative so the split is exact. At 100 TB this halves the
        // dominant shuffle; the sort-merge joins what's left.
        val perOrder = l.groupBy(col("l_orderkey"))
          .agg(sum(money("l_extendedprice") * factor1("-", "l_discount"))
            .as("__rev"))
        perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(sum(col("__rev")).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(10)
      },
      Some(s"""
        SELECT c_custkey, c_name,
          CAST(SUM(${oMoney("l_extendedprice")} * ${oF("-", "l_discount")}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 10"""),
      bench = true),

    // ---- 4. left-semi join (EXISTS) ----------------------------------------
    QueryDef(
      "q04_semi_join",
      (s, d) => {
        val o = T(s, d, "orders")
        val l = T(s, d, "lineitem").filter(col("l_quantity") >= 49)
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- 5. left-anti join (NOT EXISTS) ------------------------------------
    QueryDef(
      "q05_anti_join",
      (s, d) => {
        val c = T(s, d, "customer")
        val o = T(s, d, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // ---- 6. broadcast join with small dim ----------------------------------
    QueryDef(
      "q06_brand_volume",
      (s, d) => {
        val l = T(s, d, "lineitem")
        val p = T(s, d, "part")
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            sum(money("l_quantity")).cast("double").as("sum_qty"),
            count(lit(1)).as("n_items"))
          .orderBy("p_brand")
      },
      Some(s"""
        SELECT p_brand,
          CAST(SUM(${oMoney("l_quantity")}) AS DOUBLE) AS sum_qty,
          COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand"""),
      bench = true),

    // ---- 7. star join across 4 tables + date extraction --------------------
    QueryDef(
      "q07_nation_revenue",
      (s, d) => {
        val n = T(s, d, "nation")
        val c = T(s, d, "customer")
        val o = T(s, d, "orders")
        val l = T(s, d, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(money("l_extendedprice") * factor1("-", "l_discount"))
            .cast("double").as("revenue"))
          .orderBy("n_name", "o_year")
      },
      Some(s"""
        SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
          CAST(SUM(${oMoney("l_extendedprice")} * ${oF("-", "l_discount")}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, o_year
        ORDER BY n_name, o_year"""),
      bench = true),

    // ---- 8. window: ranking (row_number) -----------------------------------
    QueryDef(
      "q08_window_rank",
      (s, d) => {
        // lineitem has NO unique key in this synthetic data (dup
        // (l_orderkey,l_linenumber) pairs) — the window order must be a
        // total order over the full row or row_number() is nondeterministic
        // and can't hash-match the oracle.
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"))
        T(s, d, "lineitem")
          .withColumn("rn", row_number().over(w).cast("long")) // int64: match DuckDB row_number
          .filter(col("rn") <= 3)
          .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"))
          .orderBy("l_suppkey", "rn")
      },
      Some("""
        SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM (
          SELECT l_suppkey, l_orderkey, l_linenumber,
            ROW_NUMBER() OVER (PARTITION BY l_suppkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
                l_quantity, l_extendedprice, l_discount, l_tax,
                l_returnflag, l_linestatus) AS rn
          FROM lineitem) t
        WHERE rn <= 3
        ORDER BY l_suppkey, rn""")),

    // ---- 9. window: running frame (rows unbounded preceding) ---------------
    QueryDef(
      "q09_window_running",
      (s, d) => {
        // Total window order (see q08) + running_qty in the final sort:
        // full-duplicate rows get running sums that are order-dependent
        // individually but identical as a multiset, so sorting by them
        // makes the output sequence deterministic.
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, d, "lineitem")
          .withColumn("running_qty", sum(money("l_quantity")).over(w).cast("double"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("running_qty"))
          .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "running_qty")
      },
      Some(s"""
        SELECT l_orderkey, l_linenumber, l_suppkey,
          CAST(SUM(${oMoney("l_quantity")}) OVER (PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
              l_quantity, l_extendedprice, l_discount, l_tax,
              l_returnflag, l_linestatus
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, l_suppkey, running_qty"""),
      bench = true),

    // ---- 10. window: analytic (lag/lead) ------------------------------------
    QueryDef(
      "q10_window_lag",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        T(s, d, "orders")
          .withColumn("prev_price", coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)))
          .withColumn("next_key", coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)))
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("prev_price"), col("next_key"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
          COALESCE(LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey), 0.0) AS prev_price,
          COALESCE(LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey), -1) AS next_key
        FROM orders
        ORDER BY o_custkey, o_orderkey""")),

    // ---- 11. rollup ----------------------------------------------------------
    QueryDef(
      "q11_rollup",
      (s, d) =>
        T(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(money("l_quantity")).cast("double").as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n"), col("sum_qty"))
          .orderBy("returnflag", "linestatus"),
      Some(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n,
               CAST(SUM(${oMoney("l_quantity")}) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    // ---- 12. cube ------------------------------------------------------------
    QueryDef(
      "q12_cube",
      (s, d) =>
        T(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"))
          .orderBy("status", "priority"),
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---- 13. distinct + count distinct ---------------------------------------
    QueryDef(
      "q13_distinct",
      (s, d) =>
        T(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(countDistinct(col("o_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_orderstatus"),
      Some("""
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // ---- 14. union all + union distinct --------------------------------------
    QueryDef(
      "q14_union",
      (s, d) => {
        val o = T(s, d, "orders")
        val a = o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
        val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        a.union(b).distinct().orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY o_custkey""")),

    // ---- 15. intersect --------------------------------------------------------
    QueryDef(
      "q15_intersect",
      (s, d) => {
        val o = T(s, d, "orders")
        val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
        y95.intersect(y96).orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        ORDER BY o_custkey""")),

    // ---- 16. except -----------------------------------------------------------
    QueryDef(
      "q16_except",
      (s, d) => {
        val c = T(s, d, "customer").select(col("c_custkey"))
        val o = T(s, d, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey"))
        c.except(o).orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY c_custkey""")),

    // ---- 17. global sort + top-k ----------------------------------------------
    QueryDef(
      "q17_topk_orders",
      (s, d) =>
        T(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(15),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 15""")),

    // ---- 18. string functions ---------------------------------------------------
    QueryDef(
      "q18_string_funcs",
      (s, d) =>
        T(s, d, "customer")
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("name_upper"),
            substring(col("c_name"), 1, 8).as("name_pfx"),
            length(col("c_name")).as("name_len"),
            concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
            regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"))
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey,
          UPPER(c_name) AS name_upper,
          SUBSTR(c_name, 1, 8) AS name_pfx,
          CAST(LENGTH(c_name) AS INTEGER) AS name_len,
          CONCAT_WS('|', c_mktsegment, c_name) AS seg_name,
          REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS name_masked
        FROM customer
        ORDER BY c_custkey""")),

    // ---- 19. LIKE + regexp_extract ----------------------------------------------
    QueryDef(
      "q19_like_regexp",
      (s, d) =>
        T(s, d, "part")
          .filter(col("p_type").like("%A%"))
          .select(
            col("p_partkey"),
            col("p_type"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey, p_type,
          COALESCE(REGEXP_EXTRACT(p_name, '^(\w+)', 1), '') AS first_word
        FROM part
        WHERE p_type LIKE '%A%'
        ORDER BY p_partkey""")),

    // ---- 20. date/time functions --------------------------------------------------
    QueryDef(
      "q20_date_funcs",
      (s, d) =>
        T(s, d, "orders")
          .groupBy(
            year(col("o_orderdate")).as("o_year"),
            quarter(col("o_orderdate")).as("o_quarter"))
          .agg(count(lit(1)).as("n"),
            sum(money("o_totalprice")).cast("double").as("sum_price"))
          .orderBy("o_year", "o_quarter"),
      Some(s"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
               COUNT(*) AS n,
               CAST(SUM(${oMoney("o_totalprice")}) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY o_year, o_quarter
        ORDER BY o_year, o_quarter""")),

    // ---- 21. math functions ---------------------------------------------------------
    QueryDef(
      "q21_math_funcs",
      (s, d) =>
        T(s, d, "customer")
          .select(
            col("c_custkey"),
            abs(col("c_acctbal")).as("bal_abs"),
            floor(col("c_acctbal")).cast("long").as("bal_floor"),
            ceil(col("c_acctbal")).cast("long").as("bal_ceil"),
            sqrt(abs(col("c_acctbal"))).as("bal_sqrt"),
            (col("c_custkey") % 7).as("key_mod"))
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey,
          ABS(c_acctbal) AS bal_abs,
          CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
          CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
          SQRT(ABS(c_acctbal)) AS bal_sqrt,
          c_custkey % 7 AS key_mod
        FROM customer
        ORDER BY c_custkey""")),

    // ---- 22. CASE WHEN bucketing -------------------------------------------------------
    QueryDef(
      "q22_case_when",
      (s, d) =>
        T(s, d, "lineitem")
          .select(
            when(col("l_quantity") < 10, "low")
              .when(col("l_quantity") < 30, "mid")
              .otherwise("high").as("qty_bucket"))
          .groupBy(col("qty_bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("qty_bucket"),
      Some("""
        SELECT CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'high' END AS qty_bucket,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY qty_bucket
        ORDER BY qty_bucket""")),

    // ---- 23. outer joins ------------------------------------------------------------------
    QueryDef(
      "q23_outer_join",
      (s, d) => {
        val n = T(s, d, "nation")
        val c = T(s, d, "customer")
        n.join(c, col("n_nationkey") === col("c_nationkey"), "left")
          .groupBy(col("n_name"))
          .agg(count(col("c_custkey")).as("n_customers"))
          .orderBy("n_name")
      },
      Some("""
        SELECT n_name, COUNT(c_custkey) AS n_customers
        FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        GROUP BY n_name
        ORDER BY n_name""")),

    // ---- 24. min/max over strings + ints ----------------------------------------------------
    QueryDef(
      "q24_minmax",
      (s, d) =>
        T(s, d, "part")
          .groupBy(col("p_brand"))
          .agg(
            min(col("p_name")).as("first_name"),
            max(col("p_name")).as("last_name"),
            min(col("p_size")).as("min_size"),
            max(col("p_size")).as("max_size"))
          .orderBy("p_brand"),
      Some("""
        SELECT p_brand, MIN(p_name) AS first_name, MAX(p_name) AS last_name,
               MIN(p_size) AS min_size, MAX(p_size) AS max_size
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // ---- 25. HAVING ----------------------------------------------------------------------------
    QueryDef(
      "q25_having",
      (s, d) =>
        T(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(money("o_totalprice")).cast("double").as("total_spent"))
          .filter(col("n_orders") >= 3)
          .orderBy("o_custkey"),
      Some(s"""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(${oMoney("o_totalprice")}) AS DOUBLE) AS total_spent
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 3
        ORDER BY o_custkey""")),

    // ---- 26. IN subquery (semi join) ------------------------------------------------------------
    QueryDef(
      "q26_in_subquery",
      (s, d) => {
        val o = T(s, d, "orders")
        val building = T(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        o.join(building, col("o_custkey") === col("c_custkey"), "left_semi")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        ORDER BY o_orderkey""")),

    // ---- 27. scalar subquery (filter vs global aggregate) -----------------------------------------
    QueryDef(
      "q27_scalar_subquery",
      (s, d) => {
        val o = T(s, d, "orders")
        val avgPrice = o.agg(
          (sum(money("o_totalprice")).cast("double") / count(lit(1))).as("avg_price"))
        o.crossJoin(avgPrice)
          .filter(col("o_totalprice") > col("avg_price") * 1.5)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some(s"""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(${oMoney("o_totalprice")}) AS DOUBLE) / COUNT(*)
                              FROM orders) * 1.5
        ORDER BY o_orderkey""")),

    // ---- 28. conditional aggregation ----------------------------------------------------------------
    QueryDef(
      "q28_conditional_agg",
      (s, d) =>
        T(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_discounted"),
            sum(when(col("l_tax") === 0.0, 1).otherwise(0)).as("n_taxfree"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
          CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
          CAST(SUM(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree,
          COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---- 29. array functions over split text --------------------------------------------------------
    QueryDef(
      "q29_array_funcs",
      (s, d) =>
        Tables.corpus(s, d)
          .select(
            col("doc_id"),
            col("lang"),
            size(split(trim(col("text")), "\\s+")).as("n_tokens"),
            array_contains(split(trim(col("text")), "\\s+"), "data").as("has_data"))
          .groupBy(col("lang"))
          .agg(
            sum(col("n_tokens")).as("total_tokens"),
            sum(when(col("has_data"), 1).otherwise(0)).as("n_docs_with_data"),
            count(lit(1)).as("n_docs"))
          .orderBy("lang"),
      Some("""
        SELECT lang,
          CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
          CAST(SUM(CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'data')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_data,
          COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
        ORDER BY lang""")),

    // ---- 30. JSON extraction --------------------------------------------------------------------------
    QueryDef(
      "q30_json_funcs",
      (s, d) =>
        T(s, d, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k"),
            count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
          COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- 31. time bucketing over the event stream table (batch form) ----------------------------------
    QueryDef(
      "q31_event_buckets",
      (s, d) =>
        T(s, d, "events")
          .groupBy(
            unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(money("value")).cast("double").as("sum_value"))
          .orderBy("hour_ms", "event_type"),
      Some(s"""
        SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
               COUNT(*) AS n,
               CAST(SUM(${oMoney("value")}) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY hour_ms, event_type
        ORDER BY hour_ms, event_type"""),
      bench = true),

    // ---- 32. full outer join ----------------------------------------------------------------------------
    QueryDef(
      "q32_full_outer",
      (s, d) => {
        val hi = T(s, d, "orders").filter(col("o_totalprice") > 300000)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_hi"))
        val lo = T(s, d, "orders").filter(col("o_totalprice") < 5000)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_lo"))
        hi.join(lo, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            coalesce(col("n_hi"), lit(0L)).as("n_hi"),
            coalesce(col("n_lo"), lit(0L)).as("n_lo"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT COALESCE(hi.o_custkey, lo.o_custkey) AS o_custkey,
               COALESCE(n_hi, 0) AS n_hi, COALESCE(n_lo, 0) AS n_lo
        FROM (SELECT o_custkey, COUNT(*) AS n_hi FROM orders
              WHERE o_totalprice > 300000 GROUP BY o_custkey) hi
        FULL OUTER JOIN
             (SELECT o_custkey, COUNT(*) AS n_lo FROM orders
              WHERE o_totalprice < 5000 GROUP BY o_custkey) lo
        ON hi.o_custkey = lo.o_custkey
        ORDER BY o_custkey""")),

    // ---- 33. map functions over data (construct / element_at / keys) -----------------------------
    // map columns never reach the output (the gate's pandas compare can't
    // hash dicts) — extraction yields scalar columns on both engines
    QueryDef(
      "q33_map_funcs",
      (s, d) =>
        T(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("double").as("__n"),
            max(col("l_quantity")).cast("double").as("__maxq"))
          .select(col("l_returnflag"),
            map(lit("n"), col("__n"), lit("maxq"), col("__maxq")).as("m"))
          .select(col("l_returnflag"),
            element_at(col("m"), "n").as("n_rows"),
            element_at(col("m"), "maxq").as("max_qty"),
            array_join(map_keys(col("m")), ",").as("mkeys"))
          .orderBy("l_returnflag"),
      Some("""
        WITH agg AS (
          SELECT l_returnflag,
                 MAP {'n': CAST(count(*) AS DOUBLE),
                      'maxq': CAST(max(l_quantity) AS DOUBLE)} AS m
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag,
               m['n'][1] AS n_rows, m['maxq'][1] AS max_qty,
               array_to_string(map_keys(m), ',') AS mkeys
        FROM agg ORDER BY l_returnflag""")),

    // ---- q34: exact discrete percentiles via cume_dist — the
    // interpolation-free formulation (min value with cume_dist >= p), so
    // the result is a value FROM the data and hash-compares across
    // engines with zero float-arithmetic divergence. One window + one
    // aggregation, both shuffling on the group key.
    QueryDef(
      "q34_percentiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        T(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"),
            cume_dist().over(w).as("cd"))
          .groupBy("l_returnflag")
          .agg(
            min(when(col("cd") >= 0.5, col("l_extendedprice"))).as("median_price"),
            min(when(col("cd") >= 0.95, col("l_extendedprice"))).as("p95_price"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH cd AS (
          SELECT l_returnflag, l_extendedprice,
                 cume_dist() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice) AS cd
          FROM lineitem)
        SELECT l_returnflag,
               min(CASE WHEN cd >= 0.5 THEN l_extendedprice END) AS median_price,
               min(CASE WHEN cd >= 0.95 THEN l_extendedprice END) AS p95_price,
               max(l_extendedprice) AS max_price,
               count(*) AS n
        FROM cd GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q41: interpolated percentiles (percentile_cont semantics) -------
    // the exact continuous quantile — linear interpolation between the
    // two straddling order statistics. Both engines interpolate the same
    // rationals; the result is fixed-pointed to 1e-4 so a last-ulp
    // association difference cannot break the hash compare.
    QueryDef(
      "q41_percentile_cont",
      (s, d) => {
        def r4(c: org.apache.spark.sql.Column) =
          floor(c * 10000.0 + 0.5) / 10000.0
        T(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            r4(expr("percentile(l_extendedprice, 0.5)")).as("p50"),
            r4(expr("percentile(l_extendedprice, 0.9)")).as("p90"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               floor(quantile_cont(l_extendedprice, 0.5) * 10000.0 + 0.5)/10000.0 AS p50,
               floor(quantile_cont(l_extendedprice, 0.9) * 10000.0 + 0.5)/10000.0 AS p90,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---- q42: top standardized deviations per group (z-score ranking) ----
    // the outlier-detection shape: per-type mean/variance from ONE
    // map-side-combinable agg (decimal-exact sum/sumsq/count), broadcast
    // back, rank every event by z². Parity discipline: all moments stay
    // exact decimals; z² is one double division of identical operands,
    // fixed-pointed to 1e-4 before the sort (event_id tiebreak).
    QueryDef(
      "q42_top_deviations",
      (s, d) => {
        val ev = T(s, d, "events")
          .select(col("event_id"), col("event_type"),
            col("value").cast("decimal(18,6)").as("v"))
        val stats = ev.groupBy(col("event_type"))
          .agg(sum(col("v")).as("sv"),
            sum(col("v") * col("v")).as("svv"),
            count(lit(1)).as("n"))
        // z² = (v·n − sv)² / ((svv·n − sv²)·n), exact until one division
        val num = (col("v") * col("n") - col("sv")) *
          (col("v") * col("n") - col("sv"))
        val den = (col("svv") * col("n") - col("sv") * col("sv")) * col("n")
        ev.join(broadcast(stats), Seq("event_type"))
          .withColumn("zsq",
            floor(num.cast("double") / den.cast("double") * 10000.0 + 0.5) / 10000.0)
          .select(col("event_id"), col("event_type"), col("zsq"))
          .orderBy(col("zsq").desc, col("event_id"))
          .limit(20)
      },
      Some("""
        WITH stats AS (
          SELECT event_type,
                 SUM(CAST(value AS DECIMAL(18,6))) AS sv,
                 SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS svv,
                 COUNT(*) AS n
          FROM events GROUP BY event_type)
        SELECT event_id, e.event_type,
               floor(CAST((CAST(value AS DECIMAL(18,6)) * n - sv) *
                          (CAST(value AS DECIMAL(18,6)) * n - sv) AS DOUBLE) /
                     CAST((svv * n - sv * sv) * n AS DOUBLE) * 10000.0 + 0.5) / 10000.0
                 AS zsq
        FROM events e JOIN stats s ON e.event_type = s.event_type
        ORDER BY zsq DESC, event_id
        LIMIT 20""")),

    // ---- q35: gaps-and-islands sessionization (lag + running sum) --------
    // batch analog of the session window: an island = consecutive
    // same-user events with gaps <= 30 min. Two windows over ONE
    // partition-by-user sort (Spark reuses the exchange+sort between
    // same-spec windows) + one aggregation. (ts, event_id) is the total
    // order, so duplicate timestamps cannot flake the hash compare.
    QueryDef(
      "q35_gaps_islands",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("__new",
            coalesce((unix_millis(col("ts")) -
              unix_millis(lag(col("ts"), 1).over(w)) >
              lit(30L * 60 * 1000)).cast("int"), lit(0)))
          .withColumn("island",
            sum(col("__new")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("island"))
          .agg(
            unix_millis(min(col("ts"))).as("start_ms"),
            unix_millis(max(col("ts"))).as("end_ms"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id", "island")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))
                      > 30*60*1000 THEN 1 ELSE 0 END AS new_island
          FROM events),
        islands AS (
          SELECT user_id, ts,
                 CAST(SUM(new_island) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
          FROM flagged)
        SELECT user_id, island,
               epoch_ms(MIN(ts)) AS start_ms, epoch_ms(MAX(ts)) AS end_ms,
               COUNT(*) AS n_events
        FROM islands GROUP BY user_id, island
        ORDER BY user_id, island"""),
      bench = true),

    // ---- 36. window: RANGE frame over event time ---------------------------
    // trailing-hour running sum per user — a RANGE (value-based) frame,
    // not ROWS: peers with equal timestamps share one frame, and the
    // frame extent is a time interval. Values sum as decimals so the
    // in-frame accumulation order can't produce engine-dependent fp
    // drift; one shuffle (user hash), one sort per partition.
    QueryDef(
      "q36_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("__sec"))
          .rangeBetween(-3600, Window.currentRow)
        T(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts"),
            (unix_millis(col("ts")).cast("double") / 1000.0).as("__sec"),
            col("value").cast("decimal(18,6)").as("__v"))
          .withColumn("hour_sum", sum(col("__v")).over(w).cast("double"))
          .select(col("event_id"), col("user_id"), col("hour_sum"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                 PARTITION BY user_id ORDER BY epoch_ms(ts)/1000.0
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS hour_sum
        FROM events
        ORDER BY event_id""")),

    // ---- q37: Z-order clustering key (multi-dim layout) -------------------
    // the Morton key ScaleOps.zorderRepartition clusters 100 TB tables
    // by, checked bit-for-bit: the oracle replays all 32 interleave
    // terms as plain BIGINT shift/mask arithmetic. Key built over
    // (user_id, event minute), the two dimensions a time-series scan
    // prunes on.
    QueryDef(
      "q37_zorder_cluster",
      (s, d) => {
        val ev = T(s, d, "events").select(col("event_id"),
          col("user_id").as("__u"),
          expr("unix_micros(ts) div 60000000").as("__m"))
        ev.select(col("event_id"),
            graft.functions.ScaleOps.zorderKey(col("__u"), col("__m"), 16).as("zkey"))
          .orderBy(col("zkey"), col("event_id"))
          .limit(1000)
      },
      Some {
        val u = "(user_id & 65535)"
        val m = "(((epoch_us(ts) // 60000000)) & 65535)"
        val zSql = (0 until 16).map { i =>
          s"((($u >> $i) & 1) << ${2 * i}) + ((($m >> $i) & 1) << ${2 * i + 1})"
        }.mkString(" + ")
        s"""
        SELECT event_id, $zSql AS zkey
        FROM events
        ORDER BY zkey, event_id
        LIMIT 1000"""
      }),

    // ---- q38: ordered funnel (view -> click -> purchase) ------------------
    // each stage is a keyed aggregate joined back on user_id — three
    // aggregations sharing ONE hash partitioning (no per-stage resort),
    // no window over the whole event stream, no self-join explosion. The
    // "after the previous stage" condition rides the join as a range
    // predicate against the single previous-stage timestamp.
    QueryDef(
      "q38_funnel",
      (s, d) => {
        val ev = T(s, d, "events")
        val v = ev.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("vt"))
        val c = ev.where(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .where(col("ts") >= col("vt"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("ct"))
        val p = ev.where(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .where(col("ts") >= col("ct"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
      },
      Some("""
        WITH v AS (
          SELECT user_id, min(ts) AS vt FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, min(e.ts) AS ct
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.vt
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS pt
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.ct
          GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_click,
               (SELECT COUNT(*) FROM p) AS n_purchase""")),

    // ---- q39: cohort retention (signup week x weeks-since) ----------------
    // cohort = each user's first signup week; retention counts distinct
    // users active k weeks later. One aggregate for cohorts (map-side
    // combinable min), cohort joins back on user_id (same partitioning
    // as the event stream group), distinct-count per (cohort, offset).
    // Week arithmetic is pure integer epoch math — identical in any
    // engine, no locale-dependent week-of-year.
    QueryDef(
      "q39_cohort_retention",
      (s, d) => {
        val ev = T(s, d, "events")
        val cohort = ev.where(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(expr("min(unix_micros(ts)) div 604800000000").as("cohort_week"))
        ev.select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("event_week"))
          .join(cohort, Seq("user_id"))
          .where(col("event_week") >= col("cohort_week"))
          .groupBy(col("cohort_week"),
            (col("event_week") - col("cohort_week")).as("week_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""
        WITH cohort AS (
          SELECT user_id,
                 min(epoch_us(ts) // 604800000000) AS cohort_week
          FROM events WHERE event_type = 'signup' GROUP BY user_id)
        SELECT cohort_week,
               (epoch_us(e.ts) // 604800000000) - cohort_week AS week_offset,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e JOIN cohort c ON e.user_id = c.user_id
        WHERE (epoch_us(e.ts) // 604800000000) >= cohort_week
        GROUP BY 1, 2
        ORDER BY cohort_week, week_offset""")),

    // ---- q40: event-transition counts (sequence mining) --------------------
    // per-user next-event bigrams via ONE lag window (a single user-
    // partitioned sort), then a global count per (from, to) transition —
    // the first-order Markov summary of the event stream.
    QueryDef(
      "q40_event_transitions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        T(s, d, "events")
          .select(col("user_id"), col("event_type").as("to_type"),
            lag(col("event_type"), 1).over(w).as("from_type"))
          .where(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy("from_type", "to_type")
      },
      Some("""
        SELECT from_type, to_type, COUNT(*) AS n FROM (
          SELECT user_id, event_type AS to_type,
                 LAG(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS from_type
          FROM events) t
        WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
        ORDER BY from_type, to_type""")),

    // ---- 43. session attribution (first-touch) ----------------------------
    // marketing-attribution shape: every purchase credits the FIRST
    // event type of its 30-min session. One user-partitioned sort feeds
    // the session ids AND the first_value — the same shared-window
    // stance as q35 — then one small aggregation; revenue sums in
    // decimal so accumulation order cannot move the double.
    QueryDef(
      "q43_attribution",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sessions = T(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"))
          .withColumn("__new",
            coalesce((unix_millis(col("ts")) -
              unix_millis(lag(col("ts"), 1).over(w)) >
              lit(30L * 60 * 1000)).cast("int"), lit(0)))
          .withColumn("sess",
            sum(col("__new")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val ws = Window.partitionBy("user_id", "sess")
          .orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sessions
          .withColumn("first_touch", first(col("event_type")).over(ws))
          .where(col("event_type") === "purchase")
          .groupBy(col("first_touch"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("revenue"))
          .orderBy("first_touch")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type, value,
                 CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))
                      > 30*60*1000 THEN 1 ELSE 0 END AS new_sess
          FROM events),
        sess AS (
          SELECT user_id, ts, event_id, event_type, value,
                 SUM(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS s
          FROM flagged),
        touched AS (
          SELECT event_type, value,
                 FIRST_VALUE(event_type) OVER (PARTITION BY user_id, s
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                   AS first_touch
          FROM sess)
        SELECT first_touch, COUNT(*) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM touched WHERE event_type = 'purchase'
        GROUP BY first_touch ORDER BY first_touch""")),

    // ---- 44. per-group top-k via a custom partial aggregate ---------------
    // [[graft.functions.TopKAgg]] (TypedImperativeAggregate): each map
    // task retains at most k rows per group, so only k·partitions rows
    // per group shuffle — the window-function formulation (the oracle)
    // shuffles and sorts EVERY row of every group. Identical output by
    // construction: (value desc, id asc) is a total order.
    QueryDef(
      "q44_group_topk",
      (s, d) => {
        val orders = T(s, d, "orders")
        graft.functions.TopKAgg.ensureRegistered(s)
        orders.groupBy(col("o_custkey"))
          .agg(graft.functions.TopKAgg.column(s,
            col("o_totalprice").cast("double"), col("o_orderkey"), k = 3)
            .as("__ids"))
          .select(col("o_custkey"),
            posexplode(col("__ids")).as(Seq("__r0", "o_orderkey")))
          .select(col("o_custkey"), (col("__r0") + 1).cast("long").as("rank"),
            col("o_orderkey"))
          .orderBy("o_custkey", "rank")
      },
      Some("""
        SELECT o_custkey, rank, o_orderkey FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders)
        WHERE rank <= 3
        ORDER BY o_custkey, rank""")),

    // ---- q45: time-series gap fill + trailing moving average --------------
    // hourly per-type event counts on a COMPLETE hour spine (missing
    // buckets filled with 0) and a 3-hour trailing moving average —
    // the dashboard/anomaly-feed shape raw groupBy can't produce
    // (absent hours silently vanish). The spine is generated from the
    // global [min,max] hour (one tiny aggregate, exploded sequence),
    // cross-joined with the distinct types (bounded dimension), left-
    // joined with the counts; the moving window is PARTITIONED by type
    // and ordered by the integer hour — never global. The average is
    // emitted as floor(1000*sum/cnt) — integer window sums, one exact
    // division on identical operands.
    QueryDef(
      "q45_gapfill_ma",
      (s, d) => {
        val ev = T(s, d, "events")
        val counts = ev.groupBy(
          unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
          col("event_type"))
          .agg(count(lit(1)).as("n"))
        val bounds = ev.agg(
          unix_millis(date_trunc("hour", min(col("ts")))).as("lo"),
          unix_millis(date_trunc("hour", max(col("ts")))).as("hi"))
        val spine = bounds.select(explode(
          sequence(col("lo"), col("hi"), lit(3600000L))).as("hour_ms"))
        val types = ev.select(col("event_type")).distinct()
        val filled = spine.crossJoin(broadcast(types))
          .join(counts, Seq("hour_ms", "event_type"), "left")
          .select(col("hour_ms"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("hour_ms"))
          .rowsBetween(-2, 0)
        filled
          .withColumn("sum3", sum(col("n")).over(w))
          .withColumn("cnt3", count(lit(1)).over(w))
          .select(col("hour_ms"), col("event_type"), col("n"),
            floor(col("sum3").cast("double") * 1000.0 /
              col("cnt3").cast("double")).cast("long").as("ma_milli"))
          .orderBy("hour_ms", "event_type")
      },
      Some("""
        WITH counts AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        bounds AS (
          SELECT epoch_ms(date_trunc('hour', MIN(ts))) AS lo,
                 epoch_ms(date_trunc('hour', MAX(ts))) AS hi
          FROM events),
        spine AS (
          SELECT unnest(generate_series(lo, hi, 3600000)) AS hour_ms
          FROM bounds),
        types AS (SELECT DISTINCT event_type FROM events),
        filled AS (
          SELECT s.hour_ms, t.event_type, COALESCE(c.n, 0) AS n
          FROM spine s CROSS JOIN types t
          LEFT JOIN counts c
            ON c.hour_ms = s.hour_ms AND c.event_type = t.event_type),
        win AS (
          SELECT hour_ms, event_type, n,
                 SUM(n) OVER (PARTITION BY event_type ORDER BY hour_ms
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sum3,
                 COUNT(*) OVER (PARTITION BY event_type ORDER BY hour_ms
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt3
          FROM filled)
        SELECT hour_ms, event_type, CAST(n AS BIGINT) AS n,
               CAST(floor(CAST(sum3 AS DOUBLE) * 1000.0 /
                 CAST(cnt3 AS DOUBLE)) AS BIGINT) AS ma_milli
        FROM win
        ORDER BY hour_ms, event_type""")),

    // ---- q46: distribution-rank analytics (percent_rank/cume_dist/ntile) --
    // the remaining analytic-function family: order position as a
    // fraction of the partition. The window ORDER key is made UNIQUE
    // ((o_totalprice desc, o_orderkey)) so ntile's positional split is
    // deterministic; percent_rank = (rank-1)/(n-1) and cume_dist =
    // rank/n are rationals of integers, emitted fixed-pointed — the
    // per-row division runs on identical operands in both engines.
    // Partitioned by order priority (never a global window).
    QueryDef(
      "q46_rank_distribution",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        T(s, d, "orders")
          .withColumn("pr6",
            floor(percent_rank().over(w) * 1e6).cast("long"))
          .withColumn("cd6",
            floor(cume_dist().over(w) * 1e6).cast("long"))
          .withColumn("decile", ntile(10).over(w).cast("long"))
          .where(col("decile") === 1 || col("decile") === 10)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("pr6"), col("cd6"), col("decile"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH w AS (
          SELECT o_orderkey, o_orderpriority,
                 CAST(floor(percent_rank() OVER win * 1e6) AS BIGINT) AS pr6,
                 CAST(floor(cume_dist() OVER win * 1e6) AS BIGINT) AS cd6,
                 CAST(ntile(10) OVER win AS BIGINT) AS decile
          FROM orders
          WINDOW win AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey ASC))
        SELECT o_orderkey, o_orderpriority, pr6, cd6, decile
        FROM w
        WHERE decile IN (1, 10)
        ORDER BY o_orderkey""")),

    // ---- q47: runtime bloom-filter semi-join reduction --------------------
    // the fact ⋈ selective-dim shuffle-killer: the dim side's keys fold
    // into one 16 KiB bitmap (partial-aggregable OR), the fact side is
    // prefiltered IN THE SCAN STAGE by the codegen membership test, and
    // only survivors (matches + tunable false positives) shuffle for
    // the exact join. No false negatives, so the RESULT is
    // bloom-independent — the oracle is the plain join — while the
    // ~90% shuffle reduction at this predicate is pinned in ScalaTest
    // (BloomFilterSuite). l_quantity is integral in this corpus, so the
    // long sum is exact.
    QueryDef(
      "q47_bloom_semijoin",
      (s, d) => {
        val hot = T(s, d, "orders").where(col("o_totalprice") > 450000)
        graft.functions.BloomFilterOps.bloomPrefilter(
            T(s, d, "lineitem"), "l_orderkey", hot, "o_orderkey")
          .join(hot, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 450000
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      bench = true),

    // ---- q48: salted skew join under the correctness gate -----------------
    // ScaleOps.saltedJoin (the pathological-skew tool: deterministic
    // xxhash64 row salt fans a hot key across saltFactor reducers,
    // dimension replicated to match) must be RESULT-identical to the
    // plain join — that invariant is exactly what an oracle can pin.
    // The suite (ScaleOpsSuite) pins the partition spreading; this gate
    // pins the semantics on real tables. l_quantity is integral, so the
    // long sum is exact.
    QueryDef(
      "q48_salted_join",
      (s, d) =>
        graft.functions.ScaleOps.saltedJoin(
            T(s, d, "lineitem").select(col("l_suppkey").as("k"),
              col("l_quantity")),
            T(s, d, "supplier").select(col("s_suppkey").as("k"),
              col("s_nationkey")),
            "k", saltFactor = 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("s_nationkey"),
      Some("""
        SELECT s_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
        ORDER BY s_nationkey""")),

    // ---- q49: regression / correlation aggregates, exactly ----------------
    // corr / slope / intercept of (x = linenumber, y = quantity) per
    // order priority — NOT via the built-in corr() (whose double
    // accumulation is partition-order dependent and can differ across
    // engines in the last ulp) but from the five EXACT integer moment
    // sums (n, Σx, Σy, Σxy, Σx², Σy²), which partial-aggregate
    // map-side and are order-free; the statistics then derive from one
    // deterministic IEEE op sequence on identical operands, emitted
    // fixed-pointed. The formulation that stays bit-stable at any
    // scale and any partitioning — 100 TB discipline applied to
    // floating-point statistics.
    QueryDef(
      "q49_regression_stats",
      (s, d) => {
        val li = T(s, d, "lineitem")
          .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            col("l_linenumber").cast("long").as("x"),
            col("l_quantity").cast("long").as("y"))
        val m = li.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val nD = col("n").cast("double")
        val cov = nD * col("sxy") - col("sx") * col("sy")
        val vx = nD * col("sxx") - col("sx") * col("sx")
        val vy = nD * col("syy") - col("sy") * col("sy")
        m.select(col("o_orderpriority"), col("n"),
            floor(lit(1e6) * cov / sqrt(vx * vy)).cast("long").as("corr6"),
            floor(lit(1e6) * cov / vx).cast("long").as("slope6"),
            floor(lit(1e6) * (col("sy") - (cov / vx) * col("sx")) / nD)
              .cast("long").as("intercept6"))
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH m AS (
          SELECT o_orderpriority, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
                 SUM(x*x) AS sxx, SUM(y*y) AS syy
          FROM (
            SELECT o_orderpriority,
                   CAST(l_linenumber AS BIGINT) AS x,
                   CAST(l_quantity AS BIGINT) AS y
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
          GROUP BY o_orderpriority)
        SELECT o_orderpriority, n,
               CAST(floor(1e6 * (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
                 / sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
                      * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)))
                 AS BIGINT) AS corr6,
               CAST(floor(1e6 * (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
                 / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx))
                 AS BIGINT) AS slope6,
               CAST(floor(1e6 * (CAST(sy AS DOUBLE)
                 - ((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
                    / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)) * sx)
                 / CAST(n AS DOUBLE)) AS BIGINT) AS intercept6
        FROM m
        ORDER BY o_orderpriority""")),

    // ---- q50: skyline (2-D Pareto frontier) -------------------------------
    // parts not dominated on (size max, price min) — the multi-criteria
    // shortlist operator. The naive definition is an all-pairs NOT
    // EXISTS (the oracle runs exactly that); the scale plan exploits the
    // 2-D structure: per-size min price (partial-aggregated, <= |size
    // domain| rows), a suffix-min over that BOUNDED aggregate (window
    // input is the size domain, not the data — the p13 sketch-window
    // argument), broadcast back; a row survives iff it holds its size's
    // min AND no larger size undercuts it. One scan + one tiny window +
    // one broadcast join at any corpus size.
    QueryDef(
      "q50_skyline",
      (s, d) => {
        val p = Tables(s, d, "part")
          .select(col("p_partkey"), col("p_size"),
            round(col("p_retailprice") * 100).cast("long").as("price_cents"))
        val minP = p.groupBy("p_size")
          .agg(min(col("price_cents")).as("__minp"))
        val w = Window.orderBy(col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = minP
          .withColumn("__above", min(col("__minp")).over(w))
        p.join(broadcast(frontier), "p_size")
          .where(col("price_cents") === col("__minp") &&
            (col("__above").isNull || col("__above") > col("price_cents")))
          .select(col("p_partkey"), col("p_size"), col("price_cents"))
          .orderBy("p_partkey")
      },
      Some("""
        WITH p AS (
          SELECT p_partkey, p_size,
                 CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
          FROM part)
        SELECT p_partkey, p_size, price_cents
        FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
            AND (b.p_size > a.p_size OR b.price_cents < a.price_cents))
        ORDER BY p_partkey""")),

    // ---- q52: UNPIVOT (wide metrics -> long form, a01's inverse) ----------
    // the standard-SQL UNPIVOT clause over a per-flag metric block — a
    // narrow projection fan-out (3 rows per input row, no shuffle beyond
    // the aggregate underneath). All metric columns cast to one type, as
    // the relational UNPIVOT requires.
    QueryDef(
      "q52_unpivot",
      (s, d) => {
        Tables(s, d, "lineitem").createOrReplaceTempView("li_unpivot")
        s.sql("""
          WITH m AS (
            SELECT l_returnflag,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_disc
            FROM li_unpivot GROUP BY l_returnflag)
          SELECT l_returnflag, metric, value
          FROM m UNPIVOT (value FOR metric IN (sum_qty, n_rows, n_disc))
          ORDER BY l_returnflag, metric""")
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag,
                 CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_disc
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, metric, value
        FROM m UNPIVOT (value FOR metric IN (sum_qty, n_rows, n_disc))
        ORDER BY l_returnflag, metric""")),

    // ---- q53: salted two-level HOLISTIC aggregation ------------------------
    // the skew class neither AQE (can't split an agg partition) nor
    // partial aggregation (collect has no shrinking combine) rescues:
    // distinct-value collection on a hot key. ScaleOps.saltedDistinctList
    // splits each key's values across salt-of-value level-1 tasks
    // (bounded distinct slices), then merges saltFactor ARRAYS per key.
    // Output flattened to CSV (the gate cannot hash array columns).
    QueryDef(
      "q53_salted_distinct_list",
      (s, d) =>
        graft.functions.ScaleOps
          .saltedDistinctList(Tables(s, d, "part"),
            "p_type", "p_brand", saltFactor = 8)
          .select(col("p_type"),
            concat_ws(",", col("vals")).as("brands_csv"))
          .orderBy("p_type"),
      Some("""
        SELECT p_type,
               string_agg(DISTINCT p_brand, ',' ORDER BY p_brand)
                 AS brands_csv
        FROM part
        GROUP BY p_type
        ORDER BY p_type"""))
  )
}
