package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Remaining relational-surface coverage: pivot, ordered array
  * aggregation, and grouping sets (the one grouping form the DataFrame
  * API lacks — expressed through spark.sql over a registered view).
  */
object Advanced {

  private def money(c: String) = col(c).cast("decimal(12,2)")

  val defs: Seq[QueryDef] = Seq(

    // ---- a01: pivot ------------------------------------------------------
    QueryDef(
      "a01_pivot",
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(sum(money("o_totalprice")).cast("double"))
          .na.fill(0.0, Seq("F", "O", "P"))
          .orderBy("o_year"),
      Some("""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
          COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS F,
          COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS O,
          COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS P
        FROM orders
        GROUP BY o_year
        ORDER BY o_year""")),

    // ---- a02: ordered array aggregation ----------------------------------
    QueryDef(
      "a02_array_agg",
      (s, d) =>
        Tables(s, d, "nation")
          .join(Tables(s, d, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          // scalar (not array) result: the driver's pandas gate cannot
          // sort/hash list-typed columns, so both engines emit a CSV string
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
            count(lit(1)).as("n"))
          .orderBy("r_name"),
      Some("""
        SELECT r_name, list_aggregate(list_sort(list(n_name)), 'string_agg', ',') AS nations, COUNT(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")),

    // ---- a04: as-of join (latest view at-or-before each purchase) --------
    // Spark has no built-in as-of join; ScaleOps.asofJoin is the
    // union+window merge (one shuffle, no per-key range explosion).
    // DuckDB's native ASOF LEFT JOIN is the oracle.
    QueryDef(
      "a04_asof_join",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"))
        graft.functions.ScaleOps
          .asofJoin(purchases, views, "user_id", "ts", "ts", Seq("view_event_id"))
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"), col("asof_view_event_id"))
          .orderBy("event_id")
      },
      Some("""
        SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
               v.event_id AS asof_view_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id"""),
      bench = true),

    // ---- a05: interval (range) join — errors within 5 min of a signup ----
    // bin-bucketed equi-join (ScaleOps.intervalJoin) instead of a raw
    // range predicate, so hot users don't turn into quadratic pair blowup
    QueryDef(
      "a05_interval_join",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val signups = ev.where(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = ev.where(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id").as("err_event_id"))
        graft.functions.ScaleOps
          .intervalJoin(signups, errors, "user_id", "ts", "ts",
            windowSec = 300L, Seq("err_event_id"))
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"), col("match_err_event_id"))
          .orderBy("event_id", "match_err_event_id")
      },
      Some("""
        SELECT s.event_id, s.user_id, epoch_ms(s.ts) AS ts_ms,
               e.event_id AS match_err_event_id
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        JOIN (SELECT * FROM events WHERE event_type = 'error') e
          ON s.user_id = e.user_id
         AND e.ts >= s.ts AND e.ts <= s.ts + INTERVAL 5 MINUTE
        ORDER BY s.event_id, match_err_event_id"""),
      bench = true),

    // ---- a06: as-of join with a staleness tolerance ----------------------
    // same merge plan as a04; matches older than the tolerance null out
    // AFTER the merge, so the bound costs one comparison, not a plan
    // change. Oracle: DuckDB ASOF LEFT JOIN with a CASE age filter.
    QueryDef(
      "a06_asof_tolerance",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"))
        graft.functions.ScaleOps
          .asofJoin(purchases, views, "user_id", "ts", "ts",
            Seq("view_event_id"), toleranceSec = Some(3600L))
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"), col("asof_view_event_id"))
          .orderBy("event_id")
      },
      Some("""
        SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
               CASE WHEN v.ts >= c.ts - INTERVAL 1 HOUR THEN v.event_id END
                 AS asof_view_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id""")),

    // ---- a07: forward as-of join (next event at-or-after) ----------------
    // the merge scans time DESCENDING, so the running last is the nearest
    // following row; DuckDB's ASOF operator takes the <= comparison
    // directly.
    QueryDef(
      "a07_asof_forward",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val views = ev.where(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("purchase_event_id"))
        graft.functions.ScaleOps
          .asofJoin(views, purchases, "user_id", "ts", "ts",
            Seq("purchase_event_id"), direction = "forward")
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"), col("asof_purchase_event_id"))
          .orderBy("event_id")
      },
      Some("""
        SELECT v.event_id, v.user_id, epoch_ms(v.ts) AS ts_ms,
               c.event_id AS asof_purchase_event_id
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') c
          ON v.user_id = c.user_id AND v.ts <= c.ts
        ORDER BY v.event_id""")),

    // ---- a08: as-of join through the PHYSICAL operator --------------------
    // a04's exact query run through the custom exec node
    // (plans/AsOfJoin.scala: AsOfJoinNode -> AsOfJoinStrategy ->
    // AsOfJoinExec) — one hash shuffle + in-partition sort per side,
    // streamed two-pointer merge, O(1) state per key. Same DuckDB ASOF
    // oracle as a04, so the operator is gated on semantics, not just
    // suite equality with the composed form.
    QueryDef(
      "a08_asof_exec",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"))
        graft.plans.AsOfJoinOp
          .asof(purchases, views, "user_id", "ts", "ts", Seq("view_event_id"))
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"), col("asof_view_event_id"))
          .orderBy("event_id")
      },
      Some("""
        SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
               v.event_id AS asof_view_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id"""),
      bench = true),

    // ---- a09: forward as-of through the physical operator -----------------
    // a07's query through AsOfJoinExec's forward mode: the merge PEEKS
    // the earliest at-or-after head instead of consuming matches — same
    // one-shuffle contract, same DuckDB ASOF (<=) oracle as a07.
    QueryDef(
      "a09_asof_exec_forward",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val views = ev.where(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("purchase_event_id"))
        graft.plans.AsOfJoinOp
          .asof(views, purchases, "user_id", "ts", "ts",
            Seq("purchase_event_id"), direction = "forward")
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"), col("asof_purchase_event_id"))
          .orderBy("event_id")
      },
      Some("""
        SELECT v.event_id, v.user_id, epoch_ms(v.ts) AS ts_ms,
               c.event_id AS asof_purchase_event_id
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') c
          ON v.user_id = c.user_id AND v.ts <= c.ts
        ORDER BY v.event_id""")),

    // ---- a10: as-of tolerance through the physical operator ---------------
    // a06's staleness-bounded query through AsOfJoinExec — the exec's
    // in-merge tolerance check (one comparison on the retained match,
    // plans/AsOfJoin.scala) under the same DuckDB CASE-age oracle, so
    // the full semantics surface (backward a08, forward a09, tolerance
    // here) is carried by the operator the registry measures at scale;
    // the composed forms (a04-a07) stay as the cross-check.
    QueryDef(
      "a10_asof_exec_tolerance",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"))
        graft.plans.AsOfJoinOp
          .asof(purchases, views, "user_id", "ts", "ts",
            Seq("view_event_id"), toleranceSec = Some(3600L))
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"), col("asof_view_event_id"))
          .orderBy("event_id")
      },
      Some("""
        SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
               CASE WHEN v.ts >= c.ts - INTERVAL 1 HOUR THEN v.event_id END
                 AS asof_view_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id""")),

    // ---- a03: grouping sets ----------------------------------------------
    QueryDef(
      "a03_grouping_sets",
      (s, d) => {
        Tables(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql("""
          SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                 COALESCE(l_linestatus, 'ALL') AS ls,
                 COUNT(*) AS n
          FROM lineitem_gs
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          ORDER BY rf, ls""")
      },
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY rf, ls"""))
  )
}
