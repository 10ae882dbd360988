package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Batch-mode gate coverage for the event-time windowing operators the
  * streaming module uses — `window()` and `session_window()` run
  * identically in batch, so the DuckDB oracle can pin their semantics
  * (the streaming-specific behavior — watermarks, state, incremental
  * emission — is covered in StreamingSuite).
  */
object Windows {

  val defs: Seq[QueryDef] = Seq(

    // ---- w01: tumbling event-time windows --------------------------------
    QueryDef(
      "w01_tumbling_window",
      (s, d) =>
        Tables(s, d, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_millis(col("window.start")).as("window_start_ms"),
            col("event_type"), col("n"))
          .orderBy("window_start_ms", "event_type"),
      Some("""
        SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
               event_type, COUNT(*) AS n
        FROM events
        GROUP BY window_start_ms, event_type
        ORDER BY window_start_ms, event_type""")),

    // ---- w02: session windows (30-minute gap) -----------------------------
    QueryDef(
      "w02_session_window",
      (s, d) =>
        Tables(s, d, "events")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(unix_millis(col("session_window.start")).as("session_start_ms"),
            col("user_id"), col("n_events"))
          .orderBy("user_id", "session_start_ms"),
      // gaps-and-islands formulation: a new session starts when the gap to
      // the previous event is >= 30 min (session_window's half-open bound)
      Some("""
        WITH o AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events
        ), m AS (
          SELECT user_id, ts,
                 CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM o
        ), sess AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM m
        )
        SELECT epoch_ms(min(ts)) AS session_start_ms, user_id,
               count(*) AS n_events
        FROM sess
        GROUP BY user_id, sess_id
        ORDER BY user_id, session_start_ms""")),

    // ---- w03: sliding event-time windows (1 hour long, 30-minute slide) --
    // every event lands in exactly 2 windows; the oracle replays the
    // epoch-aligned window-start arithmetic Spark uses
    QueryDef(
      "w03_sliding_window",
      (s, d) =>
        Tables(s, d, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_millis(col("window.start")).as("window_start_ms"),
            col("event_type"), col("n"))
          .orderBy("window_start_ms", "event_type"),
      Some("""
        WITH cand AS (
          SELECT event_type,
                 (CAST(floor(epoch(ts) / 1800) AS BIGINT) - k.k) * 1800000
                   AS window_start_ms,
                 epoch_ms(ts) AS ts_ms
          FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
        )
        SELECT window_start_ms, event_type, COUNT(*) AS n
        FROM cand
        WHERE ts_ms >= window_start_ms
          AND ts_ms < window_start_ms + 3600000
        GROUP BY window_start_ms, event_type
        ORDER BY window_start_ms, event_type""")),

    // ---- w04: top event type per tumbling hour (windowed top-k) ----------
    // the trending-items shape: windowed counts -> rank within each
    // window -> keep the leader. Deterministic tiebreak on event_type;
    // one shuffle for the count, the rank rides the same partitioning.
    QueryDef(
      "w04_window_topk",
      (s, d) => {
        val counts = Tables(s, d, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_millis(col("window.start")).as("window_start_ms"),
            col("event_type"), col("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("window_start_ms"))
          .orderBy(col("n").desc, col("event_type"))
        counts.withColumn("rk", row_number().over(w))
          .where(col("rk") === 1)
          .select(col("window_start_ms"), col("event_type"), col("n"))
          .orderBy("window_start_ms")
      },
      Some("""
        WITH counts AS (
          SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600000 AS window_start_ms,
                 event_type, COUNT(*) AS n
          FROM events
          GROUP BY 1, 2),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start_ms
            ORDER BY n DESC, event_type) AS rk
          FROM counts)
        SELECT window_start_ms, event_type, n
        FROM ranked WHERE rk = 1
        ORDER BY window_start_ms""")),

    // ---- w05: STREAMING-engine tumbling windows, oracle-gated -------------
    // w01-w04 pin window() semantics in batch mode; w05 drives the same
    // aggregation through the actual Structured Streaming engine —
    // file stream source, watermark, stateful window aggregation,
    // AvailableNow trigger, memory sink — and hash-gates the terminal
    // state against the DuckDB oracle. A single input file = a single
    // micro-batch, whose watermark starts at epoch, so no row is late
    // and the terminal state equals the batch aggregation; `value` is
    // fixed-pointed to micro-units before the sum (exact long
    // arithmetic under any partitioning). This makes the streaming
    // ENGINE itself — not just the window functions it shares with
    // batch — part of the correctness gate.
    QueryDef(
      "w05_stream_tumbling",
      (s, d) =>
        graft.streaming.Streams
          .tumblingCountsGate(s, s"$d/events.parquet",
            windowLength = "1 hour", lateness = "1 hour")
          .orderBy("window_start_ms", "event_type"),
      Some("""
        SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
                 AS sum_v6
        FROM events
        GROUP BY window_start_ms, event_type
        ORDER BY window_start_ms, event_type""")),

    // ---- w06: STREAMING-engine session windows, oracle-gated --------------
    // session_window through the real streaming engine (merging session
    // state). Append mode can never emit the tail sessions (the last
    // session ends after max(ts), ahead of any watermark) and Spark
    // rejects update mode for streaming session windows, so the gate
    // runs COMPLETE mode: the terminal state after the single
    // micro-batch holds every merged session and equals the batch
    // session_window aggregation — w02's gaps-and-islands oracle.
    QueryDef(
      "w06_stream_session",
      (s, d) =>
        graft.streaming.Streams
          .sessionCountsGate(s, s"$d/events.parquet",
            gap = "30 minutes", lateness = "1 hour")
          .orderBy("user_id", "session_start_ms"),
      Some("""
        WITH o AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events
        ), m AS (
          SELECT user_id, ts,
                 CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM o
        ), sess AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM m
        )
        SELECT epoch_ms(min(ts)) AS session_start_ms, user_id,
               count(*) AS n_events
        FROM sess
        GROUP BY user_id, sess_id
        ORDER BY user_id, session_start_ms""")),

    // ---- w07: STREAMING custom state (flatMapGroupsWithState), gated ------
    // the funnel state machine (greedy in-event-time order: stage
    // advances when the NEXT step's type arrives no earlier than the
    // last advance) run through flatMapGroupsWithState. One micro-batch
    // -> each user whose stage advanced emits exactly one terminal
    // snapshot. The oracle replays the machine EVENT BY EVENT as a
    // recursive CTE over per-user ordered step events — the outcome is
    // tie-order invariant at millisecond granularity because duplicate
    // (ms, type) events are state no-ops. This gates the custom-state
    // streaming operator itself, not a batch equivalent.
    QueryDef(
      "w07_stream_funnel",
      (s, d) =>
        graft.streaming.Streams
          .funnelProgressGate(s, s"$d/events.parquet")
          .orderBy("user_id"),
      Some("""
        WITH RECURSIVE
        ev AS (
          SELECT user_id, event_type, epoch_ms(ts) AS tms,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_type) AS rn
          FROM events
          WHERE event_type IN ('view', 'click', 'purchase')
        ),
        n AS (SELECT user_id, MAX(rn) AS nmax FROM ev GROUP BY user_id),
        steps AS (SELECT * FROM (VALUES (0, 'view'), (1, 'click'),
                  (2, 'purchase')) s(stage, name)),
        dp AS (
          SELECT user_id, 0 AS idx, 0 AS stage,
                 CAST(-9223372036854775807 AS BIGINT) AS last_t
          FROM n
          UNION ALL
          SELECT d.user_id, d.idx + 1,
                 CASE WHEN s.name IS NOT NULL AND e.tms >= d.last_t
                      THEN d.stage + 1 ELSE d.stage END,
                 CASE WHEN s.name IS NOT NULL AND e.tms >= d.last_t
                      THEN e.tms ELSE d.last_t END
          FROM dp d
          JOIN ev e ON e.user_id = d.user_id AND e.rn = d.idx + 1
          LEFT JOIN steps s ON s.stage = d.stage AND s.name = e.event_type
        ),
        fin AS (
          SELECT d.user_id, d.stage
          FROM dp d JOIN n ON d.user_id = n.user_id AND d.idx = n.nmax)
        SELECT user_id, stage FROM fin WHERE stage > 0
        ORDER BY user_id""")),

    // ---- w08: STREAM-STATIC broadcast join through the engine -------------
    // the enrichment shape: streamed events joined against a small
    // batch-derived dimension (per-type mean value in micro-units),
    // then aggregated. Broadcast static side, exact long comparisons;
    // complete-mode terminal state equals the batch join+aggregate.
    QueryDef(
      "w08_stream_static_join",
      (s, d) =>
        graft.streaming.Streams
          .streamStaticJoinGate(s, s"$d/events.parquet")
          .orderBy("event_type"),
      Some("""
        WITH v AS (
          SELECT event_type,
                 CAST(floor(value * 1e6) AS BIGINT) AS v6
          FROM events),
        stat AS (
          SELECT event_type,
                 CAST(floor(CAST(SUM(v6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                   AS BIGINT) AS mean_v6
          FROM v GROUP BY event_type)
        SELECT v.event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN v.v6 > s.mean_v6 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_above_mean
        FROM v JOIN stat s USING (event_type)
        GROUP BY v.event_type
        ORDER BY v.event_type""")),

    // ---- w09: streaming dropDuplicates (keyed dedup state) ----------------
    // only the KEY columns are emitted — which physical row wins the
    // per-key race is partition-order dependent, the distinct key set
    // is not — so the append-mode sink equals batch DISTINCT.
    QueryDef(
      "w09_stream_dedup",
      (s, d) =>
        graft.streaming.Streams
          .streamingDedupGate(s, s"$d/events.parquet")
          .orderBy("user_id", "event_type"),
      Some("""
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type""")),

    // ---- w10: custom aggregate (TopKAgg) inside a streaming window --------
    // the same partial-aggregable top-k kernel that serves batch (q44)
    // running inside a streaming window aggregation. Its (value desc,
    // id asc) total order makes the k winners per window unique and
    // merge-order independent; the complete-mode terminal state equals
    // the batch window formulation, which the oracle replays.
    QueryDef(
      "w10_stream_window_topk",
      (s, d) =>
        graft.streaming.Streams
          .windowTopKGate(s, s"$d/events.parquet",
            windowLength = "1 hour", k = 3)
          .orderBy("window_start_ms", "rank"),
      Some("""
        WITH ranked AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
                 event_id,
                 ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                   ORDER BY value DESC, event_id ASC) AS rank
          FROM events)
        SELECT window_start_ms, CAST(rank AS BIGINT) AS rank, event_id
        FROM ranked WHERE rank <= 3
        ORDER BY window_start_ms, rank""")),

    // ---- w11: stream-STREAM interval join through the engine --------------
    // view→click attribution: each click pairs with the same user's
    // views from the preceding 2 hours. Inner stream-stream joins emit
    // matches in the micro-batch that finds them; the gate's lateness
    // exceeds the corpus' span so no join state is evicted and the
    // append-mode sink equals the batch interval join (the oracle).
    QueryDef(
      "w11_stream_interval_join",
      (s, d) =>
        graft.streaming.Streams
          .intervalJoinGate(s, s"$d/events.parquet")
          .orderBy("user_id", "view_id", "click_id"),
      Some("""
        WITH v AS (
          SELECT user_id, event_id AS view_id, ts AS vts
          FROM events WHERE event_type = 'view'),
        c AS (
          SELECT user_id, event_id AS click_id, ts AS cts
          FROM events WHERE event_type = 'click')
        SELECT c.user_id, v.view_id, c.click_id
        FROM c JOIN v ON c.user_id = v.user_id
          AND c.cts >= v.vts AND c.cts <= v.vts + INTERVAL 2 HOUR
        ORDER BY c.user_id, v.view_id, c.click_id""")),

    // ---- w12: dropDuplicatesWithinWatermark (reclaimable dedup state) -----
    // the unbounded-corpus streaming dedup: state for a key is RECLAIMED
    // once the watermark passes its first occurrence + lateness (w09's
    // dropDuplicates keeps its seen-set forever). The gate's lateness
    // exceeds the corpus' span, so nothing expires before termination
    // and the emitted key set equals batch DISTINCT — oracle-replayable
    // while still exercising the watermarked state machinery.
    QueryDef(
      "w12_stream_dedup_watermark",
      (s, d) =>
        graft.streaming.Streams
          .dedupWatermarkGate(s, s"$d/events.parquet")
          .orderBy("user_id", "event_type", "minute_ms"),
      Some("""
        SELECT DISTINCT user_id, event_type,
               epoch_ms(date_trunc('minute', ts)) AS minute_ms
        FROM events
        ORDER BY user_id, event_type, minute_ms""")),

    // ---- w13: transformWithState (Spark 4 arbitrary-state API) ------------
    // the flatMapGroupsWithState successor, with typed per-key state
    // variables and the RocksDB state store: per-user MapState tallies
    // (count, exact micro-unit sum) per event type. One micro-batch →
    // one terminal snapshot per (user, type), equal to the batch GROUP
    // BY the oracle replays. Gates the NEW stateful engine path, not
    // just the legacy one w07 covers.
    QueryDef(
      "w13_transform_with_state",
      (s, d) =>
        graft.streaming.Streams
          .typeTallyGate(s, s"$d/events.parquet")
          .orderBy("user_id", "event_type"),
      Some("""
        SELECT user_id, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
                 AS sum_v6
        FROM events
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type""")),

    // ---- w15: chained stateful operators + append-mode finalization -------
    // dropDuplicates -> tumbling window count in ONE streaming query
    // (multi-stateful-operator chaining), APPEND mode: a window emits
    // exactly when the terminal watermark (max ts - lateness) passes
    // its end — the finalization semantics the complete-mode gates
    // never exercise. Counts are deterministic because every duplicate
    // of a dedup key shares its minute (hence its hour window). The
    // boundary (window_end <= watermark emits) is pinned in
    // StreamingSuite with an exact fixture.
    QueryDef(
      "w15_stream_dedup_window",
      (s, d) =>
        graft.streaming.Streams
          .dedupWindowGate(s, s"$d/events.parquet")
          .orderBy("window_start_ms", "event_type"),
      Some("""
        WITH k AS (
          SELECT DISTINCT user_id, event_type,
                 date_trunc('minute', ts) AS m
          FROM events),
        wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
        c AS (
          SELECT epoch_ms(date_trunc('hour', m)) AS window_start_ms,
                 event_type, COUNT(*) AS n
          FROM k GROUP BY 1, 2)
        SELECT c.window_start_ms, c.event_type, c.n
        FROM c CROSS JOIN wm
        WHERE c.window_start_ms + 3600000 <= epoch_ms(wm.w)
        ORDER BY window_start_ms, event_type""")),

    // ---- w14: LEFT OUTER stream-stream interval join ----------------------
    // the watermark-governed outer semantics: matches emit as found;
    // an unmatched click emits (user, NULL, click) only once the
    // watermark proves no matching view can still arrive; clicks inside
    // the terminal lateness window are deterministically withheld.
    // Oracle replays all three classes: the inner join, the null rows
    // for unmatched clicks older than the terminal watermark
    // (min(side max ts) - lateness), and the withheld tail.
    QueryDef(
      "w14_stream_interval_left_outer",
      (s, d) =>
        graft.streaming.Streams
          .intervalJoinLeftOuterGate(s, s"$d/events.parquet")
          .orderBy("user_id", "click_id", "view_id"),
      Some("""
        WITH v AS (
          SELECT user_id, event_id AS view_id, ts AS vts
          FROM events WHERE event_type = 'view'),
        c AS (
          SELECT user_id, event_id AS click_id, ts AS cts
          FROM events WHERE event_type = 'click'),
        wm AS (
          SELECT least((SELECT max(cts) FROM c), (SELECT max(vts) FROM v))
                   - INTERVAL 1 HOUR AS w),
        matched AS (
          SELECT c.user_id, v.view_id, c.click_id
          FROM c JOIN v ON c.user_id = v.user_id
            AND c.cts >= v.vts AND c.cts <= v.vts + INTERVAL 2 HOUR),
        unmatched AS (
          SELECT c.user_id, CAST(NULL AS BIGINT) AS view_id, c.click_id
          FROM c CROSS JOIN wm
          WHERE c.cts < wm.w
            AND NOT EXISTS (
              SELECT 1 FROM v
              WHERE v.user_id = c.user_id
                AND c.cts >= v.vts AND c.cts <= v.vts + INTERVAL 2 HOUR))
        SELECT user_id, view_id, click_id FROM matched
        UNION ALL
        SELECT user_id, view_id, click_id FROM unmatched
        ORDER BY user_id, click_id, view_id""")),

    // ---- w17: streaming CDC materialization (transformWithState) ----------
    // the events table as a change feed (purchase = tombstone delete,
    // anything else = value upsert) folded into the CURRENT row per user
    // through per-key ValueState — the incrementally-maintained upsert
    // view (m13's semantics run incrementally). The fold keeps only
    // maxima, so state is order-insensitive and batching-invariant;
    // liveness = latest upsert beats latest delete lexicographically.
    QueryDef(
      "w17_stream_cdc",
      (s, d) =>
        graft.streaming.Streams
          .cdcMaterializeGate(s, s"$d/events.parquet")
          .orderBy("user_id"),
      Some("""
        WITH ch AS (
          SELECT user_id, ts, event_id,
                 CAST(floor(value * 1e6) AS BIGINT) AS v6,
                 (event_type = 'purchase') AS is_del
          FROM events),
        u AS (
          SELECT user_id, ts, event_id, v6,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM ch WHERE NOT is_del),
        dd AS (
          SELECT user_id, ts, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM ch WHERE is_del),
        agg AS (
          SELECT user_id, count(*) AS n_changes,
                 epoch_ms(max(ts)) AS last_ms
          FROM ch GROUP BY user_id),
        u1 AS (SELECT * FROM u WHERE rn = 1),
        d1 AS (SELECT * FROM dd WHERE rn = 1)
        SELECT a.user_id, a.n_changes,
               CAST(CASE WHEN u1.user_id IS NOT NULL AND (d1.user_id IS NULL
                      OR (u1.ts, u1.event_id) > (d1.ts, d1.event_id))
                    THEN 1 ELSE 0 END AS BIGINT) AS live,
               CASE WHEN u1.user_id IS NOT NULL AND (d1.user_id IS NULL
                      OR (u1.ts, u1.event_id) > (d1.ts, d1.event_id))
                    THEN u1.v6 END AS last_v6,
               a.last_ms
        FROM agg a
        LEFT JOIN u1 USING (user_id)
        LEFT JOIN d1 USING (user_id)
        ORDER BY a.user_id""")),

    // ---- w18: stateful checkpoint recovery across a restart ---------------
    // the exactly-once restart contract: two separate queries over ONE
    // checkpoint — run 1 folds the even-event_id half of the CDC feed
    // through transformWithState (RocksDB) and stops; run 2 restarts
    // from the checkpoint with the odd half added. The terminal per-user
    // row equals the batch oracle over ALL events only if run 2 restored
    // run 1's per-key state and the file-source log skipped the
    // already-processed half. Oracle = w17's terminal CDC view.
    QueryDef(
      "w18_checkpoint_recovery",
      (s, d) =>
        graft.streaming.Streams
          .checkpointRecoveryGate(s, s"$d/events.parquet")
          .orderBy("user_id"),
      Some("""
        WITH ch AS (
          SELECT user_id, ts, event_id,
                 CAST(floor(value * 1e6) AS BIGINT) AS v6,
                 (event_type = 'purchase') AS is_del
          FROM events),
        u AS (
          SELECT user_id, ts, event_id, v6,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM ch WHERE NOT is_del),
        dd AS (
          SELECT user_id, ts, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM ch WHERE is_del),
        agg AS (
          SELECT user_id, count(*) AS n_changes,
                 epoch_ms(max(ts)) AS last_ms
          FROM ch GROUP BY user_id),
        u1 AS (SELECT * FROM u WHERE rn = 1),
        d1 AS (SELECT * FROM dd WHERE rn = 1)
        SELECT a.user_id, a.n_changes,
               CAST(CASE WHEN u1.user_id IS NOT NULL AND (d1.user_id IS NULL
                      OR (u1.ts, u1.event_id) > (d1.ts, d1.event_id))
                    THEN 1 ELSE 0 END AS BIGINT) AS live,
               CASE WHEN u1.user_id IS NOT NULL AND (d1.user_id IS NULL
                      OR (u1.ts, u1.event_id) > (d1.ts, d1.event_id))
                    THEN u1.v6 END AS last_v6,
               a.last_ms
        FROM agg a
        LEFT JOIN u1 USING (user_id)
        LEFT JOIN d1 USING (user_id)
        ORDER BY a.user_id""")),

    // ---- w19: watermarked window-aggregation recovery across restart ------
    // the second stateful class under the restart contract (w18 covers
    // transformWithState): run 1 processes events up to the midpoint
    // timestamp — its watermark finalizes the early windows into the
    // append sink — then run 2 restarts from the checkpoint with the
    // rest. A reset watermark would re-emit finalized windows
    // (duplicate rows), lost window state would under-count straddling
    // windows; the oracle is the batch replay with the final-watermark
    // emission cutoff (w15's cutoff shape, no dedup stage).
    QueryDef(
      "w19_window_recovery",
      (s, d) =>
        graft.streaming.Streams
          .windowRecoveryGate(s, s"$d/events.parquet")
          .orderBy("window_start_ms", "event_type"),
      Some("""
        WITH ev AS (
          SELECT date_trunc('hour', ts) AS w, event_type,
                 CAST(floor(value * 1e6) AS BIGINT) AS v6, ts
          FROM events),
        wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
        c AS (
          SELECT epoch_ms(w) AS window_start_ms, event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v6) AS BIGINT) AS sum_v6
          FROM ev GROUP BY 1, 2)
        SELECT c.window_start_ms, c.event_type, c.n, c.sum_v6
        FROM c CROSS JOIN wm
        WHERE c.window_start_ms + 3600000 <= epoch_ms(wm.w)
        ORDER BY window_start_ms, event_type""")),

    // ---- w22: CONNECTOR-stream checkpoint recovery -------------------------
    // the third stateful restart class: the org MicroBatchStream's
    // PK-cursor offset (w18/w19 cover file sources). Run 1 backfills
    // under a small admission cap and is KILLED mid-backfill after a
    // few committed batches; more rows land; run 2 resumes the
    // checkpointed Id cursor and drains. The sink (read through its
    // commit log) equals the batch SELECT over the whole table only
    // under exactly-once cursor restore — a reset cursor duplicates
    // run-1 pages, a skipped cursor loses the unread gap.
    QueryDef(
      "w22_connector_recovery",
      (s, d) =>
        graft.streaming.Streams
          .connectorRecoveryGate(s, s"$d/customer.parquet")
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey
        FROM customer
        ORDER BY c_custkey""")),

    // ---- w23: STREAMING index maintenance (appends + CDC deletes) ----------
    // the s21 lifecycle driven by Structured Streaming: every arriving
    // micro-batch appends its rows AND tombstones its doomed slice; a
    // post-stream compaction applies the deletes physically; the final
    // query must equal compute-in-place over the surviving corpus
    // (s21's oracle verbatim — same doomed slice).
    QueryDef(
      "w23_stream_index_maintain",
      (s, d) =>
        graft.streaming.Streams
          .streamingIndexMaintainGate(s, s"$d/embeddings.parquet")
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank"),
      Some(Similarity.ivfPinnedOracleOver(
        "NOT (d.vec_id >= 100 AND d.vec_id % 5 = 2)"))),

    // ---- w20: STREAMING ANN index ingest -----------------------------------
    // the s18/s19 serving lifecycle through Structured Streaming: the
    // index bootstraps from the 16 codebook vectors, the corpus tail
    // arrives one file per micro-batch and each batch appends its
    // assignments under the frozen codebook (foreachBatch → per-row
    // work, so any batching reaches the same index), and the final
    // query must equal s11's full-corpus compute-in-place answer.
    QueryDef(
      "w20_stream_index_ingest",
      (s, d) =>
        graft.streaming.Streams
          .streamingIndexIngestGate(s, s"$d/embeddings.parquet")
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank"),
      Some(Similarity.ivfPinnedOracle)),

    // ---- w21: streaming chunk-level dedup ----------------------------------
    // the p28/d19 curation stage run incrementally: streamed documents
    // explode into overlapping chunks (stateless transform) and
    // dropDuplicates on the content digest keeps first occurrences; the
    // distinct digest SET is batching-order-free, so the oracle is the
    // batch distinct over the same integer chunk arithmetic.
    QueryDef(
      "w21_stream_chunk_dedup",
      (s, d) =>
        graft.streaming.Streams
          .chunkDedupStreamGate(s, s"$d/documents.parquet")
          .orderBy("chunk_md5"),
      Some(s"""
        ${Pipeline.chunkExplodeCtes}
        SELECT DISTINCT
               md5(array_to_string(t[ci*48 + 1 : ci*48 + 64], ' '))
                 AS chunk_md5
        FROM ex
        ORDER BY chunk_md5""")),

    // ---- w24: streaming bloom decontamination ------------------------------
    // d22 run incrementally: the benchmark bitmap is computed once from
    // the static eval suite and every streamed document is scored in its
    // micro-batch — a stateless projection (the gate asserts zero state
    // operators), so the scorecard is batching-invariant and d22's
    // bit-exact bitmap-replay oracle transfers verbatim.
    QueryDef(
      "w24_stream_decontaminate",
      (s, d) =>
        graft.streaming.Streams
          .bloomDecontaminateStreamGate(s, s"$d/documents.parquet")
          .orderBy("doc_id"),
      Some(Dedup.bloomDecontaminateOracle)),

    // ---- w25: streaming incremental dedup against the signature store -----
    // d23's daily probe as a stream: per-file micro-batches, each
    // probing the persisted standing-corpus store via foreachBatch;
    // every delta doc pairs only against the static store, so the
    // per-batch union is batching-invariant and the shared
    // delta-x-corpus oracle applies verbatim.
    QueryDef(
      "w25_stream_dedup_store",
      (s, d) =>
        graft.streaming.Streams
          .dedupStoreProbeStreamGate(s, s"$d/documents.parquet")
          .orderBy("id_a", "id_b"),
      Some(Dedup.incrementalDedupOracle)),

    // ---- w26: store probe-AND-append accretion, ordered-ingest oracle -----
    // the full daily lifecycle as a stream with DETERMINISTIC batch
    // membership (three waves keyed by (doc_id div 20) % 3): each wave
    // dedups against the standing corpus plus every earlier wave, then
    // appends itself. The oracle replays the ordered-ingest semantics
    // exactly: a pair exists iff id_b is standing OR id_b's wave
    // strictly precedes id_a's.
    QueryDef(
      "w26_stream_dedup_accrete",
      (s, d) =>
        graft.streaming.Streams
          .dedupAccreteStreamGate(s, s"$d/documents.parquet")
          .orderBy("id_a", "id_b"),
      Some(s"""
        ${Dedup.oracleShingles}, ex AS (
          SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh
        ), pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared,
                 any_value(a.n) AS na, any_value(b.n) AS nb
          FROM ex a JOIN ex b
            ON a.s = b.s AND a.doc_id % 20 = 0
           AND (b.doc_id % 20 <> 0
                OR ((b.doc_id // 20) % 3) < ((a.doc_id // 20) % 3))
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, CAST(shared AS DOUBLE)/(na+nb-shared) AS jac
        FROM pairs WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.5
        ORDER BY id_a, id_b""")),

    // ---- w27: streamed accretion over a RETRACTED store --------------------
    // d24's retraction running under the w26 lifecycle: a standing
    // slice (doc_id % 7 == 3) is tombstoned before ingest begins, and
    // every wave's probe must mask it — across micro-batches, accreted
    // appends, and the probe's maintenance retry — while cross-wave
    // pairing is untouched (delta ids are % 20 == 0, disjoint from the
    // standing tombstone set). Oracle = w26's ordered-ingest replay
    // minus pairs into the retracted slice. The MID-stream
    // retract-between-waves interleaving is pinned deterministically in
    // StreamingSuite (its pair set depends on retract timing, which an
    // oracle over static tables cannot see).
    QueryDef(
      "w27_stream_dedup_retract",
      (s, d) =>
        graft.streaming.Streams
          .dedupAccreteStreamGate(s, s"$d/documents.parquet",
            retractMod7 = Some(3))
          .orderBy("id_a", "id_b"),
      Some(s"""
        ${Dedup.oracleShingles}, ex AS (
          SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh
        ), pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared,
                 any_value(a.n) AS na, any_value(b.n) AS nb
          FROM ex a JOIN ex b
            ON a.s = b.s AND a.doc_id % 20 = 0
           AND (b.doc_id % 20 <> 0
                OR ((b.doc_id // 20) % 3) < ((a.doc_id // 20) % 3))
           AND NOT (b.doc_id % 20 <> 0 AND b.doc_id % 7 = 3)
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, CAST(shared AS DOUBLE)/(na+nb-shared) AS jac
        FROM pairs WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.5
        ORDER BY id_a, id_b""")),

    // ---- w28: streamed multimodal ingest → decode → pHash → near-dup ------
    // the second real multimodal end-to-end (r15 verdict item 8): media
    // PAYLOADS stream in file-source micro-batches, each batch runs the
    // REAL ImageIO pixel decode (the mm07 kernel) and the pinned
    // integer-DCT pHash (the mm08 math) executor-side, the hash spool
    // accretes per epoch, and the banded pigeonhole Hamming join (the
    // text/image dedup machinery) pairs the planted duplicates with
    // their originals. Oracle = mm14's replay verbatim (fixture planes →
    // hash chain → exact all-pairs Hamming), so the gate chains the
    // decode boundary, the feature math, the streaming plumbing, and
    // the dedup join under ONE bit-exact check.
    QueryDef(
      "w28_stream_media_neardup",
      (s, d) =>
        graft.streaming.Streams.mediaNearDupStreamGate(s, maxHamming = 4)
          .orderBy("id_a", "id_b"),
      Some(graft.multimodal.PinnedMediaMath.imageNearDupOracle(
        maxHamming = 4))),

    // ---- w29: streamed AUDIO ingest → PCM decode → band hash → near-dup ---
    // w28's audio sibling (r16 verdict item 8): clip payloads stream in
    // file-source micro-batches, each batch runs the REAL javax.sound
    // PCM decode and the pinned 32-band quadrature sign hash FUSED in
    // one codegen'd expression (bytes in, 64-bit hash out — the same
    // no-per-sample-rows shape the fused image kernel set), and the
    // accreted spool rides the banded pigeonhole Hamming join. Oracle =
    // mm15's replay verbatim, so the decode boundary, the fused band
    // math, the streaming plumbing, and the dedup join sit under ONE
    // bit-exact check.
    QueryDef(
      "w29_stream_audio_neardup",
      (s, d) =>
        graft.streaming.Streams.audioNearDupStreamGate(s, maxHamming = 4)
          .orderBy("id_a", "id_b"),
      Some(graft.multimodal.PinnedMediaMath.audioNearDupOracle(
        maxHamming = 4))),

    // ---- w30: media through the CONNECTOR source, recovery-graded ---------
    // w22's checkpoint-recovery semantics married to the fused
    // multimodal pipeline (r16 verdict item 8): base64 media payloads
    // stream off the PK-cursor connector source under a small admission
    // cap, each micro-batch decodes + hashes through the fused kernel
    // into the epoch-idempotent spool, run 1 is stopped mid-backfill,
    // the re-keyed duplicates land while the stream is down, and run 2
    // resumes the Id cursor. Every near-dup pair straddles the restart,
    // so a reset or skipped cursor breaks the answer. Oracle = mm14's
    // replay verbatim.
    QueryDef(
      "w30_connector_media_neardup",
      (s, d) =>
        graft.streaming.Streams.mediaConnectorStreamGate(s, maxHamming = 4)
          .orderBy("id_a", "id_b"),
      Some(graft.multimodal.PinnedMediaMath.imageNearDupOracle(
        maxHamming = 4))),

    // ---- w31: streamed VIDEO ingest → demux → per-frame hash → near-dup --
    // the streamed triad's video member (w28 image, w29 audio): GVC1
    // payloads stream in file-source micro-batches, each batch runs
    // demux + per-frame ImageIO decode + the pinned per-frame pHash
    // FUSED in one codegen'd expression (container bytes in, one hash
    // per frame out — per-clip state only), and the accreted per-frame
    // spool rides mm16's every-aligned-frame banded pairing. Oracle =
    // mm16's replay verbatim.
    QueryDef(
      "w31_stream_video_neardup",
      // no extra orderBy: videoPairsFromFrameHashes already returns
      // (id_a, id_b)-ordered, same as mm16 relies on
      (s, d) =>
        graft.streaming.Streams.videoNearDupStreamGate(s, maxHamming = 4),
      Some(graft.multimodal.PinnedMediaMath.videoNearDupOracle(
        maxHamming = 4))),

    // ---- w32: the cross-modal duplicate CLOSURE as a stream ---------------
    // mm17's edge union + connected components fed by TWO accreting
    // spools: PNG payloads through the fused decode+hash kernel (w28's
    // ingest shape) and caption rows through an epoch-keyed text spool.
    // The planted derivatives share no modality yet must co-cluster
    // through their base item — the closure property — now proven to
    // survive micro-batched arrival. Oracle = mm17's replay verbatim
    // (incl. plane generation and the recursive closure).
    QueryDef(
      "w32_stream_crossmodal_dedup",
      // no extra orderBy: the gate returns (item_id)-ordered, as mm17
      (s, d) =>
        graft.streaming.Streams.crossModalStreamGate(s, maxHamming = 4),
      Some(graft.multimodal.PinnedMediaMath.crossModalDedupOracle(
        maxHamming = 4))),

    // ---- w33: streaming importance scoring against frozen weights ---------
    // p33's DSIR-shaped weighting run incrementally (the w24 stance):
    // the weight table freezes once from the static reference corpus
    // and every arriving document scores in its micro-batch via a pure
    // per-row projection — stateless (the gate asserts zero state
    // operators), so the scores are batching-invariant and p33's score
    // oracle transfers minus the quota. Selection stays a batch
    // decision over accumulated scores: a global top-fraction is not
    // an incremental property.
    QueryDef(
      "w33_stream_importance_score",
      (s, d) =>
        graft.streaming.Streams
          .importanceScoreStreamGate(s, s"$d/documents.parquet")
          .orderBy("doc_id"),
      Some("""
        WITH docs AS (
          SELECT doc_id, text, lang FROM documents WHERE text IS NOT NULL
        ),
        toks AS (
          SELECT doc_id, (lang = 'en') AS tgt,
                 unnest(string_split_regex(trim(text), '\s+')) AS t
          FROM docs
        ),
        tb AS (
          SELECT doc_id, tgt,
                 CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT % 4096
                   AS BIGINT) AS b
          FROM toks
        ),
        tot AS (
          SELECT (1000000 * (SUM(CASE WHEN tgt THEN 1 ELSE 0 END) + 1))
                   // (COUNT(*) + 1) AS neutral
          FROM tb
        ),
        ratio AS (
          SELECT b,
                 (1000000 * (SUM(CASE WHEN tgt THEN 1 ELSE 0 END) + 1))
                   // (COUNT(*) + 1) - (SELECT neutral FROM tot) AS r
          FROM tb GROUP BY 1
        )
        SELECT tb.doc_id, CAST(SUM(ratio.r) AS BIGINT) AS score
        FROM tb JOIN ratio USING (b)
        GROUP BY 1 ORDER BY doc_id""")),

    // ---- w34: streaming domain-mix serving against frozen weights ---------
    // p34's DoReMi-shaped mixture run incrementally: the MW-updated
    // domain weight table freezes once from the static reference
    // corpus and every arriving document resolves (weight, picked) in
    // its micro-batch via two map literals + the shared p34 coin —
    // pure projection, zero state (gate-asserted), so the decisions
    // are batching-invariant and p34's oracle transfers minus the
    // per-doc loss column (the served decision is the PICK; scoring
    // against a frozen corpus LM would ship a vocab-sized artifact).
    QueryDef(
      "w34_stream_domain_mix",
      (s, d) =>
        graft.streaming.Streams
          .domainMixStreamGate(s, s"$d/documents.parquet")
          .orderBy("doc_id"),
      Some("""
        WITH docs AS (
          SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL),
        toks AS (
          SELECT doc_id, source,
                 unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM docs),
        uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        total AS (SELECT SUM(c) AS n FROM uni),
        scored AS (
          SELECT doc_id, source,
                 CAST(floor(-ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   * 10000.0 + 0.5) AS BIGINT) AS nats4
          FROM toks JOIN uni USING (tok), total),
        perdoc AS (
          SELECT doc_id, source,
                 CAST(floor(CAST(SUM(nats4) AS DOUBLE) / COUNT(*) + 0.5)
                   AS BIGINT) AS mean_nats4
          FROM scored GROUP BY 1, 2),
        dom AS (
          SELECT source, COUNT(*) AS nd, SUM(mean_nats4) AS s,
                 CAST(floor(CAST(SUM(mean_nats4) AS DOUBLE) / COUNT(*) + 0.5)
                   AS BIGINT) AS dnats4
          FROM perdoc GROUP BY 1),
        ref AS (
          SELECT CAST(floor(CAST(SUM(s) AS DOUBLE) / SUM(nd) + 0.5)
                   AS BIGINT) AS rnats4,
                 CAST(SUM(nd) AS BIGINT) AS ntot
          FROM dom),
        w AS (
          SELECT source, nd, ntot,
                 CAST(floor(exp(CAST(dnats4 - rnats4 AS DOUBLE) / 100.0)
                   * 1000000.0 + 0.5) AS BIGINT) AS w6
          FROM dom, ref),
        wsum AS (SELECT SUM(w6) AS denom FROM w),
        wt AS (
          SELECT source,
                 CAST((w6 * 1000000) // denom AS BIGINT) AS weight_micro,
                 CAST(LEAST(1000000,
                   ((ntot // 2) * ((w6 * 1000000) // denom)) // nd)
                   AS BIGINT) AS frac6
          FROM w, wsum)
        SELECT p.doc_id, p.source, wt.weight_micro,
               CAST(CASE WHEN ((('0x' || substr(
                   md5('p34|' || CAST(p.doc_id AS VARCHAR)), 1, 16))::UBIGINT
                   >> 8) & 2147483647) % 1000000 < wt.frac6
                 THEN 1 ELSE 0 END AS BIGINT) AS picked
        FROM perdoc p JOIN wt USING (source)
        ORDER BY p.doc_id""")),

    // ---- w16: stream-static AS-OF enrichment through the engine -----------
    // a04's semantics run incrementally: each streamed purchase joins
    // the latest static view at-or-before its event time (broadcast
    // static side, stateless per batch; per-event struct-max argmax
    // reproduces the as-of tie-break). Same DuckDB ASOF oracle as a04.
    QueryDef(
      "w16_stream_asof",
      (s, d) => {
        val views = Tables(s, d, "events")
          .where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"))
        graft.streaming.Streams
          .streamAsofGate(s, s"$d/events.parquet", views)
          .orderBy("event_id")
      },
      Some("""
        SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
               v.event_id AS asof_view_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id"""))
  )
}
