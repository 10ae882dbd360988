package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO (CDC upsert) as a DataFrame program — the lakehouse
  * primitive the connector's row-level upsert (ConnectorTableIO) and
  * the SCD2 history fold ([[Scd2]]) both specialize:
  *
  *   - matched on `key`   → the source row wins (update),
  *   - unmatched target   → kept as-is,
  *   - unmatched source   → inserted.
  *
  * One full-outer equi-join on the key — Catalyst broadcasts a small
  * delta, shuffles both sides on the key otherwise; at 100 TB the
  * target should be bucketed on the key so only the delta shuffles.
  * Compose with [[Sinks.writeVersioned]] for an atomic publish of the
  * merged snapshot (readers never see a half-merged table).
  *
  * Columns are matched BY NAME over the union of both schemas; a
  * column absent from one side reads as null there. `source` must not
  * carry duplicate keys (the relational MERGE precondition — enforced
  * here with a loud failure instead of nondeterministic last-wins). */
object Merge {

  def into(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val cols =
      (target.columns ++ source.columns.filterNot(target.columns.contains)).toSeq
    def dressed(df: DataFrame, marker: String) = {
      val withAll = cols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
      withAll.select((cols.map(col) :+ lit(true).as(marker)): _*)
    }
    // relational MERGE precondition: at most one source row per key
    val t = dressed(target, "__t")
      .withColumnsRenamed(cols.filterNot(_ == key).map(c => c -> s"__t_$c").toMap)
    val s = dressed(source, "__s")
      .withColumnsRenamed(cols.filterNot(_ == key).map(c => c -> s"__s_$c").toMap)
    val joined = t.join(s, Seq(key), "full_outer")
    val out = cols.map { c =>
      if (c == key) col(key)
      else when(col("__s").isNotNull, col(s"__s_$c"))
        .otherwise(col(s"__t_$c")).as(c)
    }
    joined.select(out: _*)
  }

  /** Full CDC apply (the Debezium-shaped change feed): `changes` rows
    * carry `opCol` ∈ {'U', 'D'} — upsert or tombstone delete.
    *
    *   - matched + U     → update (source wins),
    *   - unmatched + U   → insert,
    *   - matched + D     → row removed,
    *   - unmatched + D   → no-op,
    *   - untouched target→ kept.
    *
    * Precondition (as for MERGE): at most one change per key — CDC
    * batches are per-key compacted upstream (last op wins). Plan: the
    * [[into]] full-outer for the upserts plus ONE anti-join against the
    * key-only tombstone set. No broadcast hint: the typical CDC batch's
    * delete set is tiny and AQE broadcasts it at runtime, but a
    * mass-delete batch must stay free to shuffle instead of being
    * forced into a driver-sized broadcast past
    * autoBroadcastJoinThreshold. */
  def applyCdc(target: DataFrame, changes: DataFrame, key: String,
      opCol: String): DataFrame = {
    val upserts = changes.where(col(opCol) === "U").drop(opCol)
    val deletes = changes.where(col(opCol) === "D").select(col(key))
    into(target, upserts, key).join(deletes, Seq(key), "left_anti")
  }

  /** [[applyCdc]] with both preconditions actually enforced (actions):
    * throws on any op code outside {U, D} — an unrecognized op would
    * otherwise be SILENTLY dropped, "applying" the batch with changes
    * lost — and on duplicate change keys (the per-key-compacted feed
    * contract). */
  def applyCdcChecked(target: DataFrame, changes: DataFrame, key: String,
      opCol: String): DataFrame = {
    val bad = changes.where(!col(opCol).isin("U", "D")).count()
    require(bad == 0,
      s"CDC feed has $bad rows with op codes outside {U, D} — they would " +
        "be silently dropped")
    val dups = changes.groupBy(col(key)).count().where(col("count") > 1).count()
    require(dups == 0, s"CDC feed has $dups duplicated '$key' keys")
    applyCdc(target, changes, key, opCol)
  }

  /** `into` with the duplicate-source-key precondition actually
    * enforced (an action): throws if any key occurs twice in `source`.
    * Split from [[into]] so plan-building callers stay lazy. */
  def intoChecked(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val dups = source.groupBy(col(key)).count().where(col("count") > 1).count()
    require(dups == 0, s"MERGE source has $dups duplicated '$key' keys")
    into(target, source, key)
  }
}
