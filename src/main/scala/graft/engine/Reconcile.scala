package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-migration reconciliation: a keyed diff of two table snapshots.
  *
  * The reference migrates records and counts successes
  * (migration_engine.py:77-90, project_utils.py:38-46) but never
  * audits that source and destination actually agree afterwards; this
  * is that audit as one distributed operator. For every key present on
  * either side it classifies the row as `added` (right only),
  * `removed` (left only) or `changed` (both, any compared column
  * differs null-safely), listing the differing columns — `same` rows
  * are dropped, so the output is the exact discrepancy set.
  *
  * Plan shape: ONE full-outer shuffle join on the key; the per-column
  * compares are codegen'd projections on top. At 100 TB both sides
  * shuffle once on uniformly distributed keys — there is no cheaper
  * exact diff.
  */
object Reconcile {

  /** Diff `left` vs `right` on `keyCol`, comparing `cols` (default:
    * every shared non-key column, in left's column order). Output:
    * (key, status, changed_cols) where changed_cols is a
    * comma-joined column-name list, empty for added/removed. */
  def diff(left: DataFrame, right: DataFrame, keyCol: String,
      compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else left.columns.filter(c => c != keyCol && right.columns.contains(c)).toSeq
    require(cols.nonEmpty, "no columns to compare")
    val l = left.select((col(keyCol).as("__k") +:
      cols.map(c => col(c).as(s"__l_$c"))): _*)
    val r = right.select((col(keyCol).as("__k") +:
      cols.map(c => col(c).as(s"__r_$c"))): _*)
    // presence flags survive the outer join where raw columns go null
    val joined = l.withColumn("__inl", lit(true))
      .join(r.withColumn("__inr", lit(true)), Seq("__k"), "full_outer")
    def colDiffers(c: String): Column =
      not(col(s"__l_$c") <=> col(s"__r_$c"))
    val anyDiff = cols.map(colDiffers).reduce(_ || _)
    val changedList = concat_ws(",",
      cols.map(c => when(colDiffers(c), lit(c))): _*)
    joined.select(
      col("__k").as(keyCol),
      when(col("__inl").isNull, "added")
        .when(col("__inr").isNull, "removed")
        .when(anyDiff, "changed")
        .otherwise("same").as("status"),
      when(col("__inl").isNotNull && col("__inr").isNotNull, changedList)
        .otherwise(lit("")).as("changed_cols"))
      .where(col("status") =!= "same")
  }

  /** Order-independent table checksum: sum of per-row xxhash64 over the
    * given columns. The column list is CANONICALIZED BY NAME — both the
    * default (all columns) and an explicitly passed `cols` are sorted, so
    * two calls naming the same columns in different orders always agree;
    * callers needing column-ORDER-sensitive hashing (e.g. xxhash64 parity
    * with an external system's fixed column order) should compute
    * `xxhash64(cols...)` directly. Commutative + associative, so it computes in
    * one map-side-combinable pass under ANY partitioning — the cheap
    * equality pre-check a migration runs on both sides BEFORE paying for
    * the full [[diff]]. Equal checksums don't prove equality (64-bit
    * collisions), unequal checksums prove difference — use it to skip
    * diffs, never to skip investigating a mismatch. */
  def checksum(df: DataFrame, cols: Seq[String] = Nil): Long = {
    val use = (if (cols.nonEmpty) cols else df.columns.toSeq).sorted
    // exact decimal sum (a long sum overflows under ANSI on ~2^? rows of
    // full-range hashes), folded to a stable long mod a 63-bit prime
    val h = df.select(xxhash64(use.map(col): _*).cast("decimal(38,0)").as("__h"))
      .agg(pmod(sum(col("__h")), lit(9223372036854775783L).cast("decimal(38,0)"))
        .cast("long").as("s"))
      .head()
    if (h.isNullAt(0)) 0L else h.getLong(0)
  }
}
