package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge: fold an incoming snapshot
  * into a keyed history table, closing out changed rows and appending
  * the new versions — the standard warehouse shape for migrated
  * dimensions that keep their audit trail (the reference's write-back
  * sinks overwrite in place; SCD2 is what a replicated warehouse does
  * instead).
  *
  * Scale shape: ONE full-outer shuffle join on the key, then a narrow
  * per-row explode of at most two output rows — no window, no second
  * pass. At 100 TB the join keys on the dimension key and AQE handles
  * the (typically tiny) incoming side via broadcast.
  */
object Scd2 {

  final val OpenVersion = 999999L

  /** Merge `incoming` (a full keyed snapshot at `newVersion`) into
    * `current` — the open rows of the history (all `version_to ==
    * OpenVersion`). Emits the NEW history slice for these keys:
    *
    *   - key in both, attrs equal   → the current row rides unchanged
    *   - key in both, attrs differ  → current row CLOSED
    *     (`version_to = newVersion`) + a fresh open row at `newVersion`
    *   - key only in incoming       → fresh open row at `newVersion`
    *   - key only in current        → rides unchanged (SCD2 keeps
    *     departed keys' history open unless a delete feed closes them)
    *
    * `current` must carry `version_from`; attr comparison is
    * null-safe (`<=>`). */
  def merge(current: DataFrame, incoming: DataFrame, keyCol: String,
      attrCols: Seq[String], newVersion: Long): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 merge needs at least one tracked attribute")
    require(newVersion != OpenVersion, s"newVersion collides with OpenVersion")
    val cur = current.select(
      (col(keyCol) +: col("version_from") +: attrCols.map(col)): _*)
    val inc = incoming.select(
      (col(keyCol) +: lit(1).as("__inc") +:
        attrCols.map(c => col(c).as(s"__n_$c"))): _*)
    val changed = attrCols
      .map(c => !(col(c) <=> col(s"__n_$c")))
      .reduce(_ || _)
    // presence markers, not attr nullness: an all-null incoming row is
    // still an incoming row, and `current` always carries version_from
    val hasCur = col("version_from").isNotNull
    val hasInc = col("__inc").isNotNull
    def rowStruct(vFrom: org.apache.spark.sql.Column,
        vTo: org.apache.spark.sql.Column, fromInc: Boolean) =
      struct((vFrom.as("version_from") +: vTo.as("version_to") +:
        attrCols.map(c => (if (fromInc) col(s"__n_$c") else col(c)).as(c))): _*)
    val outRows = when(hasCur && hasInc && changed,
        array(rowStruct(col("version_from"), lit(newVersion), fromInc = false),
          rowStruct(lit(newVersion), lit(OpenVersion), fromInc = true)))
      .when(hasCur, // unchanged or departed: ride as-is, still open
        array(rowStruct(col("version_from"), lit(OpenVersion), fromInc = false)))
      .otherwise( // brand-new key
        array(rowStruct(lit(newVersion), lit(OpenVersion), fromInc = true)))
    cur.join(inc, Seq(keyCol), "full_outer")
      .select(col(keyCol), explode(outRows).as("__r"))
      .select((col(keyCol) +: col("__r.version_from") +:
        col("__r.version_to") +: attrCols.map(c => col(s"__r.$c"))): _*)
      .withColumn("is_current", col("version_to") === OpenVersion)
  }
}
