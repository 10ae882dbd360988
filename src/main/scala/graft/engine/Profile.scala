package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, TimestampNTZType, TimestampType}

/** Table profiling — the per-column statistics pass a migration (or a
  * corpus build) runs before and after moving data: null counts,
  * distinct counts, numeric min/max. The reference validates moves by
  * record counts only (mriya.py run report); this is the column-level
  * generalization.
  *
  * One wide aggregation produces every statistic in a single pass over
  * the table (all counters are map-side combinable — no per-column
  * scans), then the one-row result is exploded to long format
  * (column, n_nulls, n_distinct, min_num, max_num). Numeric min/max are
  * emitted as doubles (timestamps as epoch micros) so the long format
  * has one stable schema; string columns carry nulls there.
  *
  * At 100 TB this is exactly one scan + a 1-row shuffle; `n_distinct`
  * is exact (two-phase distinct aggregate). Swap in approx_count_distinct
  * when a 2% error is acceptable and the column is high-cardinality.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = columns.flatMap { c =>
      val numeric: Column = df.schema(c).dataType match {
        case _: NumericType => col(c).cast("double")
        case TimestampType => unix_micros(col(c)).cast("double")
        // parquet NTZ timestamps: session tz is pinned UTC project-wide,
        // so the cast is epoch-faithful and matches DuckDB's epoch_us
        case TimestampNTZType => unix_micros(col(c).cast("timestamp")).cast("double")
        case _ => lit(null).cast("double")
      }
      Seq(
        // sum over ZERO rows is null — an empty table must profile as 0
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(numeric).as(s"__mn_$c"),
        max(numeric).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(columns.map { c =>
      struct(lit(c).as("column"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"),
        col(s"__mx_$c").as("max_num"))
    }: _*)
    one.select(explode(rows).as("p")).select(col("p.*"))
  }
}
