package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the dbt-test / Deequ shape): a
  * check list compiles to the MINIMUM number of passes over the table —
  * every row-conditional check (not-null, range, accepted-values) folds
  * into ONE shared aggregation scan; each uniqueness check is one
  * keyed aggregation; each referential check is one anti-join (the ref
  * side reduced to distinct keys, broadcast when small). Output is one
  * (check_name, violations) row per check — the artifact a pipeline
  * gate consumes before publishing a table.
  *
  * Scale shape: k conditional checks cost one scan TOTAL (conditional
  * sums partial-aggregate map-side), not k scans; nothing ever
  * collects to the driver.
  */
object DataChecks {

  sealed trait Check { def name: String }

  /** Rows where ANY of `cols` is null. */
  final case class NotNull(name: String, cols: Seq[String]) extends Check

  /** Key groups of `cols` holding more than one row. */
  final case class Unique(name: String, cols: Seq[String]) extends Check

  /** Non-null values of `column` outside [lo, hi]. */
  final case class InRange(name: String, column: String,
      lo: Double, hi: Double) extends Check

  /** Non-null values of `column` not in `values`. */
  final case class Accepted(name: String, column: String,
      values: Seq[String]) extends Check

  /** Non-null values of `column` absent from `ref`'s `refColumn`. */
  final case class RefIntegrity(name: String, column: String,
      ref: DataFrame, refColumn: String) extends Check

  /** Run all checks; returns (check_name, violations), one row each. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")

    def conditionOf(c: Check): Option[(String, Column)] = c match {
      case NotNull(n, cols) =>
        Some(n -> cols.map(col(_).isNull).reduce(_ || _))
      case InRange(n, cc, lo, hi) =>
        Some(n -> (col(cc).isNotNull && (col(cc) < lo || col(cc) > hi)))
      case Accepted(n, cc, vs) =>
        Some(n -> (col(cc).isNotNull && !col(cc).isin(vs: _*)))
      case _ => None
    }

    // one shared scan for every row-conditional check
    val conditional = checks.flatMap(conditionOf)
    val condDf: Option[DataFrame] =
      if (conditional.isEmpty) None
      else {
        val aggs = conditional.map { case (n, cond) =>
          sum(when(cond, 1L).otherwise(0L)).as(n)
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        val stacked = conditional.map { case (n, _) =>
          row.select(lit(n).as("check_name"),
            coalesce(col(n), lit(0L)).as("violations"))
        }
        Some(stacked.reduce(_ unionByName _))
      }

    val keyed: Seq[DataFrame] = checks.collect {
      case Unique(n, cols) =>
        df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .where(col("__n") > 1)
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("check_name"),
            coalesce(col("violations"), lit(0L)).as("violations"))
      case RefIntegrity(n, cc, ref, rc) =>
        df.select(col(cc)).where(col(cc).isNotNull)
          .join(ref.select(col(rc).as(cc)).distinct(), Seq(cc), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("check_name"),
            coalesce(col("violations"), lit(0L)).as("violations"))
    }

    (condDf.toSeq ++ keyed).reduce(_ unionByName _)
  }
}
