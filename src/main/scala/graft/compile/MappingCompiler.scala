package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spec.{ColumnType, MappingSpec}

/** Declares how a relationship-path column (`Parent.Column` in the
  * reference's generated SOQL — mapping_parser.py:34-38) is resolved:
  * `child.fkColumn == parent.parentKey`. The reference delegates this
  * parent join to Salesforce; here it compiles to an explicit left join
  * with a broadcast hint (parent/dimension tables are small by
  * construction in a star schema — at 100 TB the fact side never
  * shuffles for these).
  */
final case class Relationship(
    childTable: String,
    fkColumn: String,
    parentTable: String,
    parentKey: String)

/** Compiles a [[MappingSpec]] into DataFrame programs — the Spark-native
  * replacement for the reference's SOQL generator + row loops
  * (mapping_parser.py:31-111, migration_engine.py:25-58).
  *
  * Everything is declarative `select`/`where`/`join`, so Catalyst gets
  * column pruning + predicate pushdown to the scan for free; the per-row
  * Python dict loop of the reference becomes whole-stage-codegen'd
  * projection.
  */
object MappingCompiler {

  /** Above this many literals, an IN-list predicate becomes a broadcast
    * left-semi join instead — the reference instead abandons the query at
    * 20k generated chars (mapping_parser.py:78-80); we degrade gracefully.
    */
  val InListThreshold = 1000

  /** Source extraction: `SELECT mapped columns FROM src WHERE … LIMIT n`
    * (mapping_parser.py:31-41). Relationship-path columns are resolved via
    * `relationships` as broadcast left joins; the parent column is aliased
    * to its source-column name so downstream rename logic is uniform.
    *
    * `limit`: the reference hard-codes LIMIT 10000 in its template
    * (mapping_parser.py:5); here it is opt-in — an unconditional limit is
    * wrong at scale and only exists for parity.
    */
  def sourceQuery(
      catalog: String => DataFrame,
      spec: MappingSpec,
      relationships: Seq[Relationship] = Nil,
      limit: Option[Int] = None): DataFrame = {

    val base = catalog(spec.sourceObject)
    val parentTables = spec.mapping.map(_.tableSrc)
      .filter(_ != spec.sourceObject).distinct

    val joined = parentTables.foldLeft(base) { (df, parent) =>
      val needed = spec.mapping.filter(_.tableSrc == parent).map(_.columnSrc).distinct
      val dotted = needed.map(c => s"$parent.$c")
      // the alias-to-bare-name shortcut is only safe when no child column
      // shares the name (both Child and Parent having e.g. `Name` is
      // common in Salesforce) — a silent withColumn replacement would read
      // the parent's value where the spec meant the child's
      val collisions = needed.filter(df.columns.contains)
      if (dotted.forall(df.columns.contains) && collisions.isEmpty) {
        // the source scan already exposes relationship-path columns
        // (connector pushdown: SOQL `Parent.Column`) — alias them to the
        // source-column names and let the ORG do the join; one object
        // scanned instead of two, exactly mapping_parser.py:34-38
        needed.zip(dotted).foldLeft(df) { case (d, (c, dc)) =>
          d.withColumn(c, col(s"`$dc`"))
        }
      } else if (dotted.forall(df.columns.contains) && collisions.nonEmpty &&
          !relationships.exists(r =>
            r.childTable == spec.sourceObject && r.parentTable == parent)) {
        throw new IllegalArgumentException(
          s"relationship-path columns ${collisions.mkString(", ")} of $parent " +
            s"collide with ${spec.sourceObject} columns; declare a " +
            "Relationship so the join can resolve them explicitly")
      } else {
        val rel = relationships.find(r =>
          r.childTable == spec.sourceObject && r.parentTable == parent)
          .getOrElse(throw new IllegalArgumentException(
            s"no relationship declared for ${spec.sourceObject} -> $parent"))
        // prune the parent to key + referenced columns before broadcasting
        val parentDf = catalog(parent)
          .select((rel.parentKey +: needed).distinct.map(col): _*)
        df.join(broadcast(parentDf),
          df(rel.fkColumn) === parentDf(rel.parentKey), "left")
          .drop(parentDf(rel.parentKey))
      }
    }

    // WHERE refers to source-table columns (not just projected ones —
    // SOQL semantics), so filter before projecting; Catalyst pushes the
    // predicate to the scan either way.
    val filtered = spec.whereExpr.map(w => joined.where(expr(w))).getOrElse(joined)
    val projected = filtered.select(spec.mapping.map(m => col(m.columnSrc)).distinct: _*)
    limit.map(projected.limit).getOrElse(projected)
  }

  /** The destination-insert projection: rename src→dst columns, `type`
    * special-cased to the destination object name
    * (migration_engine.py:25-35), then constant enrichment — the
    * configurable replacement for the hard-coded owner-ID overwrite
    * (migration_engine.py:39-41). One vectorized select, no shuffle. */
  def destinationRows(srcDf: DataFrame, spec: MappingSpec): DataFrame = {
    val renamed = srcDf.select(spec.mapping.map { m =>
      if (m.columnDst == "type") lit(spec.destinationObject).as("type")
      else col(m.columnSrc).as(m.columnDst)
    }.distinct: _*)
    spec.constants.foldLeft(renamed) { case (df, (c, v)) =>
      df.withColumn(c, lit(v))
    }
  }

  /** IN-list lookup (mapping_parser.py:56-82 intent, bugs excluded): for
    * small key sets an `isin` predicate (pushable to the scan); above
    * [[InListThreshold]] a broadcast left-semi join, which scales to
    * arbitrarily many keys without a giant predicate. */
  def filterByKeys(df: DataFrame, keyColumn: String, keys: Seq[Any]): DataFrame =
    if (keys.isEmpty) df.where(lit(false))
    else if (keys.size <= InListThreshold) df.where(col(keyColumn).isin(keys: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val keyDf = keys.map(_.toString).toDF(keyColumn)
      df.join(broadcast(keyDf),
        df(keyColumn).cast("string") === keyDf(keyColumn), "left_semi")
    }

  /** Created-records lookup (mapping_parser.py:85-111): the non-regular
    * (ID-carrying) destination columns for rows whose `src_id` column is
    * among the migrated old IDs. */
  def createdRecords(dstDf: DataFrame, spec: MappingSpec, migratedIds: Seq[Any]): DataFrame = {
    val srcIdCol = spec.dstSrcIdColumn.getOrElse(throw new IllegalArgumentException(
      "mapping has no src_id column — cannot correlate created records"))
    val cols = ("Id" +: spec.dstIdColumns).distinct
    filterByKeys(dstDf.select(cols.map(col): _*), srcIdCol, migratedIds)
  }

  /** The write-back pairing (migration_engine.py:53-58): from created
    * destination rows build `{srcOldIdColumn: new dst Id, Id: old src Id}`
    * update rows — the reference's driver-side dict loop expressed as one
    * projection; joining it back to the source is a broadcast-friendly
    * equi-join on Id. */
  def writeBackRows(createdDst: DataFrame, spec: MappingSpec): DataFrame = {
    val oldIdCol = spec.srcOldIdColumn.getOrElse(throw new IllegalArgumentException(
      "mapping has no upd_src column — nothing to write back"))
    val srcIdCol = spec.dstSrcIdColumn.getOrElse(throw new IllegalArgumentException(
      "mapping has no src_id column — cannot pair old and new IDs"))
    createdDst.select(
      col("Id").as(oldIdCol),
      col(srcIdCol).as("Id"))
  }

  /** Applies write-back updates to the source table: left join on `Id`
    * (broadcast the small update side), overwriting the upd_src column
    * where a pair matched — the distributed form of bulk_update
    * (migration_engine.py:63, data_connector.py:281-291). */
  def applyWriteBack(srcTable: DataFrame, updates: DataFrame, spec: MappingSpec): DataFrame = {
    val oldIdCol = spec.srcOldIdColumn.getOrElse(throw new IllegalArgumentException(
      "mapping has no upd_src column — nothing to write back"))
    val u = updates.select(col("Id").as("__upd_id"), col(oldIdCol).as("__upd_val"))
    val joined = srcTable.join(broadcast(u),
      srcTable("Id") === u("__upd_id"), "left")
    val replaced: Column = coalesce(col("__upd_val"), srcTable(oldIdCol)).as(oldIdCol)
    joined.select(srcTable.columns.map {
      case c if c == oldIdCol => replaced
      case c => srcTable(c)
    }: _*)
  }
}
