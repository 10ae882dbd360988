package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import graft.sources.{OrgWriteMetrics, RemoteOrgRegistry, WriteOutcome}

/** TableIO over the DSv2 connector — the production-shaped binding that
  * lets [[MigrationEngine]] run the reference's actual scenario: migrate
  * records between two remote orgs, with extraction pushdown negotiated
  * by Catalyst and mutations chunked by the connector's writers.
  *
  * Created-ID correlation mirrors the reference: after the bulk insert
  * the destination is re-queried for the just-created rows
  * (migration_engine.py:52 — the insert API's per-batch results are a
  * connector TODO there too, data_connector.py:277-278). The re-query
  * filters on the `src_id` column via the connector, so it pushes down
  * as a SOQL IN-list exactly like mapping_parser.py:85-111 intended. */
final class ConnectorTableIO(
    spark: SparkSession,
    orgName: String,
    srcIdColumn: Option[String] = None,
    relationships: Seq[graft.compile.Relationship] = Nil) extends TableIO {

  private def reader(table: String): DataFrame = {
    val rels = relationships.filter(_.childTable == table)
    val base = spark.read.format("salesforce-sim")
      .option("org", orgName).option("sObject", table)
    // declared parent lookups ride along so the scan exposes dotted
    // Parent.Column fields and the org executes the join (SOQL
    // relationship paths) — the compiler then skips its Spark-side join
    val withRels =
      if (rels.isEmpty) base
      else base.option("relationships",
        rels.map(r => s"${r.fkColumn}:${r.parentTable}:${r.parentKey}").mkString(";"))
    withRels.load()
  }

  override def read(table: String): DataFrame = reader(table)

  override def insert(table: String, rows: DataFrame): DataFrame = {
    // the org fills Id — never trust a driver-side value for it
    val clean =
      if (rows.columns.contains("Id")) rows.drop("Id") else rows
    clean.write.format("salesforce-sim")
      .option("org", orgName).option("sObject", table)
      .mode(SaveMode.Append).save()
    srcIdColumn match {
      case Some(k) =>
        // created-records lookup keyed by the old-ID column (pushes down
        // as an IN-list when the engine filters further)
        val keys = clean.select(col(k)).distinct()
        reader(table).join(keys, Seq(k), "left_semi")
      case None => reader(table)
    }
  }

  override def update(table: String, rows: DataFrame): Long = {
    // targeted bulk update through the DSv2 write path: executors chunk
    // the update rows (≤200/call) and the org applies them by Id —
    // data_connector.py:281-291 semantics, zero driver materialization.
    // The outcome is read back under a unique writeId echoed through the
    // commit, so a concurrent write to the same (org, table) can't race
    // this call's processed count.
    val writeId = java.util.UUID.randomUUID().toString
    rows.write.format("salesforce-sim")
      .option("org", orgName).option("sObject", table)
      .option("writeMode", "update").option("writeId", writeId)
      .mode(SaveMode.Append).save()
    OrgWriteMetrics.forWrite(writeId).fold(0L)(_.processed)
  }

  /** Upsert keyed on an external-ID field (bulk_upsert,
    * data_connector.py:301-310), through the same chunked write path. */
  def upsert(table: String, rows: DataFrame, externalIdField: String): WriteOutcome = {
    val writeId = java.util.UUID.randomUUID().toString
    rows.write.format("salesforce-sim")
      .option("org", orgName).option("sObject", table)
      .option("writeMode", "upsert").option("externalIdField", externalIdField)
      .option("writeId", writeId)
      .mode(SaveMode.Append).save()
    OrgWriteMetrics.forWrite(writeId).getOrElse(WriteOutcome(0L, 0L))
  }

  /** Server-side predicate delete (bulk_delete, data_connector.py:294-298):
    * the WHERE ships to the org; no ID list crosses the driver. */
  def deleteWhere(table: String, predicates: Seq[String]): Int =
    RemoteOrgRegistry(orgName).deleteWhere(table, predicates)

  override def overwrite(table: String, rows: DataFrame): Unit = {
    // full replace that PRESERVES record identity: materialize the new
    // rows first (they derive from the table being replaced), truncate
    // org-side (no driver ID collection), then re-insert with Ids intact
    // (the org honors provided Ids). The migration write-back path never
    // comes here anymore — it issues targeted update() calls.
    val materialized = rows.cache()
    materialized.count()
    RemoteOrgRegistry(orgName).deleteWhere(table, Seq("Id != null"))
    materialized.write.format("salesforce-sim")
      .option("org", orgName).option("sObject", table)
      .mode(SaveMode.Append).save()
    materialized.unpersist()
  }
}
