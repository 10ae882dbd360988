package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{ConnectorTableIO, MigrationEngine}
import graft.sources.{InMemoryOrg, RemoteOrgRegistry}
import graft.spec.MappingSpec

/** The reference's actual end-to-end scenario: migrate records between
  * two remote orgs through the DSv2 connector — extraction pushdown,
  * chunked insert, created-ID correlation, and write-back update, with
  * the round-trip invariant asserted org-side. */
class OrgMigrationSuite extends SparkSuite {

  private val srcSchema = StructType(Seq(
    StructField("Id", StringType), StructField("Name", StringType),
    StructField("Amount", DoubleType), StructField("New_Id__c", StringType)))
  private val dstSchema = StructType(Seq(
    StructField("Id", StringType), StructField("Old_Record_Id__c", StringType),
    StructField("Name", StringType), StructField("type", StringType)))

  private val spec = MappingSpec.fromJson("""
    [{"source_object": "Account",
      "destination_object": "Accounts__c",
      "where_condition": "Amount >= 100",
      "mapping": [
        {"table_src": "Account", "column_src": "Id",
         "table_dst": "Accounts__c", "column_dst": "Old_Record_Id__c",
         "operation": "copy", "column_type": "src_id"},
        {"table_src": "Account", "column_src": "Name",
         "table_dst": "Accounts__c", "column_dst": "Name",
         "operation": "copy", "column_type": "regular"},
        {"table_src": "Account", "column_src": "Id",
         "table_dst": "Accounts__c", "column_dst": "type",
         "operation": "copy", "column_type": "regular"},
        {"table_src": "Account", "column_src": "New_Id__c",
         "table_dst": "Accounts__c", "column_dst": "Id",
         "operation": "upd_src", "column_type": "dst_id"}]}]""").head

  test("org-to-org migrate with write-back through the connector") {
    val srcOrg = new InMemoryOrg
    val dstOrg = new InMemoryOrg
    srcOrg.createTable("Account", srcSchema, Seq(
      Row("A1", "small", 50.0, null),
      Row("A2", "big", 500.0, null),
      Row("A3", "huge", 900.0, null)))
    dstOrg.createTable("Accounts__c", dstSchema)
    RemoteOrgRegistry.register("mig_src", srcOrg)
    RemoteOrgRegistry.register("mig_dst", dstOrg)

    val src = new ConnectorTableIO(spark, "mig_src")
    val dst = new ConnectorTableIO(spark, "mig_dst",
      srcIdColumn = spec.dstSrcIdColumn)
    val m = new MigrationEngine(src, dst).migrate(spec)

    assert(m.extracted == 2 && m.inserted == 2 && m.updated == 2)

    // destination got org-minted IDs plus the old-ID column + type
    val dstRows = dstOrg.rows("Accounts__c")
    assert(dstRows.size == 2)
    val byOldId = dstRows.map(r => r.getString(1) -> r).toMap
    assert(byOldId.keySet == Set("A2", "A3"))
    assert(byOldId("A2").getString(2) == "big")
    assert(dstRows.forall(_.getString(3) == "Accounts__c")) // type column
    assert(dstRows.forall(_.getString(0).startsWith("ID")))

    // round-trip invariant (migration_engine.py:44-68): each migrated
    // source row's upd_src column equals its new destination Id
    val srcRows = srcOrg.rows("Account")
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(srcRows("A1") == null, "unmigrated row must stay untouched")
    assert(srcRows("A2") == byOldId("A2").getString(0))
    assert(srcRows("A3") == byOldId("A3").getString(0))

    // the extraction pushed its WHERE into generated SOQL
    assert(srcOrg.statements.exists(_.contains("Amount >= 100")),
      srcOrg.statements.mkString("\n"))

    // write-back went through targeted UPDATE calls — never a
    // full-table delete+reinsert (the round-1 overwrite scale bug)
    assert(srcOrg.statements.exists(_.startsWith("UPDATE Account")),
      srcOrg.statements.mkString("\n"))
    assert(!srcOrg.statements.exists(_.startsWith("DELETE FROM Account")),
      srcOrg.statements.mkString("\n"))

    // commit metrics surfaced processed/failed counts from the writers
    val ins = graft.sources.OrgWriteMetrics.lastCommit("mig_dst", "Accounts__c")
    assert(ins.processed == 2 && ins.failed == 0, ins)
    val upd = graft.sources.OrgWriteMetrics.lastCommit("mig_src", "Account")
    assert(upd.processed == 2 && upd.failed == 0, upd)
  }

  test("connector update counts missing Ids as failed, not as errors") {
    val org = new InMemoryOrg
    org.createTable("Account", srcSchema, Seq(
      Row("A1", "one", 1.0, null), Row("A2", "two", 2.0, null)))
    RemoteOrgRegistry.register("updm", org)
    import spark.implicits._
    val updates = Seq(("A1", "renamed"), ("AX", "ghost")).toDF("Id", "Name")
    val n = new ConnectorTableIO(spark, "updm").update("Account", updates)
    assert(n == 1)
    val out = graft.sources.OrgWriteMetrics.lastCommit("updm", "Account")
    assert(out.processed == 1 && out.failed == 1, out)
    val byId = org.rows("Account").map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("A1") == "renamed" && byId("A2") == "two")
  }

  test("connector upsert inserts new keys and updates existing ones") {
    val org = new InMemoryOrg
    org.createTable("Account", srcSchema, Seq(
      Row("A1", "one", 1.0, "K1"), Row("A2", "two", 2.0, "K2")))
    RemoteOrgRegistry.register("upsm", org)
    import spark.implicits._
    val rows = Seq(("K1", "one-v2", 10.0), ("K3", "three", 3.0))
      .toDF("New_Id__c", "Name", "Amount")
    val out = new ConnectorTableIO(spark, "upsm")
      .upsert("Account", rows, "New_Id__c")
    assert(out.processed == 2 && out.failed == 0, out)
    assert(org.statements.exists(_.startsWith("UPSERT Account ON New_Id__c")),
      org.statements.mkString("\n"))
    val byKey = org.rows("Account")
      .map(r => r.getString(3) -> (r.getString(1), r.getDouble(2))).toMap
    assert(byKey("K1") == ("one-v2", 10.0)) // updated in place
    assert(byKey("K2") == ("two", 2.0))     // untouched
    assert(byKey("K3") == ("three", 3.0))   // inserted
  }

  test("upsert is idempotent — the safe sink under Spark task retries") {
    // write() inserts happen before commit(), so a retried insert task
    // double-writes (the reference has the same hazard on its single
    // auth retry, data_connector.py:246-252). External-ID upsert is the
    // idempotent alternative: replaying the same batch must be a no-op.
    val org = new InMemoryOrg
    org.createTable("Account", srcSchema, Nil)
    RemoteOrgRegistry.register("idem", org)
    import spark.implicits._
    val rows = Seq(("K1", "one", 1.0), ("K2", "two", 2.0))
      .toDF("New_Id__c", "Name", "Amount")
    val io = new ConnectorTableIO(spark, "idem")
    io.upsert("Account", rows, "New_Id__c")
    val after1 = org.rows("Account").sortBy(_.getString(3))
    io.upsert("Account", rows, "New_Id__c") // the "retry"
    val after2 = org.rows("Account").sortBy(_.getString(3))
    assert(after2.size == 2, s"retry must not duplicate: ${after2.size} rows")
    assert(after1.map(_.toSeq.drop(1)) == after2.map(_.toSeq.drop(1)),
      "non-Id columns must be unchanged by the replay")
  }

  test("connector deleteWhere resolves the predicate org-side") {
    val org = new InMemoryOrg
    org.createTable("Account", srcSchema, Seq(
      Row("A1", "keep", 1.0, null), Row("A2", "drop", 200.0, null),
      Row("A3", "drop", 300.0, null)))
    RemoteOrgRegistry.register("delw", org)
    val n = new ConnectorTableIO(spark, "delw")
      .deleteWhere("Account", Seq("Amount > 100"))
    assert(n == 2)
    assert(org.rows("Account").map(_.getString(0)) == Vector("A1"))
    assert(org.statements.last == "DELETE FROM Account WHERE (Amount > 100)",
      org.statements.last)
  }
}
