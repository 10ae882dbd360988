package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{FkReference, MigrationEngine, MigrationPlan, ParquetTableIO}
import graft.spec.MappingSpec

/** Whole-list migration orchestration: dependency ordering from FK
  * references, parent-before-child execution, and FK remapping of child
  * rows through the parent's old→new Id map. */
class MigrationPlanSuite extends SparkSuite {
  import spark.implicits._

  private def specJson(srcObj: String, dstObj: String,
      extraCols: Seq[String] = Nil): MappingSpec = {
    val extra = extraCols.map(c =>
      s"""{"table_src": "$srcObj", "column_src": "$c",
           "table_dst": "$dstObj", "column_dst": "$c",
           "operation": "copy", "column_type": "regular"},""").mkString
    MappingSpec.fromJson(s"""
      [{"source_object": "$srcObj", "destination_object": "$dstObj",
        "mapping": [
          {"table_src": "$srcObj", "column_src": "Id",
           "table_dst": "$dstObj", "column_dst": "old_id",
           "operation": "copy", "column_type": "src_id"},
          $extra
          {"table_src": "$srcObj", "column_src": "name",
           "table_dst": "$dstObj", "column_dst": "name",
           "operation": "copy", "column_type": "regular"}]}]""").head
  }

  test("migrateAll orders parents first and remaps child FK columns") {
    val dir = Files.createTempDirectory("graft_plan_").toString
    val src = new ParquetTableIO(spark, s"$dir/src")
    val dst = new ParquetTableIO(spark, s"$dir/dst")

    Seq(("A1", "acme"), ("A2", "zorg"))
      .toDF("Id", "name").write.parquet(src.path("Account"))
    // C3 dangles: its account no longer exists in the source
    Seq(("C1", "ann", "A1"), ("C2", "bob", "A2"), ("C3", "cyn", "A9"))
      .toDF("Id", "name", "AccountId").write.parquet(src.path("Contact"))

    val engine = new MigrationEngine(src, dst,
      mintId = Some(c => concat(lit("N"), col(c))))
    val accounts = specJson("Account", "Account__c")
    val contacts = specJson("Contact", "Contact__c", Seq("AccountId"))
    val plan = new MigrationPlan(src, dst, engine,
      references = Seq(FkReference("Contact__c", "AccountId", "Account")))

    // child listed FIRST: the plan must still run Account before Contact
    val results = plan.migrateAll(Seq(contacts, accounts))
    assert(results.map(_._1) == Seq("Account__c", "Contact__c"))
    assert(results.toMap.apply("Contact__c").inserted == 3)

    // contacts landed pointing at the NEW account ids; dangling FK -> null
    val fk = dst.read("Contact__c").select("old_id", "AccountId")
      .as[(String, String)].collect().toMap
    assert(fk == Map("C1" -> "NA1", "C2" -> "NA2", "C3" -> null))
  }

  test("independent specs keep their input order") {
    val dir = Files.createTempDirectory("graft_plan2_").toString
    val src = new ParquetTableIO(spark, s"$dir/src")
    val dst = new ParquetTableIO(spark, s"$dir/dst")
    Seq(("X1", "x")).toDF("Id", "name").write.parquet(src.path("Alpha"))
    Seq(("Y1", "y")).toDF("Id", "name").write.parquet(src.path("Beta"))

    val engine = new MigrationEngine(src, dst,
      mintId = Some(c => concat(lit("N"), col(c))))
    val plan = new MigrationPlan(src, dst, engine)
    val results = plan.migrateAll(Seq(
      specJson("Beta", "Beta__c"), specJson("Alpha", "Alpha__c")))
    assert(results.map(_._1) == Seq("Beta__c", "Alpha__c"))
  }

  test("cyclic FK references fail loudly") {
    val dir = Files.createTempDirectory("graft_plan3_").toString
    val src = new ParquetTableIO(spark, s"$dir/src")
    val dst = new ParquetTableIO(spark, s"$dir/dst")
    val engine = new MigrationEngine(src, dst)
    val plan = new MigrationPlan(src, dst, engine, references = Seq(
      FkReference("A__c", "BId", "B"),
      FkReference("B__c", "AId", "A")))
    val e = intercept[IllegalArgumentException] {
      plan.migrateAll(Seq(specJson("A", "A__c"), specJson("B", "B__c")))
    }
    assert(e.getMessage.contains("cyclic"))
  }

  test("duplicate destination or source objects fail loudly, not silently") {
    val dir = Files.createTempDirectory("graft_plan4_").toString
    val src = new ParquetTableIO(spark, s"$dir/src")
    val dst = new ParquetTableIO(spark, s"$dir/dst")
    val engine = new MigrationEngine(src, dst)
    val plan = new MigrationPlan(src, dst, engine)

    // two specs landing in the same destination: the second would never
    // migrate (topo progress is keyed by destinationObject)
    val eDst = intercept[IllegalArgumentException] {
      plan.migrateAll(Seq(specJson("A", "X__c"), specJson("B", "X__c")))
    }
    assert(eDst.getMessage.contains("destinationObject"), eDst.getMessage)
    assert(eDst.getMessage.contains("X__c"), eDst.getMessage)

    // two specs reading the same source: last-wins shadowing in FK maps
    val eSrc = intercept[IllegalArgumentException] {
      plan.migrateAll(Seq(specJson("A", "X__c"), specJson("A", "Y__c")))
    }
    assert(eSrc.getMessage.contains("sourceObject"), eSrc.getMessage)
    assert(eSrc.getMessage.contains("A"), eSrc.getMessage)
  }
}
