package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{MigrationEngine, ParquetTableIO}
import graft.queries.Mapping

/** The reference's own round-trip invariant (migration_engine.py:44-68):
  * after migrate, every matching source row's upd_src column equals the
  * new destination row's Id, and destination row count == extracted count. */
class MigrationEngineSuite extends SparkSuite {
  import spark.implicits._

  test("migrate: extract -> insert -> write-back round trip") {
    val dir = Files.createTempDirectory("graft_mig_").toString
    val src = new ParquetTableIO(spark, s"$dir/src")
    val dst = new ParquetTableIO(spark, s"$dir/dst")

    Seq(
      ("1", "alice", 50.0, null.asInstanceOf[String]),
      ("2", "bob", 2000.0, null.asInstanceOf[String]),
      ("3", "carol", 5000.0, null.asInstanceOf[String]))
      .toDF("Id", "name", "acctbal", "dst_ref")
      .write.parquet(src.path("customer_src"))

    val engine = new MigrationEngine(src, dst,
      mintId = Some(srcIdCol => concat(lit("D"), col(srcIdCol))))
    val m = engine.migrate(Mapping.customerSpec)

    assert(m.extracted == 2 && m.inserted == 2 && m.updated == 2)

    // destination got the renamed/enriched rows with minted IDs
    val dstRows = dst.read("customer_dst")
      .select("Id", "old_id", "name", "type", "segment")
      .as[(String, String, String, String, String)].collect().toSet
    assert(dstRows == Set(
      ("D2", "2", "bob", "customer_dst", "MIGRATED"),
      ("D3", "3", "carol", "customer_dst", "MIGRATED")))

    // write-back: matching src rows now reference their new dst Id
    val srcRows = src.read("customer_src")
      .select("Id", "dst_ref").as[(String, String)].collect().toMap
    assert(srcRows == Map("1" -> null, "2" -> "D2", "3" -> "D3"))
  }

  test("migrate without upd_src element skips write-back") {
    val dir = Files.createTempDirectory("graft_mig2_").toString
    val src = new ParquetTableIO(spark, s"$dir/src")
    val dst = new ParquetTableIO(spark, s"$dir/dst")
    Seq(("1", "a", 9999.0, null.asInstanceOf[String]))
      .toDF("Id", "name", "acctbal", "dst_ref")
      .write.parquet(src.path("customer_src"))

    val spec = Mapping.customerSpec.copy(mapping =
      Mapping.customerSpec.mapping.filter(_.operation != "upd_src"))
    val m = new MigrationEngine(src, dst,
      mintId = Some(c => concat(lit("D"), col(c)))).migrate(spec)
    assert(m.extracted == 1 && m.inserted == 1 && m.updated == 0)
  }
}
