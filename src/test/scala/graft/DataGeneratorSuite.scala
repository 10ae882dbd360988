package graft

import graft.gen.DataGenerator

class DataGeneratorSuite extends SparkSuite {
  import spark.implicits._

  private val struct = Seq(
    "Name" -> "text", "type" -> "ObjectName", "Zip" -> "int",
    "City" -> "text", "Birthday" -> "date")
  private val defaults = Map("City" -> "San Antonio")
  private val prefixes = Map("Name" -> "Account name_")

  private def gen(seed: Long = 42L) =
    DataGenerator.generate(spark, struct, defaults, prefixes,
      n = 100, objectName = "Account", seed = seed)

  test("schema follows the struct order and types") {
    val df = gen()
    assert(df.columns.toSeq == Seq("Name", "type", "Zip", "City", "Birthday"))
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("Zip") == "integer")
    assert(types("Birthday") == "timestamp")
    assert(types("Name") == "string")
  }

  test("deterministic for a fixed seed, different across seeds") {
    val a = gen().collect().toSeq
    val b = gen().collect().toSeq
    val c = gen(seed = 7L).collect().toSeq
    assert(a == b)
    assert(a != c)
  }

  test("ObjectName, defaults and prefixes are honored") {
    val df = gen()
    assert(df.select("type").distinct().as[String].collect().toSeq == Seq("Account"))
    assert(df.select("City").distinct().as[String].collect().toSeq == Seq("San Antonio"))
    assert(df.select("Name").as[String].collect().forall(_.startsWith("Account name_")))
  }

  test("int range and date window match the reference defaults") {
    val df = gen()
    val (zmin, zmax) = df.agg(org.apache.spark.sql.functions.min("Zip"),
      org.apache.spark.sql.functions.max("Zip"))
      .as[(Int, Int)].collect().head
    assert(zmin >= 10000 && zmax <= 100000)
    val dates = df.select("Birthday").as[java.sql.Timestamp].collect()
    val lo = java.sql.Timestamp.valueOf("2000-01-01 13:30:00")
    val hi = java.sql.Timestamp.valueOf("2017-01-01 13:30:00")
    assert(dates.forall(d => !d.before(lo) && !d.after(hi)))
  }

  test("values differ across rows (not constant-folded)") {
    val df = gen()
    assert(df.select("Name").distinct().count() > 90)
  }
}
