package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{ParquetTableIO, Sinks}

class SinksSuite extends SparkSuite {
  import spark.implicits._

  private def freshIo(): ParquetTableIO = {
    val dir = Files.createTempDirectory("graft_sinks_").toString
    val io = new ParquetTableIO(spark, dir)
    Seq(("1", "a", 10L), ("2", "b", 20L), ("3", "c", 30L))
      .toDF("Id", "name", "v").write.parquet(io.path("t"))
    io
  }

  test("upsert replaces matching keys and appends new ones") {
    val io = freshIo()
    Sinks.upsert(io, "t",
      Seq(("2", "B2", 99L), ("4", "d", 40L)).toDF("Id", "name", "v"), "Id")
    val got = io.read("t").as[(String, String, Long)].collect().toSet
    assert(got == Set(("1", "a", 10L), ("2", "B2", 99L), ("3", "c", 30L), ("4", "d", 40L)))
  }

  test("delete removes rows matching a predicate") {
    val io = freshIo()
    assert(Sinks.delete(io, "t", "v >= 20") == 2)
    assert(io.read("t").select("Id").as[String].collect().toSeq == Seq("1"))
  }

  test("delete keeps rows where the predicate evaluates to NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sinks_null_").toString
    val io = new graft.engine.ParquetTableIO(spark, dir)
    Seq(("1", Some(10L)), ("2", None), ("3", Some(30L)))
      .toDF("Id", "v").write.parquet(io.path("t"))
    // SQL DELETE semantics: the NULL row does not match `v >= 20`
    assert(Sinks.delete(io, "t", "v >= 20") == 1)
    assert(io.read("t").select("Id").as[String].collect().sorted.toSeq ==
      Seq("1", "2"))
  }

  test("deleteMatching is an anti-join on the key set") {
    val io = freshIo()
    val ids = Seq("1", "3", "999").toDF("Id")
    assert(Sinks.deleteMatching(io, "t", "Id", ids) == 2)
    assert(io.read("t").select("Id").as[String].collect().toSeq == Seq("2"))
  }

  test("chunkedForeach emits chunks no larger than the limit") {
    val seen = spark.sparkContext.collectionAccumulator[Int]("chunks")
    val df = spark.range(1050).toDF("x").repartition(3)
    Sinks.chunkedForeach(df, 200)(chunk => seen.add(chunk.size))
    val sizes = seen.value
    assert(sizes.asScala.sum == 1050)
    assert(sizes.asScala.forall(_ <= 200), sizes)
  }

  test("csv export/read round trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    val df = Seq(("1", "x", 1.5), ("2", "y", 2.5)).toDF("Id", "name", "score")
    Sinks.exportCsv(df, s"$dir/out")
    val schema = StructType(Seq(
      StructField("Id", StringType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = Sinks.readCsv(spark, s"$dir/out", schema)
    assert(back.orderBy("Id").as[(String, String, Double)].collect().toSeq ==
      Seq(("1", "x", 1.5), ("2", "y", 2.5)))
  }

  test("jsonl export/read round trip, plain and gzip") {
    val df = Seq((1L, "alpha doc", 0.9), (2L, "beta doc", 0.1))
      .toDF("doc_id", "text", "score")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("score", DoubleType)))
    for (compress <- Seq(false, true)) {
      val dir = Files.createTempDirectory("graft_jsonl_").toString
      Sinks.exportJsonl(df, s"$dir/out", compress)
      val files = new java.io.File(s"$dir/out").listFiles.map(_.getName)
      assert(files.exists(_.endsWith(if (compress) ".json.gz" else ".json")),
        files.mkString(","))
      val back = Sinks.readJsonl(spark, s"$dir/out", schema)
      assert(back.orderBy("doc_id").as[(Long, String, Double)].collect().toSeq ==
        Seq((1L, "alpha doc", 0.9), (2L, "beta doc", 0.1)))
    }
  }

  test("orc round trip keeps values and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc_").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "score")
    Sinks.exportOrc(df, s"$dir/t")
    val back = Sinks.readOrc(spark, s"$dir/t").where(col("id") >= 2)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "b", 2.5), (3L, "c", 3.5)))
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThanOrEqual"),
      s"ORC scan must receive the pushed filter:\n$p")
  }

  test("versioned publish: readers flip atomically, old versions stay readable") {
    val dir = Files.createTempDirectory("graft_ver_").toString
    assert(Sinks.latestVersion(s"$dir/t").isEmpty)
    val v1 = Sinks.writeVersioned(Seq((1L, "a")).toDF("id", "v"), s"$dir/t")
    val v2 = Sinks.writeVersioned(Seq((1L, "b"), (2L, "c")).toDF("id", "v"), s"$dir/t")
    assert(v1 == 1L && v2 == 2L)
    assert(Sinks.latestVersion(s"$dir/t").contains(2L))
    assert(Sinks.readLatest(spark, s"$dir/t").count() == 2)
    // rollback surface: the previous version is intact
    assert(Sinks.readVersion(spark, s"$dir/t", 1L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("compact coalesces a shredded table without changing its rows") {
    val dir = Files.createTempDirectory("graft_compact_").toString
    // shred: 64 partitions for 1000 rows = 64 tiny files
    spark.range(1000).repartition(64)
      .write.mode("overwrite").parquet(s"$dir/t")
    val before = new java.io.File(s"$dir/t").listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(before >= 32, s"expected many small files, got $before")
    val n = Sinks.compact(spark, s"$dir/t", targetBytes = 1L << 20)
    val after = new java.io.File(s"$dir/t").listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(after == n && after < before / 4, s"files: $before -> $after")
    val back = spark.read.parquet(s"$dir/t").as[Long].collect().sorted
    assert(back.toSeq == (0L until 1000L))
  }

  test("compact preserves a Hive-partitioned layout and its pruning") {
    val dir = Files.createTempDirectory("graft_compact_part_").toString
    val df = spark.range(400)
      .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang")
      .repartition(16)
    df.write.mode("overwrite").partitionBy("lang").parquet(s"$dir/t")
    def parquetFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) Seq(f) else Nil }
      else Option(f.listFiles).getOrElse(Array.empty).toSeq.flatMap(parquetFiles)
    val before = parquetFiles(new java.io.File(s"$dir/t")).size
    assert(before >= 16, s"expected a shredded partitioned table, got $before")
    Sinks.compact(spark, s"$dir/t", targetBytes = 1L << 20)
    // the partition directories survive (pruning layout intact) and each
    // compacted to one file
    val langDirs = new java.io.File(s"$dir/t").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("lang=")).map(_.getName)
    assert(langDirs.sorted.toSeq == Seq("lang=de", "lang=en"))
    val after = parquetFiles(new java.io.File(s"$dir/t")).size
    assert(after <= 2, s"files: $before -> $after")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 400)
    assert(back.where(col("lang") === "en").count() == 200)
    // sizing must have recursed: a zero-byte estimate would mean 1 file
    // TOTAL and a flattened layout; instead both dirs exist with data
    assert(back.schema.fieldNames.contains("lang"))
  }

  test("compact keeps numeric-looking string partition values verbatim") {
    val dir = Files.createTempDirectory("graft_compact_infer_").toString
    // bucket values that LOOK numeric/date-like: with partition type
    // inference on, '007' re-reads as int 7 and the rewrite renames the
    // directory bucket=007 -> bucket=7, silently changing the value
    val df = Seq((1L, "007"), (2L, "007"), (3L, "2021-01-01"))
      .toDF("id", "bucket").repartition(8)
    df.write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/t")
    Sinks.compact(spark, s"$dir/t", targetBytes = 1L << 20)
    val dirs = new java.io.File(s"$dir/t").listFiles
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("bucket=007", "bucket=2021-01-01"),
      s"partition directory names must survive compact verbatim: $dirs")
    // and the session conf was restored (inference back on by default)
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    assert(spark.conf.get(inferKey, "true") == "true")
    assert(spark.read.parquet(s"$dir/t").count() == 3)
  }

  test("compact drops a leftover __old from a crash AFTER the swap") {
    val dir = Files.createTempDirectory("graft_compact_crash2_").toString
    spark.range(100).repartition(8).write.mode("overwrite").parquet(s"$dir/t")
    // simulate a crash after the second rename but before cleanup: the
    // table at `path` is current AND a stale __old remains
    new java.io.File(s"$dir/t.__old/stale").mkdirs()
    val n = Sinks.compact(spark, s"$dir/t", targetBytes = 1L << 20)
    assert(n == 1)
    assert(spark.read.parquet(s"$dir/t").count() == 100)
    assert(!new java.io.File(s"$dir/t.__old").exists())
  }

  test("compact rolls back a table stranded at __old by a crashed swap") {
    val dir = Files.createTempDirectory("graft_compact_crash_").toString
    spark.range(100).repartition(8).write.mode("overwrite").parquet(s"$dir/t")
    // simulate a crash between the two renames: data at __old, path gone
    assert(new java.io.File(s"$dir/t").renameTo(new java.io.File(s"$dir/t.__old")))
    val n = Sinks.compact(spark, s"$dir/t", targetBytes = 1L << 20)
    assert(n == 1)
    val back = spark.read.parquet(s"$dir/t").as[Long].collect().sorted
    assert(back.toSeq == (0L until 100L))
    assert(!new java.io.File(s"$dir/t.__old").exists())
  }

  test("quarantineInvalid routes dangling keys to the dead-letter table, twice") {
    val dir = Files.createTempDirectory("graft_dlq_").toString
    val valid = Seq(1L, 2L, 3L).toDF("Id")
    val batch1 = Seq((1L, "a"), (9L, "x"), (2L, "b")).toDF("Id", "v")
    val ok1 = Sinks.quarantineInvalid(batch1, valid, "Id", s"$dir/dlq")
    assert(ok1.select("Id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // second batch APPENDS to the same dead-letter table
    val batch2 = Seq((3L, "c"), (10L, "y")).toDF("Id", "v")
    val ok2 = Sinks.quarantineInvalid(batch2, valid, "Id", s"$dir/dlq")
    assert(ok2.select("Id").as[Long].collect().toSeq == Seq(3L))
    val dlq = spark.read.parquet(s"$dir/dlq")
    assert(dlq.select("Id").as[Long].collect().sorted.toSeq == Seq(9L, 10L))
  }

  test("partitioned write prunes directories at planning time") {
    val dir = Files.createTempDirectory("graft_part_").toString
    val df = Seq((1L, "en", "a"), (2L, "de", "b"), (3L, "en", "c"), (4L, "fr", "d"))
      .toDF("doc_id", "lang", "text")
    Sinks.writePartitioned(df, s"$dir/docs", Seq("lang"))
    assert(new java.io.File(s"$dir/docs/lang=en").isDirectory)
    val scan = spark.read.parquet(s"$dir/docs").where(col("lang") === "en")
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("lang"),
      s"the lang predicate must prune partitions, not filter rows:\n$p")
    assert(scan.count() == 2)
    // the pruned scan reads only the en directory's files
    val files = scan.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.split("\n")).mkString
    assert(!files.contains("lang=de"), files)
  }

  private implicit class JavaListOps[T](l: java.util.List[T]) {
    def asScala: Seq[T] = {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.toSeq
    }
  }
}
