package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sink-side operators completing the reference's mutation surface
  * (SURVEY.md §2.2) on the parquet-backed TableIO: upsert keyed by an
  * external ID (bulk_upsert, data_connector.py:301-310), predicate
  * delete (bulk_delete, data_connector.py:294-298), semi-join delete
  * (the mriya.py:62-77 flow), chunked mutation calls (chunked_create/
  * update/delete, data_connector.py:119-161), and CSV export
  * (export_to_csv, data_connector.py:86-111).
  */
object Sinks {

  /** MERGE-style upsert: rows whose `keyColumn` matches an existing row
    * replace it; the rest append — one full-outer-shaped pass expressed
    * as anti-join + union, no driver materialization. */
  def upsert(io: ParquetTableIO, table: String, incoming: DataFrame,
      keyColumn: String): Unit = {
    val existing = io.read(table)
    val kept = existing.join(
      broadcast(incoming.select(col(keyColumn))), Seq(keyColumn), "left_anti")
    io.overwrite(table, kept.unionByName(incoming))
  }

  /** DELETE FROM table WHERE cond — SQL delete semantics: only rows where
    * the predicate is TRUE are removed; NULL-evaluating rows (e.g. a null
    * column in `v >= 20`) are kept, so `not(cond)` alone would be wrong
    * (NOT NULL is NULL and the row would be silently dropped). */
  def delete(io: ParquetTableIO, table: String, condition: String): Long = {
    val existing = io.read(table)
    val keep = existing.where(coalesce(expr(condition), lit(false)) =!= true)
    val removed = existing.count() - keep.count()
    io.overwrite(table, keep)
    removed
  }

  /** Semi-join delete — `DELETE FROM table WHERE key IN (ids)`, the
    * reference's 200-ID-batch destination cleanup (mriya.py:62-77)
    * expressed as one anti-join instead of generated OR-chains. */
  def deleteMatching(io: ParquetTableIO, table: String, keyColumn: String,
      ids: DataFrame): Long = {
    val existing = io.read(table)
    val keep = existing.join(broadcast(ids.select(col(keyColumn))),
      Seq(keyColumn), "left_anti")
    val removed = existing.count() - keep.count()
    io.overwrite(table, keep)
    removed
  }

  /** Executor-parallel chunked mutation: partitions stream through
    * `grouped(chunkSize)` and each chunk goes to one API call — the
    * distributed form of the reference's serial 200-row loops. The
    * callback must be idempotent or the target must dedup on retry
    * (Spark may re-run tasks; the reference has the same double-insert
    * hazard on its single retry, data_connector.py:246-252). */
  def chunkedForeach(df: DataFrame, chunkSize: Int)(call: Seq[Row] => Unit): Unit =
    df.foreachPartition { (it: Iterator[Row]) =>
      it.grouped(chunkSize).foreach(chunk => call(chunk.toSeq))
    }

  /** CSV export with header — the reference's export_to_csv pipeline in
    * one declarative write (partitioned output; a single file would be a
    * driver bottleneck at scale). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** CSV scan with an explicit schema (the reference infers headers from
    * the first row — data_connector.py:91; explicit schemas avoid that
    * fragility). */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON-Lines export — the interchange format LLM corpus tooling
    * expects (one JSON object per line, splittable, append-friendly).
    * Compression keeps the 100 TB story sane: gzip parts are still
    * line-splittable per file and a fraction of the raw text size. */
  def exportJsonl(df: DataFrame, path: String, compress: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** JSONL scan with an explicit schema — schema inference over 100 TB
    * of JSONL is a full extra pass; production reads always declare. */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Hive-style partitioned parquet write: one directory per value of
    * `partitionCols` — the coarse pruning layer a 100 TB table needs
    * (predicates on the partition columns skip whole directories at
    * PLANNING time, before any file is opened; SinksSuite pins
    * `PartitionFilters` in the scan). Compose with
    * [[graft.functions.ScaleOps.zorderRepartition]] inside each
    * partition for row-group-level pruning on the remaining dims. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** ORC export/scan — the other columnar interchange format warehouses
    * speak; same pushdown/pruning properties as parquet (predicate +
    * column pruning reach the ORC reader). */
  def exportOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Small-files compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files. Long-running ingest (especially
    * streaming sinks — one file per micro-batch per partition) shreds
    * tables into thousands of tiny files whose open/footer overhead
    * dominates 100 TB scans; periodic compaction restores scan-sized
    * files.
    *
    * Hive-partitioned layouts (from [[writePartitioned]]) are handled:
    * sizing recurses into the partition tree and the rewrite preserves
    * `partitionBy` (partition columns recovered from the `k=v` directory
    * names), keeping planning-time pruning intact — rows are clustered so
    * each partition directory compacts to one file.
    *
    * Swap protocol (and its failure window, for the local-FS TableIO —
    * object-store deployments publish a pointer like [[writeVersioned]]
    * instead): the rewrite lands in `path.__compacting`, then two renames
    * swap it in. Between the renames `path` briefly does not exist, and a
    * crash there strands the data at `path.__old` — so compact() begins by
    * ROLLING BACK any stranded `__old` from a previous crash, making the
    * swap self-healing rather than silently destructive. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val dir = new java.io.File(path)
    val bak = new java.io.File(s"$path.__old")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    // crash recovery, both windows: died BETWEEN the renames → the table
    // is stranded at __old with nothing at `path`, roll it back; died
    // AFTER the second rename (mid-cleanup) → `path` is current and
    // __old is a leftover that would block the next swap's rename, drop it
    if (bak.isDirectory && !dir.exists())
      require(bak.renameTo(dir), s"could not roll back stranded $bak")
    else if (bak.isDirectory && dir.exists())
      rm(bak)
    def walkBytes(f: java.io.File): Long =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) f.length else 0L }
      else Option(f.listFiles).getOrElse(Array.empty).map(walkBytes).sum
    // partition columns from the k=v directory chain (first leaf path)
    def partCols(f: java.io.File, acc: Vector[String]): Vector[String] = {
      val sub = Option(f.listFiles).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.contains("="))
      sub.headOption match {
        case Some(d) => partCols(d, acc :+ d.getName.split("=", 2)(0))
        case None => acc
      }
    }
    val parts = partCols(dir, Vector.empty)
    val bytes = walkBytes(dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = s"$path.__compacting"
    // partition values must round-trip as the literal directory strings:
    // with type inference on, a string partition value that LOOKS numeric
    // or date-like (bucket=007, day=2021-01-01) is read as int/date and
    // rewritten under an altered directory name (bucket=7), silently
    // changing partition values for downstream readers. Inference is
    // disabled only for this read and restored afterwards.
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val priorInfer = spark.conf.getOption(inferKey)
    val df =
      try { spark.conf.set(inferKey, "false"); spark.read.parquet(path) }
      finally priorInfer.fold(spark.conf.unset(inferKey))(spark.conf.set(inferKey, _))
    // cluster on the partition cols: every partition value lands in one
    // task → one compacted file per partition directory
    val writer = parts match {
      case Seq() => df.repartition(nFiles).write
      case ps => df.repartition(nFiles, ps.map(col): _*).write.partitionBy(ps: _*)
    }
    writer.mode("overwrite").parquet(tmp)
    require(dir.renameTo(bak), s"could not stage $path for swap")
    require(new java.io.File(tmp).renameTo(dir), s"could not swap in $tmp")
    rm(bak)
    nFiles
  }

  /** Versioned atomic publish: each write lands in `path/v=N` and a
    * `_LATEST` pointer file flips to N only after the data is fully
    * written (tmp + rename — readers NEVER see a half-written version).
    * Old versions stay readable ([[readVersion]]) until pruned — the
    * poor-man's time travel a pipeline output needs for safe downstream
    * consumption and rollback. Returns the published version. */
  def writeVersioned(df: DataFrame, path: String): Long = {
    val root = new java.io.File(path)
    root.mkdirs()
    val next = Option(root.listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .foldLeft(0L)(math.max) + 1
    df.write.mode("overwrite").parquet(s"$path/v=$next")
    val tmp = new java.io.File(root, "_LATEST.tmp")
    java.nio.file.Files.write(tmp.toPath,
      next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(root, "_LATEST").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  def latestVersion(path: String): Option[Long] = {
    val p = new java.io.File(path, "_LATEST").toPath
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def readLatest(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    readVersion(spark, path, latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no published version under $path")))

  def readVersion(spark: org.apache.spark.sql.SparkSession, path: String,
      version: Long): DataFrame =
    spark.read.parquet(s"$path/v=$version")

  /** Dead-letter routing: split `df` against the set of valid keys —
    * rows whose key misses are APPENDED to the quarantine path (the
    * accumulating reject table a production load keeps for replay), valid
    * rows are returned for the actual mutation. The reference only
    * counts failures (numberRecordsFailed); this keeps the rows.
    *
    * Both halves are one semi/anti join against the same (broadcastable)
    * key set; cache `df` first when it is expensive to recompute. */
  def quarantineInvalid(
      df: DataFrame, validKeys: DataFrame, keyCol: String,
      quarantinePath: String): DataFrame = {
    val keys = validKeys.select(col(keyCol)).distinct()
    df.join(keys, Seq(keyCol), "left_anti")
      .write.mode("append").parquet(quarantinePath)
    df.join(keys, Seq(keyCol), "left_semi")
  }
}
