package graft

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.functions._
import graft.functions.{FsCommit, TextOps, VectorOps}

/** The commit-protocol boundary (r15 verdict prescription 1): every
  * persisted-store commit rides HDFS-semantics atomic rename and
  * O_EXCL create, so store/index creation must REFUSE filesystems
  * without them — loudly, at creation, not as silent corruption at
  * the first crash window. Mock Hadoop FileSystems play the two
  * prescribed failure shapes: a rename that returns false, and the
  * S3A object-store shape (per-object copy masquerading as rename). */
class FsCommitSuite extends SparkSuite {

  import FsCommitSuite._

  private def hadoopConf = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.norename.impl", classOf[RenameFalseFs].getName)
    c.set("fs.s3a.impl", classOf[FakeS3aFs].getName)
    c.set("fs.mangle.impl", classOf[NameManglingFs].getName)
    c
  }

  private def fsFor(path: String) = {
    FsCommit.resetCache()
    new HPath(path).getFileSystem(hadoopConf)
  }

  test("local file:// passes the gate (every other suite depends on it)") {
    val dir = java.nio.file.Files.createTempDirectory("fscheck_ok_").toString
    FsCommit.requireAtomicCommits(fsFor(dir), dir, "signature store")
  }

  test("a filesystem whose rename returns false is refused by the probe") {
    val dir = java.nio.file.Files.createTempDirectory("fscheck_nr_")
    val path = s"norename:${dir.toString}"
    val e = intercept[IllegalStateException] {
      FsCommit.requireAtomicCommits(fsFor(path), path, "signature store")
    }
    assert(e.getMessage.contains("HDFS-semantics"), e.getMessage)
    assert(e.getMessage.contains("rename"), e.getMessage)
  }

  test("the S3A shape is refused by scheme, before any I/O") {
    val path = "s3a://some-bucket/stores/sigs"
    val e = intercept[IllegalStateException] {
      FsCommit.requireAtomicCommits(fsFor(path), path, "ANN index")
    }
    assert(e.getMessage.contains("object store"), e.getMessage)
    assert(e.getMessage.contains("s3a"), e.getMessage)
  }

  test("an unknown scheme whose dir-rename re-keys the files inside is refused") {
    // the other prescribed mock: a "rename" that moves the directory by
    // copying entries one by one under new names — staged commits would
    // land with a half-visible directory and the bucketed layout's
    // file-name-borne bucket ids would be destroyed
    val dir = java.nio.file.Files.createTempDirectory("fscheck_mg_")
    val path = s"mangle:${dir.toString}"
    val e = intercept[IllegalStateException] {
      FsCommit.requireAtomicCommits(fsFor(path), path, "signature store")
    }
    assert(e.getMessage.contains("preserving the file names"), e.getMessage)
  }

  test("signature-store creation refuses a non-atomic filesystem end to end") {
    hadoopConf // ensure the scheme is registered on the session conf
    FsCommit.resetCache()
    val dir = java.nio.file.Files.createTempDirectory("fscheck_store_")
    val docs = spark.range(4).select(col("id").as("doc_id"),
      concat(lit("text of doc "), col("id")).as("text"))
    val e = intercept[IllegalStateException] {
      TextOps.buildSignatureStore(docs, "doc_id", "text",
        s"norename:${dir.toString}/store", n = 3, numHashes = 16, bands = 4)
    }
    assert(e.getMessage.contains("signature store"), e.getMessage)
    assert(e.getMessage.contains("HDFS-semantics"), e.getMessage)
    // nothing half-committed: the gate fired before any write
    assert(!java.nio.file.Files.exists(dir.resolve("store/batches")),
      "the refusal must precede any store write")
  }

  test("ANN-index creation refuses the object-store shape end to end") {
    hadoopConf
    FsCommit.resetCache()
    val vecs = spark.range(8).select(col("id").as("vec_id"),
      array((0 until 4).map(i => (rand(i) * 2 - 1)): _*).as("embedding"))
    val e = intercept[IllegalStateException] {
      VectorOps.buildPinnedIvfIndex(vecs, "vec_id", "embedding",
        nlist = 2, path = "s3a://some-bucket/index")
    }
    assert(e.getMessage.contains("ANN index"), e.getMessage)
    assert(e.getMessage.contains("object store"), e.getMessage)
  }

  test("compacting a path with NO store stays a pure no-op, even on a " +
      "refused filesystem") {
    // the gate must sit AFTER the no-store early-return: gating first
    // turned a no-op call into a throw (object store) or left probe
    // dirs under a root no store ever used (code-review finding)
    hadoopConf
    FsCommit.resetCache()
    TextOps.compactSignatureStore(spark, "s3a://some-bucket/never-built")
    // and on a refusable-but-probe-backed scheme: nothing written
    val dir = java.nio.file.Files.createTempDirectory("fscheck_noop_")
    TextOps.compactSignatureStore(spark, s"norename:${dir.toString}/none")
    assert(!java.nio.file.Files.list(dir).iterator().hasNext,
      "a no-op compaction must not write anything under the root")
  }

  test("ANN-index RETRACTION refuses the object-store shape too") {
    // the one index mutation the gate initially missed (code-review
    // finding): tombstone appends ride the parquet committer's rename
    hadoopConf
    FsCommit.resetCache()
    val ids = spark.range(3).select(col("id").as("vec_id"))
    val e = intercept[IllegalStateException] {
      VectorOps.deleteFromPinnedIvfIndex(ids, "vec_id",
        "s3a://some-bucket/index")
    }
    assert(e.getMessage.contains("ANN index"), e.getMessage)
  }

  test("the verdict caches per filesystem: a second call does not re-probe") {
    val dir = java.nio.file.Files.createTempDirectory("fscheck_cache_")
    val path = s"probecount:${dir.toString}"
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.probecount.impl", classOf[ProbeCountingFs].getName)
    FsCommit.resetCache()
    ProbeCountingFs.renames.set(0)
    val fs = new HPath(path).getFileSystem(c)
    FsCommit.requireAtomicCommits(fs, path, "signature store")
    val after1 = ProbeCountingFs.renames.get
    assert(after1 >= 1, "first call must run the behavioral probe")
    FsCommit.requireAtomicCommits(fs, path, "signature store")
    assert(ProbeCountingFs.renames.get == after1,
      "second call must hit the cached verdict, not re-write probe files")
  }
}

object FsCommitSuite {
  /** Rename always fails — the "returns false" prescribed mock. */
  final class RenameFalseFs extends RawLocalFileSystem {
    override def getScheme: String = "norename"
    override def getUri: java.net.URI = java.net.URI.create("norename:///")
    override def rename(src: HPath, dst: HPath): Boolean = false
  }

  /** Registered AS s3a: the scheme gate must refuse before any call
    * lands here (data methods never run in the tests). */
  final class FakeS3aFs extends RawLocalFileSystem {
    override def getScheme: String = "s3a"
    override def getUri: java.net.URI = java.net.URI.create("s3a://some-bucket")
  }

  /** Dir-rename as per-entry copy under NEW names — the name-destroying
    * object-store shape the probe's second check catches. */
  final class NameManglingFs extends RawLocalFileSystem {
    override def getScheme: String = "mangle"
    override def getUri: java.net.URI = java.net.URI.create("mangle:///")
    override def rename(src: HPath, dst: HPath): Boolean = {
      val st = getFileStatus(src)
      if (!st.isDirectory) super.rename(src, dst)
      else {
        mkdirs(dst)
        listStatus(src).foreach { child =>
          require(!child.isDirectory, "probe dirs are flat")
          super.rename(child.getPath,
            new HPath(dst, "copy-" + child.getPath.getName))
        }
        delete(src, true)
        true
      }
    }
  }

  object ProbeCountingFs {
    val renames = new java.util.concurrent.atomic.AtomicInteger(0)
  }
  /** Healthy rename (delegates to local), but counts calls so the
    * cache test can see whether a probe ran. */
  final class ProbeCountingFs extends RawLocalFileSystem {
    override def getScheme: String = "probecount"
    override def getUri: java.net.URI =
      java.net.URI.create("probecount:///")
    override def rename(src: HPath, dst: HPath): Boolean = {
      ProbeCountingFs.renames.incrementAndGet()
      super.rename(src, dst)
    }
  }
}
