package graft.tools

import org.apache.spark.sql.SparkSession

/** Codegen-health sweep: run registry queries with
  * `spark.sql.codegen.fallback=false`, so a whole-stage codegen stage
  * that fails to compile (janino's 64 KB method limit on a huge
  * generated processNext) THROWS instead of silently interpreting the
  * stage. Spark's default fallback keeps results correct but quietly
  * abandons codegen for the stage — at cluster scale that is a large,
  * invisible per-row cost (r15 verdict: three compile failures in the
  * pinned-ANN test region, ~10,850-line processNext, tests all green).
  *
  * Usage: sbt "runMain graft.tools.CodegenSweep [queryName ...]"
  *        (no args = the full registry)
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
  *
  * Prints one line per query (CODEGEN_OK / CODEGEN_FAIL + cause head)
  * and a final summary line; exits nonzero when anything failed.
  */
object CodegenSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    names.foreach { name =>
      val outcome = try {
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        "CODEGEN_OK"
      } catch {
        case e: Throwable =>
          failed ::= name
          val cause = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).toSeq.last
          s"CODEGEN_FAIL ${cause.getClass.getSimpleName}: " +
            Option(cause.getMessage).getOrElse("").linesIterator
              .take(1).mkString.take(140)
      }
      println(s"[codegen] $name $outcome")
    }
    println(s"[codegen] summary: ${names.size - failed.size} ok, " +
      s"${failed.size} failed${
        if (failed.isEmpty) "" else failed.reverse.mkString(" (", ", ", ")")}")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
