package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: times the headline query set (SparkEntry.benchQueries)
  * on SPARK_GRAFT_SF_DIR and prints one JSON line. A warmup query runs
  * first so JIT/codegen cost doesn't land on the first measured query;
  * each query is executed with count() so the full plan runs but
  * nothing is materialized on the driver.
  *
  * Trustworthiness machinery (this host shows rare bimodal ~2-minute
  * stalls on a single query — timeout-shaped, not load/GC/steal):
  *  - per-query best-known floors persist across runs in BENCH_floor.json
  *    (keyed by sf dir basename); each run takes min(measured, prior runs)
  *    as the floor and tightens the file;
  *  - outliers (>3x median, or >3x their own persisted floor) are
  *    re-timed ONCE after a cooldown (default 30s) so the retry doesn't
  *    land in the same polluted window;
  *  - the emitted JSON carries both `first_pass_total` (untouched
  *    single-run measurement) and `value` (best-of total), so the
  *    headline is auditable against the raw pass;
  *  - the JSON self-marks `"suspect":true` with reasons when loadavg
  *    exceeds cores*1.5 or any final headline timing is still >3x its
  *    persisted floor — a polluted artifact must say so in-band, not
  *    on stderr.
  */
object Bench {
  private val FloorFile = "BENCH_floor.json"

  /** Flat {"sf0.1/q01":1.234,...} map; hand-rolled format we control, so
    * a regex parse is exact (no JSON lib dependency drift). */
  private def loadFloors(): Map[String, Double] = {
    val f = new java.io.File(FloorFile)
    if (!f.isFile) Map.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      """"([^"]+)":([0-9.eE+-]+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  private def saveFloors(floors: Map[String, Double]): Unit = {
    val body = floors.toSeq.sorted
      .map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(FloorFile), body.getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfKey = new java.io.File(sfDir).getName
    val cooldownSec = sys.env.getOrElse("SPARK_GRAFT_COOLDOWN_SEC", "30").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT + codegen + parquet footer reads off the clock
    Tables(spark, sfDir, "lineitem").count()
    Tables(spark, sfDir, "orders").count()

    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadAvg

    // a failed query must be visible, not a fast-looking timing: it is
    // reported as -1 and excluded from the total, with its name listed
    def time(names: Seq[String]): Seq[(String, Double)] = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache() // isolate queries: no cross-query cache reuse
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")

    val priorFloors = loadFloors()
    def floorOf(name: String): Option[Double] = priorFloors.get(s"$sfKey/$name")

    // headline = scale-path queries; the deliberately-quadratic exactness
    // baselines (d05/s01) are timed too but labeled separately so the
    // headline number reflects the algorithms meant to run at 100 TB.
    val firstPass = time(SparkEntry.benchQueries)
    val firstTotal = firstPass.map(_._2).filter(_ >= 0).sum
    val med = {
      val ok = firstPass.map(_._2).filter(_ >= 0).sorted
      if (ok.isEmpty) 0.0 else ok(ok.length / 2)
    }
    def isOutlier(name: String, v: Double): Boolean =
      v > math.max(5.0, 3 * med) ||
        floorOf(name).exists(fl => v > math.max(5.0, 3 * fl))
    // up to TWO retry rounds, each behind its own cooldown, re-timing
    // only queries whose best-so-far is still outlier-shaped: this host's
    // stall windows can outlive one cooldown (observed: first retry of a
    // 7s query still at 280s), and a second widely-spaced sample is the
    // difference between a believable artifact and a poisoned gate
    var best = firstPass.toMap
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    firstPass.foreach { case (n, v) => samples(n) = Vector(v) }
    var pending = firstPass.collect {
      case (n, v) if v >= 0 && isOutlier(n, v) => n
    }
    var round = 0
    while (pending.nonEmpty && round < 2) {
      System.err.println(s"[bench] ${pending.size} outlier(s); cooling " +
        s"down ${cooldownSec}s before re-timing (round ${round + 1})")
      System.gc()
      Thread.sleep(cooldownSec * 1000L)
      pending.foreach { n =>
        val v2 = time(Seq(n)).head._2
        samples(n) = samples(n) :+ v2
        if (v2 >= 0 && v2 < best(n)) best = best.updated(n, v2)
      }
      pending = pending.filter(n => isOutlier(n, best(n)))
      round += 1
    }
    val retried: Map[String, Vector[Double]] =
      samples.filter(_._2.length > 1).toMap
    val results = firstPass.map { case (name, _) => name -> best(name) }
    val baselines = time(SparkEntry.baselineQueries)
    val loadEnd = loadAvg
    val cores = Runtime.getRuntime.availableProcessors()

    // tighten persisted floors with this run's measurements (all queries)
    val measured = (results ++ baselines).filter(_._2 >= 0)
    val newFloors = measured.foldLeft(priorFloors) { case (acc, (name, v)) =>
      val k = s"$sfKey/$name"
      acc.updated(k, acc.get(k).fold(v)(math.min(_, v)))
    }
    try saveFloors(newFloors)
    catch { case e: Exception =>
      System.err.println(s"[bench] could not persist floors: ${e.getMessage}") }

    // in-band pollution marking: the driver's gate must see a believable
    // number or an explicit suspect flag, never silently-garbage timings
    val loadSuspect = math.min(loadStart, loadEnd) > cores * 1.5
    val slowVsFloor = results.filter { case (name, v) =>
      v >= 0 && floorOf(name).exists(fl => v > math.max(5.0, 3 * fl))
    }.map(_._1)
    val suspect = loadSuspect || slowVsFloor.nonEmpty
    val reasons =
      (if (loadSuspect) Seq(f"loadavg ${math.min(loadStart, loadEnd)}%.1f > ${cores * 1.5}%.1f") else Nil) ++
        slowVsFloor.map(n => s"$n >3x floor")

    val failed = (results ++ baselines).filter(_._2 < 0).map(r => "\"" + r._1 + "\"")
      .mkString("[", ",", "]")
    // best-known-clean numbers IN the artifact: when this run's window is
    // polluted, the floors are the auditable isolated-run truth (each one
    // is a real min-across-runs measurement from BENCH_floor.json)
    val floorResults = results.map { case (name, v) =>
      name -> floorOf(name).fold(v)(fl => if (v >= 0) math.min(v, fl) else fl)
    }
    val floorTotal = floorResults.map(_._2).filter(_ >= 0).sum
    val total = results.map(_._2).filter(_ >= 0).sum
    val baseTotal = baselines.map(_._2).filter(_ >= 0).sum
    val retriedJson = retried.map { case (k, vs) =>
      "\"" + k + "\":" + vs.map(v => f"$v%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val reasonsJson = reasons.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","first_pass_total":$firstTotal%.3f,"floor_total":$floorTotal%.3f,"suspect":$suspect,"suspect_reasons":$reasonsJson,"queries":${json(results)},"query_floors":${json(floorResults)},"baseline_queries":${json(baselines)},"baseline_total":$baseTotal%.3f,"retried":$retriedJson,"failed":$failed,"loadavg":{"start":$loadStart%.2f,"end":$loadEnd%.2f},"sf":"$sfDir"}""")
    spark.stop()
  }
}
