package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Scratch profiler for d06 phase costs. */
object ProfileD06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "lineitem").count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = Tables.corpus(spark, sfDir)
    val pairs = t("build pairs plan (incl. eager sh cache)") {
      TextOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    }
    val pairsC = t("materialize pairs via cache+count") { val p = pairs.cache(); p.count(); p }
    val edges = t("edges localCheckpoint") {
      val e = pairsC.select(col("id_a").as("__src"), col("id_b").as("__dst"))
        .union(pairsC.select(col("id_b").as("__src"), col("id_a").as("__dst")))
        .localCheckpoint()
      println(s"[prof]   edges=${e.count()}")
      e
    }
    var labels = t("labels init") {
      val l = edges.select(col("__src").as("__v")).distinct()
        .select(col("__v"), col("__v").as("__lbl")).localCheckpoint()
      println(s"[prof]   vertices=${l.count()}")
      l
    }
    var iter = 0
    var converged = false
    while (!converged && iter < 20) {
      val (nxt, changed) = t(s"iter $iter") {
        val propagated = edges.join(labels, edges("__src") === labels("__v"))
          .select(col("__dst").as("__v"), col("__lbl"))
        val next = labels.union(propagated)
          .groupBy("__v").agg(min("__lbl").as("__lbl")).localCheckpoint()
        val ch = next.join(labels.withColumnRenamed("__lbl", "__old"), "__v")
          .where(col("__lbl") =!= col("__old")).count()
        (next, ch)
      }
      println(s"[prof]   changed=$changed")
      labels = nxt
      converged = changed == 0
      iter += 1
    }
    t("final join-back count") {
      docs.select(col("doc_id").as("__v"))
        .join(labels, Seq("__v"), "left")
        .select(col("__v").as("doc_id"),
          coalesce(col("__lbl"), col("__v")).as("cluster_id"))
        .count()
    }
    spark.stop()
  }
}
