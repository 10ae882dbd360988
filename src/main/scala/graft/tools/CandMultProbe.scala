package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{DeletionSigs, TextOps}

/** Measurement probe for the candidate-pair `.distinct()` question
  * (r20 verdict item 1): for each PPJoin-family candidate generator,
  * count the RAW matched pair rows the bucket join emits versus the
  * DISTINCT pairs the downstream verify needs — the duplicate
  * multiplicity decides whether the pre-verify distinct (a full
  * shuffle of the pair stream) is cheaper than verifying duplicates
  * and deduping the (far smaller) verified output.
  *
  *   sbt "runMain graft.tools.CandMultProbe"   # SPARK_GRAFT_SF_DIR
  */
object CandMultProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(what: String, raw: Long, dist: Long): Unit =
      println(f"[candmult] $what: raw=$raw%,d distinct=$dist%,d " +
        f"multiplicity=${raw.toDouble / math.max(1L, dist)}%.2f")

    val docs = graft.Tables.corpus(spark, sfDir)

    // ---- d02/d06/p01 shape: PPJoin prefix join at t=0.5, n=3 ----------
    {
      val t = 0.5
      val sh = TextOps.hashedShingleSets(docs, "doc_id", "text", 3).cache()
      sh.count()
      val freq = TextOps.shingleFreq(sh).cache()
      val ex = sh.select(col("__id"), size(col("__sh")).as("__n"),
        explode(col("__sh")).as("__s"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__id")).orderBy(col("__df"), col("__s"))
      val prefix = ex.join(freq, col("__s") === col("__sf"))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= col("__n") - ceil(lit(t) * col("__n")) + 1)
        .select(col("__id"), col("__n"), col("__s"), col("__rk"))
      val idxLen = col("__n") - ceil(lit(2 * t / (1 + t)) * col("__n")) + 1
      val probe = prefix.select(col("__id").as("id_p"), col("__n").as("n_p"),
        col("__s").as("__s_p"), col("__rk").as("rk_p"))
      val index = prefix.where(col("__rk") <= idxLen)
        .select(col("__id").as("id_i"), col("__n").as("n_i"),
          col("__s").as("__s_i"), col("__rk").as("rk_i"))
      val needed = ceil(lit(t / (1 + t)) * (col("n_p") + col("n_i")))
      val ubound = least(col("rk_p"), col("rk_i")) - 1 + lit(1) +
        least(col("n_p") - col("rk_p"), col("n_i") - col("rk_i"))
      val rawPairs = probe.join(index,
        col("__s_p") === col("__s_i") &&
          (col("n_i") < col("n_p") ||
            (col("n_i") === col("n_p") && col("id_i") < col("id_p"))) &&
          col("n_i") >= lit(t) * col("n_p") &&
          ubound >= needed)
        .select(least(col("id_p"), col("id_i")).as("id_a"),
          greatest(col("id_p"), col("id_i")).as("id_b"))
      report("d02 ppjoin t=0.5", rawPairs.count(), rawPairs.distinct().count())
      freq.unpersist(); sh.unpersist()
    }

    // ---- d16 shape: containment candidates at t=0.8, n=3 --------------
    {
      val t = 0.8
      val sh = TextOps.hashedShingleSets(docs, "doc_id", "text", 3).cache()
      sh.count()
      val freq = TextOps.shingleFreq(sh).cache()
      val ex = sh.select(col("__id"), size(col("__sh")).as("__n"),
        explode(col("__sh")).as("__s"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__id")).orderBy(col("__df"), col("__s"))
      val probe = ex.join(freq, col("__s") === col("__sf"))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= ceil(lit(1 - t) * col("__n")) + 1)
        .select(col("__id").as("id_a"), col("__n").as("n_a"),
          col("__s").as("__s_p"))
      val index = ex.select(col("__id").as("id_b"), col("__n").as("n_b"),
        col("__s").as("__s_i"))
      val tPm = math.ceil(t * 1000).toLong
      val raw = probe.join(index,
        col("__s_p") === col("__s_i") && col("id_a") =!= col("id_b") &&
          col("n_b").cast("long") * 1000L >= lit(tPm) * col("n_a").cast("long"))
        .select("id_a", "id_b")
      report("d16 containment t=0.8", raw.count(), raw.distinct().count())
      freq.unpersist(); sh.unpersist()
    }

    // ---- d07 shape: deletion-signature join --------------------------
    {
      val base = graft.Tables(spark, sfDir, "customer")
        .select(col("c_custkey").as("__id"), col("c_name").as("__s"))
      val sigs = base.select(col("__id"),
        explode(DeletionSigs.column(spark, col("__s"))).as("__h")).cache()
      sigs.count()
      val a = sigs.select(col("__id").as("id_a"), col("__h").as("__h_a"))
      val b = sigs.select(col("__id").as("id_b"), col("__h").as("__h_b"))
      val raw = a.join(b, col("__h_a") === col("__h_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      report("d07 deletion-sig", raw.count(), raw.distinct().count())
      sigs.unpersist()
    }

    // ---- d03 shape: minhash band-bucket join (128 hashes, 32 bands) ---
    {
      val sh = TextOps.hashedShingleSets(docs, "doc_id", "text", 3)
      val cands = TextOps.minHashCandidatesFromHashed(sh, 128, 32)
      // minHashCandidatesFromHashed distincts internally; recount raw by
      // replicating the band join
      val sig = sh.select(col("__id"),
        graft.functions.MinHashSig.column(spark, col("__sh"), 128).as("__sig"))
        .select(col("__id"), TextOps.lshBandKeys(col("__sig"), 32, 4).as("__bands"))
        .cache()
      sig.count()
      val ex = sig.select(col("__id"), posexplode(col("__bands")).as(Seq("__b", "__key")))
      val l = ex.select(col("__id").as("id_a"), col("__b"), col("__key"))
      val rt = ex.select(col("__id").as("id_b"), col("__b"), col("__key"))
      val raw = l.join(rt, Seq("__b", "__key"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      report("d03 minhash bands", raw.count(), raw.distinct().count())
      sig.unpersist()
      cands.unpersist()
    }

    spark.stop()
  }
}
