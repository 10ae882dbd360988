package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Scratch profiler for round-21 candidates: d20 phase costs and the
  * q03 join-strategy A/B. Dev-only measurement harness (guide §1).
  */
object ProfileR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "lineitem").count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val what = args.headOption.getOrElse("d20")
    what match {
      case "d20" =>
        val docs = Tables.corpus(spark, sfDir)
        // phase 1: raw shingleSites compute (no cache)
        val shRaw = TextOps.shingleSites(docs, "doc_id", "text", 16)
        (1 to 2).foreach { r =>
          t(s"rep$r shingleSites noop (uncached)") {
            shRaw.write.format("noop").mode("overwrite").save()
          }
        }
        println(s"[prof] sh rows = ${shRaw.count()}")
        (1 to 2).foreach { r =>
          spark.catalog.clearCache()
          val sh = shRaw.cache()
          t(s"rep$r sh cache build (count)") { sh.count() }
          val dup = sh.groupBy("h").agg(count(lit(1)).as("__c"))
            .where(col("__c") >= 2).select("h")
          t(s"rep$r dup agg over cache (count)") { dup.count() }
          val sites = sh.join(dup, "h").select("doc_id", "pos")
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("pos")
          val islands = sites
            .withColumn("__brk",
              when(col("pos") - lag("pos", 1).over(w) <= 16, 0L).otherwise(1L))
            .withColumn("__grp", sum("__brk").over(w))
            .groupBy("doc_id", "__grp")
            .agg(min("pos").as("__lo"), max("pos").as("__hi"))
          t(s"rep$r probe join + islands from warm cache") {
            islands.write.format("noop").mode("overwrite").save()
          }
          spark.catalog.clearCache()
          t(s"rep$r full d20 cold (registered)") {
            graft.SparkEntry.queries("d20_dup_substring_spans")(spark, sfDir).count()
          }
        }
      case "q03" =>
        val c = Tables(spark, sfDir, "customer")
        val o = Tables(spark, sfDir, "orders")
        val l = Tables(spark, sfDir, "lineitem")
        def money(cn: String) = col(cn).cast("decimal(12,2)")
        def f1(cn: String) = (lit(1.0) - col(cn)).cast("decimal(12,2)")
        def q(hint: Boolean) = {
          val perOrder = l.groupBy(col("l_orderkey"))
            .agg(sum(money("l_extendedprice") * f1("l_discount")).as("__rev"))
          val oSide = if (hint) o.hint("shuffle_hash") else o
          perOrder.join(oSide, col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(c), col("o_custkey") === col("c_custkey"))
            .groupBy(col("c_custkey"), col("c_name"))
            .agg(sum(col("__rev")).cast("double").as("revenue"))
            .orderBy(col("revenue").desc, col("c_custkey"))
            .limit(10)
        }
        (1 to 4).foreach { r =>
          t(s"rep$r q03 SMJ (current)") { q(hint = false).count() }
          t(s"rep$r q03 SHUFFLE_HASH") { q(hint = true).count() }
        }
        q(hint = true).explain("formatted")
      case "p34" =>
        // verdict item 5: A/B the one-tokenize-pass per-(doc,token)
        // counted variant of domainPerDocLoss against the registered
        // two-tokenize-pass shape, at sf5.0 (the sf0.1 A/B already
        // failed for p33's analogous restructure). Both produce the
        // identical perdoc frame; only the pass/shuffle trade differs:
        //   current: tokenize x2, exchange A = vocab partials (uni),
        //            exchange B = per-doc partials;
        //   variant: tokenize x1, dt = groupBy(id,dom,token) exchange
        //            carrying ~token-count rows, uni + perdoc from dt.
        val docs = Tables.corpus(spark, sfDir)
        def variant(): org.apache.spark.sql.DataFrame = {
          val toks = docs.where(col("text").isNotNull)
            .select(col("doc_id").as("__id"), col("source").as("__dom"),
              explode(TextOps.tokens(col("text"))).as("__t"))
          val dt = toks.groupBy(col("__id"), col("__dom"), col("__t"))
            .agg(count(lit(1)).as("__k"))
          val uni = dt.groupBy(col("__t")).agg(sum(col("__k")).as("__c"))
          val total = uni.agg(sum(col("__c")).as("__n"))
          val perdoc = dt
            .join(broadcast(uni), Seq("__t"))
            .crossJoin(broadcast(total))
            .select(col("__id"), col("__dom"), col("__k"),
              floor(-log(col("__c").cast("double") / col("__n").cast("double"))
                * 10000.0 + 0.5).cast("long").as("__nats4"))
            .groupBy(col("__id"), col("__dom"))
            .agg(floor(sum(col("__nats4") * col("__k")).cast("double") /
              sum(col("__k")) + 0.5).cast("long").as("mean_nats4"))
          perdoc
        }
        (1 to 3).foreach { r =>
          spark.catalog.clearCache()
          t(s"rep$r p34 registered (two tokenize passes)") {
            graft.SparkEntry.queries("p34_domain_reweight")(spark, sfDir).count()
          }
          t(s"rep$r perdoc VARIANT (one pass, dt counts) noop") {
            variant().write.format("noop").mode("overwrite").save()
          }
          t(s"rep$r perdoc CURRENT shape noop") {
            val toks = docs.where(col("text").isNotNull)
              .select(col("doc_id").as("__id"), col("source").as("__dom"),
                explode(TextOps.tokens(col("text"))).as("__t"))
            val uni = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
            val total = uni.agg(sum(col("__c")).as("__n"))
            toks.join(broadcast(uni), Seq("__t"))
              .crossJoin(broadcast(total))
              .select(col("__id"), col("__dom"),
                floor(-log(col("__c").cast("double") / col("__n").cast("double"))
                  * 10000.0 + 0.5).cast("long").as("__nats4"))
              .groupBy(col("__id"), col("__dom"))
              .agg(floor(sum(col("__nats4")).cast("double") / count(lit(1)) + 0.5)
                .cast("long").as("mean_nats4"))
              .write.format("noop").mode("overwrite").save()
          }
        }
      case "d02ab" =>
        // attribute the sf5.0 d02 delta vs the r20 artifact: current
        // tree (distinct-kill + freq cache + release) vs the r20-era
        // pre-distinct shape vs the freq-uncached (guard-off) shape.
        val docs = Tables.corpus(spark, sfDir)
        def release(sh: org.apache.spark.sql.DataFrame,
            freq: Option[org.apache.spark.sql.DataFrame]): Unit = {
          sh.unpersist(); freq.foreach(_.unpersist())
        }
        (1 to 3).foreach { r =>
          spark.catalog.clearCache()
          t(s"rep$r E2 current registered (guard on, freq cached, no pre-distinct)") {
            graft.SparkEntry.queries("d02_ngram_jaccard")(spark, sfDir).count()
          }
          spark.catalog.clearCache()
          t(s"rep$r E2-norelease (lazy twin, count only)") {
            TextOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
              releaseCaches = false).count()
          }
          spark.catalog.clearCache()
          t(s"rep$r E1 pre-verify distinct (freq cached)") {
            val sh = TextOps.hashedShingleSets(docs, "doc_id", "text", 3).cache()
            sh.count()
            val (cands, freq) = TextOps.prefixCandidatesAndFreq(sh, 0.5)
            val n = TextOps.verifyJaccard(sh, cands.distinct(), 0.5).count()
            release(sh, freq)
            n
          }
          spark.catalog.clearCache()
          t(s"rep$r E0' guard OFF (freq uncached, no guard job, no pre-distinct)") {
            spark.conf.set(TextOps.PpjoinGuardKey, "off")
            try TextOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
              releaseCaches = false).count()
            finally spark.conf.unset(TextOps.PpjoinGuardKey)
          }
        }
      case "t09" =>
        // A/B: explode + two aggregations (registered) vs a per-row
        // sorted-run fold (array_sort + one aggregate HOF) that never
        // shuffles token rows at all.
        val docs = Tables.corpus(spark, sfDir)
        def r4(c: org.apache.spark.sql.Column) =
          floor(c * 10000.0 + 0.5) / 10000.0
        def variant() = {
          val srt = array_sort(TextOps.tokens(col("text")))
          val acc0 = struct(lit("").as("prev"), lit(0L).as("run"),
            lit(0L).as("maxr"), lit(0L).as("dup"))
          def fld(a: org.apache.spark.sql.Column, n: String) = a.getField(n)
          val folded = aggregate(
            srt, acc0,
            (a, x) => {
              val same = fld(a, "run") > 0 && (x <=> fld(a, "prev"))
              struct(x.as("prev"),
                when(same, fld(a, "run") + 1L).otherwise(lit(1L)).as("run"),
                when(same, fld(a, "maxr"))
                  .otherwise(greatest(fld(a, "maxr"), fld(a, "run"))).as("maxr"),
                when(same, fld(a, "dup"))
                  .otherwise(fld(a, "dup") +
                    when(fld(a, "run") >= 2L, fld(a, "run")).otherwise(0L)).as("dup"))
            },
            a => struct(
              greatest(fld(a, "maxr"), fld(a, "run")).as("top_c"),
              (fld(a, "dup") +
                when(fld(a, "run") >= 2L, fld(a, "run")).otherwise(0L)).as("dup_c")))
          docs.where(TextOps.tokens(col("text")).isNotNull)
            .select(col("doc_id"),
              size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
              folded.as("__f"))
            .select(col("doc_id"), col("n_tokens"),
              r4(col("__f.top_c").cast("double") / col("n_tokens")).as("top_token_frac"),
              r4(col("__f.dup_c").cast("double") / col("n_tokens")).as("dup_token_frac"),
              (col("__f.top_c") * 5 >= col("n_tokens")).as("repetitive"))
            .orderBy("doc_id")
        }
        (1 to 4).foreach { r =>
          spark.catalog.clearCache()
          t(s"rep$r t09 registered (explode + 2 aggs)") {
            graft.SparkEntry.queries("t09_repetition")(spark, sfDir).count()
          }
          t(s"rep$r t09 sorted-run fold (no token shuffle)") {
            variant().count()
          }
        }
        // cross-check the two produce identical rows
        val a = graft.SparkEntry.queries("t09_repetition")(spark, sfDir)
        val b = variant()
        val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        println(s"[prof] t09 variant row diff = $diff (must be 0)")
      case other => sys.error(s"unknown profile target $other")
    }
    spark.stop()
  }
}
