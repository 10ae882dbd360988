package graft

import graft.tools.PlanLint

/** Registry-wide scale-discipline audit: every query's optimized plan
  * is linted for cross joins between multi-row sides, unpartitioned
  * windows, and non-root global sorts. Violations must appear in the
  * explicit allowlist below WITH a justification, or the suite fails —
  * new queries get audited by construction. */
class PlanLintSuite extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** query -> rules it may violate, each entry a documented exception. */
  private val allowed: Map[String, Set[String]] = Map(
    // quadratic-by-design exactness baselines, labeled `baseline` and
    // excluded from the headline bench
    "d05_embedding_dedup" -> Set("cross-join"),
    "s01_ann_bruteforce" -> Set("cross-join"),
    // brute-force arms over a `vec_id < k` query slice: the optimizer
    // can't see the slice is tiny (maxRows unknown after a filter), but
    // the broadcast side is bounded by the literal predicate
    "s08_ann_filtered" -> Set("cross-join"),
    "s09_hybrid_rrf" -> Set("cross-join"),
    "s10_ann_sq8" -> Set("cross-join"),
    // PQ scans every (vector, centroid) code pair by design; s05 bounds
    // it with the IVF shortlist — the pair scan survives in the plan
    "s04_ann_pq" -> Set("cross-join"),
    "s05_ann_ivfpq" -> Set("cross-join"),
    // the pinned-codebook gate variant shares s04's ADC pair scan
    "s12_ann_pq_pinned" -> Set("cross-join"),
    "d09_semantic_dedup" -> Set("cross-join"),
    "s03_ann_ivf" -> Set("cross-join"),
    // the sqrt-scale centroid assignment: every vector scored against
    // the BROADCAST centroid-code frame (n·nlist rows, the join-based
    // replacement for nlist codegen'd literal arrays); the second
    // condition-less join is the same shape inside the pinned SQ8
    // scale pass — both sides bounded by the broadcast
    "d27_semantic_dedup_scaled" -> Set("cross-join"),
    // p32 rides the SAME sqrt-scale broadcast assignment as d27 (every
    // vector scored against the broadcast centroid-code frame — the
    // join-based replacement for literal arrays); its second
    // condition-less join is the same shape in the SQ8 encode pass
    "p32_cluster_select_scaled" -> Set("cross-join"),
    // kmeans assignment joins each vector to every sampled centroid
    "d12_cluster_reps" -> Set("cross-join"),
    "s06_user_similarity" -> Set("cross-join"),
    // mm-series: banded joins carry no equi-condition the optimizer
    // recognizes after the explode; bounded by band-bucket population
    "mm03_image_neardup" -> Set("cross-join"),
    "mm04_audio_neardup" -> Set("cross-join"),
    "mm05_media_embed_ann" -> Set("cross-join"),
    "mm06_media_sq8" -> Set("cross-join"),
    // sketch-sized post-aggregation: the windows/sorts run over the
    // FIXED 4096-bin histogram (p13) / depth x width counter grid (t08)
    // — input cardinality is a constant of the sketch, not of the data
    "p13_histogram_quantiles" -> Set("global-window", "inner-global-sort"),
    "t08_heavy_hitters" -> Set("inner-global-sort"),
    // the lang-dimension fan-out: a <=5-row distinct-lang table crossed
    // into test tokens — the NB scoring shape; the optimizer can't
    // bound a post-aggregation distinct, so maxRows is unknown
    "t20_nb_classify" -> Set("cross-join"),
    // the FIXED 10-row checkpoint ladder broadcast against the
    // first-position table — a literal LocalRelation, multi-row by
    // design but constant at any corpus size
    "t21_vocab_growth" -> Set("cross-join"),
    // the hour spine x distinct event types gap-fill fan-out: spine
    // length is bounded by the TIME RANGE (not the event count) and
    // the type table is a bounded dimension; the optimizer can't see
    // either bound post-aggregation, so the broadcast cross join is
    // deliberate (every (hour, type) cell must exist to fill gaps)
    "q45_gapfill_ma" -> Set("cross-join"),
    // the FIXED 2-row query-box dimension broadcast against the bucket
    // stats — a literal LocalRelation, constant at any corpus size
    "p21_zorder_skipping" -> Set("cross-join"),
    // the suffix-sum window runs over the CAPPED threshold-bucket
    // histogram (<= 21 rows by construction at any corpus size)
    "p26_threshold_curve" -> Set("global-window"),
    // the global-CDF window runs over the VALUE HISTOGRAM aggregate
    // (cardinality = distinct score values, not docs — the p13/p19
    // sketch-window argument); per-source CDFs are ordered-frame windows
    // over the same histogram and don't trip the linter
    "p25_quantile_normalize" -> Set("global-window"),
    // the suffix-min window runs over the per-size min-price AGGREGATE,
    // whose cardinality is the p_size domain (<= 50 rows at any corpus
    // size) — the p13 sketch-window argument; the data-sized side only
    // ever sees a broadcast join
    "q50_skyline" -> Set("global-window"),
  )

  test("skewed-window rule fires on t23's pre-r9 shape (min over a gram window)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.corpus(spark, sf)
    val grams = docs
      .select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("gram")).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    val old = grams.withColumn("first_doc", min(col("doc_id")).over(w))
    assert(PlanLint.lint(old).exists(_.rule == "skewed-window"),
      "the de-skewed rule must catch a whole-partition min over a string key")
    // the same skew behind a hash: keying the window by xxhash64(gram)
    // (a long) carries the identical hot partition — the rule must not
    // be evadable by re-typing the key
    val hashed = grams.select(xxhash64(col("gram")).as("g"), col("doc_id"))
    val wh = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val oldHashed = hashed.withColumn("first_doc", min(col("doc_id")).over(wh))
    assert(PlanLint.lint(oldHashed).exists(_.rule == "skewed-window"),
      "the skew rule must catch whole-partition frames on non-string keys too")
    // the ordered-frame per-source rank (bounded dimension) must NOT trip it
    val ranked = docs.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("doc_id"))))
    assert(!PlanLint.lint(ranked).exists(_.rule == "skewed-window"))
  }

  test("every registry query passes the plan lint (or is an allowed, documented exception)") {
    val failures = Seq.newBuilder[String]
    for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val vs =
        try PlanLint.lint(q(spark, sf))
        catch { case e: Throwable => failures += s"$name: lint threw $e"; Nil }
      val ok = allowed.getOrElse(name, Set.empty)
      val bad = vs.filterNot(v => ok.contains(v.rule))
      if (bad.nonEmpty)
        failures += s"$name:\n  ${bad.mkString("\n  ")}"
      spark.catalog.clearCache()
    }
    val f = failures.result()
    assert(f.isEmpty, s"${f.size} queries violate the plan lint:\n${f.mkString("\n")}")
  }
}
