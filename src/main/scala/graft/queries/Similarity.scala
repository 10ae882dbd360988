package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the embedding corpus:
  * brute-force cosine top-k as the exactness baseline (oracle-checked)
  * and a hyperplane-LSH bucketed variant as the scale path (rows-only;
  * recall vs the baseline is asserted in ScalaTest).
  *
  * The emitted columns are ids/ranks only — cosine *values* stay
  * internal so cross-engine float accumulation noise (~1e-13) cannot
  * break the hash compare; rank stability was data-checked (min
  * adjacent-cosine gap within top-k ~ 1.4e-6, six orders above the
  * noise floor).
  */
object Similarity {

  /** Shared oracle prelude for the pinned-model gates: the SQ8 coding
    * CTEs (identical to s10's — integer-valued codes whose dot products
    * are exact in doubles, the property that lets these oracles replay
    * VALUES). `coded` = (vec_id, code list); `selfd` adds the code
    * norm. */
  private val sq8CodedSql = """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), m AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS mx
          FROM v
        ), coded AS (
          SELECT vec_id,
                 list_transform(v, x -> floor(x /
                   (CASE WHEN mx = 0.0 THEN 1.0 ELSE mx END) * 127 + 0.5)) AS c
          FROM m
        ), selfd AS (
          SELECT vec_id, c, sqrt(list_dot_product(c, c)) AS n FROM coded
        )"""

  /** The pinned-IVF oracle with the corpus restricted to `survivorSql`
    * (a predicate over `d.vec_id`): the codebook stays the 16 lowest-id
    * vectors, only the ASSIGNED corpus shrinks — exactly what an index
    * delete does, which is how s21 shares this machinery. */
  private[queries] def ivfPinnedOracleOver(survivorSql: String): String = s"""
        $sq8CodedSql,
        cent AS (SELECT vec_id AS cid, c AS cc FROM coded WHERE vec_id < 16),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT d.vec_id, ct.cid,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id
                     ORDER BY list_dot_product(d.c, ct.cc) DESC, ct.cid) AS rn
            FROM coded d CROSS JOIN cent ct
            WHERE $survivorSql) t WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cid FROM (
            SELECT d.vec_id, ct.cid,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id
                     ORDER BY list_dot_product(d.c, ct.cc) DESC, ct.cid) AS rn
            FROM coded d CROSS JOIN cent ct WHERE d.vec_id < 20) t
          WHERE rn <= 6),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 list_dot_product(q.c, x.c) / (q.n * x.n) AS cos
          FROM probes p
          JOIN assign a ON a.cid = p.cid AND a.vec_id != p.query_id
          JOIN selfd q ON q.vec_id = p.query_id
          JOIN selfd x ON x.vec_id = a.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""

  private[queries] lazy val ivfPinnedOracle: String =
    ivfPinnedOracleOver("TRUE")

  /** Per-JVM memo of built index roots: the s18/s19/s20 lambdas run a
    * real build/append/compact into a temp dir, and registry-wide
    * passes (PlanLintSuite, plan audits, bench loops) construct every
    * query repeatedly — without the memo each construction would re-run
    * 2-3 corpus-sized write jobs and leak another temp dir. Keyed by
    * (variant, sfDir); Verify runs in a fresh JVM per gate, so the gate
    * always exercises a cold build. */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def cachedIndex(key: String)(build: String => Unit): String =
    indexCache.computeIfAbsent(key, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_index_").toString
      build(p)
      p
    })

  val defs: Seq[QueryDef] = Seq(

    // ---- s01: exact brute-force cosine top-k ------------------------------
    QueryDef(
      "s01_ann_bruteforce",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val queries = emb.where(col("vec_id") < 20)
        VectorOps.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])) AS cos
          FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
          WHERE q.vec_id < 20
        ), ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""),
      bench = true,
      baseline = true), // corpus×queries brute force; s02 is the scale path

    // ---- s02: hyperplane-LSH bucketed near-neighbor pairs (scale path;
    // hash-derived projections are not oracle-expressible) -----------------
    QueryDef(
      "s02_ann_lsh",
      (s, d) =>
        // bits=8/bands=32 (codegen HyperplaneSig — one loop, not 256
        // expressions): random-pair collision 1-(1-2^-8)^32 ≈ 12% of all
        // pairs vs ~40% at the old bits=4/bands=8, with recall ≥ 0.5 on
        // the planted cos∈[0.40,0.51] pairs (pinned in DedupOpsSuite
        // together with the candidate-count prune). This threshold (0.4)
        // is a hard LSH regime — per-bit collision ~0.63 — so bands, not
        // bits, carry the recall; real near-dup corpora (cos ≥ 0.9) get
        // a far sharper prune from the same operator.
        VectorOps.lshCosinePairs(Tables(s, d, "embeddings"),
            "vec_id", "embedding", bits = 8, bands = 32, threshold = 0.4)
          .select(col("id_a"), col("id_b"))
          .orderBy("id_a", "id_b"),
      None,
      bench = true),

    // ---- s07: SHARP-regime LSH near-dup pairs — the production shape.
    // s02 deliberately demonstrates the hard t=0.4 regime (per-bit
    // collision ~0.63, so its candidate set is a constant ~12% fraction
    // of all pairs); real near-dup corpora dedup at cos >= 0.85, where
    // the hyperplane model prunes SHARPLY. Parameters are derived from
    // the threshold by lshParamsFor (t=0.85 -> bits=15/bands=54: recall
    // >= 0.95, expected random-pair candidate fraction ~0.16% — a
    // vanishing fraction of n², not a constant one). The corpus gets
    // deterministic planted cos≈0.93 copies so the >= 0.85 pair set is
    // non-empty; recall >= 0.9 vs the exact pair set and the <= 0.5%
    // candidate fraction are pinned in DedupOpsSuite. Rows-only
    // (hash-derived hyperplane signs are not oracle-expressible).
    //
    // Bench note: at gate scale (2k vectors) the d05 quadratic baseline
    // is still *absolutely* fast (4M pairs) and s07's time is sketch
    // overhead, so wall-clock alone doesn't show the win here — the
    // scale evidence is the WORK bound: d05 scores n(n-1)/2 pairs
    // always; s07 scores <= 0.5% of them (suite-pinned), so the
    // crossover arrives within one order of magnitude of corpus growth
    // and at 100x the quadratic term is 10^4 larger while s07 stays
    // near-linear.
    QueryDef(
      "s07_ann_lsh_sharp",
      (s, d) => {
        val (bits, bands) = VectorOps.lshParamsFor(
          threshold = 0.85, targetRecall = 0.95, maxCandidateFrac = 0.002)
        val corpus = VectorOps.plantNearDuplicates(
          Tables(s, d, "embeddings"), "vec_id", "embedding",
          count = 100, idOffset = 1000000L, eps = 0.4)
        VectorOps.lshCosinePairs(corpus, "vec_id", "embedding",
            bits, bands, threshold = 0.85)
          .select(col("id_a"), col("id_b"))
          .orderBy("id_a", "id_b")
      },
      None,
      bench = true),

    // ---- s03: IVF (kmeans-bucketed) top-k — the probe-limited scale
    // path; kmeans is not oracle-expressible, recall pinned in ScalaTest
    QueryDef(
      "s03_ann_ivf",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        // nprobe=6/16: the synthetic corpus is zero-centered uniform (no
        // cluster structure — the hardest IVF regime, every neighbor a
        // near-tie), so recall needs wider probes than a clustered corpus
        // would: measured 0.58@nprobe=4 vs 0.68-0.73@nprobe=6 at
        // sf0.01/sf0.1. The sf-parameterized guard in DedupOpsSuite pins
        // recall >= 0.65 at BOTH gate scales with these exact parameters.
        VectorOps.ivfTopK(
            emb.where(col("vec_id") < 20), emb, "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 6)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      None,
      bench = true),

    // ---- s04: product-quantization ANN (compressed-scan path) ------------
    // 8 sub-spaces x 16 codes = 8 bytes/vector (32x smaller than the
    // float vectors); first pass scans only codes via per-query lookup
    // tables, exact cosine re-ranks the 8k-row shortlist. Rows-only (kmeans
    // codebooks are not DuckDB-expressible); recall vs s01 and encode
    // determinism pinned in DedupOpsSuite.
    QueryDef(
      "s04_ann_pq",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        // refine=32 (1.6% of the sf0.1 corpus): 8-byte codes rank
        // near-tie neighbors coarsely on this structureless corpus, so
        // the exact re-rank needs a deeper shortlist — measured
        // 0.46@refine=8 vs 0.79-0.93@refine=32 across gate scales; the
        // DedupOpsSuite guard pins recall >= 0.75 at both.
        VectorOps.pqTopK(
            emb.where(col("vec_id") < 20), emb, "vec_id", "embedding",
            k = 5, m = 8, ksub = 16, refine = 32)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      None,
      bench = true),

    // ---- s06: behavioral time-series similarity ---------------------------
    // the "similar users" shape: each user's event stream folds into a
    // 24-dim hour-of-day activity profile (24 conditional decimal sums —
    // ONE map-side-combinable aggregation, exact until the final
    // per-element double cast), then the standard cosine top-k runs on
    // the derived vectors. Any ANN path (s02-s05) accepts the same
    // profiles at scale; the gate uses the exact form so DuckDB can
    // replay it bit-for-bit with list_cosine_similarity.
    QueryDef(
      "s06_user_similarity",
      (s, d) => {
        val hourSums = (0 until 24).map { h =>
          sum(when(hour(col("ts")) === h, col("value").cast("decimal(18,6)"))
            .otherwise(lit(0).cast("decimal(18,6)")))
            .cast("double").as(s"h$h")
        }
        val profiles = Tables(s, d, "events")
          .groupBy(col("user_id"))
          .agg(hourSums.head, hourSums.tail: _*)
          .select(col("user_id"),
            array((0 until 24).map(h => col(s"h$h")): _*).as("profile"))
        VectorOps.bruteForceTopK(
            profiles.where(col("user_id") < 10), profiles,
            "user_id", "profile", k = 3)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some {
        val sums = (0 until 24).map(h =>
          s"CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) = $h THEN CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)")
          .mkString(", ")
        s"""
        WITH profiles AS (
          SELECT user_id, [$sums] AS profile
          FROM events GROUP BY user_id
        ), scored AS (
          SELECT q.user_id AS query_id, c.user_id AS neighbor_id,
                 list_cosine_similarity(q.profile, c.profile) AS cos
          FROM profiles q JOIN profiles c ON q.user_id != c.user_id
          WHERE q.user_id < 10
        ), ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank"""
      }),

    // ---- s05: IVF x PQ — the composed production stack --------------------
    // coarse quantizer bounds WHICH rows are scanned (nprobe/nlist), PQ
    // bounds the per-row cost (8 byte-codes + LUT adds), exact re-rank
    // touches vectors only for the shortlist. Rows-only; recall pinned
    // in DedupOpsSuite.
    QueryDef(
      "s05_ann_ivfpq",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        // refine widened with s04 (same coarse-code near-tie effect,
        // compounded by probing half the lists): measured 0.47@refine=8
        // vs 0.73-0.80@refine=32; DedupOpsSuite pins >= 0.7 at both
        // gate scales.
        VectorOps.ivfPqTopK(
            emb.where(col("vec_id") < 20), emb, "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 8, m = 8, ksub = 16, refine = 32)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      None,
      bench = true),

    // ---- s08: metadata-filtered vector search (pre-filter strategy) ------
    // neighbors must share the query's label (tenant/lang/license
    // scoping): the candidate join keys on the label, so work falls
    // proportionally with filter selectivity — post-filtering a global
    // top-k under-fills k instead. Exact within the filter, so the s01
    // oracle pattern applies with the label equality added.
    QueryDef(
      "s08_ann_filtered",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        VectorOps.bruteForceTopKFiltered(
            emb.where(col("vec_id") < 20), emb,
            "vec_id", "embedding", "label", k = 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])) AS cos
          FROM embeddings q JOIN embeddings c
            ON q.label = c.label AND q.vec_id != c.vec_id
          WHERE q.vec_id < 20
        ), ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---- s09: hybrid retrieval — BM25 text arm + cosine vector arm,
    // reciprocal-rank fusion (the standard RAG retrieval stack). Query
    // docs double as query vectors (doc_id == vec_id by construction).
    // BM25 uses integer micro-unit contributions (raw idf odds, no ln)
    // so the per-doc sum is exact long addition and DuckDB replays the
    // ranking bit-for-bit; fusion compares rationals of integer ranks.
    QueryDef(
      "s09_hybrid_rrf",
      (s, d) => {
        import graft.functions.{RankFusion, TextOps}
        val docs = Tables.corpus(s, d)
        val emb = Tables(s, d, "embeddings")
        val qterms = docs.where(col("doc_id") < 10)
          .select(col("doc_id").as("qid"),
            explode(TextOps.tokens(lower(col("text")))).as("term"))
          .distinct()
        val rt = RankFusion.rankByScore(
          RankFusion.bm25Scores(docs, "doc_id", "text", qterms, "qid", "term")
            .where(col("doc_id") =!= col("query_id")), // queries ARE docs here
          "bm25", k = 20, rankAs = "r_text")
        val rv = VectorOps.bruteForceTopK(
            emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank").as("r_vec"))
        RankFusion.rrfFuse(rt, "r_text", rv, "r_vec", c = 60, k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
        ), dfreq AS (
          SELECT term, count(*) AS df FROM tf GROUP BY 1
        ), stats AS (
          SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT CAST(count(*) AS DOUBLE) FROM toks)
                   / (SELECT count(*) FROM documents) AS avgdl
        ), qterms AS (
          SELECT doc_id AS query_id, term FROM tf WHERE doc_id < 10
        ), contrib AS (
          SELECT q.query_id, tf.doc_id,
                 CAST(FLOOR(1000000.0 *
                   (((s.n - dfreq.df) + 0.5) / (dfreq.df + 0.5)) *
                   ((tf.tf * 2.2) /
                     (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))))) AS BIGINT) AS c
          FROM qterms q
          JOIN tf ON q.term = tf.term
          JOIN dfreq ON tf.term = dfreq.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats s
          WHERE tf.doc_id != q.query_id
        ), text_scores AS (
          SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS bm25
          FROM contrib GROUP BY 1, 2
        ), rt AS (
          SELECT query_id, doc_id, r_text FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY bm25 DESC, doc_id) AS r_text
            FROM text_scores
          ) WHERE r_text <= 20
        ), rv AS (
          SELECT query_id, neighbor_id AS doc_id, rank AS r_vec FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(c.embedding AS DOUBLE[])) DESC,
                              c.vec_id) AS rank
            FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
            WHERE q.vec_id < 10
          ) WHERE rank <= 20
        ), fused AS (
          SELECT COALESCE(rt.query_id, rv.query_id) AS query_id,
                 COALESCE(rt.doc_id, rv.doc_id) AS doc_id,
                 rt.r_text, rv.r_vec,
                 COALESCE(1.0 / (60.0 + rt.r_text), 0.0)
                   + COALESCE(1.0 / (60.0 + rv.r_vec), 0.0) AS f
          FROM rt FULL OUTER JOIN rv
            ON rt.query_id = rv.query_id AND rt.doc_id = rv.doc_id
        ), ranked AS (
          SELECT query_id, doc_id, r_text, r_vec,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY f DESC, doc_id) AS rank
          FROM fused
        )
        SELECT query_id, rank, doc_id,
               COALESCE(r_text, 0) AS r_text, COALESCE(r_vec, 0) AS r_vec
        FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank""")),

    // ---- s10: int8 scalar-quantized ANN (SQ8) — the one compressed
    // variant whose oracle replays VALUES: per-vector scales cancel in
    // the quantized cosine, leaving ratios of small-integer dot products
    // that are exact in doubles under ANY summation order. ------------------
    QueryDef(
      "s10_ann_sq8",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        VectorOps.sq8TopK(emb.where(col("vec_id") < 20), emb,
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), m AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS mx
          FROM v
        ), coded AS (
          SELECT vec_id,
                 list_transform(v, x -> floor(x /
                   (CASE WHEN mx = 0.0 THEN 1.0 ELSE mx END) * 127 + 0.5)) AS c
          FROM m
        ), selfd AS (
          SELECT vec_id, c, sqrt(list_dot_product(c, c)) AS n FROM coded
        ), scored AS (
          SELECT q.vec_id AS query_id, cc.vec_id AS neighbor_id,
                 list_dot_product(q.c, cc.c) / (q.n * cc.n) AS cos
          FROM selfd q JOIN selfd cc ON q.vec_id != cc.vec_id
          WHERE q.vec_id < 20
        ), ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---- s11: IVF with a PINNED coarse quantizer — the t19 pattern
    // applied to vectors: centroids are the SQ8 codes of the 16
    // lowest-id vectors (no kmeans), assignment/probe argmax over
    // integer dots, re-rank by the quantized cosine — every stage of
    // the IVF machinery (assignment, probe selection, bucket join,
    // ranking) under the hash oracle. s03 keeps the trained variant. --------
    QueryDef(
      "s11_ann_ivf_pinned",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        VectorOps.ivfTopKPinned(
            emb.where(col("vec_id") < 20), emb, "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 6)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(ivfPinnedOracle)),

    // ---- s18: the index LIFECYCLE split — build once, persist, query
    // many (the FAISS-shaped serving pattern): the corpus-sized
    // assignment pass runs once into parquet `centroids`+`assignments`
    // tables; the query side reads the index and never the raw corpus.
    // Shares s11's oracle verbatim, so the gate proves the persistence
    // round-trip is LOSSLESS — serve-from-disk must equal
    // compute-in-place down to the hash. -----------------------------------
    QueryDef(
      "s18_ann_index_persist",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val path = cachedIndex(s"s18|$d") { p =>
          VectorOps.buildPinnedIvfIndex(emb, "vec_id", "embedding",
            nlist = 16, path = p)
        }
        VectorOps.queryPinnedIvfIndex(s, path,
            emb.where(col("vec_id") < 20), "vec_id", "embedding",
            k = 5, nprobe = 6)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(ivfPinnedOracle)),

    // ---- s19: INCREMENTAL index append — the lifecycle continues:
    // build on a partial corpus, append the remaining vectors as a
    // delta batch under the frozen codebook (no rebuild, delta-sized
    // work), then query. Assignment is per-vector under the codebook,
    // so append-then-query must EQUAL s11's full-corpus answer — the
    // oracle is shared verbatim. (The delta excludes the 16 lowest ids
    // so the partial build's pinned codebook is the full corpus'.) -----------
    QueryDef(
      "s19_ann_index_append",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val isDelta = col("vec_id") >= 100 && col("vec_id") % 3 === 0
        val path = cachedIndex(s"s19|$d") { p =>
          VectorOps.buildPinnedIvfIndex(emb.where(!isDelta), "vec_id",
            "embedding", nlist = 16, path = p)
          VectorOps.appendPinnedIvfIndex(emb.where(isDelta), "vec_id",
            "embedding", path = p)
        }
        VectorOps.queryPinnedIvfIndex(s, path,
            emb.where(col("vec_id") < 20), "vec_id", "embedding",
            k = 5, nprobe = 6)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(ivfPinnedOracle)),

    // ---- s20: index COMPACTION — append-fragmented assignment files
    // rewritten PARTITIONED BY the bucket id, so the query-side probe
    // join is partition-pruned (a query reads ~nprobe/nlist of the
    // index, not all of it — the I/O win that matters at corpus scale).
    // Layout change only: build → append → compact → query must still
    // equal s11's compute-in-place answer. -----------------------------------
    QueryDef(
      "s20_ann_index_compact",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val isDelta = col("vec_id") >= 100 && col("vec_id") % 3 === 0
        val path = cachedIndex(s"s20|$d") { p =>
          VectorOps.buildPinnedIvfIndex(emb.where(!isDelta), "vec_id",
            "embedding", nlist = 16, path = p)
          VectorOps.appendPinnedIvfIndex(emb.where(isDelta), "vec_id",
            "embedding", path = p)
          VectorOps.compactPinnedIvfIndex(s, p)
        }
        VectorOps.queryPinnedIvfIndex(s, path,
            emb.where(col("vec_id") < 20), "vec_id", "embedding",
            k = 5, nprobe = 6)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(ivfPinnedOracle)),

    // ---- s21: index DELETE — the lifecycle closes: tombstone a
    // deterministic id slice from the persisted index (delta-sized
    // write, served via anti-join), then COMPACT so the deletes are
    // applied physically and the steady-state plan carries no
    // anti-join. Oracle = s11's machinery over the SURVIVING corpus
    // (the codebook is the 16 lowest ids, untouched by the slice), so
    // delete → compact → query must equal never-having-ingested the
    // slice, down to the hash. -----------------------------------------------
    QueryDef(
      "s21_ann_index_delete",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val isDoomed = col("vec_id") >= 100 && col("vec_id") % 5 === 2
        val path = cachedIndex(s"s21|$d") { p =>
          VectorOps.buildPinnedIvfIndex(emb, "vec_id", "embedding",
            nlist = 16, path = p)
          VectorOps.deleteFromPinnedIvfIndex(emb.where(isDoomed),
            "vec_id", path = p)
          VectorOps.compactPinnedIvfIndex(s, p)
        }
        VectorOps.queryPinnedIvfIndex(s, path,
            emb.where(col("vec_id") < 20), "vec_id", "embedding",
            k = 5, nprobe = 6)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(ivfPinnedOracleOver(
        "NOT (d.vec_id >= 100 AND d.vec_id % 5 = 2)"))),

    // ---- s12: PQ with PINNED sub-space codebooks — book j = the j-th
    // sub-slices of the 16 lowest-id vectors' codes; encode scores
    // `sub·c - |c|²/2` are exact half-integers, ADC sums are integer
    // sums, refine ranks by the quantized cosine. Gates the full PQ
    // machinery (encode, LUT build, ADC scan, shortlist, refine); s04
    // keeps the trained variant. -------------------------------------------
    QueryDef(
      "s12_ann_pq_pinned",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        VectorOps.pqTopKPinned(
            emb.where(col("vec_id") < 20), emb, "vec_id", "embedding",
            k = 5, m = 8, ksub = 16, refine = 32)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(s"""
        $sq8CodedSql,
        books AS (
          SELECT j.j, d.vec_id AS code,
                 list_slice(d.c, j.j * 8 + 1, j.j * 8 + 8) AS bc
          FROM coded d
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) j
          WHERE d.vec_id < 16),
        enc AS (
          SELECT vec_id, j, code FROM (
            SELECT d.vec_id, b.j, b.code,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id, b.j
                     ORDER BY list_dot_product(
                         list_slice(d.c, b.j * 8 + 1, b.j * 8 + 8), b.bc)
                       - list_dot_product(b.bc, b.bc) / 2.0 DESC,
                       b.code) AS rn
            FROM coded d CROSS JOIN books b) t WHERE rn = 1),
        lut AS (
          SELECT q.vec_id AS query_id, b.j, b.code,
                 list_dot_product(
                   list_slice(q.c, b.j * 8 + 1, b.j * 8 + 8), b.bc) AS d
          FROM coded q CROSS JOIN books b WHERE q.vec_id < 20),
        approx AS (
          SELECT l.query_id, e.vec_id AS neighbor_id, SUM(l.d) AS a
          FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
          WHERE e.vec_id != l.query_id
          GROUP BY 1, 2),
        short AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY a DESC, neighbor_id) AS ar
            FROM approx) t WHERE ar <= 160),
        scored AS (
          SELECT s.query_id, s.neighbor_id,
                 list_dot_product(q.c, x.c) / (q.n * x.n) AS cos
          FROM short s
          JOIN selfd q ON q.vec_id = s.query_id
          JOIN selfd x ON x.vec_id = s.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---- s13: IVF x PQ with BOTH stages pinned — the composed stack
    // (coarse bucket + probe join + ADC scan + shortlist + refine)
    // fully under the hash oracle; s05 keeps the trained variant. -----------
    QueryDef(
      "s13_ann_ivfpq_pinned",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        VectorOps.ivfPqTopKPinned(
            emb.where(col("vec_id") < 20), emb, "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 8, m = 8, ksub = 16, refine = 32)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(s"""
        $sq8CodedSql,
        cent AS (SELECT vec_id AS cid, c AS cc FROM coded WHERE vec_id < 16),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT d.vec_id, ct.cid,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id
                     ORDER BY list_dot_product(d.c, ct.cc) DESC, ct.cid) AS rn
            FROM coded d CROSS JOIN cent ct) t WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cid FROM (
            SELECT d.vec_id, ct.cid,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id
                     ORDER BY list_dot_product(d.c, ct.cc) DESC, ct.cid) AS rn
            FROM coded d CROSS JOIN cent ct WHERE d.vec_id < 20) t
          WHERE rn <= 8),
        books AS (
          SELECT j.j, d.vec_id AS code,
                 list_slice(d.c, j.j * 8 + 1, j.j * 8 + 8) AS bc
          FROM coded d
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) j
          WHERE d.vec_id < 16),
        enc AS (
          SELECT vec_id, j, code FROM (
            SELECT d.vec_id, b.j, b.code,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id, b.j
                     ORDER BY list_dot_product(
                         list_slice(d.c, b.j * 8 + 1, b.j * 8 + 8), b.bc)
                       - list_dot_product(b.bc, b.bc) / 2.0 DESC,
                       b.code) AS rn
            FROM coded d CROSS JOIN books b) t WHERE rn = 1),
        lut AS (
          SELECT q.vec_id AS query_id, b.j, b.code,
                 list_dot_product(
                   list_slice(q.c, b.j * 8 + 1, b.j * 8 + 8), b.bc) AS d
          FROM coded q CROSS JOIN books b WHERE q.vec_id < 20),
        approx AS (
          SELECT p.query_id, e.vec_id AS neighbor_id, SUM(l.d) AS a
          FROM probes p
          JOIN assign ab ON ab.cid = p.cid AND ab.vec_id != p.query_id
          JOIN enc e ON e.vec_id = ab.vec_id
          JOIN lut l ON l.query_id = p.query_id
                    AND l.j = e.j AND l.code = e.code
          GROUP BY 1, 2),
        short AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY a DESC, neighbor_id) AS ar
            FROM approx) t WHERE ar <= 160),
        scored AS (
          SELECT s.query_id, s.neighbor_id,
                 list_dot_product(q.c, x.c) / (q.n * x.n) AS cos
          FROM short s
          JOIN selfd q ON q.vec_id = s.query_id
          JOIN selfd x ON x.vec_id = s.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---- s14: hyperplane LSH with a PINNED plane family — the LSH
    // machinery (signatures, band packing, bucket self-join, pair
    // dedup, cosine verify) under the hash oracle: plane weights from
    // an integer bit_count-parity formula both engines evaluate, dots
    // over SQ8 codes so the sign decision is exact integer arithmetic.
    // s02/s07 keep the xxhash hyperplane family (recall studies). ----------
    QueryDef(
      "s14_ann_lsh_pinned",
      (s, d) =>
        VectorOps.lshCosinePairsPinned(Tables(s, d, "embeddings"),
            "vec_id", "embedding", dim = 64, bits = 8, bands = 32,
            threshold = 0.4)
          .orderBy("id_a", "id_b"),
      Some(s"""
        $sq8CodedSql,
        planes AS (
          SELECT j.j, i.i,
                 CASE WHEN bit_count(j.j * 2654435761 + i.i * 40503) % 2 = 0
                      THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(generate_series(0, 255)) AS j) j
          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        cv AS (
          SELECT vec_id, i.i, c[i.i + 1] AS x
          FROM coded
          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        dots AS (
          SELECT cv.vec_id, p.j, SUM(p.s * cv.x) AS d
          FROM cv JOIN planes p ON p.i = cv.i
          GROUP BY 1, 2),
        sigs AS (
          SELECT vec_id, j // 8 AS band,
                 SUM(CASE WHEN d >= 0 THEN (1 << (j % 8)) ELSE 0 END) AS sig
          FROM dots GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM sigs a JOIN sigs b
            ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
        scored AS (
          SELECT cand.id_a, cand.id_b,
                 list_dot_product(x.c, y.c) / (x.n * y.n) AS cos
          FROM cand
          JOIN selfd x ON x.vec_id = cand.id_a
          JOIN selfd y ON y.vec_id = cand.id_b)
        SELECT id_a, id_b, cos FROM scored
        WHERE cos >= 0.4
        ORDER BY id_a, id_b""")),

    // ---- s15: late-interaction retrieval (maxsim over sub-vectors) --------
    // ColBERT-style scoring: each vector splits into 8 sub-vectors
    // standing in for per-token embeddings; score = sum over the query's
    // sub-vectors of the best dot against ANY document sub-vector. Over
    // SQ8 codes every max/sum is exact integer arithmetic, so the oracle
    // replays the scores bit-for-bit. Sub-vectors explode to ROWS so the
    // pairwise dots run through the codegen kernel and both reductions
    // (max per query-token, sum per pair) partial-aggregate map-side.
    QueryDef(
      "s15_maxsim",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        VectorOps.maxSimTopK(emb.where(col("vec_id") < 10), emb,
            "vec_id", "embedding", k = 5, nSub = 8)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(s"""
        $sq8CodedSql,
        sub AS (
          SELECT vec_id, i, list_slice(c, i * 8 + 1, i * 8 + 8) AS s
          FROM coded, range(8) r(i)),
        qs AS (SELECT vec_id, i, s FROM sub WHERE vec_id < 10),
        mm AS (
          SELECT qs.vec_id AS query_id, ds.vec_id AS neighbor_id, qs.i,
                 MAX(list_dot_product(qs.s, ds.s)) AS mx
          FROM qs JOIN sub ds ON ds.vec_id != qs.vec_id
          GROUP BY 1, 2, 3),
        scored AS (
          SELECT query_id, neighbor_id, SUM(mx) AS cos
          FROM mm GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---- s16: two-stage retrieval (IVF shortlist -> maxsim re-rank) -------
    // the production late-interaction stack: the pinned-IVF index (s11's
    // assignment/probe/bucket-join stage, shared code) narrows
    // candidates, and the expensive per-token maxsim score (s15's
    // semantics) runs ONLY on the shortlist. Integer-exact end to end,
    // so the oracle replays index decisions AND re-rank scores.
    QueryDef(
      "s16_maxsim_ivf",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        VectorOps.maxSimTopKIvf(emb.where(col("vec_id") < 10), emb,
            "vec_id", "embedding", k = 5, nSub = 8, nlist = 16, nprobe = 6)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(s"""
        $sq8CodedSql,
        cent AS (SELECT vec_id AS cid, c AS cc FROM coded WHERE vec_id < 16),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT d.vec_id, ct.cid,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id
                     ORDER BY list_dot_product(d.c, ct.cc) DESC, ct.cid) AS rn
            FROM coded d CROSS JOIN cent ct) t WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cid FROM (
            SELECT d.vec_id, ct.cid,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id
                     ORDER BY list_dot_product(d.c, ct.cc) DESC, ct.cid) AS rn
            FROM coded d CROSS JOIN cent ct WHERE d.vec_id < 10) t
          WHERE rn <= 6),
        cand AS (
          SELECT p.query_id, a.vec_id AS neighbor_id
          FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id != p.query_id),
        sub AS (
          SELECT vec_id, i, list_slice(c, i * 8 + 1, i * 8 + 8) AS s
          FROM coded, range(8) r(i)),
        mm AS (
          SELECT cand.query_id, cand.neighbor_id, qs.i,
                 MAX(list_dot_product(qs.s, ds.s)) AS mx
          FROM cand
          JOIN sub qs ON qs.vec_id = cand.query_id
          JOIN sub ds ON ds.vec_id = cand.neighbor_id
          GROUP BY 1, 2, 3),
        scored AS (
          SELECT query_id, neighbor_id, SUM(mx) AS cos
          FROM mm GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---- s17: IVF recall@nprobe tuning curve ------------------------------
    // THE report an operator reads to pick nprobe: true (quantized
    // brute-force) top-5 neighbors vs the probe rank of each one's
    // bucket under the pinned coarse quantizer. Integer-exact end to
    // end, so the oracle replays the recall numbers themselves.
    QueryDef(
      "s17_ivf_recall_curve",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        VectorOps.ivfRecallCurve(emb.where(col("vec_id") < 10), emb,
            "vec_id", "embedding", k = 5, nlist = 16, maxProbe = 8)
      },
      Some(s"""
        $sq8CodedSql,
        cent AS (SELECT vec_id AS cid, c AS cc FROM coded WHERE vec_id < 16),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT d.vec_id, ct.cid,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id
                     ORDER BY list_dot_product(d.c, ct.cc) DESC, ct.cid) AS rn
            FROM coded d CROSS JOIN cent ct) t WHERE rn = 1),
        pranks AS (
          SELECT d.vec_id AS query_id, ct.cid,
                 ROW_NUMBER() OVER (PARTITION BY d.vec_id
                   ORDER BY list_dot_product(d.c, ct.cc) DESC, ct.cid) AS prank
          FROM coded d CROSS JOIN cent ct WHERE d.vec_id < 10),
        scored AS (
          SELECT q.vec_id AS query_id, cc.vec_id AS neighbor_id,
                 list_dot_product(q.c, cc.c) / (q.n * cc.n) AS cos
          FROM selfd q JOIN selfd cc ON q.vec_id != cc.vec_id
          WHERE q.vec_id < 10),
        truth AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 5),
        hits AS (
          SELECT t.query_id, t.neighbor_id, p.prank
          FROM truth t
          JOIN assign a ON a.vec_id = t.neighbor_id
          JOIN pranks p ON p.query_id = t.query_id AND p.cid = a.cid),
        spine AS (SELECT unnest(generate_series(1, 8)) AS nprobe),
        curve AS (
          SELECT s.nprobe, count(h.neighbor_id) AS hits
          FROM spine s LEFT JOIN hits h ON h.prank <= s.nprobe
          GROUP BY s.nprobe)
        SELECT CAST(nprobe AS INT) AS nprobe, hits,
               CAST((hits * 1000) // (SELECT count(*) FROM truth) AS BIGINT)
                 AS recall_permille
        FROM curve
        ORDER BY nprobe"""))
  )
}
