package graft

import org.apache.spark.sql.functions._
import graft.functions.RankFusion

/** Pins [[RankFusion]]: the integer-scaled BM25 contributions against a
  * direct Scala replay of the documented expression tree, rank
  * determinism, and RRF's absent-arm / ordering semantics. */
class RankFusionSuite extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private val docs = Seq(
    (0L, "apple banana cherry apple"),
    (1L, "banana date elderberry"),
    (2L, "apple apple apple apple apple"),
    (3L, "fig grape date banana banana"),
    (4L, "cherry fig"),
  ).toDF("doc_id", "text")

  test("bm25Scores matches a direct replay of the micro-unit formula") {
    val q = Seq((0L, "apple"), (0L, "banana")).toDF("qid", "term")
    val got = RankFusion.bm25Scores(docs, "doc_id", "text", q, "qid", "term")
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toMap

    val texts = Map(0L -> "apple banana cherry apple", 1L -> "banana date elderberry",
      2L -> "apple apple apple apple apple", 3L -> "fig grape date banana banana",
      4L -> "cherry fig")
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = 5.0
    val avgdl = toks.values.map(_.size).sum.toDouble / 5L
    def df(term: String) = toks.values.count(_.contains(term)).toDouble
    def contrib(id: Long, term: String): Long = {
      val tf = toks(id).count(_ == term).toDouble
      if (tf == 0) 0L
      else math.floor(1000000.0 *
        (((n - df(term)) + 0.5) / (df(term) + 0.5)) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (toks(id).size / avgdl))))).toLong
    }
    // self-exclusion is caller policy (s09 filters doc_id != query_id),
    // so the scorer itself reports doc 0 against query 0 too
    val expected = (0L to 4L).map(id =>
      id -> (contrib(id, "apple") + contrib(id, "banana")))
      .filter(_._2 != 0L).toMap
    assert(got == expected)
    assert(got.contains(0L), "no hidden self-exclusion in the library scorer")
  }

  test("rankByScore breaks score ties by doc_id ascending") {
    val scored = Seq((7L, 10L, 5L), (7L, 3L, 5L), (7L, 8L, 9L))
      .toDF("query_id", "doc_id", "bm25")
    val ranks = RankFusion.rankByScore(scored, "bm25", 10, "r")
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toMap
    assert(ranks == Map(8L -> 1L, 3L -> 2L, 10L -> 3L))
  }

  test("rrfFuse: both-arms beats single-arm at comparable ranks; absent arm reads 0") {
    val a = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("query_id", "doc_id", "ra")
    val b = Seq((1L, 101L, 1L), (1L, 102L, 2L)).toDF("query_id", "doc_id", "rb")
    val out = RankFusion.rrfFuse(a, "ra", b, "rb", c = 60, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._3, (r._2, r._4, r._5))).toMap
    // doc 101 appears in both arms (ranks 2+1) -> fused 1/62+1/61 beats
    // either single-arm doc (1/61 or 1/62)
    assert(out(101L)._1 == 1L)
    // 100 (rank 1 in arm a only) beats 102 (rank 2 in arm b only)
    assert(out(100L)._1 == 2L && out(102L)._1 == 3L)
    assert(out(100L)._3 == 0L, "absent vector arm reads 0")
    assert(out(102L)._2 == 0L, "absent text arm reads 0")
  }

  test("s09 plan: query-term and stats joins broadcast (no corpus-side shuffle by term)") {
    val df = SparkEntry.queries("s09_hybrid_rrf")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "query-side tables must broadcast:\n" + p)
    spark.catalog.clearCache()
  }
}
