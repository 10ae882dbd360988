package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Exact semantics of the iterative BPE trainer on a hand-checkable
  * corpus, plus the structural invariants that hold on any input. */
class BpeSuite extends SparkSuite {
  import spark.implicits._

  test("merge sequence matches the hand computation, stops below minCount") {
    val docs = Seq("a b c", "a b d", "a b c").toDF("text")
    val merges = TextOps.bpeTrain(docs, "text", numMerges = 10, minCount = 2L)
    // round 1: (a,b)x3 wins; round 2: (ab,c)x2; then (ab,d)x1 < minCount
    assert(merges == Seq((1, "a", "b", 3L), (2, "ab", "c", 2L)), merges.toString)
  }

  test("ties break deterministically on the pair, not arrival order") {
    val docs = Seq("x y", "p q", "x y", "p q").toDF("text")
    val merges = TextOps.bpeTrain(docs, "text", numMerges = 1)
    // (p,q) and (x,y) both count 2 — lexicographically smaller pair wins
    assert(merges == Seq((1, "p", "q", 2L)), merges.toString)
  }

  test("left-greedy run semantics: 'a a a' under (a,a) -> [aa, a]") {
    assert(TextOps.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(TextOps.mergePair(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(TextOps.mergePair(Seq("b", "a", "a"), "a", "a") == Seq("b", "aa"))
  }

  test("bpeApply replays training merges in rank order") {
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs.select(col("text")), "text", 10, minCount = 2L)
    val out = TextOps.bpeApply(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    // merge 1 = (a,b); (ab,c)/(ab,d) each count 1 < minCount -> stop
    assert(out(1L) == Seq("ab", "c") && out(2L) == Seq("ab", "d"), out.toString)
    // applying in rank order chains merges: train on a corpus where both
    // (a,b) and (ab,c) are learned, apply must produce the full "abc"
    val docs2 = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val m2 = TextOps.bpeTrain(docs2.select(col("text")), "text", 10, minCount = 2L)
    val out2 = TextOps.bpeApply(docs2, "doc_id", "text", m2)
      .as[(Long, Seq[String])].collect().toMap
    assert(out2(1L) == Seq("abc"), out2.toString)
  }

  test("every merge strictly shrinks the corpus token count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(100)
    val merges = TextOps.bpeTrain(docs, "text", numMerges = 5)
    assert(merges.nonEmpty)
    // ranks are 1..k and counts are non-increasing (each round merges the
    // current maximum; a later round can never beat an earlier count)
    assert(merges.map(_._1) == (1 to merges.size))
    assert(merges.map(_._4) == merges.map(_._4).sorted.reverse)
  }
}
