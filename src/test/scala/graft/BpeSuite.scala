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

  test("batched trainer emits the byte-identical merge table to the serial one") {
    // hand corpus with interacting merges: (a,b) then (ab,c) chain, plus
    // independent (x,y) — exercises both the batch accept and the
    // conflict stop
    val docs1 = Seq("a b c", "a b c", "x y", "x y", "x y", "a b d").toDF("text")
    // real text: the sf0.001 documents sample
    val docs2 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(120)
    for (docs <- Seq(docs1, docs2); k <- Seq(2, 4, 16)) {
      val serial = TextOps.bpeTrainSerial(docs, "text", numMerges = 12)
      val batched = TextOps.bpeTrain(docs, "text", numMerges = 12, batchK = k)
      assert(batched == serial, s"batchK=$k: $batched vs $serial")
    }
  }

  test("concat-collision corpora still match the serial oracle") {
    // merging (a,b) CREATES the string "ab" which already exists as a
    // corpus token: the 3 "x a b" docs turn into "x ab", raising the
    // pre-existing (x,ab) pair from 4 to 7 — past the second batch
    // member (c,d,6). An unguarded batch would emit (c,d) as merge 2;
    // serial (and the guarded batch) emit (x,ab,7)
    val docs = (
      Seq.fill(3)("x a b") ++ Seq.fill(7)("a b") ++
        Seq.fill(6)("c d") ++ Seq.fill(4)("x ab")).toDF("text")
    val serial = TextOps.bpeTrainSerial(docs, "text", numMerges = 3)
    assert(serial.map(m => (m._1, m._2, m._3, m._4)) == Seq(
      (1, "a", "b", 10L), (2, "x", "ab", 7L), (3, "c", "d", 6L)))
    for (k <- Seq(2, 4, 16))
      assert(TextOps.bpeTrain(docs, "text", numMerges = 3, batchK = k) == serial,
        s"batchK=$k diverged on a concat-collision corpus")
  }

  test("batching cuts corpus passes: rounds < merges") {
    // many mutually-independent frequent pairs -> big safe batches
    val docs = (1 to 40).flatMap(_ => Seq(
      "a b", "c d", "e f", "g h", "i j", "k l", "m n", "o p")).toDF("text")
    val (merges, rounds) = TextOps.bpeTrainWithRounds(
      docs, "text", numMerges = 8, batchK = 16)
    assert(merges.size == 8, merges.toString)
    assert(rounds < merges.size, s"rounds=$rounds, merges=${merges.size}")
    // and the result still matches the serial oracle
    assert(merges == TextOps.bpeTrainSerial(docs, "text", numMerges = 8))
  }

  test("bpeApply keeps non-numeric document ids intact") {
    val docs = Seq(("doc-a", "a b c"), ("doc-b", "a b d")).toDF("doc_id", "text")
    val merges = Seq((1, "a", "b", 2L))
    val out = TextOps.bpeApply(docs, "doc_id", "text", merges)
      .as[(String, Seq[String])].collect().toMap
    assert(out.keySet == Set("doc-a", "doc-b"), out.toString)
    assert(out("doc-a") == Seq("ab", "c") && out("doc-b") == Seq("ab", "d"))
    // numeric ids keep their original type on output
    val docsNum = Seq((7L, "a b")).toDF("doc_id", "text")
    val outNum = TextOps.bpeApply(docsNum, "doc_id", "text", merges)
    assert(outNum.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(outNum.as[(Long, Seq[String])].collect().toSeq == Seq((7L, Seq("ab"))))
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
