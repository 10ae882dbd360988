package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Property-based exactness proof for the prefix-filtered Jaccard dedup:
  * on random corpora, `ngramJaccardPairs` must emit exactly the pairs a
  * direct Scala-side shingle-set computation finds — the prefix index is
  * an optimization, never a semantics change. Random vocab sizes stress
  * both the hot-shingle regime (tiny vocab → every shingle shared) and
  * the sparse regime. */
class PrefixFilterPropertiesSuite extends SparkSuite {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val corpusGen: Gen[Seq[(Long, String)]] =
    for {
      vocabSize <- Gen.choose(3, 20)
      nDocs <- Gen.choose(5, 25)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 30) // includes docs shorter than n=3
        ws <- Gen.listOfN(len, Gen.choose(0, vocabSize - 1).map(i => s"w$i"))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def referencePairs(
      docs: Seq[(Long, String)], n: Int, t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      id -> toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= t
    } yield (ia, ib, jac)).toSet
  }

  test("prefix-filtered Jaccard equals the direct computation on random corpora") {
    forAll(corpusGen, n = 12) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = TextOps.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val want = referencePairs(docs, 3, 0.5)
      assert(got.map(p => (p._1, p._2)) == want.map(p => (p._1, p._2)),
        s"pair sets diverge\n got: $got\nwant: $want\ncorpus: $docs")
      // jaccard values must agree exactly (integer-ratio doubles)
      val wantByPair = want.map(p => (p._1, p._2) -> p._3).toMap
      got.foreach { case (a, b, j) =>
        assert(j == wantByPair((a, b)), s"jac mismatch on ($a,$b)")
      }
      spark.catalog.clearCache() // ngramJaccardPairs caches internally
    }
  }
}
