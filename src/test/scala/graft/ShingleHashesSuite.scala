package graft

import org.apache.spark.sql.functions._
import graft.functions.{ShingleHashes, TextOps}

/** Pins the codegen [[ShingleHashes]] kernel: definitional equality
  * (hash-of-window == polynomial of per-token hashes), sorted-distinct
  * output (the [[graft.functions.IntersectSize]] contract), and —
  * the property the dedup family actually relies on — identical
  * equality structure to the string shingles it replaces. */
class ShingleHashesSuite extends SparkSuite {
  import spark.implicits._

  private def naive(toks: Seq[String], n: Int): Seq[Long] = {
    val seed = 1469598103934665603L
    val b = 0x100000001b3L
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def th(t: String): Long = mix(t.getBytes("UTF-8")
      .foldLeft(0xcbf29ce484222325L)((h, c) => (h ^ (c & 0xffL)) * b))
    toks.sliding(n).filter(_.length == n)
      .map(w => mix(w.map(th).foldLeft(seed)((h, x) => h * b + x)))
      .toSeq.distinct.sorted
  }

  test("kernel equals the naive definition, sorted and distinct") {
    val rng = new scala.util.Random(11)
    val cases = Seq(
      Seq("a"), Seq("a", "b", "c"), Seq("a", "b", "a", "b", "a"),
      Seq("日本語", "テキスト", "mixed"), Seq("", "x", ""),
      Seq.fill(40)("same")) ++
      (1 to 30).map(_ => (1 to rng.nextInt(50) + 1)
        .map(_ => s"w${rng.nextInt(12)}").toSeq)
    for (toks <- cases; n <- Seq(1, 2, 3, 5)) {
      val got = Seq(Tuple1(toks)).toDF("t")
        .select(ShingleHashes.column(spark, col("t"), n))
        .as[Seq[Long]].collect().head
      assert(got == naive(toks, n), s"n=$n toks=$toks")
      assert(got == got.distinct.sorted, "output must be sorted distinct")
    }
  }

  test("equality structure matches string shingles on the planted corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val strings = TextOps.shingleSets(docs, "doc_id", "text", 3)
      .select(col("__id"), col("__sh"))
      .as[(Long, Seq[String])].collect().toMap
    val hashed = TextOps.hashedShingleSets(docs, "doc_id", "text", 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(hashed.keySet == strings.keySet)
    // per-doc set sizes match (no within-doc collisions), and pairwise
    // intersection sizes match string space on a deterministic sample —
    // exactly the quantities Jaccard verification consumes
    hashed.keys.foreach { id =>
      assert(hashed(id).size == strings(id).toSet.size, s"doc $id size")
    }
    val ids = hashed.keySet.toSeq.sorted.take(60)
    for (a <- ids; bId <- ids if a < bId) {
      val hs = (hashed(a).toSet & hashed(bId).toSet).size
      val ss = (strings(a).toSet & strings(bId).toSet).size
      assert(hs == ss, s"pair ($a,$bId): hashed inter $hs vs string $ss")
    }
  }
}
