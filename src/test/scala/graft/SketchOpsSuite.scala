package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchOps

/** Count-Min sketch: one-sided error and determinism. */
class SketchOpsSuite extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat and the dog met on the mat",
    "a completely different sentence here"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("CMS estimates are an upper bound on the true counts") {
    val out = SketchOps.cmsHeavyHitters(docs, "text", depth = 4,
      width = 64, topK = 8).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (tok, trueN, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= trueN, s"CMS must never under-count: $tok $est < $trueN")
    }
    // 'the' dominates this corpus and must rank first with its exact count
    val head = out.head
    assert(head.getString(0) == "the" && head.getLong(1) == 7L, head.toString)
  }

  test("the sketch is integer-deterministic across runs") {
    val a = SketchOps.cmsHeavyHitters(docs, "text", width = 64).collect().toSeq
    val b = SketchOps.cmsHeavyHitters(docs, "text", width = 64).collect().toSeq
    assert(a == b)
  }

  test("width must be a power of two") {
    intercept[IllegalArgumentException] {
      SketchOps.cmsHeavyHitters(docs, "text", width = 100)
    }
  }
}
