package graft

import org.apache.spark.sql.functions._
import graft.functions.{SimHash64, TextOps}

/** Pins the codegen [[SimHash64]] kernel to the declarative
  * explode + 64-conditional-sum pipeline it replaced — bit-for-bit, on
  * the whitespace/unicode edge cases where the two could plausibly
  * diverge (Spark trim strips ' ' only; split("\\s+", -1) keeps leading
  * empty tokens; every OCCURRENCE votes, not distinct tokens). */
class SimHashKernelSuite extends SparkSuite {
  import spark.implicits._

  /** The pre-kernel declarative formulation, verbatim. */
  private def declarativeSimHash(df: org.apache.spark.sql.DataFrame) = {
    val toks = df.select(col("doc_id").as("__id"),
      explode(TextOps.tokens(col("text"))).as("__t"))
      .select(col("__id"), TextOps.tokenHash64(col("__t")).as("__h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$b")
    }
    val packed = (0 until 64).map { b =>
      when(col(s"__b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    toks.groupBy(col("__id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("__id").as("doc_id"), packed.as("simhash"))
  }

  test("kernel equals the declarative pipeline on edge-case documents") {
    val rng = new scala.util.Random(7)
    val cases = Seq(
      "", " ", "   ", "\t", "\tleading tab", "trailing tab\t",
      "a", "a b c d e f g", "a  double  spaces", " padded ",
      "dup dup dup dup distinct", "日本語 テキスト 混在 mixed",
      "line\nbreaks\r\nand\ttabs mixed  in", "😀 emoji 😀 tokens") ++
      (1 to 40).map(_ => (1 to rng.nextInt(60) + 1)
        .map(_ => s"w${rng.nextInt(30)}").mkString(" "))
    val df = cases.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val want = declarativeSimHash(df)
      .as[(Long, Long)].collect().toMap
    val got = TextOps.simHash(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("interpreted eval equals codegen column path") {
    val texts = Seq("", " x ", "\ta b", "q r s t u v w x y z")
    texts.foreach { t =>
      val viaKernel = SimHash64.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      val viaDf = Seq(Tuple1(t)).toDF("text")
        .select(SimHash64.column(spark, col("text")))
        .as[Long].collect().head
      assert(viaKernel == viaDf, s"mismatch for '$t'")
    }
  }
}
