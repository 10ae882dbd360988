package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-memory frequency sketches over unbounded token streams.
  *
  * The reference has no sketch machinery (its aggregation is delegated
  * to SOQL, mapping_parser.py:5), but a 100 TB curation pipeline needs
  * frequency estimates whose state does NOT grow with the corpus. The
  * Count-Min sketch here is `depth × width` counters total — the same
  * 4 KiB-ish sketch whether the corpus is 60k rows or 100 TB — and
  * every hash is md5-derived ([[TextOps.tokenHash64]]), so the entire
  * estimator is integer-deterministic and replayable in the DuckDB
  * oracle, unlike RNG-seeded sketch libraries.
  */
object SketchOps {

  private def bucketOf(tok: Column, r: Int, width: Int): Column =
    TextOps.tokenHash64(concat(lit(s"$r:"), tok)).bitwiseAND(width - 1)

  /** Count-Min estimates for the corpus's `topK` most frequent tokens.
    *
    * Build: explode tokens, fan each out to `depth` (row, bucket) cells
    * (bucket = low bits of a salted md5 hash), ONE aggregation to the
    * `depth*width`-cell sketch — map-side partial combine collapses the
    * stream before the shuffle, so the exchanged volume is bounded by
    * `tasks * depth * width`, not the token count.
    *
    * Probe: estimate(t) = min over rows of the t-bucket counters (the
    * classic CMS upper bound: always >= the true count, inflated only
    * by collisions). The probe set and the sketch are both tiny, so the
    * lookup join broadcasts.
    *
    * Output: (tok, true_n, cms_est) for the topK tokens by exact count
    * — carrying the exact count alongside pins the estimator's
    * one-sided error in the oracle compare (cms_est >= true_n always).
    *
    * `width` must be a power of two (bucket = hash & (width-1)). */
  def cmsHeavyHitters(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 1024, topK: Int = 10): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    // the token stream feeds both the sketch and the exact top-K;
    // materialize the cache BEFORE the branch fan-out (concurrent first
    // readers of an unpopulated cache recompute partitions)
    val toks = df.select(explode(TextOps.tokens(col(textCol))).as("tok")).cache()
    toks.count()
    val cells = toks.select(explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"), bucketOf(col("tok"), r, width).as("bucket"))): _*))
      .as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    val sketch = cells.groupBy("r", "bucket").agg(count(lit(1)).as("c"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("tok")).limit(topK)
    val probes = top.select(col("tok"), col("true_n"),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucketOf(col("tok"), r, width).as("bucket"))): _*))
        .as("rb"))
      .select(col("tok"), col("true_n"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probes.join(sketch, Seq("r", "bucket"))
      .groupBy("tok", "true_n").agg(min(col("c")).as("cms_est"))
      .orderBy(col("true_n").desc, col("tok"))
  }
}
