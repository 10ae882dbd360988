package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomAgg, BloomFilterOps, BloomMightContain}

/** The runtime bloom-filter semi-join reduction (q47): correctness of
  * the kernel (no false negatives, bounded false positives), bitmap
  * determinism under partitioning/merge order, and the property the
  * operator exists for — the prefilter passes only a dim-proportional
  * fraction of the fact side. */
class BloomFilterSuite extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("kernel: inserted keys always hit; non-keys rarely do") {
    val bits = new Array[Long]((1 << 14) / 64)
    val keys = (0L until 500L).map(_ * 7919L + 13L)
    keys.foreach(BloomFilterOps.add(bits, _, 3))
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(bits)
    keys.foreach { k =>
      assert(BloomFilterOps.mightContain(ad, k, 3), s"false negative on $k")
    }
    // 500 keys in 2^14 bits, k=3: fpp ~ (1-e^(-3*500/16384))^3 ~ 6e-4
    val fps = (1L to 10000L).map(_ * 104729L + 7L)
      .filterNot(keys.contains)
      .count(BloomFilterOps.mightContain(ad, _, 3))
    assert(fps <= 100, s"false-positive count $fps implausibly high")
  }

  test("bitmap aggregate is partitioning- and merge-order-invariant") {
    val keys = (0L until 1000L).toDF("k")
    def bm(parts: Int): Seq[Long] =
      keys.repartition(parts)
        .select(BloomAgg.column(spark, col("k"), 1 << 14, 3))
        .head().getSeq[Long](0)
    val one = bm(1)
    assert(one == bm(7) && one == bm(32), "bitmap depends on partitioning")
    // and it equals the driver-side kernel run serially
    val local = new Array[Long]((1 << 14) / 64)
    (0L until 1000L).foreach(BloomFilterOps.add(local, _, 3))
    assert(one == local.toSeq, "distributed bitmap != serial kernel")
  }

  test("prefilter: no false negatives, dim-proportional survivor fraction") {
    val lineitem = Tables(spark, sf, "lineitem")
    val hot = Tables(spark, sf, "orders").where(col("o_totalprice") > 450000)
    val nFact = lineitem.count()
    val pre = BloomFilterOps.bloomPrefilter(
      lineitem, "l_orderkey", hot, "o_orderkey")
    // every truly-matching row survives (no false negatives): the
    // prefiltered join equals the plain join row-for-row
    val plain = lineitem.join(hot, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Long)].collect().sorted.toSeq
    val viaBloom = pre.join(hot, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaBloom == plain, "bloom prefilter changed the join result")
    // the reduction: ~10% of orders pass the predicate, so only ~10% of
    // fact rows (+ tiny fp at 2^17 bits) should survive the prefilter
    val dimFrac = hot.count().toDouble /
      Tables(spark, sf, "orders").count()
    val passFrac = pre.count().toDouble / nFact
    assert(passFrac <= dimFrac + 0.05,
      f"prefilter passed $passFrac%.3f of fact rows vs dim fraction $dimFrac%.3f")
  }

  test("membership expression survives codegen and matches interpreted eval") {
    val bits = new Array[Long]((1 << 10) / 64)
    (0L until 64L).foreach(BloomFilterOps.add(bits, _, 3))
    val df = (0L until 256L).toDF("k")
      .withColumn("hit", BloomMightContain.column(spark,
        typedlit(bits.toSeq), col("k"), 3))
    val got = df.where(col("hit")).select("k").as[Long].collect().toSet
    assert((0L until 64L).toSet.subsetOf(got), "codegen path lost inserted keys")
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(bits)
    val expected = (0L until 256L).filter(BloomFilterOps.mightContain(ad, _, 3)).toSet
    assert(got == expected, "codegen and interpreted membership diverge")
  }
}
