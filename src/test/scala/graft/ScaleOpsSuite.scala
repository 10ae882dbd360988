package graft

import org.apache.spark.sql.functions._
import graft.functions.ScaleOps

class ScaleOpsSuite extends SparkSuite {
  import spark.implicits._

  test("runningTotal equals the driver prefix sum, any partitioning") {
    val rows = (1L to 500L).map(i => (i, (i * 37) % 101, i % 13 + 1))
    val expected = rows.sortBy { case (id, score, _) => (-score, id) }
      .scanLeft(0L)((acc, r) => acc + r._3).drop(1)
    for (parts <- Seq(1, 3, 32)) {
      val sp = spark.newSession()
      sp.conf.set("spark.sql.shuffle.partitions", parts.toString)
      import sp.implicits._
      val df = sp.createDataset(rows).toDF("id", "score", "v")
      val got = ScaleOps.runningTotal(df, "v",
          Seq(col("score").desc, col("id").asc), cumCol = "cum")
        .orderBy("cum").select("cum").as[Long].collect().toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("runningTotal never plans a single-partition global window") {
    val df = spark.range(1000).toDF("id")
      .withColumn("v", col("id") % 7 + 1)
    val out = ScaleOps.runningTotal(df, "v", Seq(col("id").asc))
    // the window must be keyed by the range-partition id, not empty: an
    // empty partition spec is the 100 TB-killing all-rows-to-one-task shape
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
      "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isEmpty,
      s"found a partition-less window:\n$plan")
    assert(plan.contains("__pid") || plan.toLowerCase.contains("window"),
      "sanity: the running sum should still be a window")
  }

  test("saltedJoin equals the plain join result under heavy skew") {
    // 10k rows, 90% on one key — the shape that melts a single reducer
    val fact = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, 1L).otherwise(col("id"))).as("k"),
        col("id").as("payload"))
    val dim = Seq((1L, "hot"), (2L, "a"), (30L, "b"), (4000L, "c"))
      .toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "payload", "name")
    val salted = ScaleOps.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key across many partitions") {
    // ~every row on k=1; dim has several keys so the join can't be
    // optimized away into a project (Spark eliminates single-row joins)
    val fact = spark.range(8000)
      .select(when(col("id") % 100 === 0, col("id") % 4).otherwise(1L).as("k"),
        col("id").as("payload"))
      .repartition(8)
    val dim = spark.range(0, 4).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    // disable broadcast so the join actually shuffles on the join key
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "16") {
      val salted = ScaleOps.saltedJoin(fact, dim, "k", saltFactor = 8)
      val sizes = salted.groupBy(spark_partition_id().as("p")).count()
        .select("count").as[Long].collect()
      // 8 salts hash into 16 reducers; a few may collide, but the hot key
      // must no longer live on a single reducer
      assert(sizes.length >= 5, s"hot key stayed on ${sizes.length} partitions")
      assert(sizes.max < 8000, s"one reducer still holds everything: ${sizes.toSeq}")
      val plainSizes = fact.join(dim, "k")
        .groupBy(spark_partition_id().as("p")).count()
        .select("count").as[Long].collect()
      // unsalted: the hot key's ~99% of rows land on one reducer
      assert(plainSizes.max >= 7000,
        s"expected one hot reducer in the unsalted join: ${plainSizes.toSeq}")
    }
  }

  test("saltedDistinctList equals the unsalted distinct collection") {
    import spark.implicits._
    // hot key 0 holds half of all rows; values collide across the salt
    // slices only by equality, so the flattened level-2 arrays must be
    // exactly the distinct sets of the one-shot collect
    val df = spark.range(4000).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 7).as("k"),
      concat(lit("v"), (col("id") % 40)).as("v"))
    val got = ScaleOps.saltedDistinctList(df, "k", "v", saltFactor = 8)
      .select(col("k"), concat_ws(",", col("vals")).as("csv"))
      .as[(Long, String)].collect().toMap
    val want = df.groupBy("k")
      .agg(concat_ws(",", array_sort(collect_set(col("v")))).as("csv"))
      .as[(Long, String)].collect().toMap
    assert(got == want)
    // the level-1 spread is real: the hot key's values arrive as
    // multiple bounded slices, not one task-sized set
    val slices = df
      .withColumn("__salt", pmod(xxhash64(col("v")), lit(8)))
      .where(col("k") === 0)
      .select("__salt").distinct().count()
    assert(slices > 1, s"salt must spread the hot key's values, got $slices slice(s)")
  }

  test("bucketed tables join without any shuffle exchange") {
    val left = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("x"))
    val right = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("y"))
    ScaleOps.writeBucketed(left, "bkt_left", "k", 4)
    ScaleOps.writeBucketed(right, "bkt_right", "k", 4)
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(joined.count() == 1000)
      assert(ScaleOps.shuffleFree(joined),
        joined.queryExecution.executedPlan.toString.take(2000))
    }
  }

  test("aggregation on the bucket key is also shuffle-free") {
    val df = spark.range(1000).select(col("id").as("k"), col("id").as("v"))
    ScaleOps.writeBucketed(df, "bkt_agg", "k", 4)
    val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v"))
    assert(agg.count() == 1000)
    assert(ScaleOps.shuffleFree(agg),
      agg.queryExecution.executedPlan.toString.take(2000))
  }

  test("asofJoin: latest at-or-before match per key, nulls when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), // after both views -> matches v2 (ts 90)
      (2L, "u1", 50L),  // ts tie with v1 -> at-or-before matches v1
      (3L, "u1", 10L),  // before every view -> null
      (4L, "u2", 500L)  // key with no right rows -> null
    ).toDF("event_id", "k", "ts")
    val right = Seq(("u1", 50L, 1001L), ("u1", 90L, 1002L))
      .toDF("k", "ts", "vid")
    val out = ScaleOps.asofJoin(left, right, "k", "ts", "ts", Seq("vid"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      1L -> Some(1002L), 2L -> Some(1001L), 3L -> None, 4L -> None))
  }

  test("asofJoin plans one shuffle on the key, no range join") {
    import spark.implicits._
    val left = spark.range(100).select(
      col("id").as("event_id"), (col("id") % 5).as("k"), col("id").as("ts"))
    val right = spark.range(50).select(
      (col("id") % 5).as("k"), (col("id") * 2).as("ts"), col("id").as("vid"))
    val out = ScaleOps.asofJoin(left, right, "k", "ts", "ts", Seq("vid"))
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "as-of must not degrade to a range/cross join:\n" + plan.take(2000))
  }

  test("intervalJoin equals the naive range join, including bin boundaries") {
    import spark.implicits._
    // timestamps engineered to cross bin boundaries and hit the
    // inclusive window endpoint exactly
    val left = Seq(
      (1L, "u1", "2024-01-01 00:04:30"),
      (2L, "u1", "2024-01-01 00:05:00"),
      (3L, "u2", "2024-01-01 00:00:00"))
      .toDF("event_id", "k", "t")
      .select(col("event_id"), col("k"), col("t").cast("timestamp").as("ts"))
    val right = Seq(
      ("u1", "2024-01-01 00:04:30", 10L), // == left ts -> match (inclusive)
      ("u1", "2024-01-01 00:09:30", 11L), // exactly +5min from event 1 -> match
      ("u1", "2024-01-01 00:09:31", 12L), // 1s past event 1's window
      ("u2", "2024-01-01 00:04:59", 13L),
      ("u2", "2024-01-01 00:05:01", 14L)) // past u2's window
      .toDF("k", "t", "rid")
      .select(col("k"), col("t").cast("timestamp").as("ts"), col("rid"))
    val got = ScaleOps.intervalJoin(left, right, "k", "ts", "ts", 300L, Seq("rid"))
      .select("event_id", "match_rid").as[(Long, Long)].collect().toSet
    val want = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.ts") >= col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr("INTERVAL 300 SECOND"))
      .select(col("l.event_id"), col("r.rid")).as[(Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L)))
  }

  test("AQE splits a skewed sort-merge join at runtime (the moderate-skew path)") {
    // saltedJoin is the pathological-skew tool; MODERATE skew is handled
    // by AQE's skew-join splitting — pin that the engine's config story
    // actually engages it. One key holds ~90% of the fact side.
    import org.apache.spark.sql.functions._
    val fact = spark.range(40000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = spark.range(40000).select(col("id").as("k"), (col("id") * 2).as("v"))
    withSqlConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = fact.join(dim, "k")
      // execute THIS queryExecution (count() would plan a fresh one and
      // leave this plan un-finalized), then read the final adaptive plan
      assert(joined.collect().length == 40000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the hot partition's join as skew-split:\n$p")
    }
  }

  test("zorderKey matches a reference Morton interleave bit-for-bit") {
    import org.apache.spark.sql.functions.col
    def ref(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (-1L, 7L), (1L << 40, 3L))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.ScaleOps.zorderKey(col("a"), col("b"), 16).as("z"))
      .as[(Long, Long, Long)].collect().toSet
    val want = rows.map { case (a, b) =>
      (a, b, ref(a & 65535L, b & 65535L, 16))
    }.toSet
    assert(got == want)
  }

  test("zorderKeySql (the oracle twin) equals zorderKey under Spark's own SQL engine") {
    // guards the p21/q37 oracles from drift: the SQL fragment and the
    // Column implementation must agree on every bit, including the mask
    import org.apache.spark.sql.functions.col
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L),
      (65535L, 65535L), (12345L, 54321L), (-1L, 7L), (1L << 40, 3L))
    for (bits <- Seq(10, 16)) {
      val df = rows.toDF("a", "b")
      val got = df.select(
          graft.functions.ScaleOps.zorderKey(col("a"), col("b"), bits).as("zc"),
          org.apache.spark.sql.functions.expr(
            graft.functions.ScaleOps.zorderKeySql("a", "b", bits)).as("zs"))
        .as[(Long, Long)].collect()
      got.foreach { case (zc, zs) =>
        assert(zc == zs, s"bits=$bits: Column=$zc SQL=$zs")
      }
    }
  }

  test("zorderRepartition: partitions cover small boxes in BOTH dims") {
    import org.apache.spark.sql.functions._
    // a 64x64 grid, shuffled arrival order
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
      .repartition(7)
    val parts = 16
    val z = graft.functions.ScaleOps.zorderRepartition(grid, "x", "y", parts, bits = 6)
    assert(z.queryExecution.executedPlan.toString.contains("rangepartitioning"),
      "layout must be a range partition on the Morton key")
    val boxes = z
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .as[(Int, Long, Long)].collect()
    assert(boxes.length == parts)
    // a lexicographic (x,y) sort would give dy = 63 for every slab; the
    // Z-order layout bounds the box in both dimensions
    boxes.foreach { case (p, dx, dy) =>
      assert(dx <= 24 && dy <= 24, s"partition $p box ${dx}x$dy too wide")
    }
  }

  test("integerPageRank matches a driver replay and is partitioning-invariant") {
    // star (0 <-> 1,2,3) + isolated 4: hub must outrank leaves, leaves
    // outrank the dangling node; every value replayed exactly
    val verts = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val undirected = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val edges = (undirected ++ undirected.map(_.swap)).toDF("src", "dst")
    def replay(): Map[Long, Long] = {
      val deg = Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 3L -> 1L)
      val adjIn = Map[Long, Seq[Long]](0L -> Seq(1L, 2L, 3L),
        1L -> Seq(0L), 2L -> Seq(0L), 3L -> Seq(0L), 4L -> Seq())
      var r = Seq(0L, 1L, 2L, 3L, 4L).map(v => v -> 1000000L / 5).toMap
      for (_ <- 1 to 10) {
        r = adjIn.map { case (v, ins) =>
          v -> (150000L / 5 +
            85L * ins.map(u => r(u) / deg(u)).sum / 100L)
        }
      }
      r
    }
    val expected = replay()
    for (parts <- Seq(2, 7)) {
      val got = ScaleOps.integerPageRank(verts.repartition(parts), "id",
          edges.repartition(parts), "src", "dst", iters = 10)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
    // the distributed loop (forced via smallEdgeLimit = 0) computes the
    // IDENTICAL fixpoint as the driver fast path
    val distributed = ScaleOps.integerPageRank(verts, "id",
        edges, "src", "dst", iters = 10, smallEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(distributed == expected, "fast path and distributed loop diverge")
    assert(expected(0L) > expected(1L) && expected(1L) > expected(4L),
      "hub > leaf > dangling")
  }

  test("integerPageRank: phantom edge endpoints behave identically on both paths") {
    // edges referencing ids absent from the vertex table: phantom
    // sources hold no rank (contribute nothing), phantom dsts emit no
    // row — on the fast path AND the distributed path
    val verts = Seq(1L, 2L).toDF("id")
    val edges = Seq((9L, 1L), (1L, 2L), (2L, 7L)).toDF("src", "dst")
    val fast = ScaleOps.integerPageRank(verts, "id", edges, "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    val dist = ScaleOps.integerPageRank(verts, "id", edges, "src", "dst", 3,
        smallEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist, s"fast $fast vs distributed $dist")
    assert(fast.keySet == Set(1L, 2L), "phantom ids must not appear")
  }

  test("integerPageRank: non-long edge id columns fall back to the distributed path") {
    val verts = Seq(1L, 2L).toDF("id")
    val edges = Seq((1, 2), (2, 1)).toDF("src", "dst") // IntegerType ids
    // must not ClassCastException — the fast path requires long ids on
    // BOTH tables and this input only qualifies for the distributed loop
    val out = ScaleOps.integerPageRank(verts, "id", edges, "src", "dst", 2)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L) && out.values.forall(_ > 0L))
  }

  private def withSqlConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
