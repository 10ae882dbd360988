package graft

import graft.functions.UnigramLM

/** Gates for the unigram-LM tokenizer (no DuckDB oracle — float EM):
  * EM likelihood monotonicity, Viterbi optimality vs brute force,
  * partitioning invariance of the trained vocabulary (the fixed-point
  * determinism claim), char retention / segmentability, and that
  * training actually discovers the planted multi-char pieces. */
class UnigramLMSuite extends SparkSuite {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private val planted = corpus(
    (0L, "ababab abab ab ababab"),
    (1L, "cdcd cd cdcd ababab"),
    (2L, "ab cd ab cd abab"),
    (3L, "xyz xyz ababab cdcd"),
  )

  test("training discovers planted repeated pieces and keeps every char") {
    val m = UnigramLM.train(planted, "text", vocabSize = 12)
    val pieces = m.pieces.map(_._1).toSet
    assert(pieces.contains("ab"), s"expected 'ab' in $pieces")
    for (c <- "abcdxyz") assert(pieces.contains(c.toString), s"char $c dropped")
    assert(m.pieces.size <= 12 + 7) // target plus char floor slack
    // probabilities normalized-ish: all negative logprobs
    assert(m.pieces.forall(_._2 < 0.0))
  }

  test("corpus log-likelihood is non-decreasing within each EM fit") {
    val m = UnigramLM.train(planted, "text", vocabSize = 12, emIters = 3)
    // the trace interleaves prune rounds (which drop mass); within one
    // emPass the fixed-point loglik must not decrease after iteration 1
    // (iter-1 likelihood is measured under the PRE-update weights).
    // emIters = 3 -> every fit contributes windows of 3 consecutive
    // entries; check the strictly-within-fit pairs (positions 1->2).
    val t = m.loglikTrace
    assert(t.nonEmpty)
    t.grouped(3).foreach { fit =>
      if (fit.length == 3) {
        assert(fit(2) >= fit(1) - math.abs(fit(1)) * 1e-9,
          s"EM decreased loglik within a fit: $fit")
      }
    }
  }

  test("Viterbi segmentation equals brute-force best segmentation") {
    val m = UnigramLM.train(planted, "text", vocabSize = 12)
    val lp = m.logProbs
    val maxLen = m.maxPieceLen
    def brute(w: String): Double = {
      if (w.isEmpty) 0.0
      else (1 to math.min(w.length, maxLen)).foldLeft(Double.NegativeInfinity) {
        (acc, k) =>
          lp.get(w.substring(0, k)) match {
            case Some(p) =>
              val rest = brute(w.substring(k))
              math.max(acc, if (rest == Double.NegativeInfinity) rest else p + rest)
            case None => acc
          }
      }
    }
    for (w <- Seq("ababab", "abcd", "cdab", "xyzab", "aaxb", "ab", "a")) {
      val seg = UnigramLM.segment(w, lp, maxLen)
      val bruteBest = brute(w)
      if (bruteBest == Double.NegativeInfinity) assert(seg.isEmpty, w)
      else {
        assert(seg.mkString("") == w, s"segmentation must concatenate to $w")
        val segScore = seg.map(lp).sum
        assert(math.abs(segScore - bruteBest) <= 1e-12,
          s"$w: viterbi $segScore vs brute $bruteBest ($seg)")
      }
    }
  }

  test("trained vocabulary is invariant to input partitioning") {
    val a = UnigramLM.train(planted.repartition(2), "text", vocabSize = 12)
    val b = UnigramLM.train(planted.repartition(7), "text", vocabSize = 12)
    assert(a.pieces.map { case (p, l) => (p, math.floor(l * 1e9).toLong) } ==
      b.pieces.map { case (p, l) => (p, math.floor(l * 1e9).toLong) },
      "fixed-point EM must be partitioning-invariant")
  }

  test("viterbiMinPieces = brute-force (max score, then min pieces)") {
    // words checked against exhaustive enumeration over a small vocab
    // (including "ba" so greedy-looking splits lose to cross-boundary
    // ones: "abab" = a+ba+b at -3.5e6 beats ab+ab at -4e6)
    val wgt = Map[String, Long](
      "a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L,
      "ba" -> -1500000L, "c" -> -3000000L, "abc" -> -2500000L)
    val maxLen = 3
    def brute(w: String): Option[(Long, Int)] = {
      if (w.isEmpty) Some((0L, 0))
      else (1 to math.min(w.length, maxLen)).flatMap { k =>
        wgt.get(w.substring(0, k)).flatMap { p =>
          brute(w.substring(k)).map { case (s, n) => (s + p, n + 1) }
        }
      } match {
        case Seq() => None
        // max score, then min pieces — the pinned-rollout objective
        case cands => Some(cands.maxBy { case (s, n) => (s, -n) })
      }
    }
    for (w <- Seq("abab", "ababab", "abc", "abcabc", "cab", "bac",
        "aaaa", "abba", "cba", "a", "", "abd")) {
      val got = UnigramLM.viterbiMinPieces(w, wgt, maxLen)
      brute(w) match {
        case None => assert(got == 0L, s"$w: unsegmentable must be 0, got $got")
        case Some((_, n)) if w.isEmpty => assert(got == 0L)
        case Some((_, n)) => assert(got == n.toLong, s"$w: got $got want $n")
      }
    }
    // deliberate exact tie: with ab = a+b exactly, "abab" scores
    // -4e6 via ab+ab (2), a+b+ab (3), and a+b+a+b (4) — min-pieces
    // tie-break must pick 2
    val tieWgt = Map[String, Long](
      "a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L)
    assert(UnigramLM.viterbiMinPieces("abab", tieWgt, 2) == 2L,
      "tie must break toward fewest pieces")
  }

  test("pinnedSegmentStats is partitioning-invariant and fertility >= 1") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = UnigramLM.pinnedSegmentStats(docs.repartition(2), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val b = UnigramLM.pinnedSegmentStats(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(a == b, "pinned rollout must be partitioning-invariant")
    assert(a.length == 500)
    a.foreach { case (id, nt, np) =>
      assert(np >= nt, s"doc $id: pieces $np < tokens $nt")
    }
  }

  test("every corpus word segments (char floor) and fertility >= 1") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = UnigramLM.train(docs, "text", vocabSize = 128)
    val stats = UnigramLM.segmentStats(docs, "doc_id", "text", m)
      .as[(Long, Long, Long)].collect()
    assert(stats.length == 500)
    stats.foreach { case (id, nt, np) =>
      assert(np >= nt, s"doc $id: pieces $np < tokens $nt (unsegmentable word)")
    }
    // the tokenizer must COMPRESS vs chars: planted corpus text has
    // multi-char regularities, so total pieces < total chars
    val totalPieces = stats.map(_._3).sum
    val totalChars = docs.as[(Long, String, String, String, Long)]
      .collect().map(_._2.split("\\s+").filter(_.nonEmpty).map(_.length).sum).sum
    assert(totalPieces < totalChars,
      s"no compression: $totalPieces pieces vs $totalChars chars")
  }
}
