package graft

import graft.operators.UnigramLm
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def wt(rows: (String, Long)*) = rows.toDF("word", "freq")

  test("seedVocab keeps every character and the top multi-char substrings") {
    val seed = UnigramLm.seedVocab(
      wt(("abab", 10L), ("abc", 5L)), maxPieceLen = 2, vocabSize = 6,
      maxWordLen = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // chars: a(10*2+5), b(10*2+5), c(5); multis ranked by count:
    // ab(10*2+5=25), ba(10), bc(5) -> top 3 = ab, ba, bc but budget is
    // 6 - 3 chars = 3 multis
    assert(seed.keySet == Set("a", "b", "c", "ab", "ba", "bc"), seed)
    assert(seed("a") == 25L && seed("ab") == 25L && seed("ba") == 10L)
  }

  test("segmented picks the max-likelihood split; ties prefer shorter last piece") {
    val lp = Map("a" -> -1.0, "b" -> -2.0, "ab" -> -2.5)
    val seg = UnigramLm.segmented(wt(("ab", 1L), ("aab", 1L)), lp, 2)
      .select(col("word"), col("pieces")).as[(String, Seq[String])]
      .collect().toMap
    // "ab": [a,b] = -3 < [ab] = -2.5 -> one piece
    assert(seg("ab") == Seq("ab"), seg)
    // "aab": best is [a]+[ab] = -3.5 (backtrace emits last piece first)
    assert(seg("aab").sorted == Seq("a", "ab"), seg)
    // exact tie between [a,a] (-2) and [aa] (-2): shorter last piece wins
    val tie = UnigramLm.segmented(wt(("aa", 1L)), Map("a" -> -1.0, "aa" -> -2.0), 2)
      .select(col("pieces")).as[Seq[String]].head()
    assert(tie == Seq("a", "a"), tie)
  }

  test("train is deterministic and its trajectory re-estimates from Viterbi counts") {
    val types = wt(("abab", 8L), ("ab", 4L), ("ba", 2L), ("b", 1L))
    val (traj1, lp1) = UnigramLm.train(types, maxPieceLen = 2,
      vocabSize = 5, iters = 2, maxWordLen = 8)
    val (traj2, lp2) = UnigramLm.train(types, maxPieceLen = 2,
      vocabSize = 5, iters = 2, maxWordLen = 8)
    assert(lp1 == lp2)
    val t1 = traj1.orderBy("iter", "piece").collect().toSeq
    assert(t1 == traj2.orderBy("iter", "piece").collect().toSeq)
    // vocab = chars {a, b} + the only two multis {ab, ba}; 3 iterations
    // of rows (0, 1, 2)
    val byIter = t1.groupBy(_.getInt(0)).view.mapValues(_.size).toMap
    assert(byIter.keySet == Set(0, 1, 2) && byIter.values.toSet == Set(4))
    // probabilities are valid and snapped
    t1.foreach { r =>
      val p = r.getDouble(2)
      assert(p > 0 && p < 1 && p == math.floor(p * 1e6 + 0.5) / 1e6)
    }
    // after EM, "ab" (the dominant piece) must out-weigh single chars
    val last = t1.filter(_.getInt(0) == 2)
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(last("ab") > last("a") && last("ab") > last("b"), last)
  }

  test("encodeCounts joins the segmented dictionary; long words fall back to chars") {
    val docs = Seq((1L, "abab ab"), (2L, "abababababab b"))
      .toDF("doc_id", "text")
    val (_, lp) = UnigramLm.train(wt(("abab", 8L), ("ab", 4L), ("b", 1L)),
      maxPieceLen = 2, vocabSize = 5, iters = 1, maxWordLen = 8)
    val counts = UnigramLm.encodeCounts(docs, lp, "doc_id", "text",
        maxPieceLen = 2, maxWordLen = 8)
      .as[(Long, Long)].collect().toMap
    // "abab" -> [ab, ab] (2), "ab" -> [ab] (1) under any trained model
    // that keeps lp(ab) > lp(a)+lp(b); doc 2's 12-char word exceeds
    // maxWordLen -> 12 single chars, plus "b" (1)
    assert(counts(1L) == 3L, counts)
    assert(counts(2L) == 13L, counts)
  }

  test("libm-ln boundary guard (round 16): a half-grid log-prob fails loudly, neighbors pass") {
    import graft.operators.UnigramLm
    // constructed boundary case: y0 = -0.5000005 sits exactly on an r6
    // half-boundary (y0*1e6 + 0.5 = -500000, an integer); exp then log
    // reproduces y0 to ~1 ulp, far inside the 2e-8-grid-unit guard window
    val xBad = math.exp(-0.5000005)
    val e = intercept[IllegalArgumentException] { UnigramLm.lnR6Guarded(xBad) }
    assert(e.getMessage.contains("half-boundary"), e.getMessage)
    // 0.3 grid units off the boundary: passes and equals the plain snap
    val xOk = math.exp(-0.5000002)
    assert(UnigramLm.lnR6Guarded(xOk) ===
      math.floor(math.log(xOk) * 1e6 + 0.5) / 1e6)
    // ordinary smoothed ratios sail through (fire probability ~4e-8/value)
    for (c <- 0 to 60) UnigramLm.lnR6Guarded((c + 1.0) / (1000.0 + 61))
  }
}
