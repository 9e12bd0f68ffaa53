package graft

import graft.operators.{MinHashLSH, SimHash, SubstringDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured recall of the approximate dedup family against its exact
  * twins on the sf0.01 documents corpus — the numbers behind DESIGN.md
  * §4's approximation-quality table. Each test PRINTS the measured value
  * (so the table can be refreshed from a test run) and asserts a floor a
  * regression would break. Floors are set below the measured values by a
  * margin, not at them: the corpus is fixed, but hash/seed changes shift
  * individual pairs.
  */
class RecallSpec extends SparkSpec {

  private lazy val docs: DataFrame =
    Tables.documents(spark, sf("sf0.01")).select(col("doc_id"), col("text"))

  // ---------------------------------------------------------------- winnow

  test("winnowed spans vs exact spans: char recall and long-run detection") {
    val k = 8
    val w = 8
    // k=8 (not q100's 20): the sf0.01 corpus is word-soup with a small
    // vocabulary, so k=8 yields a rich span structure (thousands of spans
    // of widely varying length) — the interesting regime for winnowing.
    val exact = SubstringDedup
      .duplicatedSpans(docs, "doc_id", "text", k = k)
      .select(col("doc_id"), col("span_start").as("es"), col("span_end").as("ee"))
      .localCheckpoint()
    val winnow = SubstringDedup
      .winnowedSpans(docs, "doc_id", "text", k = k, w = w)
      .select(col("doc_id"), col("span_start").as("ws"), col("span_end").as("we"))
      .localCheckpoint()

    // per-doc interval intersection: both span sets are disjoint within a
    // doc (islands are maximal), so covered chars = sum of pairwise overlaps
    val overlap = exact.join(winnow, Seq("doc_id"))
      .filter(col("ws") <= col("ee") && col("we") >= col("es"))
    val covered = overlap
      .select((least(col("ee"), col("we")) -
        greatest(col("es"), col("ws")) + 1).as("ov"))
      .agg(sum(col("ov"))).first().getLong(0)
    val totalExact = exact.select(sum(col("ee") - col("es") + 1))
      .first().getLong(0)
    val charRecall = covered.toDouble / totalExact

    // detection rate of exact spans long enough for the winnowing
    // guarantee (>= w+k-1 chars): each such span contains a duplicated run
    // that must share a fingerprint — unless the span is a merge of
    // shorter runs duplicated with DIFFERENT partners, so measured, not 1.0
    val longSpans = exact.filter(col("ee") - col("es") + 1 >= w + k - 1)
      .localCheckpoint()
    val nLong = longSpans.count()
    val nLongHit = longSpans.join(winnow, Seq("doc_id"))
      .filter(col("ws") <= col("ee") && col("we") >= col("es"))
      .select(col("doc_id"), col("es")).distinct().count()
    val longDetect = nLongHit.toDouble / nLong

    // shuffle-volume saving: fraction of gram positions that survive
    // winnowing (theory: ~2/(w+1) of positions selected)
    val nPos = docs.filter(length(col("text")) >= k)
      .select(sum(length(col("text")) - (k - 1))).first().getLong(0)
    val nFp = SubstringDedup.winnowedFingerprints(docs, "doc_id", "text",
      k = k, w = w, oracleParityHash = false, segmentLen = 4088).count()

    println(f"[recall] winnow(k=$k,w=$w) charRecall=$charRecall%.4f " +
      f"longRunDetect=$longDetect%.4f (n=$nLong) " +
      f"positionsKept=${nFp.toDouble / nPos}%.4f (theory ~${2.0 / (w + 1)}%.4f)")
    assert(charRecall >= 0.93, f"winnow char recall $charRecall%.4f")
    assert(longDetect >= 0.98, f"long-run detection $longDetect%.4f")
    assert(nFp.toDouble / nPos <= 0.35,
      f"winnowing kept ${nFp.toDouble / nPos}%.4f of positions — no saving")
  }

  // ------------------------------------------------------------- lsh pairs

  test("minhash-lsh candidate recall vs exact word-shingle jaccard") {
    val lsh = MinHashLSH(numHashes = 12, numBands = 3, shingleSize = 1)
    val cand = lsh.candidatePairs(docs, "doc_id", "text")
      .select(col("id_a"), col("id_b")).localCheckpoint()

    // exact all-pairs Jaccard — affordable at 500 docs (125k pairs); the
    // bounded-oracle trick q29 uses, here over the whole sf0.01 corpus
    val sets = docs.select(col("doc_id").as("id"),
      array_distinct(lsh.shingles(col("text"))).as("s"))
    val truth = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s")))).as("j"))
      .filter(col("j") >= 0.5).localCheckpoint()

    def recallAt(t: Double): (Double, Long) = {
      val tp = truth.filter(col("j") >= t)
      val n = tp.count()
      val hit = tp.join(cand, Seq("id_a", "id_b"), "left_semi").count()
      (hit.toDouble / n, n)
    }
    val (r90, n90) = recallAt(0.90)
    val (r80, n80) = recallAt(0.80)
    val (r70, n70) = recallAt(0.70)
    // the b=3, r=4 S-curve: P(candidate) = 1 - (1 - s^4)^3
    def scurve(s: Double): Double = 1 - math.pow(1 - math.pow(s, 4), 3)
    println(f"[recall] lsh(12,3) jaccard>=0.9: $r90%.4f (n=$n90, curve ${scurve(0.9)}%.4f) " +
      f">=0.8: $r80%.4f (n=$n80, curve ${scurve(0.8)}%.4f) " +
      f">=0.7: $r70%.4f (n=$n70, curve ${scurve(0.7)}%.4f)")
    assert(r90 >= 0.90, f"recall@0.9 = $r90%.4f")
    assert(r80 >= 0.70, f"recall@0.8 = $r80%.4f")
    // 0.7 is BELOW this config's S-curve knee — recorded, not asserted
    // high; the operator contract is "tune (b, r) to the threshold"
    assert(r70 >= 0.35, f"recall@0.7 = $r70%.4f")
  }

  // ---------------------------------------------------------- simhash bands

  test("simhash banded pairing is COMPLETE for hamming <= 3 on the corpus") {
    val sh = SimHash
    val banded = sh.candidatePairs(docs, "doc_id", "text",
        bands = 4, maxHamming = 3)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    val fps = docs.select(col("doc_id").as("id"),
      sh.simhashOfText(col("text")).as("fp"))
    val truth = fps.as("a").crossJoin(fps.as("b"))
      .filter(col("a.id") < col("b.id"))
      .filter(sh.hamming(col("a.fp"), col("b.fp")) <= 3)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val nTruth = truth.count()
    val nMissed = truth.join(banded, Seq("id_a", "id_b"), "left_anti").count()
    println(s"[recall] simhash(4 bands, hamming<=3): " +
      s"truth=$nTruth missed=$nMissed (pigeonhole theorem: must be 0)")
    assert(nMissed == 0, s"banded pairing missed $nMissed of $nTruth pairs")
  }
}
