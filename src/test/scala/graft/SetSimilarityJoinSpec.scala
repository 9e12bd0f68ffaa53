package graft

import graft.operators.SetSimilarityJoin
import org.apache.spark.sql.functions._

class SetSimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus: a few ubiquitous words, a long tail of rare ones —
  // the distribution real text has and prefix filtering exploits
  private val rng = new scala.util.Random(23)
  private val common = Vector("the", "a", "of", "and", "to")
  private val docs = (1 to 120).map { i =>
    val rare = (0 until 8).map(_ => s"w${rng.nextInt(600)}")
    (i.toLong, rng.shuffle(common ++ rare).distinct.mkString(" "))
  }
  private val withCopies = docs ++ docs.take(12).map { case (id, t) => (id + 1000L, t) }
  private val df = withCopies.toDF("doc_id", "text")

  private def brute(thr: Double): Set[(Long, Long)] = {
    val sets = df.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("s"))
    sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", round(size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
        size(array_union(col("a.s"), col("b.s"))), 4))
      .filter(col("j") >= thr)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
  }

  test("no false negatives: prefix-filtered join equals brute force at several thresholds") {
    for (thr <- Seq(0.5, 0.7, 0.9)) {
      val got = SetSimilarityJoin.join(df, "doc_id", "text", thr)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute(thr), s"threshold $thr diverged from brute force")
    }
  }

  test("threshold compares the unrounded Jaccard, not the 4-place rounding") {
    // pair at jaccard EXACTLY 1/3: inter {a,b} = 2, union = 6. Rounded to
    // 4 places (0.3333) it sits BELOW 1.0/3 — filtering on the rounded
    // value would drop a true match at an unrepresentable threshold
    val exactThird = Seq(
      (1L, "a b p q"), (2L, "a b r s")).toDF("doc_id", "text")
    val hit = SetSimilarityJoin.join(exactThird, "doc_id", "text", 1.0 / 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(hit == Set((1L, 2L)), s"true 1/3 match dropped: $hit")
    // pair at 13999/19999 = 0.699985 < 0.7, which ROUNDS to 0.7000 —
    // filtering after rounding would wrongly admit it at threshold 0.7
    val shared = (1 to 13999).map(i => s"s$i")
    val dA = (shared ++ (1 to 3000).map(i => s"a$i")).mkString(" ")
    val dB = (shared ++ (1 to 3000).map(i => s"b$i")).mkString(" ")
    val nearMiss = Seq((1L, dA), (2L, dB)).toDF("doc_id", "text")
    val admitted = SetSimilarityJoin.join(nearMiss, "doc_id", "text", 0.7)
      .count()
    assert(admitted == 0, "0.699985 pair admitted at threshold 0.7")
  }

  test("exact duplicates always survive at threshold 1.0") {
    val got = SetSimilarityJoin.join(df, "doc_id", "text", 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (1L to 12L).foreach(id => assert(got.contains((id, id + 1000L)),
      s"exact copy pair ($id, ${id + 1000L}) lost"))
  }

  test("prefix filtering prunes hard on a Zipfian corpus") {
    val nCand = SetSimilarityJoin.prefixCandidates(df, "doc_id", "text", 0.7).count()
    val allPairs = withCopies.size.toLong * (withCopies.size - 1) / 2
    assert(nCand * 5 < allPairs,
      s"prefix filter kept $nCand of $allPairs pairs — no pruning")
  }
}
