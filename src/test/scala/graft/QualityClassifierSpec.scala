package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** [[QualityClassifier]] (q120/q121): feature shape, trainer determinism,
  * convergence on separable data, and honest accuracy vs the cascade labels
  * on the real corpus.
  */
class QualityClassifierSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())
  private lazy val feat = QualityClassifier.features(docs).localCheckpoint(true)
  private lazy val labels = QualityClassifier.cascadeLabels(docs).localCheckpoint(true)

  test("feature frame: every doc has exactly the engineered+bias slots, hashed ≤ 16") {
    val perDoc = feat.groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("slot") >= 16, 1).otherwise(0)).as("eng"))
    assert(perDoc.filter(col("eng") =!= 3).count() == 0)
    assert(perDoc.filter(col("n") > 16 + 3).count() == 0)
    // hashed slots are L2-normalized: sum of squares ≈ 1 per doc (r4 rounding)
    val norms = feat.filter(col("slot") < 16)
      .groupBy("doc_id").agg(sum(col("x") * col("x")).as("ss"))
      .filter(abs(col("ss") - 1.0) > 0.01)
    assert(norms.count() == 0)
  }

  // round 18: the fused gate must equal the long-form compose exactly —
  // (doc_id, p, pred) sets compared on raw doubles, not a tolerance
  private def assertScoreDocsEqual(d: org.apache.spark.sql.DataFrame,
      w: Array[Double]): Unit = {
    val long = QualityClassifier.score(QualityClassifier.features(d), w)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val wide = QualityClassifier.scoreDocs(d, w)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(wide == long,
      s"scoreDocs diverged: only-long=${(long -- wide).take(3)} " +
        s"only-wide=${(wide -- long).take(3)}")
  }

  test("scoreDocs == score(features(docs)) on the real corpus, mixed weights") {
    val w = Array.tabulate(QualityClassifier.Dims)(i => (i % 5 - 2) * 0.37)
    assertScoreDocsEqual(docs, w)
  }

  test("scoreDocs == score∘features with all hashed weights zero (static skip)") {
    val w = Array.tabulate(QualityClassifier.Dims)(i =>
      if (i == 16) 1.0 else if (i == 17) -0.25 else if (i == 18) 0.1 else 0.0)
    assertScoreDocsEqual(docs, w)
  }

  test("scoreDocs == score∘features on degenerate docs (empty/blank/repeated text)") {
    import spark.implicits._
    val d = Seq(
      (1L, "", 0L),                      // empty text: no token rows
      (2L, "   ", 3L),                   // blank-only tokens filtered out
      (3L, "a a a a a a", 11L),          // one slot, heavy repeat
      (4L, "x", 1L),                     // single token
      (5L, "the quick brown fox jumps over lazy dog again and", 49L))
      .toDF("doc_id", "text", "n_chars")
    val mixed = Array.tabulate(QualityClassifier.Dims)(i => 0.1 * (i - 9))
    assertScoreDocsEqual(d, mixed)
    assertScoreDocsEqual(d, Array.tabulate(QualityClassifier.Dims)(i =>
      if (i >= 16) 0.5 else 0.0))
  }

  test("logistic GD separates a linearly separable planted corpus") {
    import spark.implicits._
    // y = 1 iff the length feature (slot 16) is positive; all other slots noise
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).flatMap { id =>
      val sign = if (id % 2 == 0) 1.0 else -1.0
      Seq((id, 16, sign * (0.5 + rnd.nextDouble())),
        (id, 17, rnd.nextDouble() - 0.5), (id, 18, 1.0))
    }
    val f = rows.toDF("doc_id", "slot", "x")
    val l = (0L until 200L).map(id => (id, if (id % 2 == 0) 1.0 else 0.0))
      .toDF("doc_id", "y")
    val w = QualityClassifier.trainLogistic(f, l, iters = 30, lr = 1.0)
    val scored = QualityClassifier.score(f, w).join(l, "doc_id")
    val wrong = scored.filter((col("pred") && col("y") === 0.0) ||
      (!col("pred") && col("y") === 1.0)).count()
    assert(wrong == 0, s"separable data must reach 100% train accuracy, $wrong wrong")
    assert(w(16) > 0, "the separating weight must be learned positive")
  }

  test("trainLogistic: driver fast-path == distributed trajectory (round 18)") {
    // real corpus (the q121 input shape, labeled-set size under the gate)
    val wDrv = QualityClassifier.trainLogistic(feat, labels, iters = 3)
    val wDst = QualityClassifier.trainLogisticDistributed(feat, labels, iters = 3)
    assert(wDrv.toSeq == wDst.toSeq,
      s"trajectory diverged on the corpus: ${wDrv.toSeq} vs ${wDst.toSeq}")
    // longer run compounds any per-step divergence
    val wDrv20 = QualityClassifier.trainLogistic(feat, labels, iters = 20, lr = 1.0)
    val wDst20 = QualityClassifier.trainLogisticDistributed(feat, labels, iters = 20, lr = 1.0)
    assert(wDrv20.toSeq == wDst20.toSeq)
    // planted frame with unlabeled docs (inner-join drop must match),
    // labeled docs missing feature rows, and a slot absent everywhere
    import spark.implicits._
    val f = ((0L until 60L).flatMap { id =>
      Seq((id, 16, (id % 7).toDouble / 7 - 0.5), (id, 18, 1.0)) ++
        (if (id % 3 == 0) Seq((id, 2, 0.125)) else Nil)
    } :+ (999L, 5, 0.25)).toDF("doc_id", "slot", "x") // 999 unlabeled
    val l = ((0L until 60L).map(id => (id, if (id % 2 == 0) 1.0 else 0.0)) :+
      (998L, 1.0)).toDF("doc_id", "y") // 998 labeled, featureless
    val a = QualityClassifier.trainLogistic(f, l, iters = 5)
    val b = QualityClassifier.trainLogisticDistributed(f, l, iters = 5)
    assert(a.toSeq == b.toSeq, s"planted trajectory diverged: ${a.toSeq} vs ${b.toSeq}")
  }

  test("trainLogistic is deterministic across runs") {
    val w1 = QualityClassifier.trainLogistic(feat, labels, iters = 3)
    val w2 = QualityClassifier.trainLogistic(feat, labels, iters = 3)
    assert(w1.toSeq == w2.toSeq)
  }

  test("more iterations do not hurt training loss (monotone-ish descent)") {
    def loss(w: Array[Double]): Double =
      QualityClassifier.score(feat, w).join(labels, "doc_id")
        .select(avg(-(col("y") * log(greatest(col("p"), lit(1e-12))) +
          (lit(1.0) - col("y")) *
            log(greatest(lit(1.0) - col("p"), lit(1e-12))))).as("l"))
        .collect()(0).getDouble(0)
    val l1 = loss(QualityClassifier.trainLogistic(feat, labels, iters = 1))
    val l5 = loss(QualityClassifier.trainLogistic(feat, labels, iters = 5))
    val l20 = loss(QualityClassifier.trainLogistic(feat, labels, iters = 20))
    assert(l5 <= l1 + 1e-9 && l20 <= l5 + 1e-9, s"loss rose: $l1 -> $l5 -> $l20")
  }

  test("Platt calibration reduces log-loss over the uncalibrated sigmoid") {
    import spark.implicits._
    // miscalibrated scorer: score = 4*y - 2 + noise-free offset — the raw
    // sigmoid(score) is overconfident; Platt must pull (a, b) toward a
    // better-calibrated map
    val scored = (0 until 200).map { i =>
      val y = if (i % 3 == 0) 1.0 else 0.0
      val s = (if (y == 1.0) 0.8 else -0.4) + (i % 7) * 0.01
      (i.toLong, s, y)
    }.toDF("doc_id", "score", "y")
    def loss(a: Double, b: Double): Double =
      scored.select(avg(-(col("y") *
        log(greatest(lit(1.0) / (lit(1.0) + exp(-(lit(a) * col("score") + lit(b)))), lit(1e-12))) +
        (lit(1.0) - col("y")) *
          log(greatest(lit(1.0) - lit(1.0) / (lit(1.0) + exp(-(lit(a) * col("score") + lit(b)))), lit(1e-12))))).as("l"))
        .collect()(0).getDouble(0)
    val (a, b) = QualityClassifier.calibratePlatt(scored, "score", "y",
      iters = 8, lr = 0.5)
    assert(loss(a, b) < loss(1.0, 0.0) - 1e-6,
      s"calibration did not reduce loss: (a=$a, b=$b)")
    // determinism: the snapped trajectory must replay exactly
    assert((a, b) == QualityClassifier.calibratePlatt(scored, "score", "y",
      iters = 8, lr = 0.5))
  }

  test("distillation accuracy on the real corpus beats the base rate") {
    val n = labels.count().toDouble
    val base = math.max(
      labels.filter(col("y") === 1.0).count() / n,
      labels.filter(col("y") === 0.0).count() / n)
    def acc(scored: org.apache.spark.sql.DataFrame): Double =
      scored.filter((col("pred") && col("y") === 1.0) ||
        (!col("pred") && col("y") === 0.0)).count() / n
    val centroidAcc = acc(QualityClassifier.centroidScores(feat, labels))
    val wLong = QualityClassifier.trainLogistic(feat, labels, iters = 50, lr = 2.0)
    val logisticAcc = acc(QualityClassifier.score(feat, wLong).join(labels, "doc_id"))
    info(f"base=$base%.3f centroid=$centroidAcc%.3f logistic=$logisticAcc%.3f")
    assert(centroidAcc > base, "centroid must beat predicting the majority class")
    assert(logisticAcc > base, "logistic must beat predicting the majority class")
  }
}
