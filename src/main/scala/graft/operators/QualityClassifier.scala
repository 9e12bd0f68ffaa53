package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Parity

/** In-engine trained quality classifier — the fastText-style "quality
  * filter" stage of an LLM data pipeline (linear model over hashed text
  * features: Joulin et al. 2017, "Bag of Tricks for Efficient Text
  * Classification"; the centroid form is Rocchio 1971 relevance feedback;
  * hashing trick: Weinberger et al. 2009), trained and scored entirely
  * in-plan, with no external ML runtime.
  *
  * The supervision story is DISTILLATION: the rule cascade (q97's
  * C4/Gopher-style filters) produces cheap weak labels, and a linear model
  * over hashed text features learns to imitate them — the standard way a
  * production pipeline turns a hand-tuned cascade into a scored, tunable
  * signal (score thresholds replace hard rules; borderline docs become
  * rankable instead of binary).
  *
  * Features (long form `(doc_id, slot, x)` so DuckDB mirrors them exactly,
  * the q96 precedent):
  *   - slots 0–15: the hashing-trick token counts, L2-normalized, r4 —
  *     IDENTICAL to q96's declared output (same hash, same rounding)
  *   - slot 16: ln(n_chars / 300) — length signal, centered at the corpus
  *     target length
  *   - slot 17: distinct-token ratio − 0.5 — diversity (anti-repetition)
  *   - slot 18: constant 1.0 — bias as a feature, so the intercept falls
  *     out of the same aggregates as every other weight
  *
  * Two trainers:
  *   - [[trainCentroid]]: closed-form nearest-class-centroid (Rocchio) —
  *     w = μ⁺ − μ⁻, midpoint intercept; ONE pass, two hash aggregates,
  *     zero iterations, fully expressible in ANSI SQL → q120 is
  *     oracle-checked end-to-end INCLUDING training.
  *   - [[trainLogistic]]: full-batch gradient descent on logistic loss —
  *     deterministic (no sampling, no shuffling; the "S" in SGD is
  *     deliberately dropped for engine-independence), weights snapped to
  *     r6 after every update so the training trajectory itself is
  *     bit-reproducible cross-engine → q121's 3-iteration run is
  *     oracle-checked against the same GD unrolled in DuckDB SQL.
  *
  * Scale posture: the feature frame is n·19 rows built by one token-stream
  * aggregate (map-side combined). Each GD iteration is one slot-keyed
  * 19-row broadcast join + one hash aggregate whose output is 19 rows —
  * the driver holds 19 doubles, the k-means-centroid pattern ([[SemDeDup]]).
  * Iteration plans restart from literal weights, so plan depth is CONSTANT
  * in the iteration count (no localCheckpoint chain needed, unlike
  * [[PageRank]] whose per-iteration state is |V|-sized and must stay
  * distributed).
  */
object QualityClassifier {

  /** Slots 0–15 hashed tokens; 16 length; 17 diversity; 18 bias. */
  val Dims = 19
  val HashSlots = 16

  /** Long-form feature frame `(doc_id, slot, x)` — see class doc. */
  def features(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", nCharsCol: String = "n_chars"): DataFrame = {
    val slot = pmod(graft.functions.TextHash.h60(col("tok")), lit(HashSlots.toLong))
    val hashed = docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextHash.tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), slot.as("slot"))
      .groupBy(col("doc_id"), col("slot"))
      .agg(count(lit(1)).as("c"))
      .withColumn("nrm", sqrt(sum(col("c") * col("c"))
        .over(Window.partitionBy(col("doc_id")))))
      .select(col("doc_id"), col("slot").cast("int").as("slot"),
        Parity.r4(col("c") / col("nrm")).as("x"))
    val toks = split(col(textCol), " ")
    val engineered = docs.select(col(idCol).as("doc_id"),
      // greatest(n_chars, 1): Spark's log returns NULL at n_chars<=0 while
      // DuckDB's ln() RAISES — an empty document would silently drop this
      // feature row here and error the whole oracle query there. Clamped
      // identically in the featSql prelude (round-8 review).
      Parity.r4(log(greatest(col(nCharsCol), lit(1)) / lit(300.0))).as("x_len"),
      Parity.r4(size(array_distinct(toks)).cast("double") / size(toks) - lit(0.5))
        .as("x_div"))
    hashed.unionByName(
      engineered.select(col("doc_id"), lit(16).as("slot"), col("x_len").as("x")))
      .unionByName(
        engineered.select(col("doc_id"), lit(17).as("slot"), col("x_div").as("x")))
      .unionByName(
        docs.select(col(idCol).as("doc_id"), lit(18).as("slot"), lit(1.0).as("x")))
  }

  /** The q97 rule-cascade label as a row-wise COLUMN — the single
    * definition behind [[cascadeLabels]] and every caller that computes
    * the label in place instead of joining the label frame back (q124:
    * the join was a doc_id-keyed self-join for a projection).
    */
  def cascadeLabelCol(textCol: String = "text", nCharsCol: String = "n_chars",
      langCol: String = "lang"): Column = {
    val toks = split(col(textCol), " ")
    val total = size(toks)
    val dis = size(array_distinct(toks))
    when((col(nCharsCol) >= 100) && (col(nCharsCol) <= 500) &&
      ((total - dis) * 100 <= total * 55) &&
      col(langCol).isin("en", "de", "fr", "es", "zh"), 1.0)
      .otherwise(0.0)
  }

  /** Weak labels from the q97 rule cascade: `(doc_id, y)` with y ∈ {0.0, 1.0}
    * (1 = kept by every rule). */
  def cascadeLabels(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", nCharsCol: String = "n_chars",
      langCol: String = "lang"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      cascadeLabelCol(textCol, nCharsCol, langCol).as("y"))

  /** Closed-form centroid (Rocchio) classifier, entirely in-plan: per-class
    * per-slot means over the IMPLICIT-ZERO feature space (sum over present
    * rows / class size — missing (doc, slot) rows are zeros and must count
    * in the denominator), w = μ⁺ − μ⁻ with the midpoint intercept
    * b = −(‖μ⁺‖² − ‖μ⁻‖²)/2 added to the bias slot's contribution. Means
    * are r6-snapped BEFORE the dot product so both engines score identical
    * weights. Returns `(doc_id, score, pred, y)`; score r4.
    */
  def centroidScores(feat: DataFrame, labels: DataFrame): DataFrame = {
    val counts = labels.groupBy(col("y")).agg(count(lit(1)).as("n_c"))
    val mu = feat.join(labels, "doc_id")
      .groupBy(col("slot"), col("y")).agg(sum(col("x")).as("sx"))
      .join(broadcast(counts), "y")
      .select(col("slot"), col("y"), Parity.r6(col("sx") / col("n_c")).as("mu"))
    // w_s = mu+ - mu-;  half-norm term for the midpoint intercept
    val w = mu.groupBy(col("slot")).agg(
      sum(when(col("y") === 1.0, col("mu")).otherwise(-col("mu"))).as("w"),
      sum(when(col("y") === 1.0, col("mu") * col("mu"))
        .otherwise(-col("mu") * col("mu"))).as("sqdiff"))
    val b = w.agg((-sum(col("sqdiff")) / 2).as("b"))
    feat.join(broadcast(w.select(col("slot"), col("w"))), "slot")
      .groupBy(col("doc_id")).agg(sum(col("x") * col("w")).as("dot"))
      .crossJoin(broadcast(b))
      .join(labels, "doc_id")
      .select(col("doc_id"), Parity.r4(col("dot") + col("b")).as("score"),
        (col("dot") + col("b") > 0).as("pred"), col("y"))
  }

  /** Full-batch logistic-loss gradient descent. Deterministic: fixed
    * iteration count, no sampling, gradients from one hash aggregate, and
    * (when `snapR6`, the cross-engine parity mode) weights rounded to 1e-6
    * after every update — the rounding grid exceeds float noise in the
    * ≤n-term gradient sums by ~6 orders of magnitude, so the whole training
    * TRAJECTORY is reproducible in any engine that can sum and exp.
    *
    * Each iteration collects only the `Dims`-row gradient (the bounded
    * driver-side materialization this repo allows for trainers — centroids,
    * codebooks, 1-row stats) and rebuilds the next plan from LITERAL
    * weights: plan depth constant in `iters`.
    *
    * @return trained weights, index = slot
    */
  def trainLogistic(feat: DataFrame, labels: DataFrame, iters: Int = 3,
      lr: Double = 0.5, l2: Double = 0.0, snapR6: Boolean = true): Array[Double] = {
    require(iters >= 1 && iters <= 100, s"iters must be in [1, 100], got $iters")
    val n = labels.count().toDouble
    require(n > 0, "trainLogistic: empty label set")
    // labels and per-doc margins are bounded by the LABELED set — small by
    // the nature of training data — so they broadcast; the feature frame
    // is the big side and is never shuffled for either join (round 17:
    // these planned as sort-merge when the inputs carried no statistics).
    // Round-18 (ADVICE r17): the hints are GATED on the label count n —
    // already computed above — so a caller with a huge labeled set falls
    // back to the planner's shuffle join instead of blowing the broadcast
    // / driver memory limit (4M (id, y) rows ≈ 64 MB framed, a safe hint
    // ceiling; the per-doc margins frame is one row per labeled doc, the
    // same bound).
    val hintBounded = n <= 4000000
    def bounded(df: DataFrame): DataFrame =
      if (hintBounded) broadcast(df) else df
    def snap(upd: Double): Double =
      // floor(x*1e6+0.5) — the Parity.r6 form, NOT rint: DuckDB's oracle
      // snaps with FLOOR(x*1e6+0.5)/1e6 and the two must agree on .5s
      if (snapR6) math.floor(upd * 1e6 + 0.5) / 1e6 else upd
    // Round-18 driver fast-path (the Bpe/connectedComponents size-adaptive
    // pattern, VERDICT r17 item 6): at or below the gate the labeled
    // feature rows are collected ONCE and the whole GD loop runs on the
    // driver — each distributed iteration was two joins + two aggregates +
    // a 19-row collect (~7 scheduler round-trips), pure overhead at
    // trainer-sized inputs. Trajectory equality is the r6-snap argument
    // the class doc makes for CROSS-ENGINE parity, applied to summation
    // order: the driver accumulates in collected-partition order while
    // Spark merges partial aggregates in arbitrary order — both land
    // inside the 1e-6 snap grid that already absorbs DuckDB's own order
    // (QualityClassifierSpec pins driver == distributed on the real
    // corpus and a planted one; every consumer is oracle-checked on top).
    // Above the gate the distributed loop is unchanged.
    if (n <= DriverTrainMaxDocs) {
      val rows = feat.join(bounded(labels), "doc_id")
        .select(col("doc_id"), col("slot"), col("x"), col("y"))
        .collect()
      // group per doc in collected order; docs in first-appearance order
      val docIds = scala.collection.mutable.LinkedHashMap[Long, Int]()
      rows.foreach { r =>
        val id = r.getLong(0)
        if (!docIds.contains(id)) docIds(id) = docIds.size
      }
      val nd = docIds.size
      val ys = new Array[Double](nd)
      val slots = new Array[Int](rows.length)
      val xs = new Array[Double](rows.length)
      val docOf = new Array[Int](rows.length)
      var i = 0
      while (i < rows.length) {
        val r = rows(i)
        val d = docIds(r.getLong(0))
        docOf(i) = d; slots(i) = r.getInt(1); xs(i) = r.getDouble(2)
        ys(d) = r.getDouble(3)
        i += 1
      }
      var wts = Array.fill(Dims)(0.0)
      for (_ <- 1 to iters) {
        val m = new Array[Double](nd)
        var j = 0
        while (j < rows.length) { m(docOf(j)) += wts(slots(j)) * xs(j); j += 1 }
        val p = m.map(v => 1.0 / (1.0 + math.exp(-v)))
        val g = new Array[Double](Dims)
        j = 0
        while (j < rows.length) {
          g(slots(j)) += xs(j) * (p(docOf(j)) - ys(docOf(j))); j += 1
        }
        wts = wts.zipWithIndex.map { case (wv, s) =>
          snap(wv - lr * (g(s) / n + l2 * wv))
        }
      }
      return wts
    }
    trainLogisticDistributed(feat, labels, iters, lr, l2, snapR6)
  }

  /** The distributed GD loop, unconditionally — spec-visible so
    * QualityClassifierSpec can pin driver == distributed trajectories on
    * the same inputs. */
  private[graft] def trainLogisticDistributed(
      feat: DataFrame, labels: DataFrame, iters: Int = 3,
      lr: Double = 0.5, l2: Double = 0.0, snapR6: Boolean = true): Array[Double] = {
    val n = labels.count().toDouble
    require(n > 0, "trainLogistic: empty label set")
    val hintBounded = n <= 4000000
    def bounded(df: DataFrame): DataFrame =
      if (hintBounded) broadcast(df) else df
    val joined = feat.join(bounded(labels), "doc_id")
    var wts = Array.fill(Dims)(0.0)
    for (_ <- 1 to iters) {
      val wCol = map(wts.toIndexedSeq.zipWithIndex.flatMap {
        case (v, i) => Seq(lit(i), lit(v)) }: _*)
      // margin per doc from the CURRENT literal weights, then one aggregate:
      // grad_s = sum_d x_ds * (sigmoid(m_d) - y_d) / n  (+ l2 * w_s)
      val margins = joined
        .withColumn("wx", element_at(wCol, col("slot")) * col("x"))
        .groupBy(col("doc_id"), col("y")).agg(sum(col("wx")).as("m"))
        .select(col("doc_id"), col("y"),
          (lit(1.0) / (lit(1.0) + exp(-col("m")))).as("p"))
      val grad = feat.join(bounded(margins), "doc_id")
        .groupBy(col("slot"))
        .agg((sum(col("x") * (col("p") - col("y"))) / n).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      wts = wts.zipWithIndex.map { case (wv, s) =>
        val upd = wv - lr * (grad.getOrElse(s, 0.0) + l2 * wv)
        if (snapR6) math.floor(upd * 1e6 + 0.5) / 1e6 else upd
      }
    }
    wts
  }

  /** [[trainLogistic]]'s driver-loop gate: the collected frame is
    * n·[[Dims]] (doc, slot, x, y) rows — ~65k labeled docs ≈ 1.2M rows /
    * ~40 MB, the same bounded-trainer materialization class as Bpe's
    * 65536 word types. Training sets past this size train distributed. */
  val DriverTrainMaxDocs: Double = 65536.0

  /** Platt scaling (Platt 1999): calibrate a raw scorer's outputs into
    * probabilities by fitting sigmoid(a·s + b) to the labels with
    * full-batch GD on (a, b) — the post-hoc calibration step every
    * threshold-based corpus filter wants (a raw margin of 1.7 means
    * nothing; a calibrated p=0.92 does). Same trainer contract as
    * [[trainLogistic]]: fixed iterations, ONE aggregate per iteration
    * (here a 1-row (ga, gb) collect), parameters r6-snapped per update so
    * the trajectory replays in any engine that can sum and exp (q141).
    *
    * Cross-engine caveat: the per-row sigmoid calls libm `exp` in BOTH
    * engines, and the snap is applied to the AVERAGED gradient — in
    * practice the ~ulp libm divergence is ~7 orders below the 1e-6 snap
    * grid (q141 hash-matches), but an averaged gradient landing within
    * ~1e-13 of a grid edge could in principle snap differently per
    * engine and fork the trajectory from that round on. Same residual
    * risk class as the repo's other in-plan exp/pow uses (q144's
    * temperature pow); accepted and documented rather than guarded,
    * because snapping per-row sigmoids would change the fitted model.
    *
    * @param scored (scoreCol, yCol) rows — the scorer's output with
    *   binary labels
    * @return (a, b) of the fitted sigmoid
    */
  def calibratePlatt(scored: DataFrame, scoreCol: String, yCol: String,
      iters: Int = 4, lr: Double = 0.5): (Double, Double) = {
    require(iters >= 1 && iters <= 100, s"iters must be in [1, 100], got $iters")
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    var a = 1.0
    var b = 0.0
    var t = 0
    while (t < iters) {
      val p = lit(1.0) / (lit(1.0) +
        exp(-(lit(a) * col(scoreCol) + lit(b))))
      val g = scored.agg(
        (sum(col(scoreCol) * (p - col(yCol))) / count(lit(1))).as("ga"),
        (sum(p - col(yCol)) / count(lit(1))).as("gb"))
        .head()
      a = r6(a - lr * g.getDouble(0))
      b = r6(b - lr * g.getDouble(1))
      t += 1
    }
    (a, b)
  }

  /** The fused single-pass twin of `score(features(docs), weights)` —
    * spec-pinned to produce the identical `(doc_id, p, pred)` frame
    * (QualityClassifierSpec). The long form builds an n·19-row frame
    * (explode + groupBy(doc_id, slot) + a per-doc norm window + a four-arm
    * union re-scanning `docs` three more times) only for [[score]] to
    * collapse it straight back to one row per doc; here the per-doc
    * hashed-slot counts are [[HashSlots]] conditional sums in ONE
    * aggregate (map-side partials, guide §2.3/§2.4) and the engineered
    * features stay row-wise, so the whole gate is one exchange and one
    * scan of `docs` (round 18, the q177 fold's quality gate).
    *
    * Equivalence argument, term by term: Σc² is integer arithmetic, so the
    * norm is bit-equal to the window form; each xᵢ replays the long form's
    * r4(c/nrm) (an absent (doc, slot) row is c = 0 → x = r4(0) = 0, and
    * 0·wᵢ adds exactly ±0.0 to the sum); engineered terms are the same
    * expressions with a NULL coalesced to the 0.0 the long form's
    * null-skipping SUM gave them (the bias row keeps m non-null there, so
    * coalescing per term lands on the same value). The dot product's
    * fixed term order vs the aggregate's partition order is the identical
    * last-ulp tolerance class the r4(sigmoid) snap already absorbs
    * cross-engine — every consumer is oracle-checked on top.
    *
    * When every hashed-slot weight is zero (q177's length-rule gate) the
    * token pass is statically dropped: every skipped term is exactly ±0.0
    * in the long form's sum, and the gate becomes a pure projection —
    * zero exchanges.
    *
    * `broadcastCounts` hints the per-doc count frame into its join — for
    * callers whose `docs` is micro-batch-bounded
    * ([[graft.streaming.IngestPipeline.classifyBatch]]'s documented
    * posture); leave false for corpus-scale frames.
    */
  def scoreDocs(docs: DataFrame, weights: Array[Double],
      idCol: String = "doc_id", textCol: String = "text",
      nCharsCol: String = "n_chars",
      broadcastCounts: Boolean = false): DataFrame = {
    require(weights.length == Dims, s"expected $Dims weights, got ${weights.length}")
    val toks = split(col(textCol), " ")
    val xLen = Parity.r4(log(greatest(col(nCharsCol), lit(1)) / lit(300.0)))
    val xDiv = Parity.r4(size(array_distinct(toks)).cast("double") / size(toks)
      - lit(0.5))
    def engDot(len: Column, div: Column): Column =
      coalesce(lit(weights(16)) * len, lit(0.0)) +
        coalesce(lit(weights(17)) * div, lit(0.0)) +
        lit(weights(18)) * lit(1.0)
    val perDocM =
      if (weights.take(HashSlots).forall(_ == 0.0))
        docs.select(col(idCol).as("doc_id"), engDot(xLen, xDiv).as("m"))
      else {
        val slot = pmod(graft.functions.TextHash.h60(col("tok")),
          lit(HashSlots.toLong))
        val cAggs = (0 until HashSlots).map(i =>
          sum(when(col("slot") === i, 1L).otherwise(0L)).as(s"c_$i"))
        val counts = docs
          .select(col(idCol).as("doc_id"),
            explode(graft.functions.TextHash.tokens(col(textCol))).as("tok"))
          .filter(col("tok") =!= "")
          .select(col("doc_id"), slot.as("slot"))
          .groupBy(col("doc_id"))
          .agg(cAggs.head, cAggs.tail: _*)
        val nrm = sqrt((0 until HashSlots)
          .map(i => col(s"c_$i") * col(s"c_$i")).reduce(_ + _))
        val hashedDot = (0 until HashSlots)
          .map(i => lit(weights(i)) * Parity.r4(col(s"c_$i") / col("nrm")))
          .reduce(_ + _)
        docs.select(col(idCol).as("doc_id"), xLen.as("x_len"), xDiv.as("x_div"))
          .join(if (broadcastCounts) broadcast(counts) else counts,
            Seq("doc_id"), "left")
          .withColumn("nrm", nrm)
          .select(col("doc_id"),
            (coalesce(when(col("nrm") > 0, hashedDot), lit(0.0)) +
              engDot(col("x_len"), col("x_div"))).as("m"))
      }
    perDocM.select(col("doc_id"),
      Parity.r4(lit(1.0) / (lit(1.0) + exp(-col("m")))).as("p"),
      (col("m") > 0).as("pred"))
  }

  /** Scores `feat` with literal `weights`: `(doc_id, p, pred)` where
    * p = sigmoid(w·x) r4-snapped. Pure scan + one slot-keyed aggregate —
    * the deployable inference path. */
  def score(feat: DataFrame, weights: Array[Double]): DataFrame = {
    require(weights.length == Dims, s"expected $Dims weights, got ${weights.length}")
    val wCol = map(weights.toIndexedSeq.zipWithIndex.flatMap {
      case (v, i) => Seq(lit(i), lit(v)) }: _*)
    feat.withColumn("wx", element_at(wCol, col("slot")) * col("x"))
      .groupBy(col("doc_id")).agg(sum(col("wx")).as("m"))
      .select(col("doc_id"),
        Parity.r4(lit(1.0) / (lit(1.0) + exp(-col("m")))).as("p"),
        (col("m") > 0).as("pred"))
  }
}
