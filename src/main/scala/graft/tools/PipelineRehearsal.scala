package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** END-TO-END pretraining-data dress rehearsal (VERDICT r15 task 1):
  * every heavy family has a per-operator 1M rehearsal, but the 100 TB
  * claim lives in the COMPOSITION — so this main runs the PipelineSpec
  * capstone's shape at ~2000× its size, as ONE pipeline in a dedicated
  * JVM over a [[ScaleDataGen]] slice:
  *
  *   1. `excise`    — exact duplicated-substring excision (q100/q105)
  *   2. `lsh_dedup` — MinHash+LSH near-dup candidates (data-derived cap +
  *                    representative stars, this round's scaffold) →
  *                    exact-Jaccard verify → connected components →
  *                    lowest-id survivors
  *   3. `semdedup`  — SemDeDup over the embeddings slice (trained
  *                    quantizer, minCos 0.9999 — the measured threshold),
  *                    vec_id ≡ doc_id fixture convention
  *   4. `gates`     — the q154 four-gate verdict (repetition /
  *                    contamination / unigram-LM ppl tertile / DSIR
  *                    quintile) over the DEDUPED corpus, at the
  *                    deployment shape: approx-quantile CUT POINTS
  *                    instead of the oracle twin's global ntile window
  *                    (the q137/q154 scale note, applied)
  *   5. `splits`    — leakage-free cluster-keyed 80/10/10 split (q131),
  *                    audited: zero verified near-dup pairs straddle
  *   6. `mixing`    — per-source trained-metric mixture reweight (q134)
  *   7. `pack_bfd`  — BFD packing of the kept docs' LM piece counts into
  *                    2048-token sequences (q164), exact token accounting
  *
  * Each stage prints one JSON line with wall seconds, produced rows, and
  * the [[StageMetrics]] counters (shuffle write / spills / peak task
  * memory / max task) — the per-stage numbers BASELINE records. Stage
  * outputs are localCheckpoint-materialized so a stage's metrics are its
  * own, not its consumers' recomputation (same eager/non-reliable trade
  * every rehearsal in this file's sibling documents).
  *
  * Usage:
  * {{{
  *   runMain graft.tools.ScaleDataGen /tmp/graft_scale/sf2 1000000 400000
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.PipelineRehearsal /tmp/graft_scale/sf2
  * }}}
  */
object PipelineRehearsal {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PipelineRehearsal <sliceDir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 8×cpus reducers, not the bench contract's 32 — the ScaleRehearsal
      // session doc has the round-17 measurement (600 MB/78 GB-spill sort
      // tasks of plain volume at 32); AQE coalesces small stages back down
      .config("spark.sql.shuffle.partitions", 8 * cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the ScaleRehearsal knob-sizing note: split the slice's small part
      // files across the box the way a real cluster's file count would
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.plans.GraftFunctions.installPlanRewrites(spark)
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)
    spark.range(10).write.format("noop").mode("overwrite").save()
    def gb(x: Long): Double = math.rint(x / 1e7) / 100.0

    /** Run one stage: reset counters, materialize, print the JSON row. */
    def stage[T](name: String)(f: => (T, Long)): T = {
      metrics.reset()
      val t0 = System.nanoTime()
      val (out, rows) = f
      val secs = math.rint((System.nanoTime() - t0) / 1e7) / 100.0
      Thread.sleep(500) // listener bus is async — let task-end events land
      println(s"""{"stage":"$name","sec":$secs,"rows":$rows,""" +
        s""""shuffle_write_gb":${gb(metrics.shuffleWrite)},""" +
        s""""mem_spill_gb":${gb(metrics.memSpill)},""" +
        s""""disk_spill_gb":${gb(metrics.diskSpill)},""" +
        s""""peak_task_mem_gb":${gb(metrics.peakExecMem)},""" +
        s""""max_task_sec":${metrics.maxTaskMs / 1000.0},""" +
        s""""max_task_stage":"${metrics.maxTaskStage}",""" +
        s""""top_stages":"${metrics.topStages()}"}""")
      out
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nRaw = docs.count()
    val tAll = System.nanoTime()

    // 1 — exact substring excision acts FIRST (verbatim boilerplate must
    // not glue distinct docs together in the fuzzier near-dup stage);
    // fully-excised docs drop out, n_chars recomputed on the clean text.
    // k = 40 chars, NOT the declared q100's k = 20: the slice's 30-word
    // vocabulary saturates 20-char grams at 1M docs (~86 occurrences of
    // EVERY gram → the whole corpus reads as duplicated spans; the first
    // run excised 99.4% of it and paid a 419 s gram-table straggler).
    // 40 chars ≈ 8 words keeps random word-soup unique (30⁸ ≫ corpus
    // positions) while still excising the 10-word boilerplate phrases
    // (~55 chars — a 40-char window fits inside) and exact-dup docs.
    // hashShuffle = true is the documented 100 TB variant (8-byte gram
    // hashes shuffled instead of 40-char strings; the declared q100 keeps
    // the exact-string twin for its oracle) — the string-keyed composed
    // run paid 1648 s / 117 GB spill / a 692 s sort straggler here.
    val clean = stage("excise") {
      // round 17: k DERIVED from the corpus (the collision-horizon rule —
      // lands at ~41 on this slice, the empirically-proven 40) and the
      // two-pass exchange salted by default (gramSalt = 0 auto-derives)
      val kd = graft.operators.SubstringDedup
        .derivedGramWidth(docs, "doc_id", "text")
      println(s"""{"stage":"derive_gram_width","k":$kd}""")
      val ex = graft.operators.SubstringDedup.excise(docs, "doc_id", "text",
        k = kd, hashShuffle = true)
      val c = docs.drop("text", "n_chars")
        .join(ex.filter(length(col("clean_text")) > 0)
          .select(col("doc_id"), col("clean_text").as("text")), "doc_id")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .localCheckpoint(true)
      (c, c.count())
    }
    val nClean = clean.count()

    // 2 — LSH near-dup dedup under THIS round's banding posture: the cap
    // derives from the corpus (md5 band keys have no random-collision
    // regime, so the rule lands on the floor — any bucket above it is
    // genuinely shared content) and over-cap buckets keep representative
    // stars, so template mega-groups stay linear AND reachable
    val lsh = graft.operators.MinHashLSH(numHashes = 12, numBands = 3, shingleSize = 2)
    val (survivors, assign, pairs) = stage("lsh_dedup") {
      val cap = graft.operators.BandedSelfJoin.derivedCap(nClean, keyBits = 62)
      val cand = lsh.candidatePairs(clean, "doc_id", "text",
        maxBucket = cap, repOverCap = true)
      val p = lsh.verifyJaccard(cand, clean, "doc_id", "text")
        .filter(col("jaccard") >= 0.6)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint(true)
      val a = graft.operators.DedupClusters
        .clusterAssignments(clean, "doc_id", p)
        .localCheckpoint(true)
      val s = clean.join(
        a.filter(col("doc_id") === col("cluster_id")).select("doc_id"), "doc_id")
        .localCheckpoint(true)
      ((s, a, p), s.count())
    }
    val nLsh = survivors.count()

    // 3 — semantic dedup on the embeddings slice (vec_id ≡ doc_id): the
    // trained-quantizer auto form at the threshold the slice's planted
    // twins define (q113_t1024's measured contract)
    val semSurv = stage("semdedup") {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val keptVec = graft.operators.SemDeDup
        .dedupAuto(emb, "vec_id", "embedding", minCos = 0.9999)
        .select(col("vec_id"))
      val droppedVec = emb.select(col("vec_id")).exceptAll(keptVec)
      val out = survivors.join(
        droppedVec.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      (out, out.count())
    }
    val nSem = semSurv.count()

    // 4 — the q154 four-gate verdict over the DEDUPED corpus, deployment
    // shape: signals are per-doc frames, tertile/quintile gates use
    // approx-quantile cut points (no single-partition ntile window at 1M)
    val kept = stage("gates") {
      val rep = graft.operators.Repetition.repetitiveFlag(
        graft.operators.Repetition.dupNgramStats(semSurv, "doc_id", "text", 2))
        .select(col("doc_id"), col("flag_repetitive"))
      // benchmark slice is the RAW corpus's doc_id < 10 (q150 convention;
      // the bench set exists regardless of what dedup kept)
      val con = graft.queries.QualitySignals.contaminationFrac(
        docs.select(col("doc_id"), col("text"))
          .filter(col("doc_id") < 10)
          .unionByName(semSurv.select(col("doc_id"), col("text"))
            .filter(col("doc_id") >= 10)))
        .select(col("doc_id"), col("contaminated_frac"))
      val wt = graft.operators.Bpe.wordTypes(semSurv, "text").localCheckpoint(true)
      val (_, lp) = graft.operators.UnigramLm.train(
        wt, maxPieceLen = 8, vocabSize = 8192, iters = 1, maxWordLen = 16)
      val scored = graft.operators.UnigramLm.scoreCounts(
        semSurv, lp, "doc_id", "text", maxPieceLen = 8, maxWordLen = 16)
        .select(col("doc_id"), col("n_pieces"),
          (-col("lp_sum") / col("n_pieces")).as("nll"))
        .localCheckpoint(true)
      val dsir = graft.operators.Dsir.importanceWeights(
        semSurv, col("lang") === "en", "doc_id", "text", nSlots = 16)
        .select(col("doc_id"), col("log_weight"))
        .localCheckpoint(true)
      val nllCut = scored.agg(
        percentile_approx(col("nll"), lit(2.0 / 3.0), lit(10000))).head().getDouble(0)
      val wCut = dsir.agg(
        percentile_approx(col("log_weight"), lit(0.2), lit(10000))).head().getDouble(0)
      val verdict =
        when(coalesce(col("flag_repetitive"), lit(false)), "repetitive")
          .when(coalesce(col("contaminated_frac"), lit(0.0)) >= 0.1, "contaminated")
          .when(col("nll") > nllCut, "ppl_tail")
          .when(col("log_weight") <= wCut, "low_dsir")
          .otherwise("kept")
      val all = semSurv.filter(col("doc_id") >= 10)
        .join(rep, Seq("doc_id"), "left")
        .join(con, Seq("doc_id"), "left")
        .join(scored, Seq("doc_id"), "left")
        .join(dsir, Seq("doc_id"), "left")
        .withColumn("verdict", verdict)
        .localCheckpoint(true)
      val funnel = all.groupBy(col("verdict")).count()
        .as[(String, Long)].collect().toMap
      println(s"""{"stage_detail":"gates_funnel",""" +
        funnel.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
          .mkString(",") + "}")
      // n_chars rides along: the mixing stage's classifier features need it
      val k = all.filter(col("verdict") === "kept")
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          col("n_chars"), col("n_pieces"))
        .localCheckpoint(true)
      (k, k.count())
    }
    val nKept = kept.count()

    // 5 — leakage-free splits: hash the near-dup CLUSTER id (q131), then
    // AUDIT on the verified pair graph — zero pairs may straddle splits
    val splits = stage("splits") {
      val bucket = graft.functions.TextHash.h60(col("cluster_id").cast("string")) % 100
      val s = kept.join(assign.select(col("doc_id"), col("cluster_id")), "doc_id")
        .withColumn("split",
          when(bucket < 80, lit("train")).when(bucket < 90, lit("val"))
            .otherwise(lit("test")))
        .localCheckpoint(true)
      val sp = s.select(col("doc_id"), col("split"))
      val straddle = pairs
        .join(sp.toDF("id_a", "split_a"), "id_a")
        .join(sp.toDF("id_b", "split_b"), "id_b")
        .filter(col("split_a") =!= col("split_b")).count()
      require(straddle == 0L,
        s"$straddle verified near-dup pairs straddle splits — leakage")
      (s, s.count())
    }

    // 6 — mixture reweight on the kept corpus: per-source token mass +
    // trained centroid-classifier pass rate as the metric (q134's shape)
    val mixture = stage("mixing") {
      val preds = graft.operators.QualityClassifier.centroidScores(
        graft.operators.QualityClassifier.features(kept),
        graft.operators.QualityClassifier.cascadeLabels(kept))
        .select(col("doc_id"), col("pred"))
      val per = kept
        .select(col("doc_id"), col("source"), col("n_pieces"))
        .join(preds, "doc_id")
        .groupBy(col("source"))
        .agg(sum(col("n_pieces")).as("tokens"),
          graft.queries.Parity.r6(avg(col("pred").cast("double"))).as("m"))
        .localCheckpoint(true)
      val tot = per.agg(sum(col("tokens")).as("ct"))
      val base = per.crossJoin(broadcast(tot))
        .select(col("source"),
          graft.queries.Parity.r6(col("tokens") / col("ct")).as("w0"), col("m"))
      val traj = graft.operators.MixtureReweight
        .reweight(base, "source", "w0", "m", iters = 4, eta = 0.5, cap = 0.06)
        .localCheckpoint(true)
      (traj, traj.count())
    }
    val wSum = mixture.filter(col("iter") === 4)
      .agg(sum(col("weight"))).as[Double].head()
    // weights are r6-SNAPPED after the final normalize (MixtureReweight's
    // determinism contract), so the sum is 1 ± half a grid unit PER SOURCE
    // by design. The round-16 tolerance (1e-6 flat) was tighter than the
    // operator's own contract and broke on the first kept-set change
    // (derived k=34 shifted the funnel; sum landed at 1 − 2e-6).
    val nSrc = mixture.select(col("source")).distinct().count()
    require(math.abs(wSum - 1.0) <= nSrc * 5e-7 + 1e-9,
      s"final mixture weights must sum to 1 within $nSrc half-grid units, got $wSum")

    // 7 — BFD packing of the kept docs' LM piece counts into 2048-token
    // sequences over 1000 shards; exact accounting required
    val capTok = 2048L
    val bfd = stage("pack_bfd") {
      val items = kept.select(
        pmod(col("doc_id"), lit(1000L)).cast("int").as("shard"),
        (col("doc_id") / 1000L).cast("long").as("k1"),
        col("doc_id").as("k2"),
        col("n_pieces").cast("long").as("n_tokens"))
        .filter(col("n_tokens").isNotNull)
      val a = graft.operators.Packing.bfdAssignments(items, capTok)
        .localCheckpoint(true)
      (a, a.count())
    }
    val packedTok = bfd.agg(sum(col("n_tokens"))).as[Long].head()
    val keptTok = kept.agg(sum(col("n_pieces"))).as[Long].head()
    require(packedTok == keptTok,
      s"BFD lost tokens: packed $packedTok of $keptTok")
    val overCap = bfd.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tok"))
      .filter(col("n") > 1 && col("tok") > capTok).count()
    require(overCap == 0L,
      s"$overCap multi-doc BFD bins exceed capacity — the hard cap leaked")
    val nBins = bfd.select(col("shard"), col("bin")).distinct().count()

    val totalSec = math.rint((System.nanoTime() - tAll) / 1e7) / 100.0
    println(s"""{"rehearsal":"pipeline_1m","n_raw":$nRaw,"n_clean":$nClean,""" +
      s""""n_lsh_survivors":$nLsh,"n_sem_survivors":$nSem,"n_kept":$nKept,""" +
      s""""n_split_rows":${splits.count()},"tokens_kept":$keptTok,""" +
      s""""bfd_bins":$nBins,"total_sec":$totalSec}""")
    spark.stop()
  }
}
