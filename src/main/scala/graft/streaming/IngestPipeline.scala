package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{MinHashLSH, QualityClassifier}
import graft.queries.Curation

/** The COMPOSED streaming ingest — the streaming twin of the batch
  * curation composition (tools/PipelineRehearsal): a continuous feed of
  * new documents folds, micro-batch by micro-batch, into the three living
  * artifacts a standing corpus keeps —
  *
  *   1. the bucketed corpus table ([[Curation.writeBucketed]] layout,
  *      mutated by [[Curation.upsertByKey]]),
  *   2. the persisted LSH band index ([[MinHashLSH.bandIndex]], appended
  *      per batch so batch N+1 dedups against everything batch N kept),
  *   3. the mergeable stats table ([[Curation.mergeDocStats]]).
  *
  * Per batch: verified near-dup dedup against the index (candidates from
  * the band join, then EXACT Jaccard against the matched corpus texts —
  * fetched with a bucket-PRUNED read, so verification I/O scales with the
  * match count, never the corpus), then verified intra-batch dedup
  * (keep-first: a doc drops iff a verified smaller-id partner exists in
  * the same batch, the standard greedy rule), then the quality gate
  * ([[QualityClassifier]] score ≥ threshold), then the three artifact
  * mutations. Every stage is the EXACT batch operator run inside
  * `foreachBatch` — the fold step [[processBatch]] is a plain batch
  * function, so the stream's semantics ARE "the sequential-batch fold",
  * which is what IngestPipelineSpec pins (stream == the same fold driven
  * by hand, plus the per-batch accounting identity ingested = dup_index +
  * dup_batch + gated + appended).
  *
  * Same-id re-arrivals are NOT duplicates: the band join filters self-id
  * matches and [[Curation.upsertByKey]] replaces the old row — re-crawl
  * semantics, consistent with the living-table contract.
  *
  * Scale posture, stated honestly: the band-candidate join shuffles the
  * INDEX side every micro-batch (the index is written append-only,
  * unbucketed). At 100 TB the index store should be laid out bucketed by
  * (band, key) so the join co-partitions against a pruned read instead —
  * the seam is the `spark.read.parquet(indexPath)` in one place below.
  * Single-writer like every living-table mutation (foreachBatch serializes
  * batches naturally); the corpus fetch, upsert, and stats merge are all
  * bounded by batch size × touched buckets, never corpus size.
  */
object IngestPipeline {

  /** Ingest configuration. `qualityWeights` is the
    * [[QualityClassifier.Dims]]-sized trained weight vector; docs scoring
    * below `qualityThreshold` (on the r4-rounded sigmoid `p`) are gated.
    */
  final case class Config(
      corpusPath: String,
      indexPath: String,
      statsPath: String,
      qualityWeights: Array[Double],
      qualityThreshold: Double = 0.5,
      numBuckets: Int = 64,
      lsh: MinHashLSH = MinHashLSH(),
      jaccardThreshold: Double = 0.8,
      maxBucket: Int = 0) {
    /** The replay-fence ledger (one row per committed batch id). */
    def ledgerPath: String = statsPath + "_ledger"
  }

  /** Per-batch accounting: `ingested = dupIndex + dupBatch + gated +
    * appended` (disjoint by construction — index dups are removed before
    * intra-batch pairing, gating applies to the dedup survivors).
    */
  final case class BatchReport(
      batchId: Long,
      ingested: Long,
      dupIndex: Long,
      dupBatch: Long,
      gated: Long,
      appended: Long)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The texts of `ids` (a small frame with column `id`) from the bucketed
    * corpus — partition-PRUNED: only the buckets the ids hash into are
    * read, so the fetch costs (matched buckets × bucket size), never the
    * table (the [[Curation.upsertByKey]] read pattern applied to lookup).
    */
  private def corpusTexts(
      spark: SparkSession, cfg: Config, ids: DataFrame): DataFrame = {
    import spark.implicits._
    val buckets = ids
      .select(Curation.bucketOf(col("id"), cfg.numBuckets).as("b"))
      .distinct().as[Int].collect().toSeq
    if (buckets.isEmpty)
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    else
      spark.read.parquet(cfg.corpusPath)
        .filter(col("__bucket").isin(buckets: _*))
        .join(ids.select(col("id").as("doc_id")), "doc_id")
        .select(col("doc_id"), col("text"))
  }

  /** One fold step — the exact function `foreachBatch` runs, callable
    * directly for the batch twin (IngestPipelineSpec drives it by hand to
    * pin stream == fold). The batch must carry (doc_id, text, source,
    * lang, n_chars).
    */
  def processBatch(
      spark: SparkSession, batch: DataFrame, cfg: Config,
      batchId: Long): BatchReport = {
    import spark.implicits._
    // REPLAY FENCE: foreachBatch is at-least-once — after a crash the
    // last uncommitted batch re-runs, and none of the three artifact
    // mutations is naturally idempotent (index append would duplicate
    // band rows; the stats XOR checksum would cancel the batch out). The
    // ledger records each batch id AFTER its mutations, so a replay of a
    // COMMITTED batch returns its recorded report without re-mutating.
    // Honest residual window: a crash INSIDE the mutation sequence
    // (corpus written, ledger not) still replays the mutations — plain
    // parquet has no atomic multi-table commit; that is what table
    // formats add on top of exactly this pattern. Cost note: the fence
    // reads the whole ledger (one tiny file per committed batch), so a
    // very long-lived stream pays a growing listing cost per batch —
    // compact the ledger on the same cadence as compactBuckets.
    val replayed =
      if (!exists(spark, cfg.ledgerPath)) None
      else {
        val rows = spark.read.parquet(cfg.ledgerPath)
          .select(col("batch_id"), col("ingested"), col("dup_index"),
            col("dup_batch"), col("gated"), col("appended"))
          .as[(Long, Long, Long, Long, Long, Long)].collect()
        val maxId = rows.iterator.map(_._1).max
        // a GENUINE foreachBatch replay can only be the LAST committed
        // batch (delivery is in-order; only the newest uncommitted batch
        // re-runs after a crash). A batchId BELOW the ledger's max means
        // the stream's checkpoint does not match these artifacts — the
        // classic "reset the checkpoint, keep the tables" mistake — and
        // treating it as a replay would SILENTLY swallow the new data:
        // refuse loudly instead.
        require(batchId >= maxId,
          s"ingest ledger at ${cfg.ledgerPath} already holds batches up to " +
            s"$maxId but this stream delivered batch $batchId — the " +
            "checkpointLocation does not match these artifacts (was it " +
            "reset?); refusing to treat new data as a replay. Restart from " +
            "the original checkpoint, or point at fresh artifact paths")
        rows.find(_._1 == batchId)
      }
    replayed match {
      case Some((id, in, di, db, g, ap)) => BatchReport(id, in, di, db, g, ap)
      case None => foldBatch(spark, batch, cfg, batchId)
    }
  }

  /** The unfenced fold body — every artifact mutation lives here. */
  private def foldBatch(
      spark: SparkSession, batch: DataFrame, cfg: Config,
      batchId: Long): BatchReport = {
    import spark.implicits._
    // one bounded materialization: every stage below reuses it, and the
    // counts the report needs must not recompute a streaming source
    val docs = batch
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        col("n_chars"))
      .localCheckpoint(true)
    val nIn = docs.count()

    // 1. verified dedup against the persisted index (skipped before the
    // first batch creates it)
    val dupIdxIds =
      if (!exists(spark, cfg.indexPath))
        spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
      else {
        val index = spark.read.parquet(cfg.indexPath)
        val cand = cfg.lsh
          .candidatesAgainstIndex(docs, "doc_id", "text", index, cfg.maxBucket)
        // batch text WINS over corpus text for ids present in both: a
        // re-crawled id's candidates must verify against the text the
        // corpus will hold AFTER this batch, not the stale row — else a
        // stale-text match silently drops the revision as a duplicate.
        // Known residual edge, accepted: if the re-crawl is ITSELF dropped
        // later this batch (dup or gated), another doc that verified
        // against its NEW text was judged against text the corpus never
        // holds — the converse (stale-wins) loses REVISIONS outright,
        // which is the worse failure; exactness here needs a second
        // verification pass over the batch's final survivor set
        val texts = corpusTexts(spark, cfg, cand.select(col("index_id").as("id")).distinct())
          .join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(docs.select(col("doc_id"), col("text")))
        cfg.lsh
          .verifyJaccard(
            cand.select(col("new_id").as("id_a"), col("index_id").as("id_b")),
            texts, "doc_id", "text")
          .filter(col("jaccard") >= cfg.jaccardThreshold)
          .select(col("id_a").as("doc_id")).distinct()
      }
    val afterIdx = docs.join(dupIdxIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val nDupIdx = nIn - afterIdx.count()

    // 2. verified intra-batch dedup, keep-first: drop every id with a
    // verified smaller-id partner (candidatePairs emits id_a < id_b).
    // repOverCap: over-cap batch buckets pair against their min-id
    // representative instead of vanishing — without it a mass arrival of
    // NEW duplicates (more copies than the cap, none indexed yet) would
    // sail through intra-batch dedup entirely
    val dupBatchIds = cfg.lsh
      .verifyJaccard(
        cfg.lsh.candidatePairs(afterIdx, "doc_id", "text", cfg.maxBucket,
          repOverCap = true),
        afterIdx, "doc_id", "text")
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .select(col("id_b").as("doc_id")).distinct()
    val clean = afterIdx.join(dupBatchIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val nDupBatch = nIn - nDupIdx - clean.count()

    // 3. quality gate on the r4-rounded sigmoid score
    val keepIds = QualityClassifier
      .score(QualityClassifier.features(clean), cfg.qualityWeights)
      .filter(col("p") >= cfg.qualityThreshold)
      .select(col("doc_id"))
    val kept = clean.join(keepIds, Seq("doc_id"))
      .localCheckpoint(true)
    val nKept = kept.count()

    // 4. the three living artifacts — corpus upsert (bootstrap on first
    // batch), index append, stats merge. Order matters: the index must
    // only ever reference docs the corpus holds (verification reads their
    // texts back), so the corpus write goes first.
    if (nKept > 0) {
      if (!exists(spark, cfg.corpusPath))
        Curation.writeBucketed(kept, cfg.corpusPath, "doc_id", cfg.numBuckets)
      else
        Curation.upsertByKey(spark, cfg.corpusPath, kept, "doc_id", cfg.numBuckets)
      cfg.lsh.bandIndex(kept, "doc_id", "text")
        .write.mode("append").parquet(cfg.indexPath)
      Curation.mergeDocStats(spark, cfg.statsPath, kept)
    }
    val report = BatchReport(
      batchId, nIn, nDupIdx, nDupBatch, nIn - nDupIdx - nDupBatch - nKept, nKept)
    // commit the fence LAST (see the replay note above); zero-kept batches
    // are fenced too — their report must replay stably
    Seq((report.batchId, report.ingested, report.dupIndex, report.dupBatch,
        report.gated, report.appended))
      .toDF("batch_id", "ingested", "dup_index", "dup_batch", "gated", "appended")
      .coalesce(1).write.mode("append").parquet(cfg.ledgerPath)
    report
  }

  /** The streaming entry: `foreachBatch` over [[processBatch]], reports
    * delivered to `onReport` in batch order (single-writer by
    * construction). Start with a checkpointLocation so restarts resume at
    * the right batch; delivery is foreachBatch's at-least-once, with the
    * batch-id ledger making replays of COMMITTED batches no-ops (see the
    * replay-fence note in [[processBatch]] for the residual window).
    */
  def stream(
      docs: DataFrame, cfg: Config)(
      onReport: BatchReport => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      onReport(processBatch(b.sparkSession, b, cfg, id))
    }
}
