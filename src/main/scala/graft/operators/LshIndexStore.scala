package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED LSH band index as a (band, key)-bucketed living table —
  * the round-17 close of the one seam round 16 left named: both the
  * streaming ingest ([[graft.streaming.IngestPipeline]]) and incremental
  * batch dedup read the append-only band index
  * ([[MinHashLSH.bandIndex]] rows) as plain parquet, so every
  * micro-batch's candidate join SHUFFLED the whole index side — per-batch
  * cost grew with the index forever, the wrong asymptotic for a standing
  * corpus.
  *
  * This store applies the repo's own bucketed-table machinery
  * ([[graft.queries.Curation.writeBucketed]]'s layout contract) to the
  * index: rows land in `__bucket = pmod(xxhash64(band, key), numBuckets)`
  * hive-style partitions, so a batch's candidate lookup
  *
  *   1. computes the batch's band rows once ([[MinHashLSH.bandIndex]]),
  *   2. derives the touched buckets driver-side (a distinct over the
  *      BATCH's band rows, bounded by numBuckets),
  *   3. reads ONLY those `__bucket=` partitions back (partition pruning —
  *      the scan never opens untouched buckets' files), and
  *   4. joins with the batch side BROADCAST, so the pruned index subset
  *      streams through a hash join without being shuffled at all.
  *
  * Per-batch cost is then (touched buckets × bucket size) + batch — with
  * numBuckets sized so one bucket is a comfortable read (10k buckets ×
  * 10 GB at 100 TB), batch cost is FLAT in stream lifetime instead of
  * linear in index size. Appends stay cheap: `mode("append")` under
  * `partitionBy` only creates files in the buckets the batch touches.
  *
  * Same single-writer / small-files lifecycle as every living table here:
  * serialize appends per store (foreachBatch does naturally), and run
  * [[compact]] on the same cadence as corpus bucket compaction —
  * thousands of per-batch appends otherwise strand thousands of KB-sized
  * files per hot bucket.
  */
object LshIndexStore {

  /** The row→partition mapping. Writer and reader MUST derive buckets
    * identically (the [[graft.queries.Curation.bucketOf]] contract,
    * composite-key form) or pruned reads would miss rows.
    */
  def bucketOf(band: Column, key: Column, numBuckets: Int): Column = {
    require(numBuckets > 0, "numBuckets must be positive")
    pmod(xxhash64(band, key), lit(numBuckets.toLong)).cast("int")
  }

  /** Append band rows (`id`, `band`, `key`, plus any carry columns) to the
    * bucketed store at `path` — creates the store on first call (parquet
    * `append` mode materializes missing partition directories), so
    * bootstrap and steady-state are one code path.
    */
  def append(rows: DataFrame, path: String, numBuckets: Int): Unit =
    rows.withColumn("__bucket", bucketOf(col("band"), col("key"), numBuckets))
      .write.partitionBy("__bucket").mode("append").parquet(path)

  /** The index rows a probe could possibly join: only the `__bucket=`
    * partitions that `probeBands`' (band, key) rows hash into are read —
    * partition pruning, so the read scales with the PROBE's bucket spread
    * (≤ numBuckets directories), never the index. The driver-side distinct
    * is bounded by numBuckets ints, the [[graft.queries.Curation.upsertByKey]]
    * read pattern applied to lookup.
    *
    * The returned frame drops `__bucket` — consumers see exactly the
    * [[MinHashLSH.bandIndex]] schema they'd get from an unbucketed store.
    */
  def readPrunedFor(
      spark: SparkSession, path: String, probeBands: DataFrame,
      numBuckets: Int): DataFrame = {
    import spark.implicits._
    val touched = probeBands
      .select(bucketOf(col("band"), col("key"), numBuckets).as("b"))
      .distinct().as[Int].collect().toSeq
    val store = spark.read.parquet(path)
    if (touched.isEmpty) store.limit(0).drop("__bucket")
    else store.filter(col("__bucket").isin(touched: _*)).drop("__bucket")
  }

  /** The whole store, un-pruned (audits, rebuilds, full-corpus dedup). */
  def readAll(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")

  /** Small-file compaction — delegates to the shared bucketed-table
    * compactor (the layout is the same `__bucket=` hive partitioning):
    * only buckets whose data-file count exceeds the threshold are
    * rewritten. Returns the compacted bucket ids.
    */
  def compact(
      spark: SparkSession, path: String, maxFilesPerBucket: Int = 8): Seq[Int] =
    graft.queries.Curation.compactBuckets(spark, path, maxFilesPerBucket)
}
