package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared tombstone plumbing for the persisted vector indexes (IVF flat
  * assignments, PQ codes, IVF-PQ cell-partitioned codes) — the erasure
  * half of the index lifecycle, mirroring `TextIndex`'s deletes: a delete
  * is an O(batch) id-tombstone append under `<index>/deletes`, every
  * search read anti-joins the (small, broadcast) tombstone set out of its
  * candidates, and each index's compact reclaims physically. Because the
  * quantizer (centroids / codebooks) is untouched, delete-then-search is
  * EXACTLY search over an index rebuilt from the remaining vectors under
  * the same model — the spec-pinned contract. Tombstones are bounded by
  * deletions since the last compaction; single-writer posture like every
  * other index mutation in the repo.
  */
private[graft] object IndexTombstones {

  def parquetIfExists(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(dir)) else None
  }

  /** Record tombstones for `ids`: only ids actually present in the index
    * (via `indexedIds`, an id-column frame — scanned column-pruned with
    * the id predicate pushed) and not already tombstoned are appended, so
    * re-deletes are no-ops and the tombstone set stays ⊆ indexed ids.
    */
  def record(
      spark: SparkSession, delDir: String,
      indexedIds: DataFrame, ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    val targets = indexedIds.select(col("id"))
      .filter(col("id").isin(ids: _*)).distinct()
    val fresh = parquetIfExists(spark, delDir) match {
      case Some(existing) =>
        targets.join(broadcast(existing.select(col("id"))), Seq("id"), "left_anti")
      case None => targets
    }
    fresh.write.mode("append").parquet(delDir)
  }

  /** Anti-join the tombstone set (if any) out of `rows` on `idCol`. */
  def filterLive(
      spark: SparkSession, rows: DataFrame, delDir: String,
      idCol: String = "id"): DataFrame =
    parquetIfExists(spark, delDir) match {
      case Some(d) =>
        rows.join(broadcast(d.select(col("id").as(idCol))), Seq(idCol), "left_anti")
      case None => rows
    }

  /** Reset the tombstone set after a compact folded it in physically. */
  def clear(spark: SparkSession, delDir: String): Unit =
    spark.range(0).select(col("id"))
      .write.mode("overwrite").parquet(delDir)
}
