package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Parity

/** Corpus drift monitoring — Population Stability Index between two
  * snapshots of a table (the standard model-monitoring metric, e.g.
  * Siddiqi 2006 "Credit Risk Scorecards" §8; PSI = symmetrised KL over a
  * fixed binning): the data-quality check the living-corpus lifecycle
  * (upsert/delete/compact, streaming ingestion) needs before anyone
  * retrains on the "same" corpus. PSI < 0.1 is conventionally stable,
  * 0.1–0.25 drifting, > 0.25 action.
  *
  * Determinism is the design center: buckets are FIXED, caller-supplied
  * edges (never data-derived quantiles — those would make the metric
  * depend on execution order and engine), shares are smoothed with a
  * fixed ε so empty buckets contribute finitely, and the result is
  * rounded with the repo's floor form — so the whole metric is
  * reproducible in any SQL engine and q127 hash-checks it end-to-end.
  *
  * Scale posture: each side is one pass (a bucket/value hash aggregate of
  * ≤ nBuckets / |categories| output rows), the share join is
  * tiny-by-construction, and nothing depends on snapshot row counts
  * beyond the aggregates — monitoring a 100 TB corpus costs two scans,
  * the same as counting it.
  */
object Drift {

  private val Eps = 1e-6

  /** Histogram shares over fixed edges: bucket i covers
    * [lo + i·w, lo + (i+1)·w), values clamped into [lo, hi]. */
  private def bucketOf(c: Column, lo: Double, hi: Double, n: Int): Column = {
    val w = (hi - lo) / n
    least(greatest(floor((c - lo) / w), lit(0.0)), lit((n - 1).toDouble))
      .cast("int")
  }

  private def shares(df: DataFrame, by: Column, side: String): DataFrame =
    df.groupBy(by.as("key"))
      .agg(count(lit(1)).as("c"))
      .select(col("key"),
        (col("c") / sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy())).as(side))

  /** Null handling: a NULL value (or a NULL bucket from a NULL numeric)
    * is ONE category, the sentinel `__null__` — without this, the
    * full-outer join's `key = key` never matches NULL=NULL and a
    * null-bearing column would count its null group as two unmatched
    * buckets, each smoothed against ε, silently spiking the PSI
    * (round-8 review). Keys are compared as strings so the sentinel is
    * type-uniform; distinct non-null keys stay distinct under the cast.
    */
  private def nullSafeKey(k: Column): Column =
    coalesce(k.cast("string"), lit("__null__"))

  private def psiOf(a: DataFrame, b: DataFrame, keyA: Column, keyB: Column,
      metric: String): DataFrame = {
    val sa = shares(a, nullSafeKey(keyA), "p")
    val sb = shares(b, nullSafeKey(keyB), "q")
    sa.join(sb, Seq("key"), "full_outer")
      .select(
        (coalesce(col("p"), lit(0.0)) + Eps).as("p"),
        (coalesce(col("q"), lit(0.0)) + Eps).as("q"))
      .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
      .select(lit(metric).as("metric"), Parity.r4(col("psi")).as("psi"))
  }

  /** PSI of a numeric column between snapshots, over `nBuckets` fixed
    * equal-width buckets spanning [lo, hi] (out-of-range values clamp to
    * the edge buckets). */
  def numericPsi(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBuckets: Int,
      metric: String = ""): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 10000,
      s"nBuckets must be in [2, 10000], got $nBuckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val m = if (metric.nonEmpty) metric else valueCol
    psiOf(a, b,
      bucketOf(col(valueCol).cast("double"), lo, hi, nBuckets),
      bucketOf(col(valueCol).cast("double"), lo, hi, nBuckets), m)
  }

  /** PSI of a categorical column between snapshots — one bucket per
    * observed category (union of both sides via the full-outer share
    * join). */
  def categoricalPsi(a: DataFrame, b: DataFrame, catCol: String,
      metric: String = ""): DataFrame = {
    val m = if (metric.nonEmpty) metric else catCol
    psiOf(a, b, col(catCol), col(catCol), m)
  }
}
