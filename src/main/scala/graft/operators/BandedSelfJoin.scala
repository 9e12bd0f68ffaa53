package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared LSH banding scaffold used by [[MinHashLSH]] and [[SimHash]]:
  * mega-bucket cap + self-join on the band key. Input must have columns
  * (id, band, key) plus any payload columns; output is the a/b-joined rows
  * with `a.id < b.id` (payloads reachable as `a.<col>` / `b.<col>`).
  *
  * Both self-join sides are the SAME plan shuffled on (band, key), so AQE's
  * runtime exchange reuse computes the keys once and reads the shuffle
  * twice; the mega-bucket cap is a count-over-window on that same key — it
  * rides the join's own exchange instead of adding a groupBy + semi-join
  * pass, and nothing is cached (nothing to leak). `maxBucket <= 0` disables
  * the cap.
  */
private[graft] object BandedSelfJoin {

  /** `saltAbove > 0` additionally SALTS buckets larger than it (the
    * [[SparseCosineJoin]] head-term shape): the a-side gets
    * `salt = hash(id) mod S`, the b-side replicates to every salt, and the
    * join key grows by the salt — each (a, b) pair still meets exactly
    * once (at the a-row's salt), so the pair set is row-identical to the
    * unsalted plan (DedupSpec proves it), while one capped bucket's cap²
    * pair-verify spreads over S reducer keys instead of landing on one
    * straggler task. `S = min(⌈(bucket_n/saltAbove)²⌉, 64)` bounds per-key
    * candidate volume at ~saltAbove² and b-side replication at 64×, and
    * buckets at or under the threshold keep S = 1 (same work, same
    * result). The salted plan's two sides differ (pmod vs explode), so it
    * forgoes the unsalted plan's AQE exchange reuse — that trade only
    * makes sense where a quadratic bucket exists, which is why it is
    * opt-in.
    */
  def pairs(keyed: DataFrame, maxBucket: Int, saltAbove: Int = 0): DataFrame = {
    if (saltAbove <= 0) {
      val bounded =
        if (maxBucket <= 0) keyed
        else keyed
          .withColumn("bucket_n",
            count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
          .filter(col("bucket_n") <= maxBucket)
          .drop("bucket_n")
      // both sides are the SAME plan: AQE computes the keys once and
      // reads the (band, key) exchange twice
      bounded.as("a").join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
    } else {
      val counted = keyed.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      // the salted sides differ (pmod vs explode), so AQE cannot reuse one
      // exchange for both — materialize the keyed rows ONCE here or the
      // whole upstream pipeline (e.g. a conversation render) runs twice;
      // blocks are freed by the ContextCleaner when the frame drops.
      // Caveats of localCheckpoint(true), accepted because this branch is
      // opt-in: (a) it is EAGER — building the DataFrame runs the upstream
      // pipeline right here, a side effect of construction; (b) it is
      // NON-RELIABLE — the blocks live on executors, so losing one (kill/
      // decommission) fails the job instead of recomputing lineage. On a
      // cluster with executor churn, prefer saltAbove = 0 (the AQE-reusing
      // unsalted plan) or checkpoint `keyed` to reliable storage first.
      val bounded = (
        if (maxBucket <= 0) counted
        else counted.filter(col("bucket_n") <= maxBucket)
      ).localCheckpoint(true)
      val nSalt = greatest(least(
        ceil(pow(col("bucket_n") / lit(saltAbove.toDouble), 2.0)),
        lit(64.0)).cast("int"), lit(1))
      val a = bounded
        .withColumn("graft_salt", pmod(xxhash64(col("id")), nSalt).cast("int"))
        .drop("bucket_n")
      val b = bounded
        .withColumn("graft_salt", explode(sequence(lit(0), nSalt - 1)))
        .drop("bucket_n")
      a.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.graft_salt") === col("b.graft_salt") &&
          col("a.id") < col("b.id"))
    }
  }
}
