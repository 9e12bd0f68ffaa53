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
  def pairs(keyed: DataFrame, maxBucket: Int): DataFrame = {
    val bounded =
      if (maxBucket <= 0) keyed
      else keyed
        .withColumn("bucket_n",
          count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
        .filter(col("bucket_n") <= maxBucket)
        .drop("bucket_n")
    bounded.as("a").join(bounded.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
  }
}
