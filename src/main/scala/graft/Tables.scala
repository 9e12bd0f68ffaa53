package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md).
  *
  * All tables are plain parquet reads except `events`, whose `ts` column is
  * parquet TIMESTAMP(NANOS) — a type Spark 4.x does not support natively,
  * and which DuckDB 1.0 silently truncates to microseconds on read. We read
  * it as a raw nanosecond BIGINT via `spark.sql.legacy.parquet.nanosAsLong`
  * and expose:
  *   - `ts_ns` : BIGINT nanoseconds since epoch (raw parquet value)
  *   - `ts_us` : BIGINT microseconds since epoch == DuckDB `epoch_us(ts)`
  *   - `ts`    : TIMESTAMP at microsecond precision (for interval/window ops)
  * so both engines agree bit-for-bit on every time value used in a query.
  *
  * Scale note: these are single-file reads here; at cluster scale the same
  * code reads directory-partitioned parquet unchanged, and every downstream
  * operator is written against the DataFrame API so Catalyst pushes filters
  * and prunes columns into the scan.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** SESSION-WIDE SIDE EFFECT: sets `spark.sql.legacy.parquet.nanosAsLong`
    * for the whole session and leaves it set. It cannot be scoped per-read:
    * the parquet-to-Spark schema converter consults the live SQLConf at
    * physical-planning/execution time (after this method returns), so
    * restoring the previous value would break the scan it was set for. Any
    * later nanos-timestamp parquet read in the same session will therefore
    * also load as BIGINT nanoseconds instead of erroring.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
