package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is fully materialized through the noop
  * sink (count() would let Catalyst drop unreferenced projections and
  * under-measure); a warmup pass on the smallest table initializes codegen
  * and the parquet footer caches outside the timed region.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.installPlanRewrites(spark)
    // warmup: touch each table once (footer cache, codegen JIT)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables(spark, sfDir, t).count())
    // warm the noop WRITE path too (datasource lookup + commit-protocol
    // classloading): measured ~5s one-time cost that the alphabetically
    // first query would otherwise absorb
    spark.range(10).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      // a failed query must not read as a (fast) success: record -1
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failed query must poison the TOTAL, not shrink it: summing only the
    // successes would let a broken query read as a faster run (round-1
    // advice finding). total=-1 + "failed" count + nonzero exit make the
    // bench gate reject any run with errors.
    val failed = results.count(_._2 < 0)
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
