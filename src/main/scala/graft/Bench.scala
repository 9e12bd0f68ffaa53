package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is fully materialized through the noop
  * sink (count() would let Catalyst drop unreferenced projections and
  * under-measure); a warmup pass on the smallest table initializes codegen
  * and the parquet footer caches outside the timed region.
  *
  * Repeat-median methodology (round-6): single-shot timings proved too noisy
  * to gate on — BENCH_r05 vs r04 differed 2x on three queries with zero code
  * change, and BASELINE.md records a 59.6-75.2s spread across identical
  * commits. The bench now runs SPARK_GRAFT_BENCH_REPEATS (default 3) full
  * sweeps over the query set and reports the per-query MEDIAN as the
  * headline number, plus min/max spread for noise diagnosis. Sweeping the
  * whole set N times (rather than repeating each query N times back-to-back)
  * spreads JIT/cache/GC effects evenly instead of handing pass-2 a
  * same-query warm cache.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.installPlanRewrites(spark)
    // warmup: touch each table once (footer cache, codegen JIT). Per-table
    // try/catch: a broken/drifted table must poison ITS queries (which fail
    // below and are counted), not crash the JVM before anything is timed —
    // round 7's testdata regeneration killed the whole bench exactly this way.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        try Tables(spark, sfDir, t).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warmup failed for table $t: ${e.getMessage}")
        }
      }
    // warm the noop WRITE path too (datasource lookup + commit-protocol
    // classloading): measured ~5s one-time cost that the alphabetically
    // first query would otherwise absorb
    spark.range(10).write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.keys.toSeq.sorted
    // timings(name) = one entry per sweep; -1 marks a failed run
    val timings = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (sweep <- 1 to repeats; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name failed (sweep $sweep): ${e.getMessage}"); false
        }
      timings(name) :+= (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    // per-query median over successful sweeps; any failed sweep poisons the query
    val perQuery = names.map { n =>
      val ts = timings(n)
      n -> (if (ts.exists(_ < 0)) -1.0 else r3(median(ts)))
    }
    val qs = perQuery.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = names.map { n =>
      val ts = timings(n).filter(_ >= 0)
      val (lo, hi) = if (ts.isEmpty) (-1.0, -1.0) else (r3(ts.min), r3(ts.max))
      s"\"" + n + "\":[" + lo + "," + hi + "]"
    }.mkString("{", ",", "}")
    // A failed query must poison the TOTAL, not shrink it: summing only the
    // successes would let a broken query read as a faster run (round-1
    // advice finding). total=-1 + "failed" count + nonzero exit make the
    // bench gate reject any run with errors.
    val failed = perQuery.count(_._2 < 0)
    val total = if (failed > 0) -1.0 else r3(perQuery.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"repeats":$repeats,"queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    // Second, SHORT summary line: the full line above is >2000 chars at 127
    // queries, and a tail-capture of the process output slices off its head —
    // including the total (BENCH_r08 had rc=0 but parsed:null for exactly
    // this reason). Printing the headline fields again in a compact trailer
    // guarantees any bounded tail capture still contains a parseable total.
    val trailer = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":${names.length},"sf":"$sfDir"}"""
    println(trailer)
    // Also emit the trailer on STDERR: sbt prefixes every stdout line with
    // "[info] ", which defeats line-oriented JSON parsing downstream
    // (BENCH_r09 had the trailer in the tail but parsed:null for exactly
    // this reason). sbt leaves stderr unprefixed.
    System.err.println(trailer)
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
