package graft

import java.sql.Date

import graft.queries.TimeSeries
import org.apache.spark.sql.functions._

/** Edge semantics of the gap-fill resample operator (q75's core), on
  * synthetic shapes the testdata cannot guarantee: multi-day interior
  * gaps, single-day keys, and value changes across gaps.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  test("interior gaps carry the last value forward and are flagged") {
    val daily = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("a", d("2024-01-04"), 4.0),
      ("a", d("2024-01-05"), 5.0))
      .toDF("k", "day", "v")
    val out = TimeSeries.gapFillDaily(daily, "k", "day", "v")
      .orderBy("k", "day")
      .as[(String, Date, Double, Int)].collect().toSeq
    assert(out == Seq(
      ("a", d("2024-01-01"), 1.0, 0),
      ("a", d("2024-01-02"), 1.0, 1),   // filled from Jan 1
      ("a", d("2024-01-03"), 1.0, 1),
      ("a", d("2024-01-04"), 4.0, 0),   // observed value replaces the fill
      ("a", d("2024-01-05"), 5.0, 0)))
  }

  test("single-day keys emit exactly one unfilled row; keys don't leak") {
    val daily = Seq(
      ("solo", d("2024-02-10"), 7.0),
      ("b", d("2024-03-01"), 1.0),
      ("b", d("2024-03-03"), 3.0))
      .toDF("k", "day", "v")
    val out = TimeSeries.gapFillDaily(daily, "k", "day", "v")
      .orderBy("k", "day")
      .as[(String, Date, Double, Int)].collect().toSeq
    assert(out == Seq(
      ("b", d("2024-03-01"), 1.0, 0),
      ("b", d("2024-03-02"), 1.0, 1),
      ("b", d("2024-03-03"), 3.0, 0),
      ("solo", d("2024-02-10"), 7.0, 0)))
    // each key's grid spans ITS OWN [min, max], not the global calendar
    assert(out.count(_._1 == "solo") == 1)
  }

  test("interpolation fills gaps on the straight line between neighbors") {
    val daily = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("a", d("2024-01-04"), 4.0),
      ("a", d("2024-01-05"), 2.0))
      .toDF("k", "day", "v")
    val out = TimeSeries.interpolateDaily(daily, "k", "day", "v")
      .orderBy("k", "day")
      .as[(String, Date, Double, Int)].collect().toSeq
    assert(out == Seq(
      ("a", d("2024-01-01"), 1.0, 0),
      ("a", d("2024-01-02"), 2.0, 1),   // 1 + (4-1) * 1/3
      ("a", d("2024-01-03"), 3.0, 1),   // 1 + (4-1) * 2/3
      ("a", d("2024-01-04"), 4.0, 0),
      ("a", d("2024-01-05"), 2.0, 0)))
  }

  test("gap-fill is one shuffle: agg, join, and window share the key hash") {
    val daily = spark.range(100)
      .select((col("id") % 7).as("k"),
        date_add(lit(d("2024-01-01")), (col("id") % 20).cast("int")).as("day"),
        col("id").cast("double").as("v"))
      .groupBy("k", "day").agg(max("v").as("v"))
    val out = TimeSeries.gapFillDaily(daily, "k", "day", "v")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // one exchange for the shared hash on k (+ possibly one for the range
    // source feeding both sides) — the join and window must NOT re-shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges\n$plan")
  }
}
