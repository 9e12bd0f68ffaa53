package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series and statistical-aggregate operators (engine surface B16/B26/
  * B27 extensions): calendar resampling with gap-filling forward
  * interpolation, and the full SQL statistical-aggregate family
  * (corr/covariance/variance/regression/median).
  *
  * Scale posture: the gap-fill grid is generated PER KEY from that key's own
  * [min, max] span (`sequence` + explode) — no global calendar broadcast, no
  * cross-key skew; the forward-fill window and the grid join both key on
  * user_id, so under AQE the aggregate, join, and window share one hash
  * partitioning. Stat aggregates are single-pass hash aggregates with
  * map-side partials (Spark's CentralMomentAgg/Corr/Covariance are all
  * mergeable) — the textbook 100 TB shape.
  */
object TimeSeries {

  private def r4(c: Column): Column = Parity.r4(c)

  /** Reusable gap-fill operator: given one row per (key, day), emit every
    * day of each key's own [min, max] span, carrying the last seen value
    * forward over missing days (`last(..., ignoreNulls)` over an
    * unbounded-preceding rows frame) and flagging filled rows with
    * `is_gap`. The first grid day always has data (the span starts at an
    * observed day), so the filled value is never null. The per-key grid,
    * the join, and the fill window all hash on `keyCol`, so the whole
    * operator is one shuffle.
    */
  def gapFillDaily(
      daily: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val grid = daily.groupBy(keyCol)
      .agg(min(dayCol).as("d0"), max(dayCol).as("d1"))
      .select(col(keyCol),
        explode(expr("sequence(d0, d1, interval 1 day)")).as(dayCol))
    val ff = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        last(col(valueCol), ignoreNulls = true).over(ff).as(s"${valueCol}_ff"),
        when(col(valueCol).isNull, lit(1)).otherwise(lit(0)).as("is_gap"))
  }

  /** Linear-interpolation resample — [[gapFillDaily]]'s smooth sibling:
    * missing days take the straight line between the previous and next
    * observed values (both always exist: the grid spans observed days).
    * Two symmetric ignore-nulls windows find the neighbors; the lerp is
    * plain arithmetic in identical operation order on both engines, so
    * even the doubles hash-match after rounding. Same one-key-hash plan
    * shape as the forward fill.
    */
  def interpolateDaily(
      daily: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val grid = daily.groupBy(keyCol)
      .agg(min(dayCol).as("d0g"), max(dayCol).as("d1g"))
      .select(col(keyCol),
        explode(expr("sequence(d0g, d1g, interval 1 day)")).as(dayCol))
    val wPrev = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val obsDay = when(v.isNotNull, col(dayCol))
    val lerp = col("v0") + (col("v1") - col("v0")) *
      (datediff(col(dayCol), col("pd")) / datediff(col("nd"), col("pd")))
    grid.join(daily, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol), v,
        last(v, ignoreNulls = true).over(wPrev).as("v0"),
        last(obsDay, ignoreNulls = true).over(wPrev).as("pd"),
        first(v, ignoreNulls = true).over(wNext).as("v1"),
        first(obsDay, ignoreNulls = true).over(wNext).as("nd"))
      .select(col(keyCol), col(dayCol),
        when(v.isNotNull, v).otherwise(Parity.r4(lerp))
          .as(s"${valueCol}_lerp"),
        when(v.isNull, lit(1)).otherwise(lit(0)).as("is_gap"))
  }

  /** q75's interpolating variant over the same per-user daily series. */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day")
      .agg(r4(avg("value")).as("v"))
    interpolateDaily(daily, "user_id", "day", "v")
      .select(col("user_id"), col("day"), col("v_lerp").as("value_lerp"),
        col("is_gap"))
      .orderBy("user_id", "day")
  }

  private val q88Sql =
    """WITH ev AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value
      |  FROM events
      |), daily AS (
      |  SELECT user_id, day, FLOOR(avg(value)*10000+0.5)/10000.0 AS v
      |  FROM ev GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY user_id
      |), n AS (
      |  SELECT g.user_id, g.day, d.v,
      |    last_value(d.v IGNORE NULLS) OVER wp AS v0,
      |    last_value(CASE WHEN d.v IS NOT NULL THEN g.day END IGNORE NULLS) OVER wp AS pd,
      |    first_value(d.v IGNORE NULLS) OVER wn AS v1,
      |    first_value(CASE WHEN d.v IS NOT NULL THEN g.day END IGNORE NULLS) OVER wn AS nd
      |  FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
      |  WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wn AS (PARTITION BY g.user_id ORDER BY g.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id, day,
      |  CASE WHEN v IS NOT NULL THEN v
      |    ELSE FLOOR((v0 + (v1 - v0) * ((day - pd) / (nd - pd)))*10000+0.5)/10000.0
      |  END AS value_lerp,
      |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
      |FROM n
      |ORDER BY user_id, day""".stripMargin

  /** Gap-fill / resample query: daily average event value per user,
    * forward-filled across each user's inactive days via [[gapFillDaily]].
    */
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day")
      .agg(r4(avg("value")).as("v"))
    gapFillDaily(daily, "user_id", "day", "v")
      .select(col("user_id"), col("day"), col("v_ff").as("value_ff"),
        col("is_gap"))
      .orderBy("user_id", "day")
  }

  private val q75Sql =
    """WITH ev AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value
      |  FROM events
      |), daily AS (
      |  SELECT user_id, day, FLOOR(avg(value)*10000+0.5)/10000.0 AS v
      |  FROM ev GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY user_id
      |)
      |SELECT g.user_id, g.day,
      |  last_value(d.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
      |  CASE WHEN d.v IS NULL THEN 1 ELSE 0 END AS is_gap
      |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
      |ORDER BY g.user_id, g.day""".stripMargin

  /** B27 statistical aggregates, the full SQL-standard family in one hash
    * aggregate: Pearson correlation, population/sample covariance,
    * stddev/variance, least-squares regression (slope/intercept/r2), and
    * exact median. Every one is a mergeable partial aggregate in Spark —
    * one shuffle of 3-6 moment doubles per group, never the raw rows.
    */
  /** Round-17 shape: the nine moment aggregates are DECLARATIVE (partial-
    * aggregating, codegen'd), but one `median` in the same agg used to drag
    * the whole thing through ObjectHashAggregate's interpreted per-row
    * update path (a TypedImperativeAggregate in an agg list disables
    * whole-stage codegen for ALL its siblings). Splitting the median into
    * its own branch via [[Relational.exactPercentiles]] (a histogram +
    * interpolation replay of Percentile's exact math — bit-equal, see the
    * helper's doc) lets the moments run as one codegen HashAggregate and
    * the median ride a tiny (flag, quantity)-histogram; the two 3-row
    * results broadcast-join back. Oracle hash unchanged (driver-checked).
    */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val moments = li
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
        r4(covar_pop(col("l_quantity"), col("l_extendedprice"))).as("covar_p"),
        r4(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("covar_s"),
        r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
        r4(var_pop(col("l_quantity"))).as("var_qty"),
        r4(regr_slope(col("l_extendedprice"), col("l_quantity"))).as("slope"),
        r4(regr_intercept(col("l_extendedprice"), col("l_quantity"))).as("icept"),
        r4(regr_r2(col("l_extendedprice"), col("l_quantity"))).as("r2"))
    val med = Relational.exactPercentiles(
      li, "l_returnflag", col("l_quantity").cast("double"),
      Seq(0.5), Seq("med_raw"))
    moments.join(broadcast(med), "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("corr_qp"), col("covar_p"),
        col("covar_s"), col("sd_qty"), col("var_qty"), col("slope"),
        col("icept"), col("r2"), r4(col("med_raw")).as("med_qty"))
      .orderBy("l_returnflag")
  }

  private val q76Sql =
    """SELECT l_returnflag,
      |  count(*) AS n,
      |  FLOOR(corr(l_quantity, l_extendedprice)*10000+0.5)/10000.0 AS corr_qp,
      |  FLOOR(covar_pop(l_quantity, l_extendedprice)*10000+0.5)/10000.0 AS covar_p,
      |  FLOOR(covar_samp(l_quantity, l_extendedprice)*10000+0.5)/10000.0 AS covar_s,
      |  FLOOR(stddev_samp(l_quantity)*10000+0.5)/10000.0 AS sd_qty,
      |  FLOOR(var_pop(l_quantity)*10000+0.5)/10000.0 AS var_qty,
      |  FLOOR(regr_slope(l_extendedprice, l_quantity)*10000+0.5)/10000.0 AS slope,
      |  FLOOR(regr_intercept(l_extendedprice, l_quantity)*10000+0.5)/10000.0 AS icept,
      |  FLOOR(regr_r2(l_extendedprice, l_quantity)*10000+0.5)/10000.0 AS r2,
      |  FLOOR(median(CAST(l_quantity AS DOUBLE))*10000+0.5)/10000.0 AS med_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** B26/B27 — recency-weighted (exponential-decay) user features, the
    * feature-store staple: per user, value mass and purchase count decayed
    * by e^(−λ·age_days) from the corpus max timestamp (λ = 0.1/day ⇒
    * ~7-day half-life). One broadcast 1-row reference time, one hash
    * aggregate — map-side partials carry the decayed partial sums, so the
    * exchange is |users| rows at any corpus size. exp parity follows the
    * q40 ln precedent (IEEE libm + round-4 hash-matches DuckDB); ages are
    * exact integer micros so the exponent is bit-identical on both sides.
    */
  private def q110(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("value"))
    val mx = e.agg(max(col("ts_us")).as("t_ref"))
    val wgt = exp(lit(-0.1) * (col("t_ref") - col("ts_us")) / lit(86400000000.0))
    e.crossJoin(broadcast(mx))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value") * wgt), 4).as("decayed_value"),
        round(sum(when(col("event_type") === "purchase", wgt)
          .otherwise(lit(0.0))), 4).as("decayed_purchases"))
      .orderBy(col("user_id"))
  }

  private val q110Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, value FROM events
      |), mx AS (
      |  SELECT MAX(ts_us) AS t_ref FROM e
      |)
      |SELECT user_id,
      |  COUNT(*) AS n_events,
      |  ROUND(SUM(value * EXP(-0.1 * (t_ref - ts_us) / 86400000000.0)), 4) AS decayed_value,
      |  ROUND(SUM(CASE WHEN event_type = 'purchase'
      |    THEN EXP(-0.1 * (t_ref - ts_us) / 86400000000.0) ELSE 0 END), 4) AS decayed_purchases
      |FROM e CROSS JOIN mx
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q110_decay_features", q110, Some(q110Sql)),
    QueryDef("q75_gap_fill", q75, Some(q75Sql)),
    QueryDef("q76_stat_funcs", q76, Some(q76Sql)),
    QueryDef("q88_interpolate", q88, Some(q88Sql)))
}
