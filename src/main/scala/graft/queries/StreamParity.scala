package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-parity forms of the streaming window operators (B35): the SAME
  * [[graft.streaming.Streams]] transforms run here over the batch events
  * table and are hash-checked against DuckDB epoch arithmetic — proving the
  * window semantics once, which StreamingSpec then shows are identical on
  * the MemoryStream path.
  *
  * Spark aligns tumbling/sliding windows to the epoch and the session is
  * pinned UTC, so `window(ts, size[, slide]).start` ==
  * `(epoch_us // size_us) * size_us`.
  */
object StreamParity {

  /** B35 — tumbling 10-minute windows per event type, via Streams.tumblingCounts. */
  private def q36(s: SparkSession, dir: String): DataFrame =
    Streams.tumblingCounts(Tables.events(s, dir))
      .select(unix_micros(col("w_start")).as("w_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start_us"), col("event_type"))

  private val q36Sql =
    """SELECT (epoch_us(ts) // 600000000) * 600000000 AS w_start_us,
      |  event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start_us, event_type""".stripMargin

  /** B35 — sliding windows (10 min size, 5 min slide): every event lands in
    * exactly two windows; oracle unrolls the slide index.
    */
  private def q37(s: SparkSession, dir: String): DataFrame =
    Streams.slidingCounts(Tables.events(s, dir))
      .select(unix_micros(col("w_start")).as("w_start_us"), col("n"))
      .orderBy(col("w_start_us"))

  private val q37Sql =
    """SELECT ((epoch_us(ts) // 300000000) - k) * 300000000 AS w_start_us,
      |  COUNT(*) AS n
      |FROM events, range(0, 2) r(k)
      |GROUP BY 1
      |ORDER BY w_start_us""".stripMargin

  /** B36 — the REAL session_window() operator in batch mode, hash-checked
    * against DuckDB's gap-island formulation: proves Spark's session merge
    * semantics (end = last event + gap) equal the lag+cumsum islands that
    * q24 uses, closing the loop between the two formulations.
    */
  private def q52(s: SparkSession, dir: String): DataFrame =
    Streams.sessionStats(Tables.events(s, dir), "30 minutes")
      .select(col("user_id"),
        unix_micros(col("s_start")).as("s_start_us"),
        unix_micros(col("s_end")).as("s_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("s_start_us"))

  private val q52Sql =
    """SELECT user_id, MIN(ts_us) AS s_start_us,
      |  MAX(ts_us) + 1800000000 AS s_end_us,
      |  COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
      |FROM (
      |  SELECT user_id, value, ts_us,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
      |  FROM (
      |    SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
      |      CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL THEN 1
      |           WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000 THEN 1
      |           ELSE 0 END AS is_new
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |  ) flagged
      |) sessions
      |GROUP BY user_id, island
      |ORDER BY user_id, s_start_us""".stripMargin

  /** Stream-stream join batch parity: the SAME Streams.clickToPurchase
    * transform (watermarks are a no-op on batch frames) matching each
    * purchase to the same user's clicks in the preceding hour, against the
    * plain-SQL time-range join.
    */
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    Streams.clickToPurchase(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  private val q62Sql =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
      |FROM events c
      |JOIN events p ON p.user_id = c.user_id
      |  AND c.event_type = 'click' AND p.event_type = 'purchase'
      |  AND epoch_us(c.ts) <= epoch_us(p.ts)
      |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
      |ORDER BY 1, 2, 3""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q36_tumbling_batch", q36, Some(q36Sql)),
    QueryDef("q37_sliding_batch", q37, Some(q37Sql)),
    QueryDef("q52_session_window_batch", q52, Some(q52Sql)),
    QueryDef("q62_stream_join_batch", q62, Some(q62Sql)))
}
