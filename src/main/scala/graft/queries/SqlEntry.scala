package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declared queries exercised through the SQL entry point (`spark.sql`) —
  * the same Catalyst pipeline as the DataFrame API, but proving the engine's
  * SQL surface and optimizer behaviors that only SQL exposes (correlated
  * scalar subqueries, GROUPING SETS).
  */
object SqlEntry {

  private def withViews(s: SparkSession, dir: String, tables: String*)(sql: String): DataFrame = {
    tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
    s.sql(sql)
  }

  /** Correlated scalar subquery — Catalyst decorrelates it into a left
    * outer aggregate join (RewriteCorrelatedScalarSubquery); no per-row
    * re-execution, scales as one join.
    */
  private def q42(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "customer", "orders")(
      """SELECT c_custkey, c_name,
        |  (SELECT ROUND(MAX(o_totalprice), 4) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin)

  private val q42Sql =
    """SELECT c_custkey, c_name,
      |  (SELECT ROUND(MAX(o_totalprice), 4) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS max_order
      |FROM customer c
      |ORDER BY c_custkey""".stripMargin

  /** Explicit GROUPING SETS (beyond q10 rollup / q11 cube). */
  private def q43(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "orders")(q43Sql)

  private val q43Sql =
    """SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
      |  o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Correlated EXISTS / NOT EXISTS predicates — Catalyst's
    * RewritePredicateSubquery decorrelates them into LEFT SEMI and LEFT
    * ANTI hash joins (no per-row subquery execution), the form that
    * scales: two joins on o_custkey, broadcast when orders' filtered side
    * is small.
    */
  private def q79(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "customer", "orders")(q79Sql)

  private val q79Sql =
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 150000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Rank-distribution windows (percent_rank, cume_dist) completing the
    * B14 ranking family; total-ordered by a unique tiebreak so the
    * distribution values are deterministic on both engines.
    */
  private def q80(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "orders")(q80Sql)

  private val q80Sql =
    """SELECT o_orderpriority, o_orderkey,
      |  CAST(FLOOR(percent_rank() OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey)*10000+0.5) AS DOUBLE)/10000 AS pr,
      |  CAST(FLOOR(cume_dist() OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey)*10000+0.5) AS DOUBLE)/10000 AS cd
      |FROM orders
      |WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** VALUE-based (RANGE) window frames — each order sees its price
    * neighborhood (±5000) within its status, regardless of row position.
    * RANGE frames include all ORDER BY peers, so the frame contents are
    * deterministic even under ties; the summed measure is an integer
    * derivation (floor of the price) because a double sum's accumulation
    * order inside a sliding frame is engine-specific.
    */
  private def q86(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "orders")(q86Sql)

  private val q86Sql =
    """SELECT o_orderkey, o_custkey,
      |  CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
      |    RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) AS BIGINT) AS n_near,
      |  CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) OVER (
      |    PARTITION BY o_orderstatus ORDER BY o_totalprice
      |    RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) AS BIGINT) AS sum_near
      |FROM orders
      |WHERE o_orderkey % 20 = 0
      |ORDER BY o_orderkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q42_scalar_subquery", q42, Some(q42Sql)),
    QueryDef("q43_grouping_sets", q43, Some(q43Sql)),
    QueryDef("q79_exists_subquery", q79, Some(q79Sql)),
    QueryDef("q80_rank_distribution", q80, Some(q80Sql)),
    QueryDef("q86_range_frame", q86, Some(q86Sql)))
}
