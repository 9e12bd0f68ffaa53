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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q42_scalar_subquery", q42, Some(q42Sql)),
    QueryDef("q43_grouping_sets", q43, Some(q43Sql)))
}
