package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.KCenter

/** q130: greedy k-center coreset selection ([[graft.operators.KCenter]],
  * Gonzalez 1985) over a bounded embedding slice — the diversity-sampling
  * counterpart to the dedup family. The oracle REPLAYS THE GREEDY
  * TRAJECTORY: each selection round is unrolled as a CTE computing every
  * point's min r4-snapped squared distance to the centers chosen so far
  * and taking the (mind2 desc, id) argmax — so a drift in seeding,
  * snapping, or tie-breaking anywhere in the k rounds fails the hash.
  * The slice (vec_id < 300) bounds the oracle's |V|·k distance work; the
  * operator itself is k corpus scans at any scale (class doc).
  */
object Coreset {

  private val K = 6
  private val Slice = 300L

  private def q130(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).filter(col("vec_id") < Slice)
    KCenter.select(emb, "vec_id", "embedding", K).orderBy(col("rank"))
  }

  /** Unrolled greedy rounds: cents1 = seed; for i in 2..k, mind`i` =
    * min distance to cents(i-1), pick`i` = its argmax, cents`i` = union. */
  private def q130Sql(k: Int): String = {
    val sb = new StringBuilder(
      s"""WITH v AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < $Slice
        |), seed AS (
        |  SELECT id, emb FROM v ORDER BY id LIMIT 1
        |), cents1 AS (
        |  SELECT 1 AS rank, id, emb, 0.0 AS sel_dist2 FROM seed
        |)""".stripMargin)
    for (i <- 2 to k) {
      sb.append(s"""
        |, mind$i AS (
        |  SELECT v.id, ANY_VALUE(v.emb) AS emb,
        |    MIN(FLOOR((list_dot_product(v.emb, v.emb)
        |      + list_dot_product(c.emb, c.emb)
        |      - 2 * list_dot_product(v.emb, c.emb)) * 10000 + 0.5) / 10000.0)
        |      AS mind2
        |  FROM v CROSS JOIN cents${i - 1} c
        |  GROUP BY v.id
        |), pick$i AS (
        |  SELECT $i AS rank, id, emb, mind2 AS sel_dist2
        |  FROM mind$i WHERE mind2 > 0
        |  ORDER BY mind2 DESC, id LIMIT 1
        |), cents$i AS (
        |  SELECT * FROM cents${i - 1} UNION ALL SELECT * FROM pick$i
        |)""".stripMargin)
    }
    sb.append(s"""
      |SELECT rank, id, sel_dist2 FROM cents$k ORDER BY rank""".stripMargin)
    sb.toString
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q130_kcenter_select", q130, Some(q130Sql(K))))
}
