package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.GraftFunctions
import graft.plans.GraftFunctions.vecDot

/** q135: hard-negative mining for contrastive/retrieval training data —
  * for each anchor, the top-K most cosine-similar vectors with a
  * DIFFERENT label ("hard" negatives: maximally confusable, the pairs a
  * contrastive loss learns most from; cf. dense-retrieval training à la
  * DPR/ANCE, where negatives are mined from the nearest non-relevant
  * neighbors).
  *
  * Declared shape: exact brute-force over a broadcast anchor batch —
  * one corpus scan, label inequality applied in the broadcast join
  * condition so candidate rows never materialize for same-label pairs,
  * r4-snapped cosine, ties to the lowest vec_id. Fully oracle-checked.
  *
  * 100 TB posture: the anchor batch is the broadcast side (queries are
  * few; the corpus streams), so cost is corpus_rows × anchors dots with
  * no shuffle before the per-anchor top-K reduction; the per-anchor
  * window runs on anchor-keyed partitions of candidate SCORES only (id +
  * cosine, no embeddings). For anchor batches beyond broadcast size or
  * latency budgets, the production path is the IVF/PQ index family
  * ([[graft.operators.Ann]]) with label post-filtering and over-fetch —
  * same contract as every ANN query in the repo.
  */
object HardNegatives {

  private val NAnchors = 8
  private val K = 5

  private def q135(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    def norm(c: org.apache.spark.sql.Column) = sqrt(vecDot(c, c))
    val anchors = emb.filter(col("vec_id") < NAnchors)
      .select(col("vec_id").as("a_id"), col("label").as("a_label"),
        col("embedding").as("a_emb"), norm(col("embedding")).as("a_nm"))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    emb
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nm"))
      .join(broadcast(anchors), col("label") =!= col("a_label"))
      .select(col("a_id"), col("vec_id"),
        Parity.r4(vecDot(col("embedding"), col("a_emb"))
          / (col("nm") * col("a_nm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("a_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("a_id"), col("rank"))
  }

  private val q135Sql =
    s"""WITH v AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[]))) AS nm
       |  FROM embeddings
       |), a AS (
       |  SELECT vec_id AS a_id, label AS a_label, emb AS a_emb, nm AS a_nm
       |  FROM v WHERE vec_id < $NAnchors
       |), scored AS (
       |  SELECT a.a_id, v.vec_id,
       |    FLOOR(list_dot_product(v.emb, a.a_emb) / (v.nm * a.a_nm)
       |      * 10000 + 0.5) / 10000.0 AS cos
       |  FROM v JOIN a ON v.label <> a.a_label
       |)
       |SELECT a_id, rank, vec_id, cos FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY a_id
       |    ORDER BY cos DESC, vec_id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= $K
       |ORDER BY a_id, rank""".stripMargin

  /** q138: contrastive training triplets — for each anchor, the hardest
    * positive (most-similar SAME-label vector, excluding self) and the
    * hardest negative (most-similar different-label vector), plus the
    * margin between them: the (anchor, positive, negative) table a
    * triplet/InfoNCE loss trains on (SimCSE/DPR-style pair construction).
    * A small margin flags anchors whose nearest same-label and nearest
    * other-label neighbors are confusable — exactly the triplets worth
    * mining. Same broadcast-anchor shape as q135; the two top-1 windows
    * share one scored frame.
    */
  private def q138(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    def norm(c: org.apache.spark.sql.Column) = sqrt(vecDot(c, c))
    val anchors = emb.filter(col("vec_id") < NAnchors)
      .select(col("vec_id").as("a_id"), col("label").as("a_label"),
        col("embedding").as("a_emb"), norm(col("embedding")).as("a_nm"))
    val scored = emb
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nm"))
      .join(broadcast(anchors), col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("vec_id"),
        (col("label") === col("a_label")).as("same"),
        Parity.r4(vecDot(col("embedding"), col("a_emb"))
          / (col("nm") * col("a_nm"))).as("cos"))
    val w = Window.partitionBy(col("a_id"), col("same"))
      .orderBy(col("cos").desc, col("vec_id"))
    val top1 = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val pos = top1.filter(col("same"))
      .select(col("a_id"), col("vec_id").as("pos_id"), col("cos").as("pos_cos"))
    val neg = top1.filter(!col("same"))
      .select(col("a_id"), col("vec_id").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, "a_id")
      .select(col("a_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        (col("pos_cos") - col("neg_cos")).as("margin"))
      .orderBy(col("a_id"))
  }

  private val q138Sql =
    s"""WITH v AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[]))) AS nm
       |  FROM embeddings
       |), a AS (
       |  SELECT vec_id AS a_id, label AS a_label, emb AS a_emb, nm AS a_nm
       |  FROM v WHERE vec_id < $NAnchors
       |), scored AS (
       |  SELECT a.a_id, v.vec_id, v.label = a.a_label AS same,
       |    FLOOR(list_dot_product(v.emb, a.a_emb) / (v.nm * a.a_nm)
       |      * 10000 + 0.5) / 10000.0 AS cos
       |  FROM v JOIN a ON v.vec_id <> a.a_id
       |), top1 AS (
       |  SELECT a_id, vec_id, same, cos FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id, same
       |      ORDER BY cos DESC, vec_id) AS rn
       |    FROM scored)
       |  WHERE rn = 1
       |)
       |SELECT p.a_id, p.vec_id AS pos_id, p.cos AS pos_cos,
       |  n.vec_id AS neg_id, n.cos AS neg_cos, p.cos - n.cos AS margin
       |FROM top1 p JOIN top1 n ON n.a_id = p.a_id
       |WHERE p.same AND NOT n.same
       |ORDER BY p.a_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q135_hard_negatives", q135, Some(q135Sql)),
    QueryDef("q138_training_triplets", q138, Some(q138Sql)))
}
