package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.GraftFunctions
import graft.plans.GraftFunctions.vecDot

/** q143: retrieval evaluation metrics — recall@k, MRR@k, nDCG@k per
  * query, the scorecard that quantifies the repo's retrieval family
  * (BM25 / ANN / hybrid all exist; this measures any of them). The
  * declared form evaluates exact cosine top-10 against same-label
  * relevance (labels are the fixture's ground truth), so every number is
  * a pure arithmetic fold the oracle replays: hits and first-relevant
  * rank from the ranked window, DCG as Σ ln(2)/ln(rank+1) over relevant
  * hits (the 1/log2 gain spelled with ln on BOTH engines — log2's libm
  * path differs, ln of the ten small integers involved does not), IDCG
  * over the ideal prefix via a lateral series.
  *
  * 100 TB posture: metrics are one aggregate over the ranked table
  * (|queries| × k rows) joined against the relevance set on (query, id)
  * — cost is the RANKING's, not the metrics'; this card composes with
  * any ranked output, which is the point.
  */
object RetrievalEval {

  private val NAnchors = 8
  private val K = 10

  private def q143(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    def nm(c: org.apache.spark.sql.Column) = sqrt(vecDot(c, c))
    val anchors = emb.filter(col("vec_id") < NAnchors)
      .select(col("vec_id").as("a_id"), col("label").as("a_label"),
        col("embedding").as("a_emb"), nm(col("embedding")).as("a_nm"))
    val rel = emb.join(broadcast(anchors),
        col("label") === col("a_label") && col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("vec_id"))
    val nRel = rel.groupBy(col("a_id")).agg(count(lit(1)).as("n_rel"))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val ranked = emb
      .select(col("vec_id"), col("embedding"), nm(col("embedding")).as("nmv"))
      .join(broadcast(anchors), col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("vec_id"),
        Parity.r4(vecDot(col("embedding"), col("a_emb"))
          / (col("nmv") * col("a_nm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
    val ln2 = math.log(2.0)
    val m = ranked
      .join(rel.withColumn("is_rel", lit(1)), Seq("a_id", "vec_id"), "left")
      .groupBy(col("a_id"))
      .agg(
        sum(coalesce(col("is_rel"), lit(0))).as("hits"),
        max(when(col("is_rel") === 1, lit(1.0) / col("rank"))
          .otherwise(0.0)).as("mrr_raw"),
        sum(when(col("is_rel") === 1,
          lit(ln2) / log(col("rank") + lit(1.0))).otherwise(0.0)).as("dcg"))
    // ideal DCG: the first min(K, n_rel) ranks all relevant
    val idcg = nRel.select(col("a_id"), col("n_rel"),
      aggregate(sequence(lit(1), least(lit(K), col("n_rel"))),
        lit(0.0), (acc, r) => acc + lit(ln2) / log(r.cast("double") + lit(1.0)))
        .as("idcg"))
    m.join(idcg, "a_id")
      .select(col("a_id"), col("n_rel"), col("hits"),
        Parity.r6(col("hits") / col("n_rel")).as("recall_at10"),
        Parity.r6(col("mrr_raw")).as("mrr_at10"),
        Parity.r6(col("dcg") / col("idcg")).as("ndcg_at10"))
      .orderBy(col("a_id"))
  }

  private val q143Sql =
    s"""WITH v AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[]))) AS nm
       |  FROM embeddings
       |), a AS (
       |  SELECT vec_id AS a_id, label AS a_label, emb AS a_emb, nm AS a_nm
       |  FROM v WHERE vec_id < $NAnchors
       |), rel AS MATERIALIZED (
       |  SELECT a.a_id, v.vec_id
       |  FROM v JOIN a ON v.label = a.a_label AND v.vec_id <> a.a_id
       |), nrel AS (
       |  SELECT a_id, COUNT(*) AS n_rel FROM rel GROUP BY 1
       |), ranked AS (
       |  SELECT a_id, vec_id, rank FROM (
       |    SELECT a.a_id, v.vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY a.a_id ORDER BY
       |        FLOOR(list_dot_product(v.emb, a.a_emb) / (v.nm * a.a_nm)
       |          * 10000 + 0.5) / 10000.0 DESC, v.vec_id) AS rank
       |    FROM v JOIN a ON v.vec_id <> a.a_id)
       |  WHERE rank <= $K
       |), m AS (
       |  SELECT r.a_id,
       |    CAST(SUM(CASE WHEN rel.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits,
       |    MAX(CASE WHEN rel.vec_id IS NOT NULL THEN 1.0 / r.rank
       |      ELSE 0.0 END) AS mrr_raw,
       |    SUM(CASE WHEN rel.vec_id IS NOT NULL
       |      THEN ln(2.0) / ln(r.rank + 1.0) ELSE 0.0 END) AS dcg
       |  FROM ranked r LEFT JOIN rel
       |    ON rel.a_id = r.a_id AND rel.vec_id = r.vec_id
       |  GROUP BY 1
       |), i AS (
       |  -- constant series + filter: DuckDB 1.0's generate_series cannot
       |  -- take lateral column bounds
       |  SELECT n.a_id, n.n_rel,
       |    SUM(ln(2.0) / ln(gs.r + 1.0)) AS idcg
       |  FROM nrel n CROSS JOIN generate_series(1, $K) gs(r)
       |  WHERE gs.r <= LEAST($K, n.n_rel)
       |  GROUP BY 1, 2
       |)
       |SELECT m.a_id, i.n_rel, m.hits,
       |  FLOOR(m.hits / i.n_rel * 1000000 + 0.5) / 1000000.0 AS recall_at10,
       |  FLOOR(m.mrr_raw * 1000000 + 0.5) / 1000000.0 AS mrr_at10,
       |  FLOOR(m.dcg / i.idcg * 1000000 + 0.5) / 1000000.0 AS ndcg_at10
       |FROM m JOIN i ON i.a_id = m.a_id
       |ORDER BY m.a_id""".stripMargin

  // ---------- q153: MMR diversified top-k ----------

  private val MmrQueryId = 0L
  private val MmrC = 20
  private val MmrK = 5
  private val MmrLambda = 0.7

  /** q153 — MMR re-ranking over exact-cosine candidates
    * ([[graft.operators.Mmr]]): top-[[MmrC]] by relevance to vector
    * [[MmrQueryId]], then [[MmrK]] greedy diversified picks at
    * λ = [[MmrLambda]]. The oracle unrolls every greedy step as a CTE —
    * candidate cutoff, per-step max-sim-to-selected, argmax, and the
    * growing selected set — so the declared hash pins the whole
    * trajectory, the established trained-loop pattern.
    */
  private def q153(s: SparkSession, dir: String): DataFrame =
    graft.operators.Mmr.diversifiedTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", MmrQueryId, MmrC, MmrK, MmrLambda)

  private def q153Sql: String = {
    // (1.0 - λ) spelled as the SUBTRACTION on both engines: the Scala
    // greedy computes `1 - lambda` (= 0.30000000000000004 in binary for
    // λ=0.7), so a literal 0.3 here would be a different double
    val head =
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |      CAST(embedding AS DOUBLE[]))) AS nm
         |  FROM embeddings
         |), q AS (
         |  SELECT emb AS q_emb, nm AS q_nm FROM v WHERE vec_id = $MmrQueryId
         |), cand AS (
         |  SELECT v.vec_id,
         |    FLOOR(list_dot_product(v.emb, q.q_emb) / (v.nm * q.q_nm)
         |      * 10000 + 0.5) / 10000.0 AS rel
         |  FROM v CROSS JOIN q WHERE v.vec_id <> $MmrQueryId
         |  ORDER BY rel DESC, vec_id LIMIT $MmrC
         |), ce AS MATERIALIZED (
         |  SELECT c.vec_id, c.rel, v.emb, v.nm FROM cand c JOIN v USING (vec_id)
         |), sims AS MATERIALIZED (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    FLOOR(list_dot_product(a.emb, b.emb) / (a.nm * b.nm)
         |      * 10000 + 0.5) / 10000.0 AS sim
         |  FROM ce a JOIN ce b ON a.vec_id <> b.vec_id
         |), s1 AS (
         |  SELECT vec_id, rel, score FROM (
         |    SELECT vec_id, rel, $MmrLambda * rel AS score,
         |      ROW_NUMBER() OVER (ORDER BY $MmrLambda * rel DESC, vec_id) AS rk
         |    FROM ce) t WHERE rk = 1
         |), sel1 AS (SELECT vec_id FROM s1)""".stripMargin
    val steps = (2 to MmrK).map { t =>
      s""", r$t AS (
         |  SELECT c.vec_id, c.rel,
         |    $MmrLambda * c.rel - (1.0 - $MmrLambda) * MAX(s.sim) AS score
         |  FROM ce c
         |  JOIN sims s ON s.ia = c.vec_id
         |  JOIN sel${t - 1} p ON s.ib = p.vec_id
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
         |  GROUP BY c.vec_id, c.rel
         |), s$t AS (
         |  SELECT vec_id, rel, score FROM (
         |    SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rk
         |    FROM r$t) t WHERE rk = 1
         |), sel$t AS (
         |  SELECT vec_id FROM sel${t - 1} UNION ALL SELECT vec_id FROM s$t
         |)""".stripMargin
    }.mkString
    val arms = (1 to MmrK).map(t =>
      s"SELECT CAST($t AS INTEGER) AS sel_rank, vec_id, rel, " +
        s"FLOOR(score * 10000 + 0.5) / 10000.0 AS mmr_score FROM s$t")
      .mkString("\n  UNION ALL ")
    head + steps + s"""
      |SELECT sel_rank, vec_id, rel, mmr_score FROM (
      |  $arms) u
      |ORDER BY sel_rank""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q143_retrieval_metrics", q143, Some(q143Sql)),
    QueryDef("q153_mmr_rerank", q153, Some(q153Sql)))
}
