package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval by Reciprocal Rank Fusion (Cormack, Clarke &
  * Buettcher, SIGIR 2009): fuse N rankings of the same id space into one
  * list by summing `1 / (rrfK + rank_i)` over the lists each id appears
  * in. RRF is the standard way a retrieval pipeline combines a lexical
  * ranker (BM25) with a semantic one (embedding cosine) without having to
  * calibrate their incomparable score scales — only RANKS cross the
  * fusion boundary.
  *
  * Scale posture: fusion itself is cheap by construction — each input is
  * a top-`perListK` ranking, so the union carries at most
  * `lists * perListK` rows regardless of corpus size; the heavy lifting
  * stays in the upstream retrievals, which are this repo's existing scale
  * paths (term-pruned BM25 over the persisted text index, cell-pruned
  * IVF/PQ cosine search). Each list is ranked independently
  * (`row_number` partitioned by a constant list id — N tiny single-key
  * windows, not one global sort), then one hash aggregate by id. Nothing
  * here touches the corpus.
  */
object HybridSearch {

  /** Fuse pre-scored rankings into RRF order.
    *
    * @param rankings  one DataFrame per retriever, each with `idCol` and
    *                  `scoreCol` (higher = better). Lists need not cover
    *                  the same ids; an id absent from a list contributes
    *                  no term for it (standard RRF).
    * @param perListK  rank cutoff applied per list BEFORE fusion — ids
    *                  ranked below it in a list get no credit from that
    *                  list, mirroring "fuse the top-k of each retriever".
    * @param rrfK      the smoothing constant; 60 is the paper's value.
    * @return one row per surviving id: (id, rrf_score, per-list ranks as
    *         `rank_1..rank_n`, nullable where the id missed the cutoff),
    *         ordered by (rrf_score desc, id) — ties broken
    *         deterministically so results are oracle-checkable.
    */
  def rrf(
      rankings: Seq[DataFrame],
      idCol: String,
      scoreCol: String,
      topK: Int,
      perListK: Int = 50,
      rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(topK > 0 && perListK > 0 && rrfK > 0,
      s"topK/perListK/rrfK must be positive, got $topK/$perListK/$rrfK")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"),
        lit(i + 1).as("list_id"))
    }.reduce(_.unionByName(_))
    // rank within each list by (score desc, id): the id tiebreak keeps
    // equal-score ranks deterministic, which fusion then inherits
    val w = Window.partitionBy(col("list_id"))
      .orderBy(col("score").desc, col("id"))
    val ranked = tagged
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perListK)
    val perListRank: Int => Column = i =>
      max(when(col("list_id") === i, col("rank"))).cast("long").as(s"rank_$i")
    ranked
      .groupBy(col("id"))
      .agg(sum(lit(1.0) / (lit(rrfK) + col("rank"))).as("rrf_raw"),
        rankings.indices.map(i => perListRank(i + 1)): _*)
      // 6 decimals: RRF terms are exact small rationals in double on both
      // engines; r6 only normalizes the final sum's representation
      .withColumn("rrf_score", graft.queries.Parity.r6(col("rrf_raw")))
      .drop("rrf_raw")
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(topK)
  }
}
