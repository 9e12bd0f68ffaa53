package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-to-document cosine similarity in the sparse TF-IDF space,
  * computed document-at-a-time through a postings self-join — the exact
  * lexical counterpart to the embedding-space [[SemDeDup]]/[[Ann]] family
  * and the pairwise form of q40's per-document TF-IDF weights.
  *
  * Pipeline: tokenize → tf per (doc, term) → df per term → weight
  * `tf · ln(n_docs / df)` → self-join postings on term (id_a < id_b) →
  * `cos = Σ w_a·w_b / (‖a‖·‖b‖)`. Everything is two hash aggregates, one
  * equi-join on term, and two id-keyed norm joins — no all-pairs product
  * anywhere.
  *
  * Scale posture: the term self-join's volume is Σ_t df(t)², so ubiquitous
  * terms dominate cost while contributing ~zero weight (idf → 0 as
  * df → n). `maxDfFrac` drops terms with df > frac·n_docs from the vector
  * space BEFORE the join — the standard stop-term cut that turns the sum
  * into one over rare terms only (on Zipfian corpora the bulk of join
  * volume lives in a handful of stop terms; the spec measures the
  * reduction). Norms are computed over the KEPT terms, so the capped
  * result is the exact cosine of the capped space, not an approximation
  * of the uncapped one. This repo's 31-word synthetic corpus is the
  * documented adversarial case (every term is a stop term — same caveat
  * as [[SetSimilarityJoin]]); q117 therefore runs uncapped on a bounded
  * doc slice, and the cap's effect is spec-tested on a Zipfian corpus.
  */
object SparseCosineJoin {

  /** Scored pairs (id_a < id_b) sharing ≥ 1 kept term.
    *
    * @param minCos    emit only pairs with cosine ≥ this (0.0 = all
    *                  sharing a term); applied on the UNROUNDED value
    * @param maxDfFrac keep terms with df ≤ maxDfFrac·n_docs
    * @return (id_a, id_b, cos) — cos unrounded; callers round for parity
    */
  def pairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCos: Double = 0.0,
      maxDfFrac: Double = 1.0): DataFrame = {
    require(maxDfFrac > 0 && maxDfFrac <= 1,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    require(minCos >= 0 && minCos <= 1, s"minCos must be in [0, 1], got $minCos")
    val tf = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("t"))
      .groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val w = tf.join(df, "t")
      .crossJoin(broadcast(stats))
      .filter(col("df") <= lit(maxDfFrac) * col("n_docs"))
      .select(col("id"), col("t"),
        (col("tf") * log(col("n_docs") / col("df"))).as("w"))
    val norms = w.groupBy(col("id")).agg(sqrt(sum(col("w") * col("w"))).as("nm"))
    val dotp = w.select(col("id").as("id_a"), col("t"), col("w").as("w_a"))
      .join(w.select(col("id").as("id_b"), col("t"), col("w").as("w_b")), "t")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("w_a") * col("w_b")).as("dp"))
    dotp
      .join(norms.select(col("id").as("id_a"), col("nm").as("nm_a")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("nm").as("nm_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("dp") / (col("nm_a") * col("nm_b"))).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
