package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Within-document repetition signals — the Gopher repetition filters
  * (Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
  * Insights from Training Gopher", Table A1): a document that repeats the
  * same n-gram over and over is boilerplate/spam and gets dropped before
  * pretraining. Two signals per document over word n-grams:
  *
  *   - `dup_frac` — fraction of n-gram OCCURRENCES whose gram occurs
  *     more than once in the document (Gopher's "duplicate n-gram
  *     fraction"),
  *   - `top_frac` — characters covered by the single most frequent
  *     n-gram (count × its non-space characters) over the document's
  *     non-space characters (Gopher's "top n-gram character fraction");
  *     the arg-top gram breaks count ties lexicographically.
  *
  * Shape for 100 TB: the per-document gram counts come from ONE
  * explode → hash-aggregate keyed by (doc, gram) — linear in corpus
  * token count with map-side partial aggregation, never O(len²) per
  * document (the higher-order-function alternative rescans the token
  * array once per distinct gram, which dies on long documents). The two
  * signals then reduce in a SECOND hash-aggregate keyed by doc: totals
  * are plain sums and the arg-top gram is `min(struct(-count, gram))` —
  * lexicographic struct comparison IS the (count desc, gram asc) argmax,
  * so no sort, no window, both aggregates partial-merge map-side (the
  * window form was measured 1.7× slower at sf0.1: two sort exchanges
  * over the gram-count table vs none). Document-level constants (`nc`)
  * ride the aggregates as grouping keys (functionally dependent on the
  * doc id — zero extra shuffle rows) instead of a join back to the
  * corpus.
  *
  * Documents with fewer than n tokens have no n-gram and are excluded
  * (both engines agree by construction).
  */
object Repetition {

  /** Per-document n-gram repetition stats:
    * `(idCol, n_grams, dup_frac, top_gram, top_frac)` — fractions
    * r4-snapped ([[graft.queries.Parity]] convention).
    */
  def dupNgramStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in [1, 8], got $n")
    val toks = filter(split(col(textCol), " "), w => w =!= "")
    // all adjacent n-gram occurrences (NOT distinct — dup_frac counts
    // occurrences); token array projected as an attribute first so the
    // transform lambda does not re-split per gram (no CSE into lambdas)
    val grams = docs
      .select(col(idCol),
        length(regexp_replace(col(textCol), " ", "")).as("nc"),
        toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol), col("nc"),
        explode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("gram"))
    val counts = grams
      .groupBy(col(idCol), col("nc"), col("gram"))
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(col(idCol), col("nc"))
      .agg(
        sum(col("c")).as("total"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_occ"),
        min(struct((-col("c")).as("negc"), col("gram"))).as("top"))
      .select(col(idCol),
        col("total").cast("long").as("n_grams"),
        graft.queries.Parity.r4(col("dup_occ").cast("double") / col("total"))
          .as("dup_frac"),
        col("top").getField("gram").as("top_gram"),
        graft.queries.Parity.r4(
          (-col("top").getField("negc"))
            * length(regexp_replace(col("top").getField("gram"), " ", ""))
            / col("nc").cast("double")).as("top_frac"))
  }

  /** The Gopher-style keep/drop verdict over [[dupNgramStats]]: flag a
    * document when either signal exceeds its threshold (Table A1 uses
    * 0.20 for both at n = 2).
    */
  def repetitiveFlag(stats: DataFrame, dupThreshold: Double = 0.20,
      topThreshold: Double = 0.20): DataFrame =
    stats.withColumn("flag_repetitive",
      col("dup_frac") > dupThreshold || col("top_frac") > topThreshold)
}
