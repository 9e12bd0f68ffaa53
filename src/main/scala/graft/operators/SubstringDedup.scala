package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-substring detection — the exact-substring
  * dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better"), re-expressed Spark-first. Instead of a suffix array
  * (a single global sorted structure that does not shard naturally), the
  * same result comes from relational primitives Catalyst already scales:
  *
  *   1. explode each document into its k-character grams, keyed by
  *      (doc_id, pos) — position index exploded FIRST, gram computed in a
  *      select ABOVE the Generate, so the substring runs once per row
  *      (Catalyst does not CSE into lambda bodies; this layout keeps the
  *      hot expression out of any lambda);
  *   2. one hash aggregate finds grams occurring in >= minDocs distinct
  *      documents;
  *   3. an equi-join marks the duplicated positions (AQE broadcasts the
  *      duplicated-gram side when it is small, as it is on real corpora
  *      where duplication is the exception);
  *   4. per-document gaps-and-islands (lag + running sum over one window
  *      partitioned by doc_id) merges overlapping/adjacent duplicated
  *      positions into MAXIMAL spans — `pos - prev_pos > k` starts a new
  *      island, anything closer overlaps or abuts the previous gram.
  *
  * Scale posture: the only data-expanding step is the gram explode
  * (len(text) rows per doc — same blowup the suffix array pays). With
  * `hashShuffle = true` the shuffled payload per gram is an 8-byte
  * xxhash64 instead of the k-char string, so the groupBy/join exchanges
  * carry (hash, doc_id, pos) triples regardless of k — the variant to run
  * at 100 TB, accepting the vanishing 64-bit collision odds exactly as
  * Lee et al.'s hash-based pipeline does. The exact-string form is the
  * oracle-checkable twin; `SubstringDedupSpec` proves the two agree on a
  * corpus, and q100 declares the exact form over the full documents table.
  */
object SubstringDedup {

  /** Maximal per-document spans of text duplicated (k-gram-exactly) across
    * >= minDocs distinct documents. Output: (doc_id, span_start, span_end,
    * span_len), 1-based inclusive character positions, ordered.
    */
  def duplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 20,
      minDocs: Int = 2,
      hashShuffle: Boolean = false): DataFrame = {
    require(k >= 1, s"gram length must be positive, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .filter(length(col("text")) >= k) // sequence(1, n) descends for n < 1
    val gramExpr = expr(s"substr(text, pos, $k)")
    val grams = base
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        (if (hashShuffle) xxhash64(gramExpr) else gramExpr).as("gram"))
    val dup = grams
      .groupBy(col("gram"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("gram"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    grams.join(dup, "gram")
      .select(col("doc_id"), col("pos"))
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wOrd) > k, 1).otherwise(0))
      .withColumn("grp", sum(col("brk"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
      .select(col("doc_id"), col("span_start"), col("span_end"), col("span_len"))
  }
}
