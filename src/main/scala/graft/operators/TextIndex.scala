package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index + BM25 search-from-disk — the TEXT twin of the
  * ANN index lifecycle (Ann.buildIvfIndex / Pq.buildPqIndex): tokenize and
  * aggregate the corpus ONCE, then every query reads only its own terms'
  * postings. Layout:
  *
  *   path/postings  (word, doc_id, tf)   — one row per posting
  *   path/doclens   (doc_id, dl)         — document lengths
  *   path/stats     (n_docs, avgdl)      — 1-row corpus constants
  *
  * At search time the query-term filter is an `In` predicate the parquet
  * scan receives as a pushed filter, so a 3-term query over a 100 TB
  * corpus reads 3 terms' postings, never the corpus — the property that
  * makes build-once/search-many the point of an inverted index. Scoring
  * is identical to the inline BM25 (q108); `TextIndexSpec` pins
  * indexed == inline equality and the pushdown.
  */
object TextIndex {

  /** Tokenize + aggregate + write. Overwrite-idempotent. */
  def buildTextIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("word"))
    toks.groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .write.mode("overwrite").parquet(s"$path/postings")
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    dl.write.mode("overwrite").parquet(s"$path/doclens")
    dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Incremental APPEND of new documents — the text twin of
    * `Ann.appendToIvfIndex`: for NEW doc ids, postings and doclens are
    * strictly additive (parquet append, cost ∝ batch), and only the 1-row
    * stats frame is recomputed from the merged doclens. Ids already in
    * the index are refused loudly BEFORE any write (appending them would
    * silently double their postings); same single-writer isolation caveat
    * as `Curation.upsertByKey`.
    */
  def appendToTextIndex(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    val existing = spark.read.parquet(s"$path/doclens").select(col("doc_id"))
    val overlap = newDocs.select(col(idCol).as("doc_id"))
      .join(existing, "doc_id").limit(1).count()
    require(overlap == 0,
      "appendToTextIndex: batch contains doc ids already indexed — " +
        "appending would double their postings; rebuild or delete first")
    val toks = newDocs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("word"))
    toks.groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .write.mode("append").parquet(s"$path/postings")
    toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .write.mode("append").parquet(s"$path/doclens")
    spark.read.parquet(s"$path/doclens")
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k strictly from the persisted index — no tokenization, no
    * corpus access; the term filter reaches the postings scan.
    */
  def bm25TopK(
      spark: SparkSession,
      path: String,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("word").isin(terms: _*))
    val dl = spark.read.parquet(s"$path/doclens")
    val stats = spark.read.parquet(s"$path/stats")
    val df = postings.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    postings.join(df, "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idf * col("tf") * lit(k1 + 1.0) / norm)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("term_score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
