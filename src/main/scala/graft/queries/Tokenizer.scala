package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Bpe

/** Declared queries for the in-engine BPE tokenizer trainer
  * ([[graft.operators.Bpe]]): q122 learns 6 merge rules from the corpus
  * and emits the merge table; q123 encodes the corpus with the learned
  * vocabulary and emits per-document token counts. BOTH oracles replay
  * TRAINING, not just its output: the DuckDB SQL unrolls the identical
  * argmax+replace iterations (generated CTE-by-CTE below from the same
  * iteration count), so a drift in tie-breaking, pair counting, or merge
  * application fails the hash compare.
  */
object Tokenizer {

  private val NMerges = 6

  /** Unrolled DuckDB training prelude: wt0 … wt`n`, m1 … m`n`. Generated,
    * not hand-copied, so the Spark loop and the SQL agree on `n` by
    * construction.
    */
  private def trainSql(n: Int): String = {
    val sb = new StringBuilder(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), w0 AS (
        |  SELECT word, COUNT(*) AS freq FROM toks WHERE word <> '' GROUP BY 1
        |), wt0 AS (
        |  SELECT word, freq,
        |    ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS sym
        |  FROM w0
        |)""".stripMargin)
    for (i <- 1 to n) {
      sb.append(s""", pr$i AS (
        |  SELECT a[i] AS l, a[i + 1] AS r, SUM(freq) AS cnt
        |  FROM (SELECT freq, string_split(trim(sym), ' ') AS a FROM wt${i - 1}) t
        |  CROSS JOIN UNNEST(generate_series(1, len(a) - 1)) AS g(i)
        |  GROUP BY 1, 2
        |), m$i AS (
        |  SELECT l, r, cnt FROM pr$i ORDER BY cnt DESC, l, r LIMIT 1
        |), wt$i AS (
        |  SELECT word, freq,
        |    replace(replace(replace(sym, ' ', '  '),
        |      ' ' || m.l || '  ' || m.r || ' ',
        |      ' ' || m.l || m.r || ' '), '  ', ' ') AS sym
        |  FROM wt${i - 1} CROSS JOIN m$i m
        |)""".stripMargin)
    }
    sb.toString
  }

  /** q122: the learned merge table. Training runs at plan-construction
    * time via `NMerges` 1-row argmax collects (the bounded-trainer
    * pattern; DESIGN.md §5's determination covers the property).
    */
  private def q122(s: SparkSession, dir: String): DataFrame = {
    val (merges, _) = Bpe.train(
      Bpe.wordTypes(Tables.documents(s, dir), "text"), NMerges)
    Bpe.mergeTable(s, merges).orderBy(col("rank"))
  }

  private val q122Sql = trainSql(NMerges) + "\n" +
    (1 to NMerges)
      .map(i => s"SELECT $i AS rank, l, r, l || r AS merged, " +
        s"CAST(cnt AS BIGINT) AS cnt FROM m$i")
      .mkString(" UNION ALL ") +
    " ORDER BY rank"

  /** q123: per-document token counts under the learned vocabulary —
    * the dictionary-join encode path over the full corpus.
    */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (_, dict) = Bpe.train(Bpe.wordTypes(docs, "text"), NMerges)
    Bpe.encodeCounts(docs, dict, "doc_id", "text").orderBy(col("doc_id"))
  }

  private val q123Sql = trainSql(NMerges) +
    s""", enc AS (
      |  SELECT word, CAST(len(string_split(trim(sym), ' ')) AS BIGINT)
      |    AS n_pieces
      |  FROM wt$NMerges
      |)
      |SELECT t.doc_id, CAST(SUM(e.n_pieces) AS BIGINT) AS n_pieces
      |FROM toks t JOIN enc e ON e.word = t.word
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q122_bpe_train", q122, Some(q122Sql)),
    QueryDef("q123_bpe_encode", q123, Some(q123Sql)))
}
