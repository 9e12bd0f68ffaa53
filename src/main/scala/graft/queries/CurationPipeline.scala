package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** q154 — the round-10 curation END GAME (the q129 pattern: compose the
  * round's trained/derived signals into the decision a pretraining run
  * actually makes, and oracle-replay the WHOLE composition): every
  * training document (doc_id ≥ 10; < 10 is the benchmark slice) passes
  * through four gates in priority order and the per-source data card
  * reports the first gate each document failed:
  *
  *   1. `repetitive`   — Gopher duplicate/top 2-gram verdict (q149),
  *   2. `contaminated` — ≥ 10% of 3-gram shingles shared with the
  *      benchmark slice (q150's medium/high severities),
  *   3. `ppl_tail`     — worst tertile of mean piece NLL under the q147
  *      unigram LM (q152's bucketing over the pipeline population),
  *   4. `low_dsir`     — bottom quintile of DSIR importance weight
  *      (q151's model over the full corpus, ranked within the pipeline
  *      population).
  *
  * Everything reuses the already-declared machinery — the unigram LM
  * comes from the per-(session, dataset) trained-artifact store, the
  * signal operators are the same objects q149–q152 call — so the oracle
  * (one statement replaying LM training, Viterbi scoring, both signal
  * families, the DSIR model, both ntiles, and the verdict CASE) pins the
  * full pipeline, not four independent pieces.
  *
  * Scale: each signal is its documented shape (hash aggregates /
  * broadcast joins / bounded-trainer LM); the composition adds four
  * co-keyed equi-joins on doc_id. The two global ntiles are the
  * established single-partition-window caveat (deployment: cut points +
  * CASE, the q137 note). `tokens_kept` is in unigram pieces — the same
  * unit q129 budgets in BPE pieces.
  */
object CurationPipeline {

  private val DsirSlots = 16

  private def q154(s: SparkSession, dir: String): DataFrame =
    card(s, dir, QualitySignals.dsirWeights(s, dir))

  /** q176 — q154's card in UNTRUSTED-METADATA mode (VERDICT r14 task 6):
    * the one gate that consumed the corpus's `lang` column (DSIR's target
    * slice) now gates on q171's PREDICTED label instead — the substitution
    * contract q173 proved on the q70 sampler, wired into the heavyweight
    * consumer. Everything else (repetition, contamination, ppl tertile,
    * the verdict CASE, the card shape) is byte-identical to q154, and the
    * oracle replays the ENTIRE composition: langid featurize → closed-form
    * train → integer-grid argmax spliced into the unigram-LM + four-gate
    * statement.
    */
  private def q176(s: SparkSession, dir: String): DataFrame =
    card(s, dir, QualitySignals.dsirWeightsPred(s, dir))

  /** The dsir-independent 3/4 of the card — train ⋈ rep ⋈ con ⋈
    * (ppl + its tertile) — built once per (session, dataset) and shared
    * by q154 and q176 (round 18): the two cards differ ONLY in the DSIR
    * frame, yet each sweep re-ran the three signal joins and the global
    * ppl ntile twice. All inputs are the deterministic signal artifacts;
    * the ntile order (nll, doc_id) is total, so the frame is
    * value-identical run to run and the checkpoint preserves it exactly.
    */
  private val baseCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def cardBase(s: SparkSession, dir: String): DataFrame =
    ArtifactCache.get(baseCache, (s, dir)) {
      val docs = Tables.documents(s, dir)
      val train = docs.filter(col("doc_id") >= 10)
      // every signal frame is the SHARED per-(session, dataset) artifact
      // its declared query also serves (per-document stats: the
      // pipeline's population is a filter of the same frame)
      val rep = QualitySignals.repStats(s, dir)
        .select(col("doc_id"), col("flag_repetitive"))
      val con = QualitySignals.conStats(s, dir)
        .select(col("doc_id"), col("contaminated_frac"))
      val ppl = UnigramTok.scoredDocs(s, dir)
        .filter(col("doc_id") >= 10)
        .select(col("doc_id"), col("n_pieces"),
          Parity.r4(-col("lp_sum") / col("n_pieces")).as("nll"))
        .withColumn("ptile",
          ntile(3).over(Window.orderBy(col("nll"), col("doc_id"))))
      train.select(col("doc_id"), col("source"))
        .join(rep, Seq("doc_id"), "left")
        .join(con, Seq("doc_id"), "left")
        .join(ppl, Seq("doc_id"), "left")
        .localCheckpoint(true)
    }

  private def card(s: SparkSession, dir: String, dsirFrame: DataFrame): DataFrame = {
    val dsir = dsirFrame
      .filter(col("doc_id") >= 10)
      .select(col("doc_id"), col("log_weight"))
      .withColumn("wtile",
        ntile(5).over(Window.orderBy(col("log_weight"), col("doc_id"))))
    val verdict =
      when(coalesce(col("flag_repetitive"), lit(false)), "repetitive")
        .when(coalesce(col("contaminated_frac"), lit(0.0)) >= 0.1, "contaminated")
        .when(col("ptile") === 3, "ppl_tail")
        .when(col("wtile") === 1, "low_dsir")
        .otherwise("kept")
    def cnt(v: String) =
      sum(when(col("verdict") === v, 1L).otherwise(0L)).as(s"n_$v")
    // LEFT joins on every signal (round-10 review): a degenerate training
    // doc can be absent from a signal frame (< 3 tokens -> no shingles;
    // no scorable word -> no LM score; no tokens -> no DSIR weight) and
    // must still appear on the card — missing contamination counts as 0,
    // a missing tile fails no gate (NULL comparisons fall through the
    // CASE identically in both engines), and a kept-but-unscorable doc
    // contributes 0 tokens (SUM ignores its NULL n_pieces).
    cardBase(s, dir)
      .join(dsir, Seq("doc_id"), "left")
      .withColumn("verdict", verdict)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        cnt("repetitive"), cnt("contaminated"), cnt("ppl_tail"),
        cnt("low_dsir"), cnt("kept"),
        sum(when(col("verdict") === "kept", col("n_pieces"))
          .otherwise(0L)).as("tokens_kept"))
      .orderBy(col("source"))
  }

  /** The one-statement oracle: unigram-LM training prelude (seed + EM,
    * shared CTE names with q147/q152 by construction), Viterbi dictionary
    * + per-doc NLL, prefixed repetition/contamination/DSIR blocks, both
    * ntiles, verdict, card. With `pred = true` (q176), the langid scoring
    * prelude (Langid.scoreCtesSql — featurize → closed-form centroid train
    * → integer-grid argmax) is spliced into the chain and the DSIR token
    * frame takes its language from the PREDICTED label, so the composed
    * statement replays the full untrusted-metadata pipeline. */
  private def q154Sql: String = cardSql(pred = false)
  private def q176Sql: String = cardSql(pred = true)

  private def cardSql(pred: Boolean): String = {
    val W = UnigramTok.W
    val npCase = (1 to W)
      .map(s => s"CASE WHEN fpiece$s IS NOT NULL THEN 1 ELSE 0 END")
      .mkString(" + ")
    val scCase = "CASE fn " +
      (1 to W).map(j => s"WHEN $j THEN fd$j").mkString(" ") + " END"
    val dsTk = if (pred)
      """, ds_tk AS (
      |  SELECT d.doc_id, sc.lang_pred AS lang,
      |    unnest(string_split(d.text, ' ')) AS tok
      |  FROM documents d JOIN scored sc USING (doc_id)
      |)""".stripMargin
    else
      """, ds_tk AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |)""".stripMargin
    UnigramTok.seedSql +
      (1 to UnigramTok.T).map(UnigramTok.emSql).mkString +
      s""", wtenc AS (
      |  SELECT word FROM wt WHERE len(word) <= $W
      |)""".stripMargin +
      UnigramTok.dpSql("f", "wtenc", s"lp${UnigramTok.T}") +
      (if (pred) ", " + Langid.scoreCtesSql.stripSuffix("\n") else "") +
      s""", pp_dict AS MATERIALIZED (
      |  SELECT word, CAST($npCase AS BIGINT) AS np,
      |    FLOOR(($scCase) * 1000000 + 0.5) / 1000000.0 AS sc
      |  FROM fr_$W
      |), pp_dw AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents WHERE doc_id >= 10
      |), pp_sum AS (
      |  SELECT d.doc_id, CAST(SUM(np) AS BIGINT) AS n_pieces,
      |    FLOOR(SUM(sc) * 1000000 + 0.5) / 1000000.0 AS lp_sum
      |  FROM pp_dw d JOIN pp_dict USING (word)
      |  WHERE d.word <> '' GROUP BY 1
      |), pp_t AS (
      |  SELECT doc_id, n_pieces,
      |    NTILE(3) OVER (ORDER BY
      |      FLOOR(-lp_sum / n_pieces * 10000 + 0.5) / 10000.0, doc_id)
      |      AS ptile
      |  FROM pp_sum
      |), rep_t AS (
      |  SELECT doc_id, len(replace(text, ' ', '')) AS nc,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS toksr
      |  FROM documents WHERE doc_id >= 10
      |), rep_g AS (
      |  SELECT doc_id, nc, unnest(list_transform(
      |    generate_series(1, len(toksr) - 1),
      |    i -> array_to_string(toksr[i:i+1], ' '))) AS gram
      |  FROM rep_t WHERE len(toksr) >= 2
      |), rep_c AS (
      |  SELECT doc_id, nc, gram, COUNT(*) AS c FROM rep_g GROUP BY 1, 2, 3
      |), rep_s AS (
      |  SELECT doc_id, nc, gram, c,
      |    SUM(c) OVER (PARTITION BY doc_id) AS total,
      |    SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
      |      OVER (PARTITION BY doc_id) AS dup_occ,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rk
      |  FROM rep_c
      |), rep_f AS (
      |  SELECT doc_id,
      |    (FLOOR(dup_occ / total * 10000 + 0.5) / 10000.0 > 0.2
      |     OR FLOOR(c * len(replace(gram, ' ', '')) / CAST(nc AS DOUBLE)
      |          * 10000 + 0.5) / 10000.0 > 0.2) AS flag
      |  FROM rep_s WHERE rk = 1
      |), con_t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tokc FROM documents
      |), con_g AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(tokc) - ${QualitySignals.ShingleN - 1}),
      |    i -> array_to_string(tokc[i:i+${QualitySignals.ShingleN - 1}], ' '))))
      |    AS gram
      |  FROM con_t
      |), con_bench AS (
      |  SELECT DISTINCT gram FROM con_g WHERE doc_id < 10
      |), con_f AS (
      |  SELECT c.doc_id,
      |    FLOOR(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
      |      / COUNT(*) * 10000 + 0.5) / 10000.0 AS cfrac
      |  FROM con_g c LEFT JOIN con_bench b USING (gram)
      |  WHERE c.doc_id >= 10 GROUP BY 1
      |)""".stripMargin + dsTk + s""", ds_sl AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % $DsirSlots AS slot
      |  FROM ds_tk WHERE tok <> ''
      |), ds_cnt AS (
      |  SELECT slot, COUNT(*) AS c_raw,
      |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_t
      |  FROM ds_sl GROUP BY 1
      |), ds_tot AS (
      |  SELECT SUM(c_raw) AS t_raw, SUM(c_t) AS t_t FROM ds_cnt
      |), ds_slots AS (
      |  SELECT unnest(generate_series(0, ${DsirSlots - 1})) AS slot
      |), ds_lr AS (
      |  SELECT s.slot,
      |    FLOOR(ln((COALESCE(c.c_t, 0) + 1.0) / (t.t_t + $DsirSlots.0))
      |        * 1000000 + 0.5) / 1000000.0
      |    - FLOOR(ln((COALESCE(c.c_raw, 0) + 1.0) / (t.t_raw + $DsirSlots.0))
      |        * 1000000 + 0.5) / 1000000.0 AS lr
      |  FROM ds_slots s LEFT JOIN ds_cnt c ON s.slot = c.slot
      |  CROSS JOIN ds_tot t
      |), ds_dw AS (
      |  SELECT sl.doc_id,
      |    FLOOR(FLOOR(SUM(lr.lr) * 1000000 + 0.5) / 1000000.0
      |      * 10000 + 0.5) / 10000.0 AS log_weight
      |  FROM ds_sl sl JOIN ds_lr lr ON sl.slot = lr.slot GROUP BY 1
      |), ds_w AS (
      |  SELECT doc_id,
      |    NTILE(5) OVER (ORDER BY log_weight, doc_id) AS wtile
      |  FROM ds_dw WHERE doc_id >= 10
      |), pop AS (
      |  SELECT doc_id, source FROM documents WHERE doc_id >= 10
      |), j AS (
      |  SELECT p.source, t.n_pieces,
      |    CASE WHEN COALESCE(r.flag, FALSE) THEN 'repetitive'
      |         WHEN COALESCE(c.cfrac, 0) >= 0.1 THEN 'contaminated'
      |         WHEN t.ptile = 3 THEN 'ppl_tail'
      |         WHEN w.wtile = 1 THEN 'low_dsir'
      |         ELSE 'kept' END AS verdict
      |  FROM pop p
      |  LEFT JOIN rep_f r USING (doc_id)
      |  LEFT JOIN con_f c USING (doc_id)
      |  LEFT JOIN pp_t t USING (doc_id)
      |  LEFT JOIN ds_w w USING (doc_id)
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN verdict = 'repetitive' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_repetitive,
      |  CAST(SUM(CASE WHEN verdict = 'contaminated' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_contaminated,
      |  CAST(SUM(CASE WHEN verdict = 'ppl_tail' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_ppl_tail,
      |  CAST(SUM(CASE WHEN verdict = 'low_dsir' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_low_dsir,
      |  CAST(SUM(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN verdict = 'kept' THEN n_pieces ELSE 0 END)
      |    AS BIGINT) AS tokens_kept
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q154_curation_pipeline", q154, Some(q154Sql)),
    QueryDef("q176_curation_pipeline_langpred", q176, Some(q176Sql)))
}
