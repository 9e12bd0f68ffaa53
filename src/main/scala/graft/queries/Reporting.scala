package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.MinHashLSH

/** Corpus-reporting queries — the artifacts a curation pipeline publishes
  * about its output, composed from signals the catalog already computes:
  * q124 the per-source data card (the "datasheet" row a mixing decision
  * reads), q125 the cross-split near-dup leakage audit (the eval-integrity
  * check a train/val/test split must pass before anyone trusts the val
  * loss).
  */
object Reporting {

  /** q124: one row per source — volume, token mass, rule-cascade keep
    * rate, exact-duplicate rate, mean length, dominant language. All
    * single-pass aggregates; the dominant language is a deterministic
    * argmax (count desc, lang asc).
    */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // Round-18: the cascade label is a row-wise projection of docs, so
    // joining the label FRAME back on doc_id was a doc_id-keyed self-join
    // (second scan + shuffle) for a column computable in place — doc_id is
    // the table key, so the join was row-for-row. Same label expression
    // (one definition, QualityClassifier.cascadeLabelCol); one scan, no
    // join, identical rows.
    val base = docs
      .withColumn("y", graft.operators.QualityClassifier.cascadeLabelCol())
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        Parity.r4(avg(col("y"))).as("kept_rate"),
        Parity.r4(lit(1.0) -
          countDistinct(col("text")).cast("double") / count(lit(1)))
          .as("exact_dup_rate"),
        Parity.r4(avg(col("n_chars"))).as("avg_chars"))
    val topLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("c").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    base.join(topLang, "source").orderBy(col("source"))
  }

  private val q124Sql =
    """WITH lab AS (
      |  SELECT doc_id, source, text, n_chars, lang,
      |    CAST(CASE WHEN n_chars >= 100 AND n_chars <= 500
      |      AND (len(string_split(text, ' ')) - len(list_distinct(string_split(text, ' ')))) * 100
      |          <= len(string_split(text, ' ')) * 55
      |      AND lang IN ('en', 'de', 'fr', 'es', 'zh') THEN 1.0 ELSE 0.0 END
      |      AS DOUBLE) AS y
      |  FROM documents
      |), base AS (
      |  SELECT source,
      |    COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |    FLOOR(AVG(y) * 10000 + 0.5) / 10000.0 AS kept_rate,
      |    FLOOR((1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*))
      |      * 10000 + 0.5) / 10000.0 AS exact_dup_rate,
      |    FLOOR(AVG(n_chars) * 10000 + 0.5) / 10000.0 AS avg_chars
      |  FROM lab GROUP BY 1
      |), lc AS (
      |  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
      |), tl AS (
      |  SELECT source, lang AS top_lang FROM (
      |    SELECT source, lang,
      |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, lang) AS rn
      |    FROM lc) WHERE rn = 1
      |)
      |SELECT b.source, b.n_docs, b.n_tokens, b.kept_rate, b.exact_dup_rate,
      |  b.avg_chars, tl.top_lang
      |FROM base b JOIN tl ON tl.source = b.source
      |ORDER BY b.source""".stripMargin

  /** q125: near-dup pairs (q30's md5-parity MinHash+LSH config, same
    * bounded slice) that CROSS the q64 hash-split boundary — each row is a
    * val/test document whose near-twin sits in train, i.e. measured eval
    * contamination. Composition of two oracle-checked queries, itself
    * oracle-checked.
    */
  private def q125(s: SparkSession, dir: String): DataFrame = {
    // bounded slice (≤120 rows at any scale) read by five subtrees (band
    // self-join, both verify shingle sides, both split sides — the join on
    // id_a/id_b restricts the split lookup to pair ids, which are < 120 by
    // construction, so deriving splits from the slice is row-identical);
    // materialize once instead of five parquet scans — ~0.60 -> ~0.48 s
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 120)
      .localCheckpoint(true)
    val lsh = MinHashLSH(numHashes = 12, numBands = 3, shingleSize = 1,
      oracleParityHash = true)
    val pairs = lsh.verifyJaccard(
        lsh.candidatePairs(docs, "doc_id", "text"), docs, "doc_id", "text")
      .filter(round(col("jaccard"), 4) >= 0.6)
    val split = graft.functions.TextHash.h60(col("doc_id").cast("string")) % 100
    val splits = docs
      .select(col("doc_id"),
        when(split < 80, lit("train")).when(split < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
    pairs
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")), "id_a")
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")), "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        round(col("jaccard"), 4).as("jaccard"),
        col("split_a"), col("split_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q125Sql =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
      |  FROM documents WHERE doc_id < 120
      |), sig AS (
      |  SELECT doc_id, list_transform(generate_series(0, 11), j ->
      |    list_min(list_transform(s, t ->
      |      ('0x' || substr(md5(j || ':' || t), 1, 15))::BIGINT))) AS sg
      |  FROM sh
      |), bands AS (
      |  SELECT doc_id, b, md5(array_to_string(sg[b*4+1:b*4+4], ',')) AS bh
      |  FROM sig, range(0, 3) r(b)
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
      |), jac AS (
      |  SELECT p.doc_a, p.doc_b,
      |    ROUND(len(list_intersect(sa.s, sb.s))::DOUBLE
      |      / len(list_distinct(list_concat(sa.s, sb.s))), 4) AS jaccard
      |  FROM pairs p
      |  JOIN sh sa ON sa.doc_id = p.doc_a
      |  JOIN sh sb ON sb.doc_id = p.doc_b
      |), sp AS (
      |  SELECT doc_id,
      |    CASE WHEN bucket < 80 THEN 'train'
      |         WHEN bucket < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (
      |    SELECT doc_id,
      |      ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS bucket
      |    FROM documents)
      |)
      |SELECT j.doc_a, j.doc_b, j.jaccard, sa.split AS split_a, sb.split AS split_b
      |FROM jac j
      |JOIN sp sa ON sa.doc_id = j.doc_a
      |JOIN sp sb ON sb.doc_id = j.doc_b
      |WHERE j.jaccard >= 0.6 AND sa.split <> sb.split
      |ORDER BY j.doc_a, j.doc_b""".stripMargin

  /** q126: exact top-20 corpus tokens via the bounded-state two-pass
    * ([[graft.operators.HeavyHitters]] — Misra–Gries candidates + exact
    * recount). The oracle is the PLAIN exact top-20, which the two-pass
    * must equal whenever the sketch's retention condition holds (capacity
    * 256 ≫ this corpus's distinct-token count, so it holds trivially here;
    * the tight-capacity regime is spec-tested on a Zipf corpus).
    */
  private def q126(s: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.exactTopK(
      Tables.documents(s, dir), "text", k = 20, capacity = 256)

  private val q126Sql =
    """SELECT token, cnt FROM (
      |  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> '' GROUP BY 1)
      |ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  /** q127: corpus drift between two snapshots ([[graft.operators.Drift]]
    * — PSI over fixed, deterministic buckets): the even-id half of the
    * corpus as snapshot A vs the odd-id half as snapshot B (a
    * scale-independent split; a real deployment passes two table
    * versions), length drift over 12 fixed buckets of [0, 600] chars and
    * language-mix drift over categories. Reading the value needs PSI's
    * small-sample bias in mind (E[PSI] ≈ buckets·(1/n_a + 1/n_b) under no
    * drift — DriftSpec documents it); the query is the monitoring hook,
    * the spec plants real drift and asserts the alarm fires.
    */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    graft.operators.Drift.numericPsi(a, b, "n_chars", 0.0, 600.0, 12)
      .unionByName(graft.operators.Drift.categoricalPsi(a, b, "lang"))
      .orderBy(col("metric"))
  }

  private val q127Sql =
    """WITH a AS (
      |  SELECT * FROM documents WHERE doc_id % 2 = 0
      |), b AS (
      |  SELECT * FROM documents WHERE doc_id % 2 = 1
      |), na AS (
      |  SELECT COALESCE(CAST(CAST(LEAST(GREATEST(FLOOR(CAST(n_chars AS DOUBLE) / 50), 0), 11) AS INT) AS VARCHAR), '__null__') AS key,
      |    COUNT(*) AS c FROM a GROUP BY 1
      |), nb AS (
      |  SELECT COALESCE(CAST(CAST(LEAST(GREATEST(FLOOR(CAST(n_chars AS DOUBLE) / 50), 0), 11) AS INT) AS VARCHAR), '__null__') AS key,
      |    COUNT(*) AS c FROM b GROUP BY 1
      |), nsa AS (
      |  SELECT key, c / SUM(c) OVER () AS p FROM na
      |), nsb AS (
      |  SELECT key, c / SUM(c) OVER () AS q FROM nb
      |), npsi AS (
      |  SELECT 'n_chars' AS metric,
      |    FLOOR(SUM((p + 0.000001 - (q + 0.000001))
      |      * ln((p + 0.000001) / (q + 0.000001))) * 10000 + 0.5) / 10000.0 AS psi
      |  FROM (
      |    SELECT COALESCE(nsa.p, 0.0) AS p, COALESCE(nsb.q, 0.0) AS q
      |    FROM nsa FULL OUTER JOIN nsb ON nsb.key = nsa.key)
      |), la AS (
      |  SELECT COALESCE(lang, '__null__') AS key, COUNT(*) AS c FROM a GROUP BY 1
      |), lb AS (
      |  SELECT COALESCE(lang, '__null__') AS key, COUNT(*) AS c FROM b GROUP BY 1
      |), lsa AS (
      |  SELECT key, c / SUM(c) OVER () AS p FROM la
      |), lsb AS (
      |  SELECT key, c / SUM(c) OVER () AS q FROM lb
      |), lpsi AS (
      |  SELECT 'lang' AS metric,
      |    FLOOR(SUM((p + 0.000001 - (q + 0.000001))
      |      * ln((p + 0.000001) / (q + 0.000001))) * 10000 + 0.5) / 10000.0 AS psi
      |  FROM (
      |    SELECT COALESCE(lsa.p, 0.0) AS p, COALESCE(lsb.q, 0.0) AS q
      |    FROM lsa FULL OUTER JOIN lsb ON lsb.key = lsa.key)
      |)
      |SELECT * FROM lpsi UNION ALL SELECT * FROM npsi ORDER BY metric""".stripMargin

  /** q131: LEAKAGE-FREE split assignment — the fix for what q125
    * detects. q125 hashes each DOCUMENT into a split, so near-duplicate
    * pairs straddle splits (eval contamination); q131 assigns the whole
    * near-dup CLUSTER (same pair set as q125: md5-parity MinHash+LSH,
    * exact-Jaccard ≥ 0.6, connected components) by hashing the CLUSTER
    * id — partners co-locate by construction, so the q125 audit on these
    * splits returns zero rows (spec-asserted). Same 80/10/10 hash
    * convention as q125. Oracle: q125's pair CTEs + q55's recursive-CTE
    * connected components + the cluster-keyed split.
    */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    // same bounded-slice materialization as q125 (band self-join + two
    // verify sides + the cluster-assignment universe read the slice)
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 120)
      .localCheckpoint(true)
    val lsh = MinHashLSH(numHashes = 12, numBands = 3, shingleSize = 1,
      oracleParityHash = true)
    val pairs = lsh.verifyJaccard(
        lsh.candidatePairs(docs, "doc_id", "text"), docs, "doc_id", "text")
      .filter(round(col("jaccard"), 4) >= 0.6)
      .select(col("id_a"), col("id_b"))
    val assign = graft.operators.DedupClusters
      .clusterAssignments(docs, "doc_id", pairs)
    val bucket = graft.functions.TextHash.h60(col("cluster_id").cast("string")) % 100
    assign.select(col("doc_id"), col("cluster_id"),
        when(bucket < 80, lit("train")).when(bucket < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy(col("doc_id"))
  }

  private val q131Sql =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
      |  FROM documents WHERE doc_id < 120
      |), sig AS (
      |  SELECT doc_id, list_transform(generate_series(0, 11), j ->
      |    list_min(list_transform(s, t ->
      |      ('0x' || substr(md5(j || ':' || t), 1, 15))::BIGINT))) AS sg
      |  FROM sh
      |), bands AS (
      |  SELECT doc_id, b, md5(array_to_string(sg[b*4+1:b*4+4], ',')) AS bh
      |  FROM sig, range(0, 3) r(b)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
      |), pairs AS (
      |  SELECT p.id_a, p.id_b
      |  FROM cand p
      |  JOIN sh sa ON sa.doc_id = p.id_a
      |  JOIN sh sb ON sb.doc_id = p.id_b
      |  WHERE ROUND(len(list_intersect(sa.s, sb.s))::DOUBLE
      |    / len(list_distinct(list_concat(sa.s, sb.s))), 4) >= 0.6
      |), edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs
      |), reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
      |), comp AS (
      |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
      |), assigned AS (
      |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
      |  WHERE d.doc_id < 120
      |)
      |SELECT doc_id, cluster_id,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id, cluster_id,
      |    ('0x' || substr(md5(cluster_id::VARCHAR), 1, 15))::BIGINT % 100
      |      AS bucket
      |  FROM assigned)
      |ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q124_data_card", q124, Some(q124Sql)),
    QueryDef("q125_split_leakage", q125, Some(q125Sql)),
    QueryDef("q126_heavy_tokens", q126, Some(q126Sql)),
    QueryDef("q127_corpus_drift", q127, Some(q127Sql)),
    QueryDef("q131_leakage_free_splits", q131, Some(q131Sql)))
}
