package graft

import org.apache.spark.sql.functions._

/** Pins for the in-engine language-identification family (q171/q172) —
  * the contract the DuckDB oracle cannot see: coverage, value ranges, the
  * card's marginal accounting, and the honesty claim that on THIS corpus
  * (synthetic `lang` uncorrelated with text) accuracy sits near the
  * 5-class prior rather than anywhere impressive.
  */
class LangidSpec extends SparkSpec {
  import spark.implicits._

  private lazy val d = sf()

  test("q171 scores every document exactly once, confidence in [0,1]") {
    val scores = graft.queries.Catalog.queries("q171_langid_score")(spark, d)
      .localCheckpoint(true)
    val nDocs = Tables.documents(spark, d).count()
    assert(scores.count() === nDocs)
    assert(scores.select(countDistinct(col("doc_id"))).as[Long].head() === nDocs)
    assert(scores.filter(col("confidence") < 0 || col("confidence") > 1)
      .count() === 0L)
    // predicted labels come from the corpus's own class set
    val langs = Tables.documents(spark, d).select(col("lang")).distinct()
      .as[String].collect().toSet
    val preds = scores.select(col("lang_pred")).distinct().as[String]
      .collect().toSet
    assert(preds.subsetOf(langs), s"predictions outside the class set: ${preds -- langs}")
    // determinism across invocations (the Scratch artifact is value-stable)
    val again = graft.queries.Catalog.queries("q171_langid_score")(spark, d)
    assert(scores.exceptAll(again).count() === 0L)
  }

  test("degenerate corpus: empty/whitespace/1-char docs still score (fallback) and render audio") {
    // round-14 review finding: docs with <2 chars have no bigrams and
    // vanished from q171/q172; whitespace-only text split to an EMPTY
    // token array and crashed the media renders. Pin both guards on a
    // tiny corpus containing exactly those shapes.
    val tmp = java.nio.file.Files.createTempDirectory("degen").toString
    Seq(
      (0L, "", "en", "web", 0L),
      (1L, " ", "fr", "web", 1L),
      (2L, "a", "de", "web", 1L),
      (3L, "hello world hello spark join table", "zh", "web", 35L),
      (4L, "hello world hello spark join batch", "es", "web", 35L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val scores = graft.queries.Catalog.queries("q171_langid_score")(spark, tmp)
      .collect()
    assert(scores.length == 5, s"expected all 5 docs scored, got ${scores.length}")
    val degenerate = scores.filter(r => r.getLong(0) <= 1L)
    // no-bigram docs (0: empty, 1: single space = one ' ' bigram? no — a
    // 1-char text has zero bigrams) fall back at confidence 0
    val noBigram = scores.filter(r => Set(0L, 2L).contains(r.getLong(0)))
    noBigram.foreach { r =>
      assert(r.getDouble(2) == 0.0, s"doc ${r.getLong(0)}: expected confidence 0, got $r")
    }
    assert(degenerate.nonEmpty)
    // the audio and video renders survive the whitespace-only doc
    assert(graft.queries.Catalog.queries("q169_audio_neardup")(spark, tmp)
      .count() >= 0L)
    assert(graft.queries.Catalog.queries("q167_video_neardup")(spark, tmp)
      .count() >= 0L)
    assert(graft.queries.Catalog.queries("q95_image_neardup")(spark, tmp)
      .count() >= 0L)
  }

  test("q172 confusion card marginals account for every document; accuracy is near-prior") {
    val cm = graft.queries.Catalog.queries("q172_langid_confusion")(spark, d)
      .localCheckpoint(true)
    val nDocs = Tables.documents(spark, d).count()
    assert(cm.agg(sum(col("n"))).as[Long].head() === nDocs)
    // each true-label row's shares sum to 1 on the r4 grid (±1 ulp of 1e-4
    // per cell from the per-cell floor-rounding)
    val rowShares = cm.groupBy(col("lang")).agg(sum(col("share")).as("s"))
      .as[(String, Double)].collect()
    rowShares.foreach { case (l, sh) =>
      assert(math.abs(sh - 1.0) < 5e-4, s"lang $l shares sum to $sh")
    }
    // the honesty claim: the metadata label is synthetic and uncorrelated
    // with the text, so accuracy must be FAR from perfect — a value above
    // 0.8 here would mean the card is lying (e.g. scoring leaked labels)
    val acc = cm.filter(col("lang") === col("lang_pred"))
      .agg(sum(col("n"))).as[Long].head().toDouble / nDocs
    assert(acc < 0.8, s"suspiciously high accuracy $acc on uncorrelated labels")
    assert(acc > 0.0, "degenerate card: no diagonal mass at all")
  }
}
