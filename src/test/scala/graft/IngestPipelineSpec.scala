package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IngestPipeline
import graft.streaming.IngestPipeline.{BatchReport, Config}

/** The document shape the composed ingest folds over. */
final case class IngestDoc(
    doc_id: Long, text: String, source: String, lang: String, n_chars: Int)

/** Pins for the COMPOSED streaming ingest (round 16): per-batch accounting
  * is an identity, the artifacts fold correctly across batches (batch N+1
  * dedups against what batch N kept), and the streaming execution equals
  * the hand-driven sequential-batch fold — the composition's semantic IS
  * the fold, so stream == fold is the streaming twin of the batch
  * pipeline capstone's invariants.
  */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  // weights: slot 16 is r4(ln(n_chars/300)) — weight 1 there, 0 elsewhere,
  // makes the quality gate a deterministic length rule: pass iff
  // n_chars >= 300 (p = sigmoid(ln(n/300)) >= 0.5 iff n >= 300)
  private val lengthGateWeights: Array[Double] =
    Array.tabulate(19)(i => if (i == 16) 1.0 else 0.0)

  // 60-word texts from disjoint vocabularies; near-dup twins differ in the
  // single trailing word (3-word shingles: J = 55/61 ≈ 0.90 >= 0.8)
  private def longText(stem: String): String =
    (1 to 60).map(i => s"$stem$i").mkString(" ")
  private def nearDup(stem: String): String =
    (1 to 59).map(i => s"$stem$i").mkString(" ") + " changedtail"

  private def doc(id: Long, text: String, source: String = "web",
      lang: String = "en"): IngestDoc =
    IngestDoc(id, text, source, lang, text.length)

  private val batch1 = Seq(
    doc(1, longText("alpha")), // appended
    doc(2, longText("bravo"), source = "books"), // appended
    doc(3, nearDup("alpha")), // intra-batch near-dup of 1 -> dropped
    doc(4, "tiny doc")) // unique but short -> quality-gated
  private val batch2 = Seq(
    doc(5, nearDup("alpha")), // near-dup of INDEXED doc 1 -> dupIndex
    doc(6, longText("delta")), // appended
    doc(7, nearDup("delta")), // intra-batch near-dup of 6 -> dropped
    doc(8, "also short")) // quality-gated

  private def cfg(root: String): Config = Config(
    corpusPath = s"$root/corpus", indexPath = s"$root/index",
    statsPath = s"$root/stats", qualityWeights = lengthGateWeights,
    numBuckets = 8)

  private def foldByHand(root: String): Seq[BatchReport] =
    Seq(batch1, batch2).zipWithIndex.map { case (b, i) =>
      IngestPipeline.processBatch(spark, b.toDF(), cfg(root), i.toLong)
    }

  private def corpusRows(root: String): Set[(Long, String, String, String, Int)] =
    spark.read.parquet(s"$root/corpus")
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        col("n_chars"))
      .as[(Long, String, String, String, Int)].collect().toSet

  test("fold accounting: ingested = dupIndex + dupBatch + gated + appended, batch over batch") {
    val root = java.nio.file.Files.createTempDirectory("ingest_fold").toString
    val reports = foldByHand(root)
    assert(reports(0) === BatchReport(0, 4, 0, 1, 1, 2), reports(0).toString)
    assert(reports(1) === BatchReport(1, 4, 1, 1, 1, 1), reports(1).toString)
    reports.foreach { r =>
      assert(r.ingested == r.dupIndex + r.dupBatch + r.gated + r.appended)
    }
    // the living corpus holds exactly the appended docs
    assert(corpusRows(root).map(_._1) == Set(1L, 2L, 6L))
    // the index references exactly the corpus (band rows only for kept ids)
    val idxIds = spark.read.parquet(s"$root/index")
      .select(col("id")).distinct().as[Long].collect().toSet
    assert(idxIds == Set(1L, 2L, 6L))
    // stats fold: per-(source, lang) counts equal a from-scratch recompute
    // over the final corpus (the mergeability contract, through the stream)
    val stats = spark.read.parquet(s"$root/stats")
      .select(col("source"), col("lang"), col("n_docs"), col("sum_chars"))
      .as[(String, String, Long, Long)].collect().toSet
    val expect = corpusRows(root).groupBy(r => (r._3, r._4)).map {
      case ((s, l), rows) => (s, l, rows.size.toLong, rows.toSeq.map(_._5.toLong).sum)
    }.toSet
    assert(stats == expect)
  }

  test("same-id re-arrival is an upsert, not a duplicate") {
    val root = java.nio.file.Files.createTempDirectory("ingest_upd").toString
    val c = cfg(root)
    IngestPipeline.processBatch(spark, Seq(doc(1, longText("alpha"))).toDF(), c, 0L)
    // the re-crawl: same id, revised long text (NOT a near-dup of itself
    // textually — different vocabulary — so only the same-id path applies)
    val r = IngestPipeline.processBatch(
      spark, Seq(doc(1, longText("revised"))).toDF(), c, 1L)
    assert(r === BatchReport(1, 1, 0, 0, 0, 1), r.toString)
    val rows = corpusRows(root)
    assert(rows.size == 1 && rows.head._2 == longText("revised"))
  }

  test("stream (foreachBatch) == the hand-driven fold: reports and artifacts") {
    val sRoot = java.nio.file.Files.createTempDirectory("ingest_stream").toString
    val hRoot = java.nio.file.Files.createTempDirectory("ingest_hand").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[BatchReport]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[IngestDoc]
    val q = IngestPipeline.stream(input.toDF(), cfg(sRoot))(r => got.synchronized {
        got += r
      })
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()
    val hand = foldByHand(hRoot)
    assert(got.sortBy(_.batchId).toSeq == hand, s"stream $got vs fold $hand")
    assert(corpusRows(sRoot) == corpusRows(hRoot))
    val statsOf = (root: String) => spark.read.parquet(s"$root/stats")
      .select(col("source"), col("lang"), col("n_docs"), col("sum_chars"),
        col("checksum"))
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(statsOf(sRoot) == statsOf(hRoot))
  }
}
