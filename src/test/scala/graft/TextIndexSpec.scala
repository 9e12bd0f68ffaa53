package graft

import graft.operators.TextIndex
import graft.queries.Catalog
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  test("indexed BM25 equals the inline form on the real corpus") {
    val inline = Catalog.queries("q108_bm25")(spark, sf())
      .as[(Long, Double)].collect().toSeq
    val indexed = Catalog.queries("q109_bm25_indexed")(spark, sf())
      .as[(Long, Double)].collect().toSeq
    assert(inline.nonEmpty && indexed == inline)
  }

  test("search reads only the query terms' postings: In filter pushed to the scan") {
    val root = java.nio.file.Files.createTempDirectory("textidx").toString
    val docs = Seq(
      (1L, "spark joins the stream"), (2L, "a quiet unrelated sentence"),
      (3L, "spark spark spark")).toDF("doc_id", "text")
    TextIndex.buildTextIndex(docs, "doc_id", "text", root)
    val q = TextIndex.bm25TopK(spark, root, Seq("spark"))
    q.collect()
    val scans = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).mkString("\n")
    // a single term plans as EqualTo, several as In — either proves the
    // term predicate reached the parquet scan
    assert(scans.contains("PushedFilters") &&
      (scans.contains("In(word") || scans.contains("EqualTo(word,spark)")), scans)
    // and the scoring itself: doc 3 (tf=3, shortest) must outrank doc 1
    val top = q.as[(Long, Double)].collect()
    assert(top.head._1 == 3L && top.map(_._1).toSet == Set(1L, 3L))
  }

  test("append equals rebuild: indexing half the corpus then appending the rest") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val full = java.nio.file.Files.createTempDirectory("ti_full").toString
    val inc = java.nio.file.Files.createTempDirectory("ti_inc").toString
    TextIndex.buildTextIndex(docs, "doc_id", "text", full)
    TextIndex.buildTextIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", inc)
    TextIndex.appendToTextIndex(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", inc)
    val terms = Seq("spark", "join", "stream")
    val a = TextIndex.bm25TopK(spark, full, terms).as[(Long, Double)].collect().toSeq
    val b = TextIndex.bm25TopK(spark, inc, terms).as[(Long, Double)].collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("appending already-indexed ids is refused before any write") {
    val root = java.nio.file.Files.createTempDirectory("ti_dup").toString
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    TextIndex.buildTextIndex(docs, "doc_id", "text", root)
    val before = TextIndex.bm25TopK(spark, root, Seq("beta")).as[(Long, Double)].collect().toSeq
    val e = intercept[IllegalArgumentException] {
      TextIndex.appendToTextIndex(Seq((2L, "beta again")).toDF("doc_id", "text"),
        "doc_id", "text", root)
    }
    assert(e.getMessage.contains("already indexed"))
    // the refused append must not have touched the index
    val after = TextIndex.bm25TopK(spark, root, Seq("beta")).as[(Long, Double)].collect().toSeq
    assert(after == before)
  }

  test("streaming ingestion: foreachBatch grows the text index; scores match a full rebuild") {
    // the text twin of the streaming IVF ingestion: documents arrive as a
    // stream, each micro-batch appends its postings — retrieval sees the
    // streamed docs immediately, no rebuild
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val path = java.nio.file.Files.createTempDirectory("ti_stream").toString
    TextIndex.buildTextIndex(docs.filter(col("doc_id") < 40), "doc_id", "text", path)
    val arrivals = docs.filter(col("doc_id") >= 40 && col("doc_id") < 60)
      .as[(Long, String)].collect().sortBy(_._1)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TextIndex.appendToTextIndex(batch, "doc_id", "text", path)
      }
      .start()
    try {
      input.addData(arrivals.take(10).toSeq); q.processAllAvailable()
      input.addData(arrivals.drop(10).toSeq); q.processAllAvailable()
    } finally q.stop()
    val full = java.nio.file.Files.createTempDirectory("ti_stream_full").toString
    TextIndex.buildTextIndex(docs.filter(col("doc_id") < 60), "doc_id", "text", full)
    val terms = Seq("spark", "join", "stream")
    assert(TextIndex.bm25TopK(spark, path, terms).as[(Long, Double)].collect().toSeq ==
      TextIndex.bm25TopK(spark, full, terms).as[(Long, Double)].collect().toSeq)
  }

  test("rebuild is overwrite-idempotent: same scores after a second build") {
    val root = java.nio.file.Files.createTempDirectory("textidx2").toString
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha delta")).toDF("doc_id", "text")
    TextIndex.buildTextIndex(docs, "doc_id", "text", root)
    val first = TextIndex.bm25TopK(spark, root, Seq("alpha")).as[(Long, Double)].collect().toSeq
    TextIndex.buildTextIndex(docs, "doc_id", "text", root)
    val second = TextIndex.bm25TopK(spark, root, Seq("alpha")).as[(Long, Double)].collect().toSeq
    assert(first == second && first.nonEmpty)
  }
}
