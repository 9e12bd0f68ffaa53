package graft

import graft.operators.{Ann, Vec}
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id").as("id"), col("embedding"))
    .as[Vec].cache()

  private lazy val dim = Ann.headDim(corpus)

  test("brute force: self is its own nearest neighbor with cos 1.0") {
    val queries = corpus.toDF().filter(col("id") === 1)
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    val top = Ann.bruteForceTopK(corpus.toDF(), queries, 1).collect()
    assert(top.length == 1)
    assert(top(0).getAs[Long]("id") == 1L)
    assert(math.abs(top(0).getAs[Double]("cos_sim") - 1.0) < 1e-12)
  }

  test("lsh keys: one key per (vector, table); deterministic under a seed") {
    val keys = Ann.lshKeys(corpus, dim, nbits = 6, tables = 4, seed = 42L)
    assert(keys.count() == corpus.count() * 4)
    val a = keys.orderBy("id", "table").collect().toSeq
    val b = Ann.lshKeys(corpus, dim, 6, 4, 42L).orderBy("id", "table").collect().toSeq
    assert(a == b)
    // buckets within range
    assert(keys.agg(max("bucket")).head().getLong(0) < (1L << 6))
  }

  test("lsh keys: ragged dimensions fail loudly instead of mis-bucketing") {
    val ragged = Seq(
      Vec(1L, Array(1f, 2f, 3f)),
      Vec(2L, Array(1f, 2f))).toDS()
    val ex = intercept[Exception] {
      Ann.lshKeys(ragged, dim = 3, nbits = 4, tables = 2, seed = 1L).collect()
    }
    assert(ex.getMessage.contains("ragged embedding dimensions") ||
      Option(ex.getCause).exists(_.getMessage.contains("ragged embedding dimensions")))
  }

  test("kmeans centroids: deterministic, bounded, right count") {
    val a = Ann.ivfCentroidsKMeans(corpus, nCells = 8)
    val b = Ann.ivfCentroidsKMeans(corpus, nCells = 8)
    assert(a.length == 8 && b.length == 8)
    assert(a.map(_.embedding.toSeq).toSeq == b.map(_.embedding.toSeq).toSeq)
    assert(a.forall(_.embedding.length == dim))
  }

  test("ivf topk recall vs brute force") {
    val queryIds = Seq(1L, 2L, 3L, 4L, 5L)
    val queries = corpus.toDF().filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    val exact = Ann.bruteForceTopK(
        corpus.toDF().filter(!col("id").isin(queryIds: _*)), queries, 10)
      .select("q_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Ann.ivfTopK(spark, corpus, queryIds, k = 10, nCells = 16, nprobe = 4)
      .select("q_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = queryIds.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
    }
    val meanRecall = recalls.sum / recalls.size
    // nprobe/nCells = 1/4 of the corpus scanned; require better than the
    // random-candidate baseline of ~0.25
    assert(meanRecall > 0.3, s"mean recall $meanRecall (per-query: $recalls)")
  }

  test("filtered ivf hard negatives: only different-label results, useful recall") {
    val labels = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("label"))
    val labMap = labels.as[(Long, Int)].collect().toMap
    val queryIds = Seq(1L, 2L, 3L, 4L, 5L)
    val queries = corpus.toDF().filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    // exact different-label top-10 per anchor = brute force over the
    // anchor's complement-label corpus
    val exact = queryIds.map { q =>
      val others = corpus.toDF().join(labels, "id")
        .filter(col("label") =!= labMap(q) && col("id") =!= q)
      q -> Ann.bruteForceTopK(others.select(col("id"), col("embedding")),
          queries.filter(col("q_id") === q), 10)
        .select("id").as[Long].collect().toSet
    }.toMap
    val approx = Ann.ivfHardNegatives(spark, corpus, labels, queryIds,
        k = 10, nCells = 16, nprobe = 8)
      .select("q_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // contract 1: every returned negative has a different label
    approx.foreach { case (q, ids) =>
      ids.foreach(id => assert(labMap(id) != labMap(q),
        s"same-label vector $id returned for anchor $q"))
    }
    // contract 2: recall beats the scanned-fraction baseline (nprobe 8/16
    // = half the corpus; over-fetched per the filtered-search contract)
    val recalls = queryIds.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble /
        exact(q).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall > 0.5, s"mean recall $meanRecall (per-query: $recalls)")
  }

  test("lsh topk beats random-candidate recall vs brute force") {
    val queryIds = Seq(1L, 2L, 3L, 4L, 5L)
    val queries = corpus.toDF().filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    val exact = Ann.bruteForceTopK(
        corpus.toDF().filter(!col("id").isin(queryIds: _*)), queries, 10)
      .select("q_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Ann.lshTopK(spark, corpus, queryIds, k = 10, nbits = 6, tables = 8)
      .select("q_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = queryIds.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
    }
    val meanRecall = recalls.sum / recalls.size
    // 500 vectors, 64 buckets x 8 tables: random candidate sets of the same
    // size would recall ~their fraction of the corpus (<0.35); require the
    // LSH structure to do clearly better on the clustered embeddings
    assert(meanRecall > 0.35, s"mean recall $meanRecall (per-query: $recalls)")
  }

  test("persisted IVF index: indexed search == direct search") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivf-index"
    Ann.buildIvfIndex(corpus, path, nCells = 16)
    val direct = Ann.ivfTopK(spark, corpus, Seq(1L, 2L, 3L), k = 10, nCells = 16, nprobe = 4)
      .select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val indexed = Ann.ivfTopKIndexed(spark, corpus, path, Seq(1L, 2L, 3L), k = 10, nprobe = 4)
      .select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(indexed == direct)
    assert(indexed.nonEmpty)
    // the persisted centroid set is bounded and typed
    assert(spark.read.parquet(s"$path/centroids").count() <= 16)
  }

  test("appendToIvfIndex: append == one-build index with the same centroids") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    val base = corpus.filter(col("id") < 400).as[Vec]
    val batch = corpus.filter(col("id") >= 400).as[Vec]
    assert(base.count() > 0 && batch.count() > 0, "fixture split degenerate")
    val appended = s"$root/appended"
    Ann.buildIvfIndex(base, appended, nCells = 16)
    Ann.appendToIvfIndex(batch, appended)
    // every corpus vector must now be assigned exactly once
    val assigned = spark.read.parquet(s"$appended/assignments")
    assert(assigned.count() == corpus.count())
    assert(assigned.select("id").distinct().count() == corpus.count())
    // reference: an index whose assignments were built in ONE pass from the
    // SAME persisted centroids (a public rebuild would retrain on the full
    // corpus and move the quantizer — exactly what append avoids)
    val fresh = s"$root/fresh"
    val cents = spark.read.parquet(s"$appended/centroids").as[Vec]
      .collect().sortBy(_.id)
    spark.read.parquet(s"$appended/centroids")
      .write.parquet(s"$fresh/centroids")
    Ann.ivfAssign(corpus, cents).write.parquet(s"$fresh/assignments")
    val qs = Seq(1L, 2L, 3L, 410L)
    val viaAppend = Ann.ivfTopKIndexed(spark, corpus, appended, qs, k = 10, nprobe = 4)
      .select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val viaFresh = Ann.ivfTopKIndexed(spark, corpus, fresh, qs, k = 10, nprobe = 4)
      .select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(viaAppend == viaFresh)
    assert(viaAppend.nonEmpty)
    // appended vectors are really in the searchable set: some result row
    // returns a batch id as a neighbor (410's cell-mates include batch ids)
    assert(viaAppend.exists { case (_, _, id) => id >= 400L },
      "no appended vector ever surfaced as a neighbor")
    // appending to a never-built path fails loudly
    val err = intercept[Exception] {
      Ann.appendToIvfIndex(batch, s"$root/absent")
    }
    assert(err.getMessage != null)
    // a mismatched-dim batch must be refused, not prefix-assigned
    val wrongDim = Seq(Vec(9999L, Array.fill(3)(0.5f))).toDS()
    val dimErr = intercept[IllegalArgumentException] {
      Ann.appendToIvfIndex(wrongDim, appended)
    }
    assert(dimErr.getMessage.contains("index dim"), dimErr.getMessage)
  }

  test("streaming ingestion: foreachBatch appends micro-batches to the persisted IVF index") {
    // the embedding twin of the streaming upsert: vectors arrive as a
    // stream, each micro-batch is assigned under the persisted quantizer
    // and appended — the index grows continuously without a rebuild, and
    // batch searches see the streamed vectors immediately after
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString + "/idx"
    val base = corpus.filter(col("id") < 400).as[Vec]
    Ann.buildIvfIndex(base, path, nCells = 16)
    val baseCount = base.count()
    val arrivals = corpus.filter(col("id") >= 400).as[Vec].collect()
      .sortBy(_.id).take(20)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Ann.appendToIvfIndex(batch.as[Vec], path)
      }
      .start()
    try {
      input.addData(arrivals.take(10).map(v => (v.id, v.embedding)).toSeq)
      q.processAllAvailable()
      input.addData(arrivals.drop(10).map(v => (v.id, v.embedding)).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val assigned = spark.read.parquet(s"$path/assignments")
    assert(assigned.count() == baseCount + 20)
    // streamed ids are assigned to valid cells and searchable
    val streamedCells = assigned
      .filter(col("id").isin(arrivals.map(_.id).toSeq: _*))
      .select("cell").as[Int].collect()
    assert(streamedCells.length == 20)
    assert(streamedCells.forall(c => c >= 0 && c < 16))
    val hits = Ann.ivfTopKIndexed(spark, corpus, path,
        Seq(arrivals.head.id), k = 5, nprobe = 4)
      .select("id").as[Long].collect()
    assert(hits.nonEmpty, "streamed vector's neighborhood is empty")
  }

  test("deleteFromIvfIndex: delete == same-centroid rebuild without; compact folds it in") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_del").toString
    val idx = s"$root/idx"; val ref = s"$root/ref"
    Ann.buildIvfIndex(corpus, idx, nCells = 16)
    val qs = Seq(1L, 3L, 4L)
    // victims = actual baseline hits, so the delete provably changes results
    val baseline = Ann.ivfTopKIndexed(spark, corpus, idx, qs, k = 10, nprobe = 4)
      .select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val victims = baseline.map(_._3).filterNot(qs.contains).take(3).toSeq
    assert(victims.nonEmpty)
    Ann.deleteFromIvfIndex(spark, idx, victims)
    // reference: an index with the SAME centroids whose assignments were
    // built from the remaining vectors only (a public rebuild would
    // retrain the quantizer — the delete contract deliberately does not)
    val cents = spark.read.parquet(s"$idx/centroids").as[Vec].collect().sortBy(_.id)
    spark.read.parquet(s"$idx/centroids").write.parquet(s"$ref/centroids")
    Ann.ivfAssign(corpus.filter(!col("id").isin(victims: _*)).as[Vec], cents)
      .write.parquet(s"$ref/assignments")
    def search(path: String) =
      Ann.ivfTopKIndexed(spark, corpus, path, qs, k = 10, nprobe = 4)
        .select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val afterDelete = search(idx)
    assert(afterDelete == search(ref) && afterDelete.nonEmpty)
    assert(afterDelete != baseline)
    assert(!afterDelete.exists(r => victims.contains(r._3)))
    // re-deleting + deleting a never-indexed id are both no-ops
    Ann.deleteFromIvfIndex(spark, idx, victims :+ 999999999L)
    assert(search(idx) == afterDelete)
    // compaction: identical results, tombstones physically folded + reset
    Ann.compactIvfIndex(spark, idx)
    assert(search(idx) == afterDelete)
    assert(spark.read.parquet(s"$idx/assignments")
      .filter(col("id").isin(victims: _*)).count() == 0)
    assert(spark.read.parquet(s"$idx/deletes").count() == 0)
  }

  test("ann operators leave no cached RDDs behind (round-1 leak)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Ann.lshTopK(spark, corpus, Seq(1L, 2L), k = 5).collect()
    Ann.ivfTopK(spark, corpus, Seq(1L, 2L), k = 5).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == before, s"operator leaked cached RDDs: ${after -- before}")
  }
}
