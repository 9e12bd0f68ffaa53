package graft

import graft.multimodal.{DecodedMedia, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("media column has the full struct schema and opaque bytes") {
    val media = Multimodal.mediaFromDocuments(docs)
    val f = media.schema("media").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(f.fieldNames.toSeq == Seq("uri", "bytes", "meta"))
    assert(f("bytes").dataType.typeName == "binary")
    assert(f("meta").dataType.typeName == "map")
    val r = media.select(col("media.bytes")).head().getAs[Array[Byte]](0)
    assert(r.length == 16) // md5 payload
  }

  test("batched decode is partition-preserving and deterministic") {
    val media = Multimodal.mediaFromDocuments(docs).repartition(4)
    val rows = Multimodal.toMediaRows(media)
    val decoded = Multimodal.decode(rows)
    assert(decoded.rdd.getNumPartitions == 4) // mapPartitions: no shuffle
    val d = decoded.collect()
    assert(d.length == docs.count())
    assert(d.forall(m => m.width >= 1 && m.width <= 128 && m.n_frames >= 1 && m.n_frames <= 8))
    // determinism: second run identical
    assert(Multimodal.decode(rows).collect().sortBy(_.doc_id).toSeq ==
      d.sortBy(_.doc_id).toSeq)
  }

  test("decode agrees with the q38 column-expression derivation") {
    val media = Multimodal.mediaFromDocuments(docs)
    val viaExpr = graft.SparkEntry.queries("q38_multimodal_media")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "width", "height", "n_frames")
      .as[(Long, Int, Int, Int)].collect().toMap3
    val viaCodec = Multimodal.decode(Multimodal.toMediaRows(media)).collect()
    viaCodec.foreach { m =>
      assert(viaExpr(m.doc_id) == ((m.width, m.height, m.n_frames)), s"doc ${m.doc_id}")
    }
  }

  test("resize plan caps the longest side") {
    val decoded = Multimodal.decode(Multimodal.toMediaRows(Multimodal.mediaFromDocuments(docs)))
    val plan = Multimodal.resizePlan(decoded, maxSide = 64).collect()
    assert(plan.forall { r =>
      val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      w <= 64 && h <= 64 && w >= 1 && h >= 1
    })
  }

  test("frame sampling explodes sampled indices only") {
    val one = Seq(DecodedMedia(1L, "u", 4, 4, 7, 0.0)).toDS()
    val frames = Multimodal.sampleFrames(one, stride = 2)
      .select("frame_idx").as[Int].collect().toSeq
    assert(frames == Seq(0, 2, 4, 6))
  }

  private implicit class MapOps(rows: Array[(Long, Int, Int, Int)]) {
    def toMap3: Map[Long, (Int, Int, Int)] =
      rows.map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
  }
}
