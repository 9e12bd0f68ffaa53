package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset: an opaque binary payload plus typed metadata — the
  * engine's multimodal column model (north star: image/audio/video columns
  * in a training-data pipeline).
  */
final case class MediaRow(
    doc_id: Long,
    uri: String,
    bytes: Array[Byte],
    meta: Map[String, String])

/** Decoded media features (what a real image decode would produce). */
final case class DecodedMedia(
    doc_id: Long,
    uri: String,
    width: Int,
    height: Int,
    n_frames: Int,
    mean_byte: Double)

/** Multimodal column plumbing (schema, partition-preserving batched decode,
  * feature extraction). The DECODE ITSELF IS A STUB — this container has no
  * image/audio codecs — but it is a deterministic function of the bytes, so
  * the pipeline is fully testable and oracle-checkable; swap
  * [[StubCodec.decode]] for a real codec (e.g. javax.imageio / ffmpeg JNI)
  * without touching any Spark plumbing.
  *
  * Scale posture: media bytes stay opaque binary in the DataFrame (columnar
  * parquet/binaryFile storage, no driver materialization); decode runs via
  * `mapPartitions` so per-partition codec initialization is amortized across
  * the batch — the Scala analog of a Pandas-UDF `mapInPandas` batch — and
  * preserves partitioning (zero shuffle).
  */
object Multimodal {

  /** ======= STUB ======= deterministic fake codec standing in for a real
    * image decoder. "Header" layout it pretends to parse: byte0→width,
    * byte1→height, byte2→frame count.
    */
  object StubCodec {
    final class Handle // stands in for a real per-executor codec context

    def open(): Handle = new Handle

    def decode(h: Handle, bytes: Array[Byte]): (Int, Int, Int, Double) = {
      require(bytes.length >= 4, "truncated media header")
      val w = (bytes(0) & 0xff) % 128 + 1
      val ht = (bytes(1) & 0xff) % 128 + 1
      val fr = (bytes(2) & 0xff) % 8 + 1
      val mean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
      (w, ht, fr, mean)
    }
  }

  /** Synthesize a media column from the documents table: deterministic
    * 16-byte payload (md5 of the text), a uri, and typed metadata. In a real
    * pipeline this is `spark.read.format("binaryFile")` or a parquet table
    * with a binary column — the downstream plumbing is identical.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      struct(
        concat(lit("mem://"), col("source"), lit("/"), col("doc_id"), lit(".img")).as("uri"),
        unhex(md5(col("text"))).as("bytes"),
        map(
          lit("format"), lit("stub16"),
          lit("source"), col("source"),
          lit("lang"), col("lang")).as("meta")).as("media"))

  /** Batched, partition-preserving decode: one codec handle per partition,
    * streamed over the rows — the Spark-idiomatic shape for expensive
    * per-row native decodes.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val h = StubCodec.open() // once per partition, like a real codec ctx
      it.map { m =>
        val (w, ht, fr, mean) = StubCodec.decode(h, m.bytes)
        DecodedMedia(m.doc_id, m.uri, w, ht, fr, mean)
      }
    }
  }

  /** Flatten the struct column into the typed Dataset the decoder consumes. */
  def toMediaRows(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
      col("doc_id"),
      col("media.uri").as("uri"),
      col("media.bytes").as("bytes"),
      col("media.meta").as("meta")).as[MediaRow]
  }

  /** "Resize": emit target dims + scale factors (stub math, real plumbing). */
  def resizePlan(decoded: Dataset[DecodedMedia], maxSide: Int): DataFrame =
    decoded.toDF().select(
      col("doc_id"),
      col("width"), col("height"),
      least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))).as("scale"))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))

  /** Frame sampling for "video" media: one row per sampled frame index —
    * pure explode, no shuffle.
    */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int): DataFrame =
    decoded.toDF().select(
      col("doc_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
