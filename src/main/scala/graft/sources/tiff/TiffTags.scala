package graft.sources.tiff

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal TIFF IFD tag scanner for the GeoTIFF metadata the raster source
  * needs. Pixel decode is delegated to the JDK ImageIO TIFF plugin; this
  * parser only pulls the geometry/nodata tags, which the ImageIO metadata
  * tree does not reliably surface for private tags.
  *
  * Covers classic TIFF (both byte orders), IFD0 only. Tags read:
  *   - 256/257 ImageWidth/ImageLength
  *   - 258 BitsPerSample, 339 SampleFormat (1=uint, 2=int, 3=float)
  *   - 33550 ModelPixelScale (GeoTIFF: sx, sy, sz)
  *   - 33922 ModelTiepoint  (GeoTIFF: i, j, k, x, y, z)
  *   - 42113 GDAL_NODATA    (ASCII)
  *
  * Mirrors the metadata the reference obtains from rasterio.open —
  * raster2points/raster2points.py::raster2df (see SURVEY.md §1.1; anchors
  * unverified, reference mount empty).
  */
object TiffTags {
  final case class Entry(tag: Int, fieldType: Int, count: Long, valueOffset: Long, inline: Array[Byte])

  final case class RasterMeta(
      path: String,
      width: Int,
      height: Int,
      bitsPerSample: Int,
      sampleFormat: Int, // 1=unsigned int, 2=signed int, 3=float
      pixelScaleX: Double,
      pixelScaleY: Double, // positive magnitude from tag; applied as negative (north-up)
      originX: Double, // geo X of the raster's top-left corner
      originY: Double,
      noData: Option[Double]) {

    /** Pixel-centroid longitude of column `col`. */
    def lonOf(col: Double): Double = originX + (col + 0.5) * pixelScaleX
    /** Pixel-centroid latitude of row `row` (north-up: lat decreases with row). */
    def latOf(row: Double): Double = originY - (row + 0.5) * pixelScaleY

    def sameGrid(other: RasterMeta, eps: Double = 1e-9): Boolean =
      width == other.width && height == other.height &&
        math.abs(pixelScaleX - other.pixelScaleX) < eps &&
        math.abs(pixelScaleY - other.pixelScaleY) < eps &&
        math.abs(originX - other.originX) < eps &&
        math.abs(originY - other.originY) < eps
  }

  private val TypeSizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 6 -> 1,
    7 -> 1, 8 -> 2, 9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8)

  def read(path: String): RasterMeta = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val head = new Array[Byte](8)
      raf.readFully(head)
      val order = (head(0), head(1)) match {
        case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
        case ('M', 'M') => ByteOrder.BIG_ENDIAN
        case _ => throw new IllegalArgumentException(s"$path: not a TIFF (bad byte-order mark)")
      }
      val hb = ByteBuffer.wrap(head).order(order)
      val magic = hb.getShort(2) & 0xffff
      if (magic == 43) throw new IllegalArgumentException(s"$path: BigTIFF not supported")
      if (magic != 42) throw new IllegalArgumentException(s"$path: not a TIFF (magic=$magic)")
      val ifdOffset = hb.getInt(4).toLong & 0xffffffffL

      raf.seek(ifdOffset)
      val cntBuf = new Array[Byte](2)
      raf.readFully(cntBuf)
      val n = ByteBuffer.wrap(cntBuf).order(order).getShort(0) & 0xffff
      val entriesRaw = new Array[Byte](n * 12)
      raf.readFully(entriesRaw)
      val eb = ByteBuffer.wrap(entriesRaw).order(order)

      val entries = (0 until n).map { i =>
        val off = i * 12
        val tag = eb.getShort(off) & 0xffff
        val tpe = eb.getShort(off + 2) & 0xffff
        val count = eb.getInt(off + 4).toLong & 0xffffffffL
        val inline = new Array[Byte](4)
        eb.position(off + 8); eb.get(inline); eb.position(0)
        val valueOffset = ByteBuffer.wrap(inline).order(order).getInt(0).toLong & 0xffffffffL
        Entry(tag, tpe, count, valueOffset, inline)
      }.map(e => e.tag -> e).toMap

      def payload(e: Entry): ByteBuffer = {
        val size = TypeSizes.getOrElse(e.fieldType, 1) * e.count.toInt
        if (size <= 4) ByteBuffer.wrap(e.inline).order(order)
        else {
          val buf = new Array[Byte](size)
          raf.seek(e.valueOffset)
          raf.readFully(buf)
          ByteBuffer.wrap(buf).order(order)
        }
      }

      def shortOrLong(tag: Int, default: Int = -1): Int = entries.get(tag) match {
        case None => default
        case Some(e) =>
          val b = payload(e)
          if (e.fieldType == 3) b.getShort(0) & 0xffff else b.getInt(0)
      }

      def doubles(tag: Int): Option[Array[Double]] = entries.get(tag).map { e =>
        require(e.fieldType == 12, s"$path: tag $tag expected DOUBLE, got type ${e.fieldType}")
        val b = payload(e)
        Array.tabulate(e.count.toInt)(i => b.getDouble(i * 8))
      }

      def ascii(tag: Int): Option[String] = entries.get(tag).map { e =>
        val b = payload(e)
        val bytes = new Array[Byte](e.count.toInt)
        b.get(bytes)
        // NUL-terminate first, THEN trim: stopping at the first space would
        // turn a leading-whitespace payload (" -9999") into "" and silently
        // disable the NoData mask
        new String(bytes, "US-ASCII").takeWhile(_ != '\u0000').trim
      }

      val width = shortOrLong(256)
      val height = shortOrLong(257)
      require(width > 0 && height > 0, s"$path: missing ImageWidth/ImageLength")
      val bps = shortOrLong(258, 1)
      val sampleFormat = shortOrLong(339, 1)
      val scale = doubles(33550).getOrElse(
        throw new IllegalArgumentException(s"$path: missing GeoTIFF ModelPixelScale (33550)"))
      val tie = doubles(33922).getOrElse(
        throw new IllegalArgumentException(s"$path: missing GeoTIFF ModelTiepoint (33922)"))
      // Tiepoint maps raster (i, j) -> geo (x, y); origin = top-left corner.
      val originX = tie(3) - tie(0) * scale(0)
      val originY = tie(4) + tie(1) * scale(1)
      // GDAL writes lowercase "nan" for float NaN nodata; Java's toDouble
      // only accepts "NaN", so normalize case before parsing.
      val noData = ascii(42113).flatMap { s =>
        if (s.equalsIgnoreCase("nan")) Some(Double.NaN)
        else scala.util.Try(s.toDouble).toOption
      }

      RasterMeta(path, width, height, bps, sampleFormat,
        scale(0), scale(1), originX, originY, noData)
    } finally raf.close()
  }
}
