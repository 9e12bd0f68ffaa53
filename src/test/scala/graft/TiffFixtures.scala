package graft

import java.awt.Transparency
import java.awt.color.ColorSpace
import java.awt.image._
import java.io.File

import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.plugins.tiff.{TIFFDirectory, TIFFField, TIFFTag, TIFFTagSet}

/** Writes tiny deterministic GeoTIFF fixtures with the JDK ImageIO TIFF
  * plugin (FIXTURES.md §B): pixel data + ModelPixelScale/ModelTiepoint +
  * GDAL_NODATA private tags. Custom tags must be added through a registered
  * TIFFTagSet or the writer silently drops them.
  */
object TiffFixtures {
  sealed trait Dtype
  case object F32 extends Dtype
  case object U8 extends Dtype
  case object S16 extends Dtype

  /** value(col, row) = sample; `originX/originY` = top-left corner geo
    * coords; `pixelSize` degrees per pixel (square, north-up).
    */
  def write(
      path: String,
      width: Int,
      height: Int,
      dtype: Dtype,
      value: (Int, Int) => Double,
      originX: Double,
      originY: Double,
      pixelSize: Double,
      noData: Option[String],
      tileSize: Int = 0): String = {

    val (bufType, img) = dtype match {
      case F32 =>
        val sm = new BandedSampleModel(DataBuffer.TYPE_FLOAT, width, height, 1)
        val raster = Raster.createWritableRaster(sm, new DataBufferFloat(width * height), null)
        val cs = ColorSpace.getInstance(ColorSpace.CS_GRAY)
        val cm = new ComponentColorModel(cs, false, false, Transparency.OPAQUE, DataBuffer.TYPE_FLOAT)
        (DataBuffer.TYPE_FLOAT, new BufferedImage(cm, raster, false, null))
      case U8 =>
        (DataBuffer.TYPE_BYTE, new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY))
      case S16 =>
        val sm = new BandedSampleModel(DataBuffer.TYPE_SHORT, width, height, 1)
        val raster = Raster.createWritableRaster(sm, new DataBufferShort(width * height), null)
        val cs = ColorSpace.getInstance(ColorSpace.CS_GRAY)
        val cm = new ComponentColorModel(cs, false, false, Transparency.OPAQUE, DataBuffer.TYPE_SHORT)
        (DataBuffer.TYPE_SHORT, new BufferedImage(cm, raster, false, null))
    }
    val wr = img.getRaster
    for (r <- 0 until height; c <- 0 until width) {
      if (bufType == DataBuffer.TYPE_FLOAT) wr.setSample(c, r, 0, value(c, r).toFloat)
      else wr.setSample(c, r, 0, value(c, r).toInt)
    }

    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val f = new File(path)
    f.getParentFile.mkdirs()
    f.delete()
    val ios = ImageIO.createImageOutputStream(f)
    try {
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      if (tileSize > 0) {
        param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setTiling(tileSize, tileSize, 0, 0)
      }
      val meta = writer.getDefaultImageMetadata(ImageTypeSpecifier.createFromRenderedImage(img), param)
      val dir = TIFFDirectory.createFromMetadata(meta)

      val scaleTag = new TIFFTag("ModelPixelScale", 33550, 1 << TIFFTag.TIFF_DOUBLE)
      val tieTag = new TIFFTag("ModelTiepoint", 33922, 1 << TIFFTag.TIFF_DOUBLE)
      val nodataTag = new TIFFTag("GDAL_NODATA", 42113, 1 << TIFFTag.TIFF_ASCII)
      val set = new TIFFTagSet(java.util.Arrays.asList(scaleTag, tieTag, nodataTag))
      dir.addTagSet(set)

      dir.addTIFFField(new TIFFField(scaleTag, TIFFTag.TIFF_DOUBLE, 3,
        Array[Double](pixelSize, pixelSize, 0.0)))
      dir.addTIFFField(new TIFFField(tieTag, TIFFTag.TIFF_DOUBLE, 6,
        Array[Double](0.0, 0.0, 0.0, originX, originY, 0.0)))
      noData.foreach { nd =>
        dir.addTIFFField(new TIFFField(nodataTag, TIFFTag.TIFF_ASCII, 1, Array[String](nd)))
      }
      writer.write(null, new IIOImage(img, null, dir.getAsMetadata), param)
    } finally {
      ios.close()
      writer.dispose()
    }
    path
  }

  /** 3-band RGB GeoTIFF (u8 per band) via ImageIO, with the same geo tags:
    * band values come from `value(band, c, r)` with band 1..3 = R,G,B.
    */
  def writeRGB(
      path: String,
      width: Int,
      height: Int,
      value: (Int, Int, Int) => Int,
      originX: Double,
      originY: Double,
      pixelSize: Double): String = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until height; c <- 0 until width) {
      val rgb = ((value(1, c, r) & 0xff) << 16) |
        ((value(2, c, r) & 0xff) << 8) | (value(3, c, r) & 0xff)
      img.setRGB(c, r, rgb)
    }
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val f = new File(path)
    f.getParentFile.mkdirs()
    f.delete()
    val ios = ImageIO.createImageOutputStream(f)
    try {
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      val meta = writer.getDefaultImageMetadata(ImageTypeSpecifier.createFromRenderedImage(img), param)
      val dir = TIFFDirectory.createFromMetadata(meta)
      val scaleTag = new TIFFTag("ModelPixelScale", 33550, 1 << TIFFTag.TIFF_DOUBLE)
      val tieTag = new TIFFTag("ModelTiepoint", 33922, 1 << TIFFTag.TIFF_DOUBLE)
      val set = new TIFFTagSet(java.util.Arrays.asList(scaleTag, tieTag))
      dir.addTagSet(set)
      dir.addTIFFField(new TIFFField(scaleTag, TIFFTag.TIFF_DOUBLE, 3,
        Array[Double](pixelSize, pixelSize, 0.0)))
      dir.addTIFFField(new TIFFField(tieTag, TIFFTag.TIFF_DOUBLE, 6,
        Array[Double](0.0, 0.0, 0.0, originX, originY, 0.0)))
      writer.write(null, new IIOImage(img, null, dir.getAsMetadata), param)
    } finally {
      ios.close()
      writer.dispose()
    }
    path
  }

  /** Hand-written little-endian BigTIFF (magic 43, 8-byte offsets): f32
    * samples, uncompressed strips, same GeoTIFF tags as [[write]]. ImageIO's
    * TIFF writer cannot emit BigTIFF, so the byte layout is assembled
    * directly — which doubles as documentation of what TiffTags must parse.
    * `rowsPerStrip <= 0` means one strip for the whole image.
    */
  def writeBigTiff(
      path: String,
      width: Int,
      height: Int,
      value: (Int, Int) => Double,
      originX: Double,
      originY: Double,
      pixelSize: Double,
      noData: Option[String],
      rowsPerStrip: Int = 0,
      bigEndian: Boolean = false): String = {
    import java.nio.{ByteBuffer, ByteOrder}
    val rps = if (rowsPerStrip <= 0) height else rowsPerStrip
    val nStrips = (height + rps - 1) / rps
    val pixOff = 16L
    val pixBytes = width.toLong * height * 4
    val stripOff = Array.tabulate(nStrips)(s => pixOff + s.toLong * rps * width * 4)
    val stripCnt = Array.tabulate(nStrips) { s =>
      math.min(rps, height - s * rps).toLong * width * 4
    }
    var cur = pixOff + pixBytes
    val scaleOff = cur; cur += 24
    val tieOff = cur; cur += 48
    val soOff = cur; if (nStrips > 1) cur += nStrips * 8L
    val scOff = cur; if (nStrips > 1) cur += nStrips * 8L
    val ndBytes = noData.map(s => s.getBytes("US-ASCII") :+ 0.toByte)
    val ndOff = cur
    ndBytes.foreach { b => if (b.length > 8) cur += b.length }
    val ifdOff = cur
    val nTags = 11 + (if (ndBytes.isDefined) 1 else 0)
    val total = (ifdOff + 8 + nTags * 20 + 8).toInt
    val buf = ByteBuffer.allocate(total)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    // header: II/MM, 43, offset-size 8, pad 0, IFD offset
    val bom = if (bigEndian) 'M'.toByte else 'I'.toByte
    buf.put(bom).put(bom).putShort(43).putShort(8).putShort(0).putLong(ifdOff)
    for (r <- 0 until height; c <- 0 until width)
      buf.putFloat((pixOff + (r.toLong * width + c) * 4).toInt, value(c, r).toFloat)
    buf.position(scaleOff.toInt)
    buf.putDouble(pixelSize).putDouble(pixelSize).putDouble(0.0)
    buf.position(tieOff.toInt)
    Seq(0.0, 0.0, 0.0, originX, originY, 0.0).foreach(buf.putDouble)
    if (nStrips > 1) {
      buf.position(soOff.toInt); stripOff.foreach(buf.putLong)
      buf.position(scOff.toInt); stripCnt.foreach(buf.putLong)
    }
    ndBytes.foreach { b => if (b.length > 8) { buf.position(ndOff.toInt); buf.put(b) } }
    buf.position(ifdOff.toInt)
    buf.putLong(nTags.toLong)
    // entries must be ascending by tag; value field is 8 bytes, values
    // smaller than 8 bytes sit left-justified (first bytes of the field in
    // either byte order — ByteBuffer's relative puts give exactly that)
    def entry(tag: Int, tpe: Int, count: Long)(writeVal: ByteBuffer => Unit): Unit = {
      buf.putShort(tag.toShort).putShort(tpe.toShort).putLong(count)
      val pos = buf.position()
      writeVal(buf)
      buf.position(pos + 8)
    }
    entry(256, 4, 1)(_.putInt(width))              // ImageWidth
    entry(257, 4, 1)(_.putInt(height))             // ImageLength
    entry(258, 3, 1)(_.putShort(32))               // BitsPerSample
    entry(259, 3, 1)(_.putShort(1))                // Compression = none
    entry(273, 16, nStrips.toLong)(b =>            // StripOffsets (LONG8)
      if (nStrips == 1) b.putLong(stripOff(0)) else b.putLong(soOff))
    entry(277, 3, 1)(_.putShort(1))                // SamplesPerPixel
    entry(278, 4, 1)(_.putInt(rps))                // RowsPerStrip
    entry(279, 16, nStrips.toLong)(b =>            // StripByteCounts (LONG8)
      if (nStrips == 1) b.putLong(stripCnt(0)) else b.putLong(scOff))
    entry(339, 3, 1)(_.putShort(3))                // SampleFormat = float
    entry(33550, 12, 3)(_.putLong(scaleOff))       // ModelPixelScale
    entry(33922, 12, 6)(_.putLong(tieOff))         // ModelTiepoint
    ndBytes.foreach { b =>
      entry(42113, 2, b.length.toLong)(bb =>       // GDAL_NODATA
        if (b.length <= 8) bb.put(b) else bb.putLong(ndOff))
    }
    buf.putLong(0L) // next-IFD terminator
    val f = new File(path)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, buf.array())
    path
  }
}
