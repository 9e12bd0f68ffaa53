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
}
