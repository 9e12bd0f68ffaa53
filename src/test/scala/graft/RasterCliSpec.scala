package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI flag grammar (SURVEY §2A A13) — the parsing the reference's argparse
  * surface maps to, tested without a Spark session.
  */
class RasterCliSpec extends AnyFunSuite {

  test("defaults: inputs + output only") {
    val a = Raster.parseArgs(Array("in1.tif", "in2.tif", "out"))
    assert(a == Raster.CliArgs(Seq("in1.tif", "in2.tif"), "out"))
  }

  test("all flags parse, interleaved with positionals") {
    val a = Raster.parseArgs(Array(
      "in.tif", "--col_names", "a,b", "--separator", "t", "in2.tif",
      "--max_block_size", "512", "--calc_area", "--bands", "1,3", "out"))
    assert(a.inputs == Seq("in.tif", "in2.tif") && a.output == "out")
    assert(a.colNames == Seq("a", "b") && a.separator == "t")
    assert(a.maxBlockSize == 512 && a.calcArea && a.bands == Seq(1, 3))
  }

  test("unknown flag and missing values fail loudly") {
    val e1 = intercept[IllegalArgumentException](
      Raster.parseArgs(Array("in.tif", "out", "--bogus")))
    assert(e1.getMessage.contains("unknown flag"))
    val e2 = intercept[IllegalArgumentException](
      Raster.parseArgs(Array("in.tif", "out", "--separator")))
    assert(e2.getMessage.contains("requires a value"))
    val e3 = intercept[IllegalArgumentException](
      Raster.parseArgs(Array("only-one")))
    assert(e3.getMessage.contains("usage"))
  }
}
