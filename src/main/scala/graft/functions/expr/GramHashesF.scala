package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All k-codepoint-gram xxhash64 values of a document in ONE linear pass —
  * `gram_hashes(text, k)` = array of `xxhash64(substr(text, p, k))` for
  * p = 1 .. numChars-k+1 (empty array when the text is shorter than k).
  *
  * The fused form of
  *
  *   explode(sequence(1, length(text)-k+1)) -> xxhash64(substr(text, pos, k))
  *
  * whose `substr` re-walks the UTF8 string from byte 0 on EVERY call —
  * O(n²) codepoint steps per document. That walk was re-found in round 17
  * as the substring-dedup exchange's real straggler: the two-pass gram
  * job's longest tasks (220/194 s at 1M docs) were the SCAN+EXPLODE map
  * stages, driven by the slice's 70k-char outlier docs (70k² ≈ 5·10⁹ steps
  * for one row), not the gram-key sort the round's salting targeted. Same
  * bug class, same fix as round 14's [[CharBigramCountsF]]: one pass
  * records each codepoint's byte offset, then every window is a direct
  * byte-slice hash — O(n·k) bytes hashed, no quadratic walk.
  *
  * Hash parity: values equal Spark's `xxhash64(substr(text, p, k))`
  * bit-for-bit (same XXH64, same seed 42, same byte slices — substr copies
  * the window's bytes, this hashes them in place), so persisted gram
  * artifacts and recorded checksums stay comparable across the two forms
  * (GramHashesSpec pins equality on multibyte inputs).
  */
case class GramHashesF(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram length must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires a string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(v: Any): Any =
    GramHashesF.compute(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.expr.GramHashesF.compute($s, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramHashesF =
    copy(child = newChild)
}

object GramHashesF {
  /** Spark's xxhash64 seed (XxHash64Function's default). */
  private val Seed = 42L

  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    val nc = s.numChars()
    if (nc < k) return new GenericArrayData(new Array[Long](0))
    // one linear pass: byte offset of every codepoint (offs(nc) = end)
    val offs = new Array[Int](nc + 1)
    var i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = nb
    val out = new Array[Long](nc - k + 1)
    var p = 0
    while (p <= nc - k) {
      out(p) = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + offs(p), offs(p + k) - offs(p),
        Seed)
      p += 1
    }
    new GenericArrayData(out)
  }
}
