package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a token array —
  * `word_shingles(toks, n)` = the fused, codegen'd form of
  *
  *   array_distinct(when(size(toks) >= n,
  *     transform(sequence(1, size(toks)-n+1),
  *       i -> concat_ws(" ", slice(toks, i, n)))).otherwise(array()))
  *
  * Why it exists: Spark's higher-order functions evaluate INTERPRETED —
  * each shingle pays a per-element lambda walk (sequence alloc, slice
  * alloc, concat_ws dispatch, then array_distinct's second pass). At 1M
  * docs / 55M shingles that walk was the entire cost of the q150 scan
  * stage (~29 s × 32 uniform tasks, profiled round-10). This expression
  * builds the shingle set in one tight JVM loop per document and
  * participates in whole-stage codegen like [[CharBigramCountsF]].
  *
  * Exact-parity contract with the HOF form (ShingleEdgeSpec pins it):
  * first-occurrence order (LinkedHashSet == array_distinct), empty array
  * for fewer than n tokens, null-skipping concat (UTF8String.concatWs ==
  * ConcatWs), and n = 1 degenerates to distinct tokens. Null INPUT stays
  * null under the standard unary null contract; [[graft.functions.TextHash
  * .wordShinglesOf]] coalesces to the HOF form's empty array.
  */
case class WordShinglesF(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 64, s"shingle width must be in [1, 64], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(v: Any): Any =
    WordShinglesF.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.expr.WordShinglesF.compute($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesF =
    copy(child = newChild)
}

object WordShinglesF {
  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(new Array[Any](0))
    val m = sz - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    if (n == 1) {
      // concat_ws of a single null token yields "" in the HOF reference
      // form — mirror it (and honor containsNull=false) instead of
      // copying the null through
      while (i < m) {
        val t = toks.getUTF8String(i)
        seen.add(if (t == null) UTF8String.EMPTY_UTF8 else t)
        i += 1
      }
    } else {
      val parts = new Array[UTF8String](n)
      while (i < m) {
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        // UTF8String.concatWs skips nulls — same as SQL concat_ws
        seen.add(UTF8String.concatWs(Sep, parts: _*))
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
