package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram repetition statistics —
  * `rep_stats(toks, n)` = struct(n_grams, dup_occ, top_gram, top_c):
  * total n-gram occurrences, occurrences whose gram repeats within the
  * document, and the most frequent gram (count ties broken toward the
  * lexicographically smallest gram) with its count. The fused, codegen'd
  * core of [[graft.operators.Repetition.dupNgramStats]] (Gopher Table A1
  * signals).
  *
  * Algorithm: build the document's gram array, sort it (UTF8String's
  * Comparable IS Spark's byte-order string comparison, so the tie-break
  * matches ORDER BY ... gram exactly, supplementary planes included),
  * then one run fold — a run of length ≥ 2 contributes its length to
  * dup_occ, and strict > on the best-run update keeps the first
  * (smallest) maximal gram.
  *
  * Why native: the statistic is per-row, so the scalable plan is a pure
  * scan — but the higher-order-function derivation evaluates interpreted
  * and its per-element lambda walk dominated the 1M-doc scan (round-10
  * profile: explode+aggregate 73 s / HOF single-fold 37 s / this
  * expression ~4 s, all zero-spill; the first two are recorded in
  * BASELINE.md). Same rationale and shape as [[WordShinglesF]] /
  * [[CharBigramCountsF]].
  *
  * Returns null for documents with fewer than n tokens (callers filter
  * them out; the HOF reference form excluded them too).
  */
case class RepStatsF(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 8, s"n must be in [1, 8], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rep_stats requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("dup_occ", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = false),
    StructField("top_c", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(v: Any): Any =
    RepStatsF.compute(v.asInstanceOf[ArrayData], n)

  // NOT defineCodeGen: compute returns null for docs shorter than n
  // tokens, and defineCodeGen's template would leave isNull=false with a
  // null value (NPE downstream under whole-stage codegen while the
  // interpreted path correctly yields SQL NULL). Re-check the result.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.expr.RepStatsF.compute($s, $n);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RepStatsF =
    copy(child = newChild)
}

object RepStatsF {
  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): InternalRow = {
    val sz = toks.numElements()
    if (sz < n) return null
    val m = sz - n + 1
    val grams = new Array[UTF8String](m)
    var i = 0
    if (n == 1) {
      while (i < m) { grams(i) = toks.getUTF8String(i); i += 1 }
    } else {
      val parts = new Array[UTF8String](n)
      while (i < m) {
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        grams(i) = UTF8String.concatWs(Sep, parts: _*)
        i += 1
      }
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
    var bg: UTF8String = null
    var bc = 0L; var cc = 0L; var dup = 0L
    var prev: UTF8String = null
    i = 0
    while (i < m) {
      val x = grams(i)
      if (prev != null && x.equals(prev)) cc += 1
      else { if (cc > 1) dup += cc; cc = 1 }
      if (cc > bc) { bc = cc; bg = x }
      prev = x
      i += 1
    }
    if (cc > 1) dup += cc
    new GenericInternalRow(Array[Any](m.toLong, dup, bg, bc))
  }
}
