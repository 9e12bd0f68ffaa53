package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi unigram-LM word segmentation —
  * `unigram_segment(word)` = struct(pieces array<string>, score double),
  * the fused native form of [[graft.operators.UnigramLm.segmented]]'s
  * original `aggregate`-fold DP over a literal map column.
  *
  * Why it exists: the HOF form pays two interpreted per-position lambda
  * walks per word AND — the actual scale killer — `element_at` on a map
  * LITERAL, which is a LINEAR key scan. At a production vocabulary
  * (8k–64k pieces) every DP candidate lookup costs O(|V|), turning each
  * EM round's type-table scan into |types| × positions × maxPieceLen ×
  * |V| comparisons. This expression holds the vocabulary as a hash table
  * (O(1) lookups, shared per task via the codegen reference object) and
  * runs the DP in one tight JVM loop per word.
  *
  * Exact-parity contract with the HOF form (UnigramLmSpec + the q147
  * oracle-unrolled trajectory pin it):
  *   - candidates are piece lengths l = 1..maxPieceLen with a STRICT `>`
  *     left fold, so ties keep the SHORTEST last piece. Candidates with
  *     l > j (prev = −1e9 sentinel in the HOF form) can never win or tie
  *     — every log-prob is < 0, so such a candidate scores strictly below
  *     the l ≤ j candidate for the same cell — and are simply not
  *     enumerated here;
  *   - same double arithmetic (dp[j−l] + lp, IEEE add, −1e9 for missing
  *     pieces), so every DP cell is bit-identical to the HOF fold;
  *   - pieces emerge LAST-FIRST (the HOF backtrace's append order);
  *   - substrings are code-point based (UTF8String.substringSQL — what
  *     Column.substr compiles to), not UTF-16 slices;
  *   - empty word → (empty array, 0.0); null word → null (standard unary
  *     null contract). The result is never null for non-null input, so
  *     plain defineCodeGen is safe under whole-stage codegen.
  */
case class UnigramSegF(child: Expression, lp: Map[String, Double], maxPieceLen: Int)
  extends UnaryExpression {
  require(maxPieceLen >= 1 && maxPieceLen <= 8,
    s"maxPieceLen must be in [1, 8], got $maxPieceLen")
  require(lp.nonEmpty, "unigram_segment needs a non-empty vocabulary")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def prettyName: String = "unigram_segment"

  @transient private lazy val segmenter = new UnigramSegF.Segmenter(lp, maxPieceLen)

  override protected def nullSafeEval(v: Any): Any =
    segmenter.segment(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegmenter", segmenter,
      classOf[UnigramSegF.Segmenter].getName)
    defineCodeGen(ctx, ev, s => s"$ref.segment($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegF =
    copy(child = newChild)
}

object UnigramSegF {
  /** Same sentinel as the HOF form: effectively −inf for DP purposes
    * while staying NaN-free under addition.
    */
  private final val NegInf = -1.0e9

  final class Segmenter(lp: Map[String, Double], maxPieceLen: Int) extends Serializable {
    // built lazily per deserialized instance (per executor), keyed by
    // UTF8String so lookups never materialize java.lang.String
    @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Double] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Double](lp.size * 2)
      lp.foreach { case (k, v) => m.put(UTF8String.fromString(k), java.lang.Double.valueOf(v)) }
      m
    }

    def segment(word: UTF8String): InternalRow = {
      val n = word.numChars()
      val dp = new Array[Double](n + 1)
      val back = new Array[Int](n + 1)
      var j = 1
      while (j <= n) {
        // l = 1 always exists (j >= 1); strict > keeps the smallest l on ties
        var bestD = dp(j - 1) + lpOf(word.substringSQL(j, 1))
        var bestL = 1
        var l = 2
        val lMax = math.min(maxPieceLen, j)
        while (l <= lMax) {
          val d = dp(j - l) + lpOf(word.substringSQL(j - l + 1, l))
          if (d > bestD) { bestD = d; bestL = l }
          l += 1
        }
        dp(j) = bestD
        back(j) = bestL
        j += 1
      }
      // backtrace, pieces last-first (the HOF form's append order)
      var nPieces = 0
      var pos = n
      while (pos > 0) { nPieces += 1; pos -= back(pos) }
      val pieces = new Array[Any](nPieces)
      pos = n
      var i = 0
      while (pos > 0) {
        val b = back(pos)
        pieces(i) = word.substringSQL(pos - b + 1, b)
        i += 1
        pos -= b
      }
      new GenericInternalRow(Array[Any](new GenericArrayData(pieces), dp(n)))
    }

    private def lpOf(piece: UTF8String): Double = {
      val v = table.get(piece)
      if (v == null) NegInf else v.doubleValue()
    }
  }
}
