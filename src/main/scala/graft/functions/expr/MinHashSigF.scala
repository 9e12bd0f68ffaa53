package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native k-value MinHash signature over an array of string shingles —
  * `minhash_sig(shingles, k)` = the bit-identical fusion of the operator's
  * declarative fold:
  *
  *   aggregate(transform(shingles, s -> xxhash64(s)),
  *             array_repeat(MaxLong, k),
  *             (acc, h) -> zip_with(acc, sequence(0, k-1),
  *                                  (m, j) -> least(m, xxhash64(j, h))))
  *
  * The fold allocates a fresh k-element accumulator array per shingle and
  * walks three interpreted lambda closures (higher-order functions do not
  * participate in whole-stage codegen); this expression is one codegen'd
  * loop with k longs of state and zero allocation until the final result
  * array. Hash math matches Spark's XxHash64 exactly: per shingle
  * h = XXH64(bytes, seed=42) (null shingle leaves h at the seed, like
  * xxhash64(null)); per function j the value is hashLong(h, hashInt(j, 42))
  * — the same fold XxHash64(j, h) performs — so signatures, band hashes,
  * and candidate sets are unchanged down to the bit.
  *
  * This is the dominant cost of full-corpus LSH dedup (q44: ~23k hash ops
  * per document), i.e. exactly the SURVEY §4.2 case where a custom
  * Expression is warranted over composing built-ins.
  */
case class MinHashSigF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) =>
      if (right.dataType == IntegerType && right.foldable &&
          right.eval() != null && right.eval().asInstanceOf[Int] > 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "minhash_sig k must be a positive integer literal")
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> shingles, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  private lazy val numHashes: Int = right.eval().asInstanceOf[Int]

  // per-function seeds: XxHash64(j, h) folds j first — hashInt(j, 42) —
  // then h; precompute the j part once
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(j => XXH64.hashInt(j, 42L))

  // single implementation shared by the interpreted and codegen paths —
  // two hand-kept copies of the loop could silently diverge
  override protected def nullSafeEval(arr: Any, kv: Any): Any =
    MinHashSigF.compute(arr.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.expr.MinHashSigF.compute($a, $seedsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigF =
    copy(left = newLeft, right = newRight)
}

object MinHashSigF {
  def compute(a: ArrayData, seeds: Array[Long]): GenericArrayData = {
    val k = seeds.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      var h = 42L
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(h, seeds(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
