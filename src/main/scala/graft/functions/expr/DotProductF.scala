package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two array columns of float or double elements
  * (each side independently; mixing is allowed).
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is
  * semantically identical but materializes an intermediate array per row and
  * walks three lambda closures. This expression fuses the whole thing into
  * one codegen'd loop over the underlying unsafe array data: no allocation,
  * no virtual calls, SIMD-friendly. Math is kept EXACTLY the same
  * (each element upcast to double, sequential left-to-right accumulate) so
  * results are bit-identical to the HOF form and to the DuckDB oracle.
  *
  * Double-array support exists for the TRAINED-PARAMETER paths (k-means /
  * PQ centroids, classifier weights): trained values are r4-snapped doubles
  * that are NOT representable as floats, so an assignment scan against them
  * must dot in double end-to-end or cross-engine parity dies on the cast.
  *
  * 100 TB posture: this is the inner loop of brute-force ANN scoring and of
  * every per-point assignment pass (corpus_rows × centroids × dim
  * multiply-adds) — the one place where a custom Expression is warranted
  * over composing built-ins (SURVEY §4.2).
  */
case class DotProductF(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemOk(e.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // Null semantics match the HOF form aggregate(zip_with(a,b,_*_),0d,_+_):
  // zip_with pads the shorter array with nulls and null propagates through
  // the sum, so mismatched lengths or any null element -> NULL (a dimension
  // bug must surface, not read as a plausible score).
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lx = isDouble(left)
    val ly = isDouble(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lx) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (ly) y.getDouble(i) else y.getFloat(i).toDouble
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      def get(arr: String, e: Expression) =
        if (isDouble(e)) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${get(a, left)} * ${get(b, right)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}
