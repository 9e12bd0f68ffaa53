package graft.plans

import graft.functions.expr.DotProductF
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Catalyst optimizer rule: rewrite the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  *             (acc, v) -> acc + v)
  *
  * over two `array<float>` columns into the fused native expression
  * [[DotProductF]] (`vec_dot`). The HOF form allocates an intermediate
  * array per row and walks three lambda closures; `vec_dot` is one
  * codegen'd loop over the unsafe array bytes — measured ~4x faster on the
  * brute-force ANN scoring path. Results are bit-identical by construction:
  * identical upcasts, identical sequential accumulation order, identical
  * NULL semantics (mismatched lengths or a null element yield NULL, null
  * input yields NULL, empty arrays yield 0.0) — so the rewrite is safe for
  * hash-compared oracle queries.
  *
  * This is the SURVEY §4.2 preference order in action: users write the
  * declarative form (or call [[graft.functions.VectorMath.dot]]); the rule
  * picks the fast physical expression, the way Catalyst rewrites its own
  * builtins. Installed per-session via
  * [[GraftFunctions.installPlanRewrites]] (experimental.extraOptimizations)
  * or cluster-wide via `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The pair (l, r) is exactly the two lambda variables {a, b} in either
    * order (both multiply and add commute here — double arithmetic on the
    * same two operands).
    */
  private def isVarPair(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean = (l, r) match {
    case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(
            Multiply(
              Cast(x: NamedLambdaVariable, DoubleType, _, _),
              Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
            Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(la: NamedLambdaVariable, lv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(lf: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) &&
          isVarPair(x, y, lx, ly) && isVarPair(al, ar, la, lv) &&
          fin.exprId == lf.exprId =>
        DotProductF(a, b)
    }
}
