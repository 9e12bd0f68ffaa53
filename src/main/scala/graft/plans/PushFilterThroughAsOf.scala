package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown through [[AsOfJoinPlan]] — the optimizer work
  * Catalyst cannot do for a node it doesn't know: PushDownPredicates
  * pattern-matches the builtin operators only, so without this rule a
  * `Filter` above an as-of join stops there and the join processes rows
  * the query will throw away (at 100 TB, that is the difference between
  * scanning a partition and scanning a table — once pushed to the left
  * child, Catalyst's own rules carry the predicate all the way into the
  * parquet scan's PushedFilters).
  *
  * Only LEFT-side deterministic conjuncts move: as-of matches are computed
  * per left row independently, so dropping left rows early cannot change
  * any surviving row's match (inner AND left-outer). Right-side predicates
  * must stay above — filtering right history changes which row is
  * "latest" (different operator semantics, not an optimization).
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjuncts(cond).partition(e =>
        e.deterministic && e.references.nonEmpty &&
          e.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning through [[AsOfJoinPlan]] — the other half of what
  * Catalyst can't do for an unknown node: a `Project` above the join
  * previously still dragged every child column through the shuffle, sort,
  * and merge. Children are narrowed to (projected ∪ key ∪ time ∪
  * tie-break) attributes; Catalyst's own ColumnPruning then walks the
  * inserted Projects down into the scans' ReadSchema. At 100 TB this is
  * the difference between shuffling two columns and shuffling the table.
  */
object PruneAsOfColumns extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, j: AsOfJoinPlan) =>
      val required = AttributeSet(
        p.references ++
          j.leftKeys.flatMap(_.references) ++
          j.rightKeys.flatMap(_.references) ++
          j.leftTime.references ++ j.rightTime.references ++
          j.rightTieBreak.flatMap(_.references))
      val lKeep = j.left.output.filter(required.contains)
      val rKeep = j.right.output.filter(required.contains)
      if (lKeep.length == j.left.output.length &&
          rKeep.length == j.right.output.length) p
      else p.copy(child = j.copy(
        left = Project(lKeep, j.left),
        right = Project(rKeep, j.right)))
  }
}
