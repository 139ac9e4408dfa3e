package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: predicate pushdown through [[AsOfJoinPlan]] —
  * Catalyst's own `PushDownPredicates` only understands built-in
  * nodes, so without this rule any filter above an as-of join blocks
  * scan pruning on both inputs.
  *
  * Safe moves, given as-of emits exactly one row per left row and a
  * left row's match depends only on same-key right rows:
  *   - a deterministic conjunct referencing only LEFT columns pushes
  *     into the left child (dropping other left rows never changes a
  *     surviving row's match);
  *   - if that conjunct references only left KEY columns, its mirror
  *     (key attributes substituted positionally) also pushes into the
  *     right child: right rows of excluded keys can only match
  *     excluded left rows.
  * Everything else (right-referencing conjuncts — which see nulls for
  * unmatched rows — and non-deterministic ones) stays above the join.
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case Filter(cond, aj: AsOfJoinPlan) =>
      val leftOut = AttributeSet(aj.left.output)
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(leftOut))
      if (pushable.isEmpty) Filter(cond, aj)
      else {
        val newLeft = Filter(pushable.reduce(org.apache.spark.sql.catalyst.expressions.And), aj.left)
        val newRight = mirrorToRight(aj, pushable) match {
          case Some(m) => Filter(m, aj.right)
          case None => aj.right
        }
        val pushed = aj.copy(left = newLeft, right = newRight)
        if (kept.isEmpty) pushed
        else Filter(kept.reduce(org.apache.spark.sql.catalyst.expressions.And), pushed)
      }
  }

  /** Conjuncts referencing only left key attributes, rewritten onto
    * the positionally-matching right key attributes. */
  private def mirrorToRight(aj: AsOfJoinPlan, conjuncts: Seq[Expression]): Option[Expression] = {
    val mapping: Map[Attribute, Expression] = aj.leftKeys.zip(aj.rightKeys).collect {
      case (l: Attribute, r: Attribute) => (l: Attribute) -> (r: Expression)
    }.toMap
    val keyAttrs = AttributeSet(mapping.keys)
    val mirrored = conjuncts.filter(_.references.subsetOf(keyAttrs)).map { c =>
      c.transform { case a: Attribute if mapping.contains(a) => mapping(a) }
    }
    mirrored.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
  }
}
