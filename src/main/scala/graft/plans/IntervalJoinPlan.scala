package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical point-in-interval join — the second custom whole-operator
  * lane (preference (c) in the brief): Spark plans a
  * `l.key = r.key AND r.start <= l.t AND l.t <= r.end` join as a
  * shuffle join with the range predicate as a post-join filter at
  * best, and a broadcast-nested-loop at worst; neither exploits that
  * both sides can be merged in one sorted pass per key. This node
  * carries the semantics declaratively:
  *
  *   emit (left, right) for every left point row and right interval
  *   row with equal keys and `start <= t <= end` (inner join,
  *   multiplicity preserved — a point inside k intervals emits k
  *   rows).
  *
  * [[IntervalJoinStrategy]] lowers it to the streamed
  * [[IntervalJoinExec]] whose per-partition state is the active
  * interval set — bounded by the key's maximum overlap degree, not
  * its row count. Composed alternative: time-bucket expansion
  * ([[graft.operators.RangeJoin.within]]) — still the right choice
  * when intervals are a fixed tolerance around a point; this lane
  * handles arbitrary-length intervals, which bucketing can't bound.
  */
case class IntervalJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftT: Expression,
    rightStart: Expression,
    rightEnd: Expression) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "interval join needs equal, non-empty key lists")

  /** Inner join: both sides keep their nullability. */
  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}
