package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join — the custom whole-operator lane ((c) in the
  * brief's preference order): Spark has no ASOF join node, and the
  * composed form ([[graft.operators.AsOfJoin.asOf]], union + keyed
  * LOCF window) cannot express the streamed per-partition merge that a
  * native operator gets, nor can Catalyst push predicates through the
  * opaque window. This node carries the semantics declaratively:
  *
  *   for each left row, attach the latest right row of the same key
  *   with `right.ts <= left.ts` (ties on ts broken by the largest
  *   `tieBreak`), or nulls when no such row exists (left-outer).
  *
  * Reference semantics: harrymardika/netflix-data-ingestion joins
  * fact rows to the most recent dimension state (etl_pipeline_spark.py
  * resolves ratings against the movie catalog as-of load time); this
  * generalizes that to event-time trades/quotes semantics.
  *
  * Planning: [[AsOfJoinStrategy]] lowers it to [[AsOfJoinExec]];
  * [[PushFilterThroughAsOf]] pushes eligible predicates below it.
  * Keys/ts/tieBreak are pre-resolved attributes of the children, so
  * the node arrives at the analyzer already resolved.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    tieBreak: Expression) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs equal, non-empty key lists")

  /** Left columns as-is; right columns nullable (left-outer). */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
