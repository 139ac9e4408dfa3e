package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical point-in-interval join: one streamed merge pass over two
  * sides EnsureRequirements has co-partitioned by key and sorted by
  * (key, t) / (key, start).
  *
  * Why this beats the generic plans at 100 TB:
  *   - the same two key-hash shuffles any keyed join pays, but the
  *     range predicate is resolved by the merge itself — no post-join
  *     filter over an exploded candidate space, no nested-loop;
  *   - per partition the operator holds only the ACTIVE intervals of
  *     the current key (start ≤ t, not yet expired) — bounded by the
  *     key's overlap degree, not its row count;
  *   - distribution/ordering are declared, so bucketed or
  *     pre-shuffled layouts skip the exchanges.
  *
  * Merge invariants (left ascending (key, t); right ascending
  * (key, start)):
  *   - right rows are consumed while `rKey < lKey`, or `rKey == lKey
  *     && start <= t` — consumed matching rows enter the active set;
  *   - the active set is evicted of intervals with `end < t` before
  *     emitting (t is non-decreasing within a key, so eviction is
  *     permanent); it is cleared whenever the left key changes;
  *   - null keys on either side never match (equi-join semantics);
  *     `end < start` intervals enter and evict without ever emitting.
  */
case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftT: Expression,
    rightStart: Expression,
    rightEnd: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftT).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightStart).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTExpr = leftT
    val rStartExpr = rightStart
    val rEndExpr = rightEnd
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTProj = UnsafeProjection.create(Seq(lTExpr), lOut)
      val rStartProj = UnsafeProjection.create(Seq(rStartExpr), rOut)
      val rEndProj = UnsafeProjection.create(Seq(rEndExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTExpr.dataType))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // active intervals of the current key: (end-value row, right row)
      val active = new mutable.ArrayBuffer[(UnsafeRow, InternalRow)]
      var curKey: UnsafeRow = null
      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        if (lKey.anyNull) Iterator.empty
        else {
          if (curKey == null || keyOrd.compare(curKey, lKey) != 0) {
            active.clear()
            curKey = lKey.copy()
          }
          val lT = lTProj(lRow).copy()
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            if (rKey.anyNull) { rBuf.next() } // never matches; discard
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { rBuf.next() } // behind the current key; discard
              else if (c == 0 && tOrd.compare(rStartProj(rBuf.head), lT) <= 0) {
                val r = rBuf.next().copy()
                active += ((rEndProj(r).copy(), r))
              } else advancing = false // ahead of (key, t): keep for later
            }
          }
          // expired intervals can never match again (t non-decreasing)
          var i = 0
          while (i < active.length) {
            if (tOrd.compare(active(i)._1, lT) < 0) active.remove(i)
            else i += 1
          }
          // safe to hand out the reused projection buffer: flatMap
          // exhausts this inner iterator before the next left row, and
          // downstream operators copy rows they buffer (Spark contract)
          active.iterator.map { case (_, r) => outProj(joined(lRow, r)) }
        }
      }
    }
  }
}
