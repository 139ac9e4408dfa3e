package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: a single streamed merge pass over two sides
  * that EnsureRequirements has already co-partitioned by key and
  * sorted by (key, ts[, tieBreak]).
  *
  * Why this beats the composed union+window form at 100 TB:
  *   - the same two key-hash shuffles any keyed join pays, but no
  *     union of padded null-structs and no window buffering — per
  *     partition the operator holds exactly ONE candidate right row
  *     (O(1) state), while the window form materializes frames through
  *     the sort buffer;
  *   - distribution/ordering are declared, so Catalyst reuses an
  *     existing layout (bucketed or pre-shuffled input skips the
  *     exchange entirely — the window form always re-shuffles its
  *     union);
  *   - predicates push through the logical node
  *     ([[PushFilterThroughAsOf]]) down to the parquet scans, which
  *     the opaque window blocks.
  *
  * Merge invariants (both iterators ascending by (key, ts)):
  *   - right rows are consumed while `rKey < lKey`, or `rKey == lKey
  *     && rTs <= lTs` — consuming ties in tieBreak order leaves the
  *     LAST (largest-tieBreak) match as the candidate;
  *   - the candidate is emitted only when its key equals the current
  *     left key (stale candidates from earlier keys compare unequal);
  *   - null left keys never match (equi-join semantics), null right
  *     keys are consumed and ignored.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    tieBreak: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs :+ tieBreak).map(SortOrder(_, Ascending)))

  /** One output row per left row, in left order. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd projections are built per-partition on the executor
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      // Bind against the nullability-adjusted output (right side is
      // withNullability(true)), not lOut ++ rOut: binding to the raw
      // child attrs would keep non-nullable right refs, so projecting
      // the all-null row for unmatched left rows would read garbage
      // instead of null (same pattern as SortMergeJoinExec).
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rBuf = rIter.buffered
      var cand: InternalRow = null     // last right row matching candKey
      var candKey: UnsafeRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        if (lKey.anyNull) {
          outProj(joined(lRow, nullRight))
        } else {
          val lTsRow = lTsProj(lRow)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            if (rKey.anyNull) { rBuf.next() } // never matches; discard
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { rBuf.next() } // behind the current key; discard
              else if (c == 0 && tsOrd.compare(rTsProj(rBuf.head), lTsRow) <= 0) {
                candKey = rKey.copy()
                cand = rBuf.next().copy()
              } else advancing = false // ahead of (key, ts): keep for later
            }
          }
          val matched = cand != null && keyOrd.compare(candKey, lKey) == 0
          outProj(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }
}
