package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy lowering [[IntervalJoinPlan]] to
  * [[IntervalJoinExec]]. Registered through `spark.sql.extensions`
  * ([[graft.GraftExtensions]]) or at runtime
  * ([[graft.GraftRuntime.ensure]]).
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, t, s, e) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, t, s, e) :: Nil
    case _ => Nil
  }
}
