package graft.plans

import org.apache.spark.sql.Strategy
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan

/** Planner strategy lowering [[AsOfJoinPlan]] to [[AsOfJoinExec]].
  * Registered either through `spark.experimental.extraStrategies`
  * ([[GraftRuntime.ensure]]) or `spark.sql.extensions`
  * ([[GraftExtensions]]).
  */
object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}
