package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy lowering [[AsOfJoinPlan]] to [[AsOfJoinExec]].
  * Registered through `spark.sql.extensions` ([[graft.GraftExtensions]]
  * `injectPlannerStrategy`). Spark 4 removed the `sql.Strategy` alias;
  * [[SparkStrategy]] is the concrete public-ish base that carries
  * `planLater`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}
