package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.Bridge
import graft.plans.{AsOfJoinStrategy, IntervalJoinStrategy, MvRewrite, PushFilterThroughAsOf}

/** Runtime twin of [[GraftExtensions]] for sessions that were built
  * without `spark.sql.extensions`: idempotently installs the native
  * as-of planner strategy and its pushdown rule on a live session via
  * `spark.experimental`. [[graft.operators.AsOfJoin.asOfNative]] calls
  * this on entry, so the native lane works against any session.
  */
object GraftRuntime {
  def ensure(spark: SparkSession): Unit =
    Bridge.addRuntimeRules(spark,
      Seq(AsOfJoinStrategy, IntervalJoinStrategy),
      Seq(PushFilterThroughAsOf, MvRewrite))
}
