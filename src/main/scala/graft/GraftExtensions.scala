package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, ShingleHash}
import graft.plans.{AsOfJoinStrategy, IntervalJoinStrategy, MvRewrite, PushFilterThroughAsOf}

/** SparkSessionExtensions entry point — wire the engine's native
  * expressions into any session at build time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * makes `cosine_sim(a, b)` and `shingle_hash(text)` available to
  * `spark.sql(...)` in every session, and registers the native as-of
  * join lane: [[graft.plans.AsOfJoinStrategy]] lowers
  * [[graft.plans.AsOfJoinPlan]] to the streamed-merge
  * [[graft.plans.AsOfJoinExec]], and
  * [[graft.plans.PushFilterThroughAsOf]] lets predicates above the
  * join reach the scans (Catalyst's own pushdown can't see through a
  * foreign node).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOf)
    ext.injectOptimizerRule(_ => MvRewrite)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          s"cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hash"),
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1,
          s"shingle_hash expects 1 argument, got ${exprs.length}")
        ShingleHash(exprs.head)
      }))
  }
}
