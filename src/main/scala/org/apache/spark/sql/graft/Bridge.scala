package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark 4 internals, the standard pattern
  * for libraries that define native Catalyst expressions: Spark 4's
  * public `Column` is Connect-compatible and no longer exposes `expr`,
  * so converting between `Column` and catalyst `Expression` (and
  * registering SQL functions) requires `org.apache.spark.sql`-private
  * API. This object lives in a subpackage of `org.apache.spark.sql`
  * purely to widen that access for the graft library.
  */
object Bridge {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its analyzed catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a user-facing DataFrame —
    * `Dataset.ofRows` went `private[sql]`-classic in Spark 4. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently register runtime planner hooks on a live session —
    * the post-`getOrCreate` twin of `spark.sql.extensions` for
    * sessions the library didn't build. */
  def addRuntimeRules(
      spark: SparkSession,
      strategies: Seq[org.apache.spark.sql.execution.SparkStrategy],
      optimizations: Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]]): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    exp.extraStrategies =
      (exp.extraStrategies ++ strategies.filterNot(exp.extraStrategies.contains)).toList
    exp.extraOptimizations =
      (exp.extraOptimizations ++ optimizations.filterNot(exp.extraOptimizations.contains)).toList
  }

  /** MEASURED block-manager footprint (memory + disk bytes) of a
    * persisted DataFrame's cached relation — not an optimizer
    * estimate. Resolves the frame through the session CacheManager to
    * its `InMemoryRelation`, takes the id of the cached-batch RDD, and
    * reads that RDD's storage totals from the SparkContext's storage
    * listing (the driver-side view of every executor's BlockManager).
    * 0 for a frame that is not (or no longer) cached.
    */
  def cachedBytes(df: DataFrame): Long = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val session = classic.sparkSession
    session.sharedState.cacheManager.lookupCachedData(classic) match {
      case Some(cd) =>
        val id = cd.cachedRepresentation.cacheBuilder.cachedColumnBuffers.id
        session.sparkContext.getRDDStorageInfo
          .filter(_.id == id).map(i => i.memSize + i.diskSize).sum
      case None => 0L
    }
  }

  /** Register a SQL-callable function backed by a native Expression. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Block until the listener bus has delivered every queued event —
    * profiling-only (the per-query metrics harness must read its
    * listener's counters AFTER the last task-end event lands). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
