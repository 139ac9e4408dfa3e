package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Band/range join: pairs of rows with equal keys whose timestamps lie
  * within a tolerance of each other. A naive formulation is an
  * inequality join (O(|L|·|R|) per key); this one buckets time by the
  * tolerance and equi-joins on (key, bucket) with the right side
  * expanded to its three candidate buckets — |ta−tb| ≤ tol implies the
  * bucket indices differ by at most 1 — then applies the exact
  * predicate. The shuffle is a plain hash join on (key, bucket): at
  * 100 TB this is the difference between a broadcast-nested-loop plan
  * and a normal shuffle join.
  */
object RangeJoin {

  /** @param tsUs   column name holding microsecond timestamps (long)
    * @param tolUs  inclusive tolerance in microseconds */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
             tsUs: String, tolUs: Long, rightPrefix: String = "r_"): DataFrame = {
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "RangeJoin reserves the __bucket column name")
    val collisions = right.columns.filterNot(keys.contains)
      .map(rightPrefix + _).toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"left columns collide with prefixed right columns: $collisions " +
      "(pass a different rightPrefix)")
    val keyCols: Seq[Column] = keys.map(col)
    val rRenamed = right.columns.filterNot(keys.contains)
      .foldLeft(right)((df, c) => df.withColumnRenamed(c, s"$rightPrefix$c"))
    // integral div (not floor of a double quotient): at epoch-µs
    // magnitudes a double division can round across a bucket boundary,
    // and a one-off bucket on only one side would escape the ±1
    // neighbor expansion entirely
    val l = left.withColumn("__bucket", expr(s"$tsUs div ${tolUs}L"))
    val r = rRenamed
      .withColumn("__b0", expr(s"$rightPrefix$tsUs div ${tolUs}L"))
      .withColumn("__bucket", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    l.join(r, keys :+ "__bucket")
      .filter(abs(col(tsUs) - col(s"$rightPrefix$tsUs")) <= tolUs)
      .drop("__bucket")
  }

  /** Native-lane point-in-interval join: emit (point, interval) for
    * equal keys and `start <= t <= end`, planned through
    * [[graft.plans.IntervalJoinPlan]] →
    * [[graft.plans.IntervalJoinExec]] — one streamed merge per
    * partition whose state is the ACTIVE interval set (bounded by
    * overlap degree), instead of the bucket-explosion of [[within]]
    * (which needs a bounded tolerance) or the post-join range filter /
    * nested loop Catalyst would plan for the raw condition.
    * Arbitrary-length intervals are exactly the case bucketing can't
    * bound.
    *
    * Output: keys once (left copy), left non-key columns as-is, right
    * non-key columns prefixed. Registers the planner lane on the
    * session if absent ([[graft.GraftRuntime.ensure]]).
    */
  def pointInIntervalNative(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], t: String, start: String, end: String,
      rightPrefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val spark = points.sparkSession
    graft.GraftRuntime.ensure(spark)
    val lPlan = points.queryExecution.analyzed
    val rPlan0 = intervals.queryExecution.analyzed
    // Self-join safety: children arrive pre-analyzed, so shared source
    // attrs would collide by exprId — re-alias the right side.
    val rPlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found in ${plan.output.map(_.name)}"))
    val plan = graft.plans.IntervalJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, t), attr(rPlan, start), attr(rPlan, end))
    val joined = Bridge.ofRows(spark, plan)
    val outCols = keys.map(k => Bridge.column(attr(lPlan, k))) ++
      lPlan.output.filterNot(a => keys.contains(a.name))
        .map(a => Bridge.column(a).as(a.name)) ++
      rPlan.output.filterNot(a => keys.contains(a.name))
        .map(a => Bridge.column(a).as(s"$rightPrefix${a.name}"))
    joined.select(outCols: _*)
  }
}
