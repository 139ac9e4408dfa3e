package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the latest right row of the same
  * key with `right.ts <= left.ts` (trades/quotes semantics). Spark has
  * no native ASOF operator; rather than a custom physical plan, this
  * composes built-ins ((a) in the preference order) into a
  * union + keyed LOCF window:
  *
  *   1. tag both sides, align them into one frame
  *      (key, ts, src, left-struct, right-struct);
  *   2. one window per key ordered by (ts, src, right-tiebreak) —
  *      src puts right rows first at equal ts, so ties match
  *      (`>=` as-of semantics);
  *   3. `last(right_struct, ignoreNulls)` over
  *      rowsBetween(unboundedPreceding, currentRow) carries the most
  *      recent right row onto every left row;
  *   4. keep left rows, unpack both structs.
  *
  * Cost: one shuffle of (left ∪ right) on the key — the same price as
  * any keyed join of the two inputs, with per-key state instead of a
  * range predicate explosion. Skewed keys: salt or AQE, like any other
  * keyed shuffle.
  */
object AsOfJoin {

  /** @param tieBreak right-side column deciding among equal-ts right
    *                 rows (largest wins, matching "latest").
    *  @param rightPrefix prefix for right columns in the output. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
           tieBreak: String, rightPrefix: String = "r_"): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val lCols = left.columns.filterNot(keys.contains)
    val rCols = right.columns.filterNot(keys.contains)
    val keyCols: Seq[Column] = keys.map(col)

    val lPart = left.select(keyCols ++ Seq(
      col(ts).as("__ts"), lit(1).as("__src"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        rCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType,
          nullable = true)))).as("__r")): _*)
    val rPart = right.select(keyCols ++ Seq(
      col(ts).as("__ts"), lit(0).as("__src"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        lCols.map(c => org.apache.spark.sql.types.StructField(c, left.schema(c).dataType,
          nullable = true)))).as("__l"),
      struct(rCols.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy($"__ts".asc, $"__src".asc, col(s"__r.$tieBreak").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lPart.unionByName(rPart)
      .withColumn("__rm", last($"__r", ignoreNulls = true).over(w))
      .filter($"__src" === 1)

    val out = keyCols ++
      lCols.map(c => col(s"__l.$c").as(c)) ++
      rCols.map(c => col(s"__rm.$c").as(s"$rightPrefix$c"))
    matched.select(out: _*)
  }

  /** Native-lane as-of join — same semantics and output shape as
    * [[asOf]], but planned through the custom
    * [[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]
    * streamed merge instead of the union+window composition. At scale
    * this holds O(1) per-partition state (one candidate right row)
    * where the window form buffers frames through the sort, declares
    * its distribution so a bucketed/pre-shuffled layout skips the
    * exchange, and lets [[graft.plans.PushFilterThroughAsOf]] move
    * predicates down to the scans.
    *
    * Registers the planner lane on the session if absent
    * ([[graft.GraftRuntime.ensure]]).
    */
  def asOfNative(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
                 tieBreak: String, rightPrefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val spark = left.sparkSession
    graft.GraftRuntime.ensure(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Self-join safety: the analyzer's relation-dedup never sees this
    // plan (children arrive pre-analyzed), so when both sides derive
    // from the same source their attrs share exprIds — re-alias the
    // right side with fresh ones.
    val rPlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found in ${plan.output.map(_.name)}"))
    val plan = graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, ts), attr(rPlan, ts), attr(rPlan, tieBreak))
    val joined = Bridge.ofRows(spark, plan)
    // Match the composed form's output: keys once (left copy), left
    // non-key cols as-is, right non-key cols prefixed. Attribute refs
    // resolve by exprId, so the duplicate ts/key names are unambiguous.
    val outCols = keys.map(k => Bridge.column(attr(lPlan, k))) ++
      lPlan.output.filterNot(a => keys.contains(a.name)).map(a => Bridge.column(a).as(a.name)) ++
      rPlan.output.filterNot(a => keys.contains(a.name)).map(a => Bridge.column(a).as(s"$rightPrefix${a.name}"))
    joined.select(outCols: _*)
  }
}
