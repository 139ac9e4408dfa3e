package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation maintenance — the pattern behind a
  * continuously-loading warehouse rollup: keep a small partial-state
  * table (per-key exact-decimal sum + count), fold each new batch's
  * partials into it with one key-wise merge, and finalize on read.
  * Because the partial/merge pair is algebraic,
  * `merge(partial(A), partial(B)) == partial(A ∪ B)` exactly — no
  * re-scan of historical data when a batch lands, which at 100 TB is
  * the difference between touching gigabytes and touching everything.
  * (The reference re-aggregates the full fact table per load,
  * `etl_pipeline_spark.py:1398-1455`.)
  *
  * Exact `DECIMAL(18,2)` partials keep the merge order-independent, so
  * any batch arrival order produces identical state.
  *
  * The same algebraic partial/merge contract powers
  * [[graft.plans.MvRewrite.refreshIncremental]], where the state table
  * is a registered materialized view (sum/count/min-max partials per
  * cell) refreshed from append-only deltas and served through the
  * rollup-rewrite rule; [[retractState]] here is the delete-side form
  * that MV refresh deliberately excludes (MIN/MAX under deletes is
  * not derivable from partials).
  */
object IncrementalAgg {

  /** Per-key partial state (exact sum + count) for one batch. */
  def partialState(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("psum"),
        count(lit(1)).as("pcnt"))

  /** Fold one state table into another (either side may be a batch's
    * fresh partials or accumulated history). */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(key))
      .agg(sum(col("psum")).as("psum"), sum(col("pcnt")).as("pcnt"))

  /** Presentation form of the state: rounded double total + count. */
  def finalize(state: DataFrame, key: String): DataFrame =
    state.select(col(key),
      round(col("psum").cast("double"), 2).as("total"),
      col("pcnt").as("n"))
      .orderBy(col(key))

  /** Retraction partials — the DELETE side of incremental view
    * maintenance: the same per-key partials with both measures
    * NEGATED, so `merge(state, retractState(deleted))` subtracts the
    * deleted rows' contribution exactly (sums are an abelian group,
    * not just a monoid). With [[partialState]] for the insert side,
    * one merge maintains the rollup under an arbitrary
    * deletes+inserts batch without touching historical data — keys
    * whose count reaches zero are dropped by [[compact]].
    */
  def retractState(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        (-sum(col(valueCol).cast("decimal(18,2)"))).as("psum"),
        (-count(lit(1))).as("pcnt"))

  /** Drop fully-retracted keys (count 0) from a state table — the
    * garbage-collection pass that keeps state proportional to LIVE
    * keys. */
  def compact(state: DataFrame): DataFrame =
    state.filter(col("pcnt") =!= 0)
}
