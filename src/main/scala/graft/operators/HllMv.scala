package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized distinct-count maintenance via mergeable HLL register
  * partials — the sketch answer to the one aggregate the algebraic MV
  * gears ([[graft.plans.MvRewrite]]) can never serve: COUNT(DISTINCT)
  * is not derivable from sums, but per-cell HLL registers ARE a
  * mergeable partial (register-wise MAX is associative, commutative
  * and idempotent), so a grouping-domain-×-64-row table refreshes
  * from a delta batch alone and serves distinct-count estimates
  * without ever rescanning the fact. This is the theta/HLL-sketch
  * column every metrics warehouse materializes next to its sums.
  *
  * The registers are [[graft.ext.Stats.hllRegistersOf]]'s
  * deterministic integer kernel (q127), so merged-then-estimated and
  * direct-over-the-union are BIT-IDENTICAL — the oracle can verify
  * the whole maintain-then-serve path by value, not by error bars.
  *
  * Scope line: INSERT-ONLY, stated rather than assumed — register
  * MAX is monotone, so a delete is not retractable (the register
  * holding the deleted key's rank may also be held up by other keys;
  * recovering it needs the full key multiset). Same refusal class as
  * MIN/MAX under [[graft.plans.MvRewrite.refreshRetract]].
  */
object HllMv {

  /** A registered sketch view: `mvPath` holds (grp, bucket, mj).
    * `sourcePath` (when declared) is the parquet root the registers
    * were built from — it is what lets
    * [[graft.plans.MvRewrite.registerHll]] rewrite an
    * `approx_count_distinct` aggregate over that source onto the
    * register table instead of requiring a manual
    * [[serveDistinct]] call. */
  final case class Def(grpCol: String, keyCol: String, mvPath: String,
                       sourcePath: Option[String] = None)

  private def registers(df: DataFrame, d: Def): DataFrame =
    graft.ext.Stats.hllRegistersOf(
      df.select(col(d.grpCol).as("grp"), col(d.keyCol).as("key")))

  /** Build + write the register table over an initial history. */
  def materializeFrom(df: DataFrame, d: Def): Def = {
    registers(df, d).write.mode("overwrite").parquet(d.mvPath)
    d
  }

  /** Fold an insert-only delta batch into the register table:
    * register-wise MAX of the current table with the delta's own
    * registers — reads ONLY the delta and the ≤ |groups|·64-row
    * table, never the base fact. */
  def refreshIncremental(spark: SparkSession, d: Def, delta: DataFrame,
                         newMvPath: String): Def = {
    spark.read.parquet(d.mvPath)
      .unionByName(registers(delta, d))
      .groupBy(col("grp"), col("bucket")).agg(max(col("mj")).as("mj"))
      .write.mode("overwrite").parquet(newMvPath)
    d.copy(mvPath = newMvPath)
  }

  /** Serve per-group distinct-count estimates from the register
    * table — the q127 harmonic-mean estimator, no fact access. */
  def serveDistinct(spark: SparkSession, d: Def): DataFrame =
    graft.ext.Stats.hllEstimate(spark.read.parquet(d.mvPath))
}
