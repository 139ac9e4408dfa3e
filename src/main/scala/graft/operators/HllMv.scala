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
  * The registers are [[graft.ext.Stats.hllRegistersOfCols]]'s
  * deterministic integer kernel (q127), so merged-then-estimated and
  * direct-over-the-union are BIT-IDENTICAL — the oracle can verify
  * the whole maintain-then-serve path by value, not by error bars.
  *
  * Scope line: the INCREMENTAL refresh is insert-only, stated rather
  * than assumed — register MAX is monotone, so a delete is not
  * retractable from the partial (the register holding the deleted
  * key's rank may also be held up by other keys; recovering it needs
  * the full key multiset). Deletes go through
  * [[refreshRetractRederive]], the same touched-cell re-derivation
  * [[graft.plans.MvRewrite.refreshRetractRederive]] runs for MIN/MAX:
  * CDC-touched cells rebuild their registers from the (post-CDC) base
  * slice, untouched cells keep their register rows unread.
  */
object HllMv {

  /** A registered sketch view: `mvPath` holds the group columns under
    * their ORIGINAL names plus (bucket, mj) — one table serves
    * `GROUP BY` on its exact column set and, by register max-merge,
    * on any SUBSET of it. `sourcePath` (when declared) is the parquet
    * root the registers were built from — it is what lets
    * [[graft.plans.MvRewrite.registerHll]] rewrite an
    * `approx_count_distinct` aggregate over that source onto the
    * register table instead of requiring a manual
    * [[serveDistinct]] call. */
  final case class Def(grpCols: Seq[String], keyCol: String, mvPath: String,
                       sourcePath: Option[String] = None)

  object Def {
    /** Single-group form — the common registration shape. */
    def apply(grpCol: String, keyCol: String, mvPath: String): Def =
      Def(Seq(grpCol), keyCol, mvPath, None)
    def apply(grpCol: String, keyCol: String, mvPath: String,
              sourcePath: Option[String]): Def =
      Def(Seq(grpCol), keyCol, mvPath, sourcePath)
  }

  private def registers(df: DataFrame, d: Def): DataFrame =
    graft.ext.Stats.hllRegistersOfCols(df, d.grpCols, d.keyCol)

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
    val g = d.grpCols.map(col)
    spark.read.parquet(d.mvPath)
      .unionByName(registers(delta, d))
      .groupBy((g :+ col("bucket")): _*).agg(max(col("mj")).as("mj"))
      .write.mode("overwrite").parquet(newMvPath)
    d.copy(mvPath = newMvPath)
  }

  /** CDC refresh for register tables — the touched-cell re-derivation
    * gear, removing the insert-only refusal: register MAX is monotone
    * so a delete cannot be retracted from the partial, but the cells a
    * CDC batch TOUCHES are a batch-bounded set whose registers rebuild
    * exactly from the base slice while untouched cells keep their
    * rows unread. Contract (same as
    * [[graft.plans.MvRewrite.refreshRetractRederive]], stated): the
    * base at `d.sourcePath` must already reflect the CDC batch — the
    * fact upsert commits first, then the register refresh consumes the
    * same changelog. What it reads: the CDC batch (its distinct
    * cells), the register table, and the touched cells' slice of the
    * base — pushed into the scan as a literal null-safe cell predicate
    * below `cellLiteralMax` cells ([[graft.plans.MvRewrite
    * .cellPredicate]] — partition + row-group pruning), a distributed
    * left-semi join above it. At 100 TB a touched-cells-sized read,
    * never a fact-sized one. */
  def refreshRetractRederive(spark: SparkSession, d: Def, cdc: DataFrame,
                             newMvPath: String,
                             cellLiteralMax: Int = 10000): Def = {
    val src = d.sourcePath.getOrElse(throw new IllegalArgumentException(
      s"refreshRetractRederive: ${d.mvPath} declares no sourcePath — " +
        "touched cells cannot be re-derived without the base"))
    val touched = cdc.select(d.grpCols.map(cdc(_)): _*).distinct()
    val cur = spark.read.parquet(d.mvPath)
    val cells = touched.limit(cellLiteralMax + 1).collect().toSeq
    val next =
      if (cells.isEmpty) cur
      else {
        val base = spark.read.parquet(src)
        val slice =
          if (cells.size <= cellLiteralMax)
            base.filter(
              graft.plans.MvRewrite.cellPredicate(cells, d.grpCols, base))
          else
            base.join(touched, d.grpCols.map(c =>
              base(c) <=> touched(c)).reduce(_ && _), "left_semi")
        val untouched = cur.join(touched, d.grpCols.map(c =>
          cur(c) <=> touched(c)).reduce(_ && _), "left_anti")
        untouched.unionByName(registers(slice, d))
      }
    next.write.mode("overwrite").parquet(newMvPath)
    d.copy(mvPath = newMvPath)
  }

  /** Serve per-group distinct-count estimates from the register
    * table — the q127 harmonic-mean estimator, no fact access. */
  def serveDistinct(spark: SparkSession, d: Def): DataFrame =
    graft.ext.Stats.hllEstimateCols(spark.read.parquet(d.mvPath), d.grpCols)
}
