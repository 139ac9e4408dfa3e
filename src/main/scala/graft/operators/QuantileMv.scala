package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized quantile maintenance via the mergeable log-linear
  * sketch ([[graft.ext.Stats.qsketchHistOf]], q130's kernel) — the
  * percentile answer to the same question [[HllMv]] answers for
  * distinct counts: exact percentiles need a total order no partial
  * can summarize, but a ≤ ~120-bucket histogram per cell is a
  * mergeable partial (counts ADD), so a grouping-domain-×-buckets
  * table refreshes from a delta batch alone and serves percentile
  * estimates without rescanning the fact. Unlike HLL registers the
  * counts are also fully RETRACTABLE — a delete subtracts its bucket
  * count — so the CDC refresh is the plain signed merge, no
  * touched-cell machinery needed.
  *
  * The kernel is deterministic integer arithmetic (bit-smear octave,
  * integer crossing test, lower-bound estimate), so maintain-then-
  * serve is BIT-IDENTICAL to direct-over-the-union and the DuckDB
  * oracle verifies the whole path by value.
  */
object QuantileMv {

  /** A registered sketch view: `mvPath` holds the group columns under
    * their ORIGINAL names plus (id, cnt). One table serves quantiles
    * for its exact grouping and — counts add — any SUBSET of it.
    * `sourcePath` (when declared) lets
    * [[graft.plans.MvRewrite.registerQuantile]] rewrite an
    * `approx_percentile` aggregate over that source onto the sketch. */
  final case class Def(grpCols: Seq[String], valCol: String, mvPath: String,
                       sourcePath: Option[String] = None)

  private def hist(df: DataFrame, d: Def): DataFrame =
    graft.ext.Stats.qsketchHistOf(df, d.grpCols, d.valCol)

  /** Build + write the sketch table over an initial history. */
  def materializeFrom(df: DataFrame, d: Def): Def = {
    hist(df, d).write.mode("overwrite").parquet(d.mvPath)
    d
  }

  /** Fold an insert-only delta batch: bucket counts ADD — reads only
    * the delta and the domain-sized sketch table, never the base. */
  def refreshIncremental(spark: SparkSession, d: Def, delta: DataFrame,
                         newMvPath: String): Def = {
    val g = d.grpCols.map(col)
    spark.read.parquet(d.mvPath)
      .unionByName(hist(delta, d))
      .groupBy((g :+ col("id")): _*).agg(sum(col("cnt")).as("cnt"))
      .write.mode("overwrite").parquet(newMvPath)
    d.copy(mvPath = newMvPath)
  }

  /** CDC refresh — rows + `opCol` ∈ {+1, −1}, updates as
    * delete+insert: bucket counts are plain signed sums, so this is
    * the full retraction story sketches with monotone state (HLL)
    * cannot have. Fully-retracted buckets drop (a rebuilt histogram
    * has no zero-count rows either); a negative residue is the
    * caller's CDC-contract violation surfacing, not a merge
    * artifact. */
  /** The SIGNED histogram of one CDC batch — inserts add, deletes
    * subtract, intra-batch delete+insert pairs cancel exactly. */
  private def signedHist(cdc: DataFrame, d: Def, opCol: String): DataFrame =
    hist(cdc.filter(col(opCol) === 1), d)
      .unionByName(hist(cdc.filter(col(opCol) === -1), d)
        .withColumn("cnt", -col("cnt")))

  def refreshRetract(spark: SparkSession, d: Def, cdc: DataFrame,
                     opCol: String, newMvPath: String): Def = {
    val g = d.grpCols.map(col)
    spark.read.parquet(d.mvPath)
      .unionByName(signedHist(cdc, d, opCol))
      .groupBy((g :+ col("id")): _*).agg(sum(col("cnt")).as("cnt"))
      // zero-count REAL buckets drop (a rebuilt histogram has none);
      // the id = −1 cell sentinel is zero BY DESIGN and must survive
      .filter(col("cnt") =!= 0 || col("id") === -1L)
      .write.mode("overwrite").parquet(newMvPath)
    d.copy(mvPath = newMvPath)
  }

  /** Build + write + register-shape a sketch whose initial history IS
    * a CDC batch (the streaming maintainer's first micro-batch in CDC
    * mode): the batch's net signed histogram. */
  private[graft] def baseFromCdc(cdc: DataFrame, d: Def,
                                 opCol: String): Def = {
    val g = d.grpCols.map(col)
    signedHist(cdc, d, opCol)
      .groupBy((g :+ col("id")): _*).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0 || col("id") === -1L)
      .write.mode("overwrite").parquet(d.mvPath)
    d
  }

  /** Serve per-group quantile estimates at integer `percents` from
    * the sketch table — no fact access. */
  def serveQuantiles(spark: SparkSession, d: Def,
                     percents: Seq[Int]): DataFrame =
    graft.ext.Stats.qsketchServe(spark.read.parquet(d.mvPath),
      d.grpCols, percents)
}
