package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT distinct-count maintenance via OR-mergeable bitmap words —
  * the third sketch-MV alongside [[HllMv]] (approximate distinct) and
  * [[QuantileMv]] (percentiles), and the only one that serves an
  * EXACT aggregate: per group cell the key domain is packed into
  * 64-bit words (`word = key >> 6`, `bit = key & 63` — arithmetic
  * shift and mask, so negative keys land correctly too), and the
  * per-cell word is the `bit_or` of the member keys' single-bit
  * values. OR is associative, commutative and IDEMPOTENT, so a
  * delta refresh folds the delta's own words into the table with one
  * more `bit_or` — reads only the delta and the domain-sized table,
  * never the base fact — and re-inserting an existing key is a no-op,
  * exactly `COUNT(DISTINCT)` semantics. Serving is
  * `sum(bit_count(bits))`: exact, so the DuckDB oracle is the plain
  * `COUNT(DISTINCT key)` over the fact — no deterministic-estimator
  * mirroring needed.
  *
  * Sizing is the stated scope line: the table holds at most
  * (key-range ÷ 64) words per cell, which is RIGHT when keys are
  * dense integers — surrogate keys minted by
  * [[graft.operators.GlobalIndex]] are exactly that — and wrong for
  * sparse 64-bit key spaces (a single key per word degenerates to a
  * distinct-key list ×64 overhead; those belong to [[HllMv]]). NULL
  * keys are skipped natively, matching `COUNT(DISTINCT)`.
  *
  * Deletes: OR is monotone, same as HLL's register MAX — a bit
  * cannot be cleared from the partial because OTHER rows of the cell
  * may still hold the key (the bitmap has no multiplicity). CDC
  * retraction therefore rides the same touched-cell re-derivation
  * gear as [[HllMv.refreshRetractRederive]] / MIN-MAX MVs: rebuild
  * the CDC-touched cells' words from the post-CDC base slice,
  * carry every untouched cell unread.
  */
object BitmapMv {

  /** A registered bitmap view: `mvPath` holds the group columns under
    * their ORIGINAL names plus (w, bits) — one table serves `GROUP BY`
    * on its exact column set and, by word-wise OR, on any SUBSET of
    * it. `sourcePath` (when declared) lets
    * [[graft.plans.MvRewrite.registerBitmap]] rewrite an exact
    * `COUNT(DISTINCT key)` aggregate over that source onto the bitmap
    * table instead of the fact. */
  final case class Def(grpCols: Seq[String], keyCol: String, mvPath: String,
                       sourcePath: Option[String] = None)

  /** (grpCols…, w, bits) words of one frame — the OR-mergeable
    * partial. The key MUST be integral: a DECIMAL/DOUBLE/STRING key
    * would silently truncate under the BIGINT cast (1.2 and 1.7 both
    * landing on bit 1) and serve a WRONG "exact" distinct count, so
    * non-integral keys are rejected here — at materialize/refresh
    * time, the registration path — rather than discovered as a wrong
    * answer.
    *
    * Cell-complete: a NULL key contributes a ZERO word (w = 0,
    * b = 0 — a no-op under OR and under `bit_count`) instead of
    * being filtered, so a cell whose keys are all NULL still writes
    * one row. That keeps the table's cell domain equal to its
    * source's group-by domain, which the serving rewrite's anchor
    * relies on ([[graft.plans.MvRewrite]] — an anchor missing the
    * cell would silently drop a row the direct `COUNT(DISTINCT)`
    * returns as 0). */
  private[graft] def words(df: DataFrame, d: Def): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(d.keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"BitmapMv key column `${d.keyCol}` must be integral " +
        s"(Byte/Short/Int/Long), got $dt — bit positions under a lossy " +
        "cast would collide and the served COUNT(DISTINCT) would be wrong")
    val g = d.grpCols.map(col)
    df.select(g ++ Seq(
        expr(s"coalesce(shiftright(CAST(`${d.keyCol}` AS BIGINT), 6), " +
          "CAST(0 AS BIGINT))").as("w"),
        expr(s"coalesce(shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(CAST(`${d.keyCol}` AS BIGINT) & 63 AS INT)), " +
          "CAST(0 AS BIGINT))").as("b")): _*)
      .groupBy((g :+ col("w")): _*)
      .agg(expr("bit_or(b)").as("bits"))
  }

  /** Build + write the bitmap table over an initial history. */
  def materializeFrom(df: DataFrame, d: Def): Def = {
    words(df, d).write.mode("overwrite").parquet(d.mvPath)
    d
  }

  /** Fold an insert-only delta batch: word-wise OR of the current
    * table with the delta's own words — reads ONLY the delta and the
    * domain-sized table, never the base fact. */
  def refreshIncremental(spark: SparkSession, d: Def, delta: DataFrame,
                         newMvPath: String): Def = {
    val g = d.grpCols.map(col)
    spark.read.parquet(d.mvPath)
      .unionByName(words(delta, d))
      .groupBy((g :+ col("w")): _*).agg(expr("bit_or(bits)").as("bits"))
      .write.mode("overwrite").parquet(newMvPath)
    d.copy(mvPath = newMvPath)
  }

  /** CDC refresh — the touched-cell re-derivation gear
    * ([[graft.plans.MvRewrite.refreshRetractRederive]]'s contract
    * verbatim): the base at `sourcePath` must already reflect the CDC
    * batch; touched cells rebuild their words exactly from the base
    * slice (literal null-safe cell predicate pushed into the scan
    * below `cellLiteralMax` cells, a distributed left-semi above),
    * untouched cells keep their word rows unread. At 100 TB a
    * touched-cells-sized read, never a fact-sized one. */
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
        untouched.unionByName(words(slice, d))
      }
    next.write.mode("overwrite").parquet(newMvPath)
    d.copy(mvPath = newMvPath)
  }

  /** Serve per-group EXACT distinct counts from the bitmap table —
    * `sum(bit_count(bits))`, no fact access. */
  def serveDistinct(spark: SparkSession, d: Def): DataFrame = {
    val t = spark.read.parquet(d.mvPath)
    t.groupBy(d.grpCols.map(t(_)): _*)
      .agg(expr("sum(bit_count(bits))").as("dct"))
  }
}
