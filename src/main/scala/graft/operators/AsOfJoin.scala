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
}
