package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-dimension generator — reference parity for
  * `/root/reference/etl_pipeline_spark.py:757-811` (S4 + F6-F10).
  *
  * A `sequence()` literal exploded into one row per day, then calendar
  * derivations. Catalyst constant-folds the sequence, so the "scan" is a
  * generated local relation — no input I/O at any scale. For very long
  * ranges `explode` of one giant array on a single task would bottleneck;
  * `repartition` after explode (or `spark.range(nDays)` + `date_add`)
  * keeps it parallel — we use the range form for exactly that reason.
  *
  * Fixes the reference's weekday bug (SURVEY.md F9): its `dayofweek - 2`
  * maps Sunday to -1, violating its own CHECK constraint
  * (`schema.sql:35`). Here `day_of_week = (dayofweek + 5) % 7`, i.e.
  * 0=Monday … 6=Sunday, matching the documented intent
  * (`schema.sql:47`).
  */
object DateDim {
  val DefaultStart = "1998-10-01"
  val DefaultEnd = "2005-12-31"

  /** Build the dimension for [start, end] inclusive. */
  def build(spark: SparkSession, start: String = DefaultStart,
            end: String = DefaultEnd): DataFrame = {
    import spark.implicits._
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(start), java.time.LocalDate.parse(end)) + 1
    // spark.range parallelizes the generation across tasks (vs. a single
    // exploded array living on one task).
    spark.range(nDays)
      .select(date_add(lit(start).cast("date"), $"id".cast("int")).as("d"))
      .select(
        date_format($"d", "yyyyMMdd").cast("int").as("date_key"),
        $"d".as("date_actual"),
        year($"d").cast("int").as("year"),
        month($"d").cast("int").as("month"),
        dayofmonth($"d").cast("int").as("day"),
        quarter($"d").cast("int").as("quarter"),
        ((dayofweek($"d") + lit(5)) % 7).cast("int").as("day_of_week"),
        date_format($"d", "MMMM").as("month_name"),
        (dayofweek($"d") === 1 || dayofweek($"d") === 7).as("is_weekend"))
      .orderBy($"date_key")
  }
}
