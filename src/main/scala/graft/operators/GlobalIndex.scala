package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed global row numbering — dense 1-based sequence in a
  * total order WITHOUT `Window.orderBy(...)`'s single-reducer funnel
  * (a global window declares one partition: every row of a 100 TB
  * table would stream through one task). This is the scale path for
  * surrogate-key assignment that the reference hands to PostgreSQL
  * SERIAL columns (`/root/reference/schema.sql:54,75,96`; driver
  * read-back `etl_pipeline_spark.py:874-882`) and the general form of
  * the dimension-sized `row_number` windows
  * [[graft.ingest.StarBuilder]] documents as its 100 TB alternative.
  *
  * Mechanics (the two-pass prefix-offset scheme, RDD
  * `zipWithIndex`'s plan re-expressed in DataFrame operators so
  * codegen and column pruning survive):
  *  1. range-repartition + in-partition sort on the order columns —
  *     partition i holds keys ≤ partition i+1's;
  *  2. persist, then count rows per partition (a #partitions-row
  *     aggregate);
  *  3. exclusive prefix sums of those counts become per-partition
  *     offsets — a #partitions-row window, broadcast back;
  *  4. seq = offset + row_number within the partition (parallel:
  *     the window partitions by partition id).
  *
  * The persist between passes is CORRECTNESS, not caching:
  * `repartitionByRange` picks boundaries by sampling, and letting the
  * count job and the numbering job each re-plan the sample could
  * hand them different boundaries — offsets from one layout applied
  * to another. Pinning the partitioned frame makes both passes read
  * the same layout. The result is layout-independent as long as the
  * order is TOTAL (callers must include a unique tie-break column,
  * same contract as every deterministic window in this engine).
  */
object GlobalIndex {

  /** Scale-adaptive default partition count (guide §2: derive the
    * width from input size, never a constant tuned for one cluster):
    * Catalyst's plan-size estimate divided by the session's AQE
    * advisory partition size, clamped to [1, numShufflePartitions].
    * A tiny input range-partitions into ONE partition — skipping the
    * RangePartitioner's boundary sampling pass and the 32-way
    * scatter that cost every ranking lane a fixed multi-task tax at
    * bench scale — while a 100 TB input saturates the clamp and
    * behaves exactly as before (numShufflePartitions). Unknown
    * estimates (Long.MaxValue defaults) also saturate the clamp, so
    * the fallback is the old behavior, never under-parallelism.
    * Partition count never changes results: the order is total
    * (caller contract), so the numbering is layout-independent
    * (GlobalIndexSpec pins invariance across parts). */
  private def adaptiveParts(df: DataFrame): Int = Adaptive.parts(df)

  /** `df` plus a dense 1-based `seqCol` in `order`-order. */
  def withRowNumber(df: DataFrame, order: Seq[Column], seqCol: String,
                    parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (parts > 0) parts else adaptiveParts(df)
    val ranged = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    graft.Derived.adopt(ranged)
    val rn = row_number().over(
      Window.partitionBy($"__pid").orderBy(order: _*))
    if (n == 1)
      // single partition ⇒ every offset is 0: the numbering IS the
      // in-partition row_number, so the offsets aggregate and its
      // broadcast-join jobs are pure overhead — skip them (same
      // values, same schema; GlobalIndexSpec pins parts-invariance)
      ranged.withColumn(seqCol, rn.cast("long")).drop("__pid")
    else {
      val totals = ranged.groupBy($"__pid").agg(count(lit(1)).as("__n"))
      val offsets = exclusivePrefix(totals, Seq("__n" -> "__offset"))
      ranged.join(broadcast(offsets), "__pid")
        .withColumn(seqCol, $"__offset" + rn)
        .drop("__pid", "__offset")
    }
  }

  /** Exclusive prefix sums over the per-partition totals frame —
    * offset(p) = Σ_{q < p} total(q) — WITHOUT a global window: the
    * frame is #partitions rows (bounded by the session's
    * shuffle-partition conf, never by data), so the prefix is a tiny
    * triangular self-join. An unpartitioned `sum().over(orderBy)`
    * here was semantically fine at this row count but still tripped
    * WindowExec's data-sized-funnel warning on every GlobalIndex
    * consumer (and a constant partition key is folded away by the
    * optimizer); the join states the bounded shape outright. */
  private def exclusivePrefix(totals: DataFrame,
                              cols: Seq[(String, String)]): DataFrame = {
    import totals.sparkSession.implicits._
    val lower = totals.toDF(
      "__qid" +: cols.map { case (t, _) => s"__t_$t" }: _*)
    val aggs = cols.map { case (t, o) =>
      coalesce(sum(col(s"__t_$t")), lit(0L)).as(o) }
    totals.select($"__pid")
      .join(broadcast(lower), $"__qid" < $"__pid", "left")
      .groupBy($"__pid")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** `df` plus the INCLUSIVE prefix sum of `valueCol` in
    * `order`-order — the weighted generalization of [[withRowNumber]]
    * (same two-pass prefix-offset scheme, summing values instead of
    * counting rows), and the scale path for every "running total in a
    * total order" a global `sum().over(Window.orderBy)` would funnel
    * through one reducer. Same contracts: the order must be total,
    * and the persist pins one sampled range layout for both passes. */
  def withPrefixSum(df: DataFrame, order: Seq[Column], valueCol: String,
                    cumCol: String, parts: Int = 0): DataFrame =
    withPrefixSums(df, order, Seq(valueCol -> cumCol), parts)

  /** [[withPrefixSum]] over SEVERAL value columns in one pass — one
    * range layout, one persist, one offsets aggregate carrying every
    * column's per-partition total (a row-numbering rides along as the
    * prefix sum of a constant-1 column). Callers needing both an
    * ordinal and a running total no longer pay two range exchanges. */
  def withPrefixSums(df: DataFrame, order: Seq[Column],
                     cols: Seq[(String, String)],
                     parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (parts > 0) parts else adaptiveParts(df)
    val ranged = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    graft.Derived.adopt(ranged)
    def running(valueCol: String) = sum(col(valueCol)).over(
      Window.partitionBy($"__pid").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, 0))
    if (n == 1)
      // single partition ⇒ offset 0: the running sum IS the prefix
      // sum — skip the offsets aggregate and its broadcast-join jobs
      // (identical values and result type: sum's type is the same in
      // both expressions and Add(x, 0) preserves it)
      cols.foldLeft(ranged) { case (acc, (v, c)) =>
        acc.withColumn(c, running(v))
      }.drop("__pid")
    else {
      val totals = ranged.groupBy($"__pid")
        .agg(cols.map { case (v, _) => sum(col(v)).as(s"__s_$v") }.head,
          cols.drop(1).map { case (v, _) => sum(col(v)).as(s"__s_$v") }: _*)
      val offsets = exclusivePrefix(totals,
        cols.map { case (v, c) => s"__s_$v" -> s"__off_$c" })
      cols.foldLeft(ranged.join(broadcast(offsets), "__pid")) {
        case (acc, (v, c)) => acc.withColumn(c, col(s"__off_$c") + running(v))
      }.drop("__pid" +: cols.map { case (_, c) => s"__off_$c" }: _*)
    }
  }
}
