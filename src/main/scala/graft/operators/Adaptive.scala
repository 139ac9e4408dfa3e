package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive partition widths (guide §2: derive the width from
  * input size, never a constant tuned for one cluster) — the
  * [[GlobalIndex]] rule shared by every operator that pins an
  * explicit keyed layout: Catalyst's plan-size estimate divided by
  * the session's AQE advisory partition size, clamped to
  * [1, numShufflePartitions].
  *
  * An explicit `repartition(key)` at the session default defeats
  * AQE's coalescing — the long-lived cached graph frames were pinned
  * at 32 partitions of a few hundred KB each, so every iteration
  * round of every consumer paid ~32 map tasks for single-digit-MB
  * data. Sizing the pinned layout like AQE would (advisory bytes per
  * partition) removes that fixed tax at bench scale while a 100 TB
  * input saturates the clamp and behaves exactly as before. Unknown
  * estimates (Long.MaxValue defaults, un-analyzed joins) also
  * saturate the clamp — the fallback is the old behavior, never
  * under-parallelism.
  *
  * The ESTIMATE side matters: derived edge frames (join → distinct →
  * explode) carry multiplicative join estimates that always saturate
  * the clamp, so callers pass an `anchor` frame whose estimate is
  * trustworthy — a bare column-pruned scan (file bytes) or an
  * already-cached Derived frame (measured block-manager bytes).
  */
object Adaptive {

  /** Width for `df` by its own optimized-plan estimate. */
  def parts(df: DataFrame): Int = {
    val spark = df.sparkSession
    val cap = spark.sessionState.conf.numShufflePartitions
    val advisory = spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (bytes / BigInt(advisory.max(1L))) + 1
    want.min(BigInt(cap)).max(BigInt(1)).toInt
  }

  /** `df.repartition(width, cols…)` with the width taken from
    * `anchor`'s estimate (see class doc for why the anchor is a
    * separate frame), floored at 4: these pinned layouts feed
    * ITERATIVE consumers whose per-round work (degree aggregates,
    * peel semi-joins) runs in place on the pinned width — a byte-pure
    * width of 1 serialized each round (measured: q172's peel wall
    * rose ~25% at width 1-2 while its task time fell 20x). Four
    * partitions keep intra-round parallelism at 1/8 the old session
    * default; GlobalIndex keeps its own un-floored [[parts]] (its
    * n == 1 case deliberately collapses to skip the offsets pass). */
  def byKey(anchor: DataFrame)(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(parts(anchor).max(4).min(
      df.sparkSession.sessionState.conf.numShufflePartitions), cols: _*)
}
