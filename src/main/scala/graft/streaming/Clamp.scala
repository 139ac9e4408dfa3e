package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shuffle-width clamp for bounded-domain streaming drains (the
  * CatalogLifecycle.withShuffleParts pattern): a complete-mode or
  * stateful aggregate over a ≤10-key group domain opens one state
  * store per shuffle partition per micro-batch, so a 4-batch drain at
  * the bench session's 32 partitions pays ~128 state-store
  * setups/commits for a handful of rows (RocksDB instances in the
  * transformWithState lane — measured ~60-80 s of task time for
  * sub-MB data). Fixing the stream's width at the group-domain scale
  * cuts that floor ~8x without touching semantics: the aggregate and
  * the per-batch admission counts the oracles pin are
  * partitioning-independent.
  */
private[streaming] object Clamp {

  /** The measured drain width for the ≤10-key bounded group domains
    * above — a LANE constant (the key domain is fixed by the lane
    * definitions, like the scripted catalog drivers' table sizes:
    * [[graft.io.CatalogLifecycle]] names the same choice
    * `ScriptedDriverParts`), NOT cluster tuning: production streams
    * through the sink keep the session width. Half the 8-10-key
    * domain keeps a couple of keys per state store; the r16 A/B
    * measured 4 as the knee (q346 3.8->2.1 s, q332 3.0->1.9 s).
    */
  val BoundedDrainParts = 4

  def withShuffleParts[T](spark: SparkSession, parts: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, parts.toString)
    try body finally spark.conf.set(key, prev)
  }
}
