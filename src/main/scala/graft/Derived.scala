package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of shared derived frames — the engine's
  * answer to "several queries re-derive the same expensive
  * intermediate" (the LSH candidate-pair graph feeds q27, q54, q85;
  * the verified hyperplane pairs feed q57 and q88). First use
  * materializes the frame into the block-manager cache; subsequent
  * uses — in the SAME session, across different queries — read the
  * cache instead of re-running the lineage. This is a deliberate,
  * owned lifecycle (unlike an anonymous `.persist()` buried in a
  * lazily-returned frame, which nothing could ever unpersist):
  * [[clear]] releases everything, and the harness mains call it on
  * shutdown.
  *
  * At 100 TB the same role is played by materialized intermediate
  * tables between pipeline stages; MEMORY_AND_DISK spills rather
  * than OOMs when a cached intermediate outgrows executor memory.
  *
  * Memory governance for LONG-LIVED sessions: a service session
  * iterating many sf dirs accumulates per-dir edge/label/pair frames
  * without bound. The registry therefore holds a byte budget
  * ([[budgetBytes]], default unbounded — batch mains clear() at exit)
  * and evicts least-recently-used entries once the MEASURED cached
  * footprint (block-manager bytes via [[Bridge.cachedBytes]], memory
  * + disk, never an optimizer estimate) exceeds it. Eviction
  * unpersists and forgets; a later request simply rebuilds — the
  * registry is a cache, correctness never depends on residency.
  */
object Derived {

  private final case class Entry(df: DataFrame, bytes: Long, var tick: Long)

  private val memo = scala.collection.mutable.LinkedHashMap[String, Entry]()
  private var clock = 0L

  /** Registry byte budget. `Long.MaxValue` disables eviction (the
    * bare default — short batch mains [[clear]] on shutdown);
    * long-lived entry points (the bench loop, the streaming
    * maintainers, a REPL) call [[ensureBudget]] for a measured one. */
  @volatile var budgetBytes: Long = Long.MaxValue

  /** Set a MEASURED default budget if none has been set yet: half of
    * Spark's unified memory region (`spark.memory.fraction` × the
    * heap beyond the 300 MB reserve — the same formula
    * UnifiedMemoryManager uses), leaving the other half for shuffle
    * and execution. Idempotent and non-overriding: an explicit
    * `budgetBytes` assignment (specs force tiny budgets) wins. In
    * local mode driver and executor share one heap, so
    * `Runtime.maxMemory` IS the executor heap; on a cluster each
    * executor JVM computes the same formula over its own heap. */
  def ensureBudget(spark: org.apache.spark.sql.SparkSession): Long = {
    if (budgetBytes == Long.MaxValue) {
      val frac = spark.conf.get("spark.memory.fraction", "0.6").toDouble
      val usable = (Runtime.getRuntime.maxMemory - (300L << 20)).max(1L << 28)
      budgetBytes = (usable * frac * 0.5).toLong
    }
    budgetBytes
  }

  /** The frame cached under `key`, building and materializing it on
    * first use. Keys must encode every input that changes the result
    * (callers include the sf dir and any plan-shaping flags, e.g. the
    * measured broadcast-gate decision). Queries run one at a time per
    * session; all registry mutation is synchronized so concurrent
    * spec suites cannot corrupt the LRU order.
    */
  def frame(key: String)(build: => DataFrame): DataFrame = {
    memo.synchronized {
      memo.get(key).map { e => clock += 1; e.tick = clock; e.df }
    } match {
      case Some(df) => df
      case None =>
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize now so every later reader hits cache
        memo.synchronized {
          memo.get(key) match {
            case Some(winner) => df.unpersist(); winner.df // lose the race cleanly
            case None =>
              clock += 1
              memo.put(key, Entry(df, Bridge.cachedBytes(df), clock))
              evictOverBudget()
              df
          }
        }
    }
  }

  /** Take ownership of an ALREADY-persisted frame so [[clear]] can
    * release it — for operators whose iteration loops must leave
    * their final frame cached (re-evaluating the returned lineage
    * would otherwise re-run the whole loop).
    *
    * Keyed by the frame's ANALYZED-PLAN semantic hash — a faithful
    * proxy for (query, input dir), since the scan paths and every
    * operator above them participate in the hash while exprIds are
    * normalized out. A repeat invocation of the same query over the
    * same data therefore lands on the SAME slot, and adopt
    * unpersists-and-replaces the previous holder instead of
    * accumulating one cached copy per invocation (a 3-pass bench
    * used to hold 3 registry entries per loop-final frame until the
    * end-of-run [[clear]]).
    *
    * Replacing the reference IS the whole cleanup: same key ⇒ same
    * canonical plan ⇒ Spark's CacheManager already shares ONE cache
    * entry between the old and new frame (persist on an
    * already-cached plan is a no-op), so no storage accumulated —
    * and explicitly unpersisting the old holder would evict the very
    * entry the new frame relies on.
    */
  def adopt(df: DataFrame): DataFrame = memo.synchronized {
    clock += 1
    memo.put(s"adopted:${df.queryExecution.analyzed.semanticHash()}",
      Entry(df, Bridge.cachedBytes(df), clock))
    evictOverBudget()
    df
  }

  /** Unpersist-and-forget least-recently-used entries until the
    * measured total fits [[budgetBytes]]. The most-recent entry (the
    * one just inserted) always survives — a budget smaller than one
    * frame must not evict the frame its own caller is about to read.
    * Callers hold the memo lock.
    */
  private def evictOverBudget(): Unit = {
    val budget = budgetBytes
    var total = memo.valuesIterator.map(_.bytes).sum
    if (total <= budget) return
    val newest = memo.maxBy(_._2.tick)._1
    memo.toSeq.sortBy(_._2.tick).foreach { case (key, e) =>
      if (total > budget && key != newest) {
        e.df.unpersist()
        memo.remove(key)
        total -= e.bytes
      }
    }
  }

  private val scalars = scala.collection.mutable.HashMap[String, Long]()

  /** Session-memoized measured quantity — the broadcast-gate counts
    * ([[graft.ext.Dedup.BroadcastShingleMaxEntries]] and friends)
    * each cost a Spark job per invocation; under the bench's repeated
    * passes that job re-ran per pass per gate. Same key discipline as
    * [[frame]]: the key must encode every input that changes the
    * measurement (the sf dir; NOT the budget — callers memoize the
    * COUNT and re-apply their threshold, so a spec forcing a tiny
    * budget still exercises the fallback path against the cached
    * measurement).
    */
  def scalar(key: String)(build: => Long): Long =
    scalars.synchronized(scalars.get(key)) match {
      case Some(v) => v
      case None =>
        val v = build
        scalars.synchronized(scalars.getOrElseUpdate(key, v))
    }

  /** Unpersist and forget every registered frame. */
  def clear(): Unit = memo.synchronized {
    memo.values.foreach(_.df.unpersist())
    memo.clear()
    scalars.synchronized(scalars.clear())
  }

  /** Registered keys (introspection / tests). */
  def keys: Set[String] = memo.synchronized(memo.keySet.toSet)

  /** Measured cached bytes currently held (introspection / tests). */
  def heldBytes: Long = memo.synchronized(memo.valuesIterator.map(_.bytes).sum)
}
