package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
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
  */
object Derived {

  private val memo = TrieMap[String, DataFrame]()

  /** The frame cached under `key`, building and materializing it on
    * first use. Keys must encode every input that changes the result
    * (callers include the sf dir). Queries run one at a time per
    * session, so the benign TrieMap race (two builders, one winner)
    * does not occur in practice and would only waste work, not
    * correctness.
    */
  def frame(key: String)(build: => DataFrame): DataFrame =
    memo.getOrElse(key, {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize now so every later reader hits cache
      memo.putIfAbsent(key, df) match {
        case Some(winner) => df.unpersist(); winner // lose the race cleanly
        case None => df
      }
    })

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
  def adopt(df: DataFrame): DataFrame = {
    memo.put(s"adopted:${df.queryExecution.analyzed.semanticHash()}", df)
    df
  }


  /** Unpersist and forget every registered frame. */
  def clear(): Unit = {
    memo.values.foreach(_.unpersist())
    memo.clear()
  }

  /** Registered keys (introspection / tests). */
  def keys: Set[String] = memo.keySet.toSet
}
