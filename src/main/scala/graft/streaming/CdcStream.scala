package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply — the streaming twin of
  * [[graft.operators.Upsert]]: keyed state holds the current winner
  * (highest-sequence update) per merge key; each micro-batch folds its
  * arrivals into that state and emits the key's current value. The
  * emitted changelog, materialized latest-wins, equals the batch
  * `Upsert.latestWins` collapse over the full feed regardless of how
  * updates split across batches or arrive out of order — CdcStreamSpec
  * proves the twin property.
  *
  * Scale notes: state is one (seq, value) per key — the minimum any
  * latest-wins apply can hold — and the fold is by max(seq), so
  * at-least-once redelivery and intra-batch disorder are absorbed.
  * A serving-side sink applies the changelog as idempotent point
  * upserts keyed by (k, seq).
  */
object CdcStream {

  final case class Update(k: Long, seq: Long, v: Double)
  final case class Current(k: Long, seq: Long, v: Double)

  /** Current winner per key after each micro-batch that touches it
    * (Update output mode). */
  def latestState(updates: Dataset[Update]): Dataset[Current] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
  }

  private def fold(k: Long, arrivals: Iterator[Update],
                   state: GroupState[Current]): Current = {
    val best = arrivals.foldLeft(state.getOption) { (acc, u) =>
      acc match {
        case Some(c) if c.seq >= u.seq => acc // stale or redelivered
        case _ => Some(Current(k, u.seq, u.v))
      }
    }.get // the group has ≥1 arrival or existing state by construction
    state.update(best)
    best
  }

  /** Output mode the changelog query must run with. */
  val Mode: OutputMode = OutputMode.Update()
}
