package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-dup detection at ingest time — the streaming member
  * of the dedup family ([[graft.ext.Dedup]]): as documents arrive,
  * compute the same MinHash band keys the batch LSH join uses, group
  * by band key, and hold per-band state of previously seen doc ids;
  * each arriving document emits a candidate pair against every earlier
  * document that shared one of its bands. Cross-micro-batch pairs fall
  * out of the engine-managed state — the property a batch job can only
  * get by re-scanning history.
  *
  * Scale notes: state per band key is the id list of docs that hashed
  * there — tiny by LSH construction (bands exist to keep collisions
  * rare); a production deployment bounds it further by passing a
  * `dedupHorizon`, which switches the query to
  * `GroupStateTimeout.ProcessingTimeTimeout` and drops a band's state
  * once no member has arrived within the horizon — without it, state
  * grows for the life of the query. Pairs may be emitted once per
  * shared band; consumers dedup downstream exactly like the batch
  * path's `distinct()`.
  */
object DocStream {

  final case class BandedDoc(doc_id: Long, band_idx: Int, band_key: String)
  final case class CandidatePair(a_id: Long, b_id: Long)

  /** Band rows for a (doc_id, text) frame — identical banding to the
    * batch candidate join (narrow ops, streaming-safe). */
  def bandedDocs(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    graft.ext.Dedup.bandedKeys(graft.ext.Dedup.hashSetsOf(docs))
      .as[BandedDoc]
  }

  /** Candidate pairs across the whole stream so far: per-band state of
    * seen ids, new arrivals pair against all prior members. With a
    * `dedupHorizon`, a band whose members all stopped arriving that
    * long ago is evicted (processing-time timeout) — docs older than
    * the horizon no longer pair, which is the bounded-state contract a
    * long-running production dedup needs.
    */
  def nearDupPairs(docs: DataFrame,
                   dedupHorizon: Option[java.time.Duration] = None): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val timeout =
      if (dedupHorizon.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val horizonMs = dedupHorizon.map(_.toMillis)
    bandedDocs(docs)
      .groupByKey(d => (d.band_idx, d.band_key))
      .flatMapGroupsWithState(
        OutputMode.Append, timeout)(emitPairs(horizonMs))
  }

  private def emitPairs(horizonMs: Option[Long])(
      key: (Int, String), docs: Iterator[BandedDoc],
      state: GroupState[List[Long]]): Iterator[CandidatePair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val seen = state.getOption.getOrElse(Nil)
    // deterministic within a micro-batch regardless of arrival order;
    // ids already in state are redeliveries (at-least-once source) —
    // they must neither re-enter state nor re-emit their pairs
    val seenSet = scala.collection.mutable.HashSet[Long](seen: _*)
    val arrivals = docs.map(_.doc_id).toSeq.distinct.sorted
      .filterNot(seenSet.contains)
    val out = scala.collection.mutable.ListBuffer[CandidatePair]()
    var members = seen
    arrivals.foreach { id =>
      members.foreach { m =>
        out += CandidatePair(math.min(m, id), math.max(m, id))
      }
      members = id :: members
    }
    state.update(members)
    // re-arm on every batch that touches the band: the horizon is
    // "since last arrival", so an active band never expires
    horizonMs.foreach(state.setTimeoutDuration)
    out.iterator
  }
}
