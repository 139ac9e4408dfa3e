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

  final case class TokenArrival(bucket: Int, token: String)
  final case class HeavyCandidate(bucket: Int, token: String, lower_bound: Long)

  /** Streaming heavy-hitter candidates — the streaming member of the
    * frequency family ([[graft.ext.Corpus.heavyHitters]]): tokens hash
    * into `buckets` state groups, each holding a Misra–Gries map of at
    * most `k` counters, and every micro-batch emits the bucket's
    * current candidate set (Update mode). Because partitioning is BY
    * TOKEN, each token's entire stream folds into one MG map, so the
    * batch superset guarantee carries over: any token whose stream
    * count exceeds bucketTotal/(k+1) is present in its bucket's
    * candidates from its qualifying batch onward. State is bounded at
    * buckets·k counters for the life of the query — the
    * lambda-architecture shape where the stream tracks candidates and
    * a periodic batch recount (exactly q135's phase 2) settles exact
    * counts.
    */
  /** Streaming data-contract gate — the admission-time member of the
    * audit family ([[graft.ext.Stats.contractAudit]] is the offline
    * batch sweep): running (checked, violated) totals per row-local
    * rule over an arriving document stream. The SAME rule frame
    * drives both modes — on a streaming input the groupBy becomes an
    * engine-managed stateful aggregation (Complete mode) whose totals
    * accumulate across micro-batches, so stream-after-N-batches ≡
    * batch-on-the-union BY CONSTRUCTION, and the spec proves the
    * state actually carries (violations planted in different batches
    * land in one total).
    *
    * State is one (count, sum) pair per RULE — O(#rules), the
    * smallest state shape streaming offers; at any volume the gate's
    * memory is constant.
    */
  def contractGate(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val rules = docs.select(explode(array(
      struct(lit("nonempty_text").as("rule"),
        when($"text" === "", 1L).otherwise(0L).as("violated")),
      struct(lit("chars_match").as("rule"),
        when($"n_chars" =!= length($"text"), 1L).otherwise(0L)
          .as("violated")),
      struct(lit("no_reserved_delim").as("rule"),
        when($"text".contains("|"), 1L).otherwise(0L).as("violated"))))
      .as("r"))
    rules.select($"r.rule".as("rule"), $"r.violated".as("violated"))
      .groupBy($"rule")
      .agg(count(lit(1)).as("n_checked"), sum($"violated").as("n_violations"))
  }

  def heavyHitterCandidates(tokens: Dataset[String], buckets: Int = 16,
                            k: Int = 64): Dataset[HeavyCandidate] = {
    import tokens.sparkSession.implicits._
    tokens
      .map(t => TokenArrival(math.floorMod(t.hashCode, buckets), t))
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(foldMisraGries(k))
  }

  private def foldMisraGries(k: Int)(
      bucket: Int, rows: Iterator[TokenArrival],
      state: GroupState[Map[String, Long]]): Iterator[HeavyCandidate] = {
    val m = scala.collection.mutable.HashMap[String, Long]()
    state.getOption.foreach(m ++= _)
    rows.foreach { r =>
      m.get(r.token) match {
        case Some(c) => m(r.token) = c + 1
        case None if m.size < k => m(r.token) = 1L
        case None =>
          // decrement-all round (one unit off every counter plus the
          // unmatched arrival), dropping exhausted counters
          val dead = scala.collection.mutable.ListBuffer[String]()
          m.foreach { case (t, c) =>
            if (c == 1L) dead += t else m(t) = c - 1
          }
          dead.foreach(m.remove)
      }
    }
    state.update(m.toMap)
    m.toSeq.sortBy(_._1)
      .map { case (t, c) => HeavyCandidate(bucket, t, c) }.iterator
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
