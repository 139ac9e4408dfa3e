package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming LSH near-dup: candidate pairs found across micro-batch
  * boundaries must equal the batch band join over the union of all
  * arrivals — the cross-batch pairs come from engine-managed state,
  * not from re-scanning history.
  */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  // planted near-dups: each base doc (disjoint 25-token vocab) has a
  // one-token-edited copy; batches are split so every (base, copy)
  // pair straddles the batch boundary
  private def base(i: Int) = (0 until 25).map(k => s"w${i}_$k")
  private val originals = (0 until 4).map(i => (i.toLong, base(i).mkString(" ")))
  private val copies = (0 until 4).map { i =>
    (100L + i, base(i).updated(5, "swapped").mkString(" "))
  }

  test("cross-batch candidate pairs equal the batch band join on the union") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = graft.streaming.DocStream.nearDupPairs(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      input.addData(originals)
      query.processAllAvailable()
      input.addData(copies) // every near-dup pair straddles the boundary
      query.processAllAvailable()
      val streamed = spark.table("neardup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val all = (originals ++ copies).toDF("doc_id", "text")
      val batch = graft.ext.Dedup.candidatePairs(graft.ext.Dedup.hashSetsOf(all))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(streamed == batch)
      // and the planted pairs really are among them (state crossed batches)
      val planted = (0 until 4).map(i => (i.toLong, 100L + i)).toSet
      assert(planted.subsetOf(streamed))
    } finally query.stop()
  }

  test("contractGate: totals accumulate across batches and equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val query = graft.streaming.DocStream.contractGate(
        input.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.format("memory").queryName("contract_out")
      .outputMode("complete").start()
    try {
      // violations split across batches: the empty text arrives in
      // batch 1, the n_chars lie and the reserved | in batch 2
      val b1 = Seq((1L, "abc", 3L), (2L, "", 0L))
      val b2 = Seq((3L, "abcd", 99L), (4L, "a|b", 3L))
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      val got = spark.table("contract_out").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == Map(
        "nonempty_text" -> ((4L, 1L)),
        "chars_match" -> ((4L, 1L)),
        "no_reserved_delim" -> ((4L, 1L))), s"got $got")
      // batch twin on the union: identical by construction
      val batch = graft.streaming.DocStream.contractGate(
          (b1 ++ b2).toDF("doc_id", "text", "n_chars")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(batch == got, "stream-after-2-batches == batch-on-union")
    } finally query.stop()
  }

  test("dedup-horizon mode (processing-time timeout) finds the same pairs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // a generous horizon: state must survive across these micro-batches,
    // exercising the ProcessingTimeTimeout wiring (setTimeoutDuration +
    // hasTimedOut handling) without racing the test clock.
    // NOTE: with a processing-time timeout the engine keeps scheduling
    // timeout-check batches, so processAllAvailable never settles —
    // poll the sink with a deadline instead.
    val query = graft.streaming.DocStream.nearDupPairs(
        input.toDF().toDF("doc_id", "text"),
        dedupHorizon = Some(java.time.Duration.ofHours(1)))
      .writeStream.format("memory").queryName("neardup_horizon_out")
      .outputMode("append").start()
    try {
      input.addData(originals)
      input.addData(copies)
      val planted = (0 until 4).map(i => (i.toLong, 100L + i)).toSet
      def streamed() = spark.table("neardup_horizon_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val deadline = System.currentTimeMillis() + 120000
      while (!planted.subsetOf(streamed()) &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(planted.subsetOf(streamed()))
    } finally query.stop()
  }

  /** Streaming MG candidates + a batch recount of every token EVER
    * emitted as a candidate must recover the exact heavy-hitter set —
    * the lambda shape where q135's phase 2 settles the stream's
    * bounded-state phase 1. Splitting the heavy token's arrivals
    * across batches proves the counter state carries over.
    */
  test("streaming heavy-hitter candidates + batch recount == exact heavy set") {
    implicit val sqlCtx = spark.sqlContext
    // 'zipf' ×200 split across two batches + 300 singleton fillers:
    // total 500, ratio 8 → threshold 62.5 → exactly {zipf}. k=8 with
    // 301 distinct tokens forces decrement rounds in-stream.
    val heavy = Seq.fill(100)("zipf")
    val fill1 = (0 until 150).map(i => s"u$i")
    val fill2 = (150 until 300).map(i => s"u$i")
    val input = MemoryStream[String]
    val query = graft.streaming.DocStream.heavyHitterCandidates(
        input.toDS(), buckets = 4, k = 8)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      input.addData(heavy ++ fill1)
      query.processAllAvailable()
      input.addData(heavy ++ fill2)
      query.processAllAvailable()
      val candidates = spark.table("hh_out")
        .select($"token").distinct().as[String].collect().toSet
      assert(candidates.contains("zipf"), "the heavy token must survive MG state")

      // batch recount (q135 phase 2) over ever-candidates, exact filter
      val all = (heavy ++ fill1 ++ heavy ++ fill2).toDF("token")
      val n = all.count()
      val exact = all.groupBy($"token").count()
        .filter($"count" * 8 >= n)
        .as[(String, Long)].collect().toMap
      val recount = all
        .join(candidates.toSeq.toDF("token"), "token")
        .groupBy($"token").count()
        .filter($"count" * 8 >= n)
        .as[(String, Long)].collect().toMap
      assert(recount == exact, s"recount $recount != exact $exact")
      assert(exact == Map("zipf" -> 200L))
    } finally query.stop()
  }
}
