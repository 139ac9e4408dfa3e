package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming specs: each streaming operator is checked against its
  * batch twin (the batch forms are DuckDB-oracle-verified), and the
  * file-source ingestion is checked for exactly-once resume across a
  * stop/restart — the guarantee the reference's ProgressTracker
  * hand-rolls.
  */
final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                    event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def sampleEvents: Seq[Ev] = {
    graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Ev].collect().toSeq
  }

  test("streaming windowedCounts == batch result on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc_out")
      .outputMode("complete").start()
    try {
      input.addData(sampleEvents)
      query.processAllAvailable()
      val streamed = spark.table("wc_out")
        .orderBy("win_start_us", "event_type").collect()
      val batch = EventStream.windowedCounts(sampleEvents.toDF())
        .orderBy("win_start_us", "event_type").collect()
      assert(streamed.length == batch.length && streamed.sameElements(batch))
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("session_window twin matches the lag-gap sessionizer") {
    val builtIn = EventStream.sessionWindows(graft.sources.Tables.events(spark, sfDir))
      .orderBy("user_id", "start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lagGap = graft.ext.Events.sessionize(spark, sfDir)
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .orderBy("user_id", "start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(builtIn.nonEmpty && builtIn.toSeq == lagGap.toSeq)
  }

  test("streaming aggregate state == incremental batch merge == one-shot agg") {
    import graft.operators.IncrementalAgg
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // the streaming form of IncrementalAgg's state table: same
    // algebraic partials, maintained by the engine across micro-batches
    val query = input.toDF()
      .groupBy($"event_type")
      .agg(sum($"value".cast("decimal(18,2)")).as("psum"),
        count(lit(1)).as("pcnt"))
      .writeStream.format("memory").queryName("inc_state")
      .outputMode("complete").start()
    try {
      val (b1, b2) = sampleEvents.splitAt(sampleEvents.length / 2)
      input.addData(b1)
      query.processAllAvailable()
      input.addData(b2) // second micro-batch folds into existing state
      query.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) =
        IncrementalAgg.finalize(df, "event_type")
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      val streamed = rows(spark.table("inc_state"))
      val merged = rows(IncrementalAgg.merge(
        IncrementalAgg.partialState(b1.toDF(), "event_type", "value"),
        IncrementalAgg.partialState(b2.toDF(), "event_type", "value"),
        "event_type"))
      val oneShot = rows(IncrementalAgg.partialState(
        sampleEvents.toDF(), "event_type", "value"))
      assert(streamed.nonEmpty)
      assert(streamed == merged && merged == oneShot)
    } finally query.stop()
  }

  test("stream-stream view-click join == batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val query = EventStream.viewClickJoin(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("vc_join")
      .outputMode("append").start()
    try {
      val evs = sampleEvents
      val (vs, cs) = (evs.filter(_.event_type == "view"),
        evs.filter(_.event_type == "click"))
      // interleave arrival so matches straddle micro-batches
      views.addData(vs.take(vs.length / 2))
      clicks.addData(cs)
      query.processAllAvailable()
      views.addData(vs.drop(vs.length / 2))
      query.processAllAvailable()
      val streamed = spark.table("vc_join")
        .orderBy("view_id", "click_id").collect().map(_.toSeq).toSeq
      val batch = EventStream.viewClickJoin(vs.toDF(), cs.toDF())
        .orderBy("view_id", "click_id").collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally query.stop()
  }

  test("streaming funnel state across micro-batches == batch stage frame") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStream.funnelStages(input.toDF())
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode("complete").start()
    try {
      // split so many users straddle the batch boundary — their state
      // must fold, not reset
      val (b1, b2) = sampleEvents.splitAt(sampleEvents.length / 2)
      input.addData(b1)
      query.processAllAvailable()
      input.addData(b2)
      query.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("user_id").collect().map(_.toSeq).toSeq
      val streamed = rows(spark.table("funnel_state"))
      val batch = rows(graft.ext.Behavior.stageMins(sampleEvents.toDF()))
      assert(streamed.nonEmpty && streamed == batch)
    } finally query.stop()
  }

  test("streaming count-min cells across micro-batches == batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStream.cmsCells(input.toDF())
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      val (b1, b2) = sampleEvents.splitAt(sampleEvents.length / 3)
      input.addData(b1)
      query.processAllAvailable()
      input.addData(b2)
      query.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("sk_row", "bucket").collect().map(_.toSeq).toSeq
      val streamed = rows(spark.table("cms_cells"))
      val batch = rows(graft.ext.Stats.countMinSketch(spark, sfDir))
      assert(streamed.nonEmpty && streamed == batch,
        "sketch state folded across micro-batches must equal the batch matrix")
    } finally query.stop()
  }

  test("heavy hitters decoded from STREAMED count-min state == batch q198") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStream.cmsCells(input.toDF())
      .writeStream.format("memory").queryName("cms_state_hh")
      .outputMode("complete").start()
    try {
      val (b1, b2) = sampleEvents.splitAt(sampleEvents.length / 3)
      input.addData(b1)
      query.processAllAvailable()
      input.addData(b2)
      query.processAllAvailable()
      // decode over the state the STREAM maintained, then apply the
      // same 1%-of-stream support rule as the batch query
      val streamedCells = spark.table("cms_state_hh")
      val events = sampleEvents.toDF()
      val total = events.count()
      val streamedHH = graft.ext.Stats
        .cmsEstimates(streamedCells, events)
        .filter($"est" * 100 >= total)
        .orderBy($"user_id")
        .collect().map(_.toSeq).toSeq
      val batchHH = graft.ext.Stats.cmsHeavyHitters(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(streamedHH.nonEmpty && streamedHH == batchHH,
        "decode over stream-maintained state must equal the batch query")
      // the sketch's one-sided contract: no estimate undercounts
      val underCounts = graft.ext.Stats.cmsEstimates(streamedCells, events)
        .join(events.groupBy($"user_id").agg(count(lit(1)).as("truth")),
          "user_id")
        .filter($"est" < $"truth").count()
      assert(underCounts == 0L, "CMS point estimates must never undercount")
    } finally query.stop()
  }

  test("streaming drift cells across micro-batches == batch grid and KS") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStream.driftCells(input.toDF())
      .writeStream.format("memory").queryName("drift_cells")
      .outputMode("complete").start()
    try {
      val (b1, b2) = sampleEvents.splitAt(sampleEvents.length / 3)
      input.addData(b1)
      query.processAllAvailable()
      input.addData(b2)
      query.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("bucket").collect().map(_.toSeq).toSeq
      val streamedCells = spark.table("drift_cells")
      val batchCells = graft.ext.Stats.eventDriftCells(sampleEvents.toDF())
      assert(rows(streamedCells).nonEmpty &&
        rows(streamedCells) == rows(batchCells),
        "grid state folded across micro-batches must equal the batch grid")
      // the statistic computed FROM the streamed state equals the
      // batch one — the live drift gate a pipeline would alert on
      val ksS = graft.ext.Stats.ksFromCells(streamedCells).collect().toSeq
      val ksB = graft.ext.Stats.ksFromCells(batchCells).collect().toSeq
      assert(ksS == ksB && ksS.head.getDouble(3) >= 0.0)
    } finally query.stop()
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStream.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val evs = sampleEvents.take(200)
      input.addData(evs ++ evs) // every row duplicated in one batch
      query.processAllAvailable()
      input.addData(evs.take(50)) // re-sent across batches too
      query.processAllAvailable()
      val out = spark.table("dedup_out")
      assert(out.count() == 200)
      assert(out.select("event_id").distinct().count() == 200)
    } finally query.stop()
  }

  test("file-source ingestion resumes exactly-once across restart") {
    val src = Files.createTempDirectory("graft-src").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val out = Files.createTempDirectory("graft-out").toString
    val events = graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val schema = events.schema

    events.filter($"event_id" < 500).coalesce(1).write.mode("append").parquet(src)
    val q1 = EventStream.fileIngest(spark, src, schema, ckpt, out)
    q1.processAllAvailable(); q1.stop()
    val afterFirst = spark.read.parquet(out).count()

    events.filter($"event_id" >= 500).coalesce(1).write.mode("append").parquet(src)
    val q2 = EventStream.fileIngest(spark, src, schema, ckpt, out)
    q2.processAllAvailable(); q2.stop()

    val result = spark.read.parquet(out)
    assert(afterFirst == 500)
    assert(result.count() == 1000)                       // no loss
    assert(result.select("event_id").distinct().count() == 1000) // no dupes
  }

  test("RocksDB state store runs the stateful lane identically — " +
    "the large-state scale path for 100 TB streams") {
    // HDFSBackedStateStore holds state on the JVM heap; RocksDB spills
    // to native memory + disk, which is what keeps a billion-key
    // session/drift state alive on a real cluster. Same query, same
    // data, provider swapped — results must be identical.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val query = EventStream.windowedCounts(input.toDF())
        .writeStream.format("memory").queryName("wc_rocks")
        .outputMode("complete").start()
      try {
        // two micro-batches so state genuinely persists across folds
        val (a, b) = sampleEvents.splitAt(sampleEvents.size / 2)
        input.addData(a); query.processAllAvailable()
        input.addData(b); query.processAllAvailable()
        val streamed = spark.table("wc_rocks")
          .orderBy("win_start_us", "event_type").collect()
        val batch = EventStream.windowedCounts(sampleEvents.toDF())
          .orderBy("win_start_us", "event_type").collect()
        assert(streamed.nonEmpty && streamed.sameElements(batch),
          "RocksDB-backed state must land on the exact batch result")
      } finally query.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
