package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Structured Streaming face of the engine — the Spark-native
  * re-imagining of the reference's hand-rolled resumable batch
  * machinery (`/root/reference/etl_pipeline_spark.py:188-287`):
  * `ProgressTracker` tracked completed files in a JSON checkpoint and
  * skipped them on re-run; a file-source stream with
  * `maxFilesPerTrigger` + `checkpointLocation` gives exactly those
  * semantics (at-most-once per file, resume after crash) with state
  * managed by the engine instead of by hand.
  *
  * The transforms mirror the batch operators in [[graft.ext.Events]]
  * (tumbling window agg, sessionization) so the same logic runs in
  * either mode — the batch forms are oracle-verified, the streaming
  * forms are spec-tested against their batch twins.
  */
object EventStream {

  /** File-at-a-time resumable ingestion (ProgressTracker mirror): one
    * file per micro-batch, progress in the checkpoint, output appended
    * as parquet.
    */
  def fileIngest(spark: SparkSession, srcDir: String, schema: StructType,
                 checkpointDir: String, outDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .start()

  /** Watermarked tumbling-window counts per event_type — the streaming
    * twin of [[graft.ext.Events.tumblingWindow]]. */
  def windowedCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      // exact decimal sum: streaming accumulates state in arrival order,
      // batch in scan order — a double sum would differ in the last ulp
      .agg(count(lit(1)).as("n"),
           round(sum($"value".cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
      .select(unix_micros($"window.start").as("win_start_us"), $"event_type",
              $"n", $"sum_value")
  }

  /** Streaming exact dedup: drop duplicate event_ids, with a watermark
    * bounding the dedup state — the streaming twin of
    * [[graft.ext.Dedup.exactDedup]]. State per key is only retained
    * within the watermark horizon, so memory is bounded at any scale.
    */
  def dedupStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
  }

  /** Watermarked stream-stream interval join: each view pairs with
    * the same user's clicks within the following 10 minutes — the
    * attribution join. Both sides carry a watermark and the join
    * condition bounds event time on both ends, so the engine can
    * discard view state once no qualifying click can still arrive
    * (state stays O(in-horizon events), the requirement for an
    * unbounded run). The identical expression joins two batch frames,
    * which is what the spec compares against.
    */
  def viewClickJoin(views: DataFrame, clicks: DataFrame): DataFrame = {
    import views.sparkSession.implicits._
    val v = views.select($"user_id", $"ts".as("v_ts"),
      $"event_id".as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val c = clicks.select($"user_id".as("c_user"), $"ts".as("c_ts"),
      $"event_id".as("click_id"))
      .withWatermark("c_ts", "1 hour")
    v.join(c, expr(
      """user_id = c_user AND
         c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 10 MINUTES"""))
      .select($"user_id", $"view_id", $"click_id",
        unix_micros($"v_ts").as("v_us"), unix_micros($"c_ts").as("c_us"))
  }

  /** Live funnel state — the streaming twin of
    * [[graft.ext.Behavior.funnel]]'s per-user stage frame: the SAME
    * conditional-min aggregation maintained as engine state (three
    * timestamps per user), so each micro-batch folds in and the
    * frame always reflects every event seen so far. Downstream the
    * batch roll-up turns it into stage counts; state size is O(users)
    * regardless of event volume.
    */
  def funnelStages(events: DataFrame): DataFrame =
    graft.ext.Behavior.stageMins(events)

  /** Live count-min sketch — [[graft.ext.Stats.cmsOf]] over a stream:
    * the engine keeps exactly the 4×64 cell matrix as state (update/
    * complete mode), the bounded-memory way to track per-key event
    * frequencies forever without a per-key ledger. Cells keep the
    * batch sketch's exact semantics (StreamingSpec: stream == batch
    * after any micro-batch split). */
  def cmsCells(events: DataFrame): DataFrame =
    graft.ext.Stats.cmsOf(events)

  /** Streaming distribution-drift state: the bounded (bucket, ca, cb)
    * KS grid of [[graft.ext.Stats.eventDriftCells]] maintained over
    * the stream — one state row per $10 value cell, merged across
    * micro-batches; the drift gate finishes with
    * [[graft.ext.Stats.ksFromCells]] on the materialized state, so a
    * pipeline can watch the KS statistic live without ever storing
    * raw events. */
  def driftCells(events: DataFrame): DataFrame =
    graft.ext.Stats.eventDriftCells(events)

  /** Session windows (30-minute gap) per user — the engine-managed
    * state twin of [[graft.ext.Events.sessionize]]; works identically
    * over a batch DataFrame or a watermarked stream.
    */
  def sessionWindows(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), min(unix_micros($"ts")).as("start_us"),
           max(unix_micros($"ts")).as("end_us"))
      .select($"user_id", $"start_us", $"end_us", $"n_events")
  }
}
