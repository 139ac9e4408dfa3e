package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Oracle-checkable STREAMING read of the DSv2 generator source —
  * the micro-batch face of [[graft.sources.GenSource]] (q117's batch
  * scan), and the piece that makes the engine's streaming lane
  * differentially verifiable end to end: every other streaming spec
  * compares against a batch twin inside Spark, but a deterministic
  * source lets DuckDB check the STREAMED result itself.
  *
  * The run uses Trigger.AvailableNow with `rowsPerBatch` forcing
  * ⌈rows/rowsPerBatch⌉ admissions, a complete-mode streaming
  * aggregate, and a memory sink; the returned frame carries the
  * observed data-batch count as a column, so the oracle row pins not
  * just the values but that they accumulated across exactly the
  * closed-form number of micro-batches — a single-batch degeneration
  * (admission control silently ignored) would hash-mismatch.
  *
  * Scale shape: state is the 10-row group domain; each admitted
  * slice fans out across the source's `parts` input partitions; the
  * checkpoint is a temp dir per run (the production path would pin
  * it — exercised by GenSourceSpec's resume case, which re-runs on
  * the SAME checkpoint and proves zero re-emission).
  */
object GenStream {

  def streamedAgg(spark: SparkSession, rows: Long = 100000L,
                  parts: Int = 8, rowsPerBatch: Long = 30000L): DataFrame = {
    import spark.implicits._
    val name = "gen_stream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-gen-stream-ckpt").toString
    // 10-key group domain: clamp the drain's shuffle width so each
    // micro-batch opens 4 state stores, not the session's 32
    val q = Clamp.withShuffleParts(spark, Clamp.BoundedDrainParts) {
    val q0 = spark.readStream.format("graft.sources.GenSource")
      .option("rows", rows.toString)
      .option("parts", parts.toString)
      .option("rowsPerBatch", rowsPerBatch.toString)
      .load()
      .groupBy(($"bucket" % 10).as("b"))
      .agg(count(lit(1)).as("n"),
        sum($"cents").as("cents_sum"),
        sum($"id").as("id_sum"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q0.awaitTermination()
    q0
    }
    q.stop()
    val nBatches = q.recentProgress.count(_.numInputRows > 0).toLong
    // the sink holds the 10-row group domain — materialize it and
    // drop the temp view so repeated bench passes don't accumulate
    // registrations (bounded: the domain, never the stream)
    val out = spark.table(name)
      .withColumn("n_batches", lit(nBatches))
      .orderBy($"b")
    val rowsOut: Array[Row] = out.collect()
    spark.catalog.dropTempView(name)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rowsOut.toIndexedSeq, 1), out.schema)
      .orderBy($"b")
  }
}
