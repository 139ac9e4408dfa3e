package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.streaming.CdcStream
import graft.streaming.CdcStream.Update

/** Streaming latest-wins CDC state == batch Upsert collapse, across
  * out-of-order arrival, batch splits, and redelivery.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private val feed = Seq(
    Update(1L, 5L, 100.0), Update(2L, 3L, 200.0), Update(1L, 9L, 110.0),
    Update(3L, 1L, 300.0), Update(2L, 7L, 220.0), Update(1L, 2L, 90.0))

  private def base = Seq(
    (1L, "a", 1.0), (2L, "b", 2.0), (4L, "d", 4.0)).toDF("k", "name", "bal")

  test("streamed state equals batch latest-wins under split + redelivery") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Update]
    val query = CdcStream.latestState(input.toDS())
      .writeStream.format("memory").queryName("cdc_state")
      .outputMode(CdcStream.Mode).start()
    try {
      val (b1, b2) = feed.splitAt(3)
      input.addData(b1)
      query.processAllAvailable()
      // redeliver one already-seen update alongside the second batch
      input.addData(b2 :+ feed.head)
      query.processAllAvailable()
      // changelog → latest row per key (memory sink keeps every emit)
      val streamed = spark.table("cdc_state")
        .groupBy($"k").agg(max_by(struct($"seq", $"v"), $"seq").as("s"))
        .select($"k", $"s.seq", $"s.v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = feed.toDS()
        .groupBy($"k").agg(max_by(struct($"seq", $"v"), $"seq").as("s"))
        .select($"k", $"s.seq", $"s.v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch)
      assert(streamed == Set((1L, 9L, 110.0), (2L, 7L, 220.0), (3L, 1L, 300.0)))
    } finally query.stop()
  }

  test("changelog applied to a base == batch Upsert of the full feed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Update]
    val query = CdcStream.latestState(input.toDS())
      .writeStream.format("memory").queryName("cdc_apply")
      .outputMode(CdcStream.Mode).start()
    try {
      feed.grouped(2).foreach { b => input.addData(b); query.processAllAvailable() }
      val changelog = spark.table("cdc_apply")
        .select($"k", $"seq", $"v")
      val viaStream = Upsert.latestWins(base, changelog.toDF(),
          "k", "k", "seq", Map("bal" -> "v"))
        .orderBy($"k").collect().map(_.toSeq).toSeq
      val viaBatch = Upsert.latestWins(base, feed.toDF(),
          "k", "k", "seq", Map("bal" -> "v"))
        .orderBy($"k").collect().map(_.toSeq).toSeq
      assert(viaStream == viaBatch)
    } finally query.stop()
  }
}
