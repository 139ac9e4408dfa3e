package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked APPEND-mode streaming aggregation into the versioned
  * catalog — the event-sessionization-to-durable-table shape: only
  * FINALIZED windows (below the watermark) ever commit, each
  * non-empty epoch as one two-phase commit.
  */
class StreamAggToTableSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogRoot: String = {
    val root = Files.createTempDirectory("graft-gwa").toString
    spark.conf.set("spark.sql.catalog.gwa", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gwa.root", root)
    root
  }

  test("append-mode windowed aggregate with watermark: only closed " +
    "windows land in the table; a later batch closes earlier windows") {
    val root = catalogRoot
    val name = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gwa.$name " +
      s"(win_start BIGINT, n BIGINT, v_sum BIGINT)")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Long)] // (event-time seconds, value)
    val ckpt = Files.createTempDirectory("graft-gwa-ckpt").toString
    def drain(): Unit = {
      val q = src.toDF().toDF("sec", "v")
        .withColumn("ts", timestamp_seconds($"sec"))
        .withWatermark("ts", "10 seconds")
        .groupBy(window($"ts", "60 seconds"))
        .agg(count(lit(1)).as("n"), sum($"v").as("v_sum"))
        .select(unix_timestamp($"window.start").as("win_start"),
          $"n", $"v_sum")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(s"gwa.$name")
      q.awaitTermination(); q.stop()
    }
    // batch 1: events in windows [0,60) and [60,120); max ts 70 →
    // watermark 60 after the batch — window [0,60) closes, [60,120)
    // stays open and must NOT appear in the table yet
    src.addData((0L until 50L).map(s => (s, s)) :+ (70L, 1000L): _*)
    drain()
    val after1 = spark.table(s"gwa.$name")
      .select($"win_start", $"n", $"v_sum")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(after1 == Seq((0L, 50L, (0L until 50L).sum)),
      s"only the closed [0,60) window lands: $after1")
    // batch 2: an event at 200 pushes the watermark past 120 —
    // window [60,120) finalizes and commits; [180,240) stays open
    src.addData((200L, 7L))
    drain()
    val after2 = spark.table(s"gwa.$name")
      .select($"win_start", $"n", $"v_sum")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(after2 == Seq((0L, 50L, (0L until 50L).sum),
      (60L, 1L, 1000L)),
      s"the second drain appends exactly the newly closed window: $after2")
    // each non-empty epoch = one commit; the open window never leaked
    val versions = graft.io.AtomicSink.versions(spark, s"$root/$name")
    assert(versions.size == 2, s"one commit per emitting epoch: $versions")
    spark.sql(s"DROP TABLE gwa.$name")
  }

  test("TRUNCATE TABLE: SQL truncate empties the snapshot as one " +
    "commit; the pre-truncate version stays time-travelable") {
    catalogRoot
    val name = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gwa.$name (id BIGINT)")
    spark.sql(s"INSERT INTO gwa.$name SELECT id FROM range(0, 100)")
    spark.sql(s"TRUNCATE TABLE gwa.$name")
    assert(spark.sql(s"SELECT count(*) FROM gwa.$name")
      .head.getLong(0) == 0L)
    assert(spark.sql(
      s"SELECT count(*) FROM gwa.$name VERSION AS OF 1")
      .head.getLong(0) == 100L, "pre-truncate snapshot intact")
    spark.sql(s"INSERT INTO gwa.$name SELECT id FROM range(0, 7)")
    assert(spark.sql(s"SELECT count(*) FROM gwa.$name")
      .head.getLong(0) == 7L)
    spark.sql(s"DROP TABLE gwa.$name")
  }
}
