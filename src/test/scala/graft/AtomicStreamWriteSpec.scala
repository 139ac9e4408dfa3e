package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `writeStream.toTable` into the versioned catalog
  * ([[graft.io.AtomicSink.AtomicStreamingWrite]]): one epoch-idempotent
  * two-phase commit per non-empty micro-batch.
  */
class AtomicStreamWriteSpec extends SparkSpec {
  import spark.implicits._

  // ONE root per suite: Spark instantiates the catalog once and
  // caches it — a per-test root conf change would silently not apply
  private lazy val catalogRoot: String = {
    val root = Files.createTempDirectory("graft-gsw").toString
    spark.conf.set("spark.sql.catalog.gsw", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gsw.root", root)
    root
  }
  private def freshCatalog(): String = catalogRoot

  private def t(): String =
    "t_" + java.util.UUID.randomUUID().toString.replace("-", "")

  test("append mode: one commit per non-empty epoch, each carrying " +
    "its _EPOCH marker; rows accumulate") {
    val root = freshCatalog()
    val name = t()
    spark.sql(s"CREATE TABLE gsw.$name (id BIGINT, v BIGINT)")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft-gsw-ckpt").toString
    def drain(): Unit = {
      val q = src.toDF().select($"value".as("id"), ($"value" * 3).as("v"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(s"gsw.$name")
      q.awaitTermination(); q.stop()
    }
    src.addData(1L to 100L: _*)
    drain()
    src.addData(101L to 150L: _*)
    drain()

    val dir = s"$root/$name"
    val versions = graft.io.AtomicSink.versions(spark, dir)
    assert(versions == Seq(1, 2), s"one commit per non-empty epoch: $versions")
    versions.foreach { v =>
      assert(new java.io.File(dir, s"_EPOCH.v$v").isFile,
        s"epoch marker published for v$v")
    }
    val got = spark.table(s"gsw.$name")
      .agg(count(lit(1)), sum($"v")).head
    assert(got.getLong(0) == 150L)
    assert(got.getLong(1) == (1L to 150L).map(_ * 3).sum)
    // the history metadata table types both commits as stream appends
    val hist = spark.table(s"gsw.${name}__history")
      .orderBy("version")
      .select($"version", $"operation").as[(Long, String)]
      .collect().toSeq
    assert(hist == Seq((1L, "stream-append"), (2L, "stream-append")),
      s"history: $hist")
    spark.sql(s"DROP TABLE gsw.$name")
  }

  test("partitioned table: streamed commits cluster and publish " +
    "_PARTS tuples — partition pruning works on streamed data") {
    val root = freshCatalog()
    val name = t()
    spark.sql(s"CREATE TABLE gsw.$name (id BIGINT, g BIGINT, v BIGINT) " +
      s"PARTITIONED BY (g)")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft-gsw-ckpt").toString
    src.addData(0L until 400L: _*)
    val q = src.toDF()
      .select($"value".as("id"), ($"value" % 4).as("g"),
        ($"value" * 2).as("v"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable(s"gsw.$name")
    q.awaitTermination(); q.stop()

    val dir = s"$root/$name"
    assert(new java.io.File(dir, "_PARTS.v1").isFile,
      "streamed commit publishes its partition tuples")
    // pruning: a g=2 scan plans strictly fewer inputs than the
    // manifest lists files
    val all = graft.io.AtomicSink.committedFiles(spark, dir).size
    val pruned = spark.table(s"gsw.$name").filter($"g" === 2)
    val planned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.asInstanceOf[org.apache.spark.sql.execution.datasources
        .v2.BatchScanExec].inputPartitions.size
    assert(planned < all, s"planned $planned of $all files")
    assert(pruned.count() == 100L)
    spark.sql(s"DROP TABLE gsw.$name")
  }

  test("complete output mode truncates per epoch: the table holds " +
    "exactly the last aggregate snapshot") {
    val root = freshCatalog()
    val name = t()
    spark.sql(s"CREATE TABLE gsw.$name (g BIGINT, n BIGINT)")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft-gsw-ckpt").toString
    def drain(): Unit = {
      val q = src.toDF().groupBy(($"value" % 3).as("g"))
        .agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(s"gsw.$name")
      q.awaitTermination(); q.stop()
    }
    src.addData(0L until 30L: _*)
    drain()
    src.addData(30L until 90L: _*)
    drain()
    val rows = spark.table(s"gsw.$name").orderBy("g")
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 30L), (1L, 30L), (2L, 30L)),
      s"complete mode = last snapshot only, got $rows")
    val dir = s"$root/$name"
    assert(graft.io.AtomicSink.versions(spark, dir) == Seq(1, 2))
    spark.sql(s"DROP TABLE gsw.$name")
  }

  test("replayed epoch publishes nothing: restart after dropping the " +
    "engine's last commit-log entry re-runs the epoch, the _EPOCH " +
    "marker makes the sink skip it") {
    val root = freshCatalog()
    val name = t()
    spark.sql(s"CREATE TABLE gsw.$name (id BIGINT)")
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft-gsw-ckpt").toString
    def drain(): Unit = {
      val q = src.toDF().select($"value".as("id"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(s"gsw.$name")
      q.awaitTermination(); q.stop()
    }
    src.addData(1L to 500L: _*)
    drain()
    val dir = s"$root/$name"
    assert(graft.io.AtomicSink.versions(spark, dir) == Seq(1))
    // the crash window: sink committed, engine commit log didn't
    val commits = new java.io.File(ckpt, "commits")
    val last = commits.listFiles().map(_.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toInt).max
    assert(new java.io.File(commits, last.toString).delete())
    new java.io.File(commits, s".$last.crc").delete()
    drain() // replays the epoch
    assert(graft.io.AtomicSink.versions(spark, dir) == Seq(1),
      "the replayed epoch must not publish a second commit")
    assert(spark.table(s"gsw.$name").count() == 500L, "no duplicates")
    spark.sql(s"DROP TABLE gsw.$name")
  }
}
