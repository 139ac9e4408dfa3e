package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Merge-on-read DML (`spark.graft.atomic.dmlMode = mor`) — the
  * delta-based row-level operation: equality-delete pre-images +
  * fresh inserts in ONE commit, no existing file rewritten.
  */
class DeltaDmlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogRoot: String = {
    val root = Files.createTempDirectory("graft-gdd").toString
    spark.conf.set("spark.sql.catalog.gdd", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gdd.root", root)
    root
  }

  private def withMor[T](body: => T): T = {
    spark.conf.set("spark.graft.atomic.dmlMode", "mor")
    try body finally spark.conf.unset("spark.graft.atomic.dmlMode")
  }

  test("MOR MERGE: one commit = equality-deletes + fresh inserts; " +
    "every pre-merge file carries by reference; merged state and " +
    "time travel exact") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gdd.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdd.t SELECT id, id * 10 FROM range(0, 400)")
    spark.sql("INSERT INTO gdd.t SELECT id, id * 10 FROM range(400, 800)")
    val dir = s"$root/t"
    val before = graft.io.AtomicSink.committedFiles(spark, dir)
    withMor {
      spark.sql(
        """MERGE INTO gdd.t dst
          |USING (SELECT id, CASE WHEN id % 3 = 0 THEN -1L
          |                       ELSE id * 2 END AS v
          |       FROM range(600, 1000)) src
          |ON dst.id = src.id
          |WHEN MATCHED AND src.v < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = src.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.v)
          |""".stripMargin)
    }
    val after = graft.io.AtomicSink.committedFiles(spark, dir)
    assert(before.toSet.subsetOf(after.toSet),
      s"merge-on-read must rewrite NOTHING: before=$before after=$after")
    assert(new java.io.File(dir, "_DELETES.v3").isFile,
      "the merge publishes its equality-delete spec")
    assert(after.exists(_.startsWith("v3-")),
      "fresh insert files published under the merge version")
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("v3-eqdel-")),
      "equality-delete pre-image files published")
    // merged state: matched 600..799 (deleted where id%3=0, updated
    // otherwise), unmatched source 800..999 inserted
    def expect(): Seq[(Long, Long)] =
      ((0L until 600L).map(i => (i, i * 10)) ++
        (600L until 800L).filter(_ % 3 != 0).map(i => (i, i * 2)) ++
        // the INSERT arm is unconditioned: every unmatched source row
        // lands, including the v = -1 ones
        (800L until 1000L).map(i => (i, if (i % 3 == 0) -1L else i * 2)))
        .sortBy(_._1)
    val got = spark.sql("SELECT id, v FROM gdd.t ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got == expect(), s"merged state mismatch: ${got.take(10)}…")
    // pre-merge snapshot intact
    assert(spark.sql("SELECT count(*) FROM gdd.t VERSION AS OF 2")
      .head.getLong(0) == 800L)
    assert(spark.sql(
      "SELECT count(*) FROM gdd.t VERSION AS OF 2 WHERE v < 0")
      .head.getLong(0) == 0L)
    spark.sql("DROP TABLE gdd.t")
  }

  test("MOR UPDATE and non-pushable DELETE take the delta path too; " +
    "compaction materializes and retires the pre-image sets") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gdd.u (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdd.u SELECT id, id FROM range(0, 500)")
    val dir = s"$root/u"
    val before = graft.io.AtomicSink.committedFiles(spark, dir)
    withMor {
      spark.sql("UPDATE gdd.u SET v = -7 WHERE id % 5 = 0")
    }
    val after = graft.io.AtomicSink.committedFiles(spark, dir)
    assert(before.toSet.subsetOf(after.toSet),
      "MOR UPDATE rewrites nothing")
    assert(spark.sql("SELECT count(*) FROM gdd.u WHERE v = -7")
      .head.getLong(0) == 100L)
    assert(spark.sql("SELECT count(*) FROM gdd.u").head.getLong(0)
      == 500L, "update = delete+insert, no net row change")
    // the history face types it as a merge
    assert(spark.table("gdd.u__history").filter($"version" === 2)
      .head.getString(1) == "merge-mor")
    // a LIVE equality delete anchors EVERY column — DROP refused
    // until compaction retires it
    intercept[Exception](spark.sql("ALTER TABLE gdd.u DROP COLUMN v"))
    // compaction applies the pre-images and retires them for current
    // reads; the compacted state is byte-equal to the MOR view
    val want = spark.sql("SELECT id, v FROM gdd.u ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    graft.io.AtomicSink.compact(spark, dir, spark.table("gdd.u").schema)
    val got = spark.sql("SELECT id, v FROM gdd.u ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got == want, "compaction preserves the merged view")
    spark.sql("DROP TABLE gdd.u")
  }

  test("MOR MERGE on a PARTITIONED table: insert files are " +
    "partition-split with _PARTS tuples, pruning keeps working, and " +
    "still nothing is rewritten") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gdd.p (id BIGINT, g BIGINT, v BIGINT) " +
      "PARTITIONED BY (g)")
    spark.sql("INSERT INTO gdd.p " +
      "SELECT id, id % 4, id FROM range(0, 800)")
    val dir = s"$root/p"
    val before = graft.io.AtomicSink.committedFiles(spark, dir)
    withMor {
      spark.sql(
        """MERGE INTO gdd.p dst
          |USING (SELECT id, id % 4 AS g, -9L AS v
          |       FROM range(700, 900)) src
          |ON dst.id = src.id
          |WHEN MATCHED THEN UPDATE SET v = src.v
          |WHEN NOT MATCHED THEN INSERT (id, g, v)
          |  VALUES (src.id, src.g, src.v)""".stripMargin)
    }
    val after = graft.io.AtomicSink.committedFiles(spark, dir)
    assert(before.toSet.subsetOf(after.toSet), "nothing rewritten")
    assert(new java.io.File(dir, "_PARTS.v2").isFile,
      "the merge's insert files publish their partition tuples")
    assert(spark.sql("SELECT count(*) FROM gdd.p").head.getLong(0)
      == 900L)
    assert(spark.sql("SELECT count(*) FROM gdd.p WHERE v = -9")
      .head.getLong(0) == 200L)
    // pruning still plans fewer files than the manifest lists
    val pruned = spark.table("gdd.p").filter($"g" === 1)
    pruned.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case other => other.children.flatMap(scans)
      }
    val planned = scans(pruned.queryExecution.executedPlan)
      .head.batch.planInputPartitions().length
    assert(planned < after.size, s"planned $planned of ${after.size}")
    spark.sql("DROP TABLE gdd.p")
  }

  test("changelog replay equality: the MOR MERGE's op-typed change " +
    "feed reconstructs exactly the post-merge snapshot") {
    import org.apache.spark.sql.streaming.Trigger
    val root = catalogRoot
    spark.sql("CREATE TABLE gdd.c (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdd.c SELECT id, id * 10 FROM range(0, 300)")
    withMor {
      spark.sql(
        """MERGE INTO gdd.c dst
          |USING (SELECT id, -2L AS v FROM range(200, 450)) src
          |ON dst.id = src.id
          |WHEN MATCHED AND src.id % 2 = 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = src.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.v)
          |""".stripMargin)
    }
    val ckpt = Files.createTempDirectory("gdd-ckpt").toString
    val out = Files.createTempDirectory("gdd-out").toString
    val q = spark.readStream.table("gdd.c__changes")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(); q.stop()
    val log = spark.read.parquet(out)
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val state = log.groupBy(x => (x._1, x._2)).collect {
      case ((id, v), evs)
        if evs.count(_._3 == "insert") > evs.count(_._3 == "delete") =>
        (id, v)
    }.toSeq.sorted
    val want = spark.sql("SELECT id, v FROM gdd.c ORDER BY id, v")
      .as[(Long, Long)].collect().toSeq
    assert(state == want, "replayed changelog == post-merge snapshot")
    spark.sql("DROP TABLE gdd.c")
  }

  test("VACUUM reclaims equality-delete pre-images once compaction + " +
    "expiry leave no retained file older than the delete; LIVE eqdel " +
    "specs survive the sweep") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gdd.vac (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdd.vac SELECT id, id FROM range(0, 100)")
    withMor {
      spark.sql("UPDATE gdd.vac SET v = -1 WHERE id < 10")
    }
    val dir = s"$root/vac"
    def eqdels(): Seq[String] = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.matches("v\\d+-eqdel-.*")).toSeq
    assert(eqdels().nonEmpty, "the MOR update published pre-images")
    // expiry while v1 files are still carried: the v2 delete spec is
    // LIVE (it hides rows of the carried v1 files) — nothing reclaimed
    graft.io.AtomicSink.expireSnapshots(dir, keepLast = 1)
    assert(new java.io.File(dir, "_DELETES.v2").isFile,
      "live eqdel spec survives VACUUM")
    assert(eqdels().nonEmpty, "live pre-image files survive VACUUM")
    assert(spark.sql("SELECT count(*) FROM gdd.vac WHERE v = -1")
      .head.getLong(0) == 10L)
    // compaction rewrites the visible rows (every file now newer than
    // the delete); expiry then finds the spec unreachable — the
    // sidecar AND its pre-image files are reclaimed
    graft.io.AtomicSink.compact(spark, dir, spark.table("gdd.vac").schema)
    graft.io.AtomicSink.expireSnapshots(dir, keepLast = 1)
    assert(!new java.io.File(dir, "_DELETES.v2").exists(),
      "dead eqdel spec reclaimed after compaction + expiry")
    assert(eqdels().isEmpty, "dead pre-image files reclaimed")
    assert(spark.sql("SELECT count(*) FROM gdd.vac WHERE v = -1")
      .head.getLong(0) == 10L, "visible rows unchanged through it all")
    assert(spark.sql("SELECT count(*) FROM gdd.vac")
      .head.getLong(0) == 100L)
    spark.sql("DROP TABLE gdd.vac")
  }
}
