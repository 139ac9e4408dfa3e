package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Two-phase-commit contract of [[graft.io.AtomicSink]]: a committed
  * write is manifest-complete, an aborted write is invisible.
  */
class AtomicSinkSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.io.AtomicSink"

  test("commit publishes exactly the task files, and the data round-trips") {
    val dir = Files.createTempDirectory("graft-atomic").toString
    val df = (1L to 100L).map(i => (i, s"row$i", i * 1.5))
      .toDF("id", "name", "v").repartition(4)
    df.write.format(fmt).mode("append").save(dir)

    val files = graft.io.AtomicSink.committedFiles(spark, dir)
    assert(files.size == 4, s"one published file per partition: $files")
    assert(files.forall(_.startsWith("v1-")),
      s"published names carry the snapshot version prefix: $files")
    assert(files.forall(f => new java.io.File(dir, f).isFile),
      "every manifest entry exists in the target dir")
    // no staging residue, nothing published outside the manifest +
    // its retained versioned snapshot
    // (dot-prefixed entries are LocalFileSystem .crc sidecars)
    val onDisk = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    assert(onDisk == files.toSet + graft.io.AtomicSink.ManifestFile +
      s"${graft.io.AtomicSink.ManifestFile}.v1",
      s"on disk: $onDisk")

    val back = spark.read.option("sep", "\t")
      .schema("id LONG, name STRING, v DOUBLE")
      .csv(files.map(f => s"$dir/$f"): _*)
    assert(back.count() == 100)
    assert(back.agg(sum($"id")).head.getLong(0) == 5050L)
    assert(back.filter($"name" === "row42").head.getDouble(2) == 63.0)
  }

  test("snapshots: a second commit leaves version 1 readable as of " +
    "its commit — plain-filesystem time travel") {
    val dir = Files.createTempDirectory("graft-atomic-tt").toString
    def write(lo: Long, hi: Long): Unit =
      (lo to hi).map(i => (i, s"row$i", i * 1.0)).toDF("id", "name", "v")
        .repartition(2).write.format(fmt).mode("append").save(dir)
    write(1L, 10L)
    write(100L, 120L)
    assert(graft.io.AtomicSink.versions(spark, dir) == Seq(1, 2))
    def idsOf(files: Seq[String]): Seq[Long] =
      spark.read.option("sep", "\t")
        .schema("id LONG, name STRING, v DOUBLE")
        .csv(files.map(f => s"$dir/$f"): _*)
        .select($"id").as[Long].collect().sorted.toSeq
    // VERSION AS OF 1: exactly the first commit's rows
    assert(idsOf(graft.io.AtomicSink.committedFiles(spark, dir, 1))
      == (1L to 10L))
    // latest == snapshot 2
    assert(graft.io.AtomicSink.committedFiles(spark, dir)
      == graft.io.AtomicSink.committedFiles(spark, dir, 2))
    assert(idsOf(graft.io.AtomicSink.committedFiles(spark, dir))
      == (100L to 120L))
    // the never-committed version reads empty
    assert(graft.io.AtomicSink.committedFiles(spark, dir, 9).isEmpty)
  }

  test("a failing write publishes nothing — no manifest, no files") {
    val dir = Files.createTempDirectory("graft-atomic-fail").toString
    val bad = (1L to 10L).toDF("id").repartition(2)
      .select(expr("CASE WHEN id = 7 THEN CAST(raise_error('boom') AS LONG)" +
        " ELSE id END").as("id"))
    intercept[Exception] {
      bad.write.format(fmt).mode("append").save(dir)
    }
    assert(graft.io.AtomicSink.committedFiles(spark, dir).isEmpty,
      "no manifest after an aborted job")
    val residue = Option(new java.io.File(dir).listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(!residue.exists(_.startsWith("part-")),
      s"no published part files after abort: $residue")
  }

  test("AtomicCatalog: CREATE / INSERT / SELECT / row-level DELETE / " +
    "VERSION AS OF / DROP, all through plain SQL") {
    val root = Files.createTempDirectory("graft-catalog").toString
    spark.conf.set("spark.sql.catalog.gtabspec", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtabspec.root", root)
    spark.sql("CREATE TABLE gtabspec.t1 (id BIGINT, grp BIGINT, " +
      "name STRING)")
    spark.sql("INSERT INTO gtabspec.t1 " +
      "SELECT id, id % 3, concat('n', id) FROM range(100)")
    assert(spark.sql("SELECT count(*) FROM gtabspec.t1")
      .head.getLong(0) == 100L)
    // a NULL round-trips through the TSV convention
    spark.sql("INSERT INTO gtabspec.t1 VALUES (1000, 7, NULL)")
    assert(spark.sql(
      "SELECT count(*) FROM gtabspec.t1 WHERE name IS NULL")
      .head.getLong(0) == 1L)
    // copy-on-write DELETE: survivors republish as a new snapshot
    spark.sql("DELETE FROM gtabspec.t1 WHERE grp = 1 OR id < 10")
    val want = (0L until 100L)
      .count(id => !(id % 3 == 1 || id < 10)).toLong + 1L // +NULL row
    assert(spark.sql("SELECT count(*) FROM gtabspec.t1")
      .head.getLong(0) == want)
    assert(spark.sql("SELECT count(*) FROM gtabspec.t1 WHERE grp = 1")
      .head.getLong(0) == 0L)
    // time travel: every pre-delete snapshot is still readable
    assert(spark.sql(
      "SELECT count(*) FROM gtabspec.t1 VERSION AS OF 1")
      .head.getLong(0) == 100L)
    assert(spark.sql(
      "SELECT count(*) FROM gtabspec.t1 VERSION AS OF 3")
      .head.getLong(0) == want)
    // a DELETE whose condition is NULL on a row keeps that row
    spark.sql("DELETE FROM gtabspec.t1 WHERE name = 'nope'")
    assert(spark.sql("SELECT count(*) FROM gtabspec.t1")
      .head.getLong(0) == want,
      "NULL-condition rows survive a DELETE (SQL semantics)")
    spark.sql("DROP TABLE gtabspec.t1")
    assert(!new java.io.File(root, "t1").exists())
  }

  test("schema evolution: only appending top-level ADD COLUMN is " +
    "allowed — drops, renames and positioned adds are refused") {
    val root = Files.createTempDirectory("graft-catalog-alter").toString
    spark.conf.set("spark.sql.catalog.galter", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.galter.root", root)
    spark.sql("CREATE TABLE galter.t (id BIGINT)")
    spark.sql("ALTER TABLE galter.t ADD COLUMN v DOUBLE")
    assert(spark.table("galter.t").schema.fieldNames.toSeq
      == Seq("id", "v"))
    intercept[Exception](
      spark.sql("ALTER TABLE galter.t DROP COLUMN v"))
    intercept[Exception](
      spark.sql("ALTER TABLE galter.t RENAME COLUMN v TO w"))
    intercept[Exception](
      spark.sql("ALTER TABLE galter.t ADD COLUMN w BIGINT FIRST"))
    // refused changes must not have mutated the persisted schema
    assert(spark.table("galter.t").schema.fieldNames.toSeq
      == Seq("id", "v"))
    spark.sql("DROP TABLE galter.t")
  }

  test("commit feed: one micro-batch per snapshot in commit order; " +
    "a resumed run serves only commits newer than the checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-catalog-feed").toString
    spark.conf.set("spark.sql.catalog.gfeed", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gfeed.root", root)
    spark.sql("CREATE TABLE gfeed.t (id BIGINT)")
    spark.sql("INSERT INTO gfeed.t SELECT id FROM range(0, 10)")
    spark.sql("INSERT INTO gfeed.t SELECT id FROM range(10, 30)")
    val ckpt = Files.createTempDirectory("gfeed-ckpt").toString
    val out = Files.createTempDirectory("gfeed-out").toString
    def run(): Seq[Long] = {
      val q = spark.readStream.table("gfeed.t")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.stop()
      q.recentProgress.filter(_.numInputRows > 0)
        .map(_.numInputRows).toSeq
    }
    // two committed snapshots -> two data batches, in commit order
    assert(run() == Seq(10L, 20L))
    assert(spark.read.parquet(out).count() == 30L)
    // a third commit after the checkpoint: the resumed stream serves
    // ONLY it (offsets = versions, replay is exactly-once)
    spark.sql("INSERT INTO gfeed.t SELECT id FROM range(30, 35)")
    assert(run() == Seq(5L))
    assert(spark.read.parquet(out).count() == 35L)
    spark.sql("DROP TABLE gfeed.t")
  }
}
