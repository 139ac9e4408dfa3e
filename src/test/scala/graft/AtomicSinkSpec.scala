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
      s"${graft.io.AtomicSink.ManifestFile}.v1" + "_CLAIM.v1",
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

  test("schema evolution: ADD/RENAME/DROP COLUMN resolve by field id " +
    "over immutable files; positioned adds stay refused; every ALTER " +
    "publishes a fresh _SCHEMA.v<N> (crash-safe, nothing deleted)") {
    val root = Files.createTempDirectory("graft-catalog-alter").toString
    spark.conf.set("spark.sql.catalog.galter", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.galter.root", root)
    spark.sql("CREATE TABLE galter.t (id BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO galter.t SELECT id, id % 7, id % 5 " +
      "FROM range(0, 50)")
    // RENAME keeps the field id: old files keep serving the column
    spark.sql("ALTER TABLE galter.t RENAME COLUMN a TO x")
    assert(spark.table("galter.t").schema.fieldNames.toSeq
      == Seq("id", "x", "b"))
    assert(spark.sql("SELECT sum(x) FROM galter.t").head.getLong(0)
      == (0L until 50L).map(_ % 7).sum,
      "renamed column serves the pre-rename files' values")
    // DROP hides the id everywhere, including pre-drop files
    spark.sql("ALTER TABLE galter.t DROP COLUMN b")
    assert(spark.table("galter.t").schema.fieldNames.toSeq
      == Seq("id", "x"))
    // ADD after a DROP takes a FRESH id: old files' dropped cells must
    // NOT leak into the new column (the positional-read trap)
    spark.sql("ALTER TABLE galter.t ADD COLUMN c BIGINT")
    spark.sql("INSERT INTO galter.t SELECT id, id % 7, id % 3 " +
      "FROM range(50, 80)")
    assert(spark.sql(
      "SELECT count(*) FROM galter.t WHERE c IS NULL").head.getLong(0)
      == 50L, "pre-add rows read NULL in c, never old b cells")
    assert(spark.sql("SELECT sum(c) FROM galter.t").head.getLong(0)
      == (50L until 80L).map(_ % 3).sum)
    // the delete-rewrite republishes survivors id-resolvably too
    spark.sql("DELETE FROM galter.t WHERE id < 10")
    assert(spark.sql("SELECT sum(x) FROM galter.t").head.getLong(0)
      == (10L until 80L).map(_ % 7).sum)
    // still refused: positions, type changes, and NESTED evolution —
    // field ids are top-level only (documented refusal: a struct
    // column's members have no ids, so nested ADD/RENAME/DROP would
    // reintroduce the positional-read trap inside the struct)
    intercept[Exception](
      spark.sql("ALTER TABLE galter.t ADD COLUMN w BIGINT FIRST"))
    val nested = intercept[Exception](
      spark.sql("ALTER TABLE galter.t ADD COLUMN x.inner BIGINT"))
    assert(Iterator.iterate(nested: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .exists(t => Option(t.getMessage)
        .exists(m => m.contains("top-level") || m.contains("not a struct")
          || m.contains("INVALID_FIELD_NAME"))), nested.getMessage)
    assert(spark.table("galter.t").schema.fieldNames.toSeq
      == Seq("id", "x", "c"), "refused changes mutate nothing")
    // crash-safety shape: schema publications are fresh names only —
    // v1 (CREATE) through v4 (3 ALTERs) all still present
    val schemas = new java.io.File(root, "t").listFiles()
      .map(_.getName).filter(_.startsWith("_SCHEMA.v")).sorted
    assert(schemas.toSeq ==
      Seq("_SCHEMA.v1", "_SCHEMA.v2", "_SCHEMA.v3", "_SCHEMA.v4"))
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

  test("changelog feed: op-typed rows — appends serve inserts, a " +
    "copy-on-write DELETE serves its deleted rows as deletes (never " +
    "survivor re-inserts), and a resumed run continues past the " +
    "checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-catalog-cdc").toString
    spark.conf.set("spark.sql.catalog.gcdc", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gcdc.root", root)
    spark.sql("CREATE TABLE gcdc.t (id BIGINT)")
    spark.sql("INSERT INTO gcdc.t SELECT id FROM range(0, 20)")
    spark.sql("DELETE FROM gcdc.t WHERE id < 5")
    val ckpt = Files.createTempDirectory("gcdc-ckpt").toString
    val out = Files.createTempDirectory("gcdc-out").toString
    def drain(): Unit = {
      val q = spark.readStream.table("gcdc.t__changes")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q.stop()
    }
    drain()
    val log1 = spark.read.parquet(out)
      .select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(log1.count(_._2 == "insert") == 20,
      "commit 1's rows all arrive as inserts")
    assert(log1.filter(_._2 == "delete").map(_._1).sorted.toSeq
      == (0L until 5L), "the DELETE commit serves exactly its victims")
    assert(!log1.exists(t => t._2 == "insert" && t._3 == 2L),
      "survivor rewrites are NOT replayed as inserts")
    // resume: only the new commit's changes arrive
    spark.sql("INSERT INTO gcdc.t SELECT id FROM range(20, 27)")
    spark.sql("DELETE FROM gcdc.t WHERE id >= 25")
    drain()
    val log2 = spark.read.parquet(out)
      .select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(log2.length == log1.length + 7 + 2,
      "resume serves exactly the 7 inserts + 2 deletes after the " +
        "checkpoint")
    // the changelog REPLAYS to the table's state: inserts minus deletes
    val state = log2.groupBy(_._1).filter { case (_, evs) =>
      evs.count(_._2 == "insert") > evs.count(_._2 == "delete")
    }.keys.toSeq.sorted
    val want = spark.sql("SELECT id FROM gcdc.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(state == want, "replayed changelog == current snapshot")
    // INSERT OVERWRITE: old snapshot's rows delete BY REFERENCE (no
    // copies), fresh rows insert — all in the overwrite's own commit
    spark.sql("INSERT OVERWRITE gcdc.t SELECT id FROM range(100, 104)")
    drain()
    val log3 = spark.read.parquet(out)
      .select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ovV = log3.map(_._3).max
    val ovDels = log3.filter(t => t._3 == ovV && t._2 == "delete")
      .map(_._1).sorted.toSeq
    val ovIns = log3.filter(t => t._3 == ovV && t._2 == "insert")
      .map(_._1).sorted.toSeq
    val preOverwrite = (5L until 25L) // state after the two deletes
    assert(ovDels == preOverwrite, s"overwrite deletes the old state: $ovDels")
    assert(ovIns == (100L until 104L), s"and inserts the new: $ovIns")
    // the __changes sub-table is a streaming-only, read-only face
    intercept[Exception](
      spark.read.table("gcdc.t__changes").collect())
    intercept[Exception](spark.sql(
      "INSERT INTO gcdc.t__changes SELECT 1, 'insert', 1"))
    spark.sql("DROP TABLE gcdc.t")
  }

  test("merge-on-read DELETE: a manifest-only predicate commit — no " +
    "rewrite, exact visible rows, delete-scoped to older files, " +
    "rename-proof via field ids, time travel intact, changelog typed") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-catalog-mor").toString
    spark.conf.set("spark.sql.catalog.gmor", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gmor.root", root)
    spark.conf.set("spark.graft.atomic.deleteMode", "mor")
    try {
      spark.sql("CREATE TABLE gmor.t (id BIGINT, v BIGINT)")
      spark.sql("INSERT INTO gmor.t SELECT id, id % 7 FROM range(0, 60)")
      val filesBefore = graft.io.AtomicSink
        .committedFiles(spark, s"$root/t")
      spark.sql("DELETE FROM gmor.t WHERE id >= 20 AND id < 35")
      // 1. NO REWRITE: the delete commit carries the same data files
      assert(graft.io.AtomicSink.committedFiles(spark, s"$root/t")
        == filesBefore, "manifest-only commit: no data file rewritten")
      assert(new java.io.File(s"$root/t/_DELETES.v2").exists())
      // 2. visible rows exclude exactly the predicate's
      assert(spark.sql("SELECT count(*) FROM gmor.t").head.getLong(0)
        == 45L)
      assert(spark.sql(
        "SELECT count(*) FROM gmor.t WHERE id >= 20 AND id < 35")
        .head.getLong(0) == 0L)
      // 3. time travel: v1 (pre-delete) still serves all 60
      assert(spark.sql("SELECT count(*) FROM gmor.t VERSION AS OF 1")
        .head.getLong(0) == 60L)
      // 4. a LATER insert of matching ids is NOT hidden (the
      //    predicate is scoped to files older than its commit)
      spark.sql("INSERT INTO gmor.t SELECT id, -1 FROM range(25, 28)")
      assert(spark.sql(
        "SELECT count(*) FROM gmor.t WHERE id >= 20 AND id < 35")
        .head.getLong(0) == 3L, "re-inserted rows reappear")
      // 5. RENAME after the delete: the predicate follows the field
      //    id, so it still hides the old files' rows
      spark.sql("ALTER TABLE gmor.t RENAME COLUMN id TO key")
      assert(spark.sql("SELECT count(*) FROM gmor.t").head.getLong(0)
        == 48L)
      assert(spark.sql(
        "SELECT count(*) FROM gmor.t WHERE key = 22").head.getLong(0)
        == 0L, "renamed column: old rows stay deleted")
      // 6. stacked second MOR delete
      spark.sql("DELETE FROM gmor.t WHERE key < 5")
      assert(spark.sql("SELECT count(*) FROM gmor.t").head.getLong(0)
        == 43L)
      // 7. the column a live predicate references cannot be dropped
      intercept[Exception](
        spark.sql("ALTER TABLE gmor.t DROP COLUMN key"))
      // 8. the changelog serves the MOR deletes as typed rows with
      //    their pre-image values
      val ckpt = Files.createTempDirectory("gmor-ckpt").toString
      val out = Files.createTempDirectory("gmor-out").toString
      val q = spark.readStream.table("gmor.t__changes")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); q.stop()
      val log = spark.read.parquet(out)
        .select("key", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(log.filter(t => t._2 == "delete" && t._3 == 2L)
        .map(_._1).sorted.toSeq == (20L until 35L),
        "first delete's pre-image rows, typed")
      assert(log.count(_._2 == "insert") == 63,
        "both inserts arrive as inserts")
      // replay == state
      val state = log.groupBy(_._1).filter { case (_, evs) =>
        evs.count(_._2 == "insert") > evs.count(_._2 == "delete")
      }.keys.toSeq.sorted
      val want = spark.sql("SELECT key FROM gmor.t ORDER BY key")
        .collect().map(_.getLong(0)).toSeq
      assert(state == want, "replayed changelog == current snapshot")
      // 9. COMPACTION: one rewrite makes every predicate inert for
      //    current reads (same visible rows, all-fresh manifest),
      //    keeps time travel, contributes NO change rows, and
      //    releases the DROP guard
      val before = spark.sql("SELECT sum(key) FROM gmor.t").head.getLong(0)
      val ck = graft.io.AtomicSink.compact(spark, s"$root/t",
        spark.table("gmor.t").schema)
      assert(graft.io.AtomicSink.committedFiles(spark, s"$root/t")
        .forall(_.startsWith(s"v$ck-")), "compaction = replacement snapshot")
      assert(spark.sql("SELECT sum(key) FROM gmor.t").head.getLong(0)
        == before, "compaction changes nothing visible")
      assert(spark.sql("SELECT count(*) FROM gmor.t VERSION AS OF 1")
        .head.getLong(0) == 60L, "time travel intact after compaction")
      val q2 = spark.readStream.table("gmor.t__changes")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination(); q2.stop()
      assert(spark.read.parquet(out).count() == log.length,
        "a compaction contributes no change rows")
      // the SAME column step 7 refused now drops: predicates inert
      spark.sql("ALTER TABLE gmor.t DROP COLUMN key")
      assert(spark.table("gmor.t").schema.fieldNames.toSeq == Seq("v"))
      // 10. current reads stay fine after the drop (predicates inert),
      //     and TIME TRAVEL into the retired predicate's live range is
      //     served CORRECTLY under the snapshot's OWN schema (round-14
      //     change, the Iceberg contract): commit 2 predates both the
      //     rename and the drop, so it reads through schema v1 — the
      //     column is named `id` again, the dropped column evaluates,
      //     and the MOR predicate applies exactly
      assert(spark.sql("SELECT count(*) FROM gmor.t").head.getLong(0)
        == 43L)
      val tt = spark.sql(
        "SELECT count(*) AS n, min(id) AS lo FROM gmor.t VERSION AS OF 2")
        .head
      assert(tt.getLong(0) == 45L,
        "historical read applies the retired predicate under the old schema")
      assert(tt.getLong(1) == 0L)
      assert(spark.sql("SELECT * FROM gmor.t VERSION AS OF 2")
        .schema.fieldNames.toSeq == Seq("id", "v"),
        "time travel serves the snapshot's own schema (pre-rename name)")
      // post-rename, pre-drop commit 4: column named `key`
      assert(spark.sql("SELECT * FROM gmor.t VERSION AS OF 4")
        .schema.fieldNames.toSeq == Seq("key", "v"))
      spark.sql("DROP TABLE gmor.t")
    } finally spark.conf.unset("spark.graft.atomic.deleteMode")
  }

  test("merge-on-read + VACUUM: expiring pre-delete snapshots keeps " +
    "the current (predicate-filtered) view exact and reads expired " +
    "versions as empty, never as un-deleted rows") {
    val root = Files.createTempDirectory("graft-morvac").toString
    spark.conf.set("spark.sql.catalog.gmv", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gmv.root", root)
    spark.conf.set("spark.graft.atomic.deleteMode", "mor")
    try {
      spark.sql("CREATE TABLE gmv.t (id BIGINT)")
      spark.sql("INSERT INTO gmv.t SELECT id FROM range(0, 40)")
      spark.sql("DELETE FROM gmv.t WHERE id < 10")
      graft.io.AtomicSink.expireSnapshots(s"$root/t", keepLast = 1)
      // current view: predicate still applies to the carried files
      assert(spark.sql("SELECT count(*) FROM gmv.t").head.getLong(0)
        == 30L)
      assert(spark.sql("SELECT min(id) FROM gmv.t").head.getLong(0)
        == 10L)
      // the expired pre-delete snapshot reads EMPTY (manifest gone),
      // never as 40 un-deleted rows
      assert(spark.sql("SELECT count(*) FROM gmv.t VERSION AS OF 1")
        .head.getLong(0) == 0L)
      spark.sql("DROP TABLE gmv.t")
    } finally spark.conf.unset("spark.graft.atomic.deleteMode")
  }

  test("expiration guard: a commit-feed consumer whose offset " +
    "precedes the earliest retained version FAILS loudly instead of " +
    "serving empty batches; failOnDataLoss=false skips with a warning") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-catalog-vac").toString
    spark.conf.set("spark.sql.catalog.gvac", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gvac.root", root)
    spark.sql("CREATE TABLE gvac.t (id BIGINT)")
    spark.sql("INSERT INTO gvac.t SELECT id FROM range(0, 10)")
    spark.sql("INSERT INTO gvac.t SELECT id FROM range(10, 30)")
    spark.sql("INSERT INTO gvac.t SELECT id FROM range(30, 40)")
    graft.io.AtomicSink.expireSnapshots(s"$root/t", keepLast = 1)
    def drain(opts: Map[String, String]): Long = {
      val ckpt = Files.createTempDirectory("gvac-ckpt").toString
      val out = Files.createTempDirectory("gvac-out").toString
      val q = spark.readStream.options(opts).table("gvac.t")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q.stop()
      spark.read.parquet(out).count()
    }
    val e = intercept[Exception](drain(Map.empty))
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("expired"), rootMsg(e))
    // explicit opt-in skips the lost commits and serves the rest:
    // only v3's FRESH rows arrive (v1/v2's rows belonged to the
    // expired commits' batches — that is exactly the loss the
    // default guards against)
    assert(drain(Map("failOnDataLoss" -> "false")) == 10L)
    spark.sql("DROP TABLE gvac.t")
  }

  test("snapshot isolation across compaction: a reader pinned at v_k " +
    "serves exactly v_k's (predicate-filtered) state while OPTIMIZE " +
    "publishes v_{k+1}, and re-reads of the pin stay stable") {
    val root = Files.createTempDirectory("graft-morsi").toString
    spark.conf.set("spark.sql.catalog.gsi", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gsi.root", root)
    spark.conf.set("spark.graft.atomic.deleteMode", "mor")
    try {
      spark.sql("CREATE TABLE gsi.t (id BIGINT, v BIGINT)")
      spark.sql("INSERT INTO gsi.t SELECT id, id % 9 FROM range(0, 300)")
      spark.sql("DELETE FROM gsi.t WHERE id >= 100 AND id < 160")
      // the pinned reader plans BEFORE the compaction lands
      val pinned = spark.sql(
        "SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT)" +
          " AS s FROM gsi.t VERSION AS OF 2")
      val before = pinned.collect().head
      val ck = graft.io.AtomicSink.compact(spark, s"$root/t",
        spark.table("gsi.t").schema)
      assert(ck == 3)
      // v2's manifest and files are untouched by the compaction —
      // the pin re-reads identically, with the MOR predicate applied
      val after = pinned.collect().head
      assert(before == after, s"pinned read moved: $before vs $after")
      assert(after.getLong(0) == 240L)
      // and the pre-delete pin stays exact too
      assert(spark.sql("SELECT count(*) FROM gsi.t VERSION AS OF 1")
        .head.getLong(0) == 300L)
      // current read = compacted state, same visible rows
      assert(spark.sql("SELECT count(*) FROM gsi.t").head.getLong(0)
        == 240L)
      spark.sql("DROP TABLE gsi.t")
    } finally spark.conf.unset("spark.graft.atomic.deleteMode")
  }

  test("optimistic multi-writer: concurrent appends both commit " +
    "(neither lost), a waiting append resumes once the rival " +
    "publishes, basis-dependent ops refuse over an in-flight claim " +
    "and proceed after releaseClaim, a dead claim fails appends loudly") {
    val root = Files.createTempDirectory("graft-mw").toString
    spark.conf.set("spark.sql.catalog.gmw", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gmw.root", root)
    spark.sql("CREATE TABLE gmw.t (id BIGINT)")
    val dir = s"$root/t"
    // 1. two appends racing from two threads: both must commit
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def ins(lo: Int, hi: Int): Future[Unit] = Future {
      gate.await()
      spark.sql(s"INSERT INTO gmw.t SELECT id FROM range($lo, $hi)")
    }
    Await.result(Future.sequence(Seq(ins(0, 500), ins(500, 1000))), 90.seconds)
    assert(spark.sql("SELECT count(*) FROM gmw.t").head.getLong(0)
      == 1000L, "neither concurrent append lost")
    assert(graft.io.AtomicSink.versions(spark, dir) == Seq(1, 2),
      "two serialized commits")
    // 2. an append blocked on a rival's claim resumes once the
    //    rival's manifest publishes
    val fsDir = new java.io.File(dir)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, "_CLAIM.v3"))
    val blocked = Future {
      spark.sql("INSERT INTO gmw.t SELECT id FROM range(1000, 1100)")
    }
    Thread.sleep(300)
    assert(!blocked.isCompleted, "append waits behind the claim")
    // the "rival" publishes v3 as a carry of v2 (metadata-only commit)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "_MANIFEST.v2"),
      java.nio.file.Paths.get(dir, "_MANIFEST.v3"))
    Await.result(blocked, 90.seconds)
    assert(spark.sql("SELECT count(*) FROM gmw.t").head.getLong(0)
      == 1100L)
    assert(graft.io.AtomicSink.versions(spark, dir) == Seq(1, 2, 3, 4),
      "the waiting append took the next slot after the rival")
    // 3. basis-dependent ops REFUSE over an in-flight claim
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, "_CLAIM.v5"))
    spark.conf.set("spark.graft.atomic.deleteMode", "mor")
    try {
      val e1 = intercept[Exception](
        spark.sql("DELETE FROM gmw.t WHERE id < 10"))
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain(e1).exists(
        _.isInstanceOf[java.util.ConcurrentModificationException]), e1)
      val e2 = intercept[Exception](graft.io.AtomicSink.compact(
        spark, dir, spark.table("gmw.t").schema))
      assert(chain(e2).exists(
        _.isInstanceOf[java.util.ConcurrentModificationException]), e2)
      val e3 = intercept[Exception](
        spark.sql("UPDATE gmw.t SET id = -id WHERE id < 5"))
      assert(chain(e3).exists(
        _.isInstanceOf[java.util.ConcurrentModificationException]), e3)
      // 4. a dead claim fails APPENDS loudly after the wait budget...
      val prev = sys.props.put("graft.atomic.claimWaitMs", "250")
      try {
        val e4 = intercept[Exception](
          spark.sql("INSERT INTO gmw.t SELECT 1"))
        assert(chain(e4).exists(t =>
          Option(t.getMessage).exists(_.contains("never published"))), e4)
      } finally prev match {
        case Some(v) => sys.props.put("graft.atomic.claimWaitMs", v)
        case None => sys.props.remove("graft.atomic.claimWaitMs")
      }
      // ...and releaseClaim unblocks everything
      assert(graft.io.AtomicSink.releaseClaim(dir, 5))
      spark.sql("DELETE FROM gmw.t WHERE id < 10")
      assert(spark.sql("SELECT count(*) FROM gmw.t").head.getLong(0)
        == 1090L)
    } finally spark.conf.unset("spark.graft.atomic.deleteMode")
    assert(fsDir.isDirectory)
    spark.sql("DROP TABLE gmw.t")
  }

  test("SQL UPDATE and MERGE INTO: group-based copy-on-write rewrites " +
    "publish ONE replacement snapshot each — exact arms, time travel " +
    "intact, changelog replay equality") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-catalog-dml").toString
    spark.conf.set("spark.sql.catalog.gdml", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gdml.root", root)
    spark.sql("CREATE TABLE gdml.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdml.t SELECT id, id % 10 FROM range(0, 100)")
    // --- UPDATE: one replacement snapshot (v2), exact new state
    spark.sql("UPDATE gdml.t SET v = v + 100 WHERE id < 20")
    assert(spark.sql("SELECT sum(v) FROM gdml.t").head.getLong(0)
      == 2450L, "update arm applied to exactly the predicate's rows")
    assert(spark.sql("SELECT count(*) FROM gdml.t").head.getLong(0)
      == 100L)
    // RUNTIME GROUP FILTERING: only files holding id < 20 rewrite;
    // the rest of v1's files carry forward by reference
    val afterUpdate = graft.io.AtomicSink.committedFiles(spark, s"$root/t")
    assert(afterUpdate.exists(_.startsWith("v2-")),
      s"matched files republished: $afterUpdate")
    assert(afterUpdate.exists(_.startsWith("v1-")),
      s"untouched files carried by reference: $afterUpdate")
    assert(spark.sql("SELECT sum(v) FROM gdml.t VERSION AS OF 1")
      .head.getLong(0) == 450L, "pre-update snapshot intact")
    // --- MERGE: delete / update / insert arms in one commit (v3)
    spark.sql(
      """MERGE INTO gdml.t t
        |USING (SELECT id, CASE WHEN id % 2 = 1 THEN -1L
        |                       ELSE id * 2 END AS v
        |       FROM range(90, 110)) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
        |""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gdml.t").head.getLong(0)
      == 105L, "100 - 5 matched-deletes + 10 not-matched-inserts")
    assert(spark.sql("SELECT sum(v) FROM gdml.t").head.getLong(0)
      == 4380L, "matched-update + insert arms exact")
    val afterMerge = graft.io.AtomicSink.committedFiles(spark, s"$root/t")
    assert(afterMerge.exists(_.startsWith("v3-")) &&
      afterMerge.exists(!_.startsWith("v3-")),
      s"MERGE rewrites only the matched files, carries the rest: $afterMerge")
    assert(spark.sql("SELECT sum(v) FROM gdml.t VERSION AS OF 2")
      .head.getLong(0) == 2450L, "pre-merge snapshot intact")
    // --- changelog replay equality across insert/update/merge commits
    val ckpt = Files.createTempDirectory("gdml-ckpt").toString
    val out = Files.createTempDirectory("gdml-out").toString
    val q = spark.readStream.table("gdml.t__changes")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(); q.stop()
    val log = spark.read.parquet(out)
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val state = log.groupBy(_._1).collect {
      case (id, evs)
        if evs.count(_._3 == "insert") > evs.count(_._3 == "delete") =>
        id -> evs.filter(_._3 == "insert").maxBy(_._4)._2
    }.toSeq.sortBy(_._1)
    val want = spark.sql("SELECT id, v FROM gdml.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(state == want, "replayed changelog == post-merge snapshot")
    spark.sql("DROP TABLE gdml.t")
  }

  test("flat-format guard: CREATE TABLE with a struct/array column " +
    "is refused at create time with the JSON-string guidance — the " +
    "permanent close-out of nested field-id evolution") {
    val root = Files.createTempDirectory("graft-flat").toString
    spark.conf.set("spark.sql.catalog.gfl", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gfl.root", root)
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gfl.t (id BIGINT, props STRUCT<a: BIGINT>)"))
    assert(e.getMessage.contains("flat") ||
      Option(e.getCause).exists(_.getMessage.contains("flat")),
      s"struct refusal must be loud and explanatory: ${e.getMessage}")
    intercept[Exception](spark.sql(
      "CREATE TABLE gfl.t2 (id BIGINT, xs ARRAY<BIGINT>)"))
    // the documented alternative works: JSON in a STRING cell
    spark.sql("CREATE TABLE gfl.t3 (id BIGINT, props STRING)")
    spark.sql("""INSERT INTO gfl.t3 VALUES (1, '{"a": 7}')""")
    assert(spark.sql(
      "SELECT get_json_object(props, '$.a') FROM gfl.t3")
      .head.getString(0) == "7")
    spark.sql("DROP TABLE gfl.t3")
  }

  test("claim atomicity under a real race: 4 threads x 3 appends " +
    "each — every commit lands, none lost, versions are exactly 1..12") {
    // the r14-advice scenario: RawLocalFileSystem.create(overwrite=
    // false) is exists-then-truncate, so two racers could both claim
    // a version and the later manifest rename silently dropped the
    // earlier append; the NIO O_CREAT|O_EXCL claim makes the race
    // winner unique. 12 concurrent commits give the race real odds.
    val dir = Files.createTempDirectory("graft-race").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (0 until 4).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit =
            (0 until 3).foreach { i =>
              val lo = (w * 3 + i) * 100L
              (lo until lo + 100L).map(x => (x, x * 2.0))
                .toDF("id", "v").coalesce(1)
                .write.format(fmt).mode("append").save(dir)
            }
        })
      }
      tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(graft.io.AtomicSink.versions(spark, dir) == (1 to 12),
      "12 concurrent appends = versions exactly 1..12")
    // bare-path snapshots don't accumulate — but every snapshot must
    // hold exactly its own 100 rows and the 12 manifests partition
    // the 1200 ids with no loss and no duplication
    val allIds = (1 to 12).flatMap { v =>
      val files = graft.io.AtomicSink.committedFiles(spark, dir, v)
      assert(files.forall(_.startsWith(s"v$v-")),
        s"v$v manifest lists only its own files: $files")
      spark.read.option("sep", "\t").schema("id LONG, v DOUBLE")
        .csv(files.map(f => s"$dir/$f"): _*)
        .select($"id").as[Long].collect().toSeq
    }
    assert(allIds.size == 1200 && allIds.distinct.size == 1200,
      s"no commit lost, no rows duplicated: ${allIds.size}")
  }

  test("VACUUM vs a LIVE writer: expiration removes only inert claims " +
    "of dropped versions — an in-flight claimed-but-unpublished " +
    "commit keeps its claim and its staging dir, and can still publish") {
    val dir = Files.createTempDirectory("graft-vac-claim").toString
    def write(lo: Long, hi: Long): Unit =
      (lo until hi).map(i => (i, i * 2.0)).toDF("id", "v")
        .repartition(2).write.format(fmt).mode("append").save(dir)
    write(0L, 10L); write(10L, 20L); write(20L, 30L)
    assert(graft.io.AtomicSink.versions(spark, dir) == Seq(1, 2, 3))
    // a LIVE writer mid-commit: claim v4 held, staging dir populated,
    // manifest not yet published
    val claim = new java.io.File(dir, "_CLAIM.v4")
    assert(claim.createNewFile())
    val staging = new java.io.File(dir, "_staging_livewriter")
    assert(staging.mkdir())
    java.nio.file.Files.writeString(
      staging.toPath.resolve("part-00000-9"), "42\t84.0\n")
    graft.io.AtomicSink.expireSnapshots(dir, keepLast = 1)
    // dropped versions lose their (inert) claims; the live claim and
    // the live writer's staged data survive
    assert(!new java.io.File(dir, "_CLAIM.v1").exists(),
      "inert claim of a dropped version is swept")
    assert(claim.isFile, "the LIVE claim must survive VACUUM")
    assert(staging.isDirectory &&
      staging.toPath.resolve("part-00000-9").toFile.isFile,
      "the LIVE writer's staging dir must survive VACUUM")
    // the live writer can still finish: a fourth commit publishes
    // normally after releasing the synthetic claim
    assert(graft.io.AtomicSink.releaseClaim(dir, 4))
    write(30L, 40L)
    assert(graft.io.AtomicSink.versions(spark, dir).last == 4)
    assert(spark.read.option("sep", "\t").schema("id LONG, v DOUBLE")
      .csv(graft.io.AtomicSink.committedFiles(spark, dir)
        .map(f => s"$dir/$f"): _*).count() == 10L,
      "the live writer's commit published its own snapshot")
    assert(graft.io.AtomicSink.committedFiles(spark, dir, 3).nonEmpty,
      "the retained v3 snapshot stayed readable through it all")
  }
}
