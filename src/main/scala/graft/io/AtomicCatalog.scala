package graft.io

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 TableCatalog over [[AtomicSink]] snapshot directories — the
  * catalog face that turns the path-based atomic sink into a SQL
  * table with full lifecycle: `CREATE TABLE gtab.t (…)`,
  * `INSERT INTO` (one snapshot per commit), `SELECT` (latest
  * snapshot), `SELECT … VERSION AS OF n` (time travel through the
  * retained versioned manifests), row-level
  * `DELETE FROM … WHERE …` (copy-on-write: survivors republish as a
  * NEW snapshot, so history stays readable), and `DROP TABLE`. The
  * function twin is [[graft.functions.GraftFunctionCatalog]] (q325);
  * together the engine's SQL surface needs no Scala imports at all.
  *
  * Layout: one directory per table under `root`
  * (`spark.sql.catalog.<name>.root`), the declared schema persisted
  * as VERSIONED `_SCHEMA.v<N>` JSON next to the manifests — v1 at
  * CREATE, one more per ALTER, highest read at every load, so
  * executors and later sessions agree on types without inference.
  * Fields carry Iceberg-style ids (`graft.field.id` metadata) and
  * every commit records its column layout (`_LAYOUT.v<N>`), which is
  * what makes RENAME/DROP COLUMN safe over immutable files and the
  * virtual `<t>__changes` changelog sub-table serveable.
  *
  * Concurrency scope matches the sink: one WRITER per table at a
  * time; readers are always safe (they resolve one manifest and
  * never see a torn snapshot).
  */
/** q337's driver: the full SQL lifecycle against [[AtomicCatalog]] —
  * CREATE, closed-form INSERT, row-level DELETE, and a final SELECT
  * joining the post-delete state with a `VERSION AS OF 1` count, so
  * the oracle row pins BOTH that the delete removed exactly the
  * predicate's rows and that the pre-delete snapshot stayed readable.
  * One temp root per JVM; a fresh table name per invocation keeps
  * repeated bench passes independent; the bounded collect is the
  * 7-row group domain (freeing the table for DROP before returning).
  */
object CatalogLifecycle {
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-gtab").toString

  /** Runs `body` with `spark.sql.shuffle.partitions` clamped to
    * `parts`, restoring the session value after. The streaming drains
    * below aggregate a few hundred rows in complete mode — their cost
    * is NOT the data but the per-partition state stores each
    * micro-batch opens (shuffle.partitions × batches instances; the
    * bench session runs 32 partitions, so a 3-batch drain pays ~100
    * state-store setups for 800 rows). Fixing the stream's partition
    * count at source scale cuts the q350/q342 floor roughly in half
    * without touching semantics — the aggregate is the same, only its
    * parallelism changes. */
  private def withShuffleParts[T](
      spark: org.apache.spark.sql.SparkSession, parts: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, parts.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Runs a lane's WHOLE scripted lifecycle under source-scale local
    * parallelism: shuffle partitions AND leaf parallelism (the
    * `range()` leaves the scripts insert from) clamped to `parts`,
    * both restored after. The scripts build fixed few-hundred-row test
    * tables, so their write parallelism is a lane constant like the
    * table sizes themselves — under the bench session's 32-way
    * defaults every INSERT scattered into 32 ~10-row files (an
    * anti-pattern layout at ANY scale, guide §6) and every downstream
    * scan/rewrite/micro-batch then paid ~32 tasks per stage for ~1000
    * rows (measured: 170-360 tasks/lane, 30-45% of lane wall time).
    * Production writes through the sink are untouched: this clamps
    * only the scripted drivers. Flags pinned by these lanes stay
    * multi-file where they need to be (4-way inserts still produce
    * >1 file per commit; q344's scaladoc already pins "exact count
    * varies with insert parallelism" as out of scope). */
  /** The scripted drivers' local write/drain parallelism — a LANE
    * constant like the few-hundred-row test-table sizes themselves
    * (derivable bound: every scripted table here is <= ~2,100 rows
    * and every streaming drain below groups a <= 10-key domain, so
    * four-way parallelism keeps multi-file/multi-partition layouts
    * where flags pin them while removing the 32-way scatter tax);
    * production writes through the sink are untouched.
    * [[graft.streaming.Clamp.BoundedDrainParts]] is the same choice
    * for the standalone streaming lanes. */
  private[io] val ScriptedDriverParts = 4

  private def script[T](
      spark: org.apache.spark.sql.SparkSession,
      parts: Int = ScriptedDriverParts)(
      body: => T): T = {
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.leafNodeDefaultParallelism")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, parts.toString))
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  def tableDelete(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, grp BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, id % 7, (id * id) % 101 FROM range(1000)")
    spark.sql(s"DELETE FROM gtab.$t WHERE id < 50 OR grp = 3")
    val out = spark.sql(
      s"""SELECT g.grp, g.n, g.v_sum, v1.v1_rows FROM
         |  (SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |     CAST(sum(v) AS BIGINT) AS v_sum
         |   FROM gtab.$t GROUP BY grp) g
         |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS v1_rows
         |    FROM gtab.$t VERSION AS OF 1) v1
         |ORDER BY g.grp""".stripMargin)
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("grp")
    }
  }

  /** q344's driver: snapshot EXPIRATION (VACUUM) — two appends and a
    * copy-on-write delete build three snapshots, then
    * `expireSnapshots(keepLast = 1)` drops the two pre-delete
    * manifests and the delete's now-unreachable pre-image files. The
    * oracle row pins the surviving table, that exactly one version
    * remains, that the expired `VERSION AS OF 1` reads EMPTY, and
    * that files were really deleted (count > 0 — the exact count
    * varies with insert parallelism, so only the flag is pinned). */
  def snapshotExpire(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, (id * 3) % 13 FROM range(0, 400)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, (id * 3) % 13 FROM range(400, 1000)")
    spark.sql(s"DELETE FROM gtab.$t WHERE id < 100")
    val dir = s"$root/$t"
    val (kept, removed) = AtomicSink.expireSnapshots(dir, keepLast = 1)
    val v1Rows = spark.sql(
      s"SELECT count(*) FROM gtab.$t VERSION AS OF 1").head.getLong(0)
    val out = spark.sql(
      s"""SELECT (id % 3) AS g, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS v_sum
         |FROM gtab.$t GROUP BY 1 ORDER BY 1""".stripMargin)
      .withColumn("versions_left",
        lit(AtomicSink.versions(spark, dir).size.toLong))
      .withColumn("expired_v1_rows", lit(v1Rows))
      .withColumn("files_removed_gt0",
        lit(if (removed > 0) 1L else 0L))
      .withColumn("versions_kept", lit(kept.toLong))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q345's driver: SCHEMA EVOLUTION — `ALTER TABLE … ADD COLUMN`
    * between two inserts; rows written before the change are short on
    * disk and read back NULL in the new column (both scan paths pad),
    * so the aggregate distinguishes pre/post rows exactly — which is
    * what the closed-form oracle pins. */
  def schemaEvolution(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, id % 7 FROM range(0, 500)")
    spark.sql(s"ALTER TABLE gtab.$t ADD COLUMN extra BIGINT")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, id % 7, id % 11 FROM range(500, 800)")
    val out = spark.sql(
      s"""SELECT (id % 2) AS g, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN extra IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_pre_alter,
         |  CAST(sum(coalesce(extra, -1)) AS BIGINT) AS extra_sum
         |FROM gtab.$t GROUP BY 1 ORDER BY 1""".stripMargin)
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q350's driver: the op-typed CHANGELOG — two closed-form inserts
    * and a predicate DELETE build three commits, then the virtual
    * `<t>__changes` sub-table streams the table's history: every
    * inserted row arrives once as `insert` (the survivor REWRITE the
    * delete published is NOT replayed), the delete's victims arrive
    * as `delete` with their full pre-image row. The aggregate over
    * (change type, group) is closed-form; n_batches pins the
    * commit-granular drain (3 data micro-batches). */
  def commitChangelog(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, (id * id) % 97 FROM range(0, 300)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, (id * id) % 97 FROM range(300, 800)")
    // the delete lands MERGE-ON-READ: the changelog face is identical
    // (typed pre-image rows from the CDC sidecar either way — pinned
    // by AtomicSinkSpec's MOR test) and the setup skips the survivor
    // rewrite job, which was a third of this lane's cost
    val prevMode = spark.conf.getOption("spark.graft.atomic.deleteMode")
    spark.conf.set("spark.graft.atomic.deleteMode", "mor")
    try spark.sql(s"DELETE FROM gtab.$t WHERE id < 150 OR id >= 650")
    finally prevMode match {
      case Some(m) => spark.conf.set("spark.graft.atomic.deleteMode", m)
      case None => spark.conf.unset("spark.graft.atomic.deleteMode")
    }
    val name = "changelog_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-changelog").toString
    val q = withShuffleParts(spark, ScriptedDriverParts) {
      val q0 = spark.readStream.table(s"gtab.${t}__changes")
        .groupBy(col("_change_type").as("op"), (col("id") % 5).as("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("v_sum"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q0.awaitTermination()
      q0
    }
    q.stop()
    val nBatches = q.recentProgress.count(_.numInputRows > 0).toLong
    val out = spark.table(name)
      .withColumn("n_batches", lit(nBatches))
      .orderBy("op", "g")
    val rows = out.collect()
    spark.catalog.dropTempView(name)
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("op", "g")
    }
  }

  /** q351's driver: FIELD-ID SCHEMA EVOLUTION — rename, drop and add
    * between two inserts. Old files serve the renamed column's values
    * under its new name (same field id), the dropped column's cells
    * are never projected, and the post-drop ADD takes a FRESH id so
    * old rows read NULL in it rather than leaking the dropped bytes
    * (the positional-read trap the id mapping exists to prevent) —
    * all of which the closed-form oracle pins. */
  def schemaEvolutionIds(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, a BIGINT, b BIGINT)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, id % 7, id % 5 FROM range(0, 500)")
    spark.sql(s"ALTER TABLE gtab.$t RENAME COLUMN a TO x")
    spark.sql(s"ALTER TABLE gtab.$t DROP COLUMN b")
    spark.sql(s"ALTER TABLE gtab.$t ADD COLUMN c BIGINT")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, id % 7, id % 3 FROM range(500, 800)")
    val out = spark.sql(
      s"""SELECT (id % 2) AS g, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS BIGINT) AS x_sum,
         |  CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_c_null,
         |  CAST(sum(coalesce(c, 0)) AS BIGINT) AS c_sum
         |FROM gtab.$t GROUP BY 1 ORDER BY 1""".stripMargin)
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q353's driver: MERGE-ON-READ DELETE — the predicate publishes as
    * a manifest-only commit (`_DELETES.v<k>`; no surviving row is
    * rewritten — the only honest DELETE cost at 100 TB) and readers
    * hide matching rows in files OLDER than the delete. The oracle
    * pins the visible aggregate, the pre-delete time travel, that a
    * post-delete insert of matching ids reappears (predicate scope),
    * and the no-rewrite flag (the delete commit's manifest lists no
    * fresh data files). */
  def morDelete(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    spark.conf.set("spark.graft.atomic.deleteMode", "mor")
    try {
      val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
      spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO gtab.$t " +
        s"SELECT id, (id * id) % 89 FROM range(0, 600)")
      spark.sql(s"INSERT INTO gtab.$t " +
        s"SELECT id, (id * id) % 89 FROM range(600, 1000)")
      spark.sql(s"DELETE FROM gtab.$t WHERE id >= 200 AND id < 350")
      // scope: a post-delete insert of previously-deleted ids stays
      spark.sql(s"INSERT INTO gtab.$t " +
        s"SELECT id, -7 FROM range(210, 220)")
      val dir = s"$root/$t"
      val noRewrite = AtomicSink
        .committedFiles(spark, dir, 3) // the delete's own commit
        .forall(!_.startsWith("v3-"))
      val v2Rows = spark.sql(
        s"SELECT count(*) FROM gtab.$t VERSION AS OF 2").head.getLong(0)
      val out = spark.sql(
        s"""SELECT (id % 4) AS g, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(v) AS BIGINT) AS v_sum
           |FROM gtab.$t GROUP BY 1 ORDER BY 1""".stripMargin)
        .withColumn("pre_delete_rows", lit(v2Rows))
        .withColumn("no_rewrite", lit(if (noRewrite) 1L else 0L))
      val rows = out.collect()
      spark.sql(s"DROP TABLE gtab.$t")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
        .orderBy("g")
    } finally spark.conf.unset("spark.graft.atomic.deleteMode")
    }
  }

  /** q354's driver: SQL `MERGE INTO` — Spark's GROUP-BASED row-level
    * rewrite over the catalog table (the Iceberg copy-on-write MERGE
    * shape with RUNTIME GROUP FILTERING): a dynamic-pruning subquery
    * computes the `_file` set holding MATCHED rows, the rewrite scans
    * only those files, and the commit replaces exactly them — every
    * untouched file carries forward by reference in the same
    * two-phase commit as every write. The oracle pins the merged
    * state in closed form, the pre-merge `VERSION AS OF` count, and
    * the group_filtered flag (the post-merge manifest holds BOTH
    * carried pre-merge files and fresh merge-version files —
    * planner-derived, the q342 convention). */
  def sqlMerge(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, (id * id) % 83 FROM range(0, 800)")
    spark.sql(
      s"""MERGE INTO gtab.$t dst
         |USING (SELECT id, CASE WHEN id % 3 = 0 THEN -1L
         |                       ELSE id * 2 END AS v
         |       FROM range(600, 1000)) src
         |ON dst.id = src.id
         |WHEN MATCHED AND src.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.v)
         |""".stripMargin)
    val dir = s"$root/$t"
    val mergeV = AtomicSink.versions(spark, dir).last
    val after = AtomicSink.committedFiles(spark, dir)
    // group filtering proof: untouched files carried by reference
    // (pre-merge version prefixes survive) AND matched files were
    // rewritten (fresh merge-version files exist)
    val groupFiltered = after.exists(!_.startsWith(s"v$mergeV-")) &&
      after.exists(_.startsWith(s"v$mergeV-"))
    val v1Rows = spark.sql(
      s"SELECT count(*) FROM gtab.$t VERSION AS OF 1").head.getLong(0)
    val out = spark.sql(
      s"""SELECT (id % 7) AS g, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS v_sum
         |FROM gtab.$t GROUP BY 1 ORDER BY 1""".stripMargin)
      .withColumn("pre_merge_rows", lit(v1Rows))
      .withColumn("group_filtered", lit(if (groupFiltered) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q361's driver: MERGE-ON-READ `MERGE INTO`
    * (`spark.graft.atomic.dmlMode = mor`, the delta-based
    * SupportsDelta shape): the SAME merge script as q354, but the
    * commit publishes equality-delete pre-images (`v<k>-eqdel-*`,
    * referenced from `_DELETES.v<k>`) next to fresh insert files and
    * REWRITES NOTHING — every pre-merge file carries by reference
    * (no_rewrite flag: the post-merge manifest still contains every
    * pre-merge file). Write cost ∝ changed rows — the honest MERGE
    * when matches smear across most files and runtime group filtering
    * can't narrow. The oracle pins the identical merged state as
    * q354's closed form plus the flags. */
  def sqlMergeMor(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, (id * id) % 83 FROM range(0, 800)")
    val dir = s"$root/$t"
    val before = AtomicSink.committedFiles(spark, dir)
    spark.conf.set("spark.graft.atomic.dmlMode", "mor")
    try spark.sql(
      s"""MERGE INTO gtab.$t dst
         |USING (SELECT id, CASE WHEN id % 3 = 0 THEN -1L
         |                       ELSE id * 2 END AS v
         |       FROM range(600, 1000)) src
         |ON dst.id = src.id
         |WHEN MATCHED AND src.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.v)
         |""".stripMargin)
    finally spark.conf.unset("spark.graft.atomic.dmlMode")
    val mergeV = AtomicSink.versions(spark, dir).last
    val after = AtomicSink.committedFiles(spark, dir)
    // merge-on-read proof: NO pre-merge file was rewritten (all carry
    // by reference) and the commit published its equality-delete spec
    val noRewrite = before.toSet.subsetOf(after.toSet)
    val eqPublished = new java.io.File(dir, s"_DELETES.v$mergeV").isFile
    val v1Rows = spark.sql(
      s"SELECT count(*) FROM gtab.$t VERSION AS OF 1").head.getLong(0)
    val out = spark.sql(
      s"""SELECT (id % 7) AS g, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS v_sum
         |FROM gtab.$t GROUP BY 1 ORDER BY 1""".stripMargin)
      .withColumn("pre_merge_rows", lit(v1Rows))
      .withColumn("no_rewrite", lit(if (noRewrite) 1L else 0L))
      .withColumn("eq_published", lit(if (eqPublished) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q355's driver: SQL `UPDATE` — the same group-based rewrite with
    * only the update arm: one replacement commit, untouched rows
    * copied through, pre-update state time-travelable. The oracle
    * pins the post-update state, the pre-update `VERSION AS OF` sum,
    * and the one_commit flag. */
  def sqlUpdate(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, (id * 3) % 31 FROM range(0, 900)")
    spark.sql(s"UPDATE gtab.$t SET v = v * 2 + 1 WHERE id % 5 = 0")
    val dir = s"$root/$t"
    val updV = AtomicSink.versions(spark, dir).last
    val oneCommit = AtomicSink.committedFiles(spark, dir)
      .forall(_.startsWith(s"v$updV-"))
    val preSum = spark.sql(
      s"SELECT CAST(sum(v) AS BIGINT) FROM gtab.$t VERSION AS OF 1")
      .head.getLong(0)
    val out = spark.sql(
      s"""SELECT (id % 6) AS g, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS v_sum
         |FROM gtab.$t GROUP BY 1 ORDER BY 1""".stripMargin)
      .withColumn("pre_update_v_sum", lit(preSum))
      .withColumn("one_commit", lit(if (oneCommit) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q356's driver: `CREATE TABLE … PARTITIONED BY` — identity
    * partitioning on the catalog: every commit clusters its rows and
    * splits files per partition value (`_PARTS.v<N>`), and a
    * partition predicate prunes manifest files AT PLAN TIME (the scan
    * never opens them). The oracle pins the partition-filtered
    * aggregate and the pruned flag (planned input partitions strictly
    * fewer than the manifest's files — planner-derived, the q342
    * convention). */
  def partitionedTable(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, g BIGINT, v BIGINT) " +
      s"PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, id % 6, (id * id) % 71 FROM range(0, 1200)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, id % 6, (id * 3) % 17 FROM range(1200, 1800)")
    val filtered = spark.sql(
      s"""SELECT (id % 4) AS b, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS v_sum
         |FROM gtab.$t WHERE g = 2 GROUP BY 1 ORDER BY 1""".stripMargin)
    val rows0 = filtered.collect()
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
    val planned = scans(filtered.queryExecution.executedPlan)
      .head.batch.planInputPartitions().length
    val total = AtomicSink.committedFiles(spark, s"$root/$t").size
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows0.toIndexedSeq, 1),
      filtered.schema)
      .withColumn("pruned", lit(if (planned < total) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("b")
    }
  }

  /** q359's driver: FILE-LEVEL MIN/MAX DATA SKIPPING — each commit
    * records per-file column bounds (`_MINMAX.v<N>`, field-id keyed),
    * and a range predicate on a NON-partition column drops manifest
    * files at plan time under the q356 rule (pruning is an
    * optimization, never a correctness dependency — every filter
    * stays residual). Three disjoint-range commits, a mid-range
    * filter; the oracle pins the filtered aggregate and the skipped
    * flag (planned input partitions strictly fewer than the
    * manifest's files — planner-derived, the q342 convention). At
    * 100 TB this is the second wall after partitioning: a selective
    * predicate on an ingest-ordered column must not open every file.
    */
  def dataSkipping(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    Seq((0, 900), (900, 1800), (1800, 2700)).foreach { case (lo, hi) =>
      spark.sql(s"INSERT INTO gtab.$t " +
        s"SELECT id, (id * id) % 89 FROM range($lo, $hi)")
    }
    val filtered = spark.sql(
      s"""SELECT (id % 4) AS b, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS v_sum
         |FROM gtab.$t WHERE id >= 900 AND id < 1800
         |GROUP BY 1 ORDER BY 1""".stripMargin)
    val rows0 = filtered.collect()
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
    val planned = scans(filtered.queryExecution.executedPlan)
      .head.batch.planInputPartitions().length
    val total = AtomicSink.committedFiles(spark, s"$root/$t").size
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows0.toIndexedSeq, 1),
      filtered.schema)
      .withColumn("skipped", lit(if (planned < total) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("b")
    }
  }

  /** q360's driver: the `<t>__history` METADATA TABLE — one row per
    * published commit (version, operation, file counts), derived
    * from the manifests/sidecars at scan time (the Iceberg
    * `.history`/`.snapshots` shape). A scripted
    * insert/insert/UPDATE/cow-DELETE/mor-DELETE/compact sequence pins
    * the full operation log: op typing per commit plus
    * has_fresh/has_carried (appends carry, the mor delete writes no
    * data files, the compaction carries nothing). */
  def historyTable(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // 6 sequential lifecycle ops over 600 rows: the cost is per-job
    // overhead, not data — clamp the rewrite joins' shuffle width
    withShuffleParts(spark, 8) {
      spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO gtab.$t " +
        s"SELECT id, (id * id) % 61 FROM range(0, 300)")
      spark.sql(s"INSERT INTO gtab.$t " +
        s"SELECT id, (id * id) % 61 FROM range(300, 600)")
      spark.sql(s"UPDATE gtab.$t SET v = -1 WHERE id < 100")
      spark.sql(s"DELETE FROM gtab.$t WHERE id >= 550 AND id < 580")
      spark.conf.set("spark.graft.atomic.deleteMode", "mor")
      try spark.sql(s"DELETE FROM gtab.$t WHERE v = -1")
      finally spark.conf.unset("spark.graft.atomic.deleteMode")
      AtomicSink.compact(spark, s"$root/$t", spark.table(s"gtab.$t").schema)
    }
    val out = spark.sql(
      s"""SELECT version, operation,
         |  CAST(CASE WHEN n_fresh > 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS has_fresh,
         |  CAST(CASE WHEN n_carried > 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS has_carried
         |FROM gtab.${t}__history ORDER BY version""".stripMargin)
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("version")
    }
  }

  /** q362's driver: the MULTI-STAGE PIPELINE HUB — the composition
    * the streaming write (q358) and the commit feed (q342) exist for:
    * stage 1 tails table A's commit-granular feed and streams the
    * transform into table B (`writeStream.toTable`, one
    * epoch-idempotent commit per micro-batch); stage 2 tails B's feed
    * into an aggregate. Every stage boundary is a durable versioned
    * table — restartable, time-travelable, exactly-once. Pins the
    * final aggregate (closed form), one commit per stage-1 epoch, and
    * stage 2 draining B commit-granularly. */
  def streamPipeline(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val a = s"a_$sfx"; val b = s"b_$sfx"
    spark.sql(s"CREATE TABLE gtab.$a (id BIGINT, v BIGINT)")
    spark.sql(s"CREATE TABLE gtab.$b (id BIGINT, v BIGINT)")
    Seq((0, 250), (250, 700), (700, 1000)).foreach { case (lo, hi) =>
      spark.sql(s"INSERT INTO gtab.$a " +
        s"SELECT id, (id * id) % 101 FROM range($lo, $hi)")
    }
    val ckpt1 = java.nio.file.Files
      .createTempDirectory("graft-pipe1").toString
    withShuffleParts(spark, ScriptedDriverParts) {
      val q1 = spark.readStream.table(s"gtab.$a")
        .select(col("id"), (col("v") * 3 + 2).as("v"))
        .writeStream
        .option("checkpointLocation", ckpt1)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"gtab.$b")
      q1.awaitTermination(); q1.stop()
    }
    val bCommits = AtomicSink.versions(spark, s"$root/$b").size.toLong
    val name = "pipe_" + sfx
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft-pipe2").toString
    val q2 = withShuffleParts(spark, ScriptedDriverParts) {
      val q0 = spark.readStream.table(s"gtab.$b")
        .groupBy((col("id") % 6).as("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("v_sum"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q0.awaitTermination()
      q0
    }
    q2.stop()
    val bBatches = q2.recentProgress.count(_.numInputRows > 0).toLong
    val out = spark.table(name)
      .withColumn("b_commits", lit(bCommits))
      .withColumn("b_batches", lit(bBatches))
      .orderBy("g")
    val rows = out.collect()
    spark.catalog.dropTempView(name)
    spark.sql(s"DROP TABLE gtab.$a")
    spark.sql(s"DROP TABLE gtab.$b")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q363's driver: SORTED COMPACTION × DATA SKIPPING — stats only
    * skip what layout separates: a scattered ingest (bijective
    * scramble, every file spans ~the whole key domain) defeats
    * min/max pruning (planned == total, pinned), one
    * `compactSorted("id")` range-clusters the snapshot into
    * disjoint-range files, and the SAME predicate then opens strictly
    * fewer files (pinned) with the aggregate unchanged — the Delta
    * OPTIMIZE-ZORDER maintenance story on the versioned catalog. */
  def dataClustering(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    // (range*997) % 2100 is a bijection on [0,2100): each task's
    // contiguous range slice scatters across the whole id domain, so
    // every file's [min,max] covers ~everything — no skipping possible
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT (id * 997) % 2100 AS id, " +
      s"(((id * 997) % 2100) * ((id * 997) % 2100)) % 73 AS v " +
      s"FROM range(0, 2100)")
    val dir = s"$root/$t"
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
    def measure(): (Int, Int, org.apache.spark.sql.DataFrame) = {
      val q = spark.sql(
        s"""SELECT (id % 3) AS b, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(v) AS BIGINT) AS v_sum
           |FROM gtab.$t WHERE id >= 1000 AND id < 1100
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      q.collect()
      (scans(q.queryExecution.executedPlan)
        .head.batch.planInputPartitions().length,
        AtomicSink.committedFiles(spark, dir).size, q)
    }
    val (plannedPre, totalPre, _) = measure()
    AtomicSink.compactSorted(spark, dir,
      spark.table(s"gtab.$t").schema, Seq("id"))
    val (plannedPost, totalPost, q) = measure()
    val out = q
      .withColumn("scattered_unskippable",
        lit(if (plannedPre == totalPre && totalPre > 1) 1L else 0L))
      .withColumn("clustered_skipped",
        lit(if (plannedPost < totalPost) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("b")
    }
  }

  /** q364's driver: BUCKETED TABLES + STORAGE-PARTITIONED JOIN —
    * `PARTITIONED BY (bucket(4, id))` clusters every commit's files
    * by the catalog's `bucket` function (tuples in `_PARTS`), a point
    * predicate opens only its key's bucket (bucket_pruned pinned),
    * and two co-bucketed tables EQUI-JOIN WITH ZERO SHUFFLE — the
    * scan reports KeyGroupedPartitioning over the catalog-resolved
    * bucket function and Spark's storage-partitioned-join planner
    * aligns the two sides split-for-split (no_shuffle pinned from the
    * executed plan, with auto-broadcast disabled so the flag can only
    * come from co-partitioning). At 100 TB this is THE fact-to-fact
    * join shape: the shuffle that isn't there. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val a = s"a_$sfx"; val b = s"b_$sfx"
    spark.sql(s"CREATE TABLE gtab.$a (id BIGINT, x BIGINT) " +
      s"PARTITIONED BY (bucket(4, id))")
    spark.sql(s"CREATE TABLE gtab.$b (id BIGINT, y BIGINT) " +
      s"PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO gtab.$a " +
      s"SELECT id, (id * id) % 67 FROM range(0, 3000)")
    spark.sql(s"INSERT INTO gtab.$b " +
      s"SELECT id, (id * 3) % 41 FROM range(1000, 4000)")
    def hasShuffle(p: org.apache.spark.sql.execution.SparkPlan)
        : Boolean = p match {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        true
      case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        hasShuffle(ad.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        hasShuffle(q.plan)
      case other => other.children.exists(hasShuffle)
    }
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(s)
        case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(ad.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case other => other.children.flatMap(scans)
      }
    val prevBucketing =
      spark.conf.get("spark.sql.sources.v2.bucketing.enabled", "false")
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (noShuffle, bucketPruned, rows0, outSchema) = try {
      val bare = spark.table(s"gtab.$a")
        .join(spark.table(s"gtab.$b"), "id")
      bare.collect()
      val ns = !hasShuffle(bare.queryExecution.executedPlan)
      val pointDf = spark.table(s"gtab.$a").filter(col("id") === 42)
      pointDf.collect()
      val planned = scans(pointDf.queryExecution.executedPlan)
        .head.batch.planInputPartitions().length
      val total = AtomicSink.committedFiles(spark, s"$root/$a").size
      val agg = spark.sql(
        s"""SELECT (a.id % 5) AS g, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(a.x + b.y) AS BIGINT) AS xy_sum
           |FROM gtab.$a a JOIN gtab.$b b ON a.id = b.id
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      (ns, planned < total, agg.collect(), agg.schema)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        prevBucketing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows0.toIndexedSeq, 1), outSchema)
      .withColumn("no_shuffle", lit(if (noShuffle) 1L else 0L))
      .withColumn("bucket_pruned", lit(if (bucketPruned) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$a")
    spark.sql(s"DROP TABLE gtab.$b")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q357's driver: partition-aware `INSERT OVERWRITE` — the static
    * face (`PARTITION (g = 3)`) replaces exactly that partition's
    * files, the dynamic face (`partitionOverwriteMode=dynamic`)
    * replaces exactly the partitions PRESENT in the incoming rows;
    * everything else carries by reference. The oracle pins the final
    * state in closed form, the pre-overwrite `VERSION AS OF` count,
    * and the carried flag (first-commit files still in the final
    * manifest — planner-derived, the q342 convention). */
  def partitionOverwrite(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, g BIGINT, v BIGINT) " +
      s"PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO gtab.$t " +
      s"SELECT id, id % 5, id FROM range(0, 1000)")
    spark.sql(s"INSERT OVERWRITE gtab.$t PARTITION (g = 3) " +
      s"SELECT id, -1L FROM range(0, 20)")
    val prevMode =
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE gtab.$t " +
      s"SELECT id, id % 2, 7777L FROM range(0, 40)")
    finally prevMode match {
      case Some(m) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val dir = s"$root/$t"
    val after = AtomicSink.committedFiles(spark, dir)
    val carried = after.exists(_.startsWith("v1-"))
    val v1Rows = spark.sql(
      s"SELECT count(*) FROM gtab.$t VERSION AS OF 1").head.getLong(0)
    val out = spark.sql(
      s"""SELECT g, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS v_sum
         |FROM gtab.$t GROUP BY 1 ORDER BY 1""".stripMargin)
      .withColumn("pre_overwrite_rows", lit(v1Rows))
      .withColumn("carried", lit(if (carried) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q342's driver: the COMMIT FEED — three closed-form `INSERT`s
    * land as three snapshots, then `spark.readStream.table` tails
    * the table under Trigger.AvailableNow; commit-granular admission
    * makes the stream drain in exactly three data micro-batches
    * (pinned as a column), and the accumulated complete-mode
    * aggregate must equal the union of the three inserts — which is
    * what the DuckDB twin computes in closed form. */
  def commitFeed(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE gtab.$t (id BIGINT, v BIGINT)")
    Seq((0, 300), (300, 800), (800, 1000)).foreach { case (lo, hi) =>
      spark.sql(s"INSERT INTO gtab.$t " +
        s"SELECT id, (id * id) % 97 FROM range($lo, $hi)")
    }
    val name = "commit_feed_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-commit-feed").toString
    val q = withShuffleParts(spark, ScriptedDriverParts) {
      val q0 = spark.readStream.table(s"gtab.$t")
        .groupBy((col("id") % 5).as("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("v_sum"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q0.awaitTermination()
      q0
    }
    q.stop()
    val nBatches = q.recentProgress.count(_.numInputRows > 0).toLong
    val out = spark.table(name)
      .withColumn("n_batches", lit(nBatches))
      .orderBy("g")
    val rows = out.collect()
    spark.catalog.dropTempView(name)
    spark.sql(s"DROP TABLE gtab.$t")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }

  /** q358's driver: STREAMING WRITE into the catalog —
    * `readStream.table(src) … writeStream.toTable(dst)` under
    * `Trigger.AvailableNow`: the source's commit-granular admission
    * serves its three snapshots as three micro-batches, and the sink
    * publishes EXACTLY one two-phase commit per non-empty epoch, each
    * carrying its `_EPOCH.v<N>` idempotence marker. The drain then
    * RESTARTS after the engine's LAST sink-commit log entry is
    * removed — the micro-batch engine replays the final epoch from
    * its recorded offsets (the at-least-once contract), and the
    * marker makes the sink publish NOTHING: `n_commits` stays 3 and
    * the aggregate shows no duplicate rows (`replay_no_dup` — both
    * planner-derived, the q342 convention). The oracle computes the
    * final state in closed form. Reference analogue: the resumable
    * at-least-once loader (etl_pipeline_spark.py:188-287), whose
    * duplicate-on-crash window this closes. */
  def streamWrite(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    script(spark) {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.catalog.gtab", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gtab.root", root)
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val src = s"src_$sfx"
    val dst = s"dst_$sfx"
    spark.sql(s"CREATE TABLE gtab.$src (id BIGINT, v BIGINT)")
    spark.sql(s"CREATE TABLE gtab.$dst (id BIGINT, v BIGINT)")
    Seq((0, 300), (300, 800), (800, 1000)).foreach { case (lo, hi) =>
      spark.sql(s"INSERT INTO gtab.$src " +
        s"SELECT id, (id * id) % 97 FROM range($lo, $hi)")
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-write").toString
    def drain(): Unit = withShuffleParts(spark, ScriptedDriverParts) {
      val q = spark.readStream.table(s"gtab.$src")
        .select(col("id"), (col("v") * 2 + 1).as("v"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"gtab.$dst")
      q.awaitTermination()
      q.stop()
    }
    drain()
    val dir = s"$root/$dst"
    val afterDrain = AtomicSink.versions(spark, dir)
    // force the at-least-once replay: drop the engine's LAST
    // sink-commit log entry — the restart re-runs the final epoch
    // against the same recorded offsets, exactly the crash window
    // between sink commit and engine commit-log write
    val commitsDir = new java.io.File(ckpt, "commits")
    val lastBatch = commitsDir.listFiles()
      .map(_.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toInt).max
    new java.io.File(commitsDir, lastBatch.toString).delete()
    // LocalFileSystem checksum sidecar — left behind, it blocks the
    // engine's re-publish rename of the replayed entry
    new java.io.File(commitsDir, s".$lastBatch.crc").delete()
    drain()
    val afterReplay = AtomicSink.versions(spark, dir)
    val out = spark.sql(
      s"""SELECT (id % 5) AS g, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS v_sum
         |FROM gtab.$dst GROUP BY 1 ORDER BY 1""".stripMargin)
      .withColumn("n_commits", lit(afterDrain.size.toLong))
      .withColumn("replay_no_dup",
        lit(if (afterReplay == afterDrain) 1L else 0L))
    val rows = out.collect()
    spark.sql(s"DROP TABLE gtab.$src")
    spark.sql(s"DROP TABLE gtab.$dst")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      .orderBy("g")
    }
  }
}

class AtomicCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      sys.props("java.io.tmpdir") + "/graft-atomic-catalog")
  }

  override def name(): String = catalogName

  private def fs = new Path(root).getFileSystem(new Configuration())

  private def dirOf(ident: Identifier): Path =
    new Path(new Path(root),
      (ident.namespace() :+ ident.name()).mkString("__"))

  /** Schema files are VERSIONED like manifests (`_SCHEMA.v<N>`,
    * highest wins): every publication — CREATE and each ALTER — is
    * one atomic rename to a never-pre-existing name, so no crash
    * window can leave a table with data but no schema (the round-12
    * advice against the previous delete-then-rename of a mutable
    * `_SCHEMA`). The legacy un-versioned `_SCHEMA` is still READ as
    * version 0 for pre-existing directories. Old schema versions are
    * retained (bytes-cheap) — they also make `nextFieldId` exact:
    * field ids are never reused even across a DROP. */
  private def schemaFile(dir: Path, v: Int): Path =
    new Path(dir, s"_SCHEMA.v$v")

  private def legacySchemaFile(dir: Path): Path = new Path(dir, "_SCHEMA")

  private def schemaVersions(dir: Path): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_SCHEMA.v") =>
        n.stripPrefix("_SCHEMA.v") }
      .flatMap(s => scala.util.Try(s.toInt).toOption).sorted

  private def hasSchema(dir: Path): Boolean =
    schemaVersions(dir).nonEmpty || fs.exists(legacySchemaFile(dir))

  /** (schema, appliesFromCommit, partitionFieldIds): the first COMMIT
    * version this schema serves reads for, and the table's identity
    * partition columns (by FIELD ID, so a partition column can be
    * renamed) — recorded since round 14 inside the schema JSON
    * (`{"appliesFromCommit":N,"partitionFieldIds":[…],"schema":{…}}`)
    * so `VERSION AS OF` can serve the snapshot's OWN schema (the
    * Iceberg/Delta contract) instead of the current one. Legacy files
    * are raw StructType JSON → appliesFrom None, no partitioning. */
  private def readSchemaAt(p: Path)
      : (StructType, Option[Long], Seq[Long], Option[(Long, Int)]) = {
    val in = fs.open(p)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val root =
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    if (root.has("appliesFromCommit")) {
      val pids = scala.collection.mutable.ArrayBuffer[Long]()
      if (root.has("partitionFieldIds")) {
        val it = root.get("partitionFieldIds").elements()
        while (it.hasNext) pids += it.next().asLong()
      }
      // bucketSpec: {"fieldId":<id>,"n":<buckets>} — PARTITIONED BY
      // (bucket(n, col)), stored by FIELD ID like identity partitions
      val bucket =
        if (!root.has("bucketSpec")) None
        else Some((root.get("bucketSpec").get("fieldId").asLong(),
          root.get("bucketSpec").get("n").asInt()))
      (DataType.fromJson(root.get("schema").toString)
        .asInstanceOf[StructType],
        Some(root.get("appliesFromCommit").asLong()), pids.toSeq, bucket)
    } else
      (DataType.fromJson(json).asInstanceOf[StructType], None, Seq.empty,
        None)
  }

  private def latestMeta(ident: Identifier)
      : (StructType, Seq[Long], Option[(Long, Int)]) = {
    val dir = dirOf(ident)
    schemaVersions(dir).lastOption match {
      case Some(v) =>
        val (s, _, pids, bucket) = readSchemaAt(schemaFile(dir, v))
        (s, pids, bucket)
      case None =>
        val legacy = legacySchemaFile(dir)
        if (!fs.exists(legacy)) throw new NoSuchTableException(ident)
        (readSchemaAt(legacy)._1, Seq.empty, None)
    }
  }

  private def readSchema(ident: Identifier): StructType =
    latestMeta(ident)._1

  /** The schema IN EFFECT at commit `commitV`: the highest schema
    * version whose `appliesFromCommit` ≤ commitV. Legacy schema
    * versions (no marker — written before round 14) count as
    * appliesFrom = 1, which degrades to the old serve-the-latest
    * behavior for fully-legacy tables and stays exact for tables
    * whose ALTERs all carry the marker. */
  private def schemaAtCommit(dir: Path, commitV: Int): Option[StructType] = {
    val cands = schemaVersions(dir)
      .map(sv => readSchemaAt(schemaFile(dir, sv)))
      .map { case (s, af, _, _) => (s, af.getOrElse(1L)) }
    cands.filter(_._2 <= commitV).lastOption.map(_._1)
  }

  /** Next unused field id: the max across EVERY retained schema
    * version (ids are never reused, even after a DROP removed one
    * from the current schema). */
  private def nextFieldId(dir: Path): Long = {
    val all = schemaVersions(dir)
      .map(v => readSchemaAt(schemaFile(dir, v))._1) ++
      (if (fs.exists(legacySchemaFile(dir)))
        Seq(readSchemaAt(legacySchemaFile(dir))._1) else Seq.empty)
    val ids = all.flatMap(_.fields.flatMap(AtomicSink.fieldIdOf))
    if (ids.isEmpty) 1L else ids.max + 1L
  }

  private def writeSchema(dir: Path, v: Int, schema: StructType,
      appliesFromCommit: Long, partitionFieldIds: Seq[Long],
      bucketSpec: Option[(Long, Int)] = None): Unit = {
    val tmp = new Path(dir, s"_SCHEMA.tmp-${java.util.UUID.randomUUID()}")
    val bucketJson = bucketSpec.map { case (id, n) =>
      s""","bucketSpec":{"fieldId":$id,"n":$n}""" }.getOrElse("")
    val payload =
      s"""{"appliesFromCommit":$appliesFromCommit,""" +
        s""""partitionFieldIds":${partitionFieldIds.mkString("[", ",", "]")}""" +
        bucketJson + s""","schema":${schema.json}}"""
    val out = fs.create(tmp, true)
    try out.write(payload.getBytes("UTF-8"))
    finally out.close()
    // atomic rename to a NEVER-pre-existing name — the commit point
    fs.rename(tmp, schemaFile(dir, v))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = new Path(root)
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && hasSchema(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  /** `<table>__changes` is a VIRTUAL read-only sub-table (the Iceberg
    * `.changes` shape): the table's op-typed changelog feed, schema =
    * base columns + `_change_type`/`_commit_version`, streaming reads
    * only. Not listed by [[listTables]]; resolves whenever the base
    * table exists. */
  override def loadTable(ident: Identifier): Table =
    if (ident.name().endsWith("__changes")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("__changes"))
      new AtomicSink.SinkTable(dirOf(base).toString, readSchema(base),
        changelog = true)
    } else if (ident.name().endsWith("__history")) {
      // `<t>__history`: the commit log as a read-only metadata table
      // (version/operation/file counts per published snapshot)
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("__history"))
      readSchema(base) // NoSuchTableException if the base is absent
      new AtomicSink.HistoryTable(dirOf(base).toString)
    } else {
      val (schema, pids, bucket) = latestMeta(ident)
      new AtomicSink.SinkTable(dirOf(ident).toString, schema,
        accumulateAppends = true, partitionFieldIds = pids,
        bucketSpec = bucket)
    }

  /** `VERSION AS OF v` — serves the pinned snapshot read-only, under
    * the schema IN EFFECT at that commit (round-14 change): a rename
    * shows the OLD column name, a later-added column is absent, and a
    * merge-on-read predicate whose column was dropped AFTER a
    * compaction still evaluates — the historical read is served
    * correctly instead of failing on the current schema. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.trim.toInt
    val schema = schemaAtCommit(dirOf(ident), v)
      .getOrElse(readSchema(ident))
    // partition/bucket specs apply to historical reads too (pruning
    // is optimization-never-correctness, so the era-schema lookup by
    // field id degrades safely if a spec column predates this commit)
    val (_, pids, bucket) = latestMeta(ident)
    new AtomicSink.SinkTable(dirOf(ident).toString, schema,
      pinnedVersion = Some(v), partitionFieldIds = pids,
      bucketSpec = bucket)
  }

  override def tableExists(ident: Identifier): Boolean =
    hasSchema(dirOf(ident))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // the table format is FLAT by design (one TSV cell per column,
    // long/double/string): struct/array/map columns are refused HERE,
    // loudly, instead of failing at first write — which also closes
    // nested field-id evolution permanently: there are no nested
    // fields to evolve (a `props` document column belongs in a STRING
    // JSON cell, the §2.11 shape)
    schema.fields.foreach { f =>
      require(f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.DoubleType ||
        f.dataType == org.apache.spark.sql.types.StringType,
        s"AtomicCatalog tables are flat (BIGINT/DOUBLE/STRING cells); " +
          s"column ${f.name} has unsupported type ${f.dataType.sql} — " +
          s"encode nested data as a JSON STRING column")
    }
    val dir = dirOf(ident)
    fs.mkdirs(dir)
    // assign FIELD IDS 1..n at birth: data files resolve columns by
    // id (through the per-commit `_LAYOUT.v<N>`), which is what makes
    // RENAME and DROP safe later — an id survives any name change
    val withIds = org.apache.spark.sql.types.StructType(
      schema.fields.zipWithIndex.map { case (f, i) =>
        AtomicSink.withFieldId(f, i + 1L) })
    // PARTITIONED BY: identity transforms on top-level columns only —
    // bucket/days/etc. are REFUSED loudly rather than silently
    // ignored (the round-13 behavior this replaces). The spec is
    // stored by FIELD ID, so a partition column survives RENAME;
    // each commit records its files' partition tuples (`_PARTS.v<N>`)
    // and the scan prunes manifest files against pushed
    // partition-column predicates.
    def fieldIdFor(names: Array[String], what: String): Long = {
      require(names.length == 1,
        s"$what supports top-level columns, got ${names.mkString(".")}")
      val f = withIds.fields.find(_.name == names(0)).getOrElse(
        throw new IllegalArgumentException(
          s"$what column ${names(0)} is not in the schema"))
      AtomicSink.fieldIdOf(f).get
    }
    // `bucket(n, col)` — hash partitioning for storage-partitioned
    // joins and point-lookup file pruning: bucket = ((v % n) + n) % n
    // over a BIGINT column (null → its own "" bucket). Stored by
    // field id like identity partitions; not combinable with them.
    val bucketSpec: Option[(Long, Int)] = partitions.toSeq.collectFirst {
      case t if t.name() == "bucket" && t.references().length == 1 =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          "bucket transform needs a numeric bucket count"))
        require(n > 0, s"bucket count must be positive, got $n")
        val id = fieldIdFor(t.references()(0).fieldNames(), "bucket")
        val col = withIds.fields.find(f =>
          AtomicSink.fieldIdOf(f).contains(id)).get
        require(col.dataType == org.apache.spark.sql.types.LongType,
          s"bucket column ${col.name} must be BIGINT, " +
            s"got ${col.dataType.sql}")
        (id, n)
    }
    val partitionFieldIds = partitions.toSeq.flatMap {
      case t if t.name() == "bucket" => None // handled above
      case t if t.name() == "identity" && t.references().length == 1 =>
        Some(fieldIdFor(t.references()(0).fieldNames(), "PARTITIONED BY"))
      case other => throw new UnsupportedOperationException(
        s"AtomicCatalog supports identity and bucket(n, col) " +
          s"PARTITIONED BY transforms only, got $other")
    }
    require(bucketSpec.isEmpty || partitionFieldIds.isEmpty,
      "bucket(n, col) cannot combine with identity partition columns")
    writeSchema(dir, 1, withIds, appliesFromCommit = 1L,
      partitionFieldIds, bucketSpec)
    new AtomicSink.SinkTable(dir.toString, withIds,
      accumulateAppends = true, partitionFieldIds = partitionFieldIds,
      bucketSpec = bucketSpec)
  }

  /** Schema evolution by FIELD ID — the Iceberg discipline: data
    * files never change; each commit's `_LAYOUT.v<N>` records which
    * field ids its cells hold, and readers resolve the CURRENT schema
    * against that mapping. Supported: top-level ADD COLUMN (fresh id,
    * appended), RENAME COLUMN (same id, new name — old files keep
    * serving the column), DROP COLUMN (id retired, never reused; old
    * files' cells for it are simply not projected). Refused: type
    * changes and repositions (FIRST/AFTER), which would reinterpret
    * existing bytes / break the id⇄position contract. Every ALTER
    * publishes `_SCHEMA.v<next>` by one atomic rename to a fresh
    * name — crash-safe, nothing is ever deleted. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val dir = dirOf(ident)
    val schema = readSchema(ident)
    // a LEGACY schema (no ids — written before field-id support) gets
    // positional ids 1..n first, matching how its files already read
    val based =
      if (schema.fields.forall(f => AtomicSink.fieldIdOf(f).isDefined))
        schema
      else org.apache.spark.sql.types.StructType(
        schema.fields.zipWithIndex.map { case (f, i) =>
          AtomicSink.withFieldId(f, i + 1L) })
    // `nextFieldId` scans only PERSISTED schemas; for a legacy table
    // the positional ids 1..n were just assigned in-memory above and
    // exist nowhere on disk, so it would hand out id 1 again and the
    // first ADD COLUMN would silently alias column 1 (idxMapFor
    // resolves both fields to the same cell — the positional-read
    // trap the id mapping exists to prevent). Fresh ids must clear
    // BOTH the persisted history and `based`.
    var freshId = math.max(nextFieldId(dir),
      based.fields.flatMap(AtomicSink.fieldIdOf)
        .foldLeft(0L)(math.max) + 1L)
    val next = changes.foldLeft(based) {
      case (s, add: TableChange.AddColumn) =>
        require(add.fieldNames().length == 1,
          "only top-level ADD COLUMN is supported")
        require(add.position() == null,
          "ADD COLUMN only appends (no FIRST/AFTER)")
        require(Seq("bigint", "double", "string")
          .contains(add.dataType().simpleString),
          s"AtomicSink columns are long/double/string, " +
            s"got ${add.dataType().simpleString}")
        require(!s.fieldNames.contains(add.fieldNames()(0)),
          s"column ${add.fieldNames()(0)} already exists")
        val f = AtomicSink.withFieldId(
          org.apache.spark.sql.types.StructField(
            add.fieldNames()(0), add.dataType(), add.isNullable),
          freshId)
        freshId += 1L
        org.apache.spark.sql.types.StructType(s.fields :+ f)
      case (s, ren: TableChange.RenameColumn) =>
        require(ren.fieldNames().length == 1,
          "only top-level RENAME COLUMN is supported")
        val from = ren.fieldNames()(0)
        require(s.fieldNames.contains(from), s"no such column $from")
        require(!s.fieldNames.contains(ren.newName()),
          s"column ${ren.newName()} already exists")
        org.apache.spark.sql.types.StructType(s.fields.map(f =>
          if (f.name == from) f.copy(name = ren.newName()) else f))
      case (s, del: TableChange.DeleteColumn) =>
        require(del.fieldNames().length == 1,
          "only top-level DROP COLUMN is supported")
        val name = del.fieldNames()(0)
        require(s.fieldNames.contains(name), s"no such column $name")
        require(s.fields.length > 1,
          "cannot drop the last remaining column")
        // a PARTITION column anchors every committed file's pruning
        // tuple — dropping it would orphan the spec
        require(!s.fields.find(_.name == name)
          .flatMap(AtomicSink.fieldIdOf)
          .exists(id => latestMeta(ident)._2.contains(id) ||
            latestMeta(ident)._3.exists(_._1 == id)),
          s"column $name is a PARTITIONED BY/bucket column and " +
            s"cannot be dropped")
        // a LIVE merge-on-read delete predicate referencing this
        // column would become unevaluable — refuse (compact the
        // table first, or drop a different column). Predicates made
        // inert by a compaction (no current file predates them) no
        // longer block the drop.
        val fid = s.fields.find(_.name == name)
          .flatMap(AtomicSink.fieldIdOf)
        val live = AtomicSink.livePredicateVersions(dir.toString)
        // both merge-on-read kinds anchor columns: predicate deletes
        // reference their filter columns, equality deletes (MOR
        // MERGE pre-images) reference EVERY column of their rows
        val referenced = (AtomicSink.deletePredicates(dir.toString)
          .collect { case (k, cols, _) if live.contains(k) =>
            cols.values } ++
          AtomicSink.eqDeleteSpecs(dir.toString)
            .collect { case (k, cols, _) if live.contains(k) =>
              cols.map(_._2) }).flatten.toSet
        require(!fid.exists(referenced.contains),
          s"column $name is referenced by a LIVE merge-on-read DELETE " +
            s"predicate or equality-delete pre-image (_DELETES.v*) and " +
            s"cannot be dropped — compact the table first " +
            s"(AtomicSink.compact)")
        org.apache.spark.sql.types.StructType(
          s.fields.filterNot(_.name == name))
      case (_, other) => throw new UnsupportedOperationException(
        s"AtomicCatalog supports ADD/RENAME/DROP COLUMN, got $other")
    }
    // the altered schema serves reads from the NEXT commit on — the
    // commits already published (≤ the current latest) were written
    // and read under the previous schema, which stays what a
    // `VERSION AS OF` pinned at them serves
    val appliesFrom =
      AtomicSink.versionsOf(dir.toString).lastOption.getOrElse(0) + 1L
    // partition/bucket spec is fixed at CREATE — carried through ALTERs
    val (_, pids, bucket) = latestMeta(ident)
    writeSchema(dir, schemaVersions(dir).lastOption.getOrElse(0) + 1,
      next, appliesFrom, pids, bucket)
    new AtomicSink.SinkTable(dir.toString, next, accumulateAppends = true,
      partitionFieldIds = pids, bucketSpec = bucket)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val existed = tableExists(ident)
    if (existed) fs.delete(dirOf(ident), true)
    existed
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    fs.rename(dirOf(oldIdent), dirOf(newIdent))
  }

  // ---------------------------------------------------------------
  // FunctionCatalog face: the `bucket` transform function. Spark's
  // storage-partitioned-join planner resolves a scan's reported
  // KeyGroupedPartitioning expressions through the TABLE's catalog
  // (V2ExpressionUtils.loadV2FunctionOpt) — without this, a bucketed
  // scan's partitioning is untranslatable and every join shuffles.
  // ---------------------------------------------------------------
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") AtomicCatalog.BucketUnbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}

object AtomicCatalog {
  /** `bucket(n, col)` = `((col % n) + n) % n`, nulls in bucket 0 —
    * deliberately oracle-expressible (a DuckDB twin can compute the
    * same bucket), deterministic, and IDENTICAL on the write side
    * ([[AtomicSink]]'s bucketed task writer) and here — which is the
    * whole contract storage-partitioned joins rest on. Two scans
    * reporting this function with equal `canonicalName` and equal
    * bucket counts are co-partitioned: the join plans with ZERO
    * shuffle. */
  object BucketUnbound extends org.apache.spark.sql.connector.catalog
      .functions.UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): ((col % n) + n) % n over a BIGINT column"
    override def bind(inputType: StructType)
        : org.apache.spark.sql.connector.catalog.functions.BoundFunction =
      BucketBound
  }

  object BucketBound extends org.apache.spark.sql.connector.catalog
      .functions.ScalarFunction[Int] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def inputTypes(): Array[DataType] =
      Array(org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType)
    override def resultType(): DataType =
      org.apache.spark.sql.types.IntegerType
    override def isResultNullable: Boolean = false
    override def produceResult(
        row: org.apache.spark.sql.catalyst.InternalRow): Int = {
      val n = row.getInt(0)
      if (row.isNullAt(1)) 0
      else (((row.getLong(1) % n) + n) % n).toInt
    }
  }

  /** The storage-side twin of [[BucketBound]] over a RENDERED cell
    * ("" = null → bucket 0). */
  private[io] def bucketOfCell(cell: String, n: Int): Int =
    if (cell.isEmpty) 0
    else (((cell.toLong % n) + n) % n).toInt
}
