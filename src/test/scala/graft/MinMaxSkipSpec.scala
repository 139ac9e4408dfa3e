package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** File-level column MIN/MAX data skipping on the versioned catalog
  * ([[graft.io.AtomicSink]] `_MINMAX.v<N>` sidecars): a range-shaped
  * predicate on a NON-partition column must drop manifest files at
  * plan time, and — the q356 rule — pruning is an optimization,
  * never a correctness dependency (every filter stays residual).
  */
class MinMaxSkipSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogRoot: String = {
    val root = Files.createTempDirectory("graft-gmm").toString
    spark.conf.set("spark.sql.catalog.gmm", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gmm.root", root)
    root
  }

  private def scanParts(df: DataFrame): Int = {
    df.collect()
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
    val ss = scans(df.queryExecution.executedPlan)
    assert(ss.nonEmpty, s"no v2 scan in ${df.queryExecution.executedPlan}")
    ss.head.batch.planInputPartitions().length
  }

  test("disjoint-range commits: long, double and string predicates " +
    "skip files whose bounds cannot match; results stay exact") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gmm.t (id BIGINT, d DOUBLE, s STRING)")
    // three commits with DISJOINT id/d/s ranges — each lands as its
    // own manifest files with its own _MINMAX rows
    spark.sql("INSERT INTO gmm.t SELECT id, id * 1.5, " +
      "concat('a', lpad(CAST(id AS STRING), 6, '0')) FROM range(0, 1000)")
    spark.sql("INSERT INTO gmm.t SELECT id, id * 1.5, " +
      "concat('m', lpad(CAST(id AS STRING), 6, '0')) " +
      "FROM range(1000, 2000)")
    spark.sql("INSERT INTO gmm.t SELECT id, id * 1.5, " +
      "concat('z', lpad(CAST(id AS STRING), 6, '0')) " +
      "FROM range(2000, 3000)")
    assert(new java.io.File(s"$root/t", "_MINMAX.v1").isFile,
      "commits publish their min/max sidecar")
    val full = scanParts(spark.sql("SELECT * FROM gmm.t"))
    // long range: only commit-1 files hold id < 500
    val lo = scanParts(spark.sql("SELECT * FROM gmm.t WHERE id < 500"))
    assert(lo < full, s"id<500 planned $lo of $full")
    assert(spark.sql("SELECT count(*) FROM gmm.t WHERE id < 500")
      .head.getLong(0) == 500L)
    // equality outside every range: zero files planned
    assert(scanParts(
      spark.sql("SELECT * FROM gmm.t WHERE id = 99999")) == 0)
    // double range
    assert(scanParts(
      spark.sql("SELECT * FROM gmm.t WHERE d > 2999.0")) < full)
    assert(spark.sql("SELECT count(*) FROM gmm.t WHERE d > 2999.0")
      .head.getLong(0) == 1000L)
    // string prefix range (UTF8 binary order): only the 'z' commit
    val zs = scanParts(spark.sql("SELECT * FROM gmm.t WHERE s >= 'z'"))
    assert(zs < full && zs >= 1, s"s>='z' planned $zs of $full")
    assert(spark.sql("SELECT count(*) FROM gmm.t WHERE s >= 'z'")
      .head.getLong(0) == 1000L)
    // IN-list spanning two commits plans fewer than all three
    assert(scanParts(
      spark.sql("SELECT * FROM gmm.t WHERE id IN (10, 2500)")) < full)
    assert(spark.sql(
      "SELECT count(*) FROM gmm.t WHERE id IN (10, 2500)")
      .head.getLong(0) == 2L)
    spark.sql("DROP TABLE gmm.t")
  }

  test("skipping composes with rewrites: a MERGE's fresh files " +
    "republish bounds, RENAME keeps skipping (field-id keyed), and " +
    "compaction re-records stats") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gmm.r (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gmm.r SELECT id, id FROM range(0, 1000)")
    spark.sql("INSERT INTO gmm.r SELECT id, id FROM range(1000, 2000)")
    val full = scanParts(spark.sql("SELECT * FROM gmm.r"))
    assert(scanParts(
      spark.sql("SELECT * FROM gmm.r WHERE id >= 1500")) < full)
    // MERGE rewrites only matched files; the rewrite's output must
    // carry fresh _MINMAX rows so skipping keeps working
    spark.sql(
      """MERGE INTO gmm.r dst
        |USING (SELECT id, -5 AS v FROM range(1200, 1210)) src
        |ON dst.id = src.id
        |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
    val fullAfter = scanParts(spark.sql("SELECT * FROM gmm.r"))
    assert(scanParts(
      spark.sql("SELECT * FROM gmm.r WHERE id < 300")) < fullAfter,
      "skipping survives the copy-on-write rewrite")
    assert(spark.sql("SELECT count(*) FROM gmm.r WHERE v = -5")
      .head.getLong(0) == 10L)
    // RENAME: bounds are field-id keyed — the new name still skips
    spark.sql("ALTER TABLE gmm.r RENAME COLUMN id TO rid")
    assert(scanParts(
      spark.sql("SELECT * FROM gmm.r WHERE rid < 300")) < fullAfter)
    assert(spark.sql("SELECT count(*) FROM gmm.r WHERE rid < 300")
      .head.getLong(0) == 300L)
    // compaction rewrites the snapshot through the normal write path
    // — its replacement files re-record their own bounds
    val schema = spark.table("gmm.r").schema
    graft.io.AtomicSink.compact(spark, s"$root/r", schema)
    assert(spark.sql("SELECT count(*) FROM gmm.r WHERE rid < 300")
      .head.getLong(0) == 300L)
    assert(scanParts(spark.sql("SELECT * FROM gmm.r WHERE rid = -1"))
      == 0, "post-compaction files carry fresh bounds")
    spark.sql("DROP TABLE gmm.r")
  }

  test("unpartitioned COW DELETE narrows by bounds: files that " +
    "cannot hold a matching row carry by reference instead of " +
    "being rewritten") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gmm.d (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gmm.d SELECT id, id FROM range(0, 1000)")
    val dir = s"$root/d"
    val before = graft.io.AtomicSink.committedFiles(spark, dir)
    assert(before.size >= 3, s"need several files: $before")
    spark.sql("DELETE FROM gmm.d WHERE id < 200")
    assert(spark.sql("SELECT count(*) FROM gmm.d").head.getLong(0)
      == 800L)
    val after = graft.io.AtomicSink.committedFiles(spark, dir)
    val carried = before.toSet intersect after.toSet
    assert(carried.nonEmpty,
      s"files outside the delete range must carry by reference: " +
        s"before=$before after=$after")
    assert(after.exists(_.startsWith("v2-")),
      "touched files' survivors republished as fresh files")
    // time travel intact
    assert(spark.sql("SELECT count(*) FROM gmm.d VERSION AS OF 1")
      .head.getLong(0) == 1000L)
    spark.sql("DROP TABLE gmm.d")
  }

  test("sorted compaction makes skipping surgical: scattered files " +
    "prune nothing, compactSorted range-clusters and the same " +
    "predicate opens strictly fewer files") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gmm.z (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gmm.z " +
      "SELECT (id * 997) % 2100 AS id, id % 7 AS v FROM range(0, 2100)")
    val dir = s"$root/z"
    def q = spark.sql(
      "SELECT count(*) c FROM gmm.z WHERE id >= 1000 AND id < 1100")
    val pre = scanParts(spark.sql(
      "SELECT * FROM gmm.z WHERE id >= 1000 AND id < 1100"))
    val totalPre = graft.io.AtomicSink.committedFiles(spark, dir).size
    assert(pre == totalPre && totalPre > 1,
      s"scattered ingest must defeat skipping: $pre of $totalPre")
    assert(q.head.getLong(0) == 100L)
    graft.io.AtomicSink.compactSorted(spark, dir,
      spark.table("gmm.z").schema, Seq("id"))
    assert(new java.io.File(dir, "_MINMAX.v2").isFile,
      "sorted compaction republishes bounds")
    val post = scanParts(spark.sql(
      "SELECT * FROM gmm.z WHERE id >= 1000 AND id < 1100"))
    val totalPost = graft.io.AtomicSink.committedFiles(spark, dir).size
    assert(post < totalPost,
      s"clustered files must prune: $post of $totalPost")
    assert(q.head.getLong(0) == 100L, "same result either way")
    spark.sql("DROP TABLE gmm.z")
  }

  test("conservative everywhere stats cannot prove absence: missing " +
    "sidecars, null-handling shapes and non-range filters never prune") {
    catalogRoot
    spark.sql("CREATE TABLE gmm.c (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gmm.c SELECT id, id FROM range(0, 100)")
    val dir = spark.conf.get("spark.sql.catalog.gmm.root") + "/c"
    val full = scanParts(spark.sql("SELECT * FROM gmm.c"))
    // delete the sidecar: the same pruning query now plans everything
    // and STILL returns the right rows — optimization, not correctness
    assert(new java.io.File(dir, "_MINMAX.v1").delete())
    assert(scanParts(
      spark.sql("SELECT * FROM gmm.c WHERE id = 99999")) == full)
    assert(spark.sql("SELECT count(*) FROM gmm.c WHERE id < 10")
      .head.getLong(0) == 10L)
    // IS NULL never prunes (bounds cover non-null values only)
    spark.sql("INSERT INTO gmm.c SELECT id, NULL FROM range(100, 110)")
    assert(spark.sql("SELECT count(*) FROM gmm.c WHERE v IS NULL")
      .head.getLong(0) == 10L)
    spark.sql("DROP TABLE gmm.c")
  }

  test("negative zero: EqualTo(-0.0) never prunes a file holding 0.0 " +
    "(and vice versa) — IEEE equality beats Double.compare's total " +
    "order in the skipper") {
    catalogRoot
    spark.sql("CREATE TABLE gmm.z (id BIGINT, d DOUBLE)")
    // one file whose ONLY d value is +0.0, one far away
    spark.sql("INSERT INTO gmm.z SELECT id, 0.0 FROM range(0, 10)")
    spark.sql("INSERT INTO gmm.z SELECT id, 5.0 FROM range(10, 20)")
    // -0.0 must find the +0.0 rows: predicate evaluation treats the
    // zeros equal, so pruning the file would silently drop 10 rows
    assert(spark.sql("SELECT count(*) FROM gmm.z WHERE d = -0.0")
      .head.getLong(0) == 10L)
    // stored -0.0 bounds canonicalize to 0.0; query for +0.0 matches
    spark.sql("INSERT INTO gmm.z SELECT id, -0.0 FROM range(20, 30)")
    assert(spark.sql("SELECT count(*) FROM gmm.z WHERE d = 0.0")
      .head.getLong(0) == 20L)
    // skipping still works around the zeros (not disabled, just exact)
    assert(scanParts(
      spark.sql("SELECT * FROM gmm.z WHERE d = 99.0")) == 0)
    spark.sql("DROP TABLE gmm.z")
  }
}
