package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Hive-layout partition pruning, proven from the EXECUTED scan's
  * metrics — the serving-side complement of the z-order row-group
  * pruning proof (ZOrderSpec): a filter on the partition column must
  * cut files at the directory level before any row is read, both
  * statically (literal predicate) and dynamically (the predicate
  * arrives at runtime from the broadcast side of a join — Spark's
  * dynamic partition pruning, the mechanism that makes
  * fact-join-filtered-dim feasible at 100 TB without scanning every
  * partition of the fact).
  */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  // AQE wraps executed stages in QueryStageExec LEAVES — a plain
  // collect stops at them, so recurse through their inner plans
  private def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case s: FileSourceScanExec if s.relation.partitionSchema.nonEmpty => Seq(s)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansIn(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansIn(q.plan)
    case other => other.children.flatMap(scansIn)
  }

  private def factScan(df: DataFrame): FileSourceScanExec = {
    df.collect() // execute so scan metrics are populated
    val scans = scansIn(df.queryExecution.executedPlan)
    assert(scans.nonEmpty,
      s"expected a partitioned file scan in:\n${df.queryExecution.executedPlan}")
    scans.head
  }

  test("static + dynamic partition pruning cut files before rows are read") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    val d = "/root/testdata/sf0.001"
    sources.Tables.orders(spark, d)
      .write.partitionBy("o_orderstatus").parquet(s"$dir/orders")
    val fact = spark.read.parquet(s"$dir/orders")

    val all = factScan(fact.select($"o_orderkey", $"o_orderstatus"))
    val allFiles = all.metrics("numFiles").value
    assert(allFiles >= 3, s"3 status partitions expected, $allFiles files")

    // static: a literal partition predicate lands in PartitionFilters
    // (never in Filter-above-scan) and reads strictly fewer files
    val static = factScan(fact.filter($"o_orderstatus" === "F")
      .select($"o_orderkey"))
    assert(static.partitionFilters.nonEmpty,
      "literal status predicate must prune at the partition level")
    val staticFiles = static.metrics("numFiles").value
    assert(staticFiles < allFiles,
      s"static pruning read $staticFiles of $allFiles files")

    // dynamic: the predicate exists only at runtime — a broadcast dim
    // carrying a SELECTIVE filter (DPP's insertion rule requires one:
    // an unfiltered build side is presumed non-pruning). The dim must
    // be a real SCAN: a literal Seq would constant-fold into a
    // filterless LocalRelation before the pruning rule ever runs.
    // The fact scan must carry a dynamicpruning partition filter and
    // read the same reduced file set the static form did.
    Seq(("F", "keep"), ("O", "drop"), ("P", "drop"))
      .toDF("status", "tag").write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim").filter($"tag" === "keep")
    val joined = fact.join(broadcast(dim),
      fact("o_orderstatus") === dim("status"))
      .select($"o_orderkey")
    val dyn = factScan(joined)
    assert(dyn.partitionFilters.map(_.toString)
        .exists(_.contains("dynamicpruning")),
      s"expected a dynamicpruning partition filter, got ${dyn.partitionFilters}")
    val dynFiles = dyn.metrics("numFiles").value
    assert(dynFiles == staticFiles,
      s"dynamic pruning read $dynFiles files, static read $staticFiles")
  }

  test("catalog PARTITIONED BY: identity spec prunes manifest files " +
    "at plan time, survives RENAME and a group rewrite, refuses " +
    "non-identity transforms and dropping the partition column") {
    val root = Files.createTempDirectory("graft-catpart").toString
    spark.conf.set("spark.sql.catalog.gpt", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gpt.root", root)
    // the planned DSv2 input-partition count = manifest files the scan
    // will actually open (one per file) — the pruning proof
    def scanParts(df: DataFrame): Int = {
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
    spark.sql("CREATE TABLE gpt.t (id BIGINT, g BIGINT, v BIGINT) " +
      "PARTITIONED BY (g)")
    spark.sql("INSERT INTO gpt.t " +
      "SELECT id, id % 8, (id * id) % 97 FROM range(0, 4000)")
    val full = scanParts(spark.sql("SELECT * FROM gpt.t"))
    assert(full >= 8, s"one file per partition value at least: $full")
    val pruned = scanParts(spark.sql("SELECT * FROM gpt.t WHERE g = 3"))
    assert(pruned < full && pruned >= 1,
      s"partition predicate must prune files: $pruned of $full")
    assert(spark.sql("SELECT count(*) FROM gpt.t WHERE g = 3")
      .head.getLong(0) == 500L)
    // IN-list and range predicates prune too
    assert(scanParts(spark.sql(
      "SELECT * FROM gpt.t WHERE g IN (1, 5)")) < full)
    assert(scanParts(spark.sql("SELECT * FROM gpt.t WHERE g < 2")) < full)
    // a non-partition predicate prunes nothing (and stays correct)
    assert(scanParts(spark.sql("SELECT * FROM gpt.t WHERE v = 1")) == full)
    // RENAME: the spec is by field id, pruning follows the new name
    spark.sql("ALTER TABLE gpt.t RENAME COLUMN g TO grp")
    assert(scanParts(spark.sql("SELECT * FROM gpt.t WHERE grp = 3")) < full)
    // appends stay partition-split per commit
    spark.sql("INSERT INTO gpt.t " +
      "SELECT id, id % 8, 1 FROM range(0, 80)")
    assert(spark.sql("SELECT count(*) FROM gpt.t WHERE grp = 3")
      .head.getLong(0) == 510L)
    // a group rewrite (SQL UPDATE) re-clusters and re-publishes the
    // tuples — the table stays prunable afterwards
    spark.sql("UPDATE gpt.t SET v = -1 WHERE grp = 5")
    val fullAfter = scanParts(spark.sql("SELECT * FROM gpt.t"))
    assert(scanParts(spark.sql("SELECT * FROM gpt.t WHERE grp = 3"))
      < fullAfter, "pruning survives the copy-on-write rewrite")
    assert(spark.sql("SELECT count(*) FROM gpt.t WHERE grp = 3")
      .head.getLong(0) == 510L)
    assert(spark.sql(
      "SELECT count(*) FROM gpt.t WHERE grp = 5 AND v <> -1")
      .head.getLong(0) == 0L)
    // guards: partition column cannot drop; unsupported transforms
    // refused (bucket(n, col) is its own supported spec since r15 —
    // see BucketedTableSpec)
    intercept[Exception](spark.sql("ALTER TABLE gpt.t DROP COLUMN grp"))
    intercept[Exception](spark.sql(
      "CREATE TABLE gpt.tb (id BIGINT, s STRING) " +
        "PARTITIONED BY (truncate(4, s))"))
    spark.sql("DROP TABLE gpt.t")
  }

  test("partition-scoped copy-on-write DELETE rewrites only the " +
    "touched partitions — untouched files carry by reference, a " +
    "whole-partition delete writes no data files at all") {
    val root = Files.createTempDirectory("graft-pscow").toString
    spark.conf.set("spark.sql.catalog.gps", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gps.root", root)
    spark.sql("CREATE TABLE gps.t (id BIGINT, g BIGINT, v BIGINT) " +
      "PARTITIONED BY (g)")
    spark.sql("INSERT INTO gps.t " +
      "SELECT id, id % 4, id DIV 4 FROM range(0, 800)")
    val dir = s"$root/t"
    val v1Files = graft.io.AtomicSink.committedFiles(spark, dir)
    // the partition-1 files, from the commit's own tuple sidecar
    val parts1 = scala.io.Source.fromFile(s"$dir/_PARTS.v1").getLines()
      .map(_.split("\t", -1)).map(c => c(0) -> c(1)).toMap
    val p1Files = v1Files.filter(f => parts1.get(f).contains("1")).toSet
    assert(p1Files.nonEmpty && p1Files.size < v1Files.size)
    // mixed predicate: partition conjunct g = 1 scopes the rewrite,
    // the residual (v % 2 = 0) decides rows inside it
    spark.sql("DELETE FROM gps.t WHERE g = 1 AND v % 2 = 0")
    assert(spark.sql("SELECT count(*) FROM gps.t").head.getLong(0)
      == 700L, "exactly the matching rows deleted")
    val after = graft.io.AtomicSink.committedFiles(spark, dir)
    assert((v1Files.toSet -- p1Files).subsetOf(after.toSet),
      "untouched partitions' files carry forward BY REFERENCE")
    assert(p1Files.forall(f => !after.contains(f)),
      "every touched-partition file was replaced")
    assert(after.exists(_.startsWith("v2-")),
      "partition-1 survivors republished as fresh files")
    // pure partition predicate: survivors of the touched partition
    // are EMPTY — the commit adds no data files at all
    spark.sql("DELETE FROM gps.t WHERE g = 2")
    assert(spark.sql("SELECT count(*) FROM gps.t").head.getLong(0)
      == 500L)
    val after2 = graft.io.AtomicSink.committedFiles(spark, dir)
    assert(!after2.exists(_.startsWith("v3-")),
      s"a whole-partition delete is metadata-plus-CDC only: $after2")
    // time travel across both deletes stays exact
    assert(spark.sql("SELECT count(*) FROM gps.t VERSION AS OF 1")
      .head.getLong(0) == 800L)
    assert(spark.sql("SELECT count(*) FROM gps.t VERSION AS OF 2")
      .head.getLong(0) == 700L)
    // and the rewritten files keep pruning (fresh _PARTS republished)
    assert(new java.io.File(s"$dir/_PARTS.v2").isFile)
    spark.sql("DROP TABLE gps.t")
  }

  test("partition-aware INSERT OVERWRITE: a static PARTITION " +
    "predicate replaces exactly that partition's files, dynamic mode " +
    "replaces exactly the partitions present in the incoming rows") {
    val root = Files.createTempDirectory("graft-pow").toString
    spark.conf.set("spark.sql.catalog.gow", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gow.root", root)
    spark.sql("CREATE TABLE gow.t (id BIGINT, g BIGINT, v BIGINT) " +
      "PARTITIONED BY (g)")
    spark.sql("INSERT INTO gow.t " +
      "SELECT id, id % 4, id FROM range(0, 400)")
    val dir = s"$root/t"
    val v1Files = graft.io.AtomicSink.committedFiles(spark, dir)
    // STATIC: overwrite one partition; the other three carry
    spark.sql("INSERT OVERWRITE gow.t PARTITION (g = 2) " +
      "SELECT id, -1L FROM range(0, 10)")
    assert(spark.sql("SELECT count(*) FROM gow.t").head.getLong(0)
      == 310L, "partition 2's 100 rows replaced by 10")
    assert(spark.sql(
      "SELECT count(*), sum(v) FROM gow.t WHERE g = 2")
      .head.toSeq == Seq(10L, -10L))
    assert(spark.sql("SELECT count(*) FROM gow.t WHERE g = 1")
      .head.getLong(0) == 100L, "other partitions untouched")
    val afterStatic = graft.io.AtomicSink.committedFiles(spark, dir)
    val parts1 = scala.io.Source.fromFile(s"$dir/_PARTS.v1").getLines()
      .map(_.split("\t", -1)).map(c => c(0) -> c(1)).toMap
    val keepables = v1Files.filterNot(f => parts1.get(f).contains("2"))
    assert(keepables.forall(afterStatic.contains),
      "untouched partitions' files carried BY REFERENCE")
    assert(v1Files.filter(f => parts1.get(f).contains("2"))
      .forall(f => !afterStatic.contains(f)),
      "the overwritten partition's files are gone from the manifest")
    // time travel to the pre-overwrite snapshot stays exact
    assert(spark.sql("SELECT count(*) FROM gow.t VERSION AS OF 1")
      .head.getLong(0) == 400L)
    // DYNAMIC: only the partitions present in the new rows replace
    val prevMode =
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE gow.t " +
        "SELECT id, id % 2, 1000L FROM range(0, 20)") // partitions 0, 1
      assert(spark.sql(
        "SELECT g, CAST(count(*) AS BIGINT) FROM gow.t GROUP BY g " +
          "ORDER BY g").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq == Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 100L)),
        "partitions 0/1 replaced, 2/3 untouched")
      assert(spark.sql(
        "SELECT sum(v) FROM gow.t WHERE g IN (0, 1)").head.getLong(0)
        == 20000L)
      assert(spark.sql("SELECT count(*) FROM gow.t WHERE g = 3")
        .head.getLong(0) == 100L)
    } finally prevMode match {
      case Some(m) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // an overwrite-by-filter on a NON-partition column refuses loudly
    // (canOverwrite = false → Spark's unsupported-expression error)
    intercept[Exception](
      spark.range(5).selectExpr("id", "id % 2 AS g", "id AS v")
        .writeTo("gow.t").overwrite($"v" === 99L))
    spark.sql("DROP TABLE gow.t")
  }

  test("catalog scan statistics: a small catalog table reports its " +
    "manifest byte size and auto-broadcasts as a join build side") {
    val root = Files.createTempDirectory("graft-stats").toString
    spark.conf.set("spark.sql.catalog.gst", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gst.root", root)
    spark.sql("CREATE TABLE gst.dim (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gst.dim " +
      "SELECT id, concat('n', id) FROM range(0, 100)")
    val big = spark.range(0, 100000)
      .selectExpr("id % 100 AS id", "id AS payload")
    val joined = big.join(spark.table("gst.dim"), "id")
    joined.collect()
    def hasBroadcast(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          true
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          hasBroadcast(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          hasBroadcast(q.plan)
        case other => other.children.exists(hasBroadcast)
      }
    assert(hasBroadcast(joined.queryExecution.executedPlan),
      s"a ~1KB catalog dim must broadcast:\n" +
        s"${joined.queryExecution.executedPlan}")
    assert(joined.count() == 100000L)
    spark.sql("DROP TABLE gst.dim")
  }

  test("pruning drives join strategy: a partition-FILTERED catalog " +
    "dim broadcasts in a join where the unfiltered dim shuffles " +
    "(estimateStatistics reflects the pruned file set)") {
    val root = Files.createTempDirectory("graft-stats2").toString
    spark.conf.set("spark.sql.catalog.gsb", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gsb.root", root)
    spark.sql("CREATE TABLE gsb.dim (id BIGINT, g BIGINT, pad STRING) " +
      "PARTITIONED BY (g)")
    // ~40 KB per partition value, 8 values → ~320 KB total
    spark.sql("INSERT INTO gsb.dim SELECT id, id % 8, " +
      "repeat('x', 80) FROM range(0, 4000)")
    def hasBroadcast(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          true
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          hasBroadcast(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          hasBroadcast(q.plan)
        case other => other.children.exists(hasBroadcast)
      }
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // a threshold between one partition's bytes and the full table's
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "131072")
    try {
      val big = spark.range(0, 100000)
        .selectExpr("id % 4000 AS id", "id AS payload")
      val unfiltered = big.join(spark.table("gsb.dim"), "id")
      unfiltered.collect()
      assert(!hasBroadcast(unfiltered.queryExecution.executedPlan),
        "the full ~320KB dim must NOT broadcast under a 128KB threshold")
      val filtered = big.join(
        spark.table("gsb.dim").filter($"g" === 3), "id")
      filtered.collect()
      assert(hasBroadcast(filtered.queryExecution.executedPlan),
        s"the partition-pruned dim (~40KB planned) must broadcast:\n" +
          s"${filtered.queryExecution.executedPlan}")
      assert(filtered.count() == unfiltered.filter($"g" === 3).count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    spark.sql("DROP TABLE gsb.dim")
  }
}
