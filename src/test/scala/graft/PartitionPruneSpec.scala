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
}
