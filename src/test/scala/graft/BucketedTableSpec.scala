package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `PARTITIONED BY (bucket(n, col))` catalog tables: hash-clustered
  * files with bucket tuples, point-lookup file pruning, and — the
  * 100 TB payoff — storage-partitioned joins: two co-bucketed tables
  * equi-join with ZERO shuffle.
  */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogRoot: String = {
    val root = Files.createTempDirectory("graft-gbk").toString
    spark.conf.set("spark.sql.catalog.gbk", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gbk.root", root)
    root
  }

  private def scanParts(df: DataFrame): Int = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .head.batch.planInputPartitions().length
  }

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
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

  private def hasShuffle(p: org.apache.spark.sql.execution.SparkPlan)
      : Boolean = p match {
    case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      true
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      hasShuffle(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      hasShuffle(q.plan)
    case other => other.children.exists(hasShuffle)
  }

  test("bucketed writes cluster by the bucket function and a point " +
    "predicate prunes to the key's bucket") {
    val root = catalogRoot
    spark.sql("CREATE TABLE gbk.t (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO gbk.t SELECT id, id * 3 FROM range(0, 4000)")
    val dir = s"$root/t"
    // every file carries a single bucket tuple in [0, 8)
    val parts = scala.io.Source.fromFile(s"$dir/_PARTS.v1").getLines()
      .map(_.split("\t", -1)).toSeq
    assert(parts.nonEmpty && parts.forall(c =>
      c.length == 2 && c(1).toInt >= 0 && c(1).toInt < 8),
      s"bucket tuples recorded: ${parts.take(3)}")
    assert(parts.map(_.apply(1)).distinct.size == 8,
      "all 8 buckets materialized")
    // full read exact
    assert(spark.sql("SELECT count(*), sum(v) FROM gbk.t")
      .as[(Long, Long)].head == ((4000L, 3L * (0L until 4000L).sum)))
    // a point lookup opens only the key's bucket
    val full = scanParts(spark.table("gbk.t"))
    val point = scanParts(spark.table("gbk.t").filter($"id" === 42))
    assert(point < full, s"bucket pruning: $point of $full")
    assert(spark.sql("SELECT v FROM gbk.t WHERE id = 42")
      .head.getLong(0) == 126L)
    // IN-list across two buckets
    assert(scanParts(
      spark.table("gbk.t").filter($"id".isin(1L, 2L))) < full)
    spark.sql("DROP TABLE gbk.t")
  }

  test("storage-partitioned join: two co-bucketed tables equi-join " +
    "with ZERO shuffle; results match the shuffled plan") {
    catalogRoot
    spark.sql("CREATE TABLE gbk.a (id BIGINT, x BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("CREATE TABLE gbk.b (id BIGINT, y BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO gbk.a SELECT id, id * 2 FROM range(0, 3000)")
    spark.sql("INSERT INTO gbk.b SELECT id, id * 5 " +
      "FROM range(1000, 4000)")
    val prevBucketing =
      spark.conf.get("spark.sql.sources.v2.bucketing.enabled", "false")
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // broadcast off: the point is the co-partitioned SORT-MERGE/hash
    // join, not a broadcast that would hide the shuffle question
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // no aggregate on top — the claim is about the JOIN itself
      val joined = spark.table("gbk.a").join(spark.table("gbk.b"), "id")
      val rows = joined.select($"id", $"x", $"y")
        .as[(Long, Long, Long)].collect()
      assert(rows.length == 2000)
      assert(rows.map { case (_, x, y) => x + y }.sum ==
        (1000L until 3000L).map(i => i * 2 + i * 5).sum)
      assert(!hasShuffle(joined.queryExecution.executedPlan),
        s"co-bucketed join must plan ZERO shuffle:\n" +
          s"${joined.queryExecution.executedPlan}")
      // control: with v2 bucketing off the same join shuffles —
      // proving the zero-shuffle plan came from the reported
      // KeyGroupedPartitioning, not from degenerate sizes
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val control = spark.table("gbk.a").join(spark.table("gbk.b"), "id")
      control.collect()
      assert(hasShuffle(control.queryExecution.executedPlan),
        "control join (v2 bucketing off) should shuffle")
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        prevBucketing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
    spark.sql("DROP TABLE gbk.a")
    spark.sql("DROP TABLE gbk.b")
  }

  test("bucket layout survives MERGE (COW and MOR) and guards hold: " +
    "bucket column cannot drop, bucket+identity refused, non-BIGINT " +
    "bucket refused") {
    catalogRoot
    spark.sql("CREATE TABLE gbk.m (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO gbk.m SELECT id, id FROM range(0, 800)")
    spark.sql(
      """MERGE INTO gbk.m dst
        |USING (SELECT id, -3L AS v FROM range(100, 120)) src
        |ON dst.id = src.id
        |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gbk.m WHERE v = -3")
      .head.getLong(0) == 20L)
    // the rewrite's fresh files republished bucket tuples
    val root = spark.conf.get("spark.sql.catalog.gbk.root")
    assert(new java.io.File(s"$root/m", "_PARTS.v2").isFile,
      "COW rewrite keeps the bucket layout")
    spark.conf.set("spark.graft.atomic.dmlMode", "mor")
    try spark.sql(
      """MERGE INTO gbk.m dst
        |USING (SELECT id, -4L AS v FROM range(200, 210)) src
        |ON dst.id = src.id
        |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
    finally spark.conf.unset("spark.graft.atomic.dmlMode")
    assert(spark.sql("SELECT count(*) FROM gbk.m WHERE v = -4")
      .head.getLong(0) == 10L)
    assert(new java.io.File(s"$root/m", "_PARTS.v3").isFile,
      "MOR merge's insert files carry bucket tuples too")
    // compaction preserves the bucket layout (the r14 partition-
    // compaction advice, bucket flavor): tuples republished, point
    // pruning still works after
    graft.io.AtomicSink.compact(spark, s"$root/m",
      spark.table("gbk.m").schema)
    val lastV = graft.io.AtomicSink.versions(spark, s"$root/m").last
    assert(new java.io.File(s"$root/m", s"_PARTS.v$lastV").isFile,
      "compaction republishes bucket tuples")
    assert(spark.sql("SELECT count(*) FROM gbk.m WHERE v = -4")
      .head.getLong(0) == 10L)
    val fullC = scanParts(spark.table("gbk.m"))
    assert(scanParts(spark.table("gbk.m").filter($"id" === 7)) < fullC,
      "bucket pruning survives compaction")
    intercept[Exception](
      spark.sql("ALTER TABLE gbk.m DROP COLUMN id"))
    intercept[Exception](spark.sql(
      "CREATE TABLE gbk.bad1 (id BIGINT, g BIGINT) " +
        "PARTITIONED BY (g, bucket(4, id))"))
    intercept[Exception](spark.sql(
      "CREATE TABLE gbk.bad2 (s STRING) PARTITIONED BY (bucket(4, s))"))
    spark.sql("DROP TABLE gbk.m")
  }
}
