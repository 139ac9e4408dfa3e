package graft

/** Both dup-cluster resolution paths agree on known component
  * structures (the driver union-find is the default for bounded edge
  * lists; the distributed propagation loop is the >1M-edge fallback).
  * The distributed path is exercised on >1 partition: `nEdges` sizes
  * the propagation loop's partitioning, so a large hint forces the
  * same multi-partition layout a billion-edge graph would get.
  */
class DupClusterSpec extends SparkSpec {
  import spark.implicits._

  // chain 1-2-3-4, pair 10-11, triangle 20-21-22, singleton edge 30-31
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L),
    (10L, 11L),
    (20L, 21L), (21L, 22L), (20L, 22L),
    (30L, 31L))

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 10L, 11L -> 10L,
    20L -> 20L, 21L -> 20L, 22L -> 20L,
    30L -> 30L, 31L -> 30L)

  test("distributed label propagation resolves components to min ids") {
    val pairs = edges.toDF("a_id", "b_id")
    val got = graft.ext.Dedup.propagateLabels(pairs, edges.length)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("propagation is invariant to edge order and partitioning") {
    val pairs = spark.createDataset(
      spark.sparkContext.parallelize(edges.reverse, 5)).toDF("a_id", "b_id")
    val got = graft.ext.Dedup.propagateLabels(pairs, edges.length)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("propagation with a scale-sized nEdges hint runs on >1 partition") {
    val pairs = edges.toDF("a_id", "b_id")
    // 4M-edge hint → 2*4M/2M = 4 target partitions (capped at the
    // session's 4 shuffle partitions) — the layout a big graph gets.
    val df = graft.ext.Dedup.propagateLabels(pairs, 4000000L)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("dupClusters: distributed fallback matches driver union-find end-to-end") {
    val d = "/root/testdata/sf0.001"
    val driver = graft.ext.Dedup.dupClusters(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = graft.ext.Dedup.dupClusters(spark, d, maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(driver == dist)
    assert(driver.nonEmpty)
  }

  test("clusterSafeSplit: no near-dup cluster straddles a split boundary " +
    "— the per-doc hash split provably does") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    def split(gid: String) =
      when(expr(s"($gid % 2147483647) * 2654435761 % 2147483647 % 100") < 90,
        "train")
        .when(expr(s"($gid % 2147483647) * 2654435761 % 2147483647 % 100") < 95,
          "val")
        .otherwise("test")
    val clusters = graft.ext.Dedup.dupClusters(spark, d)
    // the property itself: per CLUSTER, the cluster-keyed split
    // assigns every member identically (hash of the same gid), while
    // the doc-keyed split scatters members of some multi-doc cluster
    val perDoc = clusters
      .select($"doc_id", $"cluster_id",
        split("cluster_id").as("safe"), split("doc_id").as("naive"))
    val safeStraddle = perDoc.groupBy($"cluster_id")
      .agg(countDistinct($"safe").as("k")).filter($"k" > 1).count()
    assert(safeStraddle == 0L,
      "cluster-keyed hashing must keep every duplicate family together")
    val naiveStraddle = perDoc.groupBy($"cluster_id")
      .agg(countDistinct($"naive").as("k")).filter($"k" > 1).count()
    assert(naiveStraddle > 0L,
      "expected the per-doc split to scatter at least one cluster — " +
        "if not, this fixture no longer demonstrates the leakage bug")
  }
}
