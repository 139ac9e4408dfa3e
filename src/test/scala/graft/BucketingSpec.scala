package graft



import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Proof of the scale design claimed in the Scaladocs: bucketing both
  * sides of the fact-fact join on the join key eliminates the shuffle
  * entirely — the plan contains zero ShuffleExchange below the join.
  * This is the 100 TB layout for lineitem ⋈ orders (SURVEY.md §2.4 /
  * Analytics.starJoinRevenue's scale note).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans with no shuffle exchange") {
    // AQE rewrites make exchange-detection ambiguous in this spec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = "/root/testdata/sf0.001"
      graft.sources.Tables.lineitem(spark, d).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
      graft.sources.Tables.orders(spark, d).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_b")

      val joined = spark.table("li_b")
        .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found ${shuffles.size} exchanges")
      assert(joined.count() == 6000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("starJoinRevenue e2e on sf0.1 bucketed fact tables: fact join shuffle-free") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // keep the fact join out of auto-broadcast range — the explicit
    // broadcast() hints on the dims are unaffected
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = "/root/testdata/sf0.1"
      graft.sources.Tables.lineitem(spark, d).write
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b01")
      graft.sources.Tables.orders(spark, d).write
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_b01")

      val bucketed = graft.queries.Analytics.starJoinRevenueFrames(
        spark.table("li_b01"), spark.table("o_b01"),
        graft.sources.Tables.customer(spark, d),
        graft.sources.Tables.nation(spark, d),
        graft.sources.Tables.region(spark, d))

      // the fact join (the only sort-merge join; dims broadcast) must
      // read the bucketed layout directly — no exchange in its subtree.
      // The only remaining exchanges are the post-join groupBy and the
      // presentation sort, which no layout can remove.
      val smj = bucketed.queryExecution.executedPlan.collect {
        case j: SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "expected the fact join to be a sort-merge join")
      smj.foreach { j =>
        val shuffles = j.collect { case s: ShuffleExchangeExec => s }
        assert(shuffles.isEmpty,
          s"bucketed fact join should be shuffle-free, found ${shuffles.size}")
      }

      // identical results to the plain-parquet plan
      val plain = graft.queries.Analytics.starJoinRevenue(spark, d)
      assert(bucketed.collect().toSeq == plain.collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b01")
      spark.sql("DROP TABLE IF EXISTS o_b01")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
