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
}
