package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** The MV rollup-rewrite: matching aggregates scan the pre-aggregated
  * table (plan-audited), non-derivable ones fall back to the fact
  * scan, and every rewritten result is value-identical to the direct
  * computation. Installed via [[GraftRuntime.ensure]] so the spec is
  * immune to session-creation order across the suite (withExtensions
  * is silently ignored by getOrCreate on an existing session).
  */
class MvRewriteSpec extends SparkSpec {

  // idempotent; runs before each test regardless of suite order
  private def withRule(): Unit = GraftRuntime.ensure(spark)

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString)

  test("subset-grouping SUM/COUNT rewrites onto the MV and matches the fact") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv").toString
    val fact = s"$dir/fact.parquet"
    val mv = s"$dir/mv.parquet"
    (1L to 400L).map(i =>
        (i, s"s${i % 3}", s"p${i % 5}", (i % 7).toDouble))
      .toDF("id", "status", "prio", "v")
      .write.parquet(fact)
    try {
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"), mvPath = mv)

      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
        .orderBy($"status")
      assert(scansOf(q).exists(_.contains("mv.parquet")),
        s"aggregate must scan the MV:\n${scansOf(q)}")
      assert(!scansOf(q).exists(_.contains("fact.parquet")),
        "the fact table must not be read")

      MvRewrite.clear() // direct recompute with the rule inert
      val direct = spark.read.parquet(fact).groupBy($"status")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
        .orderBy($"status")
      assert(scansOf(direct).exists(_.contains("fact.parquet")))
      assert(q.collect().toSeq == direct.collect().toSeq,
        "rewritten values == direct values")
    } finally MvRewrite.clear()
  }

  test("non-derivable shapes refuse the rewrite and read the fact") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv2").toString
    val fact = s"$dir/fact.parquet"
    (1L to 100L).map(i => (i, s"s${i % 3}", (i % 7).toDouble))
      .toDF("id", "status", "v").write.parquet(fact)
    try {
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status"), sumCols = Seq("v"),
        mvPath = s"$dir/mv.parquet")

      // a filter between aggregate and scan changes group contents
      val filtered = spark.read.parquet(fact).filter($"id" > 50)
        .groupBy($"status").agg(sum($"v").as("sv"))
      assert(scansOf(filtered).exists(_.contains("fact.parquet")),
        "filtered aggregate must NOT rewrite")

      // avg is not derivable from these partials
      val avgQ = spark.read.parquet(fact)
        .groupBy($"status").agg(avg($"v").as("a"))
      assert(scansOf(avgQ).exists(_.contains("fact.parquet")),
        "avg must NOT rewrite")

      // grouping outside the MV's columns
      val byId = spark.read.parquet(fact)
        .groupBy($"id").agg(sum($"v").as("sv"))
      assert(scansOf(byId).exists(_.contains("fact.parquet")),
        "non-subset grouping must NOT rewrite")
    } finally MvRewrite.clear()
  }
}
