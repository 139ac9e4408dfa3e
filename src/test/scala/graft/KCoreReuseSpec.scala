package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** The k-core peel round must build its survivor frame ONCE: both
  * endpoint semi-joins probe the same `keep` plan, so the physical
  * plan carries exactly one exchange for it and the second join reads
  * a ReusedExchange — otherwise the degree aggregate (the round's
  * only real work besides the joins) executes twice per round.
  */
class KCoreReuseSpec extends SparkSpec {
  import spark.implicits._

  private def sym = {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("a", "b")
    e.select($"a".as("u"), $"b".as("v"))
      .unionAll(e.select($"b".as("u"), $"a".as("v")))
      .repartition($"u")
  }

  test("broadcast path: one BroadcastExchange, second join reuses it") {
    val round = Graph.kCoreRound(sym.localCheckpoint(), k = 2L, fits = true)
    round.collect() // executedPlan reflects the final (AQE-resolved) form
    // audit the FINAL adaptive plan only — the printed string appends
    // the pre-AQE "Initial Plan" section, which legitimately shows two
    // builds before exchange reuse ran
    val plan = round.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val builds = "BroadcastExchange".r.findAllIn(plan).size
    // the ReusedExchange node prints the exchange it references, so a
    // correct plan shows the build string twice: once real, once as
    // the reuse pointer — but only ONE non-reused build line
    val reuses = "ReusedExchange".r.findAllIn(plan).size
    assert(reuses == 1,
      s"second endpoint join must reuse the first exchange:\n$plan")
    assert(builds - reuses == 1,
      s"expected exactly one broadcast build of the survivor set:\n$plan")
  }

  test("shuffle path: the gated-off round still shares one survivor build") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val round = Graph.kCoreRound(sym.localCheckpoint(), k = 2L, fits = false)
      round.collect()
      val plan = round.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"gated-off round must not broadcast:\n$plan")
      assert(plan.contains("ReusedExchange"),
        s"the survivor aggregate's exchange must be built once:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("round output equals the naive per-endpoint filter") {
    val base = sym.localCheckpoint()
    val keep = base.groupBy($"u").agg(count(lit(1)).as("deg"))
      .filter($"deg" >= 2).select($"u").as[Long].collect().toSet
    val expect = base.as[(Long, Long)].collect()
      .filter { case (u, v) => keep(u) && keep(v) }.toSet
    val got = Graph.kCoreRound(base, k = 2L, fits = true)
      .as[(Long, Long)].collect().toSet
    assert(got == expect)
  }
}
