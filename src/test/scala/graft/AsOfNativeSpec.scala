package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinPlan}

/** Native as-of join lane (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec): result equality with the composed union+window form,
  * null padding for unmatched left rows (incl. non-nullable right
  * columns — the projection must bind against nullability-adjusted
  * output), tie-breaking, null keys, multi-partition merge, and the
  * PushFilterThroughAsOf plan shape.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // left: probes across 3 users incl. one user with no right rows and
  // one null key; right: quotes with a tie on (key, ts) decided by seq
  private def leftDf = Seq(
    (1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(5), "c"),
    (2L, ts(15), "d"), (3L, ts(50), "e")
  ).toDF("key", "ts", "tag")
    .union(Seq((Option.empty[Long], ts(10), "z")).toDF("key", "ts", "tag"))

  private def rightDf = Seq(
    (1L, ts(8), 100L, "x8"), (1L, ts(20), 200L, "x20a"),
    (1L, ts(20), 201L, "x20b"), (1L, ts(30), 300L, "x30"),
    (2L, ts(16), 400L, "late")
  ).toDF("key", "ts", "seq", "payload")

  private def native = AsOfJoin.asOfNative(
    leftDf, rightDf, keys = Seq("key"), ts = "ts", tieBreak = "seq")

  test("native as-of equals the composed union+window form") {
    val composed = AsOfJoin.asOf(
      leftDf, rightDf, keys = Seq("key"), ts = "ts", tieBreak = "seq")
    val n = native.orderBy($"tag").collect().map(_.toSeq)
    val c = composed.select(native.columns.map(col): _*)
      .orderBy($"tag").collect().map(_.toSeq)
    assert(n.toSeq == c.toSeq)
  }

  test("unmatched left rows pad ALL right columns with null (non-nullable strings included)") {
    val rows = native.orderBy($"tag").collect()
    val byTag = rows.map(r => r.getAs[String]("tag") -> r).toMap
    // user 3 has no right rows at all; user 2's only quote is later
    for (tag <- Seq("c", "d", "e", "z")) {
      val r = byTag(tag)
      assert(r.isNullAt(r.fieldIndex("r_seq")), s"$tag: r_seq must be null")
      assert(r.isNullAt(r.fieldIndex("r_payload")), s"$tag: r_payload must be null, got ${r.get(r.fieldIndex("r_payload"))}")
      assert(r.isNullAt(r.fieldIndex("r_ts")), s"$tag: r_ts must be null")
    }
    // ties on (key, ts) resolve to the largest tieBreak
    assert(byTag("b").getAs[Long]("r_seq") == 201L)
    assert(byTag("b").getAs[String]("r_payload") == "x20b")
    assert(byTag("a").getAs[Long]("r_seq") == 100L)
  }

  test("merge is correct across multiple shuffled input partitions") {
    val bigLeft = (0 until 2000).map(i => ((i % 7).toLong, ts(i), i)).toDF("key", "ts", "n")
      .repartition(8)
    val bigRight = (0 until 500).map(i => ((i % 7).toLong, ts(i * 4), i * 10L)).toDF("key", "ts", "seq")
      .repartition(5)
    val nat = AsOfJoin.asOfNative(bigLeft, bigRight, Seq("key"), "ts", "seq")
      .select($"n", $"r_seq")
    val comp = AsOfJoin.asOf(bigLeft, bigRight, Seq("key"), "ts", "seq")
      .select($"n", $"r_seq")
    assert(nat.count() == 2000)
    val nm = nat.collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val cm = comp.collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(nm == cm)
  }

  // AQE wraps the plan in AdaptiveSparkPlanExec (a leaf to collect),
  // so descend into its inputPlan to find the exec node
  private def findExec(plan: org.apache.spark.sql.execution.SparkPlan): Option[AsOfJoinExec] =
    plan.collectFirst { case e: AsOfJoinExec => e }.orElse(
      plan.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      }.flatMap(findExec))

  test("self-join (both sides from one source) dedups right exprIds") {
    val base = Seq(
      (1L, ts(10), "click", 0L), (1L, ts(8), "buy", 7L), (1L, ts(9), "buy", 8L)
    ).toDF("key", "ts", "kind", "amount")
    val out = AsOfJoin.asOfNative(
      base.filter($"kind" === "click").select($"key", $"ts"),
      base.filter($"kind" === "buy").select($"key", $"ts", $"amount"),
      keys = Seq("key"), ts = "ts", tieBreak = "amount")
    val row = out.collect().head
    assert(row.getAs[Long]("r_amount") == 8L) // latest buy at ts 9
  }

  test("plan uses AsOfJoinExec and pushes left filters below the join") {
    val filtered = native.filter($"tag" === "a")
    assert(findExec(filtered.queryExecution.executedPlan).isDefined,
      s"expected native exec in:\n${filtered.queryExecution.executedPlan}")
    val opt = filtered.queryExecution.optimizedPlan
    val aj = opt.collectFirst { case p: AsOfJoinPlan => p }
    assert(aj.isDefined, s"expected AsOfJoinPlan in optimized plan:\n$opt")
    val leftHasFilter = aj.get.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("tag") => f
    }
    assert(leftHasFilter.isDefined,
      s"tag filter must push into the left child:\n${aj.get.left}")
  }

  test("key-only filters mirror to the right side too") {
    val filtered = native.filter($"key" === 1L)
    val aj = filtered.queryExecution.optimizedPlan
      .collectFirst { case p: AsOfJoinPlan => p }.get
    def hasKeyFilter(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("key") => f
      }.isDefined
    assert(hasKeyFilter(aj.left), "key filter must push left")
    assert(hasKeyFilter(aj.right), "key filter must mirror right")
    // and the result is still right
    assert(filtered.count() == 3)
  }

  test("physical exec declares left-preserving partitioning and ordering") {
    val exec = findExec(native.queryExecution.executedPlan).get
    assert(exec.outputPartitioning == exec.left.outputPartitioning)
    assert(exec.outputOrdering == exec.left.outputOrdering)
  }
}
