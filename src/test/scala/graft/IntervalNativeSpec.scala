package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.plans.IntervalJoinExec

/** Native point-in-interval lane (IntervalJoinPlan → Strategy → Exec):
  * result equality with the plain range-condition join across
  * multi-match, inclusive boundaries, empty/inverted intervals, null
  * keys, self-joins, and multi-partition inputs; plan-shape check that
  * the custom exec actually plans.
  */
class IntervalNativeSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 30L, "p30"),
    (2L, 15L, "q15"), (3L, 5L, "r5")
  ).toDF("key", "t", "pname")

  private def intervals = Seq(
    (1L, 5L, 25L, "a"),    // catches t=10, 20
    (1L, 10L, 10L, "b"),   // single-point interval, inclusive both ends
    (1L, 18L, 40L, "c"),   // catches t=20, 30
    (1L, 50L, 60L, "d"),   // after every point
    (2L, 30L, 20L, "e"),   // inverted (end < start): matches nothing
    (4L, 0L, 100L, "f")    // key with no points
  ).toDF("key", "s", "e", "iname")

  private def reference(l: DataFrame, r: DataFrame): Set[(Long, Long, String)] =
    l.join(r, l("key") === r("key") && r("s") <= l("t") && l("t") <= r("e"))
      .select(l("key"), l("t"), r("iname"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet

  private def native(l: DataFrame, r: DataFrame): Set[(Long, Long, String)] =
    RangeJoin.pointInIntervalNative(l, r, Seq("key"), "t", "s", "e")
      .select($"key", $"t", $"r_iname")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet

  test("equals the plain range-condition join (multi-match, boundaries, inverted)") {
    val got = native(points, intervals)
    val want = reference(points, intervals)
    assert(want.nonEmpty && got == want)
    // multiplicity: t=20 sits in intervals a and c
    assert(got.count(x => x._2 == 20L) == 2)
    // inclusive single-point interval b matches t=10
    assert(got.contains((1L, 10L, "b")))
  }

  test("null keys on either side never match") {
    val l = Seq((Some(1L), 10L), (None: Option[Long], 10L)).toDF("key", "t")
    val r = Seq((Some(1L), 0L, 99L, "a"), (None: Option[Long], 0L, 99L, "n"))
      .toDF("key", "s", "e", "iname")
    val out = RangeJoin.pointInIntervalNative(l, r, Seq("key"), "t", "s", "e")
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
  }

  test("multi-partition merge equals the reference on a larger skewed input") {
    val l = (0 until 5000).map(i => ((i % 7).toLong, i.toLong)).toDF("key", "t")
      .repartition(8)
    val r = (0 until 300).map { i =>
      val k = (i % 9).toLong
      (k, (i * 13 % 400).toLong, (i * 13 % 400 + i % 50).toLong, s"i$i")
    }.toDF("key", "s", "e", "iname").repartition(5)
    val got = RangeJoin.pointInIntervalNative(l, r, Seq("key"), "t", "s", "e")
      .groupBy($"key").agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val want = l.join(r, l("key") === r("key") && r("s") <= l("t") && l("t") <= r("e"))
      .groupBy(l("key")).agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(want.nonEmpty && got == want)
  }

  test("self-join (points as their own ±5 intervals) resolves duplicate attrs") {
    val base = points.select($"key", $"t", $"pname")
    // native path: intervals DERIVED from the same frame — exercises
    // the exprId re-aliasing (plain Spark joins reject this lineage
    // with an ambiguous-self-join error)
    val asIntervals = base.select($"key", ($"t" - 5).as("s"), ($"t" + 5).as("e"),
      $"pname".as("iname"))
    val got = native(base, asIntervals)
    // reference built from independent data with identical contents
    val freshIntervals = Seq(
      (1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 30L, "p30"),
      (2L, 15L, "q15"), (3L, 5L, "r5")
    ).map { case (k, t, n) => (k, t - 5, t + 5, n) }.toDF("key", "s", "e", "iname")
    val want = reference(points, freshIntervals)
    assert(got == want && got.nonEmpty)
  }

  test("plans through IntervalJoinExec") {
    val df = RangeJoin.pointInIntervalNative(points, intervals, Seq("key"), "t", "s", "e")
    val found = df.queryExecution.executedPlan.collectFirst {
      case e: IntervalJoinExec => e
    }.orElse(df.queryExecution.executedPlan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collectFirst { case e: IntervalJoinExec => e }
    }.flatten)
    assert(found.isDefined, s"expected IntervalJoinExec:\n${df.queryExecution.executedPlan}")
  }
}
