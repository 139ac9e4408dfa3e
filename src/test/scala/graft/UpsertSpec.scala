package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** Latest-wins MERGE semantics: keep / update / insert rows, highest
  * sequence wins per key, null update values keep the base value, and
  * the plan collapses the feed with a partial aggregate instead of a
  * window.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0)
  ).toDF("k", "name", "bal")

  // key 2: two updates, seq 11 must win; key 9: insert; key 1: one
  // update with a NULL value → base value survives (COALESCE)
  private def feed = Seq(
    (2L, 10L, Some(200.0)),
    (2L, 11L, Some(211.0)),
    (9L, 12L, Some(900.0)),
    (1L, 13L, None: Option[Double])
  ).toDF("k", "seq", "v")

  private def merged =
    Upsert.latestWins(base, feed, "k", "k", "seq", Map("bal" -> "v"))

  test("keep / update / insert rows with latest-seq winner") {
    val rows = merged.orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (1L, "alice", 10.0, "update"), // null update value keeps base bal
      (2L, "bob", 211.0, "update"),
      (3L, "carol", 30.0, "keep"),
      (9L, null, 900.0, "insert")))
  }

  test("feed collapses via aggregate, not a window") {
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected window-free plan:\n$plan")
    assert(plan.contains("max_by") || plan.contains("HashAggregate") ||
      plan.contains("ObjectHashAggregate"), s"expected aggregate collapse:\n$plan")
  }

  test("null merge keys in the feed are dropped, not emitted as phantom rows") {
    val withNull = Seq(
      (Some(2L), 10L, Some(200.0)),
      (None: Option[Long], 11L, Some(666.0)) // malformed CDC record
    ).toDF("k", "seq", "v")
    val out = Upsert.latestWins(base, withNull, "k", "k", "seq", Map("bal" -> "v"))
    assert(out.filter($"k".isNull).count() == 0)
    assert(out.count() == base.count()) // no insert materialized from the null key
    assert(out.filter($"bal" === 666.0).count() == 0)
  }

  test("snapshotDiff emits exactly the delta, and diff(merged, base) inverts the merge") {
    val after = Seq(
      (1L, "alice", 10.0),  // unchanged → filtered out
      (2L, "bob", 99.0),    // changed
      (9L, "zed", 900.0)    // added; key 3 (carol) removed
    ).toDF("k", "name", "bal")
    val diff = Upsert.snapshotDiff(base, after, "k", Seq("bal"))
      .orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))
    assert(diff.toSeq == Seq(
      (2L, "changed", 20.0, 99.0),
      (3L, "removed", 30.0, null),
      (9L, "added", null, 900.0)))
    // composition: diffing the upsert result against its base recovers
    // the update/insert rows the merge applied (never a removal)
    val merged = Upsert.latestWins(base, feed.toDF(), "k", "k", "seq", Map("bal" -> "v"))
      .drop("op")
    val d2 = Upsert.snapshotDiff(base, merged, "k", Seq("bal"))
    assert(d2.filter($"op" === "removed").count() == 0)
    assert(d2.filter($"op" === "added").select($"k").as[Long].collect().toSet == Set(9L))
  }

  test("update feed with duplicate winners per key is impossible by construction") {
    // 1000 updates for one key: exactly one merged row comes out
    val big = (0 until 1000).map(i => (2L, i.toLong, Some(i.toDouble)))
      .toDF("k", "seq", "v")
    val out = Upsert.latestWins(base, big, "k", "k", "seq", Map("bal" -> "v"))
    assert(out.count() == base.count())
    val r = out.filter($"k" === 2L).select($"bal").as[Double].head()
    assert(r == 999.0)
  }
}
