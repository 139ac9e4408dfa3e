package graft

import org.apache.spark.sql.functions._
import graft.operators.DeltaJoin

/** Delta-join maintenance: the four-part refresh identity equals the
  * full recompute on real tables and on edge cases (empty deltas,
  * delta-only keys, keys spanning the base/delta boundary).
  */
class DeltaJoinSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("maintain == full recompute on the trade tables") {
    val li = graft.sources.Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_extendedprice")
    val o = graft.sources.Tables.orders(spark, d)
      .select($"o_orderkey".as("l_orderkey"), $"o_custkey")
    val (a, da) = (li.filter($"l_orderkey" % 3 =!= 0),
      li.filter($"l_orderkey" % 3 === 0))
    val (b, db) = (o.filter($"l_orderkey" % 2 =!= 0),
      o.filter($"l_orderkey" % 2 === 0))
    val full = li.join(o, Seq("l_orderkey"))
    val maintained = DeltaJoin.maintain(
      a.join(b, Seq("l_orderkey")), a, da, b, db, Seq("l_orderkey"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(canon(maintained) == canon(full))
    assert(full.count() > 0)
  }

  test("empty deltas contribute nothing; delta-only keys appear") {
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val b = Seq((1L, "b1")).toDF("k", "bv")
    val empty = a.filter(lit(false))
    assert(DeltaJoin.delta(a, empty, b, b.filter(lit(false)), Seq("k"))
      .count() == 0)
    // a delta row joining a delta row (key 9 on both sides, absent
    // from the bases) must surface exactly once
    val da = Seq((9L, "a9")).toDF("k", "av")
    val db = Seq((9L, "b9")).toDF("k", "bv")
    val got = DeltaJoin.maintain(a.join(b, Seq("k")), a, da, b, db, Seq("k"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "a1", "b1"), (9L, "a9", "b9")))
  }
}
