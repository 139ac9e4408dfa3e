package graft

import graft.operators.BloomJoin

/** The bloom semi-join pre-pass must (a) return exactly the plain
  * semi join's rows — no false negatives by construction, false
  * positives scrubbed by the exact join — and (b) actually prune:
  * the prefiltered fact scan should carry a small multiple of the
  * true match count, not the full table, into the join shuffle.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("bloom-prefiltered semi join equals the plain semi join") {
    val li = graft.sources.Tables.lineitem(spark, d)
    val hot = graft.sources.Tables.orders(spark, d)
      .filter($"o_totalprice" > 400000).select($"o_orderkey")
    val got = BloomJoin.semiJoin(li, "l_orderkey", hot, "o_orderkey", 10000L)
      .select($"l_orderkey", $"l_linenumber").orderBy($"l_orderkey", $"l_linenumber")
      .collect()
    val want = li.join(hot, $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey", $"l_linenumber").orderBy($"l_orderkey", $"l_linenumber")
      .collect()
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }

  test("semiJoin works when both sides use the same key name") {
    val li = graft.sources.Tables.lineitem(spark, d)
    val hot = graft.sources.Tables.orders(spark, d)
      .filter($"o_totalprice" > 400000)
      .select($"o_orderkey".as("l_orderkey")) // same name as the big side
    val n = BloomJoin.semiJoin(li, "l_orderkey", hot, "l_orderkey", 10000L).count()
    val want = li.join(
      graft.sources.Tables.orders(spark, d).filter($"o_totalprice" > 400000),
      $"l_orderkey" === $"o_orderkey", "left_semi").count()
    assert(n == want)
  }

  test("pre-filter prunes most non-matching rows before the join") {
    val li = graft.sources.Tables.lineitem(spark, d)
    val hot = graft.sources.Tables.orders(spark, d)
      .filter($"o_totalprice" > 400000).select($"o_orderkey")
    val bloom = BloomJoin.keyBloom(hot, "o_orderkey", 10000L)
    val kept = BloomJoin.preFilter(li, "l_orderkey", bloom).count()
    val total = li.count()
    val trueMatches = li.join(hot, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    info(s"kept $kept of $total (true matches: $trueMatches)")
    assert(kept >= trueMatches, "no false negatives")
    // generous bound: at the default FPP the kept set should be far
    // closer to the match count than to the full table
    assert(kept < trueMatches + (total - trueMatches) / 10,
      "bloom pre-filter should prune >90% of non-matching rows")
  }
}
