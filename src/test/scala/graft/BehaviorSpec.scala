package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ext.{Behavior, Graph, Stats, TextStats}
import graft.queries.Extended

/** Round-5 operators on PLANTED inputs with hand-computed expected
  * values: funnel ordering semantics, Markov transition probabilities,
  * cohort weeks, interval merging, exact regression recovery, MAD
  * outliers, bigram fluency, and PageRank vs. an in-memory reference
  * loop. Planted tables are written as parquet into a temp dir shaped
  * like a testdata sf dir, so the operators run their real read path.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  /** events.parquet in testdata is raw INT64 nanos; plant the same. */
  private def plantEvents(rows: Seq[(Long, Long, Long, String, Option[Double])]): String = {
    val dir = Files.createTempDirectory("graft-behavior").toString
    rows.toDF("event_id", "ts_sec", "user_id", "event_type", "value")
      .select($"event_id", ($"ts_sec" * 1000000000L).as("ts"), $"user_id",
        $"event_type", $"value", lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  private val day0 = 1704067200L // 2024-01-01 00:00:00 UTC epoch secs

  test("funnel: min-timestamp ordering semantics") {
    // u1 full funnel; u2 click precedes first view; u3 view only;
    // u4 purchase without view; u5 view==click timestamp converts
    val d = plantEvents(Seq(
      (1L, day0 + 10, 1L, "view", None), (2L, day0 + 20, 1L, "click", None),
      (3L, day0 + 30, 1L, "purchase", None),
      (4L, day0 + 10, 2L, "click", None), (5L, day0 + 20, 2L, "view", None),
      (6L, day0 + 10, 3L, "view", None),
      (7L, day0 + 10, 4L, "purchase", None),
      (8L, day0 + 10, 5L, "view", None), (9L, day0 + 10, 5L, "click", None)))
    val r = Behavior.funnel(spark, d).collect().head
    assert(r.getLong(0) == 5, "n_users")
    assert(r.getLong(1) == 4, "n_view")
    assert(r.getLong(2) == 2, "n_click (u1, u5)")
    assert(r.getLong(3) == 1, "n_purchase (u1)")
  }

  test("markov transitions: exact counts and integer probabilities") {
    val d = plantEvents(Seq(
      (1L, day0 + 1, 1L, "view", None), (2L, day0 + 2, 1L, "click", None),
      (3L, day0 + 3, 1L, "view", None),
      (4L, day0 + 1, 2L, "view", None), (5L, day0 + 2, 2L, "click", None)))
    val got = Behavior.markovTransitions(spark, d)
      .as[(String, String, Long, Long)].collect().toSet
    // from view: 2× to click; from click: 1× to view
    assert(got == Set(
      ("click", "view", 1L, 1000000L),
      ("view", "click", 2L, 1000000L)))
  }

  test("cohort retention: fixed-epoch week buckets") {
    val wk = 7L * 86400
    val d = plantEvents(Seq(
      (1L, day0 + 10, 1L, "view", None),          // u1 week 0
      (2L, day0 + wk + 10, 1L, "view", None),     // u1 week 1
      (3L, day0 + wk + 20, 2L, "view", None)))    // u2 first in week 1
    val got = Behavior.cohortRetention(spark, d)
      .as[(Int, Int, Long)].collect().toSet
    assert(got == Set((0, 0, 1L), (0, 1, 1L), (1, 0, 1L)))
  }

  test("topPaths: first-five path assembly and tie-broken top-k") {
    val d = plantEvents(Seq(
      (1L, day0 + 1, 1L, "view", None), (2L, day0 + 2, 1L, "click", None),
      (3L, day0 + 1, 2L, "view", None), (4L, day0 + 2, 2L, "click", None),
      (5L, day0 + 1, 3L, "error", None)))
    val got = Behavior.topPaths(spark, d).as[(String, Long)].collect().toSeq
    assert(got == Seq(("view>click", 2L), ("error", 1L)))
  }

  private def plantOrders(rows: Seq[(Long, Long, String, Double, String)]): String = {
    val dir = Files.createTempDirectory("graft-behavior").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate_s", "o_totalprice",
        "o_orderpriority")
      .select($"o_orderkey", $"o_custkey", lit("O").as("o_orderstatus"),
        $"o_totalprice", to_timestamp($"o_orderdate_s").as("o_orderdate"),
        $"o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("linearRegression: recovers a planted exact line") {
    // y = x + 10 dollars at x days from the center date ⇒ slope
    // exactly 100 cents/day, intercept exactly 1000 cents
    val rows = (-2 to 2).map { x =>
      val date = java.time.LocalDate.of(1998, 4, 1).plusDays(x.toLong)
      (x + 10L, 1L, date.toString, x + 10.0, "1-URGENT")
    }
    val d = plantOrders(rows)
    val r = Stats.linearRegression(spark, d).collect().head
    assert(r.getLong(1) == 5)
    assert(r.getDouble(2) == 100.0, "slope cents/day")
    assert(r.getDouble(3) == 1000.0, "intercept cents")
  }

  test("intervalCoverage: overlap merges, gap splits") {
    val d = plantOrders(Seq(
      // cust 1: days 0 and 10 overlap (30-day windows) → one island
      // of 40 days; cust 2: days 0 and 100 → two islands, 60 days
      (1L, 1L, "1995-01-01", 1.0, "1-URGENT"),
      (2L, 1L, "1995-01-11", 1.0, "1-URGENT"),
      (3L, 2L, "1995-01-01", 1.0, "1-URGENT"),
      (4L, 2L, "1995-04-11", 1.0, "1-URGENT")))
    val got = Stats.intervalCoverage(spark, d)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set((1L, 1, 40L), (2L, 2, 60L)))
  }

  test("madOutliers: hand-computed median/MAD/outlier count") {
    // values 1,2,3,4,100 → med 3, devs 2,1,0,1,97 → mad 1,
    // outliers where dev > 3 → exactly the 100
    val d = plantEvents(Seq(
      (1L, day0 + 1, 1L, "click", Some(1.0)),
      (2L, day0 + 2, 1L, "click", Some(2.0)),
      (3L, day0 + 3, 1L, "click", Some(3.0)),
      (4L, day0 + 4, 1L, "click", Some(4.0)),
      (5L, day0 + 5, 1L, "click", Some(100.0))))
    val r = Stats.madOutliers(spark, d).collect().head
    assert(r.getLong(1) == 5)
    assert(r.getDouble(2) == 3.0, "median")
    assert(r.getDouble(3) == 1.0, "mad")
    assert(r.getLong(4) == 1, "outliers")
  }

  private def plantDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-behavior").toString
    rows.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("web").as("source"), length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("bigramScore: conditional-probability average") {
    // corpus: "a b c" + "a c". heads: a→{b,c} (2), b→{c} (1), c: none
    // doc 1: P(b|a)=1/2, P(c|b)=1 → mean 0.75; doc 2: P(c|a)=1/2
    val d = plantDocs(Seq((1L, "a b c"), (2L, "a c")))
    val got = TextStats.bigramScore(spark, d)
      .as[(Long, Int, Double)].collect().toSet
    assert(got == Set((1L, 2, 0.75), (2L, 1, 0.5)))
  }

  test("pageRank: bit-identical to an in-memory integer reference") {
    val edgePairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 1L), (1L, 3L), (4L, 1L), (1L, 4L))
    val got = Graph.pageRankOnEdges(
        edgePairs.toDF("src", "dst"), iters = 3)
      .select($"node", $"r").as[(Long, Long)].collect().toMap

    // reference: same recurrence, plain Scala integer arithmetic
    val S = 1000000000000L
    val out = edgePairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = out.size
    var r = out.keys.map(k => k -> S / n).toMap
    for (_ <- 1 to 3) {
      val got2 = out.toSeq
        .flatMap { case (u, vs) => vs.map(v => v -> r(u) / vs.size) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = r.keys.map(k => k -> (15L * S / (100L * n) + 85L * got2(k) / 100L)).toMap
    }
    assert(got == r)
  }

  test("paretoSkyline: window reformulation matches planted dominance") {
    val d = plantOrders(Seq(
      (1L, 1L, "1990-01-06", 1.00, "1-URGENT"),   // (100, 5) skyline
      (2L, 1L, "1990-01-04", 2.00, "1-URGENT"),   // (200, 3) skyline
      (3L, 1L, "1990-01-11", 1.50, "1-URGENT"),   // (150,10) dominated by (100,5)
      (4L, 1L, "1990-01-08", 1.00, "1-URGENT"),   // (100, 7) dominated by (100,5)
      (5L, 2L, "1990-01-02", 9.00, "1-URGENT")))  // lone point survives
    val got = Stats.paretoSkyline(spark, d)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 100L, 5), (1L, 200L, 3), (2L, 900L, 1)))
  }

  test("weightedSample: deterministic and weight-monotone in aggregate") {
    val d = "/root/testdata/sf0.001"
    val a = Stats.weightedSample(spark, d).collect().map(_.toSeq).toSeq
    val b = Stats.weightedSample(spark, d).collect().map(_.toSeq).toSeq
    assert(a == b, "rerun must keep the identical sample")
    // kept rows skew heavy: average kept weight exceeds the overall
    // average weight (that is the point of weight-proportional keep)
    val row = Stats.weightedSample(spark, d)
      .agg(sum($"n"), sum($"n_kept"), sum($"kept_weight")).collect().head
    val (n, nk, kw) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nk > 0 && nk < n)
    val overallAvg = graft.sources.Tables.orders(spark, d)
      .agg(avg(expr("floor(o_totalprice * 100)"))).collect().head.getDouble(0)
    assert(kw.toDouble / nk > overallAvg)
  }

  test("minuteAnomalies: flags exactly the planted spike") {
    // ten calm minutes of 10 events + one minute of 100:
    // mean 18.18, 9*var 6025 < (100-18.18)^2 — only the spike flags
    val rows = (0 until 10).flatMap { m =>
      (0 until 10).map(i => ((m * 10 + i).toLong, day0 + m * 60L,
        1L, "view", Option.empty[Double]))
    } ++ (0 until 100).map(i =>
      ((1000 + i).toLong, day0 + 20 * 60L, 1L, "view", Option.empty[Double]))
    val d = plantEvents(rows)
    val got = Stats.minuteAnomalies(spark, d)
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(100L), s"only the spike minute flags: $got")
  }

  test("fuzzyJoin: deletion blocking finds substitution/insert/delete, not transposition") {
    import graft.operators.FuzzyJoin
    val names = Seq("abcd", "abxd", "abd", "abcde", "acbd", "zzzz")
      .toDF("name")
    val got = FuzzyJoin.editOnePairs(names)
      .as[(String, String, Int)].collect().toSet
    // one edit apart: abcd↔abxd (substitute), abcd↔abd (delete c),
    // abcd↔abcde (insert e), abd↔abxd (insert x), abd↔acbd (insert c).
    // acbd = transposition of abcd → distance 2, must NOT appear;
    // zzzz matches nothing.
    assert(got == Set(
      ("abcd", "abxd", 1), ("abcd", "abd", 1), ("abcd", "abcde", 1),
      ("abd", "abxd", 1), ("abd", "acbd", 1)), s"got $got")
  }

  test("timeWeightedAvg: holds each value for its duration") {
    // u1: value 1.00 held 10s, then 3.00 held 30s, then final reading
    // (no duration) → twa = (100*10000 + 300*30000)/40000/100 = 2.5
    val d = plantEvents(Seq(
      (1L, day0, 1L, "view", Some(1.0)),
      (2L, day0 + 10, 1L, "view", Some(3.0)),
      (3L, day0 + 40, 1L, "view", Some(9.0)),
      (4L, day0, 2L, "view", Some(5.0)))) // single reading → drops out
    val got = graft.ext.Events.timeWeightedAvg(spark, d)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2, 40000L, 2.5)))
  }

  test("pageRank: zero-in-degree nodes keep their teleport share, their mass still flows") {
    // node 3 sends to 1 but nothing sends to 3 — it must survive every
    // round (teleport-only rank) and its contribution must reach 1
    val got = Graph.pageRankOnEdges(
        Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst"), iters = 2)
      .select($"node", $"r").as[(Long, Long)].collect().toMap
    val S = 1000000000000L
    val teleport = 15L * S / (100L * 3)
    assert(got.keySet == Set(1L, 2L, 3L), "no node may drop out")
    assert(got(3L) == teleport, "in-degree-0 node holds exactly the teleport share")
    // round 2: node 1 receives node 2's full round-1 rank and node 3's
    // teleport-only rank
    val r1n2 = teleport + 85L * (S / 3) / 100L
    assert(got(1L) == teleport + 85L * (r1n2 + teleport) / 100L)
  }

  test("pageRank trade graph: rank mass is conserved up to div truncation") {
    val d = "/root/testdata/sf0.001"
    val out = Graph.pageRank(spark, d)
    val (total, nNodes, degSum) = out
      .agg(sum($"rank_p12"), count(lit(1)), sum($"deg"))
      .as[(Long, Long, Long)].collect().head
    val S = 1000000000000L
    // per round the share split loses Σ(r mod deg) < Σdeg units and
    // the per-node recombination/teleport each lose < 1; r0 loses < n
    assert(total <= S && total >= S - 2 * (degSum + 2 * nNodes) - nNodes,
      s"mass $total vs $S with $nNodes nodes, degSum $degSum")
    assert(out.filter($"rank_p12" <= 0).count() == 0)
  }

  test("triangleCount: planted baskets — one closed wedge, repeat co-purchases collapse") {
    val dir = Files.createTempDirectory("graft-tri").toString
    // basket 10 closes triangle {1,2,3}; basket 11 hangs edge 3-4;
    // basket 12 repeats edge 1-2 (must not double-count)
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 3L), (11L, 4L),
        (12L, 1L), (12L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val r = Graph.triangleCount(spark, dir).as[(Long, Long, Long)]
      .collect().head
    assert(r == ((4L, 4L, 1L)), "4 nodes, 4 edges, 1 triangle")
  }

  test("triangleCount: a star graph has wedges but no triangles") {
    val dir = Files.createTempDirectory("graft-star").toString
    // hub part 1 co-occurs pairwise with 2..5 via two-item baskets
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L),
        (4L, 1L), (4L, 5L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val r = Graph.triangleCount(spark, dir).as[(Long, Long, Long)]
      .collect().head
    assert(r == ((5L, 4L, 0L)), "5 nodes, 4 spokes, 0 triangles")
  }

  test("rfmSegments: five users, perfectly aligned metrics — each " +
    "lands its own diagonal RFM cell") {
    // user i: i purchases of 1.00, last on day i -> with n = 5 every
    // quintile is the rank itself; user i scores (i, i, i)
    val rows = (1 to 5).flatMap { i =>
      (0 until i).map { j =>
        (i * 10L + j, day0 + i * 86400L + j, i.toLong, "purchase",
          Some(1.0))
      }
    }
    val d = plantEvents(rows)
    val got = graft.ext.Behavior.rfmSegments(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == (1 to 5).map(i =>
      (i * 111L, 1L, i * 100L)), s"got ${got.toSeq}")
  }

  test("shapleyAttribution: hand-computed lattice — unobserved " +
    "coalitions score 0 and efficiency holds at x24 grain") {
    // A: purchase only -> v({})=1e6; B: view only -> v({view})=0;
    // C: click+purchase -> v({click})=1e6; all other coalitions
    // unobserved -> 0. Hand Shapley x24: click 0, others -8e6
    val d = plantEvents(Seq(
      (1L, day0 + 10, 1L, "purchase", None),
      (2L, day0 + 10, 2L, "view", None),
      (3L, day0 + 10, 3L, "click", None),
      (4L, day0 + 20, 3L, "purchase", None)))
    val got = graft.ext.Behavior.shapleyAttribution(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("click", 0L, 0L),
      ("error", -8000000L, -333334L),
      ("signup", -8000000L, -333334L),
      ("view", -8000000L, -333334L)), s"got ${got.toSeq}")
    // efficiency: sum(phi24) == 24 * (v(full) - v(empty))
    assert(got.map(_._2).sum == 24L * (0L - 1000000L))
  }

  test("fellegiSunter: hand-computed LQ weights — agree and disagree " +
    "branches on a three-identical-doc plant with one lang outlier") {
    val dir = Files.createTempDirectory("graft-fs").toString
    // identical text -> all 3 pairs candidates AND matches (nm=3,
    // nu=0); lang: docs 1,2 'en', doc 3 'de' -> amL=1; source and
    // length agree everywhere -> amS=amB=3
    val t = "alpha beta gamma delta epsilon zeta"
    Seq((1L, t, "en", "s1"), (2L, t, "en", "s1"), (3L, t, "de", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .select($"doc_id", $"text", $"lang", $"source",
        length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.ext.Dedup.fellegiSunter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // w_agree(S/B) = LQ(4*2)-LQ(1*5) = 2079441-1609437 = 470004
    // w_agree(L)   = LQ(2*2)-LQ(1*5) = 1386294-1609437 = -223143
    // w_dis(L)     = LQ(3*2)-LQ(1*5) = 1791759-1609437 = 182322
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 1L, 1L, 1L, -223143L + 470004L + 470004L),
      (1L, 3L, 1L, 0L, 1L, 1L, 182322L + 470004L + 470004L),
      (2L, 3L, 1L, 0L, 1L, 1L, 182322L + 470004L + 470004L)),
      s"got ${got.toSeq}")
  }

  test("degreeAssortativity: a star is exactly -1; a regular graph " +
    "has no degree variance and returns NULL") {
    val star = Files.createTempDirectory("graft-assort").toString
    // one customer x three suppliers: hub deg 3, leaves deg 1 -> r = -1
    Seq((1L, 1L), (1L, 2L), (1L, 3L))
      .toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$star/lineitem.parquet")
    Seq((1L, 5L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$star/orders.parquet")
    val r = graft.ext.Graph.degreeAssortativity(spark, star)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((6L, 200L, -1000000L)), s"star: $r")
    // complete bipartite 2x2: every node degree 2, zero variance
    val reg = Files.createTempDirectory("graft-assort2").toString
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$reg/lineitem.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$reg/orders.parquet")
    val n = graft.ext.Graph.degreeAssortativity(spark, reg)
      .collect().head
    assert(n.getLong(0) == 8L && n.isNullAt(2), s"regular: $n")
  }

  test("deltaDedup: base partner rejects, earlier in-batch partner " +
    "rejects, novel delta docs accepted") {
    val dir = Files.createTempDirectory("graft-deltadup").toString
    // base doc 1 == delta doc 10; delta docs 20 == 30 (novel pair);
    // delta 40 unique. >=3 tokens each so shingles exist.
    Seq((1L, "alpha beta gamma delta alpha beta"),
        (10L, "alpha beta gamma delta alpha beta"),
        (20L, "epsilon zeta eta theta iota kappa"),
        (30L, "epsilon zeta eta theta iota kappa"),
        (40L, "lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.ext.Dedup.deltaDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (10L, 1L, 0L, 0L),   // dup of base doc 1 -> reject
      (20L, 0L, 0L, 1L),   // partner 30 arrives later -> accept
      (30L, 0L, 1L, 0L),   // partner 20 already accepted -> reject
      (40L, 0L, 0L, 1L)),  // novel -> accept
      s"got ${got.toSeq}")
  }

  test("countMinSketch: point estimates dominate true counts; halves merge to the whole") {
    def mk(us: Seq[Long], idBase: Long) =
      us.zipWithIndex.map { case (u, i) => (idBase + i, day0 + i, u, "view", None: Option[Double]) }
    // u1 ×8 (heavy), u2 ×3, u3 ×1 — split across two "days"
    val half1 = mk(Seq.fill(5)(1L) ++ Seq(2L), 0)
    val half2 = mk(Seq.fill(3)(1L) ++ Seq(2L, 2L, 3L), 100)
    val dAll = plantEvents(half1 ++ half2)
    val dH1 = plantEvents(half1)
    val dH2 = plantEvents(half2)
    def cells(d: String): Map[(Int, Long), Long] =
      graft.ext.Stats.countMinSketch(spark, d).collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val all = cells(dAll)
    // mergeability: sketch(A ∪ B) = sketch(A) + sketch(B), cell-wise
    val merged = (cells(dH1).toSeq ++ cells(dH2).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == all, "cell-wise sum of half sketches == whole sketch")
    // CMS guarantee: min over rows of the user's cells ≥ true count
    val P = 2147483647L
    val as = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
    val truth = Map(1L -> 8L, 2L -> 3L, 3L -> 1L)
    truth.foreach { case (u, n) =>
      val est = (0 until 4).map(r => all.getOrElse((r, u % P * as(r) % P % 64), 0L)).min
      assert(est >= n, s"estimate for u$u must dominate true count")
    }
    // row marginals: every row's cells sum to the event total
    (0 until 4).foreach { r =>
      assert(all.collect { case ((`r`, _), c) => c }.sum == 12L)
    }
  }

  test("bfsOnEdges: exact layers on a line graph, horizon cut, unreachable absent") {
    // line 0-1-2-3-4-5 (both directions) plus isolated pair 10-11
    val base = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val got = graft.ext.Graph.bfsOnEdges(edges, Seq(0L).toDF("node"), maxDist = 3)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3),
      "nodes past the horizon and the disconnected component stay absent")
    // a second seed merges by MIN distance
    val two = graft.ext.Graph.bfsOnEdges(edges, Seq(0L, 4L).toDF("node"), maxDist = 3)
      .as[(Long, Int)].collect().toMap
    assert(two == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 1))
  }

  test("personalizedPageRank: support stays inside the 2-hop seed " +
    "neighborhood; every seed keeps teleport mass") {
    val d = "/root/testdata/sf0.001"
    val got = graft.ext.Graph.personalizedPageRank(spark, d)
      .select($"kind", $"entity_id").as[(String, Long)].collect().toSet
    // mass travels exactly one edge per round: anything holding mass
    // after 2 rounds is a seed or within 2 static hops of one
    val edges = graft.ext.Graph.tradeEdges(spark, d)
    val seeds = edges.select($"src".as("node")).distinct()
      .filter($"node" % 2 === 0 && expr("node div 2") <= 25)
    val reach = graft.ext.Graph.bfsOnEdges(edges, seeds, maxDist = 2)
      .select(when($"node" % 2 === 0, "cust").otherwise("supp").as("kind"),
        expr("node div 2").as("entity_id"))
      .as[(String, Long)].collect().toSet
    assert(got.nonEmpty && got.subsetOf(reach),
      s"PPR mass escaped the 2-hop neighborhood: ${got.diff(reach).take(5)}")
    val seedIds = seeds.select(expr("node div 2")).as[Long].collect().toSet
    assert(seedIds.forall(id => got.contains(("cust", id))),
      "every in-graph seed must keep its teleport mass")
  }

  test("temporalOnEdges: time-respecting paths only, earliest arrival wins") {
    // A=0. Respecting chain: 0 -(t5)-> 1 -(t10)-> 2 reaches 2 at 10.
    // Violating chain: 0 -(t9)-> 3 -(t3)-> 4: the 3->4 contact
    // happened BEFORE 3 was reached (3 < 9) — 4 must stay absent,
    // though static BFS would reach it. A second 0->1 contact at t2
    // must win the earliest-arrival min over the t5 one.
    val sym = Seq(
      (0L, 1L, 5L), (1L, 2L, 10L),
      (0L, 3L, 9L), (3L, 4L, 3L),
      (0L, 1L, 2L))
      .toDF("u", "v", "t")
    val got = graft.ext.Graph
      .temporalOnEdges(sym, Seq(0L).toDF("node"), maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 2L, 2L -> 10L, 3L -> 9L),
      s"time gate or earliest-arrival min broken: $got")
  }

  test("hllRegisters: estimate tracks exact distinct within sketch error bounds") {
    // sf0.01: per-group distinct ≈ 20·m, clear of the small-range
    // regime (< 2.5·m) where raw HLL needs the linear-counting patch
    val d = "/root/testdata/sf0.01"
    val est = graft.ext.Stats.hllRegisters(spark, d)
      .select($"grp", $"est").as[(String, Double)].collect().toMap
    val exact = graft.sources.Tables.orders(spark, d)
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (g, n) =>
      val rel = math.abs(est(g) - n) / n
      // m=64 → σ ≈ 1.04/√64 = 13%; 3σ headroom for the fixed hash
      assert(rel <= 0.39, f"group $g: est=${est(g)}%.1f exact=$n rel=$rel%.2f")
    }
  }

  test("quantileSketch: the rank-⌈q·n⌉ value lands inside the reported sub-bucket") {
    val d = "/root/testdata/sf0.01"
    val est = graft.ext.Stats.quantileSketch(spark, d)
      .select($"event_type", $"p50_cents", $"p95_cents", $"p99_cents")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    val byType = graft.sources.Tables.events(spark, d)
      .filter($"value".isNotNull)
      .select($"event_type", expr("CAST(floor(value * 100) AS BIGINT)").as("x"))
      .filter($"x" >= 0)
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (t, rs) => t -> rs.map(_._2).sorted }
    assert(est.keySet == byType.keySet)
    for (t <- est.keySet; (lower, q) <- est(t).zip(Seq(50, 95, 99))) {
      val xs = byType(t)
      // rank semantics of the crossing rule: first index where
      // 100·cum ≥ q·n, i.e. the ⌈q·n/100⌉-th smallest value
      val exact = xs((q * xs.length + 99) / 100 - 1)
      // sub-bucket [(4+sub)·2^(m−2), +2^(m−2)) ⇒ upper < 1.25·lower
      val upper = if (lower < 8) lower else lower + lower / 4 - 1
      assert(exact >= lower && exact <= upper,
        s"$t p$q: rank value $exact outside sketch bucket [$lower, $upper]")
    }
  }

  test("rollingHll: sketch-merge estimates track q121's exact rolling distincts") {
    val d = "/root/testdata/sf0.01"
    val est = graft.ext.Stats.rollingHll(spark, d)
      .select($"day".cast("string"), $"est").as[(String, Double)]
      .collect().toMap
    val exact = graft.ext.Events.rollingDistinctUsers(spark, d)
      .select($"day".cast("string"), $"users_7d").as[(String, Long)]
      .collect().toMap
    assert(est.keySet == exact.keySet, "both paths must cover the same days")
    exact.foreach { case (day, n) =>
      val rel = math.abs(est(day) - n) / n
      assert(rel <= 0.39, f"$day: est=${est(day)}%.1f exact=$n rel=$rel%.2f")
    }
  }

  test("embeddingCovariance: ±0.5 plant — zero first moments, exact product sums") {
    val dir = Files.createTempDirectory("graft-cov").toString
    Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(-0.5f)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = Stats.embeddingCovariance(spark, dir).collect()
    assert(rows.length == 36, "8·9/2 upper-triangular pairs")
    rows.foreach { r =>
      assert(r.getLong(2) == 2L && r.getLong(3) == 0L && r.getLong(4) == 0L)
      assert(r.getLong(5) == 500000000000L, "Σxy = 2·(5·10⁵)²")
      assert(r.getLong(6) == 1000000000000L,
        "cov_num = n·Σxy − Σx·Σy = 10¹²")
    }
  }

  test("scd2Lookup: clicks resolve to the state version in effect, pre-history clicks keep null") {
    // state history of u1 (non-click): view@10 → v1, purchase@30 → v2
    val d = plantEvents(Seq(
      (1L, day0 + 10, 1L, "view", None),
      (2L, day0 + 30, 1L, "purchase", None),
      (3L, day0 + 5, 1L, "click", None),   // before any state → null
      (4L, day0 + 20, 1L, "click", None),  // inside v1's effect
      (5L, day0 + 35, 1L, "click", None))) // after v2 started
    val got = graft.ext.Events.scd2Lookup(spark, d)
      .select($"click_id", $"state").as[(Long, Option[String])]
      .collect().toSeq
    assert(got == Seq((3L, None), (4L, Some("view")), (5L, Some("purchase"))))
  }

  test("rollingDistinctUsers: 7-day fan-out window, horizon-capped") {
    val day = 86400L
    val d = plantEvents(Seq(
      (1L, day0, 1L, "view", None), (2L, day0 + 1, 2L, "view", None),
      (3L, day0 + 3 * day, 2L, "view", None),
      (4L, day0 + 8 * day, 3L, "view", None)))
    val got = graft.ext.Events.rollingDistinctUsers(spark, d)
      .select($"users_7d").as[Long].collect().toSeq
    // days 1-7 see {u1,u2}; day 8 sees only u2 (day-4 activity);
    // day 9 sees {u2 (day 4), u3}; nothing past the max observed day
    assert(got == Seq(2L, 2L, 2L, 2L, 2L, 2L, 2L, 1L, 2L))
  }

  test("interpolate: planted series — exact hits, midpoints, no extrapolation") {
    val step = graft.ext.Events.InterpStepUs / 1000000L // 21600 s
    // day0 is exactly grid-aligned (1704067200 % 21600 == 0). Span is
    // pinned by u1's views at g0 and g4; u1 purchases at g1 (10.0) and
    // g3 (20.0); u2 purchases mid-interval: t=0.5·step (5.0) and
    // t=3·step (25.0).
    val d = plantEvents(Seq(
      (1L, day0, 1L, "view", None),
      (2L, day0 + step, 1L, "purchase", Some(10.0)),
      (3L, day0 + 3 * step, 1L, "purchase", Some(20.0)),
      (4L, day0 + 4 * step, 1L, "view", None),
      (5L, day0 + step / 2, 2L, "purchase", Some(5.0)),
      (6L, day0 + 3 * step, 2L, "purchase", Some(25.0))))
    val got = graft.ext.Events.interpolate(spark, d)
      .select($"user_id", $"grid_us", $"interp")
      .as[(Long, Long, Option[Double])].collect().toSeq
    val g = (0 to 4).map(i => (day0 + i.toLong * step) * 1000000L)
    assert(got == Seq(
      // u1: null before first purchase, exact hits, linear midpoint
      (1L, g(0), None), (1L, g(1), Some(10.0)), (1L, g(2), Some(15.0)),
      (1L, g(3), Some(20.0)), (1L, g(4), None),
      // u2: purchase at 0.5·step → g1 fraction (1−0.5)/(3−0.5) = 0.2
      // of the 5→25 rise = 9.0; g2 fraction 0.6 → 17.0; g3 exact
      (2L, g(0), None), (2L, g(1), Some(9.0)), (2L, g(2), Some(17.0)),
      (2L, g(3), Some(25.0)), (2L, g(4), None)), s"got $got")
  }

  test("peakConcurrency: planted overlaps, hour-boundary carry, half-open ends") {
    // day 0 hour 0: three 30-min windows opened at 0/600/1200s — all
    // three open at t=1200 (peak 3); a window opened at 3500s crosses
    // into hour 1 where it overlaps one opened at 3700s (peak 2).
    // day 1: one lone window. Day peaks: 3 and 1.
    val d = plantEvents(Seq(
      (1L, day0, 1L, "view", None),
      (2L, day0 + 600, 2L, "view", None),
      (3L, day0 + 1200, 3L, "view", None),
      (4L, day0 + 3500, 4L, "view", None),
      (5L, day0 + 3700, 5L, "view", None),
      (6L, day0 + 86400 + 7200, 6L, "view", None)))
    val got = graft.ext.Events.peakConcurrency(spark, d)
      .as[(Long, Int, Long)].collect().toSeq
    val d0 = day0 / 86400
    assert(got == Seq((d0, 3, 2L), (d0 + 1, 1, 1L)), s"got $got")
  }

  test("autocorrelation: planted alternating series recovers ±1 at parity lags") {
    // hourly counts alternate 1, 3, 1, 3 … over 48 hours: y is the
    // linear map 4−x of x at odd lags (r = −1) and x itself at even
    // lags (r = +1); n at lag k is 48−k
    var eid = 0L
    val rows = (0 until 48).flatMap { i =>
      val n = if (i % 2 == 0) 1 else 3
      (0 until n).map { j =>
        eid += 1; (eid, day0 + i * 3600L + j, 1L, "view", None)
      }
    }
    val d = plantEvents(rows)
    val got = graft.ext.Events.autocorrelation(spark, d)
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("view", 1, 47L, -1.0), ("view", 2, 46L, 1.0),
      ("view", 3, 45L, -1.0), ("view", 24, 24L, 1.0)), s"got $got")
  }

  private def plantLineitem(rows: Seq[(Double, Double, Double, Double)]): String = {
    val dir = Files.createTempDirectory("graft-behavior").toString
    rows.toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("survivalCurve: planted lifetimes — fractions, horizon cap, single-event users") {
    val day = 86400L
    val d = plantEvents(Seq(
      (1L, day0, 1L, "view", None), (2L, day0 + 3 * day, 1L, "view", None),
      (3L, day0 + 5, 2L, "view", None), // single-ish burst: lifetime 0
      (4L, day0, 3L, "view", None), (5L, day0 + 20 * day, 3L, "view", None)))
    val got = graft.ext.Events.survivalCurve(spark, d)
      .as[(Long, Long, Double)].collect().toSeq
    val expected = (0L to 14L).map { k =>
      val n = Seq(3L, 0L, 20L).count(_ >= k) // lifetimes 3, 0, 20 (capped)
      (k, n.toLong, BigDecimal(n * 10000.0 / 3).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 10000.0)
    }
    assert(got == expected, s"got $got")
  }

  test("clampedBalance: waterline closed form equals the sequential clamp loop") {
    // debits dip the raw prefix below zero twice; the clamp must
    // absorb each deficit (not bank it against later credits)
    val evs = Seq(
      (1L, day0 + 10, 1L, "view", None),            // 0 → clamp(−100) = 0
      (2L, day0 + 20, 1L, "purchase", Some(2.50)),  // 250
      (3L, day0 + 30, 1L, "view", None),            // 150
      (4L, day0 + 40, 1L, "view", None),            // 50
      (5L, day0 + 50, 1L, "view", None),            // clamp(−50) = 0
      (6L, day0 + 86400 + 10, 1L, "purchase", Some(1.00))) // next day: 100
    val d = plantEvents(evs)
    // brute sequential clamp loop — the semantics the closed form claims
    var bal = 0L
    val brute = evs.map { case (_, _, _, et, v) =>
      bal = math.max(0L, bal +
        (if (et == "purchase") math.round(v.get * 100) else -100L))
      bal
    }
    assert(brute == Seq(0L, 250L, 150L, 50L, 0L, 100L))
    val got = graft.ext.Events.clampedBalance(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val d0 = day0 / 86400
    assert(got == Seq((1L, d0, 0L, 5L), (1L, d0 + 1, 100L, 1L)), s"got $got")
  }

  test("randomProjection: hand-computed W·q on a planted vector") {
    val dir = Files.createTempDirectory("graft-proj").toString
    // embedding[i] = (i+1)·0.5 (exact in binary) → q = 500000·[1..8];
    // W rows from (31k+17i) mod 7 − 3, inner products computed by hand
    Seq((1L, (1 to 8).map(i => i * 0.5f).toArray))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = Stats.randomProjection(spark, dir)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0, -17L * 500000), (1L, 1, -14L * 500000),
      (1L, 2, 10L * 500000), (1L, 3, -1L * 500000)), s"got $got")
  }

  test("weightedMedian: revenue weight pulls the median to the heavy value") {
    val dir = Files.createTempDirectory("graft-wmed").toString
    Seq(("A", 1.0, 1.00), ("A", 2.0, 10.00), ("A", 3.0, 1.00),
        ("B", 1.0, 1.00), ("B", 9.0, 10.00))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.Extended.weightedMedian(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    // A: weights 100/1000/100 cents → first qty with 2·cum ≥ 1200 is 2;
    // B: 100/1000 → qty 9 carries the weight (an unweighted median
    // could never land there)
    assert(got == Seq(("A", 2L, 1200L), ("B", 9L, 1100L)), s"got $got")
  }

  test("correlationMatrix: planted linear couplings recover ±1 exactly") {
    // price = 2·qty (r=+1), discount = (5−qty)/100 (r=−1), tax = qty²
    // (strictly monotone but nonlinear: 0 < r < 1)
    val d = plantLineitem((1 to 4).map { q =>
      (q.toDouble, 2.0 * q, (5 - q) / 100.0, (q * q).toDouble)
    })
    val got = Stats.correlationMatrix(spark, d)
      .as[(Int, Int, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._4)).toMap
    for (i <- 0 to 3) assert(got((i, i)) == 1.0, s"corr($i,$i)")
    assert(got((0, 1)) == 1.0, "qty~price is exactly linear")
    assert(got((0, 2)) == -1.0, "qty~discount is exactly anti-linear")
    assert(got((0, 3)) > 0.9 && got((0, 3)) < 1.0,
      "qty~qty² is monotone but not linear")
  }

  test("connectedComponents: planted bursts split on the 7-day gap") {
    // cust 1: 10-11 linked (gap 4), 12 starts a new burst (gap 15),
    //         12-13 linked (gap 4)
    // cust 2: singleton
    // cust 3: same-day pair 30,31 then 32 at gap 6 — a 3-chain that
    //         needs two propagation rounds to settle on label 30
    val d = plantOrders(Seq(
      (10L, 1L, "2024-01-01", 10.0, "1-URGENT"),
      (11L, 1L, "2024-01-05", 10.0, "1-URGENT"),
      (12L, 1L, "2024-01-20", 10.0, "1-URGENT"),
      (13L, 1L, "2024-01-24", 10.0, "1-URGENT"),
      (20L, 2L, "2024-03-01", 10.0, "1-URGENT"),
      (31L, 3L, "2024-02-01", 10.0, "1-URGENT"),
      (30L, 3L, "2024-02-01", 10.0, "1-URGENT"),
      (32L, 3L, "2024-02-07", 10.0, "1-URGENT")))
    val got = Graph.connectedComponents(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 12L, 13L -> 12L,
      20L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L), s"got $got")
  }

  test("dormancyIslands: 180-day rule splits runs; first island has no gap") {
    val d = plantOrders(Seq(
      (1L, 1L, "2024-01-01", 10.0, "1-URGENT"),
      (2L, 1L, "2024-01-11", 10.0, "1-URGENT"),  // +10d, same island
      (3L, 1L, "2024-10-27", 10.0, "1-URGENT"),  // +290d, new island
      (4L, 1L, "2024-11-06", 10.0, "1-URGENT"),  // +10d, same island
      (5L, 2L, "2024-05-01", 10.0, "1-URGENT"))) // singleton
    val day0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val rows = graft.ext.Events.dormancyIslands(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(rows.toSeq == Seq(
      (1L, 1L, day0, day0 + 10, 2L, -1L),
      (1L, 2L, day0 + 300, day0 + 310, 2L, 290L),
      (2L, 1L, java.time.LocalDate.of(2024, 5, 1).toEpochDay,
        java.time.LocalDate.of(2024, 5, 1).toEpochDay, 1L, -1L)),
      s"got ${rows.toSeq}")
  }

  test("multiTouchAttribution: pennies conserve, remainder to earliest clicks") {
    val d = plantEvents(Seq(
      // u1: 100c at +7200; window [3600, 7200] spans two hour cells.
      // 3 clicks -> 33c each, remainder 1 to the EARLIEST (+6600)
      (1L, day0 + 7200, 1L, "purchase", Some(1.00)),
      (2L, day0 + 6600, 1L, "click", None),
      (3L, day0 + 6800, 1L, "click", None),
      (4L, day0 + 7000, 1L, "click", None),
      // u2: 50c at +10000; boundary clicks at exactly p_ts-3600 and
      // p_ts are IN; 6399 and 10001 are OUT
      (5L, day0 + 10000, 2L, "purchase", Some(0.50)),
      (6L, day0 + 6400, 2L, "click", None),
      (7L, day0 + 10000, 2L, "click", None),
      (8L, day0 + 6399, 2L, "click", None),
      (9L, day0 + 10001, 2L, "click", None),
      // u3: a click with no purchase and a purchase with no click
      (10L, day0 + 6900, 3L, "click", None),
      (11L, day0 + 50000, 3L, "purchase", Some(9.99)),
      // u4 next day: 3c over 4 clicks -> 1,1,1,0 (k > cents; the
      // 0.03*100 product rounds to exactly 3.0 in IEEE doubles)
      (12L, day0 + 86400 + 1800, 4L, "purchase", Some(0.03)),
      (13L, day0 + 86400, 4L, "click", None),
      (14L, day0 + 86400 + 600, 4L, "click", None),
      (15L, day0 + 86400 + 1200, 4L, "click", None),
      (16L, day0 + 86400 + 1500, 4L, "click", None)))
    val got = Behavior.multiTouchAttribution(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val day = (day0 + 0) / 86400
    assert(got.toSeq == Seq((day, 5L, 150L), (day + 1, 4L, 3L)), s"got ${got.toSeq}")
    // conservation: credited == full cents of every attributed purchase
    assert(got.map(_._3).sum == 100L + 50L + 3L)
  }

  test("intervalOverlap: cell-boundary split sums once, zero-overlap drops") {
    // view = [ts, ts+1200s), purchase = [ts, ts+600s); day0 is on an
    // hour boundary so cell arithmetic is easy to hand-check.
    val d = plantEvents(Seq(
      // u1: two purchases inside one view, same hour cell
      (1L, day0, 1L, "view", None),            // [0, 1200)
      (2L, day0 + 600, 1L, "purchase", None),  // [600, 1200)  ov 600s
      (3L, day0 + 100, 1L, "purchase", None),  // [100, 700)   ov 600s
      // u2: overlap [3550, 4150) crosses the hour boundary at 3600 —
      // 50s in cell 0 + 550s in cell 1, pair must count ONCE
      (4L, day0 + 3000, 2L, "view", None),     // [3000, 4200)
      (5L, day0 + 3550, 2L, "purchase", None), // [3550, 4150)
      // u3: same hour cell but no overlap — must drop entirely
      (6L, day0, 3L, "view", None),            // [0, 1200)
      (7L, day0 + 2000, 3L, "purchase", None)))// [2000, 2600)
    val got = graft.ext.Events.intervalOverlap(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((2L, 1200000000L)),
      2L -> ((1L, 600000000L))), s"got $got")
  }

  test("burstiness: metronome gaps give CV2=0, spread gaps the exact ratio") {
    // user 1: events every 10s (metronome) -> CV2 exactly 0
    // user 2: gaps 1s and 99s -> CV2 = 2*9802/10000 - 1 = 0.9604
    // user 3: only two events -> below minEvents, absent
    val dir2 = plantEvents(Seq(
      (1L, 0L, 1L, "view", None), (2L, 10L, 1L, "view", None),
      (3L, 20L, 1L, "view", None), (4L, 30L, 1L, "view", None),
      (5L, 0L, 2L, "view", None), (6L, 1L, 2L, "view", None),
      (7L, 100L, 2L, "view", None),
      (8L, 0L, 3L, "view", None), (9L, 5L, 3L, "view", None)))
    val got = Behavior.burstiness(spark, dir2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L), s"got ${got.keySet}")
    assert(got(1L) == ((3L, 30000000L, 0L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 100000000L, 960400L)), s"got ${got(2L)}")
  }

  test("logPerplexity: hand-computed add-1 surprisal sums") {
    val dir = Files.createTempDirectory("graft-ppl").toString
    Seq((1L, "a a b"), (2L, "a"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    // counts: a=3, b=1; N=4, V=2, N+V=6. LQ(x)=floor(ln(x)*1e6):
    // s(a)=LQ(6)-LQ(4)=1791759-1386294=405465
    // s(b)=LQ(6)-LQ(2)=1791759-693147=1098612
    val got = TextStats.logPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 2 * 405465L + 1098612L,
      (2 * 405465L + 1098612L) / 3)), s"got ${got(1L)}")
    assert(got(2L) == ((1L, 405465L, 405465L)))
  }

  test("equiDepthHistogram: arithmetic buckets match NTILE sizes and bounds") {
    val dir = Files.createTempDirectory("graft-edh").toString
    // 7 orders, cents 100..700 (via price 1.00..7.00), B=3:
    // NTILE sizes 3,2,2 -> buckets {100,200,300},{400,500},{600,700}
    (1L to 7L).map(i => (i, i.toDouble))
      .toDF("o_orderkey", "o_totalprice").coalesce(1)
      .write.parquet(s"$dir/orders.parquet")
    val got = Extended.equiDepthHistogram(spark, dir, buckets = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 100L, 300L, 600L),
      (2L, 2L, 400L, 500L, 900L),
      (3L, 2L, 600L, 700L, 1300L)), s"got ${got.toSeq}")
  }

  test("assocRules: hand-computed support/confidence/lift on planted baskets") {
    val dir = Files.createTempDirectory("graft-assoc").toString
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
        (3L, 1L), (3L, 2L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Behavior.assocRules(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // only {1,2} reaches support 3; N=4 baskets, c1=c2=3:
    // conf = 3/3 = 1, lift = 3·4/(3·3) = 4/3 (both directions)
    assert(got.keySet == Set((1L, 2L), (2L, 1L)), s"got ${got.keySet}")
    assert(got((1L, 2L)) == ((3L, 3L, 3L, 1000000L, 1333333L)))
    assert(got((2L, 1L)) == ((3L, 3L, 3L, 1000000L, 1333333L)))
  }

  test("labelPropagation: two triangles bridged by one edge resolve " +
       "to two communities") {
    val dir = Files.createTempDirectory("graft-lpa").toString
    // baskets -> co-purchase edges: triangle {1,2,3}, triangle
    // {4,5,6}, bridge 3-4. Hand-run sync LPA (most-frequent neighbor
    // label, ties to min) 4 rounds: {1,2,3}->1, {4,5,6}->3
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 6L),
        (3L, 3L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Graph.labelPropagation(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $got")
  }

  test("modularity: two disjoint triangles score exactly 1/2; " +
    "one clique scores exactly 0") {
    // disjoint triangles {1,2,3}, {4,5,6}: S=12 symmetric rows, all
    // internal (in=12), deg_c=6 each so Σd²=72:
    // Q = (12·12−72)/144 = 1/2 exactly
    val dir = Files.createTempDirectory("graft-mod").toString
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 6L))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Graph.modularity(spark, dir).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      (2L, 12L, 500000L), s"got $got")
    // a single triangle is one community: in = S, Σd² = S² ⇒ Q = 0
    val dir2 = Files.createTempDirectory("graft-mod2").toString
    Seq((1L, 1L), (1L, 2L), (1L, 3L))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir2/lineitem.parquet")
    val one = Graph.modularity(spark, dir2).collect().head
    assert((one.getLong(0), one.getLong(2)) == (1L, 0L), s"got $one")
  }

  test("ssspWeighted: strong 2-hop detour beats a weak direct edge; " +
       "4-hop node is absent") {
    val dir = Files.createTempDirectory("graft-sssp").toString
    // co-purchase counts -> weights w = 1 + 10^6 div cnt:
    //   (1,100) cnt 3 -> 333334      (100,200) cnt 3 -> 333334
    //   (1,200) cnt 1 -> 1000001     (200,300) cnt 1 -> 1000001
    //   (300,400) cnt 1 -> 1000001   (400,500) cnt 1 -> 1000001
    // seed = part 1 (only node <= 50). dist(200): detour 666668
    // beats direct 1000001; dist(300) = 1666669 at 3 hops; 400 rides
    // the DIRECT 1-200 edge (3 edges, 3000003); 500 needs 4 -> absent.
    val baskets =
      Seq((1L, 1L), (1L, 100L), (2L, 1L), (2L, 100L), (3L, 1L), (3L, 100L),
          (4L, 100L), (4L, 200L), (5L, 100L), (5L, 200L), (6L, 100L), (6L, 200L),
          (7L, 1L), (7L, 200L), (8L, 200L), (8L, 300L), (9L, 300L), (9L, 400L),
          (10L, 400L), (10L, 500L))
    baskets.toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Graph.ssspWeighted(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 100L -> 333334L, 200L -> 666668L,
                      300L -> 1666669L, 400L -> 3000003L), s"got $got")
  }

  test("hits: scores match a sequential BigInt reference on a planted graph") {
    val dir = Files.createTempDirectory("graft-hits").toString
    // c1 -> {s1, s2}, c2 -> {s1}: s1 should out-rank s2 (two hubs),
    // c1 should out-rank c2 (buys both authorities)
    Seq((1L, 1L), (2L, 2L))
      .toDF("o_orderkey", "o_custkey").coalesce(1)
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 1L))
      .toDF("l_orderkey", "l_suppkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    // sequential reference: same integer mean-10^6 renormalization
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L)) // (cust, supp)
    val cs = edges.map(_._1).distinct
    val ss = edges.map(_._2).distinct
    var hub = cs.map(_ -> BigInt(1000000)).toMap
    var auth = Map.empty[Long, BigInt]
    for (_ <- 1 to 2) {
      val ar = ss.map(s =>
        s -> edges.filter(_._2 == s).map(e => hub(e._1)).sum).toMap
      val at = ar.values.sum
      auth = ar.map { case (s, r) => s -> r * 1000000 * ss.size / at }
      val hr = cs.map(c =>
        c -> edges.filter(_._1 == c).map(e => auth(e._2)).sum).toMap
      val ht = hr.values.sum
      hub = hr.map { case (c, r) => c -> r * 1000000 * cs.size / ht }
    }
    val got = Graph.hits(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = hub.map { case (c, v) => ("cust", c) -> v.toLong } ++
      auth.map { case (s, v) => ("supp", s) -> v.toLong }
    assert(got == want, s"got $got want $want")
    assert(got(("supp", 1L)) > got(("supp", 2L)),
      "two-hub authority must out-rank the single-hub one")
    assert(got(("cust", 1L)) > got(("cust", 2L)),
      "the hub buying both authorities must rank higher")
  }

  test("clusteringCoeff: triangle corners close fully, hub dilutes, tail is 0") {
    val dir = Files.createTempDirectory("graft-cc").toString
    // edges 1-2, 2-3, 1-3 (triangle) + 3-4 (tail): nodes 1,2 have
    // deg 2 and one triangle (cc=1); node 3 has deg 3, one triangle
    // out of C(3,2)=3 wedges (cc=1/3); node 4 deg 1 -> 0 by contract
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 1L), (3L, 3L),
        (4L, 3L), (4L, 4L))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Graph.clusteringCoeff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 1L, 1000000L), (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L), (4L, 1L, 0L, 0L)), s"got ${got.toSeq}")
  }

  test("kCore: tail part peels off, triangle survives at k=2; k=3 empties") {
    val dir = Files.createTempDirectory("graft-kcore").toString
    // baskets build co-purchase edges 1-2, 2-3, 1-3 (triangle) and
    // 3-4 (tail): peeling at k=2 drops 4, then the triangle is stable
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 1L), (3L, 3L),
        (4L, 3L), (4L, 4L))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Graph.kCore(spark, dir, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $got")
    assert(Graph.kCore(spark, dir, k = 3).collect().isEmpty,
      "no subgraph of min degree 3 exists")
  }

  test("adamicAdarSeeded: path graph — the 2-hop pair scores " +
    "1/ln(deg center), adjacent pairs never appear") {
    val dir = Files.createTempDirectory("graft-aa").toString
    // baskets {1,2} and {2,3}: path 1—2—3; the only predicted link
    // is (1,3) through center 2 (deg 2), seen from both endpoints
    Seq((10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val wt2 = 1000000000000L / 693147L // 1/ln(2) in q6
    val got = Graph.adamicAdarSeeded(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, wt2, 1L), (3L, 1L, wt2, 1L)),
      s"got ${got.toSeq}")
  }

  test("adamicAdarSeeded: triangle + tail — existing edges excluded, " +
    "hub centers discounted by their full degree") {
    val dir = Files.createTempDirectory("graft-aa2").toString
    // basket 10 closes triangle {1,2,3}; basket 11 hangs 3—4. Every
    // triangle pair is adjacent (excluded); the only predictions run
    // through center 3 (deg 3): (1,4), (2,4) and their mirrors
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 3L), (11L, 4L))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val wt3 = 1000000000000L / 1098612L // 1/ln(3) in q6
    val got = Graph.adamicAdarSeeded(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 4L, wt3, 1L), (2L, 4L, wt3, 1L),
      (4L, 1L, wt3, 1L), (4L, 2L, wt3, 1L)), s"got ${got.toSeq}")
  }

  test("codeSwitch: thirds vote independently — planted trilingual " +
    "doc splits 3 ways, monolingual doc stays 1") {
    val dir = plantDocs(Seq(
      (1L, "the a is der die und el la y"), // en | de | es thirds
      (2L, "the a is the a is"),            // en everywhere
      (3L, "x y")))                          // < 3 tokens: absent
    val got = graft.ext.TextStats.codeSwitch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, "en", "de", "es", 3L),
      (2L, "en", "en", "en", 1L)), s"got ${got.toSeq}")
  }

  test("minhashCalibration: identical pair lands the m=16 bucket at " +
    "exact Jaccard 1, disjoint pairs bucket at 0") {
    // A == B (jaccard 1, all 16 components agree); C shares no
    // shingle with either but sits in the same (lang, n_toks) block
    val dir = plantDocs(Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t")))
    val rows = graft.ext.Dedup.minhashCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 2, s"two buckets expected: ${rows.toSeq}")
    val perfect = rows.find(_._1 == 16L).get
    assert(perfect == ((16L, 1L, 1000000L, 1000000L)), s"got $perfect")
    val disjoint = rows.find(_._1 != 16L).get
    assert(disjoint._1 < 16L && disjoint._2 == 2L && disjoint._3 == 0L,
      s"disjoint pairs must bucket below 16 at mean 0: $disjoint")
  }

  test("editDistanceVerify: identical LSH pair scores lev 0 at " +
    "similarity exactly 1e6; every row bounded") {
    val dir = plantDocs(Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six seven")))
    val rows = graft.ext.Dedup.editDistanceVerify(spark, dir).collect()
    val ident = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(ident.isDefined, s"identical pair must survive: ${rows.toSeq}")
    assert(ident.get.getLong(4) == 0L && ident.get.getLong(5) == 1000000L,
      s"lev 0, sim 1e6: ${ident.get}")
    rows.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(5) <= 1000000L, s"bounds: $r")
    }
  }

  test("seasonalDecomposition: constant daily series — zero residuals, " +
    "every weekday index exactly 1e6") {
    // 14 consecutive days, one 100.00 event each ⇒ after the 7-day
    // trim, 8 interior days with v = trend = 10000 cents
    val d = plantEvents((0 until 14).map(i =>
      (i.toLong, day0 + i * 86400L, 1L, "view", Some(100.0))))
    val rows = graft.ext.Behavior.seasonalDecomposition(spark, d).collect()
    assert(rows.length == 8, s"8 interior days, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) == 10000L && r.getLong(2) == 10000L,
        s"v and trend 10000: $r")
      assert(r.getLong(4) == 1000000L, s"flat index: $r")
      assert(r.getLong(5) == 0L, s"zero residual: $r")
    }
  }

  test("hllIntersection: planted half-overlapping user sets — exact " +
    "overlap alongside, estimate within sketch error") {
    // click users 1..100, purchase users 51..150: |A∩B| = 50
    val d = plantEvents(
      (1 to 100).map(u => (u.toLong, day0 + u, u.toLong, "click", None)) ++
      (51 to 150).map(u =>
        (1000L + u, day0 + u, u.toLong, "purchase", None)))
    val r = graft.ext.Stats.hllIntersection(spark, d).collect().head
    assert(r.getLong(4) == 50L, s"exact overlap 50: $r")
    val est = r.getDouble(3)
    // 64-register HLL: σ ≈ 13% per sketch; inclusion-exclusion
    // compounds three, so accept a generous band around 50
    assert(est > 10.0 && est < 110.0, s"estimate near 50: $r")
  }

  test("sourceScorecard: per-source volume, stopword share, langID " +
    "disagreement, and verified-dup share on a planted split") {
    val dir = Files.createTempDirectory("graft-scorecard").toString
    // s1: two IDENTICAL English docs (LSH-verified dups, stopwords
    // 6/6, vote agrees with the tag). s2: one German doc mistagged
    // "en" (vote 'de' ≠ tag, 0 stopwords, no dup partner).
    Seq((1L, "the a is the a is", "en", "s1"),
        (2L, "the a is the a is", "en", "s1"),
        (3L, "der die und der die und", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .select($"doc_id", $"text", $"lang", $"source",
        length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.ext.Corpus.sourceScorecard(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // s1: 17 chars/doc → 1700 q2; stopwords 12/12 → 1e6; 0 mismatch;
    // both docs dup → 1e6. s2: 23 chars → 2300 q2; 0 stopwords;
    // 1/1 mismatch → 1e6; no dups → 0
    assert(got.toSeq == Seq(
      ("s1", 2L, 1700L, 1000000L, 0L, 1000000L),
      ("s2", 1L, 2300L, 0L, 1000000L, 0L)), s"got ${got.toSeq}")
  }

  test("ratioMetricCI: hand-computed delta-method interval on a " +
    "two-user plant") {
    // u1: 2 events, one purchase of 1.00; u2: 2 events, no purchase.
    // (x,m) = (100,2),(0,2): R = 100/4 = 25, varx = 5000, covxm = 0,
    // varm = 0, se = sqrt(5000/2)/2 = 25, 1.96*25 -> exactly 49.0
    val d = plantEvents(Seq(
      (1L, day0 + 10, 1L, "purchase", Some(1.0)),
      (2L, day0 + 20, 1L, "view", None),
      (3L, day0 + 10, 2L, "view", None),
      (4L, day0 + 20, 2L, "click", None)))
    val r = graft.ext.Stats.ratioMetricCI(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 100L, 4L)),
      s"sums: $r")
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((25000000L, 25000000L, -24000000L, 74000000L)), s"ci: $r")
  }

  test("theilSenTrend: median pairwise slope on three planted days; " +
    "a falling series keeps its sign through the shifted division") {
    // daily cents 100, 300, 400 on consecutive days: slopes 200e6,
    // 150e6 (2-day span), 100e6 -> median 150e6
    val up = plantEvents(Seq(
      (1L, day0 + 10, 1L, "view", Some(1.0)),
      (2L, day0 + 86400 + 10, 1L, "view", Some(3.0)),
      (3L, day0 + 2 * 86400 + 10, 1L, "view", Some(4.0))))
    val r = graft.ext.Stats.theilSenTrend(spark, up).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 3L, 2L, 150000000L)), s"up: $r")
    // 400 -> 100: single pair, slope exactly -300e6
    val down = plantEvents(Seq(
      (1L, day0 + 10, 1L, "view", Some(4.0)),
      (2L, day0 + 86400 + 10, 1L, "view", Some(1.0))))
    val f = graft.ext.Stats.theilSenTrend(spark, down).collect().head
    assert((f.getLong(1), f.getLong(3)) == ((1L, -300000000L)), s"down: $f")
  }

  test("shingleNovelty: shared 3-gram counted, unique doc scores 0, " +
    "sub-3-token docs absent") {
    // docs 1 and 2 share exactly the shingle "x y z" (1 of 3 each);
    // doc 3 is fully novel; doc 4 has no shingles at all
    val dir = plantDocs(Seq(
      (1L, "x y z p q"), (2L, "x y z r s"),
      (3L, "a b c d e"), (4L, "one two")))
    val got = graft.ext.Dedup.shingleNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 333333L), (2L, 3L, 1L, 333333L),
      (3L, 3L, 0L, 0L)), s"got ${got.toSeq}")
  }

  test("compressionQuality: repetitive text compresses far below " +
    "diverse text; the kernel is deterministic") {
    val rep = ("spam ham " * 200).trim                  // pure repetition
    val div = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val d = plantDocs(Seq((1L, rep), (2L, div)))
    val got = TextStats.compressionQuality(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(1L) < 0.1, s"repetition must compress hard, got ${got(1L)}")
    assert(got(2L) > got(1L) * 3,
      s"diverse text must compress far less: $got")
    // determinism: same bytes, same Deflater output size
    val again = TextStats.compressionQuality(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val first = TextStats.compressionQuality(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == first, "DeflateSize must be a pure function")
  }

  test("kaplanMeierOf: censoring removes subjects from risk WITHOUT " +
    "counting them as deaths — hand-computed product limit") {
    import spark.implicits._
    // cohort: day 0 — 2 deaths of 10 at risk; day 1 — 1 censored
    // (leaves risk, no factor); day 2 — 2 deaths of 7 at risk;
    // day 3 — 5 censored
    val lt = (Seq.fill(2)((0L, false)) ++ Seq((1L, true)) ++
      Seq.fill(2)((2L, false)) ++ Seq.fill(5)((3L, true)))
      .toDF("k", "censored")
    val got = graft.ext.Events.kaplanMeierOf(lt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4)))
    def lnq9(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den) * 1e9).toLong
    val s0 = lnq9(8, 10)               // (10-2)/10
    val s2 = s0 + lnq9(5, 7)           // then (7-2)/7
    assert(got.toSeq == Seq(
      (0L, 10L, 2L, 0L, s0),
      (1L, 8L, 0L, 1L, s0),            // censoring: no factor change
      (2L, 7L, 2L, 0L, s2),
      (3L, 5L, 0L, 5L, s2)), s"got ${got.toSeq}")
    // a censoring-blind version (all 10 as deaths) would differ:
    // the KM at day 3 keeps exp(s2) = 8/10 * 5/7 ≈ 0.571 survival,
    // not the 0 an all-death count implies
    assert(s2 > math.floor(math.log(1e-6) * 1e9).toLong)
  }

  test("nelsonAalenOf: integer-rational hazard and Greenwood terms on " +
    "the same hand-computed cohort; all-die step NULLs Greenwood but " +
    "not the hazard") {
    import spark.implicits._
    val lt = (Seq.fill(2)((0L, false)) ++ Seq((1L, true)) ++
      Seq.fill(2)((2L, false)) ++ Seq.fill(5)((3L, true)))
      .toDF("k", "censored")
    val got = graft.ext.Events.nelsonAalenOf(lt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        if (r.isNullAt(5)) Long.MinValue else r.getLong(5)))
    val na0 = 2L * 1000000000L / 10L          // 2/10
    val na2 = na0 + 2L * 1000000000L / 7L     // + 2/7
    val gw0 = 2L * 1000000000000L / (10L * 8L)
    val gw2 = gw0 + 2L * 1000000000000L / (7L * 5L)
    assert(got.toSeq == Seq(
      (0L, 10L, na0, gw0), (1L, 8L, na0, gw0),
      (2L, 7L, na2, gw2), (3L, 5L, na2, gw2)), s"got ${got.toSeq}")
    // all-die final step: hazard gains d/n = 1 and stays served,
    // Greenwood goes NULL from that step (S = 0, variance undefined)
    val lt2 = (Seq.fill(3)((0L, false)) ++ Seq.fill(2)((1L, false)))
      .toDF("k", "censored")
    val got2 = graft.ext.Events.nelsonAalenOf(lt2).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.isNullAt(5)))
    val h0 = 3L * 1000000000L / 5L
    assert(got2.toSeq == Seq(
      (0L, h0, false), (1L, h0 + 1000000000L, true)), s"got ${got2.toSeq}")
  }

  test("pointerJumpCycles: planted rho-shapes — tails join their " +
    "cycle's basin, cycle ids are cycle minima, lengths exact") {
    import spark.implicits._
    // 0→1→2→3→4→2 (tail 0,1 into 3-cycle {2,3,4}); 5→5 self-loop
    // with feeder 6→5
    val f = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L),
      (5L, 5L), (6L, 5L)).toDF("v", "succ")
    val got = graft.ext.Graph.pointerJumpCycles(f, rounds = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 3L, 5L), (5L, 1L, 2L)), s"got $got")
    // list ranking on the same ρ: cycle nodes at dist 0 (2,3,4,5);
    // feeders 1 and 6 at dist 1; node 0 at dist 2
    val tails = graft.ext.Graph.tailDistances(f, rounds = 3)
      .as[(Long, Long)].collect().toSeq
    assert(tails == Seq((0L, 4L), (1L, 2L), (2L, 1L)), s"tails $tails")
  }

  test("ccStarContraction: identical labels to HashMin on a planted " +
    "200-hop path, in O(log n) alternations instead of 200 rounds") {
    import org.apache.spark.sql.functions.col
    // a single path 0-1-2-…-200 (diameter 200) plus an isolated node
    // 999 and a small separate triangle 300-301-302
    val edges = ((0L until 200L).map(i => (i, i + 1)) ++
      Seq((300L, 301L), (301L, 302L), (302L, 300L)))
      .toDF("src", "dst")
    val nodes = ((0L to 200L) ++ Seq(300L, 301L, 302L, 999L))
      .toDF("node")
    val (labels, rounds) =
      Graph.ccStarContraction(edges, nodes, maxRounds = 25)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ((0L to 200L).map(_ -> 0L) ++
      Seq(300L, 301L, 302L).map(_ -> 300L) ++ Seq(999L -> 999L)).toMap
    assert(got == want, s"labels must equal ground truth, got $got")
    assert(rounds <= 12,
      s"star contraction must label a 200-hop path in O(log n) " +
        s"alternations (HashMin needs 200 propagation rounds), " +
        s"took $rounds")
    // and on real data the third algorithm agrees with HashMin
    val d = "/root/testdata/sf0.001"
    val hashMin = Graph.connectedComponents(spark, d)
      .collect().map(_.toSeq).toSeq
    val star = Graph.ccTwoPhase(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(star == hashMin,
      "two-phase star contraction must agree with HashMin on the " +
        "purchase-burst graph")
  }

  test("hashMinLabels: pointer-jumping shortcut keeps the HashMin " +
    "fixpoint and cuts rounds to O(log diameter)") {
    import org.apache.spark.sql.functions.{array, col, explode, struct}
    // a 64-hop path (diameter 64), a triangle, an isolated node
    val edges = ((0L until 64L).map(i => (i, i + 1)) ++
      Seq((300L, 301L), (301L, 302L), (302L, 300L)))
      .toDF("src", "dst")
    val sym = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
    val nodes = ((0L to 64L) ++ Seq(300L, 301L, 302L, 999L))
      .toDF("node")
    val (plain, plainRounds) =
      Graph.hashMinLabels(sym, nodes, maxIters = 100, shortcut = false)
    val (jumped, jumpedRounds) =
      Graph.hashMinLabels(sym, nodes, maxIters = 100, shortcut = true)
    val got = jumped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = plain.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "shortcut must not change the converged labels")
    assert(want == (((0L to 64L).map(_ -> 0L) ++
        Seq(300L, 301L, 302L).map(_ -> 300L) ++ Seq(999L -> 999L)).toMap),
      "fixpoint must be the per-component minima")
    assert(plainRounds > 30,
      s"plain HashMin needs diameter-many rounds, took $plainRounds")
    assert(jumpedRounds <= 10,
      s"pointer jumping must label a 64-hop path in O(log d) rounds, " +
        s"took $jumpedRounds")
  }

  test("negativeSampling: bucket prefilter + fallback = direct draw") {
    // Planted catalog of 40 items, 12 users; each user purchases a
    // different-sized positive slice so the forced low-bucket draw
    // leaves some users short (< k survivors -> exact fallback) and
    // fills others (== k survivors provably global-smallest).
    val dir = Files.createTempDirectory("graft-negsamp").toString
    val rows = for {
      u <- 1L to 12L
      i <- 0 until 40
      // user u purchased items i < u (so user 12 has 12 positives);
      // every (u, item) pair also appears as a view so the catalog
      // domain is complete
      et <- Seq("view") ++ (if (i < u) Seq("purchase") else Nil)
    } yield (u * 100 + i, (day0 + i) * 1000000000L, u, et,
      Option.empty[Double], s"""{"k": $i}""")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val direct = Behavior.negativeSampling(spark, dir, k = 3,
      minCatalogForPrefilter = Long.MaxValue)   // prefilter off
      .collect().map(_.toSeq).toSeq
    // oversample = 1 => cap = P*k/40: expected 3 survivors per user,
    // so shorts are guaranteed among the heavy purchasers
    val bucketed = Behavior.negativeSampling(spark, dir, k = 3,
      oversample = 1, minCatalogForPrefilter = 0L)
      .collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && direct.size == 12 * 3)
    assert(bucketed == direct,
      "forced low-bucket draw with fallback must equal the direct draw")
    // and on real testdata: prefilter path == default path
    val d = "/root/testdata/sf0.001"
    val dflt = Behavior.negativeSampling(spark, d)
      .collect().map(_.toSeq).toSeq
    val forced = Behavior.negativeSampling(spark, d,
      oversample = 2, minCatalogForPrefilter = 0L)
      .collect().map(_.toSeq).toSeq
    assert(forced == dflt)
  }
}
