package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

/** k-truss peel: planted shapes with known trusses, plus a brute-force
  * recount-to-fixpoint reference on pseudo-random graphs — the
  * incremental support-decrement algebra must match the textbook
  * definition exactly.
  */
class KTrussSpec extends SparkSpec {
  import spark.implicits._

  /** Default gate = the driver peel (what production sizes hit);
    * `maxDriverPeel = 0` forces the distributed delta-peel. */
  private def trussOf(edges: Seq[(Long, Long)], k: Long,
      maxDriverPeel: Long = Graph.DriverPeelMaxEdges,
      maxIters: Int = 30): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    Graph.kTrussOf(df, k, maxIters = maxIters,
        maxDriverPeel = maxDriverPeel).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Textbook reference: recount support over the survivors until
    * nothing peels. */
  private def brute(edges: Set[(Long, Long)], k: Long)
      : Map[Long, Long] = {
    val minSup = k - 2
    var e = edges
    var changed = true
    while (changed) {
      val adj = e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupMap(_._1)(_._2).map { case (n, vs) => n -> vs.toSet }
      val keep = e.filter { case (a, b) =>
        (adj(a) & adj(b)).size >= minSup
      }
      changed = keep.size != e.size
      e = keep
    }
    e.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("K4 plus a pendant edge: the 4-truss is exactly the K4") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val got = trussOf(k4 :+ (4L, 5L), 4L)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"got $got")
  }

  test("two triangles sharing an edge cascade to an empty 4-truss " +
    "(the shared edge loses both triangles one peel later)") {
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(trussOf(bowtie, 4L).isEmpty)
    // but the 3-truss (every edge in >= 1 triangle) keeps all of it
    val t3 = trussOf(bowtie, 3L)
    assert(t3 == Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 2L), s"got $t3")
  }

  test("pseudo-random graphs: incremental decrement peel == recount " +
    "reference, k = 3, 4, 5") {
    // deterministic LCG edge sampler — dense enough for multi-round
    // cascades, sparse enough that trusses are nontrivial
    for (seed <- Seq(7L, 23L, 99L)) {
      var s = seed
      def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); (s >>> 33) }
      val n = 24L
      val edges = (0 until 140).map { _ =>
        val a = next() % n; val b = next() % n
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      for (k <- Seq(3L, 4L, 5L)) {
        val got = trussOf(edges, k)
        val want = brute(edges.toSet, k)
        assert(got == want, s"seed=$seed k=$k got=$got want=$want")
        // the distributed delta-peel (above-gate path) must agree
        // with the driver peel and the brute recount exactly
        val dist = trussOf(edges, k, maxDriverPeel = 0L)
        assert(dist == want, s"seed=$seed k=$k dist=$dist want=$want")
      }
    }
  }

  test("deep cascade: a planted 8-wave peel (vs 7 on the real sf0.1 " +
    "graph) completes exactly on BOTH peel paths — rounds are the " +
    "cascade depth, and neither path caps or mis-orders them") {
    // truss cascades resist hand construction (reinforcing a chain
    // inflates exactly the supports that must sit at the bar), so the
    // plant is a searched pseudo-random instance: LCG seed 214 at
    // k = 5 cascades through 16 waves to a NON-EMPTY 5-truss —
    // deeper than the real sf0.1 graph's 7
    val edges = {
      var s = 214L
      def next(): Long = {
        s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 33)
      }
      val n = 20L
      (0 until 120).map { _ =>
        val a = next() % n; val b = next() % n
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
    }
    // independently measure the brute cascade depth
    val minSup = 3L
    var e = edges.toSet
    var waveCount = 0
    var changed = true
    while (changed) {
      val adj = e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupMap(_._1)(_._2).map { case (x, vs) => x -> vs.toSet }
      val keep = e.filter { case (a, b) => (adj(a) & adj(b)).size >= minSup }
      changed = keep.size != e.size
      if (changed) waveCount += 1
      e = keep
    }
    assert(waveCount >= 12, s"the plant must cascade deeply, got $waveCount")
    val want = brute(edges.toSet, 5L)
    assert(want.nonEmpty, "the plant's 5-truss must be non-empty")
    assert(trussOf(edges, 5L, maxIters = 200) == want, "driver peel")
    assert(trussOf(edges, 5L, maxDriverPeel = 0L, maxIters = 200) == want,
      "distributed delta peel")
  }

  test("k < 3 is refused (the support table cannot represent the " +
    "triangle-free truss)") {
    intercept[IllegalArgumentException](trussOf(Seq((1L, 2L)), 2L))
  }
}
