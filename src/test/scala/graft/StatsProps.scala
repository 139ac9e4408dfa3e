package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ext.{Graph, Stats}

/** Property tests for the round-5 distributed reformulations against
  * trivial sequential references: the skyline window trick vs the
  * brute-force dominance definition, interval merging vs day-set
  * union, integer PageRank vs an in-memory loop, and the KMV
  * estimator vs its closed formula on the sorted distinct hash set.
  */
object StatsProps extends Properties("stats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stats-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genPts: Gen[List[(Long, Long, Int)]] =
    Gen.listOf(for {
      cust <- Gen.choose(1L, 3L)
      price <- Gen.choose(1L, 20L)
      day <- Gen.choose(1, 20)
    } yield (cust, price, day)).map(_.take(40))

  property("skyline window form == brute-force dominance") =
    Prop.forAll(genPts) { pts0 =>
      import spark.implicits._
      val pts = pts0.distinct
      val got = Stats.skylineOf(pts.toDF("o_custkey", "price_c", "day"))
        .as[(Long, Long, Int)].collect().toSet
      val want = pts.filter { case (c, p, t) =>
        !pts.exists { case (c2, p2, t2) =>
          c2 == c && p2 <= p && t2 <= t && (p2 < p || t2 < t)
        }
      }.toSet
      got == want
    }

  private val genIvs: Gen[List[(Long, Int, Int)]] =
    Gen.listOf(for {
      cust <- Gen.choose(1L, 3L)
      s <- Gen.choose(0, 50)
      len <- Gen.choose(1, 15)
    } yield (cust, s, s + len)).map(_.take(30)).suchThat(_.nonEmpty)

  property("interval coverage == brute-force day-set union") =
    Prop.forAll(genIvs) { ivs =>
      import spark.implicits._
      val got = Stats.coverageOf(ivs.toDF("o_custkey", "s", "e"))
        .as[(Long, Int, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = ivs.groupBy(_._1).map { case (c, xs) =>
        val days = xs.flatMap { case (_, s, e) => s until e }.toSet
        // islands = maximal runs of consecutive covered days
        val nIslands = days.toSeq.sorted
          .foldLeft((0, Int.MinValue)) { case ((n, prev), d) =>
            (if (d == prev + 1) n else n + 1, d)
          }._1
        c -> ((nIslands, days.size.toLong))
      }
      got == want
    }

  private val genGraph: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.choose(1L, 8L)
      b <- Gen.choose(1L, 8L) if a != b
    } yield (a, b)).map(_.take(20))

  property("integer PageRank == in-memory reference on random graphs") =
    Prop.forAll(genGraph, Gen.choose(1, 3)) { (raw, iters) =>
      import spark.implicits._
      // symmetrize so every node has out- and in-edges (no dangling)
      val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val got = Graph.pageRankOnEdges(edges.toDF("src", "dst"), iters)
        .select("node", "r").as[(Long, Long)].collect().toMap
      val S = 1000000000000L
      val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val n = out.size
      var r = out.keys.map(k => k -> S / n).toMap
      for (_ <- 1 to iters) {
        val in = edges.map { case (u, v) => v -> r(u) / out(u).size }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        r = r.keys.map(k => k -> (15L * S / (100L * n) + 85L * in(k) / 100L)).toMap
      }
      got == r
    }

  private val genKeys: Gen[(List[(Long, Long)], Int)] = for {
    keys <- Gen.nonEmptyListOf(Gen.choose(1L, 500L))
    k <- Gen.oneOf(4, 16, 64)
  } yield (keys.map(x => (1L, x)).take(120), k)

  property("KMV == closed formula on the sorted distinct hash set") =
    Prop.forAll(genKeys) { case (rows, k) =>
      import spark.implicits._
      val P = 2147483647L
      val got = Stats.kmvOf(rows.toDF("l_returnflag", "key"), k)
        .select("n_exact", "k_used", "hk", "est")
        .as[(Long, Int, Long, Long)].collect().head
      val hs = rows.map(_._2).distinct.map(x => (x % P) * 2654435761L % P).sorted
      val kUsed = math.min(k, hs.size)
      val hk = hs(kUsed - 1)
      val est = if (hs.size < k) hs.size.toLong else (k - 1).toLong * P / hk
      got == ((hs.size.toLong, kUsed, hk, est))
    }

  private val genPeelGraph: Gen[(List[(Long, Long)], Long)] = for {
    edges <- Gen.listOf(for {
      a <- Gen.choose(1L, 6L); b <- Gen.choose(1L, 6L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    k <- Gen.choose(1L, 3L)
  } yield (edges.distinct.take(15), k)

  property("kCore peel == sequential reference peel") =
    Prop.forAll(genPeelGraph) { case (edges, k) =>
      import spark.implicits._
      val base =
        if (edges.isEmpty)
          spark.emptyDataset[(Long, Long)].toDF("a", "b")
        else edges.toDF("a", "b")
      val got = Graph.kCoreOf(base, k)
        .as[(Long, Long)].collect().toMap
      // reference: literal iterative deletion on an adjacency map
      var adj = (edges.flatMap { case (a, b) => Seq(a -> b, b -> a) })
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var changed = true
      while (changed) {
        val drop = adj.collect { case (u, s) if s.size < k => u }.toSet
        changed = drop.nonEmpty
        adj = adj.collect { case (u, s) if !drop(u) => u -> (s -- drop) }
          .toMap
      }
      got == adj.view.mapValues(_.size.toLong).toMap
    }

  private val genCorpus: Gen[List[String]] =
    Gen.listOf(Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString)))
      .map(_.take(12))

  property("bpeMerges == sequential reference BPE") =
    Prop.forAll(genCorpus) { words =>
      import spark.implicits._
      val wf =
        if (words.isEmpty) spark.emptyDataset[String].toDF("w")
        else words.toDF("w")
      val got = graft.ext.Corpus.bpeMergesOf(wf, rounds = 3)
        .as[(Long, String, String, Long)].collect().toSeq
      // reference: greedy left-to-right merge on symbol lists
      def mergeGreedy(syms: List[String], l: String, r: String): List[String] = {
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toList
      }
      var vocab = words.filter(_.nonEmpty)
        .groupBy(w => w.map(_.toString).toList)
        .view.mapValues(_.size.toLong).toList
      val want = scala.collection.mutable.ListBuffer[(Long, String, String, Long)]()
      var r = 1
      var done = false
      while (r <= 3 && !done) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
          .withDefaultValue(0L)
        vocab.foreach { case (syms, wc) =>
          syms.sliding(2).foreach {
            case List(x, y) => pc((x, y)) += wc
            case _ =>
          }
        }
        if (pc.isEmpty) done = true
        else {
          val ((l, rr), cnt) = pc.minBy { case ((x, y), c) => (-c, x, y) }
          want += ((r.toLong, l, rr, cnt))
          vocab = vocab.map { case (syms, wc) => (mergeGreedy(syms, l, rr), wc) }
        }
        r += 1
      }
      got == want.toSeq
    }

  private val genTemporalGraph: Gen[List[(Long, Long, Long)]] =
    Gen.listOf(for {
      u <- Gen.choose(0L, 6L); v <- Gen.choose(0L, 6L) if u != v
      t <- Gen.choose(0L, 9L)
    } yield (u, v, t)).map(_.distinct.take(20))

  property("temporalOnEdges == sequential earliest-arrival reference") =
    Prop.forAll(genTemporalGraph) { edges =>
      import spark.implicits._
      val sym =
        if (edges.isEmpty)
          spark.emptyDataset[(Long, Long, Long)].toDF("u", "v", "t")
        else edges.toDF("u", "v", "t")
      val got = Graph.temporalOnEdges(sym, Seq(0L).toDF("node"), maxHops = 3)
        .as[(Long, Long)].collect().toMap
      // reference: synchronous earliest-arrival relaxation — round r
      // relaxes every edge whose time is >= the PREVIOUS round's
      // arrival at its source (the time-respecting gate)
      var arr = Map(0L -> 0L)
      for (_ <- 1 to 3) {
        val relaxed = edges.flatMap { case (u, v, t) =>
          arr.get(u).filter(t >= _).map(_ => v -> t)
        }
        arr = (arr.toSeq ++ relaxed).groupBy(_._1)
          .view.mapValues(_.map(_._2).min).toMap
      }
      got == arr
    }

  // ---- mid-rank AUC (q205/q211) ----

  private val genScored: Gen[List[(Long, Int)]] =
    Gen.listOfN(30, for {
      // DELIBERATELY low-cardinality scores: heavy cross-class ties,
      // where any deterministic tie order biases the rank identity
      s <- Gen.choose(1L, 4L)
      y <- Gen.choose(0, 1)
    } yield (s, y))

  /** Pairwise reference: AUC·(2PN) = 2·wins + ties, exact ints. */
  private def pairwiseAucQ6(pts: List[(Long, Int)]): Option[Long] = {
    val pos = pts.filter(_._2 == 1).map(_._1)
    val neg = pts.filter(_._2 == 0).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val wins = pos.map(p => neg.count(p > _).toLong).sum
      val ties = pos.map(p => neg.count(p == _).toLong).sum
      Some((BigInt(2 * wins + ties) * 1000000 /
        (BigInt(2) * pos.size * neg.size)).toLong)
    }
  }

  property("mid-rank AUC identity == exact pairwise AUC under ties") =
    Prop.forAll(genScored) { pts =>
      import spark.implicits._
      pairwiseAucQ6(pts) match {
        case None => Prop.passed
        case Some(want) =>
          val df = pts.zipWithIndex
            .map { case ((s, y), i) => (s, i.toLong, y.toLong) }
            .toDF("s", "k", "y")
          val got = Stats.aucOf(df).select("auc_q6")
            .collect().head.getLong(0)
          Prop(got == want) :| s"mid-rank=$got pairwise=$want"
      }
    }

  property("the UNCORRECTED deterministic-order identity provably " +
    "diverges on tied scores — the bias the mid-rank form removes") = {
    import spark.implicits._
    // one positive, one negative, SAME score: true AUC is exactly 0.5
    // (the single pair is a tie); ranking by (s, k) hands the
    // positive rank 1 → uncorrected AUC = (1 − 1)/1 = 0
    val df = Seq((10L, 1L, 1L), (10L, 2L, 0L)).toDF("s", "k", "y")
    val mid = Stats.aucOf(df).select("auc_q6").collect().head.getLong(0)
    val ranked = graft.operators.GlobalIndex
      .withRowNumber(df, Seq($"s".asc, $"k".asc), "r")
    val uncorrected = ranked
      .agg((org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when($"y" === 1L, $"r")
          .otherwise(0L)) - 1L).as("a"))
      .collect().head.getLong(0) // (Σ_{pos}rank − P(P+1)/2) / (P·N)
    Prop(mid == 500000L && uncorrected == 0L) :|
      s"mid=$mid uncorrected_numerator=$uncorrected"
  }

  // Kneser–Ney at D = 3/4: for every head w1 the UNQUANTIZED rational
  // probabilities over the FULL vocabulary sum to exactly 1 — the
  // discount mass is redistributed by continuation weight, nothing
  // invented or lost. Verified in exact BigInt arithmetic on random
  // token streams against the model tables q311 computes.
  private val genTokens: Gen[List[Int]] =
    Gen.listOfN(60, Gen.choose(0, 5)).suchThat(_.size >= 2)

  property("Kneser–Ney D=3/4 probabilities sum to 1 per head, exactly") =
    Prop.forAll(genTokens) { toks =>
      val bigrams = toks.zip(toks.tail)
      val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nh = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nt = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val t = BigInt(c12.size)
      val vocab = nt.keySet // words with at least one continuation mass
      val ok = c1.keys.forall { w1 =>
        // Σ_w2∈vocab num(w1,w2) over the shared denominator 4·c1·T
        val den = BigInt(4) * c1(w1) * t
        val num = vocab.toSeq.map { w2 =>
          val c = c12.getOrElse((w1, w2), 0L)
          BigInt(math.max(4 * c - 3, 0)) * t +
            BigInt(3) * nh(w1) * nt(w2)
        }.sum
        num == den
      }
      Prop(ok) :| s"per-head KN mass must equal 1 exactly (toks=$toks)"
    }

  private def mannWhitneyProp =
    Prop.forAll(genKw) { pts =>
      import spark.implicits._
      val rows = pts.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, if (g == 1) 1 else 2, v) }
      val df = rows.toDF("k", "g", "v")
      // reuse the exact pipeline shape: rank, tie table, group sums
      val ranked = graft.operators.GlobalIndex
        .withRowNumber(df, Seq($"v".asc, $"k".asc), "rn")
      val byVal = ranked.groupBy($"v")
        .agg(org.apache.spark.sql.functions.sum($"rn").as("rsum"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("t"))
        .withColumn("ar2",
          org.apache.spark.sql.functions.expr("2 * rsum div t"))
      val r2n = ranked.groupBy($"v", $"g")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cg"))
        .join(byVal, "v")
        .filter($"g" === 1)
        .agg(org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum($"cg" * $"ar2"),
            org.apache.spark.sql.functions.lit(0L)).as("r2"),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum($"cg"),
            org.apache.spark.sql.functions.lit(0L)).as("n1"))
        .collect().head
      val (r1x2, n1) = (r2n.getLong(0), r2n.getLong(1))
      val u1x2 = r1x2 - n1 * (n1 + 1)
      val g1 = rows.filter(_._2 == 1).map(_._3)
      val g2 = rows.filter(_._2 == 2).map(_._3)
      val wins = (for (a <- g1; b <- g2) yield
        if (a > b) 2L else if (a == b) 1L else 0L).sum
      Prop(u1x2 == wins) :| s"u1_x2=$u1x2 wins+ties=$wins"
    }

  // Kruskal–Wallis: the distributed rank pipeline (GlobalIndex
  // ranking, doubled midranks from tie-class row-number sums,
  // per-term integer divisions) against a sequential BigInt
  // reference that computes the SAME floored rationals directly.
  private val genKw: Gen[List[(Int, Long)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.choose(1, 3)
      v <- Gen.choose(1L, 8L) // small domain → heavy ties
    } yield (g, v)).map(_.take(50))

  property("Kruskal–Wallis == sequential BigInt reference") =
    Prop.forAll(genKw) { pts =>
      import spark.implicits._
      val rows = pts.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v) }
      val got = Stats.kruskalWallisOf(
        rows.toDF("k", "g", "v"), nGroups = 3).collect().head
      // sequential reference
      val n = rows.size
      val ranked = rows.sortBy(r => (r._3, r._1)).zipWithIndex
        .map { case ((k, g, v), i) => (k, g, v, i + 1L) }
      val byV = ranked.groupBy(_._3).view.mapValues { xs =>
        (xs.map(_._4).sum, xs.size.toLong)
      }.toMap
      val ar2 = byV.view.mapValues { case (rsum, t) => 2 * rsum / t }.toMap
      val r2 = ranked.groupBy(_._2).view
        .mapValues(xs => xs.map(x => BigInt(ar2(x._3))).sum).toMap
      val ng = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val bn = BigInt(n)
      val sQ6 = (1 to 3).map { g =>
        if (!ng.contains(g)) BigInt(0)
        else r2(g) * r2(g) * 3000000 / (BigInt(ng(g)) * bn * (bn + 1))
      }.sum
      val hQ6 = (sQ6 - 3 * (bn + 1) * 1000000).max(BigInt(0))
      val tie = byV.values.map { case (_, t) =>
        BigInt(t) * t * t - t
      }.sum
      val n3n = bn * bn * bn - bn
      val tieFrac = if (n3n == 0) None else Some(tie * 1000000 / n3n)
      val hTie = tieFrac.filter(_ != 1000000)
        .map(tf => hQ6 * 1000000 / (1000000 - tf))
      val gotNg = (1 to 3).map(i => got.getLong(got.fieldIndex(s"n$i")))
      val gotR2 = (1 to 3).map(i => got.getLong(got.fieldIndex(s"rs${i}_x2")))
      val gotTf = if (got.isNullAt(got.fieldIndex("tie_frac_q6"))) None
        else Some(BigInt(got.getLong(got.fieldIndex("tie_frac_q6"))))
      val gotHt = if (got.isNullAt(got.fieldIndex("h_tie_q6"))) None
        else Some(BigInt(got.getLong(got.fieldIndex("h_tie_q6"))))
      Prop(
        got.getLong(0) == n.toLong &&
        gotNg == (1 to 3).map(g => ng.getOrElse(g, 0L)) &&
        gotR2 == (1 to 3).map(g => r2.getOrElse(g, BigInt(0)).toLong) &&
        gotTf == tieFrac &&
        got.getLong(got.fieldIndex("h_q6")) == hQ6.toLong &&
        gotHt == hTie) :|
        s"got=$got want h_q6=$hQ6 h_tie=$hTie tie_frac=$tieFrac"
    }

  // Mann–Whitney: the rank-sum form U₁ = R₁ − n₁(n₁+1)/2 computed by
  // the distributed pipeline must equal the DEFINITION — the count of
  // cross-group wins plus half the cross-group ties (both ×2 to stay
  // integer). Registered via the deferred def above so the shared
  // genKw generator is initialized first.
  property("Mann–Whitney U rank form == pairwise wins definition") =
    mannWhitneyProp
}
