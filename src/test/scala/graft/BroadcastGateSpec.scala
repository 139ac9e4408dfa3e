package graft

import graft.ext.{Corpus, Graph}

/** The measured broadcast gates must actually fall back: a broadcast
  * hint never auto-degrades (an oversized broadcast OOMs, it doesn't
  * re-plan), so each gated operator is run here with a zero budget —
  * simulating the 100 TB side — and must (a) plan a shuffle join
  * instead of a broadcast on the gated side and (b) produce exactly
  * the rows the broadcast form produces.
  */
class BroadcastGateSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  /** Plan (and execute) `build` with Catalyst's own size-based
    * auto-broadcast off: at sf0.001 every frame is tiny enough that
    * the optimizer re-broadcasts a dropped hint from its accurate
    * cache stats — correct auto-fallback, but it would mask whether
    * the GATE actually removed the hint. Disabling the threshold
    * leaves hint-driven broadcasts intact, so a surviving broadcast
    * can only come from a gate failure.
    */
  private def withoutAutoBroadcast[T](build: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try build finally spark.conf.set(key, old)
  }

  test("tfidf: oversized vocabulary drops the df broadcast, result unchanged") {
    val hinted = Corpus.tfidfTopTerms(spark, d)
    val (gated, plan) = withoutAutoBroadcast {
      val g = Corpus.tfidfTopTerms(spark, d, maxBroadcastTerms = -1L)
      (g, g.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"df join must take the shuffle path above the vocab budget:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "no broadcast may survive a blown vocabulary budget")
    assert(rows(gated) == rows(hinted), "gate changed the tfidf result")
  }

  test("bm25: oversized vocabulary drops the df broadcast, result unchanged") {
    val hinted = Corpus.bm25TopTerms(spark, d)
    val (gated, plan) = withoutAutoBroadcast {
      val g = Corpus.bm25TopTerms(spark, d, maxBroadcastTerms = -1L)
      (g, g.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"df join must take the shuffle path above the vocab budget:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "no broadcast may survive a blown vocabulary budget")
    assert(rows(gated) == rows(hinted), "gate changed the bm25 result")
  }

  test("triangles: oversized adjacency drops every broadcast, count unchanged") {
    val hinted = rows(Graph.triangleCount(spark, d))
    // drop the shared Derived frames: the oriented-edge cache was just
    // built WITH broadcast hints, and a cached relation's build plan
    // prints inside the gated plan string — rebuild everything under
    // the gate so any BroadcastHashJoin in the text is a real leak.
    // (The scalar-assembly crossJoins plan as one-row cartesians with
    // auto-broadcast off; only the equi-joins are audited.)
    Derived.clear()
    val (gated, plan) = withoutAutoBroadcast {
      val g = Graph.triangleCount(spark, d, maxBroadcastAdj = -1L)
      (g, g.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"adjacency joins must shuffle above the edge budget:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "no hash broadcast may survive a blown adjacency budget")
    assert(rows(gated) == hinted, "gate changed the triangle census")
  }

  // The two iterative peels checkpoint every round, so the loop's
  // joins never appear in the FINAL frame's executed plan — the gate
  // audit here is behavioral: a zero budget forces the shuffle branch
  // (the hint is simply never applied) and the peel must converge to
  // the exact frame the broadcast branch produces.

  test("kCore: oversized survivor set takes the shuffle peel, frame unchanged") {
    val hinted = rows(Graph.kCore(spark, d, k = 3L))
    Derived.clear()
    val gated = withoutAutoBroadcast {
      rows(Graph.kCore(spark, d, k = 3L, maxBroadcastNodes = -1L))
    }
    assert(gated == hinted, "gate changed the k-core decomposition")
  }

  test("labelPropagation: oversized label frame takes the shuffle rounds, " +
    "communities unchanged") {
    val hinted = rows(Graph.labelPropagation(spark, d))
    Derived.clear()
    val gated = withoutAutoBroadcast {
      rows(Graph.labelPropagation(spark, d, maxBroadcastLabels = -1L))
    }
    assert(gated == hinted, "gate changed the community assignment")
  }

  test("katz: oversized score frames drop both round broadcasts, " +
    "scores unchanged") {
    val hinted = rows(Graph.katzCentrality(spark, d))
    Derived.clear()
    val (gated, plan) = withoutAutoBroadcast {
      val g = Graph.katzCentrality(spark, d, maxBroadcastNodes = -1L)
      (g, g.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"score joins must shuffle above the node budget:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "no hash broadcast may survive a blown node budget")
    assert(rows(gated) == hinted, "gate changed the katz scores")
  }

  // hits checkpoints each half-step's raw frame, so its round joins
  // never appear in the final frame's executed plan — behavioral
  // audit like the peels above.
  test("hits: oversized score frames take the shuffle half-steps, " +
    "scores unchanged") {
    val hinted = rows(Graph.hits(spark, d))
    Derived.clear()
    val gated = withoutAutoBroadcast {
      rows(Graph.hits(spark, d, maxBroadcastNodes = -1L))
    }
    assert(gated == hinted, "gate changed the hits scores")
  }

  test("hyperplane pairs: oversized embeddings drop the re-attach " +
    "broadcasts, pairs unchanged") {
    val hinted = rows(ext.Similarity.hyperplaneVerifiedPairs(spark, d)
      .orderBy("a_id", "b_id"))
    // the gated build lands on a DIFFERENT Derived key (bc=false), so
    // no clear() is needed for result isolation — but the hinted build
    // just cached a broadcast-shaped frame whose plan would print
    // inside anything that reused it, so drop both for a clean audit
    Derived.clear()
    val (gated, plan) = withoutAutoBroadcast {
      val g = ext.Similarity.hyperplaneVerifiedPairs(spark, d,
        maxBroadcastRows = -1L)
      (rows(g.orderBy("a_id", "b_id")), g.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"vector re-attach must shuffle above the embedding budget:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "no broadcast may survive a blown embedding budget")
    assert(gated == hinted, "gate changed the verified pair set")
  }

  test("minhashLsh: oversized shingle arrays drop the re-attach " +
    "broadcasts, jaccard unchanged") {
    val hinted = rows(ext.Dedup.minhashLsh(spark, d))
    Derived.clear()
    val (gated, plan) = withoutAutoBroadcast {
      val g = ext.Dedup.minhashLsh(spark, d, maxBroadcastEntries = -1L)
      (rows(g), g.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"hash-array re-attach must shuffle above the entry budget:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "no broadcast may survive a blown shingle-entry budget")
    assert(gated == hinted, "gate changed the jaccard scores")
  }

  test("containment: oversized shingle arrays take the shuffle " +
    "re-attach, scores unchanged") {
    val hinted = rows(ext.Dedup.containment(spark, d))
    Derived.clear()
    val gated = withoutAutoBroadcast {
      rows(ext.Dedup.containment(spark, d, maxBroadcastEntries = -1L))
    }
    assert(gated == hinted, "gate changed the containment scores")
  }

  test("dedupSurvivors + clusterSafeSplit: an oversized cluster frame " +
    "takes the shuffle join, output unchanged") {
    val survivors = rows(ext.Dedup.dedupSurvivors(spark, d))
    val split = rows(ext.Dedup.clusterSafeSplit(spark, d))
    Derived.clear()
    val (gs, gc) = withoutAutoBroadcast {
      (rows(ext.Dedup.dedupSurvivors(spark, d, maxBroadcastRows = -1L)),
        rows(ext.Dedup.clusterSafeSplit(spark, d, maxBroadcastRows = -1L)))
    }
    assert(gs == survivors, "gate changed the surviving corpus")
    assert(gc == split, "gate changed the split assignment")
  }

  test("setSimilarityJoin: an oversized vocabulary drops the df " +
    "broadcast, pairs unchanged") {
    val hinted = rows(ext.Dedup.setSimilarityJoin(spark, d))
    Derived.clear()
    val gated = withoutAutoBroadcast {
      rows(ext.Dedup.setSimilarityJoin(spark, d, maxBroadcastTerms = -1L))
    }
    assert(gated == hinted, "gate changed the PPJoin result")
  }

  test("knnLabelConsensus: oversized embeddings drop the neighbor " +
    "broadcasts, verdicts unchanged") {
    val hinted = rows(ext.Similarity.knnLabelConsensus(spark, d))
    Derived.clear()
    val (gated, plan) = withoutAutoBroadcast {
      val g = ext.Similarity.knnLabelConsensus(spark, d,
        maxBroadcastRows = -1L)
      (rows(g), g.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"label re-attach must shuffle above the embedding budget:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "no broadcast may survive a blown embedding budget")
    assert(gated == hinted, "gate changed the mislabel screen")
  }

}
