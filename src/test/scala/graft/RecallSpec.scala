package graft

import org.apache.spark.sql.functions._

/** Quantifies the q26-vs-q27 blocking trade-off on planted near-dups:
  * exact (lang, token_count) blocking is cheap but structurally blind
  * to near-dups that differ in length, while MinHash LSH banding sees
  * them. The fixture plants both kinds; recall is measured against
  * brute-force shingle Jaccard ground truth. Everything is
  * deterministic (fixed texts, fixed hash family), so the measured
  * recalls are exact, not flaky.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  // 8 base docs of 25 distinct tokens each (disjoint vocab per doc →
  // cross-pair jaccard is 0); 4 same-length plants (one token swapped)
  // and 4 length-changed plants (one token deleted).
  private lazy val docs = {
    def base(i: Int) = (0 until 25).map(k => s"w${i}_$k")
    val bases = (0 until 8).map(i => (i.toLong, "en", base(i).mkString(" ")))
    val sameLen = (0 until 4).map { i =>
      val t = base(i).updated(5, "swapped")
      (100L + i, "en", t.mkString(" "))
    }
    val diffLen = (4 until 8).map { i =>
      val t = base(i).patch(7, Nil, 1) // delete one token → 24 tokens
      (200L + i, "en", t.mkString(" "))
    }
    (bases ++ sameLen ++ diffLen).toDF("doc_id", "lang", "text")
  }

  // ground truth: brute-force shingle-hash Jaccard ≥ 0.5 over all pairs
  private lazy val truth: Set[(Long, Long)] = {
    val hs = graft.ext.Dedup.hashSetsOf(docs)
    val a = hs.select($"doc_id".as("a_id"), $"hashes".as("ah"))
    val b = hs.select($"doc_id".as("b_id"), $"hashes".as("bh"))
    val inter = size(array_intersect($"ah", $"bh"))
    val uni = size($"ah") + size($"bh") - inter
    a.crossJoin(b).filter($"a_id" < $"b_id")
      .filter(inter.cast("double") / uni >= 0.5)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def lengthDiffers(p: (Long, Long)): Boolean = {
    val lens = docs.select($"doc_id", size(split($"text", " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    lens(p._1) != lens(p._2)
  }

  test("exact-length blocking misses every length-differing near-dup") {
    assert(truth.size == 8, s"expected 8 planted pairs, got ${truth.size}")
    val blocked = graft.ext.Dedup.ngramJaccardFrames(docs)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (diffLen, sameLen) = truth.partition(lengthDiffers)
    assert(diffLen.size == 4 && sameLen.size == 4)
    assert((blocked & diffLen).isEmpty,
      "exact token-count blocking cannot see cross-length near-dups")
    assert(sameLen.subsetOf(blocked), "same-length plants must all be found")
    info(s"blocked recall: ${(blocked & truth).size}/${truth.size}")
  }

  test("MinHash LSH recall covers what blocking misses and dominates it") {
    val lsh = graft.ext.Dedup.candidatePairs(graft.ext.Dedup.hashSetsOf(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.ext.Dedup.ngramJaccardFrames(docs)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRecall = (lsh & truth).size.toDouble / truth.size
    val blockedRecall = (blocked & truth).size.toDouble / truth.size
    info(f"lsh=$lshRecall%.2f blocked=$blockedRecall%.2f")
    assert(lshRecall >= blockedRecall,
      "LSH banding must recall at least what exact-length blocking does")
    val diffLen = truth.filter(lengthDiffers)
    assert((lsh & diffLen).nonEmpty,
      "LSH must find length-differing near-dups blocking cannot")
  }

  test("setSimilarityJoin: exact J>=0.9 boundary — kept at 0.9, dropped just below") {
    val dir = java.nio.file.Files.createTempDirectory("graft-setsim").toString
    val t = (0 until 10).map(i => s"t$i")
    Seq(
      (1L, t.mkString(" ")),                      // 10 tokens
      (2L, t.take(9).mkString(" ")),              // J(1,2) = 9/10  kept
      (3L, (t.take(9) :+ "zz").mkString(" ")),    // J(1,3) = 9/11  dropped; J(2,3) = 9/10 kept
      (4L, (0 until 10).map(i => s"u$i").mkString(" ")), // disjoint
      // same SET as doc 1 (reversed order, one repeat) → collapses
      // into doc 1's representative, raising its member count
      (5L, (t.reverse :+ "t0").mkString(" ")))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.ext.Dedup.setSimilarityJoin(spark, dir)
      .select($"doc_a", $"doc_b", $"inter", $"members_a", $"members_b", $"jacc")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 9L, 2L, 1L, 0.9), (2L, 3L, 9L, 1L, 1L, 0.9)),
      "set-identical doc 5 must fold into rep 1 (members 2), no self-pair emitted")
  }

  test("sortedNeighborhood: shared-prefix near-dups pair up; window bounds the pair set") {
    // sort key = first 16 normalized chars: docs 1,2 share
    // "applebananacherr" and rank adjacent (tie-break doc_id); doc 3
    // sorts last. Shingles (3-token): docs 1,2 share 2 of 4 distinct.
    val docs = Seq(
      (1L, "apple banana cherry date egg"),
      (2L, "apple banana cherry date fig"),
      (3L, "zebra yak xenon walrus vulture"))
      .toDF("doc_id", "text")
    val w1 = graft.ext.Dedup.sortedNeighborhoodOf(docs, w = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(w1.toSeq == Seq((1L, 2L, 1L, 500000L), (2L, 3L, 1L, 0L)),
      s"w=1 pairs ONLY rank-consecutive docs; got ${w1.toSeq}")
    val w2 = graft.ext.Dedup.sortedNeighborhoodOf(docs, w = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(w2.toSeq == Seq((1L, 2L, 1L, 500000L), (1L, 3L, 2L, 0L),
      (2L, 3L, 1L, 0L)), s"w=2 adds the gap-2 pair; got ${w2.toSeq}")
  }
}
