package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The similarity top-k path must rank via the bounded TopKAgg partial
  * aggregate, not a per-query `row_number` window: a window funnels the
  * full scored candidate set into one reducer partition per query,
  * which is the single worst shuffle shape for a 5-query × N-vector
  * scan. Assert the executed plan is window-free AND that the
  * aggregate formulation returns exactly what the window one would.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def hasWindow(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Window")

  test("cosineTopK plan contains no Window operator") {
    val df = graft.ext.Similarity.cosineTopK(spark, d)
    assert(!hasWindow(df))
    assert(df.count() > 0)
  }

  test("ivfTopK plan contains no Window operator") {
    val df = graft.ext.Similarity.ivfTopK(spark, d)
    assert(!hasWindow(df))
    assert(df.count() > 0)
  }

  test("TopKAgg ranking equals the row_number window formulation") {
    val got = graft.ext.Similarity.cosineTopK(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // reference: the window formulation it replaced
    import org.apache.spark.sql.graft.Bridge
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Bridge.column(graft.functions.CosineSimilarity(
        Bridge.expression(a), Bridge.expression(b)))
    def r4(c: org.apache.spark.sql.Column) =
      round(c * lit(10000.0), 0) / lit(10000.0)
    val emb = graft.sources.Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = emb.filter($"vec_id" >= 5)
      .select($"vec_id", $"embedding".as("cv"))
    val w = Window.partitionBy($"query_id").orderBy($"score_raw".desc, $"vec_id")
    val want = c.crossJoin(broadcast(q))
      .select($"query_id", $"vec_id", cos($"qv", $"cv").as("score_raw"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"query_id", $"rn", $"vec_id", r4($"score_raw").as("score"))
      .orderBy($"query_id", $"rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    assert(got.toSeq == want.toSeq)
  }

  test("rrfFusion: hand-computed reciprocal-rank fusion of exact and IVF runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rrf").toString
    // query 0 = [1,0] in cell 0; exact ranks candidates 5,6,7,8 by
    // cosine 1.0 / 0.8 / 0.0 / -1.0; IVF sees only cell 0 (5, 7)
    Seq(
      (0L, Array(1f, 0f), 0),
      (5L, Array(1f, 0f), 0), (6L, Array(0.8f, 0.6f), 1),
      (7L, Array(0f, 1f), 0), (8L, Array(-1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = graft.ext.Similarity.rrfFusion(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // rrf: 5 -> 2*16393; 7 -> 15873+16129; 6 -> 16129; 8 -> 15625
    assert(got.toSeq == Seq(
      (1L, 5L, 1L, 1L, 32786L),
      (2L, 7L, 3L, 2L, 32002L),
      (3L, 6L, 2L, 0L, 16129L),
      (4L, 8L, 4L, 0L, 15625L)), s"got ${got.toSeq}")
  }

  test("knnLabelConsensus: the planted mislabel is the only suspect") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn").toString
    // one tight cluster of four near-identical vectors (they collide
    // on every hyperplane band): labels 1,1,1,2 — vector 3 is the
    // planted mislabel and must be the ONLY suspect; the rest see a
    // 2-of-3 (or better) majority for their own label
    Seq(
      (0L, Array(1f, 0.01f), 1), (1L, Array(1f, 0.02f), 1),
      (2L, Array(1f, 0.03f), 1), (3L, Array(1f, 0.04f), 2))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = graft.ext.Similarity.knnLabelConsensus(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (0L, 1, 3L, 2L, false),
      (1L, 1, 3L, 2L, false),
      (2L, 1, 3L, 2L, false),
      (3L, 2, 3L, 0L, true)), s"got ${got.toSeq}")
  }

  test("pqCodes: codes and error match a brute-force Scala reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    // 3 planted vectors: block-constant sign patterns, a mixed vector,
    // and an all-zero vector (equidistant from all 4 centroids — the
    // tie must break to code 0)
    val vecs = Seq(
      1L -> Array.tabulate(64)(j => if (j % 2 == 0) 0.3f else -0.3f),
      2L -> Array.tabulate(64)(j =>
        (if ((j / 16) % 2 == 0) 1 else -1) * (if (j % 2 == 0) 0.1f else 0.2f)),
      3L -> Array.fill(64)(0.0f))
    vecs.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    // reference implementation, independently written
    def ref(v: Array[Float]): (Seq[Int], Long) = {
      val q = v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      val perBlock = (0 until 4).map { b =>
        val ds = (0 until 4).map { c =>
          (0 until 16).map { j =>
            val cent = if (j % 2 == 0) (if (c < 2) 250000L else -250000L)
                       else (if (c % 2 == 0) 250000L else -250000L)
            val diff = q(b * 16 + j) - cent
            diff * diff
          }.sum
        }
        val best = ds.zipWithIndex.minBy { case (d2, c) => (d2, c) }
        (best._2, best._1)
      }
      (perBlock.map(_._1), perBlock.map(_._2).sum)
    }
    val want = vecs.map { case (id, v) =>
      val (codes, err) = ref(v)
      (id, codes(0), codes(1), codes(2), codes(3),
        ((codes(0) * 4 + codes(1)) * 4 + codes(2)) * 4 + codes(3), err)
    }
    val got = graft.ext.Similarity.pqCodes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getLong(6)))
    assert(got.toSeq == want)
    // sanity on the intended geometry, not just self-consistency
    assert(want.head._2 == 1, "(+,-) pattern must take code 1 in block 0")
    assert(want(2)._2 == 0 && want(2)._7 == 64L * 250000L * 250000L,
      "all-zero vector ties to code 0 at the known distance")
  }

  test("rankNormalize: arithmetic ranks equal per-dim ordering, ties by id") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rank").toString
    // constant vectors give the same per-dim order everywhere; vec 4
    // duplicates vec 1's values so the (v, vec_id) tie-break shows
    Seq(1L -> 0.1f, 2L -> 0.3f, 3L -> 0.2f, 4L -> 0.1f)
      .map { case (id, x) => (id, Array.fill(64)(x)) }
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = graft.ext.Similarity.rankNormalize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == 4 * 8, "4 vectors x dims 0..7")
    for (dim <- 0L until 8L) {
      assert(got((1L, dim)) == ((1L, 250000L)), s"dim $dim: v1 first (tie->id)")
      assert(got((4L, dim)) == ((2L, 500000L)), s"dim $dim: v4 second")
      assert(got((3L, dim)) == ((3L, 750000L)))
      assert(got((2L, dim)) == ((4L, 1000000L)))
    }
  }

  test("ivfPqSearch: window-free plan; rescore recovers the exact in-cell ranking") {
    val df = graft.ext.Similarity.ivfPqSearch(spark, d)
    assert(!hasWindow(df), "both cuts must rank via TopKAgg, not windows")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 15, "5 queries x top-3")

    // brute-force exact in-cell top-3 on the quantized grid
    val all = spark.read.parquet(s"$d/embeddings.parquet")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))
    def q(v: Array[Float]) = v.map(x => math.floor(x.toDouble * 1e6).toLong)
    val exact = for {
      (qid, qv, ql) <- all.filter(_._1 < 5)
      top = all.filter(c => c._1 >= 5 && c._3 == ql)
        .map { case (cid, cv, _) =>
          val d2 = q(qv).zip(q(cv)).map { case (a, b) => (a - b) * (a - b) }.sum
          (cid, d2)
        }.sortBy { case (cid, d2) => (d2, cid) }.take(3)
      ((cid, d2), pos) <- top.zipWithIndex
    } yield (qid, pos + 1, cid, d2)
    // every reported distance must be the TRUE grid distance (the
    // rescore is exact even when the ADC cut pruned the true top-3)
    val allD2 = (for {
      (qid, qv, ql) <- all.filter(_._1 < 5)
      (cid, cv, cl) <- all if cid >= 5 && cl == ql
    } yield (qid, cid) ->
      q(qv).zip(q(cv)).map { case (a, b) => (a - b) * (a - b) }.sum).toMap
    got.foreach { case (qid, _, cid, d2) =>
      assert(allD2((qid, cid)) == d2,
        s"reported d2 must be the exact grid distance for ($qid, $cid)")
    }
    // per query the 3 rows must rank by (d2, vec_id)
    got.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2).map(r => (r._4, r._3))
      assert(sorted.sameElements(sorted.sorted), s"rescore order: $rs")
    }
    // the coarse 4-centroid codebook is a REAL approximation — set
    // recall vs the exact in-cell top-3 is 7/15 on this data
    // (deterministic); require the floor so a codebook regression shows
    val exactSet = exact.map(e => (e._1, e._3)).toSet
    val hits = got.count(g => exactSet.contains((g._1, g._3)))
    assert(hits >= 6, s"IVF-PQ set recall vs exact in-cell top-3: $hits/15")

    // the eval OPERATOR must report exactly these per-query hit counts
    val evalRows = graft.ext.Similarity.annEval(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantHits = got.groupBy(_._1).map { case (qid, rs) =>
      qid -> rs.count(g => exactSet.contains((g._1, g._3))).toLong
    }
    assert(evalRows == wantHits,
      s"annEval hits ${evalRows} != brute-force ${wantHits}")
  }

  test("silhouette: hand-computed centroid-form scores on two planted " +
    "clusters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sil").toString
    // label 0 on the x-axis (centroid (3,0)), label 1 on the y-axis
    // (centroid (0,3)) — symmetric by construction
    Seq((0L, Array(2f, 0f), 0), (1L, Array(4f, 0f), 0),
        (2L, Array(0f, 2f), 1), (3L, Array(0f, 4f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    // (2,0): a=1, b=√13 ⇒ s = 1 − 1/√13 → 722649; (4,0): a=1, b=5 ⇒
    // s = 0.8 → 800000; mean = 1522649 div 2 = 761324; label 1 mirrors
    val got = graft.ext.Similarity.silhouette(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0, 2L, 761324L), (1, 2L, 761324L)),
      s"got ${got.toSeq}")
  }

  test("coresetCoverage: per-row max cosine against the bounded " +
    "coreset, mean and 0.7-floor share per label") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cov").toString
    // coreset (size 2) = ids 0, 1; id 2 matches a member exactly,
    // id 3 sits at 45° from both ⇒ mc = 1/√2 → 707106
    Seq((0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
        (2L, Array(1f, 0f), 1), (3L, Array(1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = graft.ext.Similarity
      .coresetCoverage(spark, dir, coresetSize = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // label 0 members ARE the coreset (mc = 1); label 1 mean =
    // (1000000 + 707106) div 2 = 853553, both above the 0.7 floor
    assert(got.toSeq == Seq((0, 2L, 1000000L, 1000000L),
      (1, 2L, 853553L, 1000000L)), s"got ${got.toSeq}")
  }

  test("mmrDiversified: the second pick skips a near-duplicate of the " +
    "first that pure relevance would keep") {
    import spark.implicits._
    val q = Seq((0L, Array(1f, 0f)))
      .toDF("query_id", "qv")
    // 10: most relevant; 11: near-duplicate of 10 (mutual cos ≈ 1);
    // 12: slightly less relevant but diverse
    val c = Seq(
      (10L, Array(0.91f, 0.415f)),
      (11L, Array(0.90f, 0.436f)),
      (12L, Array(0.85f, -0.527f)))
      .toDF("vec_id", "cv")
    val got = graft.ext.Similarity
      .mmrDiversifiedOf(q, c, k = 3, nCand = 3)
      .select("step", "vec_id").as[(Int, Long)].collect().toSeq
    // relevance alone ranks 10, 11, 12; MMR's step-2 objective
    // 7·rel − 3·maxsim demotes the near-duplicate 11 below 12
    assert(got == Seq((1, 10L), (2, 12L), (3, 11L)), s"got $got")
  }

  test("mmrDiversified: gated driver greedy equals the distributed loop") {
    import spark.implicits._
    // multi-query pool with ties and near-duplicates: enough structure
    // that a selection-order bug on either side of the gate shows
    val q = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("query_id", "qv")
    val c = (10L to 21L).map { i =>
      (i, Array((math.cos(i * 0.47) * 0.9).toFloat,
        (math.sin(i * 0.47) * 0.9).toFloat))
    }.toDF("vec_id", "cv")
    def run(gate: Long) = graft.ext.Similarity
      .mmrDiversifiedOf(q, c, k = 4, nCand = 6, maxDriverPairRows = gate)
      .select("query_id", "step", "vec_id", "mmr_q6x10")
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    val driver = run(Long.MaxValue) // below gate: driver greedy
    val dist = run(0L)              // gate 0: distributed step loop
    assert(driver == dist, s"driver=$driver dist=$dist")
    assert(driver.size == 8) // k picks per query, both queries
  }
}
