package graft

import org.apache.spark.sql.functions._

/** Hyperplane-LSH near-dup: the candidate budget must beat per-label
  * quadratic blocking, results must be exact (every emitted pair
  * really clears the cosine threshold), and recall vs the brute-force
  * truth is measured — partial by design at the weak-similarity 0.45
  * threshold on this synthetic table (no planted near-dups; the
  * banding is tuned for the cos ≥ 0.9 regime where collision
  * probability is ~98%).
  */
class HyperplaneSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  private lazy val bruteTruth: Set[(Long, Long)] = {
    import org.apache.spark.sql.graft.Bridge
    val emb = graft.sources.Tables.embeddings(spark, d)
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Bridge.column(graft.functions.CosineSimilarity(
        Bridge.expression(a), Bridge.expression(b)))
    val a = emb.select($"vec_id".as("a_id"), $"embedding".as("av"))
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("bv"))
    a.crossJoin(b).filter($"a_id" < $"b_id")
      .filter(cos($"av", $"bv") >= graft.ext.Similarity.HpThreshold)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("candidate set is smaller than per-label quadratic blocking") {
    val nCand = graft.ext.Similarity.hyperplaneCandidates(spark, d).count()
    val labelPairs = graft.sources.Tables.embeddings(spark, d)
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .select(sum(($"n" * ($"n" - 1) / 2).cast("long"))).collect().head.getLong(0)
    val total = graft.sources.Tables.embeddings(spark, d).count()
    val allPairs = total * (total - 1) / 2
    info(s"candidates=$nCand labelBlockedPairs=$labelPairs allPairs=$allPairs")
    assert(nCand < labelPairs, "LSH banding must beat cell blocking's budget")
    assert(nCand < allPairs / 10, "LSH banding must prune >90% of the pair space")
  }

  test("emitted pairs are exact and recall vs brute force is measured") {
    val got = graft.ext.Similarity.hyperplaneNearDup(spark, d)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0: verification is exact cosine, so nothing spurious
    assert(got.subsetOf(bruteTruth))
    assert(got.nonEmpty)
    val recall = got.size.toDouble / bruteTruth.size
    info(f"recall@${graft.ext.Similarity.HpThreshold}: ${got.size}/${bruteTruth.size} = $recall%.2f")
  }
}
