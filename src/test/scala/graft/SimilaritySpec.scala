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
}
