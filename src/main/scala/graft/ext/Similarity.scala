package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graft.Bridge
import graft.functions.CosineSimilarity
import graft.sources.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline and a
  * partition-pruned (IVF-style) variant as the scale path.
  *
  * Scale design: the query set is small and broadcast; candidates
  * stream through a codegen'd [[CosineSimilarity]] scan with a
  * per-query top-k window — no global sort, no driver collect. At
  * 100 TB the IVF variant is the one you run: vectors are
  * pre-partitioned by cluster id (here the `label` column plays the
  * role of a k-means cell), the probe joins only its own cell, and the
  * scan prunes every other partition (`partitionBy(label)` layout on
  * disk → partition pruning at the source).
  */
object Similarity {
  private def r4(c: Column): Column = round(c * lit(10000.0), 0) / lit(10000.0)

  private def cos(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Brute-force cosine top-5: queries = vec_id < 5 (broadcast), scan
    * everything else, rank per query. Exact-search baseline.
    */
  def cosineTopK(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = emb.filter($"vec_id" >= 5)
      .select($"vec_id", $"embedding".as("cv"))
    val w = Window.partitionBy($"query_id").orderBy($"score_raw".desc, $"vec_id")
    c.crossJoin(broadcast(q))
      .select($"query_id", $"vec_id", cos($"qv", $"cv").as("score_raw"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"query_id", $"rn", $"vec_id", r4($"score_raw").as("score"))
      .orderBy($"query_id", $"rn")
  }

  /** IVF-style pruned top-3: search only the query's own cluster cell
    * (`label`) — the candidate set shrinks by the number of cells, and
    * with a `partitionBy(label)` table layout the scan itself prunes.
    */
  def ivfTopK(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"label", $"embedding".as("qv"))
    val c = emb.filter($"vec_id" >= 5)
      .select($"vec_id", $"label", $"embedding".as("cv"))
    val w = Window.partitionBy($"query_id").orderBy($"score_raw".desc, $"vec_id")
    c.join(broadcast(q), "label")
      .select($"query_id", $"vec_id", cos($"qv", $"cv").as("score_raw"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"query_id", $"rn", $"vec_id", r4($"score_raw").as("score"))
      .orderBy($"query_id", $"rn")
  }

  /** Embedding near-dup: pairs inside the same cell with cosine above
    * threshold — the vector-space member of the dedup family
    * ([[Dedup]]); blocking by cell keeps the pair space per-cell
    * quadratic, not global.
    */
  def embeddingNearDup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
      .select($"vec_id", $"label", $"embedding")
    val a = emb.select($"vec_id".as("a_id"), $"label", $"embedding".as("av"))
    val b = emb.select($"vec_id".as("b_id"), $"label", $"embedding".as("bv"))
    a.join(b, Seq("label"))
      .filter($"a_id" < $"b_id")
      .select($"label", $"a_id", $"b_id", cos($"av", $"bv").as("score_raw"))
      .filter($"score_raw" >= 0.4)
      .select($"label", $"a_id", $"b_id", r4($"score_raw").as("score"))
      .orderBy($"a_id", $"b_id")
  }
}
