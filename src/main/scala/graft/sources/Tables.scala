package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet test tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst's vectorized parquet reader,
  * predicate pushdown and column pruning all apply. At 100 TB these
  * would be the same calls against a partitioned table root (e.g.
  * `.../lineitem/ship_date=.../part-*.parquet`); nothing here assumes
  * single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = read(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = read(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = read(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = read(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = read(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = read(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = read(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = read(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")
}
