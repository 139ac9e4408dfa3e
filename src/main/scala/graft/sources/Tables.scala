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
  /** events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 refuses
    * to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read it as raw
    * nanos (legacy conf) and normalize to a microsecond TimestampType
    * column — the generator emits µs-aligned values, so this is
    * lossless and matches DuckDB's epoch_us view of the same data.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")
}
