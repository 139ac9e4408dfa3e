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
  /** Schema-robust events reader. The driver's generator has emitted
    * `ts` under different physical parquet encodings across rounds:
    * INT64 TIMESTAMP(NANOS) (which Spark 4 refuses to read as a
    * timestamp — [PARQUET_TYPE_ILLEGAL] — so we read it as raw nanos
    * via the legacy conf and normalize), and plain `timestamp[us]`
    * without timezone (TIMESTAMP_NTZ to Spark). Dispatch on the type
    * Spark actually reads so both generations — and a future
    * session-TZ-adjusted TimestampType — normalize to the same
    * microsecond TimestampType column under the pinned UTC session,
    * matching DuckDB's epoch_us view of the same data.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    // The legacy conf is session-global and changes how EVERY
    // INT64(NANOS) parquet column in the session reads, so it is set
    // only on the retry path after the nanos fixture actually refused
    // to load — never preemptively. µs-typed testdata (the current
    // generation) loads on the first attempt and leaves the session
    // conf untouched (TablesSchemaSpec pins this).
    def refusedNanos(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(m =>
        m.contains("NANOS") || m.contains("ILLEGAL_PARQUET_TYPE")) ||
        refusedNanos(t.getCause))
    val df =
      try read(spark, d, "events")
      catch {
        case e: Exception if refusedNanos(e) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          read(spark, d, "events")
      }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // legacy INT64-nanos fixture, read as raw nanos
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => // timestamp[us] no-TZ parquet
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other — testdata schema drifted, update Tables.events")
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")
}
