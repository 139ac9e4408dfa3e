package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced text-format readers — the engine's non-parquet
  * sources. Schemas are always explicit (never inferred): inference
  * costs an extra full scan and silently drifts when the data does
  * (SURVEY.md §1.4 — the reference also casts explicitly everywhere).
  */
object FileSources {

  /** CSV with header, explicit schema, malformed rows dropped
    * (PERMISSIVE would null them; the reference's parsers drop).
    *
    * CSV column pruning is disabled for the session: with pruning on,
    * DROPMALFORMED only inspects the columns a query reads, so the
    * same file yields different row sets depending on downstream
    * projection — a count() would keep rows a full select drops.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(path)
  }

  /** JSON-lines with explicit schema. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .json(path)

  /** ORC — the second columnar format (vectorized reader, predicate
    * pushdown into stripe/row-group indexes, same partition-dir layout
    * as parquet). Schema comes from the file footer like parquet;
    * passing one here would silently mask column drift instead of
    * failing the read.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
