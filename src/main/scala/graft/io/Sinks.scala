package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks (SURVEY.md §2.2) — the reference's JDBC-append / CSV+COPY /
  * driver-collected-UPDATE writers (K1-K4) re-imagined as executor-side
  * columnar writes. Nothing here ever moves rows through the driver:
  * the reference's `toPandas() → to_csv → COPY` fact load
  * (`/root/reference/etl_pipeline_spark.py:1202-1330`) becomes a plain
  * distributed parquet write.
  *
  * The JDBC path is kept behind the same interface for serving-layer
  * parity, with the reference's operational knobs (batchsize,
  * numPartitions bound via coalesce — `etl_pipeline_spark.py:155-160`,
  * `:1028`).
  */
object Sinks {

  /** Columnar table write — the primary sink. `partitionCols` become
    * hive-style partition directories (partition pruning on read);
    * `sortCols` order rows within each file (row-group min/max pruning
    * for range predicates); `maxFilesPerPartition` bounds small-file
    * explosion the way the reference's `coalesce(20)` bounded
    * connection count.
    */
  def writeParquet(df: DataFrame, path: String,
                   partitionCols: Seq[String] = Nil,
                   sortCols: Seq[String] = Nil,
                   maxFilesPerPartition: Int = 0,
                   mode: SaveMode = SaveMode.Overwrite): Unit =
    writeColumnar(df, path, "parquet", partitionCols, sortCols,
      maxFilesPerPartition, mode)

  /** ORC table write — same layout contract as [[writeParquet]]
    * (partition dirs prune on read, in-file sort feeds stripe-level
    * min/max indexes), for consumers standardized on ORC.
    */
  def writeOrc(df: DataFrame, path: String,
               partitionCols: Seq[String] = Nil,
               sortCols: Seq[String] = Nil,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    writeColumnar(df, path, "orc", partitionCols, sortCols, 0, mode)

  private def writeColumnar(df: DataFrame, path: String, format: String,
                            partitionCols: Seq[String], sortCols: Seq[String],
                            maxFilesPerPartition: Int, mode: SaveMode): Unit = {
    var out = df
    if (maxFilesPerPartition > 0) out = out.coalesce(maxFilesPerPartition)
    if (sortCols.nonEmpty)
      out = out.sortWithinPartitions(sortCols.map(df.col): _*)
    val writer = out.write.mode(mode).format(format)
    val partitioned =
      if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer
    partitioned.save(path)
  }

  /** Z-ordered table write: range-partition and sort by the Morton
    * key of two dimensions ([[graft.functions.ZOrder2]]) so rows close
    * in BOTH columns land in the same files — a two-predicate box
    * query then skips most files on parquet min/max stats, where a
    * single-column sort only skips for that one column. The lakehouse
    * layout move for the second-most-selective predicate.
    */
  def writeZOrdered(df: DataFrame, path: String, dimA: String, dimB: String,
                    numFiles: Int, mode: SaveMode = SaveMode.Overwrite,
                    options: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.functions.col
    val z = Bridge.column(graft.functions.ZOrder2(
      Bridge.expression(col(dimA)), Bridge.expression(col(dimB))))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).options(options).parquet(path)
  }

  /** CSV export — replaces the driver-side pandas `to_csv` bridge
    * (`etl_pipeline_spark.py:1214-1217`) with a distributed write.
    */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  /** JDBC append — K1 parity for a serving database, with the
    * reference's batching knobs. Executors write concurrently;
    * `connections` bounds the fan-in like the reference's
    * `coalesce(20)` before its customer write.
    */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: java.util.Properties,
                 batchSize: Int = 5000, connections: Int = 8): Unit =
    df.coalesce(connections)
      .write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
}
