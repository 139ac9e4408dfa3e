package graft.io

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 ATOMIC text sink — the write-side completion of
  * [[graft.sources.GenSource]]'s read-side DSv2 surface, and the
  * commit-protocol upgrade over the reference's bare JDBC/CSV appends
  * (`etl_pipeline_spark.py` writes with no transactional boundary —
  * a died job leaves partial rows visible). This sink makes a batch
  * write ALL-OR-NOTHING using Spark's two-phase commit hooks:
  *
  *  - each task's [[DataWriter]] writes to a per-attempt STAGING file
  *    (`_staging_<queryId>/part-<partition>-<task>`) and reports it in
  *    its [[WriterCommitMessage]] only from `commit()` — a failed or
  *    speculatively-duplicated attempt's file is never reported;
  *  - the driver's [[BatchWrite.commit]] publishes: rename every
  *    reported staged file into the target directory, then write the
  *    `_MANIFEST` (the reported file list) via temp-file + atomic
  *    rename. Readers that consult the manifest (the house contract,
  *    asserted in AtomicSinkSpec) see the OLD complete state or the
  *    NEW complete state, never a torn mix;
  *  - [[BatchWrite.abort]] deletes the staging directory — a job that
  *    dies mid-write publishes NOTHING.
  *
  * Rows are rendered as tab-separated text (long/double/string
  * columns — the audit/export shapes [[Sinks.writeCsv]] serves, with
  * atomicity added). Paths go through the Hadoop FileSystem API, so
  * the same code runs on file://, HDFS, or any HCFS object-store
  * shim; single-directory rename is atomic on HDFS, and on rename-
  * less stores the manifest is STILL the visibility point because
  * readers honor only manifest-listed files.
  */
class AtomicSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only source: schema arrives from the frame
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AtomicSink.SinkTable(properties.get("path"), schema)
}

object AtomicSink {

  val ManifestFile = "_MANIFEST"

  /** Rows of `path` that a manifest-honoring reader may see: the
    * manifest's files, in manifest order. Empty if no manifest —
    * i.e. nothing was ever committed. */
  def committedFiles(spark: org.apache.spark.sql.SparkSession,
                     path: String): Seq[String] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val mf = new Path(path, ManifestFile)
    if (!fs.exists(mf)) Seq.empty
    else {
      val in = fs.open(mf)
      try scala.io.Source.fromInputStream(in).getLines().toList
      finally in.close()
    }
  }

  private[io] class SinkTable(path: String, schema: StructType)
      extends Table with SupportsWrite {
    override def name(): String = s"atomic($path)"
    override def schema(): StructType = schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_WRITE)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toBatch: BatchWrite =
            new AtomicBatchWrite(path, info.queryId(), info.schema())
        }
      }
  }

  private class AtomicBatchWrite(path: String, queryId: String,
                                 schema: StructType) extends BatchWrite {
    private def fs = new Path(path).getFileSystem(new Configuration())
    private def staging = new Path(path, s"_staging_$queryId")

    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DataWriterFactory =
      new TsvWriterFactory(path, queryId, schema)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val f = fs
      val names = messages.collect { case StagedFile(name) => name }.sorted
      names.foreach { n =>
        f.rename(new Path(staging, n), new Path(path, n))
      }
      // manifest last, via temp + atomic rename: its appearance IS
      // the commit point
      val tmp = new Path(path, s"_MANIFEST.tmp-$queryId")
      val out = f.create(tmp, true)
      try out.write(names.mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      f.rename(tmp, new Path(path, ManifestFile))
      f.delete(staging, true)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      fs.delete(staging, true)
    }
  }

  private case class StagedFile(name: String) extends WriterCommitMessage

  private class TsvWriterFactory(path: String, queryId: String,
                                 schema: StructType)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int,
                              taskId: Long): DataWriter[InternalRow] =
      new TsvWriter(path, queryId, schema, partitionId, taskId)
  }

  /** Writes `part-<partition>-<task>` under staging; the task id in
    * the name keeps retried/speculative attempts from clobbering each
    * other — only the attempt whose `commit()` ran is reported. */
  private class TsvWriter(path: String, queryId: String,
                          schema: StructType, partitionId: Int,
                          taskId: Long) extends DataWriter[InternalRow] {
    private val name = f"part-$partitionId%05d-$taskId"
    private val file = new Path(new Path(path, s"_staging_$queryId"), name)
    private val fs = file.getFileSystem(new Configuration())
    private val out = fs.create(file, true)

    override def write(row: InternalRow): Unit = {
      val cols = schema.fields.indices.map { i =>
        if (row.isNullAt(i)) ""
        else schema.fields(i).dataType match {
          case LongType => row.getLong(i).toString
          case DoubleType => row.getDouble(i).toString
          case StringType => row.getUTF8String(i).toString
          case dt => throw new IllegalArgumentException(
            s"AtomicSink supports long/double/string, got $dt")
        }
      }
      out.write((cols.mkString("\t") + "\n").getBytes("UTF-8"))
    }

    override def commit(): WriterCommitMessage = {
      out.close()
      StagedFile(name)
    }

    override def abort(): Unit = {
      out.close()
      fs.delete(file, false)
    }

    override def close(): Unit = ()
  }
}
