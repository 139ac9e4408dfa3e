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
  *  - the driver's [[BatchWrite.commit]] publishes a SNAPSHOT:
  *    staged files rename into the target under a version prefix
  *    (`v<N>-part-…` — a later commit or a restarted JVM reusing
  *    task ids can never clobber an earlier snapshot's files), then
  *    the versioned manifest `_MANIFEST.v<N>` appears by one atomic
  *    rename to a never-pre-existing name — THE commit point.
  *    Readers that consult manifests (the house contract, asserted
  *    in AtomicSinkSpec) see the OLD complete snapshot or the NEW
  *    complete one, never a torn mix; retained versioned manifests
  *    give plain-filesystem time travel ([[AtomicSink.committedFiles
  *    (spark, path, version)]] = `VERSION AS OF`);
  *  - [[BatchWrite.abort]] deletes the staging directory — a job that
  *    dies mid-write publishes NOTHING.
  *
  * Concurrency scope: ONE writer per target directory at a time (the
  * usual batch-pipeline contract). Two simultaneous commits could
  * race the next-version discovery; serializing writers — not
  * readers, who are always safe — is the caller's job, exactly as
  * with a plain `INSERT OVERWRITE` target.
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
    * LATEST snapshot's files, in manifest order. Resolved as the
    * highest `_MANIFEST.v<N>` — each versioned manifest appears by
    * one atomic rename to a name that never pre-exists, so this read
    * sees the old complete snapshot or the new complete one, never a
    * torn mix (Hadoop `rename` cannot atomically REPLACE, so a
    * mutable latest-pointer file could not give that guarantee).
    * Falls back to the legacy un-versioned `_MANIFEST` for
    * pre-snapshot directories. Empty if nothing was ever committed. */
  def committedFiles(spark: org.apache.spark.sql.SparkSession,
                     path: String): Seq[String] =
    versionsOf(path).lastOption match {
      case Some(v) => readManifest(path, new Path(path, s"$ManifestFile.v$v"))
      case None => readManifest(path, new Path(path, ManifestFile))
    }

  /** Time travel: the file list of snapshot `version` (1-based commit
    * order). Every commit retains the previous commits' files (its
    * own are version-prefixed, so they can never clobber), so an old
    * snapshot read is exactly the table as of that commit — the
    * plain-filesystem form of a table format's `VERSION AS OF`.
    * Empty if that version was never committed. */
  def committedFiles(spark: org.apache.spark.sql.SparkSession,
                     path: String, version: Int): Seq[String] =
    readManifest(path, new Path(path, s"$ManifestFile.v$version"))

  /** Committed snapshot versions present at `path`, ascending. */
  def versions(spark: org.apache.spark.sql.SparkSession,
               path: String): Seq[Int] = versionsOf(path)

  private[io] def versionsOf(path: String): Seq[Int] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val dir = new Path(path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$ManifestFile.v") =>
        n.stripPrefix(s"$ManifestFile.v") }
      .flatMap(s => scala.util.Try(s.toInt).toOption).sorted
  }

  private def readManifest(path: String, mf: Path): Seq[String] = {
    val fs = new Path(path).getFileSystem(new Configuration())
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
      // SNAPSHOT versioning: published names carry the commit's
      // version prefix, so no later commit (or JVM restart reusing
      // task ids) can ever clobber an earlier snapshot's files —
      // which is what makes the retained `_MANIFEST.v<N>` manifests
      // honest time-travel reads, not just pointers into mutable
      // state
      val version = AtomicSink.versionsOf(path).lastOption.getOrElse(0) + 1
      val names = messages.collect { case StagedFile(name) => name }
        .sorted.map(n => s"v$version-$n")
      messages.collect { case StagedFile(name) => name }.sorted
        .zip(names).foreach { case (from, to) =>
          f.rename(new Path(staging, from), new Path(path, to))
        }
      def writeAtomic(target: Path): Unit = {
        val tmp = new Path(path, s"_MANIFEST.tmp-$queryId")
        val out = f.create(tmp, true)
        try out.write(names.mkString("", "\n", "\n").getBytes("UTF-8"))
        finally out.close()
        f.rename(tmp, target)
      }
      // the versioned manifest's atomic rename to a NEVER-pre-existing
      // name IS the commit point (Hadoop rename cannot atomically
      // replace an existing file, so the fresh name per commit is
      // what makes the publish atomic); the legacy `_MANIFEST` view
      // is refreshed after via delete+rename — canonical readers
      // resolve the max version and never depend on it
      writeAtomic(new Path(path, s"${AtomicSink.ManifestFile}.v$version"))
      val legacy = new Path(path, AtomicSink.ManifestFile)
      f.delete(legacy, false)
      writeAtomic(legacy)
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
