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
                        properties: util.Map[String, String]): Table = {
    // the `layout` option (comma-separated field ids, set by the
    // catalog's delete-rewrite) re-attaches field ids a plain frame
    // schema lost, so the rewrite's files stay id-resolvable
    val withIds = Option(properties.get("layout")) match {
      case Some(ids) =>
        val parsed = ids.split(",").map(_.trim.toLong)
        require(parsed.length == schema.fields.length,
          s"layout has ${parsed.length} ids for ${schema.fields.length} columns")
        StructType(schema.fields.zip(parsed).map {
          case (f, id) => AtomicSink.withFieldId(f, id) })
      case None => schema
    }
    // `commitBasis` (set by the COW delete rewrite and compaction)
    // marks the write basis-dependent: its commit refuses on any
    // concurrent commit instead of retrying past it. `partids`
    // (partition field ids) keeps a rewrite's output partition-split
    // so its files republish their pruning tuples.
    val basis = Option(properties.get("commitBasis")).map(_.trim.toInt)
    val partIds = Option(properties.get("partids")).toSeq
      .flatMap(_.split(",").map(_.trim.toLong))
    // `bucketspec` ("<fieldId>,<n>") keeps a maintenance rewrite's
    // output bucket-split so its files republish their tuples
    val bucket = Option(properties.get("bucketspec")).map { v =>
      val Array(id, n) = v.split(",").map(_.trim)
      (id.toLong, n.toInt)
    }
    new AtomicSink.SinkTable(properties.get("path"), withIds,
      commitBasis = basis, partitionFieldIds = partIds,
      bucketSpec = bucket)
  }
}

object AtomicSink {

  val ManifestFile = "_MANIFEST"

  /** StructField metadata key carrying the Iceberg-style FIELD ID —
    * assigned by [[AtomicCatalog]] at CREATE (1..n) and on ADD COLUMN
    * (next unused, never reused): data files resolve columns by id
    * via the per-commit `_LAYOUT.v<N>`, which is what makes RENAME
    * and DROP COLUMN safe over immutable files. */
  private[io] val FieldIdKey = "graft.field.id"

  private[io] def fieldIdOf(
      f: org.apache.spark.sql.types.StructField): Option[Long] =
    if (f.metadata.contains(FieldIdKey))
      Some(f.metadata.getLong(FieldIdKey))
    else None

  private[io] def withFieldId(
      f: org.apache.spark.sql.types.StructField,
      id: Long): org.apache.spark.sql.types.StructField =
    f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putLong(FieldIdKey, id).build())

  /** The ordered field ids a write in `schema` order publishes, when
    * every field carries one (catalog tables); None for id-less
    * frames (plain path-based writes — their files read positionally,
    * the pre-field-id contract). */
  private[io] def layoutIdsOf(
      schema: StructType): Option[Seq[Long]] = {
    val ids = schema.fields.map(fieldIdOf)
    if (ids.nonEmpty && ids.forall(_.isDefined)) Some(ids.flatten.toSeq)
    else None
  }

  private def layoutFile(path: String, v: Int): Path =
    new Path(path, s"_LAYOUT.v$v")

  /** Ordered field ids of the data files committed at version `v`;
    * None for pre-field-id commits (positional). */
  private[io] def readLayout(path: String, v: Int): Option[Array[Long]] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val f = layoutFile(path, v)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map(_.trim.toLong).toArray)
      finally in.close()
    }
  }

  /** Per-file partition tuples of commit `v` (`_PARTS.v<N>`:
    * published name → partition cells); empty for unpartitioned
    * commits. */
  private[io] def readParts(path: String,
      v: Int): Map[String, Array[String]] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val f = new Path(path, s"_PARTS.v$v")
    if (!fs.exists(f)) Map.empty
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { line =>
          val cells = line.split("\t", -1)
          cells.head -> cells.tail
        }.toMap
      finally in.close()
    }
  }

  /** Plan-time partition-tuple resolver: one `_PARTS` read per
    * distinct commit version among `names`, memoized. Files without a
    * recorded tuple (pre-partitioning commits, unpartitioned rewrite
    * paths) are absent — they never prune. */
  private[io] def partsForFiles(path: String,
      names: Seq[String]): Map[String, Array[String]] = {
    val cache =
      scala.collection.mutable.Map[Int, Map[String, Array[String]]]()
    names.flatMap { n =>
      versionOfFile(n)
        .flatMap(v => cache.getOrElseUpdate(v, readParts(path, v)).get(n))
        .map(n -> _)
    }.toMap
  }

  /** Per-file COLUMN MIN/MAX of commit `v` (`_MINMAX.v<N>`:
    * published name → field id → (min, max) over the file's NON-NULL
    * values) — the data-skipping sidecar for predicates on
    * non-partition columns. Recorded by the task writers at write
    * time, keyed by FIELD ID so a renamed column keeps skipping.
    * Absent for pre-feature commits and id-less (bare-path) writes —
    * absence never prunes. */
  private[io] def readMinMax(path: String, v: Int)
      : Map[String, Map[Long, (String, String)]] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val f = new Path(path, s"_MINMAX.v$v")
    if (!fs.exists(f)) Map.empty
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toSeq
        .map(_.split("\t", -1))
        .collect { case Array(name, id, mn, mx) => (name, id.toLong, mn, mx) }
        .groupBy(_._1)
        .map { case (name, rows) =>
          name -> rows.map(r => r._2 -> (r._3, r._4)).toMap }
      finally in.close()
    }
  }

  /** Plan-time min/max resolver: one `_MINMAX` read per distinct
    * commit version among `names`, memoized — metadata-scale I/O
    * (like the manifest itself), never a data scan. */
  private[io] def minmaxForFiles(path: String, names: Seq[String])
      : Map[String, Map[Long, (String, String)]] = {
    val cache = scala.collection.mutable
      .Map[Int, Map[String, Map[Long, (String, String)]]]()
    names.flatMap { n =>
      versionOfFile(n)
        .flatMap(v => cache.getOrElseUpdate(v, readMinMax(path, v)).get(n))
        .map(n -> _)
    }.toMap
  }

  /** TRUE iff `f` provably matches NO value in the per-column
    * [min, max] ranges `range` serves — the file-skipping predicate.
    * Sound with nulls: the supported shapes are all null-rejecting,
    * and the ranges cover exactly the non-null values. Conservative
    * everywhere else: an unknown shape, type, or missing range never
    * prunes. */
  private[io] def rangeCannotMatch(
      f: org.apache.spark.sql.sources.Filter, schema: StructType,
      range: String => Option[(String, String)]): Boolean = {
    import org.apache.spark.sql.sources._
    // filter literal vs stored bound, compared in the COLUMN's type
    // (strings in UTF8String binary order — Spark's sort order);
    // None = not comparable, stay conservative
    def cmp(col: String, v: Any, stored: String): Option[Int] =
      schema.fields.find(_.name == col).flatMap(_.dataType match {
        case LongType => v match {
          case n: Number =>
            Some(java.lang.Long.compare(n.longValue(), stored.toLong))
          case _ => None
        }
        case DoubleType => v match {
          case n: Number =>
            val d = n.doubleValue()
            // IEEE equality first: Double.compare orders -0.0 < 0.0,
            // but the engine's predicate evaluation treats them equal —
            // without this a file whose only value is 0.0 would be
            // pruned for EqualTo(col, -0.0) (and vice versa), silently
            // dropping matching rows
            if (d.isNaN) None
            else if (d == stored.toDouble) Some(0)
            else Some(java.lang.Double.compare(d, stored.toDouble))
          case _ => None
        }
        case StringType => v match {
          case s: String => Some(
            org.apache.spark.unsafe.types.UTF8String.fromString(s)
              .compareTo(org.apache.spark.unsafe.types.UTF8String
                .fromString(stored)))
          case _ => None
        }
        case _ => None
      })
    def below(col: String, v: Any): Boolean = // v < min
      range(col).flatMap { case (mn, _) => cmp(col, v, mn) }.exists(_ < 0)
    def above(col: String, v: Any): Boolean = // v > max
      range(col).flatMap { case (_, mx) => cmp(col, v, mx) }.exists(_ > 0)
    def atMostMin(col: String, v: Any): Boolean = // v <= min
      range(col).flatMap { case (mn, _) => cmp(col, v, mn) }.exists(_ <= 0)
    def atLeastMax(col: String, v: Any): Boolean = // v >= max
      range(col).flatMap { case (_, mx) => cmp(col, v, mx) }.exists(_ >= 0)
    f match {
      case EqualTo(a, v) => below(a, v) || above(a, v)
      case EqualNullSafe(a, v) if v != null => below(a, v) || above(a, v)
      case In(a, vs) if vs != null && vs.nonEmpty =>
        // a null element never equals anything — ignorable
        vs.forall(v => v == null || below(a, v) || above(a, v))
      case GreaterThan(a, v) => atLeastMax(a, v) // none iff max <= v
      case GreaterThanOrEqual(a, v) => above(a, v) // none iff max < v
      case LessThan(a, v) => atMostMin(a, v) // none iff min >= v
      case LessThanOrEqual(a, v) => below(a, v) // none iff min > v
      case And(l, r) => rangeCannotMatch(l, schema, range) ||
        rangeCannotMatch(r, schema, range)
      case Or(l, r) => rangeCannotMatch(l, schema, range) &&
        rangeCannotMatch(r, schema, range)
      case _ => false
    }
  }

  /** Shapes [[rangeCannotMatch]] can ever act on — what the scan
    * builder accepts for stats pruning (everything stays residual
    * regardless). */
  private[io] def statsPrunable(
      f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    f match {
      case _: EqualTo | _: EqualNullSafe | _: In | _: GreaterThan |
           _: GreaterThanOrEqual | _: LessThan | _: LessThanOrEqual =>
        true
      case And(l, r) => statsPrunable(l) || statsPrunable(r)
      case Or(l, r) => statsPrunable(l) && statsPrunable(r)
      case _ => false
    }
  }

  // ---------------------------------------------------------------
  // OPTIMISTIC MULTI-WRITER COMMITS: every commit first CLAIMS its
  // version by exclusive create of `_CLAIM.v<N>` (exclusive create —
  // namenode-atomic on HDFS; on the local FS via NIO O_CREAT|O_EXCL,
  // because RawLocalFileSystem's create(overwrite=false) is a
  // non-atomic exists-then-truncate). Claim N succeeding implies manifest N-1 is
  // published (a writer only advances past a taken claim after its
  // manifest appears), so the carry-forward basis a committer reads
  // after claiming is never torn. On a claim collision:
  //  - APPEND-shaped commits (INSERT INTO / OVERWRITE / path writes)
  //    WAIT for the rival's manifest, then retry at the next version
  //    — two concurrent appends both commit, neither lost;
  //  - BASIS-DEPENDENT commits (group rewrites, merge-on-read
  //    deletes, compaction) REFUSE with a conflict error instead of
  //    publishing over a snapshot they did not compute from; they
  //    also re-check their basis version after claiming, so an
  //    append that slipped in earlier is detected too.
  // A claim whose writer died before publishing blocks later appends
  // until the stale-claim wait (graft.atomic.claimWaitMs, 60 s)
  // trips LOUDLY; `releaseClaim` removes it once the writer is known
  // dead (a claim at or below the published latest is inert).
  // ---------------------------------------------------------------

  private def tryClaim(path: String, version: Int): Boolean = {
    val claim = new Path(path, s"_CLAIM.v$version")
    val fs = claim.getFileSystem(new Configuration())
    if (fs.getScheme == "file") {
      // Hadoop's RawLocalFileSystem.create(path, overwrite=false) is a
      // non-atomic exists-then-truncate — two racing writers can both
      // "win". java.nio Files.createFile is O_CREAT|O_EXCL, genuinely
      // exclusive on the local FS.
      try {
        val p = java.nio.file.Paths.get(claim.toUri.getPath)
        // fs.create made parent dirs implicitly; NIO does not
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.createFile(p)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      // HDFS-like schemes: namenode-side create(overwrite=false) is the
      // atomic exclusive-create primitive.
      try { fs.create(claim, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  /** Claims the next commit version of `path` exclusively. `retry` =
    * append semantics (wait out a rival, take the next slot); refuse
    * semantics throw [[java.util.ConcurrentModificationException]] on
    * any collision. Returns the claimed version. */
  private[io] def claimVersion(path: String, retry: Boolean): Int = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val waitMs =
      sys.props.getOrElse("graft.atomic.claimWaitMs", "60000").toLong
    var version = versionsOf(path).lastOption.getOrElse(0) + 1
    while (!tryClaim(path, version)) {
      if (!retry) throw new java.util.ConcurrentModificationException(
        s"concurrent writer holds commit v$version of $path — this " +
          s"operation depends on the snapshot it read and cannot " +
          s"republish over a conflicting commit; re-run it")
      val mf = new Path(path, s"$ManifestFile.v$version")
      val t0 = System.nanoTime()
      while (!fs.exists(mf)) {
        if ((System.nanoTime() - t0) / 1e6 > waitMs)
          throw new IllegalStateException(
            s"commit v$version of $path is claimed but never " +
              s"published (writer died?) — appends cannot proceed; " +
              s"releaseClaim($path, $version) once the writer is " +
              s"known dead")
        Thread.sleep(20)
      }
      version += 1
    }
    version
  }

  /** Removes a stale claim (a crashed writer's `_CLAIM.v<k>` with no
    * manifest). Only for operator use once the writer is known dead. */
  def releaseClaim(path: String, version: Int): Boolean = {
    val fs = new Path(path).getFileSystem(new Configuration())
    require(!fs.exists(new Path(path, s"$ManifestFile.v$version")),
      s"v$version is published — its claim is inert, not stale")
    fs.delete(new Path(path, s"_CLAIM.v$version"), false)
  }

  /** v2 `Predicate` → v1 `Filter`, total over the shapes an
    * overwrite-by-filter pushes (single-column-vs-literal comparisons
    * and boolean combinations); None for anything else — the caller
    * refuses the overwrite rather than guessing. */
  private[io] def v2ToV1(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
    def ref(e: Expression): Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    def lit(e: Expression): Option[Any] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        Some(l.value() match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case other => other
        })
      case _ => None
    }
    def colLit(op: (String, Any) => Filter): Option[Filter] =
      p.children() match {
        case Array(a, v) => for (c <- ref(a); l <- lit(v)) yield op(c, l)
        case _ => None
      }
    def sub(e: Expression): Option[Filter] = e match {
      case q: org.apache.spark.sql.connector.expressions.filter.Predicate =>
        v2ToV1(q)
      case _ => None
    }
    p.name() match {
      case "ALWAYS_TRUE" => Some(AlwaysTrue())
      case "ALWAYS_FALSE" => Some(AlwaysFalse())
      case "=" => colLit(EqualTo)
      case "<=>" => colLit(EqualNullSafe)
      case ">" => colLit(GreaterThan)
      case ">=" => colLit(GreaterThanOrEqual)
      case "<" => colLit(LessThan)
      case "<=" => colLit(LessThanOrEqual)
      case "IN" => p.children() match {
        case c if c.length >= 2 =>
          for (a <- ref(c(0));
               vs <- Some(c.drop(1).map(lit))
               if vs.forall(_.isDefined))
            yield In(a, vs.flatten)
        case _ => None
      }
      case "IS_NULL" => p.children() match {
        case Array(e) => ref(e).map(IsNull(_)); case _ => None }
      case "IS_NOT_NULL" => p.children() match {
        case Array(e) => ref(e).map(IsNotNull(_)); case _ => None }
      case "AND" => p.children() match {
        case Array(l, r) => for (a <- sub(l); b <- sub(r)) yield And(a, b)
        case _ => None
      }
      case "OR" => p.children() match {
        case Array(l, r) => for (a <- sub(l); b <- sub(r)) yield Or(a, b)
        case _ => None
      }
      case "NOT" => p.children() match {
        case Array(c) => sub(c).map(Not(_)); case _ => None }
      case _ => None
    }
  }

  /** How a commit decides which CURRENT files it replaces (the
    * partition-aware `INSERT OVERWRITE` faces): by a pushed
    * partition predicate (static `PARTITION (g=3)`), or by the
    * partition tuples present in the INCOMING data (dynamic
    * partition overwrite — the Hive `partitionOverwriteMode=dynamic`
    * contract). Resolved inside the commit, after the claim. */
  private[io] sealed trait OverwriteMode
  private[io] case class StaticOverwrite(
      filters: Seq[org.apache.spark.sql.sources.Filter]) extends OverwriteMode
  private[io] case object DynamicOverwrite extends OverwriteMode

  private val FileVersionRe = "^v(\\d+)-".r

  private[io] def versionOfFile(name: String): Option[Int] =
    FileVersionRe.findFirstMatchIn(name).map(_.group(1).toInt)

  /** Column resolution of one data file against the target schema:
    * `idxMap(i)` = the file cell index serving schema field i, or -1
    * (field absent from the file → NULL). Files WITH a recorded
    * layout resolve by field id. Files WITHOUT one (path-based
    * writes, pre-field-id history) read positionally — and because
    * the catalog assigns legacy ids positionally (1..n), "cell k-1
    * holds field id k" extends positional reading correctly even
    * after later RENAME/DROP. */
  private[io] def idxMapFor(schema: StructType,
      layout: Option[Array[Long]]): Array[Int] =
    layout match {
      case Some(l) => schema.fields.map(f =>
        fieldIdOf(f).map(id => l.indexOf(id)).getOrElse(-1))
      case None => schema.fields.zipWithIndex.map { case (f, i) =>
        fieldIdOf(f).map(id => (id - 1L).toInt).getOrElse(i)
      }
    }

  /** Plan-time resolver: one layout read per distinct commit version
    * among `names`, memoized. */
  private[io] def idxMapsFor(path: String, names: Seq[String],
      schema: StructType): Map[String, Array[Int]] = {
    val layoutCache = scala.collection.mutable.Map[Int, Option[Array[Long]]]()
    names.map { n =>
      val layout = versionOfFile(n)
        .flatMap(v => layoutCache.getOrElseUpdate(v, readLayout(path, v)))
      n -> idxMapFor(schema, layout)
    }.toMap
  }

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
      // an EMPTY commit (e.g. a whole-partition delete's zero
      // survivors under the lazy partitioned writer) serializes as a
      // bare newline — drop blank lines, they are not file names
      try scala.io.Source.fromInputStream(in).getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** The snapshot table: atomic versioned writes (always), plus —
    * when reached through [[AtomicCatalog]] with a declared schema —
    * snapshot reads (latest or `pinnedVersion` = `VERSION AS OF`) and
    * copy-on-write row-level DELETE. `pinnedVersion = Some(v)` reads
    * snapshot v and refuses writes (writing "into the past" would
    * fork history). */
  /** Append semantics differ by entry point, each pinned by its own
    * spec: the PATH-based writer (`format("graft.io.AtomicSink")`)
    * publishes each commit as a complete REPLACEMENT snapshot (the
    * original contract — v2 is the second write's rows), while a
    * CATALOG table (`accumulateAppends = true`) gives SQL semantics:
    * `INSERT INTO` carries the previous snapshot's files forward into
    * the new manifest (a metadata-only append — nothing is
    * rewritten), `INSERT OVERWRITE` truncates via `SupportsTruncate`.
    */
  /** `changelog = true` is the CHANGES face ([[AtomicCatalog]] serves
    * it as the virtual `<table>__changes` sub-table, the Iceberg
    * `.changes` shape): schema gains `_change_type`/`_commit_version`,
    * reads are streaming-only op-typed feeds, writes are refused. */
  private[io] class SinkTable(path: String, schema: StructType,
      pinnedVersion: Option[Int] = None,
      accumulateAppends: Boolean = false,
      changelog: Boolean = false,
      partitionFieldIds: Seq[Long] = Seq.empty,
      commitBasis: Option[Int] = None,
      bucketSpec: Option[(Long, Int)] = None)
      extends Table with SupportsWrite
      with org.apache.spark.sql.connector.catalog.SupportsRead
      with org.apache.spark.sql.connector.catalog.SupportsDelete
      with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
      with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

    /** `_file` — the manifest-listed file serving the row (the
      * Iceberg metadata-column shape). Present only when a query
      * names it; doubles as [[GroupRewriteOperation]]'s required
      * metadata attribute, which is what routes group-based rewrites
      * through Spark's projecting write task (with no metadata
      * attribute, ReplaceDataExec hands the writer RAW rows still
      * carrying the planner's `__row_operation` column). */
    override def metadataColumns()
        : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
      Array(
        new org.apache.spark.sql.connector.catalog.MetadataColumn {
          override def name(): String = "_file"
          override def dataType(): org.apache.spark.sql.types.DataType =
            StringType
          override def isNullable: Boolean = false
          override def comment(): String =
            "manifest-listed data file serving the row"
        },
        // `_row`: the row's canonical raw encoding (current-schema
        // cell order, "" = NULL, tab-joined) — NON-NULL by
        // construction, which is what lets it serve as the delta
        // operation's row id (Spark refuses nullable row-id attrs)
        new org.apache.spark.sql.connector.catalog.MetadataColumn {
          override def name(): String = "_row"
          override def dataType(): org.apache.spark.sql.types.DataType =
            StringType
          override def isNullable: Boolean = false
          override def comment(): String =
            "canonical raw row encoding (equality-delete key)"
        })
    override def name(): String =
      s"atomic($path${pinnedVersion.map(v => s"@v$v").getOrElse("")}" +
        s"${if (changelog) "#changes" else ""})"
    override def schema(): StructType =
      if (changelog) changelogSchema(schema) else schema

    /** CURRENT names of the identity partition columns (spec is by
      * field id, so a renamed partition column keeps partitioning). */
    private def partitionColNames: Seq[String] =
      partitionFieldIds.flatMap(id =>
        schema.fields.find(f => AtomicSink.fieldIdOf(f).contains(id))
          .map(_.name))

    /** CURRENT name of the bucket column (spec by field id, like
      * identity partitions — rename-proof). */
    private def bucketColName: Option[String] =
      bucketSpec.flatMap { case (id, _) =>
        schema.fields.find(f => AtomicSink.fieldIdOf(f).contains(id))
          .map(_.name) }

    override def partitioning(): Array[Transform] =
      bucketSpec match {
        case Some((_, n)) =>
          bucketColName.toArray.map(c =>
            org.apache.spark.sql.connector.expressions.Expressions
              .bucket(n, c): Transform)
        case None =>
          partitionColNames.map(n =>
            org.apache.spark.sql.connector.expressions.Expressions
              .identity(n)).toArray
      }
    override def capabilities(): util.Set[TableCapability] = {
      val caps = util.EnumSet.of(TableCapability.BATCH_WRITE,
        TableCapability.BATCH_READ,
        TableCapability.TRUNCATE,
        TableCapability.MICRO_BATCH_READ)
      // partition-aware overwrites exist only for partitioned catalog
      // tables — advertising them elsewhere would trade the analyzer's
      // clean capability error for a builder-time refusal
      if (accumulateAppends && partitionFieldIds.nonEmpty) {
        caps.add(TableCapability.OVERWRITE_BY_FILTER)
        caps.add(TableCapability.OVERWRITE_DYNAMIC)
      }
      // `df.writeStream.toTable("gtab.t")` — epoch-idempotent appends
      // through the same two-phase commit; catalog tables only (the
      // bare-path SinkTable's non-accumulating overwrite semantics
      // make no sense as a stream)
      if (accumulateAppends) caps.add(TableCapability.STREAMING_WRITE)
      caps
    }
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      require(pinnedVersion.isEmpty,
        "cannot write to a VERSION AS OF snapshot")
      require(!changelog, "the __changes sub-table is read-only")
      new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsOverwriteV2
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
        private var truncated = false
        private var overwriteMode: Option[AtomicSink.OverwriteMode] = None
        override def truncate(): WriteBuilder = { truncated = true; this }

        /** Static partition overwrite (`INSERT OVERWRITE … PARTITION
          * (g = 3)`): accepted iff the table is partitioned and every
          * predicate translates and references ONLY partition columns
          * — then the commit replaces exactly the files whose tuple
          * satisfies it and carries the rest by reference. Anything
          * wider refuses (canOverwrite = false → Spark raises the
          * unsupported-expression error), and a plain overwrite still
          * lands on [[truncate]]. */
        override def canOverwrite(
            predicates: Array[org.apache.spark.sql.connector
              .expressions.filter.Predicate]): Boolean =
          accumulateAppends && partitionFieldIds.nonEmpty && {
            val v1 = predicates.map(AtomicSink.v2ToV1)
            v1.forall(_.isDefined) && v1.flatten.forall(
              _.references.forall(partitionColNames.contains))
          }
        override def overwrite(
            predicates: Array[org.apache.spark.sql.connector
              .expressions.filter.Predicate]): WriteBuilder = {
          require(canOverwrite(predicates),
            "overwrite-by-filter requires a PARTITIONED BY table and " +
              "partition-column predicates")
          overwriteMode = Some(AtomicSink.StaticOverwrite(
            predicates.flatMap(AtomicSink.v2ToV1).toSeq))
          this
        }

        /** Dynamic partition overwrite
          * (`spark.sql.sources.partitionOverwriteMode=dynamic`): the
          * commit replaces exactly the partitions PRESENT in the
          * incoming rows — the backfill idiom at 100 TB. */
        override def overwriteDynamicPartitions(): WriteBuilder = {
          require(accumulateAppends && partitionFieldIds.nonEmpty,
            "dynamic partition overwrite requires a catalog table " +
              "with PARTITIONED BY")
          overwriteMode = Some(AtomicSink.DynamicOverwrite)
          this
        }

        override def build(): Write = {
          def batch(): BatchWrite = {
            val wasTruncated = truncated
            // resolved AT COMMIT TIME (the file lists below are
            // functions): an INSERT OVERWRITE deletes every prior
            // row — its CDC sidecar lists the PREVIOUS snapshot's
            // files as the delete image, no copying (the files are
            // immutable; a VACUUM that removes them also trips the
            // feed's expiration guard first)
            val carry = () =>
              if (accumulateAppends && !wasTruncated) committedFilesOf(path)
              else Seq.empty
            val truncPrev = () =>
              if (accumulateAppends && wasTruncated) committedFilesOf(path)
              else Seq.empty
            // the table's OWN schema carries the field ids (Spark
            // reconciles every INSERT to it), so the commit can
            // publish the layout its files were written in
            new AtomicBatchWrite(path, info.queryId(), info.schema(),
              carry, AtomicSink.layoutIdsOf(schema), truncPrev,
              bucketColName match {
                case Some(c) => Array(info.schema().fieldIndex(c))
                case None =>
                  partitionColNames.map(info.schema().fieldIndex).toArray
              },
              // a write carrying an explicit basis (COW delete
              // rewrite, compaction) is basis-dependent: refuse on
              // conflict instead of retrying past it
              conflictRetry = commitBasis.isEmpty,
              expectedBasis = () => commitBasis,
              overwriteMode = overwriteMode,
              partNames = partitionColNames,
              bucketN = bucketSpec.map(_._2).getOrElse(0))
          }
          // `writeStream.toTable`: one two-phase commit per non-empty
          // epoch, keyed by (streaming query id, epoch id) so a
          // restart's replayed epoch publishes NOTHING twice
          def streaming(): org.apache.spark.sql.connector.write
              .streaming.StreamingWrite =
            new AtomicSink.AtomicStreamingWrite(path, info.queryId(),
              info.schema(), AtomicSink.layoutIdsOf(schema),
              bucketColName match {
                case Some(c) => Array(info.schema().fieldIndex(c))
                case None =>
                  partitionColNames.map(info.schema().fieldIndex).toArray
              },
              partitionColNames, truncateEachEpoch = truncated,
              bucketN = bucketSpec.map(_._2).getOrElse(0))
          if (partitionFieldIds.isEmpty && bucketSpec.isEmpty)
            new Write {
              override def toBatch: BatchWrite = batch()
              override def toStreaming: org.apache.spark.sql.connector
                .write.streaming.StreamingWrite = streaming()
            }
          else
            // PARTITIONED/BUCKETED table: ask Spark to CLUSTER
            // incoming rows by the partition columns — or the bucket
            // column (same bucket ⇒ same task ⇒ whole buckets per
            // task) — so the per-partition file split below never
            // fans one task out into hundreds of small files
            new Write with org.apache.spark.sql.connector.write
              .RequiresDistributionAndOrdering {
              override def requiredDistribution()
                  : org.apache.spark.sql.connector.distributions.Distribution =
                org.apache.spark.sql.connector.distributions.Distributions
                  .clustered(
                    (bucketColName.map(Seq(_)).getOrElse(partitionColNames))
                      .map(n =>
                        org.apache.spark.sql.connector.expressions
                          .Expressions.column(n): org.apache.spark.sql
                          .connector.expressions.Expression).toArray)
              override def requiredOrdering()
                  : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
                Array.empty
              override def toBatch: BatchWrite = batch()
              override def toStreaming: org.apache.spark.sql.connector
                .write.streaming.StreamingWrite = streaming()
            }
        }
      }
    }

    override def newScanBuilder(
        options: CaseInsensitiveStringMap)
        : org.apache.spark.sql.connector.read.ScanBuilder =
      new TsvScanBuilder(path, schema, pinnedVersion, changelog,
        failOnDataLoss = options.getBoolean("failOnDataLoss", true),
        partitionCols = partitionColNames,
        bucketSpec = bucketSpec.flatMap { case (_, n) =>
          bucketColName.map((_, n)) })

    /** SQL `UPDATE` / `MERGE INTO` (and non-translatable `DELETE`
      * predicates) — the GROUP-BASED row-level operation, Iceberg's
      * copy-on-write shape: Spark's RewriteUpdateTable /
      * RewriteMergeIntoTable rewrite the command into a ReplaceData
      * plan that reads the current snapshot through this operation's
      * scan, computes the merged rows with ordinary joins/projections
      * (all Catalyst — the MERGE arms never leave the optimizer), and
      * writes the FULL new state back through its write. With no
      * runtime group filter the group is the whole table, so the
      * write commits as ONE REPLACEMENT snapshot through the same
      * two-phase protocol as every other commit — time travel to the
      * pre-merge state is free, and the changelog face records the
      * commit like an overwrite (old snapshot = delete image by
      * reference, fresh files = inserts), which keeps replay equality
      * exact. Simple DELETEs do NOT land here:
      * OptimizeMetadataOnlyDeleteFromTable converts them back to
      * [[deleteWhere]] (manifest-only under MOR mode) whenever the
      * predicate is pushable. */
    override def newRowLevelOperationBuilder(
        info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
        : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
      require(pinnedVersion.isEmpty,
        "cannot mutate a VERSION AS OF snapshot")
      require(!changelog, "the __changes sub-table is read-only")
      () => {
        // `spark.graft.atomic.dmlMode = mor` switches MERGE/UPDATE
        // (and non-pushable DELETEs) from the copy-on-write group
        // rewrite to the delta shape: equality-deletes + appends in
        // one commit, cost ∝ changed rows — the honest MERGE when
        // matches smear across most files
        val mor = org.apache.spark.sql.SparkSession.active.conf
          .getOption("spark.graft.atomic.dmlMode").contains("mor")
        val bucket = bucketSpec.flatMap { case (_, n) =>
          bucketColName.map((_, n)) }
        if (mor)
          new DeltaRowLevelOperation(path, schema, info.command(),
            partitionColNames, bucket)
        else new GroupRewriteOperation(path, schema, info.command(),
          partitionColNames, bucket)
      }
    }

    /** Row-level DELETE — copy-on-write at snapshot granularity: the
      * survivors of the latest snapshot rewrite through the SAME
      * two-phase commit as any write, so the delete IS a new version
      * and every older `VERSION AS OF` read stays intact. The rewrite
      * is a distributed filter job (never a driver loop); any
      * predicate Spark pushed as v1 `Filter`s is accepted because the
      * translation back to a `Column` is total over the pushable
      * shapes. SQL null semantics: rows where the condition is NULL
      * are kept (DELETE removes only condition-TRUE rows). */
    override def canDeleteWhere(
        filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
      pinnedVersion.isEmpty && !changelog &&
        scala.util.Try(AtomicSink.filtersToColumn(filters)).isSuccess

    override def deleteWhere(
        filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
      val spark = org.apache.spark.sql.SparkSession.active
      val cond = AtomicSink.filtersToColumn(filters)
      // the snapshot version this DELETE computes from — its commit
      // refuses if a concurrent writer moved the table past it
      val basis = AtomicSink.versionsOf(path).lastOption.getOrElse(0)
      val snap = AtomicSink.readSnapshot(spark, path, schema, None)
      val hit = org.apache.spark.sql.functions
        .coalesce(cond, org.apache.spark.sql.functions.lit(false))
      val layoutOpt = AtomicSink.layoutIdsOf(schema)
      // MERGE-ON-READ (`spark.graft.atomic.deleteMode = mor`): publish
      // the PREDICATE as a manifest-only commit instead of rewriting
      // every surviving row — the only honest DELETE cost at 100 TB.
      // Readers apply it to files older than the delete's commit;
      // the CDC sidecar (the deleted rows' pre-image) is the same as
      // the copy-on-write path's. Requires field ids (catalog
      // tables), because the predicate must survive later renames.
      // a predicate `canDeleteWhere` accepted (filtersToColumn is
      // total over the pushed shapes) but whose JSON serialization is
      // not (an exotic literal type) falls back to the copy-on-write
      // rewrite below rather than failing a DELETE Spark already
      // committed to row-level handling
      val one = filters.toSeq
        .reduceOption(org.apache.spark.sql.sources.And(_, _))
        .getOrElse(org.apache.spark.sql.sources.AlwaysTrue())
      if (spark.conf.getOption("spark.graft.atomic.deleteMode")
          .contains("mor") &&
          scala.util.Try(AtomicSink.filterToJson(one)).isSuccess) {
        val colsToIds = schema.fields
          .flatMap(f => AtomicSink.fieldIdOf(f).map(f.name -> _)).toMap
        require(colsToIds.size == schema.fields.length,
          "merge-on-read DELETE requires a catalog table (field ids)")
        val k = AtomicSink.publishDeleteCommit(path, colsToIds, one,
          layoutOpt, basis = Some(basis))
        AtomicSink.writeCdcSidecar(spark, path, k, snap.filter(hit),
          layoutOpt)
        return
      }
      // PARTITION-SCOPED copy-on-write: only files whose recorded
      // partition tuple can hold a condition-TRUE row are rewritten
      // (a conjunct referencing only partition columns that is not
      // TRUE on a file's tuple is not TRUE on any of its rows); every
      // other file carries forward BY REFERENCE — a partition-scoped
      // DELETE rewrites only the touched partitions, not the table.
      val all = AtomicSink.committedFilesOf(path)
      val partCols = partitionColNames
      val partAffected: Set[String] =
        if (partCols.isEmpty) all.toSet
        else {
          val tuples = AtomicSink.partsForFiles(path, all)
          val partOnly = filters.filter(f => f.references.nonEmpty &&
            f.references.forall(partCols.contains))
          val types = partCols.map(n =>
            schema.fields(schema.fieldIndex(n)).dataType)
          def cellOf(cells: Array[String])(name: String): Any = {
            val i = partCols.indexOf(name)
            val s = if (i >= 0 && i < cells.length) cells(i) else ""
            if (s.isEmpty) null
            else types(i) match {
              case org.apache.spark.sql.types.LongType => s.toLong
              case org.apache.spark.sql.types.DoubleType => s.toDouble
              case _ => s
            }
          }
          all.filter { n =>
            tuples.get(n) match {
              case None => true // unknown tuple: conservatively rewrite
              case Some(cells) => partOnly.forall(f =>
                scala.util.Try(AtomicSink.evalFilter(f, cellOf(cells)))
                  .getOrElse(Some(true)).contains(true))
            }
          }.toSet
        }
      // MIN/MAX narrowing (unpartitioned tables' only scope cut): a
      // file whose recorded bounds prove NO row satisfies some pushed
      // conjunct holds nothing to delete — it carries by reference
      // instead of being rewritten. Conservative: missing sidecars or
      // non-range shapes rewrite as before.
      val affected: Set[String] = {
        val mm = AtomicSink.minmaxForFiles(path, partAffected.toSeq)
        partAffected.filterNot { n =>
          mm.get(n).exists { byId =>
            val range = (col: String) => schema.fields.find(_.name == col)
              .flatMap(AtomicSink.fieldIdOf).flatMap(byId.get)
            filters.exists(f => scala.util.Try(
              AtomicSink.rangeCannotMatch(f, schema, range))
              .getOrElse(false))
          }
        }
      }
      // CHANGELOG sidecar (both arms): the deleted rows publish as
      // `v<k>-cdc-*` files listed in `_CDC.v<k>`, making the feed's
      // changelog face op-typed instead of replaying survivor
      // rewrites as inserts. Written AFTER the commit point in the
      // same driver call — a crash between the two leaves a correct
      // table whose changelog lacks this delete's rows (stated
      // window; the data itself is never at risk).
      if (affected.size == all.size) {
        // every file may hold matches — the classic full rewrite
        val w = snap.filter(!hit).write.format("graft.io.AtomicSink")
          .option("path", path).mode("append")
          .option("commitBasis", basis.toString)
        // the rewrite's files must stay FIELD-ID resolvable:
        // re-attach the table's layout (a filtered frame's schema
        // lost the ids)
        layoutOpt.foreach(ids => w.option("layout", ids.mkString(",")))
        if (partitionFieldIds.nonEmpty)
          w.option("partids", partitionFieldIds.mkString(","))
        w.save()
        val k = AtomicSink.versionsOf(path).last
        AtomicSink.writeCdcSidecar(spark, path, k, snap.filter(hit),
          layoutOpt)
      } else {
        // partial rewrite: survivors of the AFFECTED files land in an
        // atomic work dir, then one manual commit publishes
        // keep-by-reference + fresh (claim/basis discipline inside)
        val snapAff = AtomicSink.readSnapshot(spark, path, schema, None,
          Some(affected))
        val work = s"$path/_rwwork-${java.util.UUID.randomUUID()}"
        val w = snapAff.filter(!hit).write.format("graft.io.AtomicSink")
          .option("path", work).mode("append")
        layoutOpt.foreach(ids => w.option("layout", ids.mkString(",")))
        if (partitionFieldIds.nonEmpty)
          w.option("partids", partitionFieldIds.mkString(","))
        w.save()
        val k = AtomicSink.publishRewriteCommit(path,
          all.filterNot(affected), work, layoutOpt, Some(basis))
        AtomicSink.writeCdcSidecar(spark, path, k, snapAff.filter(hit),
          layoutOpt)
      }
    }
  }

  private[io] def committedFilesOf(path: String): Seq[String] =
    versionsOf(path).lastOption match {
      case Some(v) => readManifestOf(path, v)
      case None => Seq.empty
    }

  private[io] def readManifestOf(path: String, v: Int): Seq[String] =
    readManifest(path, new Path(path, s"$ManifestFile.v$v"))

  /** Snapshot expiration (VACUUM): keep the newest `keepLast`
    * versions, delete older manifests, then delete every data file no
    * RETAINED manifest references. Because catalog appends carry
    * files forward, an old commit's files survive as long as any live
    * snapshot still lists them — only truly unreachable files (e.g. a
    * copy-on-write DELETE's pre-image after its snapshot expires) are
    * removed. Same single-writer scope as commits; readers of
    * retained versions are unaffected (their manifests and files are
    * untouched). Returns (versions kept, files deleted). */
  def expireSnapshots(path: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val fs = new Path(path).getFileSystem(new Configuration())
    val vs = versionsOf(path)
    val keep = vs.takeRight(keepLast)
    val drop = vs.dropRight(keepLast)
    // a retained version keeps its manifest-listed files AND its CDC
    // change files; dropped versions lose manifest, layout, CDC list
    // and every file no retained reference holds
    val keepFiles = keep.flatMap(v => readManifestOf(path, v)).toSet ++
      keep.flatMap(v => cdcFilesOf(path, v).map(_._2).getOrElse(Seq.empty))
    drop.foreach { v =>
      fs.delete(new Path(path, s"$ManifestFile.v$v"), false)
      fs.delete(new Path(path, s"_CDC.v$v"), false)
      fs.delete(new Path(path, s"_CLAIM.v$v"), false) // inert once published
      // `_EPOCH.v<v>` is RETAINED like `_LAYOUT` (one short line): if
      // later commits push a stream's last-epoch version out of
      // keepLast during the crash window between sink commit and the
      // engine's commit-log write, the restarted stream replays that
      // epoch — epochCommitted must still find the marker or the epoch
      // would publish twice (duplicate rows)
      // `_LAYOUT.v<v>` is NEVER deleted: carried-forward files of an
      // expired commit can still sit in retained manifests, and they
      // resolve their field-id layout through it (one short line)
    }
    // merge-on-read reclamation: a `_DELETES.v<k>` can only affect a
    // retained read through manifest files OLDER than k (its eqdel
    // pre-images / predicate hide rows of files written before the
    // delete). Once compaction + expiry leave no retained file with
    // version < k, the spec is unreachable — drop the eqfiles sidecar
    // so its `v<k>-eqdel-*` pre-image files fall to the sweep below.
    val minCarriedVer = keepFiles.flatMap(versionOfFile).minOption
    val (deadEq, liveEq) = eqDeleteSpecs(path)
      .partition { case (k, _, _) => !minCarriedVer.exists(_ < k) }
    deadEq.foreach { case (k, _, _) =>
      fs.delete(new Path(path, s"_DELETES.v$k"), false) }
    val liveEqFiles = liveEq.flatMap(_._3).toSet
    val dataName = "^v\\d+-((cdc-)?part|eqdel)-.*".r
    val removed = fs.listStatus(new Path(path)).toSeq
      .map(_.getPath.getName)
      .filter(n => dataName.pattern.matcher(n).matches()
        && !keepFiles.contains(n) && !liveEqFiles.contains(n))
    removed.foreach(n => fs.delete(new Path(path, n), false))
    (keep.size, removed.size)
  }

  /** `_CDC.v<k>`: (freshMode, delete-image files), or None when
    * commit `k` recorded no change sidecar (plain appends). The first
    * line is a directive for the commit's FRESH manifest files:
    * `!fresh=skip` (a row-level DELETE — fresh files are survivor
    * REWRITES, not changes) or `!fresh=insert` (an INSERT OVERWRITE —
    * fresh files are real inserts next to the old snapshot's
    * deletes); remaining lines are the delete-image file names. */
  private[io] def cdcFilesOf(path: String,
      v: Int): Option[(String, Seq[String])] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val f = new Path(path, s"_CDC.v$v")
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      val mode = lines.headOption match {
        case Some("!fresh=insert") => "insert"
        case _ => "skip"
      }
      Some((mode, lines.filterNot(_.startsWith("!"))))
    }
  }

  private def writeCdcList(path: String, k: Int, freshMode: String,
      files: Seq[String]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val tmp = new Path(path, s"_CDC.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write((s"!fresh=$freshMode" +: files)
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new Path(path, s"_CDC.v$k"))
  }

  /** Publishes `rows` as commit `k`'s DELETE change files: an
    * executor-side atomic write into a work dir (the same two-phase
    * sink — nothing partial ever surfaces), then a driver rename of
    * each committed file to `v<k>-cdc-part-…` and one atomic rename
    * publishing `_CDC.v<k>`. The rows share commit `k`'s layout
    * (`_LAYOUT.v<k>`, written by the survivors' commit). */
  private[io] def writeCdcSidecar(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int, rows: org.apache.spark.sql.DataFrame,
      layout: Option[Seq[Long]]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val work = s"$path/_cdcwork-${java.util.UUID.randomUUID()}"
    val w = rows.write.format("graft.io.AtomicSink")
      .option("path", work).mode("append")
    layout.foreach(ids => w.option("layout", ids.mkString(",")))
    w.save()
    val staged = committedFilesOf(work)
    val published = staged.map { n =>
      // the work dir's files are v1-part-…; republish under the REAL
      // commit's version so expiration and layout resolution see k
      val name = s"v$k-cdc-part-" + n.stripPrefix("v1-part-")
      fs.rename(new Path(work, n), new Path(path, name))
      name
    }
    writeCdcList(path, k, "skip", published)
    fs.delete(new Path(work), true)
  }

  // ---------------------------------------------------------------
  // MERGE-ON-READ deletes: a DELETE can publish a PREDICATE
  // (`_DELETES.v<k>`, JSON) instead of rewriting the table — the
  // copy-on-write path rewrites every surviving row, which is the
  // wrong cost at 100 TB. A delete at version k applies to rows in
  // files whose own commit version is < k (later inserts of identical
  // rows are untouched), and readers scope application to deletes
  // ≤ the version being read — which makes time travel exact and a
  // crash between `_DELETES` and the manifest invisible (readers
  // never apply a delete whose manifest did not commit).
  // ---------------------------------------------------------------

  private def jmapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** v1 Filter → JSON tree (total over the [[filtersToColumn]] shapes;
    * values are tagged long/double/string so deserialization restores
    * exact types). */
  private[io] def filterToJson(f: org.apache.spark.sql.sources.Filter): String = {
    import org.apache.spark.sql.sources._
    def vNode(v: Any): java.util.Map[String, Object] = {
      val m = new java.util.LinkedHashMap[String, Object]()
      v match {
        // NULL first: a pushed `c <=> NULL` arrives as
        // EqualNullSafe(c, null) and `other.getClass` would NPE
        case null => m.put("t", "null")
        case l: Long => m.put("t", "long"); m.put("v", Long.box(l))
        case i: Int => m.put("t", "long"); m.put("v", Long.box(i.toLong))
        case s: Short => m.put("t", "long"); m.put("v", Long.box(s.toLong))
        case b: Byte => m.put("t", "long"); m.put("v", Long.box(b.toLong))
        case d: Double => m.put("t", "double"); m.put("v", Double.box(d))
        case fl: Float => m.put("t", "double"); m.put("v", Double.box(fl.toDouble))
        case s: String => m.put("t", "string"); m.put("v", s)
        case u: org.apache.spark.unsafe.types.UTF8String =>
          m.put("t", "string"); m.put("v", u.toString)
        case other => throw new IllegalArgumentException(
          s"unsupported DELETE literal type: ${other.getClass} — " +
            s"AtomicSink columns are long/double/string")
      }
      m
    }
    def node(f: Filter): java.util.Map[String, Object] = {
      val m = new java.util.LinkedHashMap[String, Object]()
      def lit(op: String, a: String, v: Any): Unit = {
        m.put("op", op); m.put("col", a); m.put("val", vNode(v))
      }
      f match {
        case EqualTo(a, v) => lit("eq", a, v)
        case EqualNullSafe(a, v) => lit("eqns", a, v)
        case GreaterThan(a, v) => lit("gt", a, v)
        case GreaterThanOrEqual(a, v) => lit("ge", a, v)
        case LessThan(a, v) => lit("lt", a, v)
        case LessThanOrEqual(a, v) => lit("le", a, v)
        case In(a, vs) =>
          m.put("op", "in"); m.put("col", a)
          val arr = new java.util.ArrayList[Object]()
          vs.foreach(v => arr.add(vNode(v)))
          m.put("vals", arr)
        case IsNull(a) => m.put("op", "isnull"); m.put("col", a)
        case IsNotNull(a) => m.put("op", "isnotnull"); m.put("col", a)
        case And(l, r) =>
          m.put("op", "and"); m.put("l", node(l)); m.put("r", node(r))
        case Or(l, r) =>
          m.put("op", "or"); m.put("l", node(l)); m.put("r", node(r))
        case Not(c) => m.put("op", "not"); m.put("c", node(c))
        case StringStartsWith(a, v) => lit("startswith", a, v)
        case StringEndsWith(a, v) => lit("endswith", a, v)
        case StringContains(a, v) => lit("contains", a, v)
        case AlwaysTrue() => m.put("op", "true")
        case AlwaysFalse() => m.put("op", "false")
        case other => throw new IllegalArgumentException(
          s"unsupported DELETE predicate: $other")
      }
      m
    }
    jmapper.writeValueAsString(node(f))
  }

  private[io] def filterFromJson(
      s: String): org.apache.spark.sql.sources.Filter = {
    import org.apache.spark.sql.sources._
    val root = jmapper.readTree(s)
    def value(n: com.fasterxml.jackson.databind.JsonNode): Any =
      n.get("t").asText() match {
        case "null" => null
        case "long" => n.get("v").asLong()
        case "double" => n.get("v").asDouble()
        case "string" => n.get("v").asText()
      }
    def node(n: com.fasterxml.jackson.databind.JsonNode): Filter = {
      def col = n.get("col").asText()
      n.get("op").asText() match {
        case "eq" => EqualTo(col, value(n.get("val")))
        case "eqns" => EqualNullSafe(col, value(n.get("val")))
        case "gt" => GreaterThan(col, value(n.get("val")))
        case "ge" => GreaterThanOrEqual(col, value(n.get("val")))
        case "lt" => LessThan(col, value(n.get("val")))
        case "le" => LessThanOrEqual(col, value(n.get("val")))
        case "in" =>
          val it = n.get("vals").elements()
          val vs = scala.collection.mutable.ArrayBuffer[Any]()
          while (it.hasNext) vs += value(it.next())
          In(col, vs.toArray)
        case "isnull" => IsNull(col)
        case "isnotnull" => IsNotNull(col)
        case "and" => And(node(n.get("l")), node(n.get("r")))
        case "or" => Or(node(n.get("l")), node(n.get("r")))
        case "not" => Not(node(n.get("c")))
        case "startswith" => StringStartsWith(col, value(n.get("val")).toString)
        case "endswith" => StringEndsWith(col, value(n.get("val")).toString)
        case "contains" => StringContains(col, value(n.get("val")).toString)
        case "true" => AlwaysTrue()
        case "false" => AlwaysFalse()
      }
    }
    node(root)
  }

  /** SQL three-valued evaluation of a pushed filter against one
    * decoded TSV row (cells are Long / Double / String / null): Some
    * (true/false) or None = UNKNOWN. DELETE keeps every row whose
    * condition is not TRUE, exactly the [[SinkTable.deleteWhere]]
    * `coalesce(cond, false)` semantics. */
  private[io] def evalFilter(f: org.apache.spark.sql.sources.Filter,
      cell: String => Any): Option[Boolean] = {
    import org.apache.spark.sql.sources._
    def cmp(a: String, v: Any): Option[Int] = {
      val c = cell(a)
      if (c == null || v == null) None // comparison with NULL = UNKNOWN
      else Some((c, v) match {
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: Long, y: Double) => java.lang.Double.compare(x.toDouble, y)
        case (x: Double, y: Long) => java.lang.Double.compare(x, y.toDouble)
        case (x: Double, y: Double) => java.lang.Double.compare(x, y)
        case (x: String, y: String) =>
          // UTF8String binary (UTF-8 byte) order, NOT String.compareTo
          // (UTF-16 code-unit order): the Catalyst path (readSnapshot's
          // filtersToColumn) compares strings as UTF8String, and the
          // two read paths of one table must agree on which rows a
          // range predicate deletes — they differ on supplementary-
          // plane characters
          org.apache.spark.unsafe.types.UTF8String.fromString(x)
            .compareTo(
              org.apache.spark.unsafe.types.UTF8String.fromString(y))
        case (x, y) => throw new IllegalArgumentException(
          s"type mismatch evaluating $a: ${x.getClass} vs ${y.getClass}")
      })
    }
    def str(a: String): Option[String] = cell(a) match {
      case null => None
      case s: String => Some(s)
      case other => throw new IllegalArgumentException(
        s"string predicate on non-string $a: ${other.getClass}")
    }
    f match {
      case EqualTo(a, v) => cmp(a, v).map(_ == 0)
      case EqualNullSafe(a, v) =>
        if (v == null) Some(cell(a) == null) // `a <=> NULL` = a IS NULL
        else Some(cell(a) != null && cmp(a, v).contains(0))
      case GreaterThan(a, v) => cmp(a, v).map(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).map(_ >= 0)
      case LessThan(a, v) => cmp(a, v).map(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).map(_ <= 0)
      case In(a, vs) =>
        if (cell(a) == null) None
        else if (vs.exists(v => cmp(a, v).contains(0))) Some(true)
        // `a IN (…, NULL)` with no match = UNKNOWN, not FALSE — under
        // NOT IN the difference deletes rows it must keep
        else if (vs.contains(null)) None
        else Some(false)
      case IsNull(a) => Some(cell(a) == null)
      case IsNotNull(a) => Some(cell(a) != null)
      case And(l, r) =>
        (evalFilter(l, cell), evalFilter(r, cell)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) =>
        (evalFilter(l, cell), evalFilter(r, cell)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(c) => evalFilter(c, cell).map(!_)
      case StringStartsWith(a, v) => str(a).map(_.startsWith(v))
      case StringEndsWith(a, v) => str(a).map(_.endsWith(v))
      case StringContains(a, v) => str(a).map(_.contains(v))
      case AlwaysTrue() => Some(true)
      case AlwaysFalse() => Some(false)
      case other => throw new IllegalArgumentException(
        s"unsupported DELETE predicate: $other")
    }
  }

  /** Merge-on-read delete predicates of `path`, ascending by version:
    * (k, name→fieldId map AT DELETE TIME, filter with delete-time
    * names) for every `_DELETES.v<k>`. */
  private[io] def deletePredicates(path: String)
      : Seq[(Int, Map[String, Long], org.apache.spark.sql.sources.Filter)] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val dir = new Path(path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_DELETES.v") =>
        n.stripPrefix("_DELETES.v") }
      .flatMap(s => scala.util.Try(s.toInt).toOption).sorted
      .flatMap { v =>
        val root = readDeletesJson(path, v)
        // equality-delete commits ("eqfiles") are served by
        // [[eqDeleteSpecs]], not here
        if (!root.has("filter")) None
        else {
          val cols = scala.collection.mutable.Map[String, Long]()
          val it = root.get("cols").fields()
          while (it.hasNext) {
            val e = it.next(); cols.put(e.getKey, e.getValue.asLong())
          }
          Some((v, cols.toMap,
            filterFromJson(jmapper.writeValueAsString(root.get("filter")))))
        }
      }
  }

  private def readDeletesJson(path: String, v: Int)
      : com.fasterxml.jackson.databind.JsonNode = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val in = fs.open(new Path(path, s"_DELETES.v$v"))
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    jmapper.readTree(json)
  }

  /** EQUALITY-DELETE specs (the merge-on-read MERGE/UPDATE shape):
    * for every `_DELETES.v<k>` carrying "eqfiles" — (k, delete-time
    * columns in the eqdel files' CELL ORDER (name, field id), and the
    * table-relative eqdel file names). An eqdel file holds full-row
    * PRE-IMAGES rendered in the commit's data layout; a row of a file
    * older than k is hidden iff its raw current-schema cells equal
    * some pre-image's (exact: both sides were rendered by the same
    * deterministic cell encoding, and `Double.toString` round-trips).
    */
  private[io] def eqDeleteSpecs(path: String)
      : Seq[(Int, Seq[(String, Long)], Seq[String])] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val dir = new Path(path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_DELETES.v") =>
        n.stripPrefix("_DELETES.v") }
      .flatMap(s => scala.util.Try(s.toInt).toOption).sorted
      .flatMap { v =>
        val root = readDeletesJson(path, v)
        if (!root.has("eqfiles")) None
        else {
          val cols = scala.collection.mutable.ArrayBuffer[(String, Long)]()
          val it = root.get("cols").fields()
          while (it.hasNext) {
            val e = it.next(); cols += (e.getKey -> e.getValue.asLong())
          }
          val files = scala.collection.mutable.ArrayBuffer[String]()
          val fit = root.get("eqfiles").elements()
          while (fit.hasNext) files += fit.next().asText()
          Some((v, cols.toSeq, files.toSeq))
        }
      }
  }

  /** The equality-deletes a read at `readVersion` must apply,
    * resolved against the CURRENT schema by field id: (k, Left(error)
    * | Right((eqdel files, cell positions in the eqdel rows, column
    * positions in the current schema))) — both index arrays sorted by
    * FIELD ID so the canonical keys align on both sides. Same
    * dropped-column posture as [[applicableDeletes]]: unevaluable is
    * a loud error only if a read actually needs it. */
  private[io] def applicableEqDeletes(path: String, readVersion: Int,
      schema: StructType)
      : Seq[(Int, Either[String, (Seq[String], Array[Int], Array[Int])])] = {
    val posOfId: Map[Long, Int] = schema.fields.zipWithIndex
      .flatMap { case (f, i) => fieldIdOf(f).map(_ -> i) }.toMap
    eqDeleteSpecs(path).filter(_._1 <= readVersion).map {
      case (k, cols, files) =>
        val missing = cols.filterNot { case (_, id) => posOfId.contains(id) }
        if (missing.nonEmpty)
          (k, Left(
            s"equality delete v$k of $path references dropped " +
              s"column(s) ${missing.map(_._1).mkString(", ")} — this " +
              s"historical read predates the compaction that retired " +
              s"it and cannot be served through the current schema"))
        else {
          val byId = cols.zipWithIndex.sortBy(_._1._2)
          val ord = byId.map(_._2).toArray
          val idx = byId.map { case ((_, id), _) => posOfId(id) }.toArray
          (k, Right((files, ord, idx)))
        }
    }
  }

  /** Rewrite a predicate's attribute names from their DELETE-TIME
    * names to the CURRENT schema's (by field id) — what keeps a
    * merge-on-read delete correct across later RENAME COLUMNs. */
  private[io] def remapFilter(f: org.apache.spark.sql.sources.Filter,
      rename: Map[String, String]): org.apache.spark.sql.sources.Filter = {
    import org.apache.spark.sql.sources._
    def r(a: String): String = rename.getOrElse(a, a)
    f match {
      case EqualTo(a, v) => EqualTo(r(a), v)
      case EqualNullSafe(a, v) => EqualNullSafe(r(a), v)
      case GreaterThan(a, v) => GreaterThan(r(a), v)
      case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(r(a), v)
      case LessThan(a, v) => LessThan(r(a), v)
      case LessThanOrEqual(a, v) => LessThanOrEqual(r(a), v)
      case In(a, vs) => In(r(a), vs)
      case IsNull(a) => IsNull(r(a))
      case IsNotNull(a) => IsNotNull(r(a))
      case And(l, r2) => And(remapFilter(l, rename), remapFilter(r2, rename))
      case Or(l, r2) => Or(remapFilter(l, rename), remapFilter(r2, rename))
      case Not(c) => Not(remapFilter(c, rename))
      case StringStartsWith(a, v) => StringStartsWith(r(a), v)
      case StringEndsWith(a, v) => StringEndsWith(r(a), v)
      case StringContains(a, v) => StringContains(r(a), v)
      case other => other // AlwaysTrue / AlwaysFalse
    }
  }

  /** The deletes a read at `readVersion` must apply, with attribute
    * names remapped to the CURRENT schema: Seq of (k, filter) — a
    * file committed at version j is subject to those with j < k.
    * A predicate referencing a field id the current schema no longer
    * has (its column was dropped AFTER a compaction made the
    * predicate inert for current reads, and this is a TIME-TRAVEL
    * read into its live range) fails LOUDLY: evaluating it against
    * the projected schema is impossible, and serving the rows
    * un-deleted would be silently wrong. */
  private[io] def applicableDeletes(path: String, readVersion: Int,
      schema: StructType)
      : Seq[(Int, Either[String, org.apache.spark.sql.sources.Filter])] = {
    val currentNameOfId: Map[Long, String] = schema.fields
      .flatMap(f => fieldIdOf(f).map(_ -> f.name)).toMap
    deletePredicates(path).filter(_._1 <= readVersion).map {
      case (k, cols, f) =>
        val missing = cols.filterNot { case (_, id) =>
          currentNameOfId.contains(id) }
        if (missing.nonEmpty)
          // unevaluable — only an ERROR if some file being read
          // actually needs it (a current read after a compaction
          // never does; a time-travel read into the predicate's live
          // range does, and must fail rather than serve rows
          // un-deleted)
          (k, Left(
            s"merge-on-read delete v$k of $path references dropped " +
              s"column(s) ${missing.keys.mkString(", ")} — this " +
              s"historical read predates the compaction that retired " +
              s"the predicate and cannot be served through the " +
              s"current schema"))
        else {
          val rename = cols.flatMap { case (oldName, id) =>
            currentNameOfId.get(id).map(oldName -> _) }
          (k, Right(remapFilter(f, rename)))
        }
    }
  }

  /** Resolves the predicates a file at version `j` must apply, or
    * throws if one of them is unevaluable (see [[applicableDeletes]]). */
  private[io] def resolveFileDeletes(
      dels: Seq[(Int, Either[String, org.apache.spark.sql.sources.Filter])],
      j: Int): Seq[org.apache.spark.sql.sources.Filter] =
    dels.filter(_._1 > j).map {
      case (_, Right(f)) => f
      case (_, Left(msg)) => throw new IllegalStateException(msg)
    }

  /** Publishes a MANIFEST-ONLY merge-on-read DELETE commit: every
    * prior file carries forward untouched, the predicate lands as
    * `_DELETES.v<k>` (with the delete-time name→field-id map), and
    * the manifest's atomic rename — last, as always — is the commit
    * point: a crash before it leaves the `_DELETES` file invisible
    * (readers scope application to committed versions). Returns k. */
  private[io] def publishDeleteCommit(path: String,
      colsToIds: Map[String, Long],
      filter: org.apache.spark.sql.sources.Filter,
      layout: Option[Seq[Long]],
      basis: Option[Int] = None): Int = {
    val fs = new Path(path).getFileSystem(new Configuration())
    // basis-dependent commit: refuse a claim collision, and refuse if
    // the table moved past the snapshot the DELETE computed from
    val version = claimVersion(path, retry = false)
    basis.foreach { b =>
      val latest = versionsOf(path).lastOption.getOrElse(0)
      if (latest != b) {
        fs.delete(new Path(path, s"_CLAIM.v$version"), false)
        throw new java.util.ConcurrentModificationException(
          s"$path moved to v$latest while this DELETE was computed " +
            s"against v$b — re-run it")
      }
    }
    val names = committedFilesOf(path)
    val cols = new java.util.LinkedHashMap[String, Object]()
    colsToIds.foreach { case (n, id) => cols.put(n, Long.box(id)) }
    val root = new java.util.LinkedHashMap[String, Object]()
    root.put("cols", cols)
    root.put("filter", jmapper.readTree(filterToJson(filter)))
    def writeAtomic(tmpName: String, target: Path, bytes: Array[Byte]): Unit = {
      val tmp = new Path(path, tmpName)
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      fs.rename(tmp, target)
    }
    writeAtomic(s"_DELETES.tmp-${java.util.UUID.randomUUID()}",
      new Path(path, s"_DELETES.v$version"),
      jmapper.writeValueAsString(root).getBytes("UTF-8"))
    layout.foreach { ids =>
      writeAtomic(s"_LAYOUT.tmp-${java.util.UUID.randomUUID()}",
        new Path(path, s"_LAYOUT.v$version"),
        ids.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    val manifestBytes = names.mkString("", "\n", "\n").getBytes("UTF-8")
    writeAtomic(s"_MANIFEST.tmp-${java.util.UUID.randomUUID()}",
      new Path(path, s"$ManifestFile.v$version"), manifestBytes)
    val legacy = new Path(path, ManifestFile)
    fs.delete(legacy, false)
    writeAtomic(s"_MANIFEST.tmp-${java.util.UUID.randomUUID()}",
      legacy, manifestBytes)
    version
  }

  /** Publishes a PARTIAL-REWRITE commit: `keep` (untouched current
    * files) carries forward by reference, while the atomic work-dir
    * write at `workDir` (a complete v1 snapshot of the REWRITTEN
    * files, with its own `_LAYOUT.v1`/`_PARTS.v1`) renames in as the
    * commit's fresh files — the partition-scoped copy-on-write
    * DELETE's commit, same claim/basis discipline as every
    * basis-dependent commit. Returns the commit version. */
  private[io] def publishRewriteCommit(path: String, keep: Seq[String],
      workDir: String, layout: Option[Seq[Long]],
      basis: Option[Int]): Int = {
    val fs = new Path(path).getFileSystem(new Configuration())
    // a refused/failed publish must not leak the staged work dir
    // inside the table dir forever (no manifest ever references it,
    // and VACUUM's data-file sweep never matches subdirectories)
    val version =
      try claimVersion(path, retry = false)
      catch { case t: Throwable =>
        fs.delete(new Path(workDir), true); throw t }
    def releaseAnd(t: Throwable): Nothing = {
      fs.delete(new Path(path, s"_CLAIM.v$version"), false)
      fs.delete(new Path(workDir), true)
      throw t
    }
    basis.foreach { b =>
      val latest = versionsOf(path).lastOption.getOrElse(0)
      if (latest != b) releaseAnd(new java.util.ConcurrentModificationException(
        s"$path moved to v$latest while this rewrite was computed " +
          s"against v$b — re-run it"))
    }
    try {
      val staged = committedFilesOf(workDir)
      val fresh = staged.map(n =>
        s"v$version-part-" + n.stripPrefix("v1-part-"))
      staged.zip(fresh).foreach { case (from, to) =>
        fs.rename(new Path(workDir, from), new Path(path, to))
      }
      def writeAtomic(target: Path, bytes: Array[Byte]): Unit = {
        val tmp = new Path(path, s"_RW.tmp-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        fs.rename(tmp, target)
      }
      // partition tuples of the rewritten files, renamed to their
      // published names — future scans keep pruning them
      val workParts = readParts(workDir, 1)
      if (workParts.nonEmpty) {
        val lines = staged.zip(fresh).flatMap { case (from, to) =>
          workParts.get(from).map(cells =>
            (to +: cells.toSeq).mkString("\t")) }
        writeAtomic(new Path(path, s"_PARTS.v$version"),
          lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      }
      // column min/max of the rewritten files, same rename treatment —
      // a rewrite republishes its data-skipping bounds
      val workStats = readMinMax(workDir, 1)
      if (workStats.nonEmpty) {
        val lines = staged.zip(fresh).flatMap { case (from, to) =>
          workStats.getOrElse(from, Map.empty).map {
            case (id, (mn, mx)) => s"$to\t$id\t$mn\t$mx" } }
        if (lines.nonEmpty)
          writeAtomic(new Path(path, s"_MINMAX.v$version"),
            lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      }
      layout.foreach(ids => writeAtomic(new Path(path, s"_LAYOUT.v$version"),
        ids.mkString("", "\n", "\n").getBytes("UTF-8")))
      val manifestBytes =
        (keep ++ fresh).mkString("", "\n", "\n").getBytes("UTF-8")
      writeAtomic(new Path(path, s"$ManifestFile.v$version"), manifestBytes)
      val legacy = new Path(path, ManifestFile)
      fs.delete(legacy, false)
      writeAtomic(legacy, manifestBytes)
      fs.delete(new Path(workDir), true)
      version
    } catch {
      case t: Throwable =>
        if (!fs.exists(new Path(path, s"$ManifestFile.v$version")))
          releaseAnd(t)
        else throw t
    }
  }

  /** COMPACTION (the OPTIMIZE/rewrite-files maintenance op): rewrites
    * the CURRENT visible rows — merge-on-read predicates applied — as
    * one fresh REPLACEMENT snapshot. After it, every `_DELETES.v<k>`
    * is INERT for current reads (the new manifest's files all carry a
    * version > k) though retained for time travel of older versions,
    * and a DROP COLUMN the live-predicate guard refused becomes legal
    * again. The changelog face records the commit as `!fresh=skip`
    * with no delete image: a compaction changes NOTHING logically, so
    * it contributes no change rows. (The PLAIN commit feed, being an
    * append feed, re-serves the rewritten rows — same documented
    * caveat as any rewrite.) Returns the compaction's commit version.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              schema: StructType): Int = {
    // basis-dependent: the rewrite must not publish over a commit
    // that landed after the snapshot it read
    val basis = versionsOf(path).lastOption.getOrElse(0)
    val rows = readSnapshot(spark, path, schema, None)
    val w = rows.write.format("graft.io.AtomicSink")
      .option("path", path).mode("append")
      .option("commitBasis", basis.toString)
    layoutIdsOf(schema).foreach(ids => w.option("layout", ids.mkString(",")))
    // a PARTITIONED BY table's replacement snapshot must republish
    // its `_PARTS` tuples (clustered write), or compaction would
    // permanently destroy partition pruning AND partition-aware
    // INSERT OVERWRITE — the spec lives in the catalog's schema file,
    // read here so path-level callers can't forget it
    val partIds = tablePartitionIds(path)
    if (partIds.nonEmpty) w.option("partids", partIds.mkString(","))
    tableBucketSpec(path).foreach { case (id, n) =>
      w.option("bucketspec", s"$id,$n") }
    w.save()
    val k = versionsOf(path).last
    writeCdcList(path, k, "skip", Seq.empty)
    k
  }

  /** SORTED COMPACTION (`OPTIMIZE … SORT BY` / the Delta
    * ZORDER-style maintenance op): [[compact]] plus a RANGE
    * re-clustering of the snapshot on `sortCols` before the rewrite —
    * each replacement file then covers a DISJOINT range of the sort
    * key, which turns the `_MINMAX` data-skipping sidecar from
    * best-effort into surgical: after ingest-order writes where every
    * file spans the whole key domain (no bounds can prune), one
    * sorted compaction makes a selective range predicate open O(1)
    * files instead of all of them — the second half of the
    * data-skipping story at 100 TB (stats only skip what layout
    * separates). Same basis/claim discipline as [[compact]]. */
  def compactSorted(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: StructType, sortCols: Seq[String],
      numFiles: Option[Int] = None): Int = {
    require(sortCols.nonEmpty, "compactSorted needs at least one column")
    val basis = versionsOf(path).lastOption.getOrElse(0)
    val cols = sortCols.map(org.apache.spark.sql.functions.col)
    // EXPLICIT partition count (default: keep the current file
    // count): an implicit range shuffle gets AQE-coalesced on small
    // snapshots, collapsing the clustering this op exists to create
    val n = numFiles.getOrElse(
      math.max(1, committedFilesOf(path).size))
    val rows = readSnapshot(spark, path, schema, None)
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
    val w = rows.write.format("graft.io.AtomicSink")
      .option("path", path).mode("append")
      .option("commitBasis", basis.toString)
    layoutIdsOf(schema).foreach(ids => w.option("layout", ids.mkString(",")))
    val partIds = tablePartitionIds(path)
    if (partIds.nonEmpty) w.option("partids", partIds.mkString(","))
    tableBucketSpec(path).foreach { case (id, n) =>
      w.option("bucketspec", s"$id,$n") }
    w.save()
    val k = versionsOf(path).last
    writeCdcList(path, k, "skip", Seq.empty)
    k
  }

  /** The table's identity-partition FIELD IDS as recorded by
    * [[AtomicCatalog]] in the newest `_SCHEMA.v<N>` sidecar; empty
    * for unpartitioned or non-catalog (bare-path) tables. Lets
    * path-level maintenance ops (compaction) preserve the partition
    * spec without the caller threading it through. */
  private[io] def tablePartitionIds(path: String): Seq[Long] = {
    latestSchemaJson(path) match {
      case None => Seq.empty
      case Some(root) =>
        if (!root.has("partitionFieldIds")) Seq.empty
        else {
          val b = scala.collection.mutable.ArrayBuffer[Long]()
          val it = root.get("partitionFieldIds").elements()
          while (it.hasNext) b += it.next().asLong()
          b.toSeq
        }
    }
  }

  /** The table's bucket spec (fieldId, n) from the newest schema
    * sidecar — same reason as [[tablePartitionIds]]: a compaction of
    * a BUCKETED table must republish bucket tuples or it would
    * permanently destroy bucket pruning and storage-partitioned
    * joins. */
  private[io] def tableBucketSpec(path: String): Option[(Long, Int)] =
    latestSchemaJson(path).flatMap { root =>
      if (!root.has("bucketSpec")) None
      else Some((root.get("bucketSpec").get("fieldId").asLong(),
        root.get("bucketSpec").get("n").asInt()))
    }

  private def latestSchemaJson(path: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_SCHEMA.v") =>
        n.stripPrefix("_SCHEMA.v") }
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .sorted.lastOption.map { v =>
        val in = fs.open(new Path(dir, s"_SCHEMA.v$v"))
        val json =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      }
  }

  /** Versions of merge-on-read predicates that still apply to some
    * file of the CURRENT manifest — the set that matters for the
    * DROP-COLUMN guard (a compaction empties it). */
  private[io] def livePredicateVersions(path: String): Set[Int] = {
    val current = committedFilesOf(path)
      .map(n => versionOfFile(n).getOrElse(0))
    deletePredicates(path).collect {
      case (k, _, _) if current.exists(_ < k) => k
    }.toSet ++ eqDeleteSpecs(path).collect {
      case (k, _, _) if current.exists(_ < k) => k
    }
  }

  /** The pushed v1 `Filter`s of a DELETE, rebuilt as one `Column`
    * (AND of all) — total over every shape Spark pushes, so
    * `canDeleteWhere` is simply "does this translation succeed". */
  private[io] def filtersToColumn(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    def t(f: Filter): org.apache.spark.sql.Column = f match {
      case EqualTo(a, v) => col(a) === lit(v)
      case EqualNullSafe(a, v) => col(a) <=> lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case And(l, r) => t(l) && t(r)
      case Or(l, r) => t(l) || t(r)
      case Not(c) => !t(c)
      case StringStartsWith(a, v) => col(a).startsWith(v)
      case StringEndsWith(a, v) => col(a).endsWith(v)
      case StringContains(a, v) => col(a).contains(v)
      case AlwaysTrue() => lit(true)
      case AlwaysFalse() => lit(false)
      case other => throw new IllegalArgumentException(
        s"unsupported DELETE predicate: $other")
    }
    filters.map(t).reduceOption(_ && _)
      .getOrElse(lit(true)) // unconditional DELETE = truncate snapshot
  }

  /** Driver-side helper building a DataFrame over a snapshot — what
    * [[SinkTable.deleteWhere]] filters and rewrites. Distributed read
    * (spark.read.text over the manifest-listed files), typed by the
    * declared schema with FIELD-ID column resolution (files group by
    * their commit layout; each group reads through its own cell
    * mapping); the TSV null convention maps "" back to NULL. */
  private[io] def readSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: StructType,
      snapVersion: Option[Int],
      onlyFiles: Option[Set[String]] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val names = (snapVersion match {
      case Some(v) => readManifestOf(path, v)
      case None => committedFilesOf(path)
    }).filter(n => onlyFiles.forall(_.contains(n)))
    if (names.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val maps = idxMapsFor(path, names, schema)
      val readVersion =
        snapVersion.getOrElse(versionsOf(path).lastOption.getOrElse(0))
      val dels = applicableDeletes(path, readVersion, schema)
      val eqDels = applicableEqDeletes(path, readVersion, schema)
      // merge-on-read deletes applying to a file committed at j:
      // those published at k > j (and <= the read version)
      def delVersionsFor(name: String): Seq[Int] = {
        val j = versionOfFile(name).getOrElse(0)
        dels.filter(_._1 > j).map(_._1) ++
          eqDels.filter(_._1 > j).map(_._1)
      }
      def delsFor(name: String): Seq[org.apache.spark.sql.sources.Filter] =
        resolveFileDeletes(dels, versionOfFile(name).getOrElse(0))
      def eqsFor(name: String)
          : Seq[(Seq[String], Array[Int], Array[Int])] = {
        val j = versionOfFile(name).getOrElse(0)
        eqDels.filter(_._1 > j).map {
          case (_, Right(r)) => r
          case (_, Left(msg)) => throw new IllegalStateException(msg)
        }
      }
      def readGroup(files: Seq[String], idxMap: Array[Int],
          fileDels: Seq[org.apache.spark.sql.sources.Filter],
          fileEqs: Seq[(Seq[String], Array[Int], Array[Int])])
          : org.apache.spark.sql.DataFrame = {
        val parts = split(col("value"), "\t", -1)
        val cols = schema.fields.zipWithIndex.map { case (f, i) =>
          val j = idxMap(i)
          // -1 = field absent from these files; short rows (written
          // before an ADD COLUMN) pad NULL too (size guard — ANSI
          // element_at throws past the end)
          val s = if (j < 0) lit(null).cast("string")
            else when(size(parts) > j, element_at(parts, j + 1))
          val v = f.dataType match {
            case LongType =>
              when(s === "", lit(null)).otherwise(s).cast("long")
            case DoubleType =>
              when(s === "", lit(null)).otherwise(s).cast("double")
            case StringType => when(s === "", lit(null)).otherwise(s)
            case dt => throw new IllegalArgumentException(
              s"AtomicSink supports long/double/string, got $dt")
          }
          v.as(f.name)
        }
        // RAW current-order cells ("" padded) — the equality-delete
        // canonical form compares raw cell strings, never re-rendered
        // values (both sides were written by the same deterministic
        // encoder, so raw-compare is exact)
        def raw(i: Int): org.apache.spark.sql.Column = {
          val j = idxMap(i)
          if (j < 0) lit("")
          else coalesce(
            when(size(parts) > j, element_at(parts, j + 1)), lit(""))
        }
        // one field-id-canonical key column per applicable equality
        // delete, computed from the raw cells in the same projection
        val eqKeyCols = fileEqs.zipWithIndex.map {
          case ((_, _, idx), n) =>
            concat_ws("\t", idx.toIndexedSeq.map(raw): _*).as(s"__eqk$n")
        }
        val base0 = spark.read.text(files: _*)
          .select((cols ++ eqKeyCols).toIndexedSeq: _*)
        // anti-join each applicable pre-image set on its key (small
        // sets auto-broadcast via file-scan statistics)
        val afterEq = fileEqs.zipWithIndex.foldLeft(base0) {
          case (df, ((eqFiles, ord, _), n)) =>
            val eqKeys = spark.read
              .text(eqFiles.map(f => new Path(path, f).toString): _*)
              .select(split(col("value"), "\t", -1).as("c"))
              .select(concat_ws("\t", ord.toIndexedSeq.map(o =>
                coalesce(when(size(col("c")) > o,
                  element_at(col("c"), o + 1)), lit(""))): _*)
                .as("__eqkey"))
              .distinct()
            df.join(eqKeys, col(s"__eqk$n") === col("__eqkey"),
              "left_anti")
        }
        val base =
          if (fileEqs.isEmpty) afterEq
          else afterEq.drop(fileEqs.indices.map(n => s"__eqk$n"): _*)
        // a row survives unless some applicable delete's condition is
        // TRUE on it (NULL keeps — SQL DELETE semantics)
        fileDels.foldLeft(base) { (df, f) =>
          df.filter(!org.apache.spark.sql.functions.coalesce(
            AtomicSink.filtersToColumn(Array(f)),
            org.apache.spark.sql.functions.lit(false)))
        }
      }
      names.groupBy(n => (maps(n).toSeq, delVersionsFor(n))).values
        .toSeq
        .map(g => readGroup(g.map(n => new Path(path, n).toString),
          maps(g.head), delsFor(g.head), eqsFor(g.head)))
        .reduce(_ unionAll _)
    }
  }

  /** DSv2 read path over a snapshot: one input partition per
    * manifest-listed file (resolved at PLANNING time, so a query
    * plans against one consistent snapshot even if a commit lands
    * mid-flight), each reader parsing its TSV back through the
    * declared schema. */
  /** The two extra columns a `changelog` read serves, Delta-CDF
    * names: `_change_type` ("insert" / "delete") and
    * `_commit_version` (the snapshot that published the change). */
  private[io] def changelogSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_change_type", StringType,
        nullable = false) :+
      org.apache.spark.sql.types.StructField("_commit_version", LongType,
        nullable = false))

  private class TsvScanBuilder(path: String, schema: StructType,
      pinned: Option[Int], changelog: Boolean, failOnDataLoss: Boolean,
      partitionCols: Seq[String] = Seq.empty,
      onPlanned: Seq[String] => Unit = null,
      runtimeGroupFilter: Boolean = false,
      bucketSpec: Option[(String, Int)] = None)
      extends org.apache.spark.sql.connector.read.ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
    // the pruned output (COLUMN PRUNING — a count(*) over the table
    // builds zero-width rows; a metadata-column read adds `_file`).
    // MOR delete predicates still evaluate against the full decoded
    // line, so pruning never changes which rows are visible.
    private var required: Option[StructType] = None
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = Some(requiredSchema)

    // PARTITION PRUNING: predicates referencing ONLY partition
    // columns are accepted for FILE-level pruning (each file of a
    // partitioned commit holds one partition tuple). DATA SKIPPING:
    // range-shaped predicates on any id-carrying column prune files
    // by their recorded `_MINMAX` bounds. EVERY filter is
    // returned as a residual — pruning is an optimization, Spark
    // still applies the predicate to the rows that survive it — so
    // correctness never depends on either sidecar being present.
    private var partPushed: Array[org.apache.spark.sql.sources.Filter] =
      Array.empty
    private var statsPushed: Array[org.apache.spark.sql.sources.Filter] =
      Array.empty
    override def pushFilters(
        filters: Array[org.apache.spark.sql.sources.Filter])
        : Array[org.apache.spark.sql.sources.Filter] = {
      if (partitionCols.nonEmpty)
        partPushed = filters.filter(f =>
          f.references.nonEmpty &&
            f.references.forall(partitionCols.contains) &&
            scala.util.Try(filterToJson(f)).isSuccess)
      val statsCols = schema.fields.collect {
        case fld if AtomicSink.fieldIdOf(fld).isDefined &&
          (fld.dataType == LongType || fld.dataType == DoubleType ||
            fld.dataType == StringType) => fld.name
      }.toSet
      statsPushed = filters.filter(f =>
        AtomicSink.statsPrunable(f) &&
          f.references.nonEmpty && f.references.forall(statsCols.contains))
      // BUCKET PRUNING: a point predicate on the bucket column maps
      // to an exact bucket set — files with a different recorded
      // bucket tuple never open (residual like everything else)
      bucketSpec.foreach { case (col, _) =>
        bucketPushed = filters.collect {
          case f @ org.apache.spark.sql.sources.EqualTo(a, _)
            if a == col => f
          case f @ org.apache.spark.sql.sources.In(a, vs)
            if a == col && vs != null && vs.nonEmpty => f
        }
      }
      filters
    }
    private var bucketPushed: Array[org.apache.spark.sql.sources.Filter] =
      Array.empty
    override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
      (partPushed ++ statsPushed.filterNot(partPushed.contains)).toArray

    override def build(): org.apache.spark.sql.connector.read.Scan =
      new TsvScan(path, schema, pinned, changelog, failOnDataLoss,
        required, partitionCols, partPushed, onPlanned,
        runtimeGroupFilter, statsPushed, bucketSpec, bucketPushed)
  }

  /** Output-field resolution codes for one scan: `>= 0` = index into
    * the FULL-schema decoded row; -2 = the `_file` metadata column;
    * -3 / -4 = the changelog columns (`_change_type` /
    * `_commit_version`). A real table column named like a virtual one
    * wins (the SupportsMetadataColumns conflict contract). */
  private def outCodesFor(out: StructType, schema: StructType): Array[Int] = {
    val idx = schema.fieldNames.zipWithIndex.toMap
    out.fields.map { f =>
      idx.get(f.name) match {
        case Some(i) => i
        case None => f.name match {
          case "_file" => -2
          case "_change_type" => -3
          case "_commit_version" => -4
          case "_row" => -5
          case other => throw new IllegalArgumentException(
            s"unknown column $other for $schema")
        }
      }
    }
  }

  private class TsvScan(path: String, schema: StructType,
      pinned: Option[Int], changelog: Boolean, failOnDataLoss: Boolean,
      required: Option[StructType] = None,
      partitionCols: Seq[String] = Seq.empty,
      partFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
      onPlanned: Seq[String] => Unit = null,
      runtimeGroupFilter: Boolean = false,
      statsFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
      bucketSpec: Option[(String, Int)] = None,
      bucketFilters: Array[org.apache.spark.sql.sources.Filter] =
        Array.empty)
      extends org.apache.spark.sql.connector.read.Scan
      with org.apache.spark.sql.connector.read.Batch
      with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
      with org.apache.spark.sql.connector.read.SupportsReportStatistics
      with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

    /** Planner statistics = the byte size of exactly the files this
      * scan will open (manifest-listed, PARTITION-PRUNED) — without
      * this a DSv2 relation defaults to "unknown/huge" and a small
      * catalog dimension table never auto-broadcasts in a join; with
      * it, pruning also shrinks the estimate, so a partition-filtered
      * scan can become the broadcast side. TSV bytes ≈ row data
      * (no compression), making the estimate honest for the
      * 10 MB broadcast threshold. */
    /** Manifest + prune resolution, memoized PER SCAN INSTANCE:
      * estimateStatistics, outputPartitioning and planInputPartitions
      * each used to re-list the directory and re-read the
      * `_PARTS`/`_MINMAX` sidecars, so one bucketed query paid the
      * metadata I/O several times (and an unpinned scan could even
      * see a commit land between the calls). One resolution per scan
      * keeps the three faces consistent and costs the sidecar reads
      * once; only the runtime group filter invalidates (it can only
      * NARROW the set). */
    private lazy val manifestNames: Seq[String] = pinned match {
      case Some(v) => readManifestOf(path, v)
      case None => committedFilesOf(path)
    }
    private lazy val survivingMemo: Seq[String] =
      survivingFiles(manifestNames)
    @volatile private var plannedMemo: Seq[String] = null
    private def plannedNamesMemo: Seq[String] = {
      var r = plannedMemo
      if (r == null) {
        r = survivingMemo.filter(n => runtimeFiles.forall(_.contains(n)))
        plannedMemo = r
      }
      r
    }

    override def estimateStatistics()
        : org.apache.spark.sql.connector.read.Statistics = {
      val fs = new Path(path).getFileSystem(new Configuration())
      val names = survivingMemo
      val bytes = names.map { n =>
        try fs.getFileStatus(new Path(path, n)).getLen
        catch { case _: java.io.IOException => 0L }
      }.sum
      new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(bytes)
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.empty()
      }
    }

    /** RUNTIME GROUP FILTERING (row-level operation scans only): a
      * MERGE/UPDATE's ReplaceData plan asks Spark to compute the
      * DISTINCT `_file` values of MATCHING rows first (a dynamic
      * pruning subquery over a separate plain scan), then pushes them
      * here as `IN(_file, …)` — the scan narrows to exactly the files
      * holding matched rows, and because the write replaces exactly
      * what the scan planned, an unpartitioned MERGE rewrites only
      * the files it touches (the Iceberg COW group-filter contract).
      * An unparseable predicate is ignored: a wider scan only
      * rewrites more untouched rows, never changes the result. */
    @volatile private var runtimeFiles: Option[Set[String]] = None

    override def filterAttributes()
        : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      if (runtimeGroupFilter)
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .column("_file"))
      else Array.empty

    override def filter(
        predicates: Array[org.apache.spark.sql.connector.expressions
          .filter.Predicate]): Unit = {
      val names = predicates.collectFirst {
        case p if p.name() == "IN" && p.children().nonEmpty &&
          p.children()(0).isInstanceOf[
            org.apache.spark.sql.connector.expressions.NamedReference] &&
          p.children()(0)
            .asInstanceOf[org.apache.spark.sql.connector.expressions
              .NamedReference]
            .fieldNames().sameElements(Array("_file")) =>
          p.children().drop(1).collect {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              String.valueOf(l.value())
          }.toSet
      }
      names.foreach { ns =>
        runtimeFiles = Some(ns)
        plannedMemo = null // the group filter narrowed the plan
      }
    }
    private def outSchema: StructType = required.getOrElse(
      if (changelog) changelogSchema(schema) else schema)
    private def outCodes: Array[Int] = outCodesFor(outSchema, schema)
    override def readSchema(): StructType = outSchema

    /** The manifest files this scan actually opens: partition-tuple
      * pruning, then `_MINMAX` data skipping — both pure
      * optimizations (every pushed filter stays residual), so a
      * missing sidecar only widens the scan. */
    private def survivingFiles(all: Seq[String]): Seq[String] = {
      val tuples =
        if (partFilters.isEmpty) Map.empty[String, Array[String]]
        else partsForFiles(path, all)
      val afterPart0 = all.filterNot(n => prunedByPartition(tuples.get(n)))
      // BUCKET PRUNING: each point predicate on the bucket column
      // allows an exact bucket set; a file whose recorded bucket is
      // outside ANY conjunct's set holds no matching row. A null
      // literal constrains nothing (EqualTo null never matches rows,
      // but pruning stays an optimization — the residual decides).
      val afterPart =
        if (bucketFilters.isEmpty || bucketSpec.isEmpty) afterPart0
        else {
          val n = bucketSpec.get._2
          def bOf(v: Any): Option[String] = v match {
            case num: Number =>
              Some(((((num.longValue() % n) + n) % n).toInt).toString)
            case _ => None
          }
          import org.apache.spark.sql.sources.{EqualTo, In}
          val allowed: Seq[Set[String]] = bucketFilters.toSeq.flatMap {
            case EqualTo(_, v) if v != null => bOf(v).map(Set(_))
            case In(_, vs) if vs != null =>
              val bs = vs.toSeq.filter(_ != null).flatMap(bOf)
              if (bs.size == vs.count(_ != null)) Some(bs.toSet) else None
            case _ => None
          }
          if (allowed.isEmpty) afterPart0
          else {
            val bt = partsForFiles(path, afterPart0)
            afterPart0.filterNot { nme =>
              bt.get(nme).exists { cells =>
                val b = cells.headOption.getOrElse("")
                b.nonEmpty && allowed.exists(as => !as.contains(b))
              }
            }
          }
        }
      if (statsFilters.isEmpty) afterPart
      else {
        val mm = minmaxForFiles(path, afterPart)
        afterPart.filterNot { n =>
          mm.get(n).exists { byId =>
            val range = (col: String) => schema.fields.find(_.name == col)
              .flatMap(AtomicSink.fieldIdOf).flatMap(byId.get)
            statsFilters.exists(f =>
              scala.util.Try(
                AtomicSink.rangeCannotMatch(f, schema, range))
                .getOrElse(false))
          }
        }
      }
    }

    /** TRUE iff the file's recorded partition tuple proves NO row can
      * satisfy the pushed partition predicates (each file of a
      * partitioned commit holds exactly one tuple, so any result other
      * than definitely-TRUE rules every row out). Files without a
      * tuple never prune. */
    private def prunedByPartition(
        tuple: Option[Array[String]]): Boolean = tuple match {
      case None => false
      case Some(cells) =>
        val types = partitionCols.map(n =>
          schema.fields(schema.fieldIndex(n)).dataType)
        def cell(name: String): Any = {
          val i = partitionCols.indexOf(name)
          val s = if (i >= 0 && i < cells.length) cells(i) else ""
          if (s.isEmpty) null
          else types(i) match {
            case LongType => s.toLong
            case DoubleType => s.toDouble
            case _ => s
          }
        }
        partFilters.nonEmpty && partFilters.exists(f =>
          scala.util.Try(evalFilter(f, cell)).toOption
            .exists(!_.contains(true)))
    }
    override def toBatch: org.apache.spark.sql.connector.read.Batch = {
      if (changelog) throw new UnsupportedOperationException(
        "changelog is a STREAMING read (spark.readStream" +
          ".option(\"changelog\", true)) — a batch scan serves state, " +
          "not history")
      this
    }

    /** COMMIT FEED — the streaming face of the versioned table (the
      * append-CDC a downstream pipeline tails instead of re-reading
      * snapshots): offsets are COMMIT VERSIONS, each micro-batch
      * serves exactly the rows newly PUBLISHED by one commit (its
      * `v<k>-` fresh files — carried-forward files were already
      * served by their own commit's batch). One commit per batch by
      * construction, so a consumer sees the table's history in
      * commit order with exactly-once replay (files are immutable;
      * offsets live in the stream checkpoint). Caveat, stated
      * plainly: this is an APPEND feed — a copy-on-write DELETE
      * publishes its survivors as fresh files, which the feed serves
      * as re-inserts (the Delta-CDF-without-delete-vectors shape).
      */
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new CommitFeedStream(path, schema, changelog, failOnDataLoss,
        outCodes)
    override def description(): String =
      s"AtomicSnapshotScan($path${pinned.map(v => s"@v$v").getOrElse("")})"
    override def planInputPartitions()
        : Array[org.apache.spark.sql.connector.read.InputPartition] = {
      // PARTITION/BUCKET PRUNING + MIN/MAX DATA SKIPPING: drop
      // manifest files whose recorded tuple or column bounds cannot
      // satisfy the pushed predicates — the skipped files never open
      // (`.explain` shows the partition count drop)
      val names = plannedNamesMemo
      // report the planned file set to a coordinating row-level
      // rewrite (the groups its write REPLACES — unread files carry
      // forward untouched)
      if (onPlanned != null) onPlanned(names)
      // bucketed tables tag each split with its bucket KEY when every
      // planned file carries a recorded bucket — the grouping Spark's
      // storage-partitioned join planner keys on
      val bucketOfName: Option[Map[String, Int]] = bucketKeysFor(names)
      val maps = idxMapsFor(path, names, schema)
      val readVersion =
        pinned.getOrElse(versionsOf(path).lastOption.getOrElse(0))
      val dels = applicableDeletes(path, readVersion, schema)
      val eqDels = applicableEqDeletes(path, readVersion, schema)
      names.map { n =>
        val j = versionOfFile(n).getOrElse(0)
        val fileDels = resolveFileDeletes(dels, j)
          .map(filterToJson).toArray
        val fileEqs = eqDels.filter(_._1 > j).map {
          case (_, Right((files, ord, idx))) =>
            val root = new java.util.LinkedHashMap[String, Object]()
            val fl = new java.util.ArrayList[String]()
            files.foreach(f => fl.add(new Path(path, f).toString))
            root.put("files", fl)
            root.put("ord", ord.map(Int.box).toArray)
            root.put("idx", idx.map(Int.box).toArray)
            jmapper.writeValueAsString(root)
          case (_, Left(msg)) => throw new IllegalStateException(msg)
        }.toArray
        val base = TsvFilePartition(new Path(path, n).toString,
          maps(n), null, 0L, fileDels, outCodes, fileEqs)
        bucketOfName match {
          case Some(keys) => BucketedTsvFilePartition(base, keys(n))
            : org.apache.spark.sql.connector.read.InputPartition
          case None =>
            base: org.apache.spark.sql.connector.read.InputPartition
        }
      }.toArray
    }

    /** [[bucketKeys]] memoized on the planned-name Seq INSTANCE (the
      * memoized plan set is reused until the runtime filter replaces
      * it) — planInputPartitions and outputPartitioning otherwise
      * each re-read the `_PARTS` sidecar. */
    @volatile private var bucketKeysMemo
        : (Seq[String], Option[Map[String, Int]]) = null
    private def bucketKeysFor(names: Seq[String])
        : Option[Map[String, Int]] = {
      val m = bucketKeysMemo
      if (m != null && (m._1 eq names)) m._2
      else {
        val r = bucketKeys(names)
        bucketKeysMemo = (names, r)
        r
      }
    }

    /** name → bucket for every planned file, or None unless ALL of
      * them carry a single-cell numeric bucket tuple (a rewrite that
      * lost the tuples disables key-grouped planning, never breaks
      * it). */
    private def bucketKeys(names: Seq[String])
        : Option[Map[String, Int]] =
      bucketSpec.flatMap { _ =>
        if (names.isEmpty) None
        else {
          val tuples = partsForFiles(path, names)
          val keys = names.flatMap { n =>
            tuples.get(n).flatMap { cells =>
              cells.headOption.filter(c =>
                c.nonEmpty && c.forall(_.isDigit)).map(c => n -> c.toInt)
            }
          }.toMap
          if (keys.size == names.size) Some(keys) else None
        }
      }

    /** Storage-partitioned-join face: a bucketed scan whose planned
      * files all carry bucket keys reports KeyGroupedPartitioning
      * over the catalog's `bucket` function — two co-bucketed tables
      * then equi-join with ZERO shuffle (requires
      * `spark.sql.sources.v2.bucketing.enabled`). */
    override def outputPartitioning()
        : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
      val grouped = bucketSpec.filter(_ => !changelog).flatMap {
        case (col, n) =>
          val names = plannedNamesMemo
          bucketKeysFor(names).map { keys =>
            new org.apache.spark.sql.connector.read.partitioning
              .KeyGroupedPartitioning(
                Array(org.apache.spark.sql.connector.expressions
                  .Expressions.bucket(n, col)
                  : org.apache.spark.sql.connector.expressions.Expression),
                keys.values.toSet.size)
          }
      }
      grouped.getOrElse(
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0))
    }
    override def createReaderFactory()
        : org.apache.spark.sql.connector.read.PartitionReaderFactory =
      new TsvReaderFactory(schema)
  }

  /** Executor-JVM cache of equality-delete pre-image key sets, keyed
    * by (published eqdel file list, cell order): the files are
    * IMMUTABLE (versioned names, never rewritten), so a loaded set
    * stays valid for the JVM's life — soft references let the GC
    * reclaim them under pressure, and a reclaimed or missing entry
    * simply reloads. */
  private object EqDeleteCache {
    private val cache = new java.util.concurrent.ConcurrentHashMap[
      String, java.lang.ref.SoftReference[java.util.HashSet[String]]]()

    def get(files: Seq[String], ord: Array[Int])
        : java.util.HashSet[String] = {
      val key = files.mkString("|") + "#" + ord.mkString(",")
      val cached = Option(cache.get(key)).flatMap(r => Option(r.get()))
      cached.getOrElse {
        val set = load(files, ord)
        cache.put(key, new java.lang.ref.SoftReference(set))
        set
      }
    }

    private def load(files: Seq[String], ord: Array[Int])
        : java.util.HashSet[String] = {
      val set = new java.util.HashSet[String]()
      files.foreach { f =>
        val p = new Path(f)
        val fin = p.getFileSystem(new Configuration()).open(p)
        try scala.io.Source.fromInputStream(fin, "UTF-8").getLines()
          .filter(_.nonEmpty).foreach { line =>
            val cs = line.split("\t", -1)
            set.add(ord.map(o =>
              if (o < cs.length) cs(o) else "").mkString("\t"))
          }
        finally fin.close()
      }
      set
    }
  }

  /** `op`/`version` feed the changelog columns; `op == null` for
    * plain (non-changelog) reads. `deletes` carries the applicable
    * merge-on-read predicates (JSON, names already remapped to the
    * current schema) the reader must apply to THIS file's rows.
    * `outCodes` resolves each OUTPUT field (see [[outCodesFor]]) —
    * the pruned projection the reader emits. */
  private case class TsvFilePartition(file: String, idxMap: Array[Int],
      op: String, version: Long,
      deletes: Array[String] = Array.empty,
      outCodes: Array[Int] = Array.empty,
      eqDeletes: Array[String] = Array.empty)
      extends org.apache.spark.sql.connector.read.InputPartition

  /** A bucketed table's file split, carrying its bucket number as the
    * partition KEY — what lets Spark group splits per bucket and plan
    * storage-partitioned joins (zero-shuffle equi-joins between
    * co-bucketed tables). */
  private case class BucketedTsvFilePartition(base: TsvFilePartition,
      bucket: Int)
      extends org.apache.spark.sql.connector.read.InputPartition
      with org.apache.spark.sql.connector.read.HasPartitionKey {
    override def partitionKey(): InternalRow =
      new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](bucket))
  }

  private[io] case class VersionOffset(v: Long)
      extends org.apache.spark.sql.connector.read.streaming.Offset {
    override def json(): String = v.toString
  }

  /** [[TsvScan.toMicroBatchStream]]'s engine: commit-granular
    * admission (latestOffset steps ONE version past `start`
    * regardless of the advisory ReadLimit — the natural CDC unit),
    * AvailableNow drains to the version pinned at prepare time.
    *
    * Two faces:
    *  - PLAIN (default): each micro-batch serves the rows newly
    *    PUBLISHED by one commit (its fresh `v<k>-` files) — an
    *    append feed; a copy-on-write DELETE's survivors re-emit.
    *  - CHANGELOG (the `<t>__changes` sub-table): op-typed rows with
    *    `_change_type` / `_commit_version`. A row-level DELETE's
    *    sidecar serves the deleted rows as `delete` (its fresh
    *    manifest files, being survivor REWRITES, are NOT re-served);
    *    an INSERT OVERWRITE serves the previous snapshot's rows as
    *    `delete` (by file REFERENCE — nothing is copied) plus its
    *    fresh rows as `insert`; a plain append serves `insert`s.
    *    Within one commit's batch, replay order is deletes before
    *    inserts.
    *
    * Expiration guard (round-12 advice): a start offset below the
    * earliest RETAINED version means [[expireSnapshots]] deleted
    * commits this consumer never saw — silently serving empty batches
    * would lose rows, so the plan FAILS unless
    * `option("failOnDataLoss", false)` explicitly accepts skipping
    * (the Kafka earliest-offset contract). */
  private class CommitFeedStream(path: String, schema: StructType,
      changelog: Boolean, failOnDataLoss: Boolean,
      outCodes: Array[Int])
      extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
    import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit}

    private def latestVersion: Long =
      versionsOf(path).lastOption.getOrElse(0).toLong
    private var target: Long = -1L

    override def prepareForTriggerAvailableNow(): Unit =
      target = latestVersion

    override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

    override def initialOffset(): SOffset = VersionOffset(0L)

    override def latestOffset(): SOffset =
      throw new UnsupportedOperationException(
        "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

    override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
      val s = start.asInstanceOf[VersionOffset].v
      val cap = if (target >= 0) target else latestVersion
      VersionOffset(math.min(cap, s + 1))
    }

    override def reportLatestOffset(): SOffset =
      VersionOffset(if (target >= 0) target else latestVersion)

    override def deserializeOffset(json: String): SOffset =
      VersionOffset(json.trim.toLong)

    override def planInputPartitions(start: SOffset,
        end: SOffset): Array[org.apache.spark.sql.connector.read.InputPartition] = {
      val s = start.asInstanceOf[VersionOffset].v
      val e = end.asInstanceOf[VersionOffset].v
      val fs = new Path(path).getFileSystem(new Configuration())
      ((s + 1) to e).flatMap { v =>
        val mf = new Path(path, s"$ManifestFile.v$v")
        if (!fs.exists(mf)) {
          // this commit was VACUUMed away before the consumer saw it
          if (failOnDataLoss) throw new IllegalStateException(
            s"commit feed offset $s is below the earliest retained " +
              s"version of $path (snapshot v$v was expired); rows are " +
              s"lost — restart from a fresh checkpoint, or set " +
              s"option(\"failOnDataLoss\", false) to skip")
          org.slf4j.LoggerFactory.getLogger(classOf[CommitFeedStream])
            .warn(s"skipping expired snapshot v$v of $path " +
              s"(failOnDataLoss=false)")
          Seq.empty
        } else {
          val fresh = readManifestOf(path, v.toInt)
            .filter(_.startsWith(s"v$v-")) // fresh in THIS commit
          // (fileName, op): plain mode serves fresh files untyped;
          // changelog mode serves the CDC delete image (if any) plus
          // fresh files as inserts unless the sidecar marked them as
          // survivor rewrites (`!fresh=skip`)
          val typed: Seq[(String, String)] =
            if (!changelog) fresh.map(n => (n, null))
            else cdcFilesOf(path, v.toInt) match {
              case Some((mode, dels)) =>
                dels.map(n => (n, "delete")) ++
                  (if (mode == "insert") fresh.map(n => (n, "insert"))
                   else Seq.empty)
              case None => fresh.map(n => (n, "insert"))
            }
          val maps = idxMapsFor(path, typed.map(_._1), schema)
          typed.map { case (n, op) =>
            TsvFilePartition(new Path(path, n).toString, maps(n), op, v,
              Array.empty, outCodes)
              : org.apache.spark.sql.connector.read.InputPartition
          }
        }
      }.toArray
    }

    override def createReaderFactory()
        : org.apache.spark.sql.connector.read.PartitionReaderFactory =
      new TsvReaderFactory(schema)

    override def commit(end: SOffset): Unit = ()
    override def stop(): Unit = ()
  }

  private class TsvReaderFactory(schema: StructType)
      extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
    override def createReader(
        p: org.apache.spark.sql.connector.read.InputPartition)
        : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
      val fp = p match {
        case b: BucketedTsvFilePartition => b.base
        case t: TsvFilePartition => t
      }
      new TsvRowReader(fp.file, schema, fp.idxMap, fp, fp.deletes)
    }
  }

  /** `idxMap` resolves each FULL-schema field to its cell in THIS
    * file's layout (-1 = absent → NULL); `deletes` are the applicable
    * merge-on-read predicates, evaluated per row against the full
    * decoded line with SQL three-valued semantics (condition TRUE ⇒
    * row hidden) — which is why the full line decodes even under a
    * pruned projection. The emitted row follows `part.outCodes`
    * (pruned columns, `_file`, changelog op/version). */
  private class TsvRowReader(file: String, schema: StructType,
      idxMap: Array[Int], part: TsvFilePartition,
      deletes: Array[String] = Array.empty)
      extends org.apache.spark.sql.connector.read
        .PartitionReader[InternalRow] {
    private val in =
      new Path(file).getFileSystem(new Configuration())
        .open(new Path(file))
    private val lines =
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
    private val delFilters = deletes.map(filterFromJson)
    // equality-delete pre-image sets: key = raw cells at the spec's
    // positions, tab-joined (field-id order on both sides — see
    // applicableEqDeletes). Memory is bounded by the matched-row
    // count of the merge that wrote them — the standard merge-on-read
    // read-side cost. Cached PER EXECUTOR JVM (soft refs, immutable
    // files): a 1000-file scan loads each pre-image set once, not
    // once per task.
    private val eqSets: Array[(java.util.HashSet[String], Array[Int])] =
      part.eqDeletes.map { spec =>
        val root = jmapper.readTree(spec)
        def ints(k: String): Array[Int] = {
          val b = scala.collection.mutable.ArrayBuffer[Int]()
          val it = root.get(k).elements()
          while (it.hasNext) b += it.next().asInt()
          b.toArray
        }
        val ord = ints("ord"); val idx = ints("idx")
        val files = scala.collection.mutable.ArrayBuffer[String]()
        val fit = root.get("files").elements()
        while (fit.hasNext) files += fit.next().asText()
        (EqDeleteCache.get(files.toSeq, ord), idx)
      }
    private val fieldIdx: Map[String, Int] =
      schema.fields.zipWithIndex.map { case (f, i) => f.name -> i }.toMap
    // every planner path sets outCodes explicitly; an EMPTY array is a
    // legitimate zero-width projection (count(*) over a pruned scan)
    private val outCodes: Array[Int] = part.outCodes
    private val fileName = new Path(file).getName
    private var cur: InternalRow = _
    override def next(): Boolean = {
      while (lines.hasNext) {
        val cells = lines.next().split("\t", -1)
        val base = schema.fields.zipWithIndex.map[Any] { case (f, i) =>
          val j = idxMap(i)
          val s = if (j >= 0 && j < cells.length) cells(j) else ""
          if (s.isEmpty) null // "" encodes NULL (all types)
          else f.dataType match {
            case LongType => s.toLong
            case DoubleType => s.toDouble
            case StringType =>
              org.apache.spark.unsafe.types.UTF8String.fromString(s)
            case dt => throw new IllegalArgumentException(
              s"unsupported $dt")
          }
        }
        def cell(name: String): Any = base(fieldIdx(name)) match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case other => other
        }
        def rawCell(i: Int): String = {
          val j = idxMap(i)
          if (j >= 0 && j < cells.length) cells(j) else ""
        }
        val hidden = delFilters.exists(f =>
          evalFilter(f, cell).contains(true)) ||
          eqSets.exists { case (set, idx) =>
            set.contains(idx.map(rawCell).mkString("\t")) }
        if (!hidden) {
          val vals: Array[Any] = outCodes.map {
            case i if i >= 0 => base(i)
            case -2 => org.apache.spark.unsafe.types.UTF8String
              .fromString(fileName)
            case -3 => org.apache.spark.unsafe.types.UTF8String
              .fromString(part.op)
            case -4 => part.version: Any
            case -5 => org.apache.spark.unsafe.types.UTF8String
              .fromString(schema.fields.indices
                .map(rawCell).mkString("\t"))
          }
          cur = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(vals)
          return true
        }
      }
      false
    }
    override def get(): InternalRow = cur
    override def close(): Unit = in.close()
  }

  /** [[SinkTable.newRowLevelOperationBuilder]]'s operation —
    * GROUP-FILTERED copy-on-write (the Iceberg COW contract): the
    * scan reads the AFFECTED files (Spark pushes the command's
    * condition; partition predicates prune whole files) and records
    * which ones it planned; the write's commit replaces EXACTLY those
    * files — every unread file carries forward untouched, so a
    * partition-scoped UPDATE rewrites only the touched partitions,
    * not the table. MOR predicates apply in the scan (a MERGE over a
    * merge-on-read table merges the VISIBLE rows). The CDC sidecar
    * lists the replaced files as the delete image by reference
    * (`!fresh=insert`, the INSERT OVERWRITE convention), so changelog
    * replay equality holds file-exactly. */
  private class GroupRewriteOperation(path: String, schema: StructType,
      cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
      partitionCols: Seq[String] = Seq.empty,
      bucket: Option[(String, Int)] = None)
      extends org.apache.spark.sql.connector.write.RowLevelOperation {
    // the file set the rewrite's scan planned (driver-side, set at
    // planInputPartitions — always before the write's commit); null
    // until planned, in which case the commit FAILS: a rewrite must
    // never delete files it did not read, so "scan never planned" is
    // a loud error, not a conservative whole-snapshot replacement
    private val scanned = new java.util.concurrent.atomic
      .AtomicReference[Seq[String]](null)
    // conflict-check basis, captured ONCE at operation creation — the
    // earliest point of the MERGE/UPDATE's multi-pass execution (the
    // runtime group-filter subquery runs before the row-level scan
    // plans, so a basis captured at planInputPartitions would admit
    // an append that the subquery's older snapshot never saw: its
    // matching rows would silently not merge). Commit refuses if any
    // commit landed after this — the Iceberg
    // validate-from-scan-snapshot pattern.
    private val basisAtCreation: Int =
      versionsOf(path).lastOption.getOrElse(0)
    override def command()
        : org.apache.spark.sql.connector.write.RowLevelOperation.Command =
      cmd
    override def description(): String = s"AtomicGroupRewrite($cmd)"
    /** `_file` is required so the rewrite runs as a
      * data-and-metadata write: Spark's ReplaceDataExec applies its
      * row projection (stripping `__row_operation`) only when a
      * metadata projection exists — the same contract every
      * group-based format relies on. The metadata row reaches the
      * writer through the two-arg `DataWriter.write(meta, row)`,
      * whose default discards it. */
    override def requiredMetadataAttributes()
        : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column("_file"))
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : org.apache.spark.sql.connector.read.ScanBuilder =
      new TsvScanBuilder(path, schema, None, changelog = false,
        failOnDataLoss = true, partitionCols = partitionCols,
        onPlanned = fs => scanned.set(fs),
        runtimeGroupFilter = true, bucketSpec = bucket)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder {
        override def build(): Write = {
          def batch(): BatchWrite = {
            // the rewrite plan's write schema is NOT guaranteed to be
            // in table-schema order — publish the layout in the order
            // the files are actually written (field ids resolved by
            // NAME against the table schema), or the commit's readers
            // would map cells to the wrong columns
            val idOfName = schema.fields
              .flatMap(f => AtomicSink.fieldIdOf(f).map(f.name -> _))
              .toMap
            val ids = info.schema().fields.map(f => idOfName.get(f.name))
            val layout =
              if (ids.nonEmpty && ids.forall(_.isDefined))
                Some(ids.flatten.toSeq)
              else None
            // resolved at COMMIT (after the scan planned): replace the
            // scanned files, carry every other current file forward;
            // refuse on a claim collision or a moved basis (a rewrite
            // must never publish over a snapshot it did not read)
            val affected = () => Option(scanned.get).getOrElse(
              throw new IllegalStateException(
                s"group rewrite of $path committing without a planned " +
                  s"row-level scan — refusing: a rewrite must never " +
                  s"delete files it did not read"))
            new AtomicBatchWrite(path, info.queryId(), info.schema(),
              () => {
                val a = affected().toSet
                committedFilesOf(path).filterNot(a)
              },
              layout,
              truncatedPrev = affected,
              partIdx = bucket match {
                case Some((c, _)) => Array(info.schema().fieldIndex(c))
                case None =>
                  partitionCols.map(info.schema().fieldIndex).toArray
              },
              conflictRetry = false,
              expectedBasis = () => Some(basisAtCreation),
              bucketN = bucket.map(_._2).getOrElse(0))
          }
          // a rewrite of a PARTITIONED/BUCKETED table re-clusters and
          // republishes per-file tuples, so the table stays prunable
          // (and join-co-partitioned) after a MERGE
          if (partitionCols.isEmpty && bucket.isEmpty)
            new Write { override def toBatch: BatchWrite = batch() }
          else
            new Write with org.apache.spark.sql.connector.write
              .RequiresDistributionAndOrdering {
              override def requiredDistribution()
                  : org.apache.spark.sql.connector.distributions.Distribution =
                org.apache.spark.sql.connector.distributions.Distributions
                  .clustered(
                    bucket.map(b => Seq(b._1)).getOrElse(partitionCols)
                      .map(n =>
                        org.apache.spark.sql.connector.expressions
                          .Expressions.column(n): org.apache.spark.sql
                          .connector.expressions.Expression).toArray)
              override def requiredOrdering()
                  : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
                Array.empty
              override def toBatch: BatchWrite = batch()
            }
        }
      }
  }

  /** MERGE-ON-READ row-level DML (`spark.graft.atomic.dmlMode = mor`)
    * — the DELTA-based operation ([[SupportsDelta]], the Iceberg-v2
    * merge-on-read shape): Spark's MERGE/UPDATE/DELETE rewrite plans
    * emit ONLY the CHANGED rows (updates split into delete+insert via
    * `representUpdateAsDeleteAndInsert`), and the commit publishes
    * equality-delete files (full-row pre-images, `v<k>-eqdel-*`,
    * referenced from `_DELETES.v<k>` with a field-id column map) next
    * to fresh insert files — every existing file carries forward BY
    * REFERENCE. This is the honest 100 TB MERGE when matched rows
    * smear across most files and the copy-on-write runtime group
    * filter can't narrow: write cost ∝ changed rows, never ∝ table
    * size; readers pay a bounded pre-image set per applicable merge
    * until compaction retires it. The row ID is the FULL ROW (the
    * pre-image came from the table, so deleting rows equal to it on
    * every column is exact — identical duplicates each emit their own
    * delete and all fall together, matching MERGE semantics). */
  private class DeltaRowLevelOperation(path: String, schema: StructType,
      cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
      partitionCols: Seq[String] = Seq.empty,
      bucket: Option[(String, Int)] = None)
      extends org.apache.spark.sql.connector.write.RowLevelOperation
      with org.apache.spark.sql.connector.write.SupportsDelta {
    private val basisAtCreation: Int =
      versionsOf(path).lastOption.getOrElse(0)
    override def command()
        : org.apache.spark.sql.connector.write.RowLevelOperation.Command =
      cmd
    override def description(): String = s"AtomicDeltaRewrite($cmd)"
    override def rowId()
        : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      // `_row` (the canonical raw-row metadata column) and not the
      // data columns: Spark refuses NULLABLE row-id attributes, and
      // the canonical encoding is the equality key anyway
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column("_row"))
    override def representUpdateAsDeleteAndInsert(): Boolean = true
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : org.apache.spark.sql.connector.read.ScanBuilder =
      new TsvScanBuilder(path, schema, None, changelog = false,
        failOnDataLoss = true, partitionCols = partitionCols,
        bucketSpec = bucket)
    override def newWriteBuilder(info: LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
      new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
        override def build()
            : org.apache.spark.sql.connector.write.DeltaWrite =
          new org.apache.spark.sql.connector.write.DeltaWrite {
            override def toBatch()
                : org.apache.spark.sql.connector.write.DeltaBatchWrite = {
              val idOfName = schema.fields
                .flatMap(f => AtomicSink.fieldIdOf(f).map(f.name -> _))
                .toMap
              val dataIds = info.schema().fields.map(f =>
                idOfName.getOrElse(f.name, throw new IllegalStateException(
                  s"merge-on-read DML requires a catalog table (field " +
                    s"ids) — column ${f.name} has none")))
              // eqdel pre-images are `_row` encodings in TABLE-schema
              // order; the commit layout (dataIds) must match so the
              // changelog face decodes them like any delete image
              require(info.schema().fieldNames
                .sameElements(schema.fieldNames),
                s"delta write schema ${info.schema().fieldNames.toSeq} " +
                  s"!= table schema ${schema.fieldNames.toSeq}")
              new AtomicDeltaBatchWrite(path, info.queryId(),
                info.schema(), dataIds.toSeq,
                bucket match {
                  case Some((c, _)) => Array(info.schema().fieldIndex(c))
                  case None =>
                    partitionCols.filter(info.schema().fieldNames.contains)
                      .map(info.schema().fieldIndex).toArray
                },
                basisAtCreation, bucketN = bucket.map(_._2).getOrElse(0))
            }
          }
      }
  }

  /** One delta task's staged output: insert files (with partition
    * tuples and column stats, like any write) plus at most one
    * equality-delete file of pre-image rows. */
  private case class DeltaStaged(
      inserts: Seq[(String, String)],
      stats: Map[String, Seq[(Int, String, String)]],
      eqdel: Option[String]) extends WriterCommitMessage

  private class DeltaTsvWriterFactory(path: String, queryId: String,
      dataSchema: StructType, partIdx: Array[Int], bucketN: Int = 0)
      extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long)
        : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
      new DeltaTsvWriter(path, queryId, dataSchema,
        partitionId, taskId, partIdx, bucketN)
  }

  /** Inserts delegate to the ordinary (partitioned) task writer;
    * deletes receive the `_row` canonical encoding (already in
    * current-schema order) and append it to one `eqdel-*` staging
    * file — the published pre-images share the commit's
    * `_LAYOUT.v<k>` and replay through the changelog face like any
    * delete image. */
  private class DeltaTsvWriter(path: String, queryId: String,
      dataSchema: StructType, partitionId: Int,
      taskId: Long, partIdx: Array[Int], bucketN: Int = 0)
      extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
    private val insertWriter: DataWriter[InternalRow] =
      if (partIdx.isEmpty)
        new TsvWriter(path, queryId, dataSchema, partitionId, taskId)
      else new PartitionedTsvWriter(path, queryId, dataSchema,
        partitionId, taskId, partIdx, bucketN)
    private val fs = new Path(path).getFileSystem(new Configuration())
    private val eqName = f"eqdel-$partitionId%05d-$taskId"
    private var eqOut: org.apache.hadoop.fs.FSDataOutputStream = _
    private var eqRows = 0L

    override def delete(meta: InternalRow, id: InternalRow): Unit = {
      if (eqOut == null)
        eqOut = fs.create(
          new Path(new Path(path, s"_staging_$queryId"), eqName), true)
      // id = the single `_row` column: the pre-image's canonical line
      eqOut.write((id.getUTF8String(0).toString + "\n")
        .getBytes("UTF-8"))
      eqRows += 1
    }
    override def update(meta: InternalRow, id: InternalRow,
        row: InternalRow): Unit = {
      // unreachable under representUpdateAsDeleteAndInsert, kept total
      delete(meta, id); insert(row)
    }
    override def insert(row: InternalRow): Unit = insertWriter.write(row)
    override def commit(): WriterCommitMessage = {
      if (eqOut != null) eqOut.close()
      val im = insertWriter.commit()
      val (ins, st) = im match {
        case StagedFile(n, s) =>
          (Seq((n, null: String)),
            if (s.nonEmpty) Map(n -> s)
            else Map.empty[String, Seq[(Int, String, String)]])
        case StagedParts(fs0, s) => (fs0, s)
        case _ => (Seq.empty, Map.empty[String, Seq[(Int, String, String)]])
      }
      DeltaStaged(ins, st, if (eqRows > 0) Some(eqName) else None)
    }
    override def abort(): Unit = {
      if (eqOut != null) eqOut.close()
      fs.delete(new Path(new Path(path, s"_staging_$queryId"), eqName),
        false)
      insertWriter.abort()
    }
    override def close(): Unit = insertWriter.close()
  }

  /** The delta commit: ONE claimed version publishing carried
    * manifest (every current file, by reference) + fresh insert files
    * + `_DELETES.v<k>` equality-delete spec. Basis-dependent refuse
    * semantics (captured at operation creation, like the group
    * rewrite). Zero-length staged files are dropped; a MERGE with no
    * matches and no inserts publishes nothing at all. */
  private class AtomicDeltaBatchWrite(path: String, queryId: String,
      dataSchema: StructType, dataIds: Seq[Long],
      partIdx: Array[Int], basis: Int, bucketN: Int = 0)
      extends org.apache.spark.sql.connector.write.DeltaBatchWrite {
    private def fs = new Path(path).getFileSystem(new Configuration())
    private def staging = new Path(path, s"_staging_$queryId")

    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.DeltaWriterFactory =
      new DeltaTsvWriterFactory(path, queryId, dataSchema, partIdx,
        bucketN)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val f = fs
      def len(n: String): Long =
        f.getFileStatus(new Path(staging, n)).getLen
      val all = messages.collect { case d: DeltaStaged => d }
      val inserts = all.flatMap(_.inserts)
        .filter { case (n, _) => len(n) > 0 }.sortBy(_._1)
      val stats = all.flatMap(_.stats).toMap
      val eqdels = all.flatMap(_.eqdel).sorted
      if (inserts.isEmpty && eqdels.isEmpty) {
        f.delete(staging, true); return // no-op DML: nothing changed
      }
      val version = AtomicSink.claimVersion(path, retry = false)
      def releaseAnd(t: Throwable): Nothing = {
        f.delete(new Path(path, s"_CLAIM.v$version"), false)
        f.delete(staging, true)
        throw t
      }
      try {
        val latest = AtomicSink.versionsOf(path).lastOption.getOrElse(0)
        if (latest != basis)
          throw new java.util.ConcurrentModificationException(
            s"$path moved to v$latest while this merge-on-read DML " +
              s"was computed against v$basis — re-run it")
        val carried = AtomicSink.committedFilesOf(path)
        val freshIns = inserts.map { case (n, _) => s"v$version-$n" }
        inserts.map(_._1).zip(freshIns).foreach { case (from, to) =>
          f.rename(new Path(staging, from), new Path(path, to))
        }
        val freshEq = eqdels.map(n => s"v$version-$n")
        eqdels.zip(freshEq).foreach { case (from, to) =>
          f.rename(new Path(staging, from), new Path(path, to))
        }
        def writeAtomic(target: Path, bytes: Array[Byte]): Unit = {
          val tmp = new Path(path, s"_DML.tmp-$queryId")
          val out = f.create(tmp, true)
          try out.write(bytes) finally out.close()
          f.rename(tmp, target)
        }
        // sidecars before the manifest, as always
        val partLines = inserts.zip(freshIns).collect {
          case ((_, p), to) if p != null => s"$to\t$p" }
        if (partLines.nonEmpty)
          writeAtomic(new Path(path, s"_PARTS.v$version"),
            partLines.mkString("", "\n", "\n").getBytes("UTF-8"))
        val mmLines = inserts.map(_._1).zip(freshIns).flatMap {
          case (from, to) => stats.getOrElse(from, Seq.empty).collect {
            case (ord, mn, mx) if ord < dataIds.length =>
              s"$to\t${dataIds(ord)}\t$mn\t$mx" } }
        if (mmLines.nonEmpty)
          writeAtomic(new Path(path, s"_MINMAX.v$version"),
            mmLines.mkString("", "\n", "\n").getBytes("UTF-8"))
        writeAtomic(new Path(path, s"_LAYOUT.v$version"),
          dataIds.mkString("", "\n", "\n").getBytes("UTF-8"))
        if (freshEq.nonEmpty) {
          val cols = new java.util.LinkedHashMap[String, Object]()
          dataSchema.fields.zip(dataIds).foreach { case (fl, id) =>
            cols.put(fl.name, Long.box(id)) }
          val root = new java.util.LinkedHashMap[String, Object]()
          root.put("cols", cols)
          val fl = new java.util.ArrayList[String]()
          freshEq.foreach(fl.add)
          root.put("eqfiles", fl)
          writeAtomic(new Path(path, s"_DELETES.v$version"),
            AtomicSink.jmapper.writeValueAsString(root).getBytes("UTF-8"))
        }
        val manifestBytes = (carried ++ freshIns)
          .mkString("", "\n", "\n").getBytes("UTF-8")
        writeAtomic(new Path(path,
          s"${AtomicSink.ManifestFile}.v$version"), manifestBytes)
        // changelog: pre-images replay as deletes, fresh files as
        // real inserts — the same op-typed shape as an overwrite
        AtomicSink.writeCdcList(path, version, "insert", freshEq)
        val legacy = new Path(path, AtomicSink.ManifestFile)
        f.delete(legacy, false)
        writeAtomic(legacy, manifestBytes)
        f.delete(staging, true)
      } catch {
        case t: Throwable =>
          if (!f.exists(new Path(path,
            s"${AtomicSink.ManifestFile}.v$version")))
            releaseAnd(t)
          else throw t
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      fs.delete(staging, true)
    }
  }

  /** `writeStream.toTable` into a catalog table: each non-empty epoch
    * publishes ONE commit through [[AtomicBatchWrite]]'s two-phase
    * protocol, with the (streaming query id, epoch id) recorded in an
    * `_EPOCH.v<N>` sidecar published before the manifest — a restart
    * that replays the last epoch finds its marker under a PUBLISHED
    * manifest and drops the duplicate attempt, turning the
    * micro-batch engine's at-least-once replay into exactly-once
    * COMMITS. The crash windows resolve safely in both directions:
    * marker-without-manifest (died pre-publish) is invisible to
    * [[epochCommitted]] so the replay re-commits; manifest always
    * implies marker (written before it). Empty epochs (all staged
    * files zero-length) publish nothing — one commit per NON-EMPTY
    * epoch. Complete output mode (`truncateEachEpoch`) replaces the
    * previous snapshot per epoch instead of appending. Reference
    * analogue: the resumable at-least-once loader
    * (etl_pipeline_spark.py:188-287) whose duplicate-on-crash window
    * this closes. */
  private class AtomicStreamingWrite(path: String, queryId: String,
      writeSchema: StructType, layout: Option[Seq[Long]],
      partIdx: Array[Int], partNames: Seq[String],
      truncateEachEpoch: Boolean, bucketN: Int = 0)
      extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

    private def epochQid(epochId: Long) = s"$queryId-e$epochId"

    override def createStreamingWriterFactory(info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.streaming
          .StreamingDataWriterFactory =
      // a standalone factory: an anonymous class here would capture
      // the (non-serializable) write instance into every task closure
      new StreamingTsvWriterFactory(path, queryId, writeSchema, partIdx,
        bucketN)

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val qid = epochQid(epochId)
      val stagingDir = new Path(path, s"_staging_$qid")
      val fs = stagingDir.getFileSystem(new Configuration())
      if (AtomicSink.epochCommitted(path, queryId, epochId)) {
        fs.delete(stagingDir, true) // replay of a published epoch
        return
      }
      // zero-length staged files are no-data tasks, not rows — an
      // all-empty epoch publishes no commit at all
      def len(n: String): Long =
        fs.getFileStatus(new Path(stagingDir, n)).getLen
      val live = messages.toSeq.flatMap {
        case StagedFile(name, st) =>
          if (len(name) > 0) Seq(StagedFile(name, st)) else Seq.empty
        case StagedParts(files, st) =>
          val keep = files.filter { case (n, _) => len(n) > 0 }
          if (keep.isEmpty) Seq.empty
          else Seq(StagedParts(keep,
            st.view.filterKeys(keep.map(_._1).toSet).toMap))
        case other => Seq(other)
      }
      if (live.isEmpty) { fs.delete(stagingDir, true); return }
      new AtomicBatchWrite(path, qid, writeSchema,
        carryForward =
          () => if (truncateEachEpoch) Seq.empty
                else AtomicSink.committedFilesOf(path),
        layout = layout,
        truncatedPrev =
          () => if (truncateEachEpoch) AtomicSink.committedFilesOf(path)
                else Seq.empty,
        partIdx = partIdx,
        partNames = partNames,
        epochMarker = Some(s"$queryId\t$epochId"),
        bucketN = bucketN)
        .commit(live.toArray)
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val stagingDir = new Path(path, s"_staging_${epochQid(epochId)}")
      stagingDir.getFileSystem(new Configuration())
        .delete(stagingDir, true)
    }
  }

  /** One row per PUBLISHED commit of the snapshot/operation log —
    * what `<t>__history` serves. Derived entirely from manifests and
    * sidecars at scan time: `operation` is the commit's honest
    * sidecar fingerprint (`append`; `stream-append` = epoch marker;
    * `delete-mor` = predicate-only commit; `delete-cow` = survivor
    * rewrite with a CDC delete image; `rewrite` = compaction (skip
    * mode, no image); `replace` = fresh files next to a delete image
    * — INSERT OVERWRITE and group-based MERGE/UPDATE both commit this
    * shape). n_fresh/n_carried split the manifest by the commit's own
    * version prefix. */
  private[io] def historyRows(path: String)
      : Seq[(Long, String, Long, Long, Long)] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    versionsOf(path).map { v =>
      val files = readManifestOf(path, v)
      val fresh = files.count(_.startsWith(s"v$v-"))
      val carried = files.size - fresh
      val op =
        if (fs.exists(new Path(path, s"_DELETES.v$v")))
          // a predicate delete writes no data files; a merge-on-read
          // MERGE commits equality-deletes PLUS fresh insert files
          (if (fresh > 0) "merge-mor" else "delete-mor")
        else if (fs.exists(new Path(path, s"_EPOCH.v$v"))) "stream-append"
        else cdcFilesOf(path, v) match {
          case Some(("insert", _)) => "replace"
          case Some(("skip", img)) if img.nonEmpty => "delete-cow"
          case Some(("skip", _)) => "rewrite"
          case _ => "append"
        }
      (v.toLong, op, files.size.toLong, fresh.toLong, carried.toLong)
    }
  }

  private[io] val HistorySchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("version", LongType, false),
    org.apache.spark.sql.types.StructField("operation", StringType, false),
    org.apache.spark.sql.types.StructField("n_files", LongType, false),
    org.apache.spark.sql.types.StructField("n_fresh", LongType, false),
    org.apache.spark.sql.types.StructField("n_carried", LongType, false)))

  /** `<t>__history` — the commit log as a read-only TABLE (the
    * Iceberg `.history`/`.snapshots` metadata-table shape): the
    * operability face a versioned table needs once multiple writers
    * exist. Metadata-scale: the rows are computed driver-side from
    * the manifests (bytes, not data) and shipped in one input
    * partition. */
  private[io] class HistoryTable(path: String) extends Table
      with org.apache.spark.sql.connector.catalog.SupportsRead {
    override def name(): String = s"atomic($path#history)"
    override def schema(): StructType = HistorySchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : org.apache.spark.sql.connector.read.ScanBuilder =
      () => new org.apache.spark.sql.connector.read.Scan
        with org.apache.spark.sql.connector.read.Batch {
        override def readSchema(): StructType = HistorySchema
        override def toBatch: org.apache.spark.sql.connector.read.Batch =
          this
        override def description(): String = s"AtomicHistoryScan($path)"
        override def planInputPartitions()
            : Array[org.apache.spark.sql.connector.read.InputPartition] =
          Array(HistoryPartition(historyRows(path)))
        override def createReaderFactory()
            : org.apache.spark.sql.connector.read.PartitionReaderFactory =
          new HistoryReaderFactory
      }
  }

  private case class HistoryPartition(
      rows: Seq[(Long, String, Long, Long, Long)])
      extends org.apache.spark.sql.connector.read.InputPartition

  private class HistoryReaderFactory
      extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
    override def createReader(
        p: org.apache.spark.sql.connector.read.InputPartition)
        : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
      new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
        private val it = p.asInstanceOf[HistoryPartition].rows.iterator
        private var cur: InternalRow = _
        override def next(): Boolean = it.hasNext && {
          val (v, op, nf, fr, ca) = it.next()
          cur = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](v,
              org.apache.spark.unsafe.types.UTF8String.fromString(op),
              nf, fr, ca))
          true
        }
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
  }

  /** Per-epoch task-writer factory: the epoch id lands in the staging
    * dir name (`_staging_<queryId>-e<epochId>`) so concurrent or
    * replayed epochs never share staging state. */
  private class StreamingTsvWriterFactory(path: String, queryId: String,
      writeSchema: StructType, partIdx: Array[Int], bucketN: Int = 0)
      extends org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] =
      if (partIdx.isEmpty)
        new TsvWriter(path, s"$queryId-e$epochId", writeSchema,
          partitionId, taskId)
      else new PartitionedTsvWriter(path, s"$queryId-e$epochId",
        writeSchema, partitionId, taskId, partIdx, bucketN)
  }

  /** True iff a PUBLISHED commit of `path` carries this epoch's
    * marker — `_EPOCH.v<k>` sidecars without a manifest (writer died
    * between marker and publish, claim still held) don't count, so
    * the idempotence check can never skip an epoch that was not
    * actually committed. */
  private[io] def epochCommitted(path: String, queryId: String,
      epochId: Long): Boolean = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val want = s"$queryId\t$epochId"
    versionsOf(path).exists { v =>
      val p = new Path(path, s"_EPOCH.v$v")
      fs.exists(p) && {
        val in = fs.open(p)
        val s =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        s == want
      }
    }
  }

  /** `truncatedPrev`: the files this commit DELETES — on an INSERT
    * OVERWRITE the whole previous snapshot, on a group rewrite the
    * replaced files — published as the commit's CDC delete image by
    * reference (the files are immutable). Both file lists are
    * FUNCTIONS, resolved inside `commit()` so a coordinating scan
    * (group rewrite) has planned by the time they evaluate. */
  /** `conflictRetry` / `expectedBasis`: the multi-writer posture (see
    * the claim-protocol note above) — appends retry past rivals;
    * basis-dependent rewrites refuse on a collision or on a basis
    * version that moved since they planned. */
  private class AtomicBatchWrite(path: String, queryId: String,
                                 schema: StructType,
                                 carryForward: () => Seq[String] =
                                   () => Seq.empty,
                                 layout: Option[Seq[Long]] = None,
                                 truncatedPrev: () => Seq[String] =
                                   () => Seq.empty,
                                 partIdx: Array[Int] = Array.empty,
                                 conflictRetry: Boolean = true,
                                 expectedBasis: () => Option[Int] =
                                   () => None,
                                 overwriteMode:
                                   Option[AtomicSink.OverwriteMode] = None,
                                 partNames: Seq[String] = Seq.empty,
                                 epochMarker: Option[String] = None,
                                 bucketN: Int = 0)
      extends BatchWrite {
    private def fs = new Path(path).getFileSystem(new Configuration())
    private def staging = new Path(path, s"_staging_$queryId")

    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DataWriterFactory =
      new TsvWriterFactory(path, queryId, schema, partIdx, bucketN)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val f = fs
      // SNAPSHOT versioning: published names carry the commit's
      // version prefix, so no later commit (or JVM restart reusing
      // task ids) can ever clobber an earlier snapshot's files —
      // which is what makes the retained `_MANIFEST.v<N>` manifests
      // honest time-travel reads, not just pointers into mutable
      // state. `carryForward` (catalog INSERT INTO) lists the
      // previous snapshot's files first: they keep their own version
      // prefixes and are never rewritten — the append is pure
      // manifest metadata.
      // CLAIM the version exclusively (multi-writer protocol above);
      // a refused or failed commit releases its own claim so it never
      // blocks later appends
      val version = AtomicSink.claimVersion(path, retry = conflictRetry)
      try {
        commitClaimed(f, version, messages)
      } catch {
        case t: Throwable =>
          // only reachable before the manifest rename — the commit
          // point — so releasing the claim is always safe here
          if (!f.exists(new Path(path,
            s"${AtomicSink.ManifestFile}.v$version")))
            f.delete(new Path(path, s"_CLAIM.v$version"), false)
          throw t
      }
    }

    private def commitClaimed(f: FileSystem, version: Int,
        messages: Array[WriterCommitMessage]): Unit = {
      // a BASIS-DEPENDENT commit (group rewrite, compaction) refuses
      // if the snapshot it computed from is no longer the latest —
      // an append that landed between its scan and its claim would
      // otherwise be silently dropped by the replacement manifest
      expectedBasis().foreach { b =>
        val latest = AtomicSink.versionsOf(path).lastOption.getOrElse(0)
        if (latest != b) throw new java.util.ConcurrentModificationException(
          s"$path moved to v$latest while this rewrite was computed " +
            s"against v$b — refusing to publish over the concurrent " +
            s"commit; re-run the operation")
      }
      // (stagedName, partitionTuple-or-null), one entry per file
      val staged: Seq[(String, String)] = messages.flatMap {
        case StagedFile(name, _) => Seq((name, null: String))
        case StagedParts(files, _) => files
      }.toSeq.sortBy(_._1)
      // per-staged-file column stats (write-schema ordinals)
      val statsByName: Map[String, Seq[(Int, String, String)]] =
        messages.flatMap {
          case StagedFile(name, st) if st.nonEmpty => Seq(name -> st)
          case StagedParts(_, st) => st.toSeq
          case _ => Seq.empty
        }.toMap
      // BOTH file lists resolve HERE — against the still-current
      // previous snapshot, before the new manifest publishes. The
      // partition-aware overwrite modes split the current snapshot by
      // each file's recorded tuple instead of using the caller's
      // carry/delete functions.
      val (carried, deleted) = overwriteMode match {
        case None => (carryForward(), truncatedPrev())
        case Some(mode) =>
          val current = AtomicSink.committedFilesOf(path)
          val tuples = AtomicSink.partsForFiles(path, current)
          val untupled = current.filterNot(tuples.contains)
          val types = partIdx.map(schema.fields(_).dataType)
          def cellOf(cells: Array[String])(name: String): Any = {
            val i = partNames.indexOf(name)
            val s = if (i >= 0 && i < cells.length) cells(i) else ""
            if (s.isEmpty) null
            else types(i) match {
              case LongType => s.toLong
              case DoubleType => s.toDouble
              case _ => s
            }
          }
          val replaced: Set[String] = mode match {
            case AtomicSink.StaticOverwrite(filters) =>
              // a partition-only predicate is constant per file: the
              // file is replaced iff EVERY conjunct is TRUE on its
              // tuple (= every row matches), carried otherwise. A
              // file without a tuple could straddle the boundary —
              // refuse loudly rather than guess.
              if (untupled.nonEmpty) throw new IllegalStateException(
                s"INSERT OVERWRITE by partition predicate on $path: " +
                  s"files ${untupled.take(3).mkString(", ")}… have no " +
                  s"recorded partition tuple (written before " +
                  s"partitioning) — compact the table first")
              current.filter(n => filters.forall(f =>
                AtomicSink.evalFilter(f, cellOf(tuples(n)))
                  .contains(true))).toSet
            case AtomicSink.DynamicOverwrite =>
              val freshTuples =
                staged.collect { case (_, t) if t != null => t }.toSet
              if (untupled.nonEmpty && freshTuples.nonEmpty)
                throw new IllegalStateException(
                  s"dynamic partition overwrite on $path: files " +
                    s"${untupled.take(3).mkString(", ")}… have no " +
                    s"recorded partition tuple — compact the table first")
              current.filter(n =>
                tuples.get(n).exists(c =>
                  freshTuples.contains(c.mkString("\t")))).toSet
          }
          (current.filterNot(replaced), current.filter(replaced))
      }
      val fresh = staged.map { case (n, _) => s"v$version-$n" }
      val names = carried ++ fresh
      staged.map(_._1).zip(fresh).foreach { case (from, to) =>
        f.rename(new Path(staging, from), new Path(path, to))
      }
      // per-file PARTITION TUPLES (`_PARTS.v<N>`, published-name →
      // tab-separated partition cells) — what the scan prunes against;
      // before the manifest like every sidecar, so a torn write is
      // invisible
      val partLines = staged.zip(fresh).collect {
        case ((_, p), to) if p != null => s"$to\t$p" }
      if (partLines.nonEmpty) {
        val tmp = new Path(path, s"_PARTS.tmp-$queryId")
        val out = f.create(tmp, true)
        try out.write(partLines.mkString("", "\n", "\n").getBytes("UTF-8"))
        finally out.close()
        f.rename(tmp, new Path(path, s"_PARTS.v$version"))
      }
      // per-file COLUMN MIN/MAX (`_MINMAX.v<N>`, published-name →
      // field-id → bounds) — data skipping for non-partition
      // predicates; field ids via the commit's layout, so id-less
      // writes simply record nothing
      layout.foreach { ids =>
        val mmLines = staged.map(_._1).zip(fresh).flatMap {
          case (from, to) =>
            statsByName.getOrElse(from, Seq.empty).collect {
              case (ord, mn, mx) if ord < ids.length =>
                s"$to\t${ids(ord)}\t$mn\t$mx"
            }
        }
        if (mmLines.nonEmpty) {
          val tmp = new Path(path, s"_MINMAX.tmp-$queryId")
          val out = f.create(tmp, true)
          try out.write(mmLines.mkString("", "\n", "\n").getBytes("UTF-8"))
          finally out.close()
          f.rename(tmp, new Path(path, s"_MINMAX.v$version"))
        }
      }
      def writeAtomic(target: Path): Unit = {
        val tmp = new Path(path, s"_MANIFEST.tmp-$queryId")
        val out = f.create(tmp, true)
        try out.write(names.mkString("", "\n", "\n").getBytes("UTF-8"))
        finally out.close()
        f.rename(tmp, target)
      }
      // the per-commit LAYOUT (ordered field ids of this commit's
      // fresh files) publishes BEFORE the manifest — a torn layout
      // without its manifest is invisible, a manifest without its
      // layout can't happen
      layout.foreach { ids =>
        val tmp = new Path(path, s"_LAYOUT.tmp-$queryId")
        val out = f.create(tmp, true)
        try out.write(ids.mkString("", "\n", "\n").getBytes("UTF-8"))
        finally out.close()
        f.rename(tmp, new Path(path, s"_LAYOUT.v$version"))
      }
      // a streaming epoch's idempotence marker publishes BEFORE the
      // manifest (same torn-write rule as every sidecar): a marker
      // without its manifest is ignored by epochCommitted, a manifest
      // always finds its marker
      epochMarker.foreach { m =>
        val tmp = new Path(path, s"_EPOCH.tmp-$queryId")
        val out = f.create(tmp, true)
        try out.write((m + "\n").getBytes("UTF-8")) finally out.close()
        f.rename(tmp, new Path(path, s"_EPOCH.v$version"))
      }
      // the versioned manifest's atomic rename to a NEVER-pre-existing
      // name IS the commit point (Hadoop rename cannot atomically
      // replace an existing file, so the fresh name per commit is
      // what makes the publish atomic); the legacy `_MANIFEST` view
      // is refreshed after via delete+rename — canonical readers
      // resolve the max version and never depend on it
      writeAtomic(new Path(path, s"${AtomicSink.ManifestFile}.v$version"))
      // an overwrite's/rewrite's changelog: the replaced files' rows
      // all delete, the fresh files are real inserts (`!fresh=insert`)
      if (deleted.nonEmpty)
        AtomicSink.writeCdcList(path, version, "insert", deleted)
      val legacy = new Path(path, AtomicSink.ManifestFile)
      f.delete(legacy, false)
      writeAtomic(legacy)
      f.delete(staging, true)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      fs.delete(staging, true)
    }
  }

  /** `stats`: (write-schema ordinal, min, max) per column that saw at
    * least one non-null value — the commit translates ordinals to
    * FIELD IDS via its layout and publishes `_MINMAX.v<N>`. */
  private case class StagedFile(name: String,
      stats: Seq[(Int, String, String)] = Seq.empty)
      extends WriterCommitMessage

  /** One task's partitioned output: (stagedName, partitionTuple) per
    * file — the tuple is the partition cells tab-joined (the same
    * encoding as data cells, "" = NULL). `stats` keyed by staged
    * name. */
  private case class StagedParts(files: Seq[(String, String)],
      stats: Map[String, Seq[(Int, String, String)]] = Map.empty)
      extends WriterCommitMessage

  /** Running per-column min/max over one staged file's rows, in the
    * WRITE schema's order and types. Doubles give up on NaN (no total
    * order worth recording); empty strings track with the "" = NULL
    * encoding and are skipped like nulls; unsupported types never
    * record. String order is UTF8String binary order — the same order
    * Spark sorts and compares by. */
  private class ColStats(schema: StructType) {
    private val n = schema.fields.length
    private val minL = new Array[Long](n)
    private val maxL = new Array[Long](n)
    private val minD = new Array[Double](n)
    private val maxD = new Array[Double](n)
    private val minS =
      new Array[org.apache.spark.unsafe.types.UTF8String](n)
    private val maxS =
      new Array[org.apache.spark.unsafe.types.UTF8String](n)
    private val seen = new Array[Boolean](n)
    private val dead = new Array[Boolean](n)

    def update(row: InternalRow): Unit = {
      var i = 0
      while (i < n) {
        if (!dead(i) && !row.isNullAt(i)) schema.fields(i).dataType match {
          case LongType =>
            val v = row.getLong(i)
            if (!seen(i) || v < minL(i)) minL(i) = v
            if (!seen(i) || v > maxL(i)) maxL(i) = v
            seen(i) = true
          case DoubleType =>
            // canonicalize -0.0 to 0.0 so published bounds never
            // depend on the sign of an IEEE zero (the skipper also
            // compares with == first, belt and braces)
            val v0 = row.getDouble(i)
            val v = if (v0 == 0.0d) 0.0d else v0
            if (v.isNaN) dead(i) = true
            else {
              if (!seen(i) || v < minD(i)) minD(i) = v
              if (!seen(i) || v > maxD(i)) maxD(i) = v
              seen(i) = true
            }
          case StringType =>
            val v = row.getUTF8String(i)
            if (v.numBytes() > 0) {
              // clone: the row's UTF8String points into a reused buffer
              if (!seen(i) || v.compareTo(minS(i)) < 0) minS(i) = v.clone()
              if (!seen(i) || v.compareTo(maxS(i)) > 0) maxS(i) = v.clone()
              seen(i) = true
            }
          case _ => dead(i) = true
        }
        i += 1
      }
    }

    def result(): Seq[(Int, String, String)] =
      (0 until n).flatMap { i =>
        if (!seen(i) || dead(i)) None
        else schema.fields(i).dataType match {
          case LongType => Some((i, minL(i).toString, maxL(i).toString))
          case DoubleType => Some((i, minD(i).toString, maxD(i).toString))
          case StringType => Some((i, minS(i).toString, maxS(i).toString))
          case _ => None
        }
      }
  }

  private class TsvWriterFactory(path: String, queryId: String,
                                 schema: StructType,
                                 partIdx: Array[Int] = Array.empty,
                                 bucketN: Int = 0)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int,
                              taskId: Long): DataWriter[InternalRow] =
      if (partIdx.isEmpty)
        new TsvWriter(path, queryId, schema, partitionId, taskId)
      else new PartitionedTsvWriter(path, queryId, schema, partitionId,
        taskId, partIdx, bucketN)
  }

  private def renderCell(row: InternalRow, schema: StructType,
      i: Int): String =
    if (row.isNullAt(i)) ""
    else schema.fields(i).dataType match {
      case LongType => row.getLong(i).toString
      case DoubleType => row.getDouble(i).toString
      case StringType => row.getUTF8String(i).toString
      case dt => throw new IllegalArgumentException(
        s"AtomicSink supports long/double/string, got $dt")
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
    private val stats = new ColStats(schema)

    override def write(row: InternalRow): Unit = {
      stats.update(row)
      val cols = schema.fields.indices.map(renderCell(row, schema, _))
      out.write((cols.mkString("\t") + "\n").getBytes("UTF-8"))
    }

    override def commit(): WriterCommitMessage = {
      out.close()
      StagedFile(name, stats.result())
    }

    override def abort(): Unit = {
      out.close()
      fs.delete(file, false)
    }

    override def close(): Unit = ()
  }

  /** Dynamic-partition writer: one staging file PER PARTITION VALUE a
    * task sees (the write required a clustered distribution, so a
    * task holds whole partitions and the per-task file count is the
    * task's distinct-partition count, not a fan-out). Each file
    * reports its partition tuple for the commit's `_PARTS.v<N>`. */
  private class PartitionedTsvWriter(path: String, queryId: String,
      schema: StructType, partitionId: Int, taskId: Long,
      partIdx: Array[Int], bucketN: Int = 0)
      extends DataWriter[InternalRow] {
    private val fs =
      new Path(path).getFileSystem(new Configuration())
    private val open = scala.collection.mutable.LinkedHashMap[
      String, (String, org.apache.hadoop.fs.FSDataOutputStream, ColStats)]()

    override def write(row: InternalRow): Unit = {
      // bucketN > 0: the tuple IS the bucket number of the single
      // bucket column (same function as the catalog's `bucket`
      // ScalarFunction — the storage-partitioned-join contract)
      val tuple =
        if (bucketN > 0)
          AtomicCatalog.bucketOfCell(
            renderCell(row, schema, partIdx(0)), bucketN).toString
        else partIdx.map(renderCell(row, schema, _)).mkString("\t")
      val (_, out, stats) = open.getOrElseUpdate(tuple, {
        val name = f"part-$partitionId%05d-$taskId-${open.size}"
        (name, fs.create(
          new Path(new Path(path, s"_staging_$queryId"), name), true),
          new ColStats(schema))
      })
      stats.update(row)
      val cols = schema.fields.indices.map(renderCell(row, schema, _))
      out.write((cols.mkString("\t") + "\n").getBytes("UTF-8"))
    }

    override def commit(): WriterCommitMessage = {
      open.values.foreach(_._2.close())
      StagedParts(
        open.map { case (tuple, (name, _, _)) => (name, tuple) }.toSeq,
        open.values.map { case (name, _, st) => name -> st.result() }
          .toMap)
    }

    override def abort(): Unit = {
      open.values.foreach { case (name, out, _) =>
        out.close()
        fs.delete(new Path(new Path(path, s"_staging_$queryId"), name),
          false)
      }
    }

    override def close(): Unit = ()
  }
}
