package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** DataSource V2 deterministic row generator — the scale-out form of
  * the reference's driver-side constant-range generator (SURVEY §2.1
  * S4, `etl_pipeline_spark.py:172`: a date range materialized on one
  * node): `spark.read.format("graft.sources.GenSource")
  * .option("rows", n).option("parts", p).load()` plans `p` parallel
  * input partitions, each synthesizing its half-open id slice with
  * pure integer formulas — nothing is read, shuffled, or collected,
  * and the same ids always yield the same rows on any cluster.
  *
  * Implements `SupportsPushDownRequiredColumns`: a projection reaches
  * the reader, which materializes ONLY the requested fields (verified
  * by GenSourceSpec against the scan's pruned readSchema). Implements
  * `SupportsPushDownFilters`: range predicates on `id` clamp the
  * generated interval itself — filtered-out ids are never
  * materialized, the generator-source analog of parquet row-group
  * pruning (non-`id` predicates stay residual for Spark). Because
  * every column is a closed integer formula of `id`, the source is
  * oracle-verifiable — q117's DuckDB twin evaluates the identical
  * formulas over `range(n)`.
  *
  * Columns: `id` ∈ [0, rows); `h = (id mod P)·A mod P` (the engine's
  * bijective multiplicative hash); `bucket = h mod 1000`;
  * `cents = (h div 1000) mod 100000`; under `keyed`, additionally
  * `g = id mod parts` — the storage partition key (below).
  *
  * ===Storage-partitioned reads (`keyed=true`)===
  * Each input partition becomes one residue class `id ≡ p (mod
  * parts)` instead of a contiguous slice, carries its key through
  * `HasPartitionKey`, and the scan reports
  * `KeyGroupedPartitioning(identity(g), parts)` — the DSv2 contract
  * behind storage-partitioned joins. With
  * `spark.sql.sources.v2.bucketing.enabled=true`, Spark plans a
  * `groupBy(g)` aggregate with NO shuffle (the scan already satisfies
  * the clustered distribution) and joins two keyed generators whose
  * join keys cover `g` WITHOUT exchanging either side — the layout
  * contract that makes a 100 TB fact⋈fact join shuffle-free when both
  * sides share bucketing. The partitioning is reported only while `g`
  * survives column pruning; otherwise the scan declares itself
  * unknown-partitioned (the report must resolve against the pruned
  * output schema).
  *
  * ===Columnar reads (`columnar=true`)===
  * The reader factory declares `supportColumnarReads` and emits
  * 4096-row `ColumnarBatch`es of on-heap long vectors instead of
  * one `InternalRow` per id — the vectorized half of the Tungsten
  * contract (parquet's `Batched: true` path), letting the scan feed
  * whole-stage codegen through `ColumnarToRow` with one virtual call
  * per batch rather than per row. Row and columnar paths generate
  * identical values from the same formulas (GenSourceSpec proves it),
  * and both compose with every pushdown this source implements.
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("keyed", false)) GenSource.KeyedSchema
    else GenSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new GenSource.GenTable(
      opts.getOrElse("rows", "1000").toLong,
      opts.getOrElse("parts", "8").toInt,
      opts.get("keyed").exists(_.toBoolean),
      opts.get("columnar").exists(_.toBoolean),
      opts.getOrElse("rowsPerBatch", "0").toLong)
  }
}

object GenSource {
  val P = 2147483647L
  val A = 2654435761L

  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  /** `keyed` adds the storage partition key `g = id mod parts`. */
  val KeyedSchema: StructType =
    StructType(Schema.fields :+ StructField("g", LongType, nullable = false))

  private[sources] class GenTable(rows: Long, parts: Int, keyed: Boolean,
      columnar: Boolean, rowsPerBatch: Long = 0L)
      extends Table with SupportsRead
      with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
    override def name(): String = s"gen($rows rows, $parts parts)"
    override def schema(): StructType = if (keyed) KeyedSchema else Schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ)

    /** METADATA columns — present only when a query names them (the
      * `_metadata` contract file sources give Spark): `_h` is the raw
      * bijective hash every visible column derives from, the
      * provenance a debugging session otherwise recomputes by hand.
      * Unreferenced, it never reaches the reader (the pruned
      * readSchema simply does not contain it — GenSourceSpec pins
      * both directions). */
    override def metadataColumns()
        : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
      Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_h"
        override def dataType(): org.apache.spark.sql.types.DataType =
          LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "raw multiplicative hash (id mod P)*A mod P underlying " +
            "bucket and cents"
      })

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new GenScanBuilder(rows, parts, keyed, columnar, rowsPerBatch)
  }

  private class GenScanBuilder(rows: Long, parts: Int, keyed: Boolean,
      columnar: Boolean, rowsPerBatch: Long = 0L)
      extends ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
      with org.apache.spark.sql.connector.read.SupportsPushDownLimit
      with org.apache.spark.sql.connector.read.SupportsPushDownOffset
      with org.apache.spark.sql.connector.read.SupportsPushDownTableSample {
    private var required: StructType = if (keyed) KeyedSchema else Schema
    private var lo = 0L
    private var hi = rows
    private var limited = false
    // sampled rows keep ids with h ∈ [sampleHLo, sampleHHi)
    private var sampleHLo = 0L
    private var sampleHHi = P
    private var sampled = false

    /** TABLESAMPLE pushes as a DETERMINISTIC hash-systematic sample:
      * keep ids whose bijective hash h falls in [⌊lower·P⌋, ⌊upper·P⌋)
      * — the sampled ids are a fixed, slicing-independent subset of
      * the interval (exactly what makes the pushed sample
      * oracle-checkable), uniform because h is a bijection of
      * id mod P. The seed is deliberately ignored and the source owns
      * the sampling semantics — the DSv2 contract for a pushed sample
      * (Spark removes its own Sample node entirely). Refused with
      * replacement (a generator cannot duplicate interval rows), and
      * refused after a pushed LIMIT/OFFSET (those clamped the id
      * interval under whole-interval semantics; sampling beneath them
      * would reorder the two operators). */
    override def pushTableSample(lower: Double, upper: Double,
        withReplacement: Boolean, seed: Long): Boolean = {
      if (withReplacement || limited) false
      else {
        sampleHLo = math.max(0L, math.floor(lower * P).toLong)
        sampleHHi = math.min(P, math.floor(upper * P).toLong)
        sampled = true
        true
      }
    }

    /** LIMIT clamps the interval's far end — the generator emits
      * exactly the first `limit` ids of the (filter-clamped) range
      * instead of materializing the full interval for an upstream
      * GlobalLimit to discard: the DSv2 analog of stopping a file
      * scan after n rows. Deterministic (ids ascend from `lo`), so
      * LIMIT over this source is oracle-stable. Ignored under a
      * pushed aggregate (build() prefers the agg scan; aggregates
      * above a limit never reach one ScanBuilder anyway). */
    override def pushLimit(limit: Int): Boolean = {
      if (sampled) return false // the clamp assumes every id survives
      if (limit >= 0 && hi - lo > limit) hi = lo + limit
      limited = true
      true
    }

    /** OFFSET clamps the near end symmetrically (Spark pushes OFFSET
      * after LIMIT semantics are already applied to the plan, and
      * only when the whole prefix can be skipped): the generator
      * starts `offset` ids in instead of generating-and-discarding
      * them. Together with [[pushLimit]] this completes the
      * paginate-without-materializing story. */
    override def pushOffset(offset: Int): Boolean = {
      if (sampled) return false // the clamp assumes every id survives
      if (offset >= 0) lo = math.min(lo + offset, hi)
      limited = true
      true
    }
    private var accepted: Array[Filter] = Array.empty
    private var pushedAgg:
      Option[org.apache.spark.sql.connector.expressions.aggregate.Aggregation] =
      None

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    /** Range predicates on `id` clamp the generated interval itself —
      * the generator never materializes a filtered-out id, the exact
      * analog of parquet row-group pruning. Accepted filters are
      * honored COMPLETELY (interval arithmetic is exact), so they are
      * not returned as residuals and Spark plans no re-evaluation.
      * Bounds needing `v + 1` stay residual at v = Long.MaxValue —
      * the increment would wrap to Long.MinValue and silently clamp a
      * satisfiable predicate to the empty interval. */
    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      def lng(v: Any): Option[Long] = v match {
        case l: Long => Some(l)
        case i: Int => Some(i.toLong)
        case _ => None
      }
      def succ(v: Any): Option[Long] = lng(v).filter(_ != Long.MaxValue).map(_ + 1)
      val residual = filters.filter {
        case GreaterThanOrEqual("id", v) if lng(v).isDefined =>
          lo = math.max(lo, lng(v).get); false
        case GreaterThan("id", v) if succ(v).isDefined =>
          lo = math.max(lo, succ(v).get); false
        case LessThan("id", v) if lng(v).isDefined =>
          hi = math.min(hi, lng(v).get); false
        case LessThanOrEqual("id", v) if succ(v).isDefined =>
          hi = math.min(hi, succ(v).get); false
        case EqualTo("id", v) if succ(v).isDefined =>
          lo = math.max(lo, lng(v).get); hi = math.min(hi, succ(v).get); false
        case _ => true
      }
      accepted = filters.diff(residual)
      residual
    }
    override def pushedFilters(): Array[Filter] = accepted

    /** COUNT(star or id) / MIN(id) / MAX(id) / SUM(id) over the
      * (filter-clamped) interval are CLOSED FORMS — ungrouped:
      * count = hi−lo, min = lo, max = hi−1, sum = (lo+hi−1)(hi−lo)/2;
      * GROUPED BY the storage key `g` (keyed mode): the same forms on
      * each arithmetic progression {id ≡ p (mod parts)} ∩ [lo, hi) —
      * so the source answers them COMPLETELY without generating a
      * single row: the DSv2 aggregate-pushdown analog of a
      * footer-statistics answer, and the farthest point on the "never
      * materialize what a formula knows" axis this generator exists
      * to demonstrate. Any other grouping, non-id columns, and any
      * aggregate over a pushed SAMPLE (the forms assume every id
      * survives) stay with Spark. */
    private def aggHandled(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
        : Boolean = {
      import org.apache.spark.sql.connector.expressions.aggregate._
      def isField(e: org.apache.spark.sql.connector.expressions.Expression,
          name: String) =
        e match {
          case f: org.apache.spark.sql.connector.expressions.NamedReference =>
            f.fieldNames.sameElements(Array(name))
          case _ => false
        }
      def isId(e: org.apache.spark.sql.connector.expressions.Expression) =
        isField(e, "id")
      // exact sums stay in Long for every group iff they do for the
      // whole interval (each group's sum is a sub-sum of same-sign ids)
      def sumFits: Boolean = {
        val hi2 = math.max(lo, hi)
        val n = hi2 - lo
        n == 0 || ((BigInt(lo) + BigInt(hi2 - 1)) * n / 2).isValidLong
      }
      val groupedOnG = keyed && agg.groupByExpressions.length == 1 &&
        isField(agg.groupByExpressions.head, "g")
      !sampled &&
      (agg.groupByExpressions.isEmpty || groupedOnG) &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct && isId(c.column)
        case m: Min => isId(m.column)
        case m: Max => isId(m.column)
        // refuse the pushdown when the closed-form sum leaves Long:
        // the session runs ANSI (Spark 4 default), where the un-pushed
        // aggregate raises ARITHMETIC_OVERFLOW — a pushed scan
        // silently wrapping would change semantics, so overflow falls
        // back to the row-generating scan + Spark's own Sum
        case s: Sum => !s.isDistinct && isId(s.column) && sumFits
        case _ => false
      }
    }

    override def supportCompletePushDown(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
        : Boolean = aggHandled(agg)

    override def pushAggregation(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
        : Boolean = {
      if (!aggHandled(agg)) false
      else { pushedAgg = Some(agg); true }
    }

    override def build(): Scan = pushedAgg match {
      case Some(agg) => new GenAggScan(lo, math.max(lo, hi), agg,
        if (agg.groupByExpressions.nonEmpty) parts else 0)
      case None =>
        new GenScan(lo, math.max(lo, hi), parts, required, keyed, columnar,
          if (sampled) Some((sampleHLo, sampleHHi)) else None,
          rowsPerBatch)
    }
  }

  /** One-partition scan answering a completely-pushed aggregation
    * from the interval's closed forms. Ungrouped (`groups = 0`): one
    * row; empty interval: count/sum are 0 (non-null: count over zero
    * rows is 0 and the engine expects the scan to SAY so under
    * complete pushdown), min/max are NULL. Grouped on the storage key
    * `g` (`groups = parts`): one row per NONEMPTY residue class —
    * each an arithmetic progression first, first+m, … within
    * [lo, hi), so count n = ⌊(hi−1−first)/m⌋+1, min = first,
    * max = first+(n−1)m, sum = n·first + m·n(n−1)/2; SQL group-by
    * semantics emit NO row for an empty group. */
  private[graft] class GenAggScan(val lo: Long, val hi: Long,
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
      groups: Int)
      extends Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsReportStatistics {
    import org.apache.spark.sql.connector.expressions.aggregate._
    private val n = math.max(0L, hi - lo)

    /** A completely-pushed aggregate is at most max(1, groups) rows,
      * and says so. */
    override def estimateStatistics()
        : org.apache.spark.sql.connector.read.Statistics =
      new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(8L *
            (agg.aggregateExpressions.length + (if (groups > 0) 1 else 0)) *
            math.max(1, groups))
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.of(math.max(1, groups).toLong)
      }
    /** Closed forms over an arithmetic progression of `cnt` ids
      * starting at `first` with step `step`. */
    private def aggVals(first: Long, cnt: Long, step: Long): Array[Any] =
      agg.aggregateExpressions.map[Any] {
        case _: CountStar => cnt
        case _: Count => cnt // id is non-null
        case _: Min => if (cnt == 0) null else first
        case _: Max => if (cnt == 0) null else first + (cnt - 1) * step
        case _: Sum =>
          // aggHandled refused any interval whose whole-interval sum
          // leaves Long; every progression sum is a sub-sum of
          // same-sign ids, so this conversion is provably exact here
          if (cnt == 0) null
          else (BigInt(first) * cnt +
            BigInt(step) * cnt * (cnt - 1) / 2).toLong
      }
    private def rows: Seq[Array[Any]] =
      if (groups == 0) Seq(aggVals(lo, n, 1L))
      else (0 until groups).flatMap { p =>
        val first = lo + (((p - lo % groups) % groups + groups) % groups)
        if (first >= hi) None // empty group: no row, the SQL contract
        else {
          val cnt = (hi - 1 - first) / groups + 1
          Some((p.toLong: Any) +: aggVals(first, cnt, groups.toLong))
        }
      }
    override def readSchema(): StructType = StructType(
      (if (groups > 0)
        Seq(StructField("g", LongType, nullable = false))
      else Nil) ++
      agg.aggregateExpressions.zipWithIndex.map { case (e, i) =>
        StructField(s"agg$i", LongType, nullable = !(e match {
          case _: CountStar | _: Count => true
          case _ => false
        }))
      })
    override def toBatch: Batch = this
    override def description(): String =
      s"GenAggScan[$lo, $hi) pushed=${agg.aggregateExpressions.mkString(",")}" +
        (if (groups > 0) s" groupBy=g($groups)" else "")
    override def planInputPartitions(): Array[InputPartition] =
      Array(GenSlice(0L, 1L, 1L))
    override def createReaderFactory(): PartitionReaderFactory = {
      val out = rows
      new PartitionReaderFactory {
        override def createReader(p: InputPartition)
            : PartitionReader[InternalRow] =
          new PartitionReader[InternalRow] {
            private var i = -1
            override def next(): Boolean = { i += 1; i < out.length }
            override def get(): InternalRow =
              new GenericInternalRow(out(i))
            override def close(): Unit = ()
          }
      }
    }
  }

  private[graft] class GenScan(lo0: Long, hi0: Long, parts: Int,
      required: StructType, keyed: Boolean, columnar: Boolean,
      val sample: Option[(Long, Long)] = None,
      rowsPerBatch: Long = 0L)
      extends Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsReportStatistics
      with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
      with SupportsReportPartitioning
      with org.apache.spark.sql.connector.read.SupportsReportOrdering {
    private var loV = lo0
    private var hiV = hi0
    def lo: Long = loV
    def hi: Long = hiV

    /** RUNTIME filtering — the DSv2 analog of dynamic partition
      * pruning: when this scan probes a broadcast join, Spark hands
      * it the build side's `id` key set AT RUNTIME and the interval
      * clamps to that set's [min, max] hull before a single
      * partition is planned — a 10M-row interval joined against 50
      * dimension keys generates the hull, not the 10M. The hull is a
      * SUPERSET of the keys, which the contract allows (the join
      * re-applies its condition); interval arithmetic keeps the
      * pruning exact at the ends, the same guarantee the static
      * pushFilters path gives.
      *
      * Reported only while `id` survives column pruning: the planner
      * resolves these references against the PRUNED output (Spark's
      * PartitionPruning rule throws on a dangling one), and an
      * id-less projection has nothing to clamp anyway. */
    override def filterAttributes()
        : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      if (required.fieldNames.contains("id"))
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .column("id"))
      else Array.empty

    override def filter(
        filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
      filters.foreach {
        case org.apache.spark.sql.sources.In("id", values) =>
          val longs = values.collect {
            case l: Long => l
            case i: Int => i.toLong
          }
          if (longs.nonEmpty) {
            loV = math.max(loV, longs.min)
            hiV = math.min(hiV, longs.max + 1)
          } else hiV = loV // empty build side: nothing can match
        case _ => () // unsupported shapes: no pruning, still correct
      }

    override def readSchema(): StructType = required

    /** Keyed residue-class slices report the storage layout they
      * guarantee — `KeyGroupedPartitioning(identity(g), parts)` —
      * which Spark (under `spark.sql.sources.v2.bucketing.enabled`)
      * accepts in place of a shuffle for any aggregate or join whose
      * keys cover `g`: the storage-partitioned-join contract. Only
      * reported while `g` survives column pruning (the key must
      * resolve against the pruned output); contiguous slicing is
      * honest about being unknown. */
    override def outputPartitioning(): Partitioning =
      if (keyed && required.fieldNames.contains("g"))
        new KeyGroupedPartitioning(
          Array(Expressions.identity("g")), parts)
      else new UnknownPartitioning(parts)

    /** Every slice — contiguous or residue-stepped — generates ids in
      * ASCENDING order, and the scan says so (`SupportsReportOrdering`,
      * honored under `spark.sql.sources.v2.bucketing.sorting.enabled`):
      * a per-partition sort on `id` above this scan is provably
      * redundant and the planner drops the SortExec — the DSv2 analog
      * of a sorted-bucketed table's layout contract, and the last cell
      * of this source's pushdown matrix (columns, filters, aggregates,
      * limit, offset, statistics, runtime filters, partitioning,
      * ordering). Reported only while `id` survives pruning, same
      * resolution rule as the partitioning report. */
    override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      if (required.fieldNames.contains("id"))
        Array(Expressions.sort(Expressions.column("id"),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      else Array.empty

    /** EXACT statistics from the clamped interval — row count is
      * hi − lo by construction, bytes = rows × the pruned row width
      * (3 longs max). Spark's join planning reads these: a
      * filter-clamped generator side under the broadcast threshold
      * auto-broadcasts instead of shuffling both sides — the same
      * effect parquet footer counts give a file scan, and exactly
      * the decision a formula-backed source should make for free. */
    override def estimateStatistics()
        : org.apache.spark.sql.connector.read.Statistics =
      new org.apache.spark.sql.connector.read.Statistics {
        // a pushed sample keeps ~ (hHi − hLo)/P of the interval; the
        // hash is a bijection so the expectation is exact and the
        // estimate stays honest for join planning
        private val rows = sample match {
          case Some((hLo, hHi)) =>
            (BigInt(math.max(0L, hi - lo)) *
              math.max(0L, hHi - hLo) / P).toLong
          case None => math.max(0L, hi - lo)
        }
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(
            math.max(1L, rows) * (8L * math.max(1, required.size)))
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.of(rows)
      }
    override def toBatch: Batch = this

    /** The MICRO-BATCH face of the same interval — the id watermark
      * is the offset. A static deterministic source makes streaming
      * reads oracle-checkable: the union of all micro-batches is
      * provably the batch scan (same formulas, same interval), and
      * `rowsPerBatch` bounds each admission so a run under
      * Trigger.AvailableNow demonstrably accumulates across SEVERAL
      * batches rather than degenerating into one. */
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new GenMicroBatchStream(lo, hi, parts, required, sample,
        rowsPerBatch)

    override def description(): String =
      s"GenScan[$lo, $hi) parts=$parts cols=${required.fieldNames.mkString(",")}" +
        (if (keyed) " keyed" else "") + (if (columnar) " columnar" else "") +
        sample.map { case (a, b) => s" sample=h[$a,$b)" }.getOrElse("")
    override def planInputPartitions(): Array[InputPartition] =
      if (keyed) {
        // one residue class per partition: ids ≡ p (mod parts) within
        // [lo, hi) — same set of ids as contiguous slicing, different
        // (and REPORTED) layout
        (0 until parts).map { p =>
          val start = lo + (((p - lo % parts) % parts + parts) % parts)
          KeyedGenSlice(start, hi, parts.toLong, p.toLong): InputPartition
        }.toArray
      } else {
        val per = math.max(1L, (hi - lo + parts - 1) / parts)
        (lo until hi by per)
          .map(s => GenSlice(s, math.min(s + per, hi), 1L): InputPartition)
          .toArray
      }
    override def createReaderFactory(): PartitionReaderFactory =
      new GenReaderFactory(required.fieldNames, parts.toLong, columnar,
        sample)
  }

  private case class GenSlice(start: Long, end: Long, step: Long)
      extends InputPartition

  /** Offset = the exclusive upper bound of ids emitted so far. */
  private[graft] case class GenOffset(v: Long)
      extends org.apache.spark.sql.connector.read.streaming.Offset {
    override def json(): String = v.toString
  }

  /** Micro-batch stream over the generator interval [lo, hi):
    * offsets are plain id watermarks, each batch plans the slice
    * (start, end] it admitted, and replay of any committed range is
    * bit-identical because the rows are closed formulas of id — the
    * exactly-once contract comes for free from determinism.
    *
    * `SupportsAdmissionControl`: `rowsPerBatch` caps each admission
    * (the generator analog of maxFilesPerTrigger), so a bounded
    * interval still exercises real multi-batch accumulation;
    * `SupportsTriggerAvailableNow`: the target is pinned at prepare
    * time and `reportLatestOffset` serves it, so AvailableNow drains
    * the interval in ⌈(hi−lo)/rowsPerBatch⌉ batches and stops.
    * Column pruning and a pushed TABLESAMPLE arriving through the
    * batch ScanBuilder apply unchanged (the reader factory is the
    * batch one); at genuine scale each admitted slice still fans out
    * across `parts` input partitions.
    */
  private[graft] class GenMicroBatchStream(lo: Long, hi: Long, parts: Int,
      required: StructType, sample: Option[(Long, Long)],
      rowsPerBatch: Long)
      extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
    import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit, ReadMaxRows}

    override def prepareForTriggerAvailableNow(): Unit = ()

    override def getDefaultReadLimit: ReadLimit =
      if (rowsPerBatch > 0) ReadLimit.maxRows(rowsPerBatch)
      else ReadLimit.allAvailable()

    override def initialOffset(): SOffset = GenOffset(lo)

    override def latestOffset(): SOffset =
      throw new UnsupportedOperationException(
        "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

    override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
      val s = start.asInstanceOf[GenOffset].v
      limit match {
        case mr: ReadMaxRows => GenOffset(math.min(hi, s + mr.maxRows()))
        case _ => GenOffset(hi)
      }
    }

    override def reportLatestOffset(): SOffset = GenOffset(hi)

    override def deserializeOffset(json: String): SOffset =
      GenOffset(json.trim.toLong)

    override def planInputPartitions(start: SOffset,
        end: SOffset): Array[InputPartition] = {
      val s = start.asInstanceOf[GenOffset].v
      val e = end.asInstanceOf[GenOffset].v
      if (e <= s) Array.empty
      else {
        val per = math.max(1L, (e - s + parts - 1) / parts)
        (s until e by per)
          .map(x => GenSlice(x, math.min(x + per, e), 1L): InputPartition)
          .toArray
      }
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GenReaderFactory(required.fieldNames, parts.toLong,
        columnar = false, sample)

    override def commit(end: SOffset): Unit = ()
    override def stop(): Unit = ()
  }

  /** A residue-class slice that carries its partition key — the DSv2
    * handshake (`HasPartitionKey`) that lets Spark group input splits
    * by key value and trust the reported KeyGroupedPartitioning. */
  private case class KeyedGenSlice(start: Long, end: Long, step: Long,
      g: Long) extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow =
      new GenericInternalRow(Array[Any](g))
  }

  private class GenReaderFactory(fields: Array[String], partsL: Long,
      columnar: Boolean, sample: Option[(Long, Long)])
      extends PartitionReaderFactory {
    private def bounds(p: InputPartition): (Long, Long, Long) = p match {
      case GenSlice(s, e, st) => (s, e, st)
      case KeyedGenSlice(s, e, st, _) => (s, e, st)
    }
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val (s, e, st) = bounds(p)
      new GenReader(s, e, st, fields, partsL, sample)
    }
    override def supportColumnarReads(p: InputPartition): Boolean = columnar
    override def createColumnarReader(p: InputPartition)
        : PartitionReader[ColumnarBatch] = {
      val (s, e, st) = bounds(p)
      new GenColumnarReader(s, e, st, fields, partsL, sample)
    }
  }

  /** Shared per-id column formulas — the single source of truth for
    * the row and columnar readers (and, mod the SQL dialect, the
    * DuckDB oracles). */
  private def colValue(field: String, id: Long, partsL: Long): Long = {
    val h = (id % P) * A % P
    field match {
      case "id" => id
      case "bucket" => h % 1000L
      case "cents" => (h / 1000L) % 100000L
      case "g" => id % partsL
      case "_h" => h // metadata column: the hash itself
    }
  }

  /** True iff the id survives the pushed hash-systematic sample. */
  private def inSample(id: Long, sample: Option[(Long, Long)]): Boolean =
    sample match {
      case None => true
      case Some((hLo, hHi)) =>
        val h = (id % P) * A % P
        h >= hLo && h < hHi
    }

  private class GenReader(start: Long, end: Long, step: Long,
      fields: Array[String], partsL: Long, sample: Option[(Long, Long)])
      extends PartitionReader[InternalRow] {
    private var id = start - step
    override def next(): Boolean = {
      id += step
      while (id < end && !inSample(id, sample)) id += step
      id < end
    }
    override def get(): InternalRow =
      new GenericInternalRow(
        fields.map[Any](f => colValue(f, id, partsL)))
    override def close(): Unit = ()
  }

  /** Vectorized reader: fills 4096-row on-heap long vectors and hands
    * Spark one `ColumnarBatch` per fill — the `Batched: true` path.
    * The batch and its vectors are reused across `next()` calls (the
    * DSv2 columnar contract: the consumer finishes a batch before
    * asking for the next). */
  private class GenColumnarReader(start: Long, end: Long, step: Long,
      fields: Array[String], partsL: Long, sample: Option[(Long, Long)])
      extends PartitionReader[ColumnarBatch] {
    private val capacity = 4096
    private val vectors: Array[OnHeapColumnVector] =
      OnHeapColumnVector.allocateColumns(capacity,
        StructType(fields.map(f => StructField(f, LongType, false))))
    private val batch =
      new ColumnarBatch(vectors.map(v => v: ColumnVector))
    private var id = start

    override def next(): Boolean = {
      if (id >= end) return false
      var i = 0
      while (i < vectors.length) { vectors(i).reset(); i += 1 }
      var n = 0
      while (n < capacity && id < end) {
        if (inSample(id, sample)) {
          var c = 0
          while (c < fields.length) {
            vectors(c).putLong(n, colValue(fields(c), id, partsL))
            c += 1
          }
          n += 1
        }
        id += step
      }
      batch.setNumRows(n)
      true
    }
    override def get(): ColumnarBatch = batch
    override def close(): Unit = batch.close()
  }
}
