package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, Coalesce, Divide, EqualNullSafe, Expression, Literal, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, sum}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Materialized-view registry + the optimizer rule that rewrites
  * matching aggregates onto the pre-aggregated table — the classic
  * rollup-rewrite: a query grouping on a SUBSET of an MV's grouping
  * columns with algebraic aggregates (SUM, COUNT) re-aggregates the
  * MV's partials (`sum(sum_x)`, `sum(cnt)`) instead of scanning the
  * fact table. At 100 TB this turns a fact-table scan-and-shuffle
  * into a scan of a table the size of the grouping domain.
  *
  * Scope (and what the rule REFUSES, falling back to the fact scan):
  *  - grouping expressions must be bare attributes ⊆ the MV's
  *    grouping columns (a subset IS allowed — partials re-aggregate);
  *  - aggregates must be undistinct, unfiltered `sum(col)` over a
  *    registered DOUBLE/LONG column, `min(col)`/`max(col)` over a
  *    registered min-max column (algebraic: the min of per-cell mins
  *    is the group min), `count(*)`/`count(lit)`, or `avg(col)` over
  *    a registered LONG sum column — avg is semi-algebraic, derivable
  *    as `sum(sum_col) / sum(cnt)` in ONE exact IEEE division because
  *    integral partial sums re-aggregate exactly (a DOUBLE column's
  *    partial sums would be addition-order-dependent, so DOUBLE avg
  *    never rewrites). `count(col)` (null-sensitive) folds from the
  *    same `cnt_<c>` partial when `col` is a registered sum column.
  *    `sum(DISTINCT …)` and FILTER clauses never rewrite — their
  *    values are not derivable from these partials;
  *  - a Filter between the aggregate and the scan rewrites ONLY when
  *    its predicate is deterministic, subquery-free, and references
  *    nothing but the MV's GROUPING columns: such a predicate removes
  *    whole MV cells (every fact row of a cell shares its group-col
  *    values), so applying it to the MV read preserves every surviving
  *    group's contents exactly. Any predicate touching a non-group
  *    column changes group contents invisibly to the MV and refuses.
  *
  * Output attributes keep the ORIGINAL names and exprIds (each output
  * is re-aliased under its old id), so every reference above the
  * rewritten aggregate — sorts, projections, havings — binds
  * unchanged. Freshness is the registrant's contract, exactly as with
  * any MV system: register only views you refresh with the fact.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** A registered view: `mvPath` holds `groupCols`, one `sum_<c>` and
    * one `cnt_<c>` (non-null count — avg's true denominator) per sum
    * column, `min_<c>`/`max_<c>` per min-max column, and `cnt`, as
    * written by [[materialize]]. */
  final case class MvDef(sourcePath: String, groupCols: Seq[String],
                         sumCols: Seq[String], mvPath: String,
                         minMaxCols: Seq[String] = Nil)

  private val defs = TrieMap[String, List[MvDef]]()

  /** Registered HLL register tables ([[graft.operators.HllMv]]) by
    * source path — the approx-distinct gear's lookup. One def per
    * (source, grp, key): a refresh supersedes its predecessor. */
  private val hllDefs = TrieMap[String, List[graft.operators.HllMv.Def]]()

  private def shape(d: MvDef): (Seq[String], Seq[String], Seq[String]) =
    (d.groupCols, d.sumCols, d.minMaxCols)

  /** Register `d`, REPLACING any registered view of the same shape
    * (grouping + registered columns) for the same source — a refresh
    * supersedes its predecessor. Views of a DIFFERENT shape accumulate
    * as alternatives: [[apply]] selects the best match per query. */
  def register(d: MvDef): Unit =
    defs.updateWith(d.sourcePath) { cur =>
      Some(d :: cur.getOrElse(Nil).filterNot(x => shape(x) == shape(d)))
    }

  /** Register an HLL register table for the approx-distinct gear:
    * `approx_count_distinct(keyCol)` grouped by `grpCol` over the
    * def's declared source rewrites onto the register table (the
    * estimate [[graft.operators.HllMv.serveDistinct]] computes),
    * never the base. Requires `d.sourcePath` to be declared. */
  def registerHll(d: graft.operators.HllMv.Def): Unit = {
    val src = d.sourcePath.getOrElse(throw new IllegalArgumentException(
      s"registerHll: ${d.mvPath} declares no sourcePath — nothing to rewrite"))
    hllDefs.updateWith(src) { cur =>
      Some(d :: cur.getOrElse(Nil)
        .filterNot(x => (x.grpCols, x.keyCol) == (d.grpCols, d.keyCol)))
    }
  }

  /** Registered quantile-sketch tables ([[graft.operators.QuantileMv]])
    * by source path — the approx-percentile gear's lookup. */
  private val quantileDefs =
    TrieMap[String, List[graft.operators.QuantileMv.Def]]()

  /** Registered bitmap tables ([[graft.operators.BitmapMv]]) by source
    * path — the EXACT-distinct gear's lookup. */
  private val bitmapDefs =
    TrieMap[String, List[graft.operators.BitmapMv.Def]]()

  /** Register a bitmap table: an exact `COUNT(DISTINCT keyCol)`
    * grouped by a subset of the def's group columns over the declared
    * source rewrites onto `sum(bit_count(bits))` over the bitmap
    * table — exact, never the base fact. */
  def registerBitmap(d: graft.operators.BitmapMv.Def): Unit = {
    val src = d.sourcePath.getOrElse(throw new IllegalArgumentException(
      s"registerBitmap: ${d.mvPath} declares no sourcePath — " +
        "nothing to rewrite"))
    bitmapDefs.updateWith(src) { cur =>
      Some(d :: cur.getOrElse(Nil)
        .filterNot(x => (x.grpCols, x.keyCol) == (d.grpCols, d.keyCol)))
    }
  }

  /** Register a quantile-sketch table: `approx_percentile(valCol, p)`
    * (integer-percent p) grouped by a subset of the def's group
    * columns over the declared source rewrites onto the sketch
    * table's deterministic estimate, never the base. */
  def registerQuantile(d: graft.operators.QuantileMv.Def): Unit = {
    val src = d.sourcePath.getOrElse(throw new IllegalArgumentException(
      s"registerQuantile: ${d.mvPath} declares no sourcePath — " +
        "nothing to rewrite"))
    quantileDefs.updateWith(src) { cur =>
      Some(d :: cur.getOrElse(Nil)
        .filterNot(x => (x.grpCols, x.valCol) == (d.grpCols, d.valCol)))
    }
  }

  def clear(): Unit =
    { defs.clear(); hllDefs.clear(); quantileDefs.clear()
      bitmapDefs.clear() }

  /** Serving-rule suppression for REFRESH internals. A refresh that
    * aggregates the registered source in the MV's own shape — the
    * touched-cell rebuild of [[refreshRetractRederive]] is exactly
    * that — would otherwise be REWRITTEN BY THE RULE IT REFRESHES,
    * folding the stale MV's partials back into the "new" MV and
    * making every refresh a fixed point of the stale state (caught
    * live: q216 served pre-CDC values because the rebuild's
    * cell-filtered aggregate matched the rollup gear). Every
    * materialize/refresh body runs inside this guard; thread-local
    * because the optimizer runs on the calling driver thread and
    * concurrent SERVING queries on other threads must still rewrite.
    */
  private val suppressed = ThreadLocal.withInitial[java.lang.Boolean](() => false)
  private def withoutRewrite[T](f: => T): T = {
    val old = suppressed.get
    suppressed.set(true)
    try f finally suppressed.set(old)
  }

  /** The partial-state aggregate of one frame in the MV's shape —
    * shared by [[materialize]] (over the full fact) and
    * [[refreshIncremental]] (over a delta batch): the partial/merge
    * pair is algebraic, so aggregating a batch and merging equals
    * aggregating the union. */
  private def partials(df: DataFrame, mv: MvDef): DataFrame =
    df.groupBy(mv.groupCols.map(df(_)): _*)
      .agg(sum(mv.sumCols.head).as(s"sum_${mv.sumCols.head}"),
        (mv.sumCols.tail.map(c => sum(c).as(s"sum_$c")) ++
          mv.sumCols.map(c => count(df(c)).as(s"cnt_$c")) ++
          mv.minMaxCols.flatMap(c => Seq(min(c).as(s"min_$c"),
            max(c).as(s"max_$c"))) :+
          count(lit(1)).as("cnt")): _*)

  /** Build + write the MV the rule expects, and register it. */
  def materialize(spark: SparkSession, sourcePath: String,
                  groupCols: Seq[String], sumCols: Seq[String],
                  mvPath: String, minMaxCols: Seq[String] = Nil): MvDef =
    materializeFrom(spark.read.parquet(sourcePath),
      MvDef(sourcePath, groupCols, sumCols, mvPath, minMaxCols))

  /** [[materialize]] over an explicit frame — the streaming
    * maintainer's base-load path ([[graft.streaming.MvMaintainer]]),
    * where the first micro-batch IS the initial history. */
  def materializeFrom(df: DataFrame, d: MvDef): MvDef = withoutRewrite {
    partials(df, d).write.mode("overwrite").parquet(d.mvPath)
    register(d)
    d
  }

  /** Incrementally refresh a registered MV from an APPEND-ONLY delta
    * batch: aggregate the delta into the same partial shape, key-wise
    * merge with the current MV (SUM folds `sum_<c>`, `cnt_<c>` and
    * `cnt`; MIN/MAX fold themselves — all algebraic under appends),
    * write the merged table to `newMvPath` and re-register. Reads
    * ONLY the delta and the grouping-domain-sized current MV — never
    * the base fact (MvRewriteSpec proves it by deleting the base
    * before refreshing). At 100 TB this is the difference between a
    * load touching gigabytes and re-scanning everything — the
    * reference re-aggregates its full fact table per load
    * (`etl_pipeline_spark.py:1398-1455`).
    *
    * Append-only is a hard scope line, stated rather than assumed:
    * under deletes MIN/MAX are not derivable from partials at all
    * (retracting the cell minimum needs the runner-up), and the
    * sum/count side would need the retraction form
    * ([[graft.operators.IncrementalAgg.retractState]]).
    */
  def refreshIncremental(spark: SparkSession, mv: MvDef,
                         delta: DataFrame, newMvPath: String): MvDef = withoutRewrite {
    require(defs.get(mv.sourcePath).exists(_.exists(_.mvPath == mv.mvPath)),
      s"refreshIncremental: ${mv.mvPath} is not the registered MV for ${mv.sourcePath}")
    val cur = spark.read.parquet(mv.mvPath)
    // union-of-partials + one re-aggregation IS the key-wise merge:
    // |MV| + |delta cells| rows through one shuffle keyed by the
    // grouping columns, both inputs already aggregate-sized
    cur.unionByName(partials(delta, mv))
      .groupBy(mv.groupCols.head, mv.groupCols.tail: _*)
      .agg(sum(s"sum_${mv.sumCols.head}").as(s"sum_${mv.sumCols.head}"),
        (mv.sumCols.tail.map(c => sum(s"sum_$c").as(s"sum_$c")) ++
          mv.sumCols.map(c => sum(s"cnt_$c").as(s"cnt_$c")) ++
          mv.minMaxCols.flatMap(c => Seq(min(s"min_$c").as(s"min_$c"),
            max(s"max_$c").as(s"max_$c"))) :+
          sum("cnt").as("cnt")): _*)
      .write.mode("overwrite").parquet(newMvPath)
    val d2 = mv.copy(mvPath = newMvPath)
    register(d2)
    d2
  }

  /** Refresh a registered MV from a CDC RETRACTION batch — rows
    * carrying the fact's columns plus `opCol` ∈ {+1, −1} (an update is
    * its delete followed by its insert, the standard changelog
    * encoding; [[graft.operators.IncrementalAgg.retractState]] is the
    * same algebra in single-column form). The delta's signed partials
    * are one aggregate over the batch — `sum(op·c)` folds the sum
    * (a NULL-valued delete contributes nothing, matching the insert
    * that contributed nothing), `sum(op)` over non-null rows folds the
    * non-null count, `sum(op)` folds the row count — and the key-wise
    * merge with the current MV is the identical union-and-re-aggregate
    * [[refreshIncremental]] runs. Cells whose row count reaches zero
    * are DROPPED (a fully-retracted group has no row in a rebuilt
    * aggregate either). Reads only the CDC batch and the MV, never
    * the base fact.
    *
    * Hard scope line: the view must register NO min-max columns —
    * under deletes MIN/MAX are not derivable from partials (retracting
    * the cell minimum needs the runner-up, which the partial threw
    * away), so this refuses loudly instead of writing a silently
    * wrong view. Correctness rides the CDC contract that every −1 row
    * matches a previously applied +1 row; a violation shows up as a
    * negative count, which is the caller's data bug, not a merge
    * artifact.
    */
  /** The SIGNED partial-state aggregate of one CDC batch — each row
    * contributes `op` times its additive pieces; equal to [[partials]]
    * when every op is +1, and intra-batch delete+insert pairs cancel
    * exactly. Shared by [[refreshRetract]] and the streaming
    * maintainer's CDC base load ([[graft.streaming.MvMaintainer]]). */
  private[graft] def signedPartials(cdc: DataFrame, mv: MvDef,
                                    opCol: String): DataFrame = {
    val op = cdc(opCol).cast("long")
    cdc.groupBy(mv.groupCols.map(cdc(_)): _*)
      .agg(sum(cdc(mv.sumCols.head) * op).as(s"sum_${mv.sumCols.head}"),
        (mv.sumCols.tail.map(c => sum(cdc(c) * op).as(s"sum_$c")) ++
          mv.sumCols.map(c => sum(org.apache.spark.sql.functions
            .when(cdc(c).isNotNull, op).otherwise(lit(0L))).as(s"cnt_$c")) :+
          sum(op).as("cnt")): _*)
  }

  /** SQL's SUM over zero non-null values is NULL, but a signed merge
    * that retracts every non-null contribution leaves an exact 0 in
    * the partial — normalize `sum_<c>` back to NULL whenever its
    * non-null count hits zero, so a retraction-refreshed cell is
    * bit-identical to a rebuilt one (MvProps found the divergence:
    * delete the only non-null row of a cell that also holds a
    * NULL-valued row). */
  private def nullEmptySums(df: DataFrame, mv: MvDef): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    df.select(df.columns.map { c =>
      if (mv.sumCols.exists(s => c == s"sum_$s"))
        when(col(s"cnt_${c.stripPrefix("sum_")}") === 0,
          lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }: _*)
  }

  /** Build + write + register an MV whose initial history IS a CDC
    * batch (the streaming maintainer's first micro-batch in CDC mode):
    * the signed partials of the batch, fully-cancelled cells dropped.
    * Same MIN/MAX refusal as [[refreshRetract]]. */
  private[graft] def baseFromCdc(cdc: DataFrame, d: MvDef,
                                 opCol: String): MvDef = withoutRewrite {
    require(d.minMaxCols.isEmpty,
      s"baseFromCdc: MIN/MAX partials are not retractable — view on " +
        s"${d.sourcePath} registers min-max columns ${d.minMaxCols}")
    nullEmptySums(signedPartials(cdc, d, opCol), d)
      .filter(org.apache.spark.sql.functions.col("cnt") > 0)
      .write.mode("overwrite").parquet(d.mvPath)
    register(d)
    d
  }

  def refreshRetract(spark: SparkSession, mv: MvDef, cdc: DataFrame,
                     opCol: String, newMvPath: String): MvDef = withoutRewrite {
    require(mv.minMaxCols.isEmpty,
      s"refreshRetract: MIN/MAX partials are not retractable — view on " +
        s"${mv.sourcePath} registers min-max columns ${mv.minMaxCols}; " +
        "use refreshRetractRederive (touched-cell re-derivation) instead")
    require(defs.get(mv.sourcePath).exists(_.exists(_.mvPath == mv.mvPath)),
      s"refreshRetract: ${mv.mvPath} is not the registered MV for ${mv.sourcePath}")
    val merged = spark.read.parquet(mv.mvPath)
      .unionByName(signedPartials(cdc, mv, opCol))
      .groupBy(mv.groupCols.head, mv.groupCols.tail: _*)
      .agg(sum(s"sum_${mv.sumCols.head}").as(s"sum_${mv.sumCols.head}"),
        (mv.sumCols.tail.map(c => sum(s"sum_$c").as(s"sum_$c")) ++
          mv.sumCols.map(c => sum(s"cnt_$c").as(s"cnt_$c")) :+
          sum("cnt").as("cnt")): _*)
    nullEmptySums(merged, mv)
      .filter(org.apache.spark.sql.functions.col("cnt") > 0)
      .write.mode("overwrite").parquet(newMvPath)
    val d2 = mv.copy(mvPath = newMvPath)
    register(d2)
    d2
  }

  /** The exact cell membership predicate for a collected touched-cell
    * set: OR over cells of AND over group columns of NULL-SAFE
    * equality with the cell's literal value. `<=>` (EqualNullSafe)
    * rather than `=` because NULL is a legal grouping value — a plain
    * equality would silently drop NULL cells from the filter, leaving
    * their stale MV rows alive NEXT TO a recomputed copy. EqualNullSafe
    * is in parquet's pushdown dialect, so the whole predicate reaches
    * the scan: partition pruning when the base is partitioned by a
    * group column, row-group pruning from column statistics otherwise
    * — the mechanism PlanAuditSpec pins. */
  private[graft] def cellPredicate(cells: Seq[Row], groupCols: Seq[String],
                                   base: DataFrame): Column =
    cells.map { r =>
      groupCols.map(c => base(c) <=> lit(r.getAs[Any](c))).reduce(_ && _)
    }.reduce(_ || _)

  /** CDC refresh for views WITH min-max columns — the touched-cell
    * re-derivation gear completing the MV family: MIN/MAX partials are
    * not retractable (retracting a cell minimum needs the runner-up
    * the partial discarded), so the cells the CDC batch TOUCHES are
    * re-aggregated from the base while every untouched cell keeps its
    * MV row unread and unrecomputed.
    *
    * Contract — stated, because it differs from [[refreshRetract]]:
    * the base at `mv.sourcePath` must already reflect the CDC batch
    * (the standard warehouse ordering — the fact upsert commits first,
    * then the MV refresh consumes the same changelog). In exchange the
    * refresh needs no signed algebra at all: touched cells are rebuilt
    * exactly, which is the ONLY exact answer under deletes.
    *
    * What it reads: the CDC batch (for its distinct cells), the
    * grouping-domain-sized MV, and the TOUCHED CELLS' SLICE of the
    * base — at 100 TB a touched-cells-sized scan, not a fact-sized
    * one. The touched-cell set is CDC-batch-bounded; when it holds at
    * most `cellLiteralMax` cells it is collected and pushed into the
    * base scan as a literal [[cellPredicate]] (partition + row-group
    * pruning — MvRewriteSpec proves untouched partitions are never
    * needed by DELETING one before refreshing), above that bound it
    * stays distributed as a null-safe left-semi join (no driver-side
    * blow-up; AQE still prunes via the runtime filter).
    */
  def refreshRetractRederive(spark: SparkSession, mv: MvDef,
                             cdc: DataFrame, newMvPath: String,
                             cellLiteralMax: Int = 10000): MvDef = withoutRewrite {
    require(defs.get(mv.sourcePath).exists(_.exists(_.mvPath == mv.mvPath)),
      s"refreshRetractRederive: ${mv.mvPath} is not the registered MV " +
        s"for ${mv.sourcePath}")
    val touched = cdc.select(mv.groupCols.map(cdc(_)): _*).distinct()
    val cur = spark.read.parquet(mv.mvPath)
    // limit(max+1) bounds the driver transfer whatever the batch holds
    val cells = touched.limit(cellLiteralMax + 1).collect().toSeq
    val next =
      if (cells.isEmpty) cur // empty batch — the MV is already exact
      else {
        val base = spark.read.parquet(mv.sourcePath)
        val slice =
          if (cells.size <= cellLiteralMax)
            base.filter(cellPredicate(cells, mv.groupCols, base))
          else
            base.join(touched, mv.groupCols.map(c =>
              base(c) <=> touched(c)).reduce(_ && _), "left_semi")
        // untouched rows carry over AS IS (null-safe anti join against
        // the tiny cell set — auto-broadcast); touched cells rebuild
        // from the slice, and fully-retracted cells simply produce no
        // partial row — exactly a rebuilt aggregate's behavior
        val untouched = cur.join(touched, mv.groupCols.map(c =>
          cur(c) <=> touched(c)).reduce(_ && _), "left_anti")
        untouched.unionByName(partials(slice, mv))
      }
    next.write.mode("overwrite").parquet(newMvPath)
    val d2 = mv.copy(mvPath = newMvPath)
    register(d2)
    d2
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (suppressed.get ||
      (defs.isEmpty && hllDefs.isEmpty && quantileDefs.isEmpty &&
        bitmapDefs.isEmpty)) plan
    else plan transform {
      case agg @ Aggregate(_, _, child, _) =>
        (for {
          (path, filters) <- scannedSource(child)
          // algebraic gears first (exact), then the sketch gears
          // (approx-distinct, then approx-percentile) — among
          // algebraic alternatives take the first MATCHING view in
          // ascending grouping-column count: when one matching view's
          // group cols are a subset of another's, its cell domain is
          // a projection of the finer one's, so the coarser view is
          // the smaller scan; fewer group cols is the general proxy
          rewritten <- defs.get(path).toSeq.flatten.sortBy(_.groupCols.size)
            .view.flatMap(mv => rewrite(agg, filters, mv)).headOption
            .orElse(rewriteMixed(agg, filters, path))
        } yield rewritten).getOrElse(agg)
    }

  /** The single parquet root under the aggregate plus any Filter
    * predicates met on the way down, looking through pure-attribute
    * projections; None if anything else intervenes. */
  private def scannedSource(plan: LogicalPlan): Option[(String, Seq[Expression])] =
    plan match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
        scannedSource(child)
      case Filter(cond, child) =>
        scannedSource(child).map { case (p, fs) => (p, cond +: fs) }
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths match {
          case Seq(single) => Some((single.toUri.getPath, Nil))
          case _ => None
        }
      case _ => None
    }

  /** The SKETCH gear, composed with the algebraic family: an
    * aggregate mixing `approx_count_distinct(key)`,
    * `approx_percentile(col, p)` and/or an EXACT
    * `count(DISTINCT key)` with algebraic aggregates
    * (`count(*)`, `sum`, `avg`, `min`/`max`) over a source with
    * registered MVs serves each part from ITS maintained table — the
    * distinct estimates from the HLL register table
    * ([[graft.operators.HllMv]]), the percentiles from the
    * log-linear sketch ([[graft.operators.QuantileMv]]), exact
    * distinct counts from the bitmap table
    * ([[graft.operators.BitmapMv]] — `sum(bit_count)`, the one
    * DISTINCT aggregate the gear accepts because the bitmap makes it
    * exactly derivable), everything else from the matching algebraic
    * MV — all joined on the grouping cells: domain-sized leaves and
    * never the fact. COUNT(DISTINCT) and percentiles are the two aggregates no
    * algebraic partial can serve, but per-cell HLL registers and
    * bucket histograms are mergeable partials; register max-merge /
    * bucket-count ADD also let one table serve any SUBSET of its
    * group columns (re-merge to the coarser cells, then estimate),
    * the same rollup property the algebraic gears ride.
    *
    * The served distinct value is the register table's deterministic
    * estimate (the [[graft.operators.HllMv.serveDistinct]] harmonic
    * mean, rounded to a count) — an approximate aggregate answered by
    * the MAINTAINED approximation, the contract any sketch-MV
    * warehouse serves. `floor(est+0.5)` rather than `round`:
    * identical HALF-UP semantics on the positive domain in both Spark
    * and the DuckDB oracle. Filters over GROUP columns (of the query
    * or beyond it — the algebraic gear's contract) drop whole cells
    * identically on every side: each is re-anchored onto the FINE
    * sketch table before any subset re-merge, so a predicate on a
    * group column outside the query grouping still prunes exactly;
    * defs are chosen only if their group columns cover the filter
    * references.
    *
    * Refusals (fall back to the fact scan, always correct): empty or
    * non-attribute grouping; an `approx_count_distinct` key with no
    * register table covering the grouping; a percent off the integer
    * grid or an unregistered percentile value column (several
    * DISTINCT value columns are fine — each serves from its own
    * registered sketch, suffixed per column in the composed join);
    * any other aggregate no registered algebraic MV serves.
    *
    * Cell-domain completeness: the sketch BUILDERS write a
    * zero-payload sentinel row for every cell whose keys/values are
    * all NULL (HLL register mj = 0, bitmap word bits = 0, histogram
    * bucket cnt = 0 — each a no-op under its merge), so a sketch
    * table holds EVERY grouping cell of its source and even the
    * single-serve self-anchor is complete. The composition still
    * prefers a better anchor where one exists: the algebraic side
    * (its groupBy domain is the fact's); a domain synthesized from
    * any registered algebraic MV over the same source covering the
    * grouping; the null-safe distinct union of every serve's cells.
    * Cells absent from a joined serve coalesce to 0 (distinct counts
    * over no keys) or stay NULL (percentiles over no values) —
    * exactly the direct aggregate's answers.
    */
  private def rewriteMixed(agg: Aggregate, filters: Seq[Expression],
                           path: String): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile
    val hds = hllDefs.get(path).toSeq.flatten
    val qds = quantileDefs.get(path).toSeq.flatten
    val bds = bitmapDefs.get(path).toSeq.flatten
    if (hds.isEmpty && qds.isEmpty && bds.isEmpty) return None
    val groupAttrs = agg.groupingExpressions.map {
      case a: Attribute => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None
    val grpNames = groupAttrs.map(_.name)
    // filters may reference group columns BEYOND the query grouping
    // (the algebraic gear's contract) — each serving structure must
    // then carry those columns too, enforced when defs are chosen
    filters.foreach { f =>
      val safe = f.deterministic &&
        !f.exists(_.isInstanceOf[PlanExpression[_]])
      if (!safe) return None
    }
    val filterRefs = filters.flatMap(_.references.map(_.name)).toSet
    // classify outputs: grouping attrs pass through; undistinct
    // unfiltered approx_count_distinct / integer-percent
    // approx_percentile serve from their sketch tables; EVERYTHING
    // else must be served by an algebraic MV (delegated to
    // [[rewrite]], which refuses what it cannot fold)
    def acdKey(e: NamedExpression): Option[String] = e match {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case h: HyperLogLogPlusPlus => h.child match {
            case k: Attribute => Some(k.name)
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }
    def pctOf(e: NamedExpression): Option[(String, Int)] = e match {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case ap: ApproximatePercentile =>
            (ap.child, ap.percentageExpression) match {
              case (c: Attribute, Literal(p: Double, _)) =>
                val pq = p * 100.0
                val r = math.rint(pq)
                if (math.abs(pq - r) < 1e-9 && r >= 1 && r <= 99)
                  Some((c.name, r.toInt))
                else None
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
    // exact COUNT(DISTINCT key) serves from a registered bitmap table
    // (sum(bit_count) — exact, unlike the two estimators): the one
    // DISTINCT aggregate the gear accepts. Integral keys ONLY —
    // [[graft.operators.BitmapMv.words]] packs `key` into bit
    // positions via a BIGINT cast, so matching a DECIMAL/DOUBLE/
    // STRING attribute by name alone would serve truncated-cast
    // (wrong) counts; the type check here mirrors the registration-
    // time require
    def bmKey(e: NamedExpression): Option[String] = e match {
      case Alias(ae: AggregateExpression, _)
          if ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(k: Attribute))
              if Seq(org.apache.spark.sql.types.ByteType,
                org.apache.spark.sql.types.ShortType,
                org.apache.spark.sql.types.IntegerType,
                LongType).contains(k.dataType) => Some(k.name)
          case _ => None
        }
      case _ => None
    }
    val acdAliases = agg.aggregateExpressions.collect {
      case e if acdKey(e).isDefined => e.asInstanceOf[Alias]
    }
    val pctAliases = agg.aggregateExpressions.collect {
      case e if pctOf(e).isDefined => e.asInstanceOf[Alias]
    }
    val bmAliases = agg.aggregateExpressions.collect {
      case e if bmKey(e).isDefined => e.asInstanceOf[Alias]
    }
    if (acdAliases.isEmpty && pctAliases.isEmpty && bmAliases.isEmpty)
      return None
    val algAliases = agg.aggregateExpressions.filter {
      case a: Attribute if grpNames.contains(a.name) => false
      case e => acdKey(e).isEmpty && pctOf(e).isEmpty && bmKey(e).isEmpty
    }
    // one register serve per distinct key: the smallest registered
    // table whose group columns COVER the query grouping
    val keys = acdAliases.map(a => acdKey(a).get).distinct
    val chosenHll: Map[String, graft.operators.HllMv.Def] = keys.map { k =>
      k -> hds.filter(hd => hd.keyCol == k &&
          (grpNames.toSet ++ filterRefs).subsetOf(hd.grpCols.toSet))
        .sortBy(_.grpCols.size).headOption.getOrElse(return None)
    }.toMap
    // one bitmap serve per distinct exact-distinct key: the smallest
    // registered bitmap table whose group columns cover the grouping
    val bmKeys = bmAliases.map(a => bmKey(a).get).distinct
    val chosenBm: Map[String, graft.operators.BitmapMv.Def] = bmKeys.map { k =>
      k -> bds.filter(bd => bd.keyCol == k &&
          (grpNames.toSet ++ filterRefs).subsetOf(bd.grpCols.toSet))
        .sortBy(_.grpCols.size).headOption.getOrElse(return None)
    }.toMap
    // one quantile serve PER percentile value column — each from the
    // smallest registered sketch covering the grouping (several
    // percentile columns in one aggregate each ride their own table)
    val pctCols: Seq[String] = pctAliases.map(a => pctOf(a).get._1).distinct
    val percentsByCol: Map[String, Seq[Int]] = pctAliases
      .map(a => pctOf(a).get).groupBy(_._1)
      .map { case (c, xs) => c -> xs.map(_._2).distinct.sorted }
    val chosenQd: Map[String, graft.operators.QuantileMv.Def] =
      pctCols.map { c =>
        c -> qds.filter(x => x.valCol == c &&
            (grpNames.toSet ++ filterRefs).subsetOf(x.grpCols.toSet))
          .sortBy(_.grpCols.size).headOption.getOrElse(return None)
      }.toMap

    val spark = SparkSession.active
    def attrIn(p: LogicalPlan, n: String): Option[Attribute] =
      p.output.find(_.name == n)
    def anchored(regPlan: LogicalPlan): Option[LogicalPlan] = {
      var resolved = true
      val res = filters.foldRight[LogicalPlan](regPlan) { (cond, acc) =>
        Filter(cond.transform {
          case a: Attribute =>
            attrIn(regPlan, a.name).getOrElse { resolved = false; a }
        }, acc)
      }
      if (resolved) Some(res) else None
    }

    // the algebraic side: a synthetic aggregate holding the grouping
    // attrs (join keys) plus every non-sketch aggregate, routed
    // through the ordinary gears over the best-matching algebraic MV
    val algPlan: Option[LogicalPlan] =
      if (algAliases.isEmpty) None
      else {
        val synth = Aggregate(agg.groupingExpressions,
          groupAttrs ++ algAliases, agg.child, None)
        Some(defs.get(path).toSeq.flatten.sortBy(_.groupCols.size)
          .view.flatMap(mv => rewrite(synth, filters, mv)).headOption
          .getOrElse(return None))
      }

    // one served-estimate plan per key: filter cells, re-merge the
    // registers when the table is grouped finer than the query, then
    // the deterministic harmonic-mean estimate rounded to a count
    val hllServes: Seq[(String, LogicalPlan)] = keys.map { k =>
      val hd = chosenHll(k)
      val regPlan = spark.read.parquet(hd.mvPath).queryExecution.analyzed
      val df0 = org.apache.spark.sql.graft.Bridge
        .ofRows(spark, anchored(regPlan).getOrElse(return None))
      val merged =
        if (hd.grpCols.toSet == grpNames.toSet) df0
        else df0.groupBy((grpNames.map(df0(_)) :+ df0("bucket")): _*)
          .agg(org.apache.spark.sql.functions.max(df0("mj")).as("mj"))
      val served = graft.ext.Stats.hllEstimateCols(merged, grpNames)
        .select(grpNames.map(col) :+
          expr("CAST(floor(est + 0.5d) AS BIGINT)").as("acd"): _*)
        .queryExecution.analyzed
      k -> served
    }
    // one EXACT serve per bitmap key: filter cells, word-wise OR when
    // the table is grouped finer than the query, then
    // sum(bit_count(bits)) — the exact distinct count
    val bmServes: Seq[(String, LogicalPlan)] = bmKeys.map { k =>
      val bd = chosenBm(k)
      val regPlan = spark.read.parquet(bd.mvPath).queryExecution.analyzed
      val df0 = org.apache.spark.sql.graft.Bridge
        .ofRows(spark, anchored(regPlan).getOrElse(return None))
      val merged =
        if (bd.grpCols.toSet == grpNames.toSet) df0
        else df0.groupBy((grpNames.map(df0(_)) :+ df0("w")): _*)
          .agg(expr("bit_or(bits)").as("bits"))
      val served = merged.groupBy(grpNames.map(merged(_)): _*)
        .agg(expr("sum(bit_count(bits))").as("dct"))
        .queryExecution.analyzed
      k -> served
    }
    // one quantile serve per value column: filter cells, re-merge the
    // histogram when grouped finer (bucket counts ADD), then the
    // deterministic lower-bound estimates at that column's percents.
    // Output names are suffixed per column (p50__x) so two columns'
    // serves never collide in the composed join
    def qsfx(c: String): String = if (pctCols.size == 1) "" else s"__$c"
    val qServes: Seq[(String, LogicalPlan)] = pctCols.map { c =>
      val qd = chosenQd(c)
      val regPlan = spark.read.parquet(qd.mvPath).queryExecution.analyzed
      val df0 = org.apache.spark.sql.graft.Bridge
        .ofRows(spark, anchored(regPlan).getOrElse(return None))
      val merged =
        if (qd.grpCols.toSet == grpNames.toSet) df0
        else df0.groupBy((grpNames.map(df0(_)) :+ df0("id")): _*)
          .agg(org.apache.spark.sql.functions.sum(df0("cnt")).as("cnt"))
      c -> graft.ext.Stats.qsketchServe(merged, grpNames,
          percentsByCol(c), qsfx(c))
        .queryExecution.analyzed
    }

    // compose: LEFT joins on null-safe cell equality, anchored on a
    // COMPLETE cell domain. The algebraic side is one when present.
    // In the pure-sketch shape the anchor is synthesized instead —
    // sketch tables may LACK cells (a bitmap cell whose keys are all
    // NULL writes no words; a quantile cell whose values are all
    // NULL/negative writes no buckets), so anchoring on the first
    // serve would silently drop rows the direct aggregate returns
    // (with 0 / NULL) — an optimizer rewrite must never change the
    // result's row set. Two layers guarantee completeness: the
    // builders themselves write a zero-payload SENTINEL row per
    // otherwise-empty cell (so even a lone serve's own table holds
    // every cell), and the anchor preference still avoids
    // self-anchoring where something better exists — the cell domain
    // of any registered ALGEBRAIC MV over the same source covering
    // the grouping (its groupBy domain is exactly the fact's), else
    // the null-safe distinct UNION of every serve's own cells.
    val allServes: Seq[LogicalPlan] =
      hllServes.map(_._2) ++ bmServes.map(_._2) ++ qServes.map(_._2)
    // cell projection of one registered table under the query filters
    // — a FRESH read (fresh exprIds: the serves join these same tables,
    // and a Join with overlapping exprIds is unresolved); the distinct
    // is an explicit Aggregate, not Dataset.distinct, because a
    // Deduplicate injected after the replace-operators batch never
    // reaches the planner's aggregate form
    def cellsOf(mvPath: String): Option[LogicalPlan] = {
      val t = spark.read.parquet(mvPath).queryExecution.analyzed
      anchored(t).map { filtered =>
        val df = org.apache.spark.sql.graft.Bridge.ofRows(spark, filtered)
        df.select(grpNames.map(df(_)): _*).queryExecution.analyzed
      }
    }
    def distinctOf(p: LogicalPlan): LogicalPlan =
      Aggregate(p.output, p.output, p, None)
    val domainPlan: Option[LogicalPlan] =
      if (algPlan.isDefined) None
      else {
        val fromAlgMv = defs.get(path).toSeq.flatten
          .filter(mv =>
            (grpNames.toSet ++ filterRefs).subsetOf(mv.groupCols.toSet))
          .sortBy(_.groupCols.size).headOption
          .flatMap(mv => cellsOf(mv.mvPath)).map(distinctOf)
        fromAlgMv.orElse {
          val paths = (keys.map(k => chosenHll(k).mvPath) ++
            bmKeys.map(k => chosenBm(k).mvPath) ++
            pctCols.map(c => chosenQd(c).mvPath)).distinct
          if (paths.size <= 1) None
          else {
            val cells = paths.flatMap(cellsOf)
            if (cells.size != paths.size) None
            else Some(distinctOf(cells.reduce(
              org.apache.spark.sql.catalyst.plans.logical.Union(_, _))))
          }
        }
      }
    // the single-serve shape anchors on its own serve — complete by
    // construction since the builders write a zero-payload SENTINEL
    // row for every cell whose keys/values are all NULL (HLL mj = 0,
    // bitmap bits = 0, histogram cnt = 0), so a sketch table always
    // contains every grouping cell of its source
    val base: LogicalPlan =
      algPlan.orElse(domainPlan).getOrElse(allServes.head)
    val rest =
      if (algPlan.isDefined || domainPlan.isDefined) allServes
      else allServes.tail
    val joined = rest.foldLeft(base) { case (left, serve) =>
      val cond = grpNames.map(n =>
        EqualNullSafe(attrIn(left, n).getOrElse(return None),
          attrIn(serve, n).getOrElse(return None)))
        .reduce[Expression](And(_, _))
      Join(left, serve, LeftOuter, Some(cond), JoinHint.NONE)
    }
    val serveCnt: Map[String, Attribute] = hllServes.map { case (k, sp) =>
      k -> sp.output.find(_.name == "acd").getOrElse(return None)
    }.toMap
    val serveDct: Map[String, Attribute] = bmServes.map { case (k, sp) =>
      k -> sp.output.find(_.name == "dct").getOrElse(return None)
    }.toMap
    def qAttr(c: String, q: Int): Option[Attribute] =
      qServes.find(_._1 == c)
        .flatMap(_._2.output.find(_.name == s"p$q${qsfx(c)}"))

    val outs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: Attribute if grpNames.contains(a.name) =>
        // with an algebraic side the group attr already carries its
        // original exprId (rewrite re-aliases under old ids); in the
        // pure-sketch shape it re-anchors onto the first serve
        if (algPlan.isDefined) a
        else Alias(attrIn(base, a.name).getOrElse(return None),
          a.name)(exprId = a.exprId)
      case al @ Alias(_, name) if acdKey(al).isDefined =>
        Alias(Coalesce(Seq(serveCnt(acdKey(al).get),
          Literal(0L))), name)(exprId = al.exprId)
      case al @ Alias(_, name) if bmKey(al).isDefined =>
        // count(DISTINCT k) over an all-NULL-key cell is 0, and a
        // cell absent from the bitmap join side serves the same 0
        Alias(Coalesce(Seq(serveDct(bmKey(al).get),
          Literal(0L))), name)(exprId = al.exprId)
      case al @ Alias(_, name) if pctOf(al).isDefined =>
        val (c, q) = pctOf(al).get
        Alias(qAttr(c, q).getOrElse(return None),
          name)(exprId = al.exprId)
      case al: Alias => al.toAttribute // served under its original id
      case _ => return None
    }
    val ok = outs.map(_.toAttribute.dataType) ==
      agg.aggregateExpressions.map(_.toAttribute.dataType)
    if (!ok) return None
    Some(Project(outs, joined))
  }

  private def rewrite(agg: Aggregate, filters: Seq[Expression],
                      mv: MvDef): Option[LogicalPlan] = {
    // group-column-only, deterministic, subquery-free predicates drop
    // whole MV cells — anything else makes the MV unusable here
    filters.foreach { f =>
      val safe = f.deterministic &&
        !f.exists(_.isInstanceOf[PlanExpression[_]]) &&
        f.references.forall(a => mv.groupCols.contains(a.name))
      if (!safe) return None
    }
    val groupAttrs = agg.groupingExpressions.map {
      case a: Attribute if mv.groupCols.contains(a.name) => a
      case _ => return None
    }
    // a FRESH read per rewrite: reusing one analyzed plan instance
    // across two rewrites in a query would collide exprIds
    val mvPlan = SparkSession.active.read.parquet(mv.mvPath)
      .queryExecution.analyzed
    def mvAttr(name: String): Option[Attribute] =
      mvPlan.output.find(_.name == name)

    val newGroups = groupAttrs.map(a => mvAttr(a.name).getOrElse(return None))
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: Attribute if mv.groupCols.contains(a.name) =>
        Alias(mvAttr(a.name).getOrElse(return None), a.name)(exprId = a.exprId)
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        // each supported aggregate re-aggregates its own partial:
        // SUM/COUNT fold partials with SUM; MIN/MAX fold with
        // themselves (min of per-cell mins IS the group min — the
        // algebraic-aggregate property avg lacks)
        val folded: Option[Expression] = ae.aggregateFunction match {
          case s: Sum => s.child match {
            case c: Attribute if mv.sumCols.contains(c.name) =>
              mvAttr(s"sum_${c.name}").map(Sum(_).toAggregateExpression())
            case _ => None
          }
          case m: Min => m.child match {
            case c: Attribute if mv.minMaxCols.contains(c.name) =>
              mvAttr(s"min_${c.name}").map(Min(_).toAggregateExpression())
            case _ => None
          }
          case m: Max => m.child match {
            case c: Attribute if mv.minMaxCols.contains(c.name) =>
              mvAttr(s"max_${c.name}").map(Max(_).toAggregateExpression())
            case _ => None
          }
          case Count(Seq(Literal(_, _))) =>
            mvAttr("cnt").map(Sum(_).toAggregateExpression())
          case Count(Seq(c: Attribute)) if mv.sumCols.contains(c.name) =>
            // null-sensitive count folds from the per-column non-null
            // count partial, not the row count
            mvAttr(s"cnt_${c.name}").map(Sum(_).toAggregateExpression())
          case a: Average => a.child match {
            // LONG columns only: integral partial sums re-aggregate
            // EXACTLY, so sum(sum_c)/sum(cnt_c) is one exact IEEE
            // division — bit-identical to avg over the fact. A DOUBLE
            // column's partial sums depend on addition order and
            // could drift from the direct result, so they refuse.
            case c: Attribute
                if mv.sumCols.contains(c.name) && c.dataType == LongType =>
              for {
                s <- mvAttr(s"sum_${c.name}")
                n <- mvAttr(s"cnt_${c.name}")
              } yield Divide(
                Cast(Sum(s).toAggregateExpression(), DoubleType),
                Cast(Sum(n).toAggregateExpression(), DoubleType))
            case _ => None
          }
          case _ => None
        }
        folded match {
          case Some(e) => Alias(e, name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }
    // sum-of-partial must keep the original column's type (DOUBLE and
    // LONG do; DECIMAL widens per level and would change the schema)
    val ok = newAggs.map(_.toAttribute.dataType) ==
      agg.aggregateExpressions.map(_.toAttribute.dataType)
    if (!ok) return None
    // re-anchor the pushed predicates onto the MV read's attributes
    val child = filters.foldRight[LogicalPlan](mvPlan) { (cond, acc) =>
      Filter(cond.transform {
        case a: Attribute => mvAttr(a.name).getOrElse(return None)
      }, acc)
    }
    Some(Aggregate(newGroups, newAggs, child, None))
  }
}
