package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** The MV rollup-rewrite: matching aggregates scan the pre-aggregated
  * table (plan-audited), non-derivable ones fall back to the fact
  * scan, and every rewritten result is value-identical to the direct
  * computation. Installed via [[GraftRuntime.ensure]] so the spec is
  * immune to session-creation order across the suite (withExtensions
  * is silently ignored by getOrCreate on an existing session).
  */
class MvRewriteSpec extends SparkSpec {

  // idempotent; runs before each test regardless of suite order
  private def withRule(): Unit = GraftRuntime.ensure(spark)

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString)

  test("subset-grouping SUM/COUNT rewrites onto the MV and matches the fact") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv").toString
    val fact = s"$dir/fact.parquet"
    val mv = s"$dir/mv.parquet"
    (1L to 400L).map(i =>
        (i, s"s${i % 3}", s"p${i % 5}", (i % 7).toDouble))
      .toDF("id", "status", "prio", "v")
      .write.parquet(fact)
    try {
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"), mvPath = mv)

      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
        .orderBy($"status")
      assert(scansOf(q).exists(_.contains("mv.parquet")),
        s"aggregate must scan the MV:\n${scansOf(q)}")
      assert(!scansOf(q).exists(_.contains("fact.parquet")),
        "the fact table must not be read")

      MvRewrite.clear() // direct recompute with the rule inert
      val direct = spark.read.parquet(fact).groupBy($"status")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
        .orderBy($"status")
      assert(scansOf(direct).exists(_.contains("fact.parquet")))
      assert(q.collect().toSeq == direct.collect().toSeq,
        "rewritten values == direct values")
    } finally MvRewrite.clear()
  }

  test("non-derivable shapes refuse the rewrite and read the fact") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv2").toString
    val fact = s"$dir/fact.parquet"
    (1L to 100L).map(i => (i, s"s${i % 3}", (i % 7).toDouble))
      .toDF("id", "status", "v").write.parquet(fact)
    try {
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status"), sumCols = Seq("v"),
        mvPath = s"$dir/mv.parquet")

      // a filter between aggregate and scan changes group contents
      val filtered = spark.read.parquet(fact).filter($"id" > 50)
        .groupBy($"status").agg(sum($"v").as("sv"))
      assert(scansOf(filtered).exists(_.contains("fact.parquet")),
        "filtered aggregate must NOT rewrite")

      // avg is not derivable from these partials
      val avgQ = spark.read.parquet(fact)
        .groupBy($"status").agg(avg($"v").as("a"))
      assert(scansOf(avgQ).exists(_.contains("fact.parquet")),
        "avg must NOT rewrite")

      // grouping outside the MV's columns
      val byId = spark.read.parquet(fact)
        .groupBy($"id").agg(sum($"v").as("sv"))
      assert(scansOf(byId).exists(_.contains("fact.parquet")),
        "non-subset grouping must NOT rewrite")
    } finally MvRewrite.clear()
  }

  test("group-column-only filters push onto the MV; others refuse") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv3").toString
    val fact = s"$dir/fact.parquet"
    val mv = s"$dir/mv.parquet"
    (1L to 400L).map(i =>
        (i, s"s${i % 3}", s"p${i % 5}", (i % 7).toDouble))
      .toDF("id", "status", "prio", "v")
      .write.parquet(fact)
    try {
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"), mvPath = mv)

      // predicate on a group column NOT in the query's grouping:
      // whole MV cells drop, partials still re-aggregate
      val pushed = spark.read.parquet(fact)
        .filter($"prio".isin("p1", "p3"))
        .groupBy($"status")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
        .orderBy($"status")
      assert(scansOf(pushed).exists(_.contains("mv.parquet")),
        s"group-col-filtered aggregate must scan the MV:\n${scansOf(pushed)}")
      assert(!scansOf(pushed).exists(_.contains("fact.parquet")))

      // predicate touching a NON-group column must refuse
      val unsafe = spark.read.parquet(fact)
        .filter($"v" > 2.0)
        .groupBy($"status").agg(sum($"v").as("sv"))
      assert(scansOf(unsafe).exists(_.contains("fact.parquet")),
        "non-group-column filter must NOT rewrite")

      MvRewrite.clear() // direct recompute with the rule inert
      val direct = spark.read.parquet(fact)
        .filter($"prio".isin("p1", "p3"))
        .groupBy($"status")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
        .orderBy($"status")
      assert(pushed.collect().toSeq == direct.collect().toSeq,
        "filter-pushed values == direct values")
    } finally MvRewrite.clear()
  }

  test("min/max fold from MV partials; unregistered columns refuse") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv4").toString
    val fact = s"$dir/fact.parquet"
    val mv = s"$dir/mv.parquet"
    (1L to 400L).map(i =>
        (i, s"s${i % 3}", s"p${i % 5}", (i % 7).toDouble, (i % 11).toDouble))
      .toDF("id", "status", "prio", "v", "u")
      .write.parquet(fact)
    try {
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"), mvPath = mv,
        minMaxCols = Seq("v"))

      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(min($"v").as("mn"), max($"v").as("mx"),
          sum($"v").as("sv"), count(lit(1)).as("n"))
        .orderBy($"status")
      assert(scansOf(q).exists(_.contains("mv.parquet")),
        s"min/max aggregate must scan the MV:\n${scansOf(q)}")

      // u has no registered partials — whole query falls back
      val byU = spark.read.parquet(fact).groupBy($"status")
        .agg(min($"u").as("mn"))
      assert(scansOf(byU).exists(_.contains("fact.parquet")),
        "min over an unregistered column must NOT rewrite")

      MvRewrite.clear()
      val direct = spark.read.parquet(fact).groupBy($"status")
        .agg(min($"v").as("mn"), max($"v").as("mx"),
          sum($"v").as("sv"), count(lit(1)).as("n"))
        .orderBy($"status")
      assert(q.collect().toSeq == direct.collect().toSeq,
        "MV-folded min/max values == direct values")
    } finally MvRewrite.clear()
  }

  test("MV selection: the smallest matching view serves each query") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-sel").toString
    val fact = s"$dir/fact.parquet"
    (1L to 400L).map(i =>
        (i, s"s${i % 3}", s"p${i % 5}", (i % 7).toLong))
      .toDF("id", "status", "prio", "v")
      .write.parquet(fact)
    try {
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status"), sumCols = Seq("v"),
        mvPath = s"$dir/coarse.parquet")
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/fine.parquet")

      // both alternatives match — the coarser (3-cell) view must win
      // over the finer (15-cell) one
      val byStatus = spark.read.parquet(fact).groupBy($"status")
        .agg(sum($"v").as("sv")).orderBy($"status")
      assert(scansOf(byStatus).exists(_.contains("coarse.parquet")),
        s"coarse view must serve the status rollup:\n${scansOf(byStatus)}")

      // grouping on (status, prio): only the fine view matches
      val byBoth = spark.read.parquet(fact).groupBy($"status", $"prio")
        .agg(sum($"v").as("sv")).orderBy($"status", $"prio")
      assert(scansOf(byBoth).exists(_.contains("fine.parquet")),
        s"fine view must serve the two-column rollup:\n${scansOf(byBoth)}")

      // a prio filter: the coarse view refuses (prio is not one of
      // its group columns), so selection must fall through to fine
      val filtered = spark.read.parquet(fact)
        .filter($"prio".isin("p1", "p2"))
        .groupBy($"status").agg(sum($"v").as("sv")).orderBy($"status")
      assert(scansOf(filtered).exists(_.contains("fine.parquet")),
        s"fine view must serve the prio-filtered rollup:\n${scansOf(filtered)}")

      MvRewrite.clear()
      def direct(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
      assert(direct(byStatus) == direct(spark.read.parquet(fact)
        .groupBy($"status").agg(sum($"v").as("sv")).orderBy($"status")))
      assert(direct(filtered) == direct(spark.read.parquet(fact)
        .filter($"prio".isin("p1", "p2"))
        .groupBy($"status").agg(sum($"v").as("sv")).orderBy($"status")))
    } finally MvRewrite.clear()
  }

  test("incremental refresh reads ONLY the delta — base deleted first") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv5").toString
    def rows(r: Range) = r.map(i =>
      (i.toLong, s"s${i % 3}", s"p${i % 5}", (i % 7).toLong)).toDF(
      "id", "status", "prio", "v")
    rows(1 to 300).write.parquet(s"$dir/base.parquet")
    val delta = rows(301 to 400)
    try {
      val mv0 = MvRewrite.materialize(spark, s"$dir/base.parquet",
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/mv0.parquet", minMaxCols = Seq("v"))
      // the hard proof of "delta-only": the base is GONE before the
      // refresh runs — any code path that re-scanned it would throw
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(s"$dir/base.parquet"))
      val refreshed = MvRewrite.refreshIncremental(
        spark, mv0, delta, s"$dir/mv1.parquet")
      // merged partials == a from-scratch build over base ∪ delta
      val merged = spark.read.parquet(refreshed.mvPath)
        .orderBy($"status", $"prio")
      rows(1 to 400).write.parquet(s"$dir/full.parquet")
      MvRewrite.materialize(spark, s"$dir/full.parquet",
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/mvfull.parquet", minMaxCols = Seq("v"))
      val rebuilt = spark.read.parquet(s"$dir/mvfull.parquet")
        .orderBy($"status", $"prio")
      assert(merged.columns.sorted.toSeq == rebuilt.columns.sorted.toSeq)
      val cols = merged.columns.sorted.map(col).toSeq
      assert(merged.select(cols: _*).collect().toSeq ==
        rebuilt.select(cols: _*).collect().toSeq,
        "merge(partial(base), partial(delta)) must equal partial(base ∪ delta)")
    } finally MvRewrite.clear()
  }

  test("retraction refresh: CDC-only read, emptied cells dropped, " +
    "min-max views refused") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv7").toString
    def rows(r: Range) = r.map(i =>
      (i.toLong, s"s${i % 3}", s"p${i % 5}", (i % 7).toLong)).toDF(
      "id", "status", "prio", "v")
    rows(1 to 300).write.parquet(s"$dir/base.parquet")
    try {
      val mv0 = MvRewrite.materialize(spark, s"$dir/base.parquet",
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/mv0.parquet")
      // MIN/MAX partials are not retractable — a view registering them
      // must refuse before touching anything
      val mvMm = MvRewrite.materialize(spark, s"$dir/base.parquet",
        groupCols = Seq("status"), sumCols = Seq("v"),
        mvPath = s"$dir/mvmm.parquet", minMaxCols = Seq("v"))
      intercept[IllegalArgumentException] {
        MvRewrite.refreshRetract(spark, mvMm,
          rows(1 to 1).withColumn("op", lit(-1)), "op", s"$dir/mvmm2.parquet")
      }
      // CDC batch: delete every id ≤ 100 (this empties NO cell yet),
      // delete ALL rows of cell (s1, p1) (ids ≡ 1 mod 15 — empties
      // it), and update ids 200..210 as delete+insert with v+10
      val all = rows(1 to 300)
      val dels = all.filter($"id" <= 100 ||
        ($"status" === "s1" && $"prio" === "p1")).withColumn("op", lit(-1))
      val updSel = all.filter($"id".between(200, 210) &&
        !($"status" === "s1" && $"prio" === "p1"))
      val cdc = dels
        .unionByName(updSel.withColumn("op", lit(-1)))
        .unionByName(updSel.withColumn("v", $"v" + 10L).withColumn("op", lit(1)))
      // the hard proof of "CDC-only": the base is GONE before the
      // refresh runs — any code path re-scanning it would throw
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(s"$dir/base.parquet"))
      val refreshed = MvRewrite.refreshRetract(
        spark, mv0, cdc, "op", s"$dir/mv1.parquet")
      // merged partials == a from-scratch build over the post-CDC state
      val eff = all.filter($"id" > 100 &&
          !($"status" === "s1" && $"prio" === "p1"))
        .withColumn("v", when($"id".between(200, 210), $"v" + 10L)
          .otherwise($"v"))
      eff.write.parquet(s"$dir/eff.parquet")
      MvRewrite.materialize(spark, s"$dir/eff.parquet",
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/mveff.parquet")
      val merged = spark.read.parquet(refreshed.mvPath)
      val rebuilt = spark.read.parquet(s"$dir/mveff.parquet")
      assert(merged.filter($"status" === "s1" && $"prio" === "p1").count() == 0,
        "a fully-retracted cell must vanish from the refreshed MV")
      assert(merged.columns.sorted.toSeq == rebuilt.columns.sorted.toSeq)
      val cols = merged.columns.sorted.map(col).toSeq
      assert(merged.select(cols: _*).orderBy($"status", $"prio").collect().toSeq ==
        rebuilt.select(cols: _*).orderBy($"status", $"prio").collect().toSeq,
        "merge(partial(base), signed-partial(cdc)) must equal " +
          "partial(base ⊖ deletes ⊕ inserts)")
    } finally MvRewrite.clear()
  }

  test("HLL register MV: delta-only refresh == direct build over the union") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-hll").toString
    def rows(r: Range) = r.map(i =>
      (s"g${i % 3}", (i % 40).toLong)).toDF("g", "k")
    rows(1 to 300).write.parquet(s"$dir/base.parquet")
    val hdef = graft.operators.HllMv.Def("g", "k", s"$dir/mv0")
    val mv0 = graft.operators.HllMv.materializeFrom(
      spark.read.parquet(s"$dir/base.parquet"), hdef)
    // the hard proof of "delta-only": the base is GONE before the
    // refresh — any register rebuild touching it would throw
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$dir/base.parquet"))
    val refreshed = graft.operators.HllMv.refreshIncremental(
      spark, mv0, rows(301 to 500), s"$dir/mv1")
    val direct = graft.operators.HllMv.materializeFrom(rows(1 to 500),
      graft.operators.HllMv.Def("g", "k", s"$dir/mvfull"))
    def regs(p: String) = spark.read.parquet(p)
      .orderBy($"g", $"bucket").collect().toSeq
    assert(regs(refreshed.mvPath) == regs(direct.mvPath),
      "maxmerge(regs(base), regs(delta)) must equal regs(base ∪ delta)")
    // served estimates are therefore identical too — and registers
    // being deterministic, this is exact VALUE equality, no error bar
    val est = graft.operators.HllMv.serveDistinct(spark, refreshed)
      .orderBy($"g").collect().toSeq
    val estDirect = graft.operators.HllMv.serveDistinct(spark, direct)
      .orderBy($"g").collect().toSeq
    assert(est == estDirect)
  }

  test("refreshing an unregistered MvDef is refused") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv6").toString
    (1L to 10L).map(i => (i, s"s${i % 2}", i))
      .toDF("id", "status", "v").write.parquet(s"$dir/fact.parquet")
    val mv = MvRewrite.materialize(spark, s"$dir/fact.parquet",
      groupCols = Seq("status"), sumCols = Seq("v"),
      mvPath = s"$dir/mv.parquet")
    MvRewrite.clear() // registration dropped — refresh must not proceed
    intercept[IllegalArgumentException] {
      MvRewrite.refreshIncremental(spark, mv,
        spark.read.parquet(s"$dir/mv.parquet"), s"$dir/mv2.parquet")
    }
  }

  test("avg over a LONG column rewrites with the true non-null denominator") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv7").toString
    val fact = s"$dir/fact.parquet"
    val mv = s"$dir/mv.parquet"
    // v is NULL on every 4th row: avg and count(v) must divide/count
    // by the NON-null population — a rewrite using the row count cnt
    // would be wrong by construction here
    (1L to 400L).map(i => (i, s"s${i % 3}", s"p${i % 5}",
        if (i % 4 == 0) None else Some(i % 7)))
      .toDF("id", "status", "prio", "v")
      .write.parquet(fact)
    try {
      MvRewrite.materialize(spark, fact,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"), mvPath = mv)
      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(avg($"v").as("a"), count($"v").as("nv"),
          count(lit(1)).as("n"))
        .orderBy($"status")
      assert(scansOf(q).exists(_.contains("mv.parquet")),
        s"avg/count(col) over a LONG sum column must rewrite:\n${scansOf(q)}")
      MvRewrite.clear()
      val direct = spark.read.parquet(fact).groupBy($"status")
        .agg(avg($"v").as("a"), count($"v").as("nv"),
          count(lit(1)).as("n"))
        .orderBy($"status")
      assert(q.collect().toSeq == direct.collect().toSeq,
        "MV-folded avg/count(col) == direct values (NULLs included)")
    } finally MvRewrite.clear()
  }

  test("MERGE -> MV refresh composition: upsert the late CDC batch " +
    "into the base, rederive the min/max MV from the same changelog " +
    "== full rebuild; violating the ordering serves stale cells") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-merge").toString
    def mk(r: Range) = r.map(i =>
      (i.toLong, s"s${i % 3}", (i % 7).toDouble)).toDF("id", "status", "v")
    val base0 = mk(1 to 300)
    base0.write.parquet(s"$dir/base0")
    // the MV holds PRE-merge partials, registered against the path
    // the MERGED base will land on (the warehouse ordering: fact
    // upsert commits first, then the MV refresh consumes the log)
    val mv0 = MvRewrite.materializeFrom(base0,
      MvRewrite.MvDef(s"$dir/base1", groupCols = Seq("status"),
        sumCols = Seq("v"), mvPath = s"$dir/mv0",
        minMaxCols = Seq("v")))
    try {
      // late-arriving feed: value updates on 1..60 (some MOVE the row
      // to another cell via a status change), inserts 301..330
      val updates = ((1 to 60).map(i => (i.toLong, 1L,
          (i % 7) + 100.0, if (i % 5 == 0) "s9" else null)) ++
        (301 to 330).map(i => (i.toLong, 1L, (i % 7) + 200.0, "s9")))
        .toDF("uid", "seq", "uv", "ustatus")
      val merged = graft.operators.Upsert.latestWins(
        spark.read.parquet(s"$dir/base0"), updates, "id", "uid", "seq",
        Map("v" -> "uv", "status" -> "ustatus"))
      merged.drop("op").write.parquet(s"$dir/base1")

      // the changelog's touched CELLS come from the snapshot diff —
      // a status-moving update touches BOTH its old and new cell
      val diff = graft.operators.Upsert.snapshotDiff(
        spark.read.parquet(s"$dir/base0"),
        spark.read.parquet(s"$dir/base1"), "id", Seq("status", "v"))
      val cdc = diff.select($"b_status".as("status"))
        .unionByName(diff.select($"a_status".as("status")))
        .filter($"status".isNotNull)

      val refreshed = MvRewrite
        .refreshRetractRederive(spark, mv0, cdc, s"$dir/mv1")
      MvRewrite.clear()
      val rebuilt = MvRewrite.materialize(spark, s"$dir/base1",
        groupCols = Seq("status"), sumCols = Seq("v"),
        mvPath = s"$dir/mvfull", minMaxCols = Seq("v"))
      MvRewrite.clear()
      def rows(p: String) = {
        val df = spark.read.parquet(p)
        val cols = df.columns.sorted.map(col).toSeq
        df.select(cols: _*).orderBy($"status").collect().toSeq
      }
      assert(rows(refreshed.mvPath) == rows(rebuilt.mvPath),
        "MERGE then rederive must equal a full rebuild of the merged base")

      // ordering violated: the refresh consumes the changelog while
      // its source still holds the PRE-merge base — touched cells
      // rebuild from stale data and the MV diverges (why the
      // base-first contract is stated, not assumed)
      val mvStale = MvRewrite.materializeFrom(base0,
        MvRewrite.MvDef(s"$dir/base0", groupCols = Seq("status"),
          sumCols = Seq("v"), mvPath = s"$dir/mv0b",
          minMaxCols = Seq("v")))
      val stale = MvRewrite
        .refreshRetractRederive(spark, mvStale, cdc, s"$dir/mv1b")
      assert(rows(stale.mvPath) != rows(rebuilt.mvPath),
        "a refresh that runs before the base upsert must NOT silently " +
          "equal the rebuild — the divergence is the contract's teeth")
    } finally MvRewrite.clear()
  }

  test("rederive retraction: MIN/MAX via touched cells only — " +
    "untouched base partition DELETED first") {
    withRule() // rule installed: also regression-proofs the
    // suppression guard — without it the touched-cell rebuild would
    // be rewritten onto the stale MV itself and carry pre-CDC values
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-rederive").toString
    def rows(r: Range) = r.map(i =>
      (i.toLong, s"s${i % 3}", s"p${i % 2}", (i % 7).toLong)).toDF(
      "id", "status", "prio", "v")
    val base0 = rows(1 to 300)
    // CDC touches ONLY status=s1 cells: deletes + an update
    val dels = base0.filter($"status" === "s1" && $"id" <= 150)
      .withColumn("op", lit(-1))
    val upd = base0.filter($"status" === "s1" && $"id".between(151, 200))
    val cdc = dels
      .unionByName(upd.withColumn("op", lit(-1)))
      .unionByName(upd.withColumn("v", $"v" + 10L).withColumn("op", lit(1)))
    // post-CDC base, partitioned by status (rederive contract: the
    // fact upsert committed first)
    val eff = base0
      .filter(!($"status" === "s1" && $"id" <= 150))
      .withColumn("v", when($"status" === "s1" && $"id".between(151, 200),
        $"v" + 10L).otherwise($"v"))
    val effPath = s"$dir/eff.parquet"
    eff.write.partitionBy("status").parquet(effPath)
    try {
      val mv0 = MvRewrite.materializeFrom(base0, MvRewrite.MvDef(effPath,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/mv0", minMaxCols = Seq("v")))
      val mv0Untouched = spark.read.parquet(s"$dir/mv0")
        .filter($"status" =!= "s1").orderBy($"status", $"prio")
        .collect().toSeq
      // the hard proof that untouched cells are never re-read: an
      // untouched partition is GONE from the base before the refresh —
      // any rebuild touching it would lose its rows (or throw)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(s"$effPath/status=s0"))
      val refreshed = MvRewrite.refreshRetractRederive(
        spark, mv0, cdc, s"$dir/mv1")
      val mv1 = spark.read.parquet(refreshed.mvPath)
      // untouched cells (s0 INCLUDING the deleted partition, s2)
      // carried over bit-identical from the old MV
      assert(mv1.filter($"status" =!= "s1").orderBy($"status", $"prio")
        .collect().toSeq == mv0Untouched,
        "untouched cells must carry over from the MV, not recompute")
      // touched cells equal a from-scratch build over the post-CDC
      // state (column order differs between partitioned read and
      // materializeFrom — compare name-sorted)
      MvRewrite.materializeFrom(eff, MvRewrite.MvDef(effPath,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/mvexp", minMaxCols = Seq("v")))
      val cols = mv1.columns.sorted.map(col).toSeq
      assert(mv1.filter($"status" === "s1").select(cols: _*)
          .orderBy($"status", $"prio").collect().toSeq ==
        spark.read.parquet(s"$dir/mvexp").filter($"status" === "s1")
          .select(cols: _*).orderBy($"status", $"prio").collect().toSeq,
        "touched cells must equal the post-CDC rebuild, MIN/MAX included")
    } finally MvRewrite.clear()
  }

  test("rederive gate: above cellLiteralMax the semi-join path " +
    "produces identical results") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-rederive2").toString
    def rows(r: Range) = r.map(i =>
      (i.toLong, s"s${i % 3}", (i % 7).toLong)).toDF("id", "status", "v")
    val base0 = rows(1 to 300)
    val dels = base0.filter($"id" % 5 === 0).withColumn("op", lit(-1))
    val eff = base0.filter($"id" % 5 =!= 0)
    eff.write.parquet(s"$dir/eff.parquet")
    try {
      def run(tag: String, gate: Int) = {
        val mv0 = MvRewrite.materializeFrom(base0,
          MvRewrite.MvDef(s"$dir/eff.parquet", groupCols = Seq("status"),
            sumCols = Seq("v"), mvPath = s"$dir/mv0$tag",
            minMaxCols = Seq("v")))
        spark.read.parquet(MvRewrite.refreshRetractRederive(spark, mv0,
          dels, s"$dir/mv1$tag", cellLiteralMax = gate).mvPath)
          .orderBy($"status").collect().toSeq
      }
      // gate = 0 forces the distributed null-safe semi/anti-join path;
      // the default takes the collected literal-predicate path
      assert(run("lit", 10000) == run("join", 0),
        "literal-predicate and semi-join paths must agree")
    } finally MvRewrite.clear()
  }

  test("rederive cell predicate pushes to the base scan (null-safe)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-push").toString
    (1L to 300L).map(i => (i, if (i % 5 == 0) null else s"s${i % 3}",
        i % 7)).toDF("id", "status", "v")
      .write.parquet(s"$dir/base.parquet")
    val base = spark.read.parquet(s"$dir/base.parquet")
    // collected exactly as the rederive collects its touched cells
    val cells = base.filter($"status".isNull || $"status" === "s1")
      .select($"status").distinct().collect().toSeq
    assert(cells.size == 2, "one s1 cell and one NULL cell expected")
    val pred = MvRewrite.cellPredicate(cells, Seq("status"), base)
    val leaves = base.filter(pred).queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString("\n")
    // EqualNullSafe is in parquet's pushdown dialect — the whole OR
    // reaches the scan for row-group pruning (and partition pruning
    // when the base is partitioned by a group column)
    assert(leaves.contains("EqualNullSafe(status,s1)"),
      s"cell predicate must reach the scan as PushedFilters:\n$leaves")
    // and the NULL cell is matchable at all — plain equality would
    // silently drop it (leaving a stale MV row next to a rebuilt one)
    assert(base.filter(pred).count() ==
      base.filter($"status" === "s1" || $"status".isNull).count())
  }

  test("q184 clears the registry: a later orders aggregate scans the fact") {
    withRule()
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val q184 = SparkEntry.queries("q184_mv_rollup")(spark, d)
    // the pinned plan itself is served from the MV …
    assert(scansOf(q184).exists(_.contains("graft-mv-q184")),
      "q184's own plan must scan the MV")

    // … but the registration does NOT leak: the exact shape the rule
    // would have rewritten now plans a plain fact scan
    val later = spark.read.parquet(s"$d/orders.parquet")
      .groupBy($"o_orderstatus")
      .agg(sum($"o_custkey").as("custkey_sum"), count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
    assert(scansOf(later).exists(_.contains("orders.parquet")),
      s"post-q184 aggregate must read the fact:\n${scansOf(later)}")
    assert(!scansOf(later).exists(_.contains("graft-mv")),
      "no leftover MV scan after q184")

    // and the MV-served values equal the direct fact aggregation
    assert(q184.collect().toSeq == later.collect().toSeq,
      "q184 values == direct fact values")
  }

  test("composed gear: count/sum/approx_count_distinct in ONE aggregate " +
    "serve from the algebraic MV joined with the registers; an " +
    "unregistered second key refuses and still answers correctly") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-mixed").toString
    val fact = s"$dir/fact.parquet"
    (1L to 600L).map(i =>
        (i, s"s${i % 2}", s"p${i % 3}", (i % 7).toDouble,
          (i % 45).toLong, (i % 31).toLong))
      .toDF("id", "status", "prio", "v", "k1", "k2")
      .write.parquet(fact)
    try {
      val alg = MvRewrite.materialize(spark, fact,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/alg")
      val hll = graft.operators.HllMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.HllMv.Def(Seq("status", "prio"), "k1",
          s"$dir/hll", Some(fact)))
      MvRewrite.registerHll(hll)
      MvRewrite.register(alg)

      def mixed(key: String) = spark.read.parquet(fact)
        .groupBy($"status", $"prio")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
          approx_count_distinct(col(key)).as("acd"))
        .orderBy($"status", $"prio")

      val q = mixed("k1")
      assert(scansOf(q).exists(_.contains("/alg")) &&
        scansOf(q).exists(_.contains("/hll")),
        s"both MV tables must be scan leaves:\n${scansOf(q)}")
      assert(!scansOf(q).exists(_.contains("fact.parquet")),
        "the composed serve must never read the fact")
      // expected: direct count/sum, the register table's own estimate
      // for the distinct — deterministic, so exact value equality
      val est = graft.operators.HllMv.serveDistinct(spark, hll)
        .select($"status", $"prio",
          expr("CAST(floor(est + 0.5d) AS BIGINT)").as("acd"))
      val want = spark.read.parquet(fact).groupBy($"status", $"prio")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .join(est, Seq("status", "prio"))
        .orderBy($"status", $"prio")
        .select($"status", $"prio", $"n", $"sv", $"acd")
      assert(q.collect().toSeq == want.collect().toSeq,
        "composed serve == direct count/sum + register estimate")

      // negative: k2 has no registered table — the whole rewrite
      // refuses (never a half-serve), the fact answers, still correct
      val q2 = mixed("k2")
      assert(scansOf(q2).exists(_.contains("fact.parquet")),
        s"unregistered key must fall back to the fact:\n${scansOf(q2)}")
      assert(!scansOf(q2).exists(_.contains("/alg")),
        "a refused composition must not half-serve from the MV")
    } finally MvRewrite.clear()
  }

  test("register subset-grouping: a (status, prio) register table " +
    "serves GROUP BY status by register max-merge") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-sub").toString
    val fact = s"$dir/fact.parquet"
    (1L to 500L).map(i => (i, s"s${i % 2}", s"p${i % 3}", (i % 37).toLong))
      .toDF("id", "status", "prio", "k").write.parquet(fact)
    try {
      val fine = graft.operators.HllMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.HllMv.Def(Seq("status", "prio"), "k",
          s"$dir/hll2", Some(fact)))
      MvRewrite.registerHll(fine)
      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(approx_count_distinct($"k").as("acd")).orderBy($"status")
      assert(scansOf(q).exists(_.contains("/hll2")) &&
        !scansOf(q).exists(_.contains("fact.parquet")),
        s"the coarser grouping must re-merge the finer registers:\n" +
          s"${scansOf(q)}")
      // max-merge exactness: the registers are key-hash partials
      // independent of the grouping, so re-merged-to-status equals a
      // register table BUILT at status grain
      val coarse = graft.operators.HllMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.HllMv.Def("status", "k", s"$dir/hllc"))
      val want = graft.operators.HllMv.serveDistinct(spark, coarse)
        .select($"status",
          expr("CAST(floor(est + 0.5d) AS BIGINT)").as("acd"))
        .orderBy($"status")
      assert(q.collect().toSeq == want.collect().toSeq,
        "subset serve == status-grain register build")
    } finally MvRewrite.clear()
  }

  test("quantile gear: approx_percentile serves from the sketch table, " +
    "subset grouping re-aggregates buckets, fractional percents refuse") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-qs").toString
    val fact = s"$dir/fact.parquet"
    (1L to 500L).map(i => (i, s"s${i % 2}", s"p${i % 3}", (i % 97) * 3))
      .toDF("id", "status", "prio", "v").write.parquet(fact)
    try {
      val qd = graft.operators.QuantileMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.QuantileMv.Def(Seq("status", "prio"), "v",
          s"$dir/qs", Some(fact)))
      MvRewrite.registerQuantile(qd)
      val q = spark.read.parquet(fact).groupBy($"status", $"prio")
        .agg(percentile_approx($"v", lit(0.5), lit(1000)).as("p50v"))
        .orderBy($"status", $"prio")
      assert(scansOf(q).exists(_.contains("/qs")) &&
        !scansOf(q).exists(_.contains("fact.parquet")),
        s"the percentile must serve from the sketch: ${scansOf(q)}")
      // value == the sketch's own deterministic estimate
      val want = graft.operators.QuantileMv
        .serveQuantiles(spark, qd, Seq(50))
        .select($"status", $"prio", $"p50".as("p50v"))
        .orderBy($"status", $"prio")
      assert(q.collect().toSeq == want.collect().toSeq,
        "served percentile == sketch estimate")

      // SUBSET grouping: bucket counts add across prio cells
      val sub = spark.read.parquet(fact).groupBy($"status")
        .agg(percentile_approx($"v", lit(0.95), lit(1000)).as("p95v"))
        .orderBy($"status")
      assert(scansOf(sub).exists(_.contains("/qs")) &&
        !scansOf(sub).exists(_.contains("fact.parquet")),
        s"subset grouping must re-merge the sketch: ${scansOf(sub)}")
      val wantSub = graft.operators.QuantileMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.QuantileMv.Def(Seq("status"), "v", s"$dir/qsc"))
      val wantSubDf = graft.operators.QuantileMv
        .serveQuantiles(spark, wantSub, Seq(95))
        .select($"status", $"p95".as("p95v")).orderBy($"status")
      assert(sub.collect().toSeq == wantSubDf.collect().toSeq,
        "subset serve == status-grain sketch build")

      // a percent off the integer grid is NOT servable — fact scan
      val frac = spark.read.parquet(fact).groupBy($"status", $"prio")
        .agg(percentile_approx($"v", lit(0.505), lit(1000)).as("p"))
      assert(scansOf(frac).exists(_.contains("fact.parquet")),
        s"fractional percent must refuse: ${scansOf(frac)}")

      // an unregistered value column refuses too
      val wrongCol = spark.read.parquet(fact).groupBy($"status", $"prio")
        .agg(percentile_approx($"id", lit(0.5), lit(1000)).as("p"))
      assert(scansOf(wrongCol).exists(_.contains("fact.parquet")),
        "unregistered value column must refuse")
    } finally MvRewrite.clear()
  }

  test("sketch serves under group-column filters and subset grouping " +
    "composed with the algebraic side") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-mixed2").toString
    val fact = s"$dir/fact.parquet"
    (1L to 600L).map(i =>
        (i, s"s${i % 2}", s"p${i % 3}", (i % 7).toDouble, (i % 45).toLong))
      .toDF("id", "status", "prio", "v", "k1").write.parquet(fact)
    try {
      val alg = MvRewrite.materialize(spark, fact,
        groupCols = Seq("status", "prio"), sumCols = Seq("v"),
        mvPath = s"$dir/alg")
      val hll = graft.operators.HllMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.HllMv.Def(Seq("status", "prio"), "k1",
          s"$dir/hll", Some(fact)))
      val qs = graft.operators.QuantileMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.QuantileMv.Def(Seq("status", "prio"), "k1",
          s"$dir/qs", Some(fact)))
      MvRewrite.register(alg)
      MvRewrite.registerHll(hll)
      MvRewrite.registerQuantile(qs)

      // SUBSET grouping (status only) + a group-column filter over
      // the OTHER registered group column, mixing all three families
      def q() = spark.read.parquet(fact)
        .filter($"prio".isin("p1", "p2"))
        .groupBy($"status")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
          approx_count_distinct($"k1").as("acd"),
          percentile_approx($"k1", lit(0.5), lit(1000)).as("p50k"))
        .orderBy($"status")
      val served = q()
      val leaves = scansOf(served)
      assert(leaves.exists(_.contains("/alg")) &&
        leaves.exists(_.contains("/hll")) &&
        leaves.exists(_.contains("/qs")) &&
        !leaves.exists(_.contains("fact.parquet")),
        s"all three MVs must serve the filtered subset query:\n$leaves")
      val got = served.collect().toSeq

      // expected: direct count/sum over the filtered fact + each
      // sketch's own estimate over the filtered, re-merged state
      val ff = spark.read.parquet(fact).filter($"prio".isin("p1", "p2"))
      MvRewrite.clear() // direct recompute with the rule inert
      val cs = ff.groupBy($"status")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      val hdirect = graft.operators.HllMv.materializeFrom(ff,
        graft.operators.HllMv.Def(Seq("status"), "k1", s"$dir/hd"))
      val acdw = graft.operators.HllMv.serveDistinct(spark, hdirect)
        .select($"status",
          expr("CAST(floor(est + 0.5d) AS BIGINT)").as("acd"))
      val qdirect = graft.operators.QuantileMv.materializeFrom(ff,
        graft.operators.QuantileMv.Def(Seq("status"), "k1", s"$dir/qd"))
      val p50w = graft.operators.QuantileMv
        .serveQuantiles(spark, qdirect, Seq(50))
        .select($"status", $"p50".as("p50k"))
      val want = cs.join(acdw, "status").join(p50w, "status")
        .select($"status", $"n", $"sv", $"acd", $"p50k")
        .orderBy($"status").collect().toSeq
      assert(got == want,
        s"filtered subset triple serve == direct + sketch estimates:" +
          s"\ngot  $got\nwant $want")
    } finally MvRewrite.clear()
  }

  test("quantile sketch: delta-only refresh == direct build; signed " +
    "retraction == rebuilt histogram") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-qs2").toString
    def rows(r: Range) = r.map(i => (i.toLong, s"g${i % 2}", (i % 53) * 2L))
      .toDF("id", "g", "v")
    rows(1 to 300).write.parquet(s"$dir/base.parquet")
    val qd = graft.operators.QuantileMv.Def(Seq("g"), "v", s"$dir/mv0")
    val mv0 = graft.operators.QuantileMv.materializeFrom(
      spark.read.parquet(s"$dir/base.parquet"), qd)
    // the hard proof of "delta-only": the base is GONE
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$dir/base.parquet"))
    val refreshed = graft.operators.QuantileMv.refreshIncremental(
      spark, mv0, rows(301 to 500), s"$dir/mv1")
    val direct = graft.operators.QuantileMv.materializeFrom(
      rows(1 to 500),
      graft.operators.QuantileMv.Def(Seq("g"), "v", s"$dir/mvfull"))
    def h(p: String) = spark.read.parquet(p)
      .orderBy($"g", $"id").collect().toSeq
    assert(h(refreshed.mvPath) == h(direct.mvPath),
      "add-merge(hist(base), hist(delta)) must equal hist(base ∪ delta)")

    // retraction: delete ids % 3 == 0, re-value ids % 5 == 0 (of the
    // survivors) — signed merge must equal the rebuilt histogram
    val all = rows(1 to 500)
    val dels = all.filter($"id" % 3 === 0).withColumn("op", lit(-1))
    val upd = $"id" % 5 === 0 && $"id" % 3 =!= 0
    val updDel = all.filter(upd).withColumn("op", lit(-1))
    val updIns = all.filter(upd).withColumn("v", $"v" + 40L)
      .withColumn("op", lit(1))
    val cdc = dels.unionByName(updDel).unionByName(updIns)
    val retracted = graft.operators.QuantileMv.refreshRetract(
      spark, direct, cdc, "op", s"$dir/mv2")
    val effective = all.filter($"id" % 3 =!= 0)
      .withColumn("v", when(upd, $"v" + 40L).otherwise($"v"))
    val rebuilt = graft.operators.QuantileMv.materializeFrom(effective,
      graft.operators.QuantileMv.Def(Seq("g"), "v", s"$dir/mveff"))
    assert(h(retracted.mvPath) == h(rebuilt.mvPath),
      "signed bucket merge must equal the post-CDC rebuild")
  }

  test("HLL rederive: CDC-touched cells rebuild from the base slice, " +
    "an untouched (deleted) base partition is never read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-hllrd").toString
    val base = s"$dir/base.parquet"
    def rows(r: Range) = r.map(i => (s"g${i % 2}", (i % 50).toLong, i.toLong))
      .toDF("g", "k", "id")
    // partitioned by the group col: the literal cell predicate prunes
    rows(1 to 400).write.partitionBy("g").parquet(base)
    val mv0 = graft.operators.HllMv.materializeFrom(
      // PRE-CDC state: g0 keys shifted — the CDC will "fix" them
      rows(1 to 400).withColumn("k",
        when($"g" === "g0", $"k" + 1000L).otherwise($"k")),
      graft.operators.HllMv.Def(Seq("g"), "k", s"$dir/mv0", Some(base)))
    // the base already reflects the CDC (contract); the batch touches
    // ONLY g0 — so g1's partition must never be needed: delete it
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$base/g=g1"))
    val cdc = rows(1 to 400).filter($"g" === "g0")
    val refreshed = graft.operators.HllMv
      .refreshRetractRederive(spark, mv0, cdc, s"$dir/mv1")
    // touched cell g0 == rebuilt from the (post-CDC) base slice;
    // untouched g1 carried over from mv0 byte-for-byte
    val got = spark.read.parquet(refreshed.mvPath)
      .orderBy($"g", $"bucket").collect().toSeq
    val wantG0 = graft.ext.Stats.hllRegistersOfCols(
      rows(1 to 400).filter($"g" === "g0"), Seq("g"), "k")
    val wantG1 = spark.read.parquet(mv0.mvPath).filter($"g" === "g1")
    val want = wantG0.unionByName(wantG1)
      .orderBy($"g", $"bucket").collect().toSeq
    assert(got == want,
      "rederive(touched) ∪ carry(untouched) must equal the rebuilt " +
        "register state")
  }

  test("bitmap MV: delta-only refresh == direct build; the serve is " +
    "EXACT count(distinct), negative keys included") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-bm").toString
    // keys span negatives: the >> 6 / & 63 kernel must floor, not
    // truncate toward zero
    def rows(r: Range) = r.map(i =>
      (s"g${i % 3}", ((i % 40) - 20).toLong)).toDF("g", "k")
    rows(1 to 300).write.parquet(s"$dir/base.parquet")
    val bdef = graft.operators.BitmapMv.Def(Seq("g"), "k", s"$dir/mv0")
    val mv0 = graft.operators.BitmapMv.materializeFrom(
      spark.read.parquet(s"$dir/base.parquet"), bdef)
    // hard proof of "delta-only": the base is GONE before the refresh
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$dir/base.parquet"))
    val refreshed = graft.operators.BitmapMv.refreshIncremental(
      spark, mv0, rows(301 to 500), s"$dir/mv1")
    val direct = graft.operators.BitmapMv.materializeFrom(rows(1 to 500),
      graft.operators.BitmapMv.Def(Seq("g"), "k", s"$dir/mvfull"))
    def words(p: String) = spark.read.parquet(p)
      .orderBy($"g", $"w").collect().toSeq
    assert(words(refreshed.mvPath) == words(direct.mvPath),
      "or(words(base), words(delta)) must equal words(base ∪ delta)")
    val served = graft.operators.BitmapMv.serveDistinct(spark, refreshed)
      .orderBy($"g").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val exact = rows(1 to 500).groupBy($"g")
      .agg(countDistinct($"k").as("dct")).orderBy($"g")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(served == exact,
      "sum(bit_count) over the maintained words must equal the exact " +
        "count(distinct) — no error bar")
  }

  test("bitmap rederive: deleting ONE row of a doubly-held key keeps " +
    "the bit; an untouched (deleted) base partition is never read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-bmrd").toString
    val base = s"$dir/base.parquet"
    // g0 holds key 7 TWICE (ids 1, 2) — the CDC deletes id 2 only;
    // a signed/clearing merge would wrongly drop the bit, rederive
    // keeps it because the post-CDC base still holds id 1
    val pre = Seq(("g0", 7L, 1L), ("g0", 7L, 2L), ("g0", 9L, 3L),
      ("g1", 5L, 4L), ("g1", 6L, 5L)).toDF("g", "k", "id")
    val post = pre.filter($"id" =!= 2L)
    post.write.partitionBy("g").parquet(base)
    val mv0 = graft.operators.BitmapMv.materializeFrom(pre,
      graft.operators.BitmapMv.Def(Seq("g"), "k", s"$dir/mv0", Some(base)))
    // the CDC touches only g0 — g1's partition must never be needed
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$base/g=g1"))
    val cdc = Seq(("g0", 7L, 2L, -1)).toDF("g", "k", "id", "op")
    val refreshed = graft.operators.BitmapMv
      .refreshRetractRederive(spark, mv0, cdc, s"$dir/mv1")
    val served = graft.operators.BitmapMv.serveDistinct(spark, refreshed)
      .orderBy($"g").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    // g0 still has {7, 9} — multiplicity protected the bit; g1 carried
    assert(served == Seq(("g0", 2L), ("g1", 2L)),
      s"expected multiplicity-safe rederive, got $served")
  }

  test("bitmap gear refusal: an unregistered key column falls back to " +
    "the fact scan and stays correct") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-bmref").toString
    val fact = s"$dir/fact.parquet"
    (1L to 100L).map(i => (s"s${i % 2}", i % 10, i % 7))
      .toDF("status", "a", "b").write.parquet(fact)
    val bm = graft.operators.BitmapMv.materializeFrom(
      spark.read.parquet(fact),
      graft.operators.BitmapMv.Def(Seq("status"), "a",
        s"$dir/bm", Some(fact)))
    MvRewrite.clear()
    MvRewrite.registerBitmap(bm)
    try {
      // count(DISTINCT b): b has no registered bitmap — the gear must
      // refuse (never half-serve) and the fact scan must answer
      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"b").as("dct")).orderBy($"status")
      assert(scansOf(q).mkString.contains("fact.parquet"),
        "an unregistered distinct key must fall back to the fact")
      assert(q.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
        == Seq(("s0", 7L), ("s1", 7L)))
      // and the registered key DOES serve from the bitmap table
      val ok = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"a").as("dct")).orderBy($"status")
      assert(scansOf(ok).mkString.contains(s"$dir/bm"),
        "the registered key must serve from the bitmap table")
      assert(ok.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
        == Seq(("s0", 5L), ("s1", 5L)))
    } finally MvRewrite.clear()
  }

  test("pure-sketch composition anchors on the UNION of serve domains: " +
    "a cell absent from the bitmap (all-NULL keys) still returns 0") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-dom").toString
    val fact = s"$dir/fact.parquet"
    // s2's `a` is entirely NULL — the bitmap table writes NO words for
    // that cell, so an anchor on the bitmap serve would drop the row;
    // k is non-null everywhere, so the HLL serve's domain has s2
    (1L to 300L).map { i =>
      val st = s"s${i % 3}"
      (i, st, if (i % 3 == 2) None else Some(i % 23), i % 17)
    }.toDF("id", "status", "a", "k").write.parquet(fact)
    try {
      // exact expectations BEFORE registering (no rewrite interference)
      val exactDa = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"a").as("da")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val bm = graft.operators.BitmapMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.BitmapMv.Def(Seq("status"), "a",
          s"$dir/bm", Some(fact)))
      val hll = graft.operators.HllMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.HllMv.Def(Seq("status"), "k",
          s"$dir/hll", Some(fact)))
      val estAk = graft.operators.HllMv.serveDistinct(spark, hll)
        .select($"status",
          expr("CAST(floor(est + 0.5d) AS BIGINT)").as("ak"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      MvRewrite.registerBitmap(bm)
      MvRewrite.registerHll(hll)
      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"a").as("da"),
          approx_count_distinct($"k").as("ak"))
        .orderBy($"status")
      val leaves = scansOf(q)
      assert(leaves.exists(_.contains(s"$dir/bm")) &&
        leaves.exists(_.contains(s"$dir/hll")) &&
        !leaves.exists(_.contains("fact.parquet")),
        s"both sketch tables must serve, never the fact:\n$leaves")
      val got = q.collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val want = Seq("s0", "s1", "s2")
        .map(s => (s, exactDa(s), estAk(s)))
      assert(got == want,
        s"s2 must survive with da=0 via the union anchor:" +
          s"\ngot  $got\nwant $want")
      assert(got.exists { case (s, da, _) => s == "s2" && da == 0L },
        "the all-NULL-key cell must serve an exact 0")
    } finally MvRewrite.clear()
  }

  test("pure single-serve shape synthesizes its cell domain from a " +
    "registered algebraic MV — the all-NULL-key cell serves 0") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-dom2").toString
    val fact = s"$dir/fact.parquet"
    (1L to 300L).map { i =>
      val st = s"s${i % 3}"
      (i, st, if (i % 3 == 2) None else Some(i % 23), (i % 7).toDouble)
    }.toDF("id", "status", "a", "v").write.parquet(fact)
    try {
      val exactDa = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"a").as("da")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val bm = graft.operators.BitmapMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.BitmapMv.Def(Seq("status"), "a",
          s"$dir/bm", Some(fact)))
      val alg = MvRewrite.materialize(spark, fact,
        groupCols = Seq("status"), sumCols = Seq("v"),
        mvPath = s"$dir/alg")
      MvRewrite.registerBitmap(bm)
      MvRewrite.register(alg)
      // NO algebraic aggregate in the output — algPlan is absent and
      // the registered algebraic MV contributes only its cell DOMAIN
      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"a").as("da")).orderBy($"status")
      val leaves = scansOf(q)
      assert(leaves.exists(_.contains(s"$dir/bm")) &&
        leaves.exists(_.contains(s"$dir/alg")) &&
        !leaves.exists(_.contains("fact.parquet")),
        s"bitmap serve + synthesized MV domain, never the fact:\n$leaves")
      val got = q.collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
      val want = Seq("s0", "s1", "s2").map(s => (s, exactDa(s)))
      assert(got == want,
        s"synthesized domain must carry the all-NULL cell:" +
          s"\ngot  $got\nwant $want")
    } finally MvRewrite.clear()
  }

  test("SINGLE sketch serve with NO algebraic MV: the all-NULL-key " +
    "cell survives via the builder's sentinel row — fact never scanned") {
    // the last silent-result corner: self-anchoring used to drop the
    // cell because the sketch table lacked it; the builders are now
    // cell-complete (zero-payload sentinel per all-NULL cell)
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-dom3").toString
    val fact = s"$dir/fact.parquet"
    (1L to 300L).map { i =>
      val st = s"s${i % 3}"
      (i, st, if (i % 3 == 2) None else Some(i % 23),
        if (i % 3 == 1) None else Some(i % 97))
    }.toDF("id", "status", "a", "v").write.parquet(fact)
    try {
      val exactDa = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"a").as("da")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val bm = graft.operators.BitmapMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.BitmapMv.Def(Seq("status"), "a",
          s"$dir/bm", Some(fact)))
      MvRewrite.registerBitmap(bm)   // the ONLY registered MV
      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"a").as("da")).orderBy($"status")
      val leaves = scansOf(q)
      assert(leaves.exists(_.contains(s"$dir/bm")) &&
        !leaves.exists(_.contains("fact.parquet")),
        s"single-serve shape must still avoid the fact:\n$leaves")
      val got = q.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      val want = Seq("s0", "s1", "s2").map(s => (s, exactDa(s)))
      assert(got == want,
        s"the all-NULL-key cell must survive the self-anchor:" +
          s"\ngot  $got\nwant $want")
      assert(got.exists { case (s, da) => s == "s2" && da == 0L })

      // same shape for the quantile sketch: s1's v is entirely NULL —
      // the served percentile for s1 must be NULL, the row present
      MvRewrite.clear()
      val qd = graft.operators.QuantileMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.QuantileMv.Def(Seq("status"), "v",
          s"$dir/qd", Some(fact)))
      MvRewrite.registerQuantile(qd)
      val q2 = spark.read.parquet(fact).groupBy($"status")
        .agg(percentile_approx($"v", lit(0.5), lit(1000)).as("p50"))
        .orderBy($"status")
      val leaves2 = scansOf(q2)
      assert(leaves2.exists(_.contains(s"$dir/qd")) &&
        !leaves2.exists(_.contains("fact.parquet")),
        s"quantile single serve must avoid the fact:\n$leaves2")
      val rows2 = q2.collect().toSeq
      assert(rows2.map(_.getString(0)) == Seq("s0", "s1", "s2"),
        s"every cell must survive, got $rows2")
      assert(rows2.find(_.getString(0) == "s1").exists(_.isNullAt(1)),
        "the all-NULL-value cell must serve a NULL percentile")
      assert(rows2.filter(r => r.getString(0) != "s1")
        .forall(!_.isNullAt(1)))
    } finally MvRewrite.clear()
  }

  test("bitmap key-type discipline: non-integral keys refuse at " +
    "materialize time AND at rewrite-match time") {
    withRule()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-bmtype").toString
    val fact = s"$dir/fact.parquet"
    (1L to 100L).map(i => (s"s${i % 2}", i / 10.0, i % 9))
      .toDF("status", "x", "a").write.parquet(fact)
    try {
      // a DOUBLE key would truncate under the BIGINT cast — refuse
      intercept[IllegalArgumentException] {
        graft.operators.BitmapMv.materializeFrom(
          spark.read.parquet(fact),
          graft.operators.BitmapMv.Def(Seq("status"), "x", s"$dir/bmx"))
      }
      // a def registered for a DOUBLE column (table contents beside
      // the point) must never be chosen by the rewrite: bmKey checks
      // the matched attribute's type, so the fact answers exactly
      val okBm = graft.operators.BitmapMv.materializeFrom(
        spark.read.parquet(fact),
        graft.operators.BitmapMv.Def(Seq("status"), "a",
          s"$dir/bma", Some(fact)))
      MvRewrite.registerBitmap(okBm)
      MvRewrite.registerBitmap(graft.operators.BitmapMv.Def(
        Seq("status"), "x", s"$dir/bma", Some(fact)))
      val q = spark.read.parquet(fact).groupBy($"status")
        .agg(countDistinct($"x").as("dx")).orderBy($"status")
      assert(scansOf(q).exists(_.contains("fact.parquet")),
        s"a DOUBLE distinct key must fall back to the fact:\n${scansOf(q)}")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        == Seq(("s0", 50L), ("s1", 50L)))
    } finally MvRewrite.clear()
  }
}
