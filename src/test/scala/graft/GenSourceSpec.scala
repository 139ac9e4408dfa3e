package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSource V2 generator: parallelism, exact generation vs a Scala
  * reference, and column pruning reaching the connector.
  */
class GenSourceSpec extends SparkSpec {
  import spark.implicits._

  private def gen(rows: Long, parts: Int) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("generates exactly the formula rows, independent of slicing") {
    val P = 2147483647L
    val want = (0L until 1000L).map { id =>
      val h = (id % P) * 2654435761L % P
      (id, h % 1000L, (h / 1000L) % 100000L)
    }.toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = gen(1000, parts).as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("plans the requested number of input partitions") {
    val rdd = gen(10000, 7).rdd
    assert(rdd.getNumPartitions == 7)
  }

  test("column pruning reaches the connector's read schema") {
    val df = gen(1000, 2).select($"bucket")
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("bucket"),
      s"connector must materialize only the projected column, " +
        s"got ${scan.scan.readSchema().fieldNames.toSeq}")
    // pruned read still yields the right values
    val got = df.as[Long].collect().sorted.toSeq
    val want = (0L until 1000L)
      .map(id => ((id % 2147483647L) * 2654435761L % 2147483647L) % 1000L)
      .sorted
    assert(got == want)
  }

  private def genScanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .head.scan.asInstanceOf[graft.sources.GenSource.GenScan]

  test("ungrouped count/min/max/sum push COMPLETELY into the source — " +
    "the closed-form answer generates zero rows") {
    val df = gen(5000000L, 8)
      .filter($"id" >= 1000L && $"id" < 4000000L)
      .agg(count(lit(1)).as("n"), min($"id").as("mn"),
        max($"id").as("mx"), sum($"id").as("s"))
    // the aggregate node is gone: the plan is Project over the
    // one-row GenAggScan (AQE may wrap the tree, so assert on the
    // rendered plan rather than node collection)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GenAggScan[1000, 4000000)"),
      s"the aggregate must reach the connector completely:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown must eliminate the aggregate exec:\n$plan")
    val (lo, hi) = (1000L, 4000000L)
    val got = df.as[(Long, Long, Long, Long)].head()
    val n = hi - lo
    assert(got == ((n, lo, hi - 1, (lo + hi - 1) * n / 2)),
      s"closed forms must answer exactly, got $got")
    // grouped aggregates refuse the pushdown and stay row-generated
    val grouped = gen(1000L, 2).groupBy($"bucket")
      .agg(count(lit(1)).as("n"))
    val gPlan = grouped.queryExecution.executedPlan.toString
    assert(!gPlan.contains("GenAggScan"),
      "grouped aggregation must fall back to the row scan")
    assert(grouped.agg(sum($"n")).as[Long].head() == 1000L)
  }

  test("id range filters clamp the generated interval at the source") {
    val df = gen(100000, 8).filter($"id" >= 90000L && $"id" < 90100L)
    val scan = genScanOf(df)
    assert(scan.lo == 90000L && scan.hi == 90100L,
      s"interval must clamp to the predicate, got [${scan.lo}, ${scan.hi})")
    assert(df.count() == 100L)
    assert(df.agg(sum($"id")).as[Long].head() == (90000L until 90100L).sum)
  }

  test("EqualTo pins a one-row interval; strict bounds are off-by-one exact") {
    val eq = gen(1000, 4).filter($"id" === 17L)
    assert(genScanOf(eq).lo == 17L && genScanOf(eq).hi == 18L)
    assert(eq.select($"id").as[Long].collect().toSeq == Seq(17L))
    val strict = gen(1000, 4).filter($"id" > 10L && $"id" <= 12L)
    assert(genScanOf(strict).lo == 11L && genScanOf(strict).hi == 13L)
    assert(strict.select($"id").as[Long].collect().sorted.toSeq == Seq(11L, 12L))
  }

  test("non-id filters stay residual and still apply; empty clamp yields zero rows") {
    val df = gen(1000, 4).filter($"bucket" === 5L && $"id" < 500L)
    val scan = genScanOf(df)
    assert(scan.lo == 0L && scan.hi == 500L, "bucket predicate must not clamp")
    val want = (0L until 500L).filter(id =>
      ((id % 2147483647L) * 2654435761L % 2147483647L) % 1000L == 5L)
    assert(df.select($"id").as[Long].collect().sorted.toSeq == want)
    assert(gen(1000, 4).filter($"id" >= 800L && $"id" < 700L).count() == 0L)
  }

  test("Long.MaxValue bounds stay residual instead of wrapping the clamp") {
    // id <= MaxValue is satisfied by every row; a wrapping `v + 1`
    // would clamp hi to Long.MinValue and return zero rows.
    val le = gen(1000, 4).filter($"id" <= Long.MaxValue)
    assert(genScanOf(le).hi == 1000L, "satisfiable bound must not clamp")
    assert(le.count() == 1000L)
    // id > MaxValue is unsatisfiable; the residual filter still
    // applies, so the count is zero without interval arithmetic.
    assert(gen(1000, 4).filter($"id" > Long.MaxValue).count() == 0L)
    assert(gen(1000, 4).filter($"id" === Long.MaxValue).count() == 0L)
  }

  test("runtime filtering: a broadcast join's build-side keys clamp " +
    "the generated interval at RUNTIME (DSv2 dynamic pruning analog)") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // big generated side (reports ~240 MB, so IT is the probe side);
    // the dimension carries a SELECTIVE filter — the shape Spark's
    // runtime-filtering heuristic requires on the build side —
    // leaving 50 ids clustered in [70000, 70049]
    val dim = spark.range(0L, 1000000L).toDF("id")
      .filter($"id" >= 70000L && $"id" < 70050L)
    val j = gen(10000000L, 8).join(dim, "id")
    assert(j.count() == 50L)
    // after execution the scan's interval must have clamped to the
    // build-side hull, not the 10M-row static interval (AQE wraps
    // the executed plan — read the adaptive FINAL plan)
    val finalPlan = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(finalPlan.toString.contains("BroadcastHashJoin"))
    val scan = finalPlan.collectFirst {
      case b: BatchScanExec
        if b.scan.isInstanceOf[graft.sources.GenSource.GenScan] =>
        b.scan.asInstanceOf[graft.sources.GenSource.GenScan]
    }.get
    assert(scan.lo == 70000L && scan.hi == 70050L,
      s"runtime filter must clamp the interval, got " +
        s"[${scan.lo}, ${scan.hi})")
  }

  test("reported statistics drive join planning: a filter-clamped " +
    "side auto-broadcasts WITHOUT a hint; an unclamped one does not") {
    // the probe side reports ~160 MB — over the broadcast threshold —
    // so only the generator side's own statistics decide the strategy
    val big = spark.range(0L, 20000000L).toDF("id")
    val smallSide = gen(50000000L, 8)
      .filter($"id" >= 100L && $"id" < 1100L)   // 1000 rows by stats
    val j = big.join(smallSide, "id")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"exact 1000-row stats must pick a broadcast join:\n$plan")
    assert(j.count() == 1000L)
    // the unclamped 50M-row scan reports ~1.2 GB and must NOT plan a
    // static broadcast on either side
    val wide = big.join(gen(50000000L, 8), "id")
    val initial = wide.queryExecution.sparkPlan.toString
    assert(!initial.contains("BroadcastHashJoin"),
      s"a 50M-row side must not statically broadcast:\n$initial")
  }

  test("LIMIT pushes into the source: the interval clamps to the " +
    "first n ids instead of generating the full range") {
    val df = gen(2000000L, 8).filter($"id" >= 1000L).limit(5)
    val scan = genScanOf(df)
    assert(scan.lo == 1000L && scan.hi == 1005L,
      s"limit must clamp the far end, got [${scan.lo}, ${scan.hi})")
    assert(df.select($"id").as[Long].collect().sorted.toSeq ==
      (1000L until 1005L).toSeq)
    // a limit wider than the interval leaves the clamp alone
    val wide = gen(100L, 4).limit(1000)
    assert(genScanOf(wide).hi == 100L)
    assert(wide.count() == 100L)
    // OFFSET clamps the near end: paginate without materializing the
    // skipped prefix
    val page = gen(2000000L, 8).offset(1000).limit(5)
    val ps = genScanOf(page)
    assert(ps.lo == 1000L && ps.hi == 1005L,
      s"offset+limit must clamp both ends, got [${ps.lo}, ${ps.hi})")
    assert(page.select($"id").as[Long].collect().sorted.toSeq ==
      (1000L until 1005L).toSeq)
  }

  private def keyedGen(rows: Long, parts: Int) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("parts", parts.toString)
      .option("keyed", "true").load()

  private def finalPlanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("keyed mode: residue-class slices carry partition keys and the " +
    "scan reports KeyGroupedPartitioning — groupBy(g) runs with NO shuffle") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = keyedGen(100000L, 8)
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"cents").as("s"))
      .orderBy($"g")
    val rows = df.as[(Long, Long, Long)].collect().toSeq
    // no exchange below the aggregate: the scan's reported layout
    // already satisfies the clustered distribution
    val plan = finalPlanOf(df).toString
    val aggPart = plan.split("TakeOrderedAndProject|Sort").last
    assert(!plan.contains("Exchange hashpartitioning"),
      s"keyed groupBy(g) must not shuffle:\n$plan")
    // values: same formulas as contiguous slicing, partitioned by residue
    val P = 2147483647L
    val want = (0L until 100000L).groupBy(_ % 8).map { case (g, ids) =>
      (g, ids.size.toLong,
        ids.map(id => ((id % P) * 2654435761L % P / 1000L) % 100000L).sum)
    }.toSeq.sortBy(_._1)
    assert(rows == want)
  }

  test("storage-partitioned join: two keyed generators with the same " +
    "layout join WITHOUT exchanging either side") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // join keys (g, cents) ⊋ partition keys (g): co-partitioning on the
    // reported key subset must be accepted in place of a full-cluster
    // hash requirement
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val t1 = keyedGen(2000000L, 16).select($"g", $"cents", $"id".as("id1"))
    val t2 = keyedGen(1000000L, 16).select($"g", $"cents", $"id".as("id2"))
    val j = t1.join(t2, Seq("g", "cents"))
      .agg(count(lit(1)).as("pairs"), sum($"id1" + $"id2").as("idsum"))
    val got = j.as[(Long, Long)].head()
    // the only exchange is the global aggregate's SinglePartition
    // gather ABOVE the join — neither join input may shuffle
    val plan = finalPlanOf(j).toString
    val joinSubtree = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1)
      .mkString
    assert(!joinSubtree.contains("Exchange"),
      s"storage-partitioned join must not shuffle either side:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    assert(got._1 > 0L)
  }

  test("columnar mode: the scan feeds ColumnarBatches (Batched path) " +
    "and generates exactly the row-path values") {
    val colDf = spark.read.format("graft.sources.GenSource")
      .option("rows", "100000").option("parts", "4")
      .option("columnar", "true").load()
    val scanExec = colDf.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head
    assert(scanExec.supportsColumnar,
      "columnar=true must enable vectorized batches on the scan")
    assert(colDf.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"),
      "the plan must bridge batches into whole-stage codegen")
    val got = colDf.as[(Long, Long, Long)].collect().toSet
    val want = gen(100000L, 4).as[(Long, Long, Long)].collect().toSet
    assert(got == want, "columnar and row paths must generate identically")
    // columnar composes with pushdown: clamp + prune still vectorized
    val pruned = colDf.filter($"id" >= 500L && $"id" < 600L)
      .select($"cents")
    assert(pruned.as[Long].collect().sorted.toSeq ==
      gen(100000L, 4).filter($"id" >= 500L && $"id" < 600L)
        .select($"cents").as[Long].collect().sorted.toSeq)
  }

  test("keyed + columnar compose; pruning g away downgrades the report " +
    "honestly instead of failing resolution") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = spark.read.format("graft.sources.GenSource")
      .option("rows", "50000").option("parts", "8")
      .option("keyed", "true").option("columnar", "true").load()
    // g pruned from the output: the scan must fall back to unknown
    // partitioning (the report could not resolve) and still be correct
    val noG = df.select($"id", $"bucket")
    assert(noG.count() == 50000L)
    val keyedAgg = df.groupBy($"g").agg(sum($"id").as("s"))
    assert(!finalPlanOf(keyedAgg).toString.contains("Exchange hashpartitioning"),
      "keyed+columnar groupBy(g) must stay shuffle-free")
    assert(keyedAgg.agg(sum($"s")).as[Long].head() ==
      (0L until 50000L).sum)
  }

  test("reported ordering: a per-partition sort on id above the scan " +
    "is dropped as redundant") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
    val sorted = gen(100000L, 4).sortWithinPartitions($"id")
      .select($"id", $"cents")
    val plan = finalPlanOf(sorted).toString
    assert(!plan.contains("Sort "),
      s"the scan already generates ids ascending — SortExec is redundant:\n$plan")
    // and the data really is sorted within each partition
    val ok = sorted.select($"id").rdd
      .mapPartitions(it => Iterator.single(
        it.map(_.getLong(0)).sliding(2).forall(
          s => s.length < 2 || s.head < s.last)))
      .collect().forall(identity)
    assert(ok, "each partition must yield ascending ids")
    // a sort on a NON-reported column still plans a real SortExec
    val byCents = gen(10000L, 4).sortWithinPartitions($"cents")
    assert(finalPlanOf(byCents).toString.contains("Sort "),
      "sorting by cents is not covered by the report and must stay")
  }

  test("TABLESAMPLE pushes as a deterministic hash-systematic sample: " +
    "Spark's Sample node is gone and the subset is slicing-invariant") {
    val P = 2147483647L
    val want = (0L until 100000L).filter { id =>
      val h = (id % P) * 2654435761L % P
      h < (0.25 * P).toLong
    }.toSet
    for (parts <- Seq(2, 8)) {
      val df = gen(100000L, parts).sample(0.25, seed = 42L)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Sample"), // the node pushed completely
        s"the pushed sample must replace Spark's Sample node:\n$plan")
      assert(plan.contains("sample=h["), plan)
      val got = df.select($"id").as[Long].collect().toSet
      assert(got == want, s"parts=$parts: pushed sample must be the " +
        s"deterministic hash subset (got ${got.size}, want ${want.size})")
    }
    // a sample NOT directly above the scan stays Spark-side (the rule
    // only pushes Sample(relation); filters reorder beneath Sample, so
    // filter().sample() keeps the Bernoulli sampler) — the pushed and
    // unpushed paths must at least agree on the clamped universe
    val clamped = gen(100000L, 4).filter($"id" >= 50000L).sample(0.25, 7L)
    assert(!clamped.queryExecution.executedPlan.toString.contains("sample=h["))
    assert(clamped.select($"id").as[Long].collect()
      .forall(id => id >= 50000L && id < 100000L))
    // the columnar path samples identically to the row path
    val colSample = spark.read.format("graft.sources.GenSource")
      .option("rows", "100000").option("parts", "4")
      .option("columnar", "true").load()
      .sample(0.25, 42L).select($"id").as[Long].collect().toSet
    assert(colSample == want)
    // an aggregate over a pushed sample must NOT serve closed forms
    val agg = gen(100000L, 4).sample(0.25, 42L).agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString.contains("GenAggScan"),
      "closed forms assume every id survives — refuse under a sample")
    assert(agg.as[Long].head() == want.size.toLong)
  }

  test("grouped aggregate pushdown: groupBy(g) count/min/max/sum over " +
    "a keyed generator answers from per-residue closed forms, zero rows") {
    val df = keyedGen(1000000L, 8)
      .filter($"id" >= 100L && $"id" < 700005L)
      .groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"id").as("mn"),
        max($"id").as("mx"), sum($"id").as("s"))
      .orderBy($"g")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GenAggScan") && plan.contains("groupBy=g"),
      s"grouped aggregate must reach the connector completely:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown must eliminate the aggregate exec:\n$plan")
    val got = df.as[(Long, Long, Long, Long, Long)].collect().toSeq
    val want = (100L until 700005L).groupBy(_ % 8).toSeq.map {
      case (g, ids) => (g, ids.size.toLong, ids.min, ids.max, ids.sum)
    }.sortBy(_._1)
    assert(got == want)
    // an empty residue class yields NO group row (SQL semantics)
    val tiny = keyedGen(4L, 8).groupBy($"g").agg(count(lit(1)).as("n"))
    assert(tiny.queryExecution.executedPlan.toString.contains("GenAggScan"))
    assert(tiny.as[(Long, Long)].collect().toSet ==
      Set((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L)))
    // grouping by anything else still falls back to the row scan
    val other = keyedGen(1000L, 8).groupBy($"bucket")
      .agg(count(lit(1)).as("n"))
    assert(!other.queryExecution.executedPlan.toString.contains("GenAggScan"))
    assert(other.agg(sum($"n")).as[Long].head() == 1000L)
  }

  test("sum pushdown refuses when the closed form overflows Long — " +
    "ANSI parity with the un-pushed aggregate") {
    val lo = Long.MaxValue - 1000L
    // closed-form sum over [lo, MaxValue) ≈ 9.2e21 — far past Long
    val overflowing = gen(Long.MaxValue, 4).filter($"id" >= lo)
      .agg(sum($"id").as("s"))
    val plan = overflowing.queryExecution.executedPlan.toString
    assert(!plan.contains("GenAggScan"),
      s"an overflowing closed form must NOT push completely:\n$plan")
    // the fallback row scan + Spark's own Sum raises under ANSI (the
    // session default) — the exact semantics a silently-wrapping
    // pushed scan would have changed
    val raised = intercept[Throwable](overflowing.collect())
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(raised).exists(c =>
      String.valueOf(c.getMessage).toLowerCase.contains("overflow")),
      s"expected ARITHMETIC_OVERFLOW, got $raised")
    // count/min/max on the same interval are still closed-form safe
    val ok = gen(Long.MaxValue, 4).filter($"id" >= lo)
      .agg(count(lit(1)).as("n"), max($"id").as("mx"))
    assert(ok.queryExecution.executedPlan.toString.contains("GenAggScan"))
    assert(ok.as[(Long, Long)].head() == ((1000L, Long.MaxValue - 1)))
  }

  test("metadata column _h: served when named, absent from the pruned " +
    "read schema otherwise, and equal to the closed-form hash") {
    val P = 2147483647L
    val withMeta = gen(1000, 2).select($"id", col("_h"))
    val got = withMeta.as[(Long, Long)].collect().toMap
    (0L until 1000L).foreach { id =>
      assert(got(id) == (id % P) * 2654435761L % P, s"id=$id")
    }
    assert(genScanOf(withMeta).readSchema().fieldNames.contains("_h"))
    // unreferenced: the scan never materializes it
    val plain = gen(1000, 2).select($"bucket")
    assert(!genScanOf(plain).readSchema().fieldNames.contains("_h"))
    // and it is not part of SELECT * (metadata contract)
    assert(!gen(1000, 2).columns.contains("_h"))
  }

  test("micro-batch stream: AvailableNow + rowsPerBatch drains the " +
    "interval in ceil(rows/batch) batches; a re-run on the SAME " +
    "checkpoint replays committed offsets and emits nothing new") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files
      .createTempDirectory("gen-stream-resume").toString
    val out = java.nio.file.Files
      .createTempDirectory("gen-stream-out").toString
    def run(): Long = {
      val q = spark.readStream.format("graft.sources.GenSource")
        .option("rows", "1000").option("parts", "4")
        .option("rowsPerBatch", "300")
        .load()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.stop()
      q.recentProgress.count(_.numInputRows > 0).toLong
    }
    val batches1 = run()
    assert(batches1 == 4L, // ceil(1000/300)
      s"admission control must split into 4 batches, got $batches1")
    val rows1 = spark.read.parquet(out)
    assert(rows1.count() == 1000L)
    // append-sink rows equal the batch scan exactly (same formulas)
    val batchTwin = gen(1000, 4)
    assert(rows1.exceptAll(batchTwin).isEmpty &&
      batchTwin.exceptAll(rows1).isEmpty,
      "streamed union-of-batches must equal the batch scan")
    // resume: offsets are committed; a second run finds no new ids
    val batches2 = run()
    assert(batches2 == 0L,
      s"a resumed run must admit nothing, got $batches2 data batches")
    assert(spark.read.parquet(out).count() == 1000L,
      "resume must not re-emit committed ranges")
  }
}
