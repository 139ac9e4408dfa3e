package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Methodology:
  *  - The action is a `noop`-format write, not `count()`: counting
  *    lets Catalyst prune final projections and drop the presentation
  *    sort, so it understates full materialization cost. The noop sink
  *    consumes every row of the complete plan (sort and projection
  *    included) without paying filesystem I/O.
  *  - The suite runs as `SPARK_GRAFT_BENCH_N` (default 3) complete
  *    interleaved passes — every query once per pass — and each query
  *    reports its MINIMUM across passes. Queries are deterministic, so
  *    the minimum is the best estimator of true plan cost; taking it
  *    across temporally-separated passes (rather than back-to-back
  *    repeats) means a transient external stall (co-located load, GC,
  *    page-cache flush) cannot poison all samples of one query, which
  *    measurably happened with back-to-back medians. Pass 1 also pays
  *    per-plan codegen, so with n ≥ 2 that is excluded too. A
  *    session-level warmup pays JVM JIT + parquet-footer costs before
  *    timing starts.
  *  - Wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_SEC`, default 600
  *    covering warmup + timed passes): the suite has grown past the
  *    point where warmup + 3 full passes fit the driver's timeout
  *    (round 10's bench hit rc=124 and the round lost the artifact).
  *    One UNTIMED warmup pass over every query always runs first
  *    (pays per-plan codegen, so even one timed pass reports
  *    steady-state cost); then timed passes run while one more pass
  *    at the last observed cost projects under budget. At least one
  *    timed pass always runs; the emitted `n` is the TIMED pass
  *    count.
  *  - Per-query watchdog (`SPARK_GRAFT_QUERY_TIMEOUT_SEC`, default
  *    120): a hung query is cancelled and reported as the -1 failure
  *    sentinel instead of stalling the whole suite.
  *  - Warmup failures are tracked SEPARATELY (`warmup_failed` in the
  *    JSON): only a failure in a TIMED pass marks a query failed — a
  *    transient warmup GC stall must not brand a query that then
  *    passes every timed pass (round-11 advice).
  *  - Suite hygiene: every 25 queries within a pass the harness nudges
  *    GC (`System.gc()` between query timers), letting the
  *    ContextCleaner release unreferenced loop-checkpoint RDDs before
  *    they thrash the unified region — the round-11 driver artifact
  *    lost 150 s to exactly that (q275's catalog-sized agg state
  *    wrecked the heap for q276–q278). The nudge sits OUTSIDE the
  *    per-query timers, so reported times stay clean.
  *  - Stall telemetry: if `bench_isolated_baseline.json` (or
  *    `SPARK_GRAFT_ISOLATED_BASELINE`) holds the committed
  *    isolated-lane numbers, the JSON gains
  *    `interleaved_over_isolated` — per-query ratio for every query
  *    ≥ 5× its isolated time — so a poisoned lane is visible in the
  *    driver artifact itself instead of needing a post-hoc bisect.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the bench session is long-lived (n passes × every query share
    // one JVM): bound the Derived registry by the measured default
    // instead of relying only on the end-of-run clear()
    Derived.ensureBudget(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q02_global_stats")
      .foreach(f => try run(f(spark, sfDir)) catch { case _: Throwable => () })
    // SPARK_GRAFT_BENCH_ONLY="q118,q119" times a comma-separated
    // subset (local iteration; the driver leaves it unset)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "600").toDouble
    val qTimeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "120").toLong
    val failedQs = scala.collection.mutable.Set[String]()
    val suiteT0 = System.nanoTime()
    val noWatchdog = sys.env.get("SPARK_GRAFT_NO_WATCHDOG").contains("1")
    def onePass(): Seq[Double] = ordered.zipWithIndex.map {
      case ((name, fn), i) =>
        // lane hygiene OUTSIDE the timer: a GC nudge every 25 queries
        // lets the ContextCleaner release unreferenced loop-checkpoint
        // RDDs before the unified region starts thrashing
        if (i > 0 && i % 25 == 0) System.gc()
        val t0 = System.nanoTime()
        val res: Either[String, Unit] =
          if (noWatchdog)
            try { run(fn(spark, sfDir)); Right(()) }
            catch { case t: Throwable =>
              Left(s"${t.getClass.getName}: ${t.getMessage}") }
          else Watchdog.run(spark, s"bench-$name", qTimeoutSec) {
            run(fn(spark, sfDir))
          }
        res.left.foreach { msg =>
          failedQs += name
          System.err.println(s"BENCH FAIL $name: $msg")
        }
        (System.nanoTime() - t0) / 1e9
    }
    // one UNTIMED full warmup pass pays per-plan codegen + parquet
    // footers, so even a single timed pass reports steady-state cost
    // (the min-of-3 era excluded pass 1 for the same reason)
    val warmupSec = { val t0 = System.nanoTime(); onePass()
      (System.nanoTime() - t0) / 1e9 }
    // a warmup-only failure is NOT a failed query: timed passes get a
    // fresh slate and re-brand only what fails while being measured
    val warmupFailed = failedQs.toSet
    failedQs.clear()
    val samples = scala.collection.mutable.ArrayBuffer[Seq[Double]]()
    var lastPassSec = warmupSec
    while (samples.size < n && (samples.isEmpty || {
      val elapsed = (System.nanoTime() - suiteT0) / 1e9
      elapsed + lastPassSec <= budgetSec
    })) {
      val passT0 = System.nanoTime()
      samples += onePass()
      lastPassSec = (System.nanoTime() - passT0) / 1e9
    }
    val nUsed = samples.size
    val results = ordered.zipWithIndex.map { case ((name, _), i) =>
      val failed = failedQs.contains(name)
      // a failed attempt's elapsed time is meaningless — report the -1
      // sentinel so regressions surface in the JSON instead of looking
      // like a fast query
      (name, if (failed) -1.0 else samples.map(_(i)).min, failed)
    }
    // ms precision keeps the one-line JSON compact enough for tail
    // capture; the full line is also mirrored to a file (below) so the
    // per-query map survives any stdout truncation
    // Locale.ROOT: the default-locale f-interpolator writes a comma
    // decimal separator under e.g. de_DE, producing invalid JSON
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) =>
      s"\"" + k + "\":" + (if (v < 0) "-1.0" else sec(v))
    }.mkString("{", ",", "}")
    val nFailed = results.count(_._3)
    val total = results.filterNot(_._3).map(_._2).sum
    // stall telemetry: ratio vs the committed isolated-lane baseline
    // for every query running ≥5× its isolated time (the round-11
    // q275→q278 poisoning, made visible in the artifact itself)
    val isolatedBaseline: Map[String, Double] = {
      val p = sys.env.getOrElse("SPARK_GRAFT_ISOLATED_BASELINE",
        "bench_isolated_baseline.json")
      try {
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
        // flat {"name": sec, ...} map — parsed with a tolerant regex,
        // no JSON lib on the unmanaged classpath
        """"([^"]+)"\s*:\s*([0-9.Ee+-]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    }
    val stalls = results.collect {
      case (name, v, false) if v > 0 && isolatedBaseline.get(name)
        .exists(iso => iso > 0 && v >= 5 * iso) =>
        s"\"$name\":" + sec(v / isolatedBaseline(name))
    }.mkString("{", ",", "}")
    // per-round shuffle-balance artifact: the q156 multiplicative-hash
    // key→partition load profile over the bench SF's fact table, so
    // every round records whether the data's key skew would unbalance
    // a 32-way shuffle (load_q4 = partition_rows × parts ÷ total; 1.0
    // is perfect balance)
    val skew = try {
      val rows = queries.Extended.partitionBalance(spark, sfDir).collect()
      val loads = rows.map(_.getAs[Double]("load_q4"))
      val hot = rows.map(_.getAs[Long]("hottest_key_rows")).max
      s"""{"parts":${rows.length},"max_load":${loads.max},"min_load":${loads.min},"hottest_key_rows":$hot}"""
    } catch { case t: Throwable =>
      System.err.println(s"BENCH SKEW FAIL: ${t.getMessage}"); "null"
    }
    // n_queries is the DERIVED registered-operator count (the README
    // cites this number; it is never hand-maintained)
    val warmupOnly = (warmupFailed -- failedQs).toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${SparkEntry.queries.size},"queries":$qs,"failed":$nFailed,"warmup_failed":$warmupOnly,"interleaved_over_isolated":$stalls,"skew":$skew,"sf":"$sfDir","n":$nUsed,"action":"noop_write_min_of_interleaved_passes"}"""
    println(line)
    // sidecar copy: the committed per-round artifact regardless of how
    // much stdout the harness tails
    sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(Some("bench_last.json"))
      .foreach { p =>
        try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
        catch { case t: Throwable =>
          System.err.println(s"BENCH SIDECAR WRITE FAILED ($p): $t") }
      }
    Derived.clear()
    spark.stop()
    // a watchdog-abandoned worker may hold a runaway driver-side loop
    // — exit explicitly so the JVM never lingers on a non-daemon leak
    sys.exit(0)
  }

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
