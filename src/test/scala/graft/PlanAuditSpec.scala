package graft

/** Plan-shape regression guards for the flagship queries: the claims
  * the Scaladocs make about pushdown and broadcast placement are
  * asserted here against the executed plans, so an innocent refactor
  * can't silently turn a pushed filter into a post-scan one or a
  * broadcast dim into a shuffle join.
  */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, d)
    df.queryExecution.executedPlan.toString
  }

  test("q01: the timestamp filter reaches the parquet scan") {
    val leaves = SparkEntry.queries("q01_pricing_summary")(spark, d)
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaves.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "expected the shipdate predicate pushed into the scan")
  }

  test("q07: all three dimensions join as broadcasts") {
    val plan = planOf("q07_star_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, found $broadcasts")
  }

  test("q27: LSH band join is an equi-join, not a cartesian product") {
    val plan = planOf("q27_minhash_lsh")
    assert(!plan.contains("CartesianProduct"),
      "band-key candidate generation must never plan a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "band-key candidate generation must never plan a nested-loop join")
  }

  test("q64: incremental merge keeps partial aggregation (no extra shuffle rounds)") {
    val plan = planOf("q64_incremental_agg")
    // union of two partial states + merge = HashAggregates, never a sort-based agg
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q71/q73: the document-frequency side joins as a broadcast") {
    for (q <- Seq("q71_tfidf", "q73_bm25")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: df (vocabulary-sized) must broadcast, not shuffle the tf side")
    }
  }

  test("q76: profiling is one aggregation pass over one scan") {
    val plan = planOf("q76_profile_columns")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected a single table scan, found $scans")
  }

  test("q77: salted join is a plain equi-join (no broadcast, no cartesian)") {
    val plan = planOf("q77_salted_join")
    assert(!plan.contains("CartesianProduct"))
    // the whole point is exercising the shuffle path with salted keys:
    // both sides hash-partition on (key, salt)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      "salted join must take the shuffle-join path")
  }

  test("q82/q87: k-means assignment broadcasts the centroids, never shuffles the corpus against them") {
    for (q <- Seq("q82_kmeans_step", "q87_kmeans_train")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
        s"$q: centroid side must broadcast")
      assert(!plan.contains("CartesianProduct"),
        s"$q: no un-broadcast cartesian against the corpus")
      assert(!plan.contains("Window"),
        s"$q: argmin must be the algebraic min_by aggregate, not a window")
    }
  }

  test("q83: MERGE feed collapses below the exchange (map-side partial max_by)") {
    val plan = planOf("q83_merge_upsert")
    assert(!plan.contains("Window"),
      "latest-wins collapse must be an aggregate, not a row_number window")
    // partial agg before the exchange: two agg nodes around one shuffle
    val aggs = "Aggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final aggregate pair, found $aggs")
  }

  test("q81: duplicated-shingle scoring never plans a pairwise doc join") {
    val plan = planOf("q81_crossdoc_dup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "cross-doc dup fraction must stay linear: explode + count + equi-join back")
  }

  test("q96: funnel is two agg levels, two exchanges, no window/sort") {
    val plan = planOf("q96_funnel")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"funnel must shuffle only per-user partials " +
      s"then the global rollup, found $exchanges exchanges")
    assert(!plan.contains("Window"), "funnel must not plan a window")
  }

  test("q100: regression is a single aggregation shuffle plus the output sort") {
    val plan = planOf("q100_linear_regression")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"sufficient-stats regression is one agg exchange + presentation sort, found $exchanges")
  }

  test("q104: degree agg reuses the cached edge partitioning (no exchange below it)") {
    val df = SparkEntry.queries("q104_degree_distribution")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "degree profile must read the shared Derived edge cache")
    // the toString includes the cached relation's own build plan —
    // audit only the operators ABOVE the InMemoryTableScan leaf: the
    // (kind, deg) regroup and presentation sort may shuffle, the
    // per-src degree agg must reuse the cache's hash(src) layout
    val above = plan.substring(0, plan.indexOf("InMemoryTableScan"))
    val exchanges = "Exchange".r.findAllIn(above).size
    assert(exchanges <= 2,
      s"degree agg must reuse hash(src) cache layout, found $exchanges exchanges above the cache scan")
  }

  test("q105: skyline is window-only — no self-join of any kind") {
    val plan = planOf("q105_pareto_skyline")
    assert(plan.contains("Window"), "skyline runs the one-pass window form")
    assert(!"Join".r.findAllIn(plan).hasNext,
      "skyline must not plan a join (the quadratic NOT EXISTS lives only in the oracle)")
  }

  test("q116: null-safe equality plans as a real equi-join, not a nested loop") {
    val plan = planOf("q116_nullsafe_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "<=> must hash on the null-safe key, never degrade to a nested loop")
  }

  test("q111: fuzzy join is variant-blocked — no all-pairs compare") {
    val plan = planOf("q111_fuzzy_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "deletion-neighborhood blocking must plan an equi-join on the variant key")
  }

  test("q119: prefix-filter candidates join on the token — no all-pairs compare") {
    val plan = planOf("q119_setsim_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join on prefix tokens")
  }

  test("q122: posting self-join is term-keyed; the vocabulary broadcasts") {
    val plan = planOf("q122_sparse_cosine")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "dot products must come from the inverted-index equi-join")
    assert(plan.contains("BroadcastHashJoin"),
      "the df-pruned vocabulary must broadcast, not shuffle the tf side")
  }

  test("q123: covariance is map-side pair expansion + one aggregation (no join)") {
    val plan = planOf("q123_embedding_cov")
    assert(!"Join".r.findAllIn(plan).hasNext,
      "the i<=j pair grid must expand per row, never via a self-join")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"one agg exchange + presentation sort, found $exchanges")
  }

  test("q124/q130: sketches build in one aggregation pass, no window over the data") {
    for ((q, maxEx) <- Seq(("q124_countmin", 2), ("q130_quantile_sketch", 4))) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q: no cartesian")
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= maxEx, s"$q: found $exchanges exchanges")
    }
  }

  test("q129: global index keeps the data window partition-parallel") {
    val df = SparkEntry.queries("q129_global_index")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // the data-sized window must partition by __pid; the only
    // partition-less window allowed is the #partitions-row offsets
    val windows = "Window".r.findAllIn(plan).size
    assert(windows >= 1 && plan.contains("__pid"),
      "per-partition numbering window must key on the partition id")
  }

  test("q132: the dirty-range gate joins as a broadcast, never re-shuffling the replicas") {
    val plan = planOf("q132_replica_diff")
    assert(!plan.contains("CartesianProduct"), "no cartesian anywhere")
    assert(plan.contains("BroadcastHashJoin"),
      "the #dirty-ranges frame must broadcast into the row-level phase")
  }

  test("q133: bitmap build is one aggregation pass over the joined fact") {
    val plan = planOf("q133_activity_bitmap")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"),
      "the customer dimension must broadcast under the fact scan")
  }

  test("q91: distribution ranks never funnel the data through per-group reducers") {
    withScaleShape {
    val df = SparkEntry.queries("q91_distribution_ranks")(spark, d)
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
    // no window partitioned by the 3-value status column may touch the
    // data: ranks come from the GlobalIndex numbering (windows key on
    // __pid) + the broadcast #groups-row offset frame
    assert(lines.exists(_.contains("__pid")),
      "expected the GlobalIndex per-partition numbering window")
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val child = lines.drop(i + 1).take(2).mkString
        assert(child.contains("HashAggregate") && child.contains("__pid"),
          s"single-partition exchange over data rows:\n" +
            lines.slice(i, i + 3).mkString("\n"))
      }
    }
  }

  test("q135: heavy hitters run the two-phase form, never a full-domain aggregate alone") {
    val plan = planOf("q135_heavy_hitters")
    assert(plan.contains("MapPartitions"),
      "phase 1 must be the bounded-state Misra-Gries mapPartitions pass")
    assert(plan.contains("BroadcastHashJoin"),
      "the recount must join the bounded candidate set as a broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q136: interpolation is join-free — neighbors come from user-keyed windows") {
    val df = SparkEntry.queries("q136_interpolate")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!"Join".r.findAllIn(plan).hasNext,
      "the engine side must not join (ASOF joins live only in the oracle)")
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("user_id"),
      s"every window must partition by user_id (no global funnel):\n$w"))
  }

  test("q137: correlation is map-side pair expansion + one aggregation (no join)") {
    val plan = planOf("q137_correlation")
    assert(!"Join".r.findAllIn(plan).hasNext,
      "the pair lattice must expand per row, never via a self-join")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"one agg exchange + presentation sort, found $exchanges")
  }

  test("q138: only the count aggregate sees event volume; series windows key per type") {
    val df = SparkEntry.queries("q138_autocorrelation")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("event_type"),
      s"series lag window must partition by event_type:\n$w"))
  }

  test("q139: the sweep is hour-keyed and join-free") {
    val df = SparkEntry.queries("q139_peak_concurrency")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!"Join".r.findAllIn(plan).hasNext,
      "fragments expand map-side; the range join lives only in the oracle")
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("h#"),
      s"the delta sweep must partition by the hour key:\n$w"))
  }

  test("q140: image near-dup candidates come from the band equi-join, decode runs once") {
    val df = SparkEntry.queries("q140_image_neardup")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "banded candidate generation must never plan an all-pairs compare")
    assert(plan.contains("InMemoryTableScan"),
      "both join sides must read the cached hash frame (one decode pass)")
  }

  test("q108: KMV plans bounded partial aggregation, never a global sort of hashes") {
    val df = SparkEntry.queries("q108_kmv_distinct")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // TopKAgg is an ObjectHashAggregate; the only Sort allowed is the
    // 5-row presentation tail, never a sort of the distinct-hash set
    assert(plan.contains("ObjectHashAggregate"),
      "KMV must aggregate with the bounded TopKAgg buffers")
    assert(!plan.contains("Window"),
      "KMV must not fall back to a row_number window over hashes")
  }

  test("q151: ECDF runs on the compressed grid; scalars join as broadcasts") {
    val df = SparkEntry.queries("q151_ks_drift")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // volume-sized work = the one grid aggregation; totals and d_max
    // attach as one-row broadcast scalar joins, never re-shuffles
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 2,
      "totals and d_max must attach as broadcast one-row cross joins")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
    // the unpartitioned window is AFTER the grid aggregate (input =
    // HashAggregate, bounded cells), not over raw order rows
    assert(plan.contains("Window ["), "grid ECDF window expected")
    assert(plan.contains("HashAggregate"))
  }

  test("q153: PQ encode is map-only — no join, no window, no aggregate exchange") {
    val df = SparkEntry.queries("q153_pq_codes")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!"Join".r.findAllIn(plan).hasNext, "codes are a pure row function")
    assert(!plan.contains("Window"))
    assert(!plan.contains("HashAggregate"),
      "per-block argmin folds inside the row, never via a groupBy")
    // the only exchange is the presentation sort's range partitioning
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"map-only up to the final sort, found $exchanges")
  }

  test("q154: interval overlap joins as a hash equi-join on (user, cell)") {
    val df = SparkEntry.queries("q154_interval_overlap")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the range predicate must never reach the join operator")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      "fragments must meet in an equi-join")
    assert(!plan.contains("Window"))
  }

  test("q158: attribution pairs meet in an equi-join; windows key by purchase") {
    val df = SparkEntry.queries("q158_multi_touch")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the window predicate must stay a post-equi-join filter")
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("p_id#"),
      s"rank/count windows must partition by the purchase id:\n$w"))
  }

  test("q152: single scan; marginals window over the bounded cell table") {
    val df = SparkEntry.queries("q152_chi_squared")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"marginals must derive from the cell table, " +
      s"not re-scan the source; found $scans scans")
    assert(!"Join".r.findAllIn(plan).hasNext, "the statistic is join-free")
    // windows are legitimate here ONLY because their input is the
    // 15-row aggregated cell table, never raw order rows
    assert(plan.contains("Window ["))
    assert(plan.contains("HashAggregate"))
  }

  test("q168: posting sample is a bounded partial aggregate, never a token window") {
    val df = SparkEntry.queries("q168_inverted_index")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "TopKAgg must run as a partial object-hash aggregate " +
        "(each task forwards <=k postings per token)")
    assert(!plan.contains("Window ["),
      "a per-token ROW_NUMBER window would shuffle full posting lists")
  }

  test("q173: sample selection is a bounded partial agg; data rows see no window") {
    val df = SparkEntry.queries("q173_stratified_sample")(spark, d)
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
    assert(lines.exists(_.contains("ObjectHashAggregate")),
      "TopKAgg partial expected: <=budget rows per stratum into the shuffle")
    assert(lines.exists(_.contains("BroadcastHashJoin")),
      "the strata-domain alloc table must broadcast")
    // windows (quota remainder rank) may only funnel the strata-count
    // aggregate, never raw customer rows: every single-partition
    // exchange must sit directly over an aggregate
    // (5-line lookahead: the quota frame is Project + scalar
    // cross-join directly over the strata aggregate)
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val child = lines.drop(i + 1).take(5).mkString
        assert(child.contains("Aggregate"),
          s"single-partition exchange over data rows:\n" +
            lines.slice(i, i + 6).mkString("\n"))
      }
  }

  test("q178: bucket assignment is map-only — edges broadcast as one array scalar") {
    val df = SparkEntry.queries("q178_psi_drift")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "the edge array must arrive via broadcast, never a cartesian")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "one-row edge-array frame joins as a broadcast")
    // no per-row shuffle may exist between the order scan and the
    // bucket aggregate: the assignment itself adds no exchange keyed
    // by anything row-sized (GlobalIndex ranks only the ref period)
    assert(!plan.contains("SortMergeJoin"),
      "no row-sized join anywhere in the PSI path")
  }

  test("q184: the aggregate is served from the MV, never the fact scan") {
    val df = SparkEntry.queries("q184_mv_rollup")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("graft-mv-q184"),
      s"expected the materialized view as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet"),
      "the fact table must not appear anywhere below the aggregate")
  }

  test("q192: the filtered rollup is served from the MV, never the fact") {
    val df = SparkEntry.queries("q192_mv_rollup_filtered")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("graft-mv-q192"),
      s"expected the materialized view as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet"),
      "the fact table must not appear anywhere below the aggregate")
    // the pushed predicate reaches the MV scan (parquet pushdown)
    assert(leaves.contains("o_orderpriority"),
      s"the group-column predicate must be pushed into the MV read:\n$leaves")
  }

  test("q194: the SCD2 merge windows only the affected users' events") {
    val df = SparkEntry.queries("q194_scd2_merge")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // the rebuild path must reach the window through a semi-join on
    // the affected-user set; the pass-through side anti-joins and
    // never re-windows (2 windowed SCD2 builds total: base dim +
    // affected rebuild — a third would mean the keep side re-derived)
    assert(plan.contains("LeftSemi"), "rebuild must semi-join affected users")
    assert(plan.contains("LeftAnti"), "pass-through must anti-join affected users")
    val nWindowedRuns = plan.linesIterator.count(_.contains("RunningWindowFunction")) +
      plan.linesIterator.count(_.contains("Window "))
    assert(nWindowedRuns > 0, "expected windowed SCD2 builds in the plan")
  }

  test("q195: the min/max rollup is served from the MV, never the fact") {
    val df = SparkEntry.queries("q195_mv_rollup_minmax")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("graft-mv-q195"),
      s"expected the materialized view as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet"),
      "the fact table must not appear anywhere below the aggregate")
  }

  test("q197: the post-refresh aggregate is served from the REFRESHED MV") {
    val df = SparkEntry.queries("q197_mv_incremental_refresh")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("graft-mv-q197") && leaves.contains("mv1"),
      s"expected the incrementally-refreshed MV as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet"),
      "the fact table must not appear anywhere below the aggregate")
  }

  test("q199: the avg rollup is served from the MV, never the fact") {
    val df = SparkEntry.queries("q199_mv_rollup_avg")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("graft-mv-q199"),
      s"expected the materialized view as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet"),
      "the fact table must not appear anywhere below the aggregate")
  }

  test("q187: the vocabulary ranks via GlobalIndex, not a global window") {
    val df = SparkEntry.queries("q187_zipf_fit")(spark, d)
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
    assert(lines.exists(_.contains("__pid")),
      "expected the GlobalIndex per-partition numbering window")
    // the only single-partition funnel allowed is the final scalar fit
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val child = lines.drop(i + 1).take(2).mkString
        assert(child.contains("Aggregate"),
          s"single-partition exchange over data rows:\n" +
            lines.slice(i, i + 3).mkString("\n"))
      }
  }

  test("q188: neighbor pairing is a bucket equi-join, never a rank range-join") {
    val plan = planOf("q188_sorted_neighborhood")
    assert(!plan.contains("CartesianProduct"),
      "window pairing must never plan a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the rank-bucket key must make the pairing an equi-join")
  }

  test("q189: HITS half-steps are joins + aggregates, windows nowhere") {
    val df = SparkEntry.queries("q189_hits")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "score normalization must be a broadcast scalar, not a window")
    assert(!plan.contains("CartesianProduct"),
      "the one-row normalizer must attach as a broadcast, not a cartesian")
  }

  test("q190: corner credit is aggregate-shaped — no windows, no cartesian") {
    val df = SparkEntry.queries("q190_clustering_coeff")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "per-node triangle credit must be a hash aggregate, not a window")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"),
      "under the measured gate the adjacency side must broadcast")
  }

  test("q176: binning never funnels order rows through one reducer") {
    withScaleShape {
    val df = SparkEntry.queries("q176_equidepth_hist")(spark, d)
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
    assert(lines.exists(_.contains("__pid")),
      "expected the GlobalIndex per-partition numbering window")
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val child = lines.drop(i + 1).take(2).mkString
        assert(child.contains("Aggregate"),
          s"single-partition exchange over data rows:\n" +
            lines.slice(i, i + 3).mkString("\n"))
      }
    }
  }

  test("q205/q206: ranking rides GlobalIndex — no full-data global window") {
    withScaleShape {
    for (q <- Seq("q205_auc_ranked", "q206_decile_gains")) {
      val df = SparkEntry.queries(q)(spark, d)
      val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
      assert(lines.exists(_.contains("__pid")),
        s"$q: expected the GlobalIndex per-partition numbering window")
      // single-partition funnels may carry only aggregate-sized rows
      // (the scalar fit / the 10-row bucket cum-window)
      lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
        .foreach { case (_, i) =>
          val child = lines.drop(i + 1).take(2).mkString
          assert(child.contains("Aggregate") || child.contains("Window"),
            s"$q: single-partition exchange over data rows:\n" +
              lines.slice(i, i + 3).mkString("\n"))
        }
    }
    }
  }

  test("q202: the temporal time gate filters BELOW the arrival join's shuffle") {
    val df = SparkEntry.queries("q202_temporal_reachability")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "the time gate must ride the node equi-join, never a theta join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "t >= a is a post-join filter on an equi-join, not a join condition")
  }

  test("q203: seeded teleport attaches as broadcast scalars, windows nowhere") {
    val df = SparkEntry.queries("q203_personalized_pagerank")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "PPR rounds are joins + aggregates; no window may appear")
    assert(!plan.contains("CartesianProduct"),
      "the one-row seed-count scalar must attach as a broadcast")
  }

  test("q204: consensus candidates come from band equi-joins, " +
    "top-k from the bounded partial") {
    val df = SparkEntry.queries("q204_knn_label_consensus")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "neighborhoods must never come from an all-pairs plan")
    assert(!plan.contains("Window"),
      "per-vector top-k must ride TopKAgg partials, not a rank window")
  }

  test("q275: negatives ride the bounded TopKAgg partial — never a " +
    "catalog-sized collect_list buffer, never a rank window") {
    val plan = planOf("q275_negative_sampling")
    assert(plan.contains("TopKAgg"),
      s"per-user draws must aggregate through TopKAgg partials:\n$plan")
    assert(!plan.contains("collect_list"),
      "the round-11 catalog-sized collect-and-slice must stay gone")
    assert(!plan.contains("Window"),
      "no per-user rank window may replace the bounded partial")
  }

  test("q210: served estimates scan ONLY the register table, never orders") {
    val df = SparkEntry.queries("q210_mv_hll_distinct")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!leaves.contains("orders.parquet"),
      "the serve path must read the merged register MV, not the fact")
  }

  test("q216: the serve reads the REDERIVED MV, never the fact; the " +
    "refresh pushed the touched-cell predicate to the base scan") {
    val df = SparkEntry.queries("q216_mv_retract_minmax")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q216") && leaves.contains("mv1"),
      s"expected the rederived MV as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet") &&
      !leaves.contains("effective"),
      "the serving aggregate must never rescan a fact table")
  }

  test("q217: approx_count_distinct rewrites onto the register table — " +
    "the fact is never scanned") {
    val df = SparkEntry.queries("q217_mv_hll_rewrite")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q217") && leaves.contains("mv1"),
      s"expected the refreshed register table as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet"),
      "the rewritten distinct-count must never scan the fact")
    // and no Spark-native HLL++ buffer survives — the served value is
    // the register table's deterministic estimate
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("approx_count_distinct"),
      s"the HLL++ aggregate itself must be rewritten away:\n$plan")
  }

  test("q261: the mixed aggregate serves from TWO MV leaves — the " +
    "algebraic partials and the HLL registers — never the fact") {
    val df = SparkEntry.queries("q261_mv_mixed_rewrite")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q261") && leaves.contains("/alg") &&
      leaves.contains("/hll"),
      s"expected the algebraic MV and the register table as the only " +
        s"scan leaves:\n$leaves")
    assert(!leaves.contains("orders.parquet"),
      "the composed serve must never scan the fact")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("approx_count_distinct"),
      s"the HLL++ aggregate itself must be rewritten away:\n$plan")
  }

  test("q262: the retraction-refreshed register table is the only " +
    "serve leaf — the fact is never rescanned at serve time") {
    val df = SparkEntry.queries("q262_mv_hll_retract")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q262") && leaves.contains("mv1"),
      s"expected the rederived register table as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet") &&
      !leaves.contains("effective"),
      "the serving aggregate must never rescan a fact table")
  }

  test("q279: approx_percentile rewrites onto the quantile-sketch " +
    "table — the fact is never scanned") {
    val df = SparkEntry.queries("q279_mv_quantile_rewrite")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q279") && leaves.contains("mv1"),
      s"expected the refreshed sketch table as the scan leaf:\n$leaves")
    assert(!leaves.contains("documents.parquet"),
      "the rewritten percentile must never scan the fact")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile_approx") &&
      !plan.contains("approx_percentile"),
      s"the ApproximatePercentile aggregate itself must be rewritten " +
        s"away:\n$plan")
  }

  test("q288: the triple serve reads the algebraic MV, the HLL " +
    "registers, AND the quantile sketch — never the fact") {
    val df = SparkEntry.queries("q288_mv_triple_serve")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q288") && leaves.contains("/alg") &&
      leaves.contains("/hll") && leaves.contains("/qs"),
      s"expected all three MV tables as scan leaves:\n$leaves")
    assert(!leaves.contains("documents.parquet"),
      "the composed serve must never scan the fact")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("approx_count_distinct") &&
      !plan.contains("percentile_approx") &&
      !plan.contains("approx_percentile"),
      s"every sketch aggregate must be rewritten away:\n$plan")
  }

  test("q306: two percentile value columns each serve from their OWN " +
    "quantile sketch beside the algebraic MV — never the fact") {
    val df = SparkEntry.queries("q306_mv_two_quantiles")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q306") && leaves.contains("/alg") &&
      leaves.contains("/qqty") && leaves.contains("/qcents"),
      s"expected the algebraic MV and BOTH sketch tables as scan " +
        s"leaves:\n$leaves")
    assert(!leaves.contains("/fact"),
      "the per-column composed serve must never scan the fact")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile_approx") &&
      !plan.contains("approx_percentile"),
      s"both percentile aggregates must be rewritten away:\n$plan")
  }

  test("q290: exact count(DISTINCT) serves from the bitmap table " +
    "joined with the algebraic MV — never the fact") {
    val df = SparkEntry.queries("q290_mv_bitmap_distinct")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q290") && leaves.contains("/alg") &&
      leaves.contains("/bm1"),
      s"expected the algebraic MV and the OR-refreshed bitmap table " +
        s"as the only scan leaves:\n$leaves")
    assert(!leaves.contains("orders.parquet"),
      "the composed exact-distinct serve must never scan the fact")
    // no distinct-aggregate expansion survives — the served value is
    // sum(bit_count) over the maintained words
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("count(distinct") &&
      !plan.contains("Expand"),
      s"the DISTINCT aggregate itself must be rewritten away:\n$plan")
  }

  test("q291: the retraction-rederived bitmap table is the only " +
    "serve leaf — the fact is never rescanned at serve time") {
    val df = SparkEntry.queries("q291_mv_bitmap_retract")(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("graft-mv-q291") && leaves.contains("bm1"),
      s"expected the rederived bitmap table as the scan leaf:\n$leaves")
    assert(!leaves.contains("orders.parquet") &&
      !leaves.contains("effective"),
      "the serving aggregate must never rescan a fact table")
  }

  test("q218: the log-ratio table joins back as a bounded broadcast, " +
    "windows nowhere") {
    val df = SparkEntry.queries("q218_dsir_selection")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the <=buckets-row lr table must broadcast onto the token stream")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      "per-doc scoring is one partial agg — no windows, no cartesians")
  }

  test("q219: negatives come from band equi-joins; top-1 rides the " +
    "bounded partial, never a rank window") {
    val df = SparkEntry.queries("q219_hard_negatives")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "candidates must never come from an all-pairs plan")
    assert(!plan.contains("Window"),
      "per-anchor best negative must ride TopKAgg partials")
  }

  test("q220: the corpus scans twice (model + keep pass) — the totals " +
    "window rides the language-domain aggregate, not the data") {
    val df = SparkEntry.queries("q220_temperature_mix")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"expected <=2 corpus scans (docs + counts), got $scans")
    assert(!plan.contains("CartesianProduct"),
      "the keep predicate is a pure hash map — no cartesians")
    // the single Window sits ABOVE the per-language aggregate: its
    // input is bounded by the language domain, never corpus-sized —
    // in the printed tree, an aggregate must appear between the
    // Window line and the first scan below it
    val lines = plan.linesIterator.toVector
    val wi = lines.indexWhere(_.contains("Window"))
    assert(wi >= 0, s"expected the totals window in the plan:\n$plan")
    val below = lines.drop(wi + 1)
    val agg = below.indexWhere(_.contains("HashAggregate"))
    val scan = below.indexWhere(_.contains("FileScan"))
    assert(agg >= 0 && (scan < 0 || agg < scan),
      s"the totals window must consume the aggregate, not the scan:\n$plan")
  }

  test("q221: span matches come from keyed joins over LSH candidates — " +
    "never hash-only or all-pairs") {
    val df = SparkEntry.queries("q221_longest_dup_span")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "positional matching must never plan an all-pairs join")
  }

  test("q241/q245: per-group/median selection rides GlobalIndex — " +
    "no data-sized window, no data-sized single-partition exchange") {
    withScaleShape {
    for (q <- Seq("q241_group_conformal", "q245_theil_sen")) {
      val df = SparkEntry.queries(q)(spark, d)
      val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
      assert(lines.exists(_.contains("__pid")),
        s"$q: expected the GlobalIndex per-partition numbering window")
      lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
        .foreach { case (_, i) =>
          val child = lines.drop(i + 1).take(2).mkString
          assert(child.contains("Aggregate") || child.contains("Window"),
            s"$q: single-partition exchange over data rows:\n" +
              lines.slice(i, i + 3).mkString("\n"))
        }
    }
    }
  }

  test("q246: assortativity is windowless and all-equi — degree " +
    "re-attach joins never plan a cartesian") {
    val df = SparkEntry.queries("q246_assortativity")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "degree re-attach must stay an equi-join")
    assert(!plan.contains("Window"),
      "the 6-sum aggregate needs no window anywhere")
  }

  test("q247: the delta accept gate joins the candidate-bounded pair " +
    "set — never all-pairs, and the base corpus is never re-scanned " +
    "for verification") {
    val df = SparkEntry.queries("q247_delta_dedup")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "delta-vs-base matching must never plan an all-pairs join")
  }
}
