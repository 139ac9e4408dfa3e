package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph analytics over relationship edges mined from the
  * fact tables — the "who is connected to whom" layer a curation
  * pipeline runs over its corpus (source↔consumer graphs, citation
  * graphs) after the per-row operators have done their work.
  *
  * Reference scope: the reference pipeline materializes the
  * customer↔supplier relationship implicitly through its fact build
  * (`etl_pipeline_spark.py` star joins); ranking entities by graph
  * centrality is the natural next query over that output.
  */
object Graph {

  /** Integer-exact PageRank, `iters` synchronous rounds.
    *
    * Graph: the bipartite customer↔supplier trade graph from
    * `lineitem ⋈ orders`, with both edge directions materialized so
    * every node has out-degree ≥ 1 — no dangling-mass term, which
    * keeps the recurrence a pure local sum. Node ids are namespaced
    * (customer `2k`, supplier `2k+1`) so one BIGINT keys both sides.
    *
    * All arithmetic is integer: ranks live at scale 10¹² and each
    * round computes `r' = (15·S) div (100·N) + (85·Σ(r_u div d_u))
    * div 100` — integer division and integer sums are
    * order-independent under any partitioning and bit-identical
    * across engines (the float formulation would be neither, see the
    * q78/q82 quantization precedent).
    *
    * Shape at scale: the edge list is built once (join + distinct —
    * one shuffle each) and each round is one hash-agg shuffle of
    * (dst, contribution) partials keyed by node; the rank frame that
    * flows between rounds is |V| rows, tiny next to |E|. On a real
    * cluster you'd persist/checkpoint `edges` so iteration k doesn't
    * re-derive the join lineage; at two unrolled rounds the recompute
    * is cheaper than the cache churn.
    */
  /** Both-direction customer↔supplier trade edges, hash-partitioned
    * by `src` (the key every consumer probes or aggregates on) and
    * shared per-session via [[graft.Derived]] — the relationship
    * graph is the common upstream of centrality (q95) and topology
    * profiling (q104).
    */
  private[graft] def tradeEdges(spark: SparkSession, d: String): DataFrame =
    graft.Derived.frame(s"trade-edges:$d") {
      import spark.implicits._
      val pairs = Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(spark, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
        .distinct()
      // one pass over the distinct join, both directions per row
      val sym = pairs.select(explode(array(
          struct($"c".as("src"), $"s".as("dst")),
          struct($"s".as("src"), $"c".as("dst")))).as("p"))
        .select($"p.src".as("src"), $"p.dst".as("dst"))
      // scale-adaptive pinned width (Adaptive doc), anchored on the
      // pruned fact scan: the distinct-join's own estimate is a
      // multiplicative join product that always saturates the clamp
      graft.operators.Adaptive.byKey(
        Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey"))(
        sym, $"src")
    }

  def pageRank(spark: SparkSession, d: String, iters: Int = 2): DataFrame = {
    import spark.implicits._
    pageRankOnEdges(tradeEdges(spark, d), iters).select(
      when($"node" % 2 === 0, lit("cust")).otherwise(lit("supp")).as("kind"),
      expr("node div 2").as("entity_id"),
      $"deg", $"r".as("rank_p12"))
      .orderBy($"kind", $"entity_id")
  }

  /** Frame-based core: ranks after `iters` rounds over an `(src,
    * dst)` edge frame where every node appears as a source (callers
    * materialize both directions or guarantee no dangling nodes).
    * Nodes with no IN-edges are fine: the contribution join is an
    * outer join, so they keep their teleport share each round.
    * Returns (node, deg, n, r) with r at scale 10¹².
    *
    * Iteration discipline (the [[Dedup.propagateLabels]] pattern):
    * the edge list is hash-partitioned by `src` — the key every
    * round's join probes — and persisted, so round k reads the cache
    * instead of re-deriving the upstream join lineage; each round's
    * rank frame is materialized and its predecessor unpersisted
    * immediately (no session-lifetime leak — only the final |V|-row
    * frame stays cached). The degree agg also reuses the cached
    * partitioning, so it plans without an exchange.
    */
  def pageRankOnEdges(edges0: DataFrame, iters: Int): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val S = 1000000000000L // rank scale 10^12
    // a Derived-registry frame arrives cached and already partitioned
    // by src — leave its lifecycle to the registry
    val owned = edges0.storageLevel == StorageLevel.NONE
    val edges =
      if (owned) graft.operators.Adaptive.byKey(edges0)(edges0, $"src")
        .persist(StorageLevel.MEMORY_AND_DISK)
      else edges0
    // NO broadcast gate here, deliberately (measured): the round's
    // joins probe the edge frame ON its cached hash partitioning, so
    // the big side never shuffles and only the |V|-row rank frame
    // moves — broadcasting it would replace one tiny exchange with a
    // per-round driver collect and rebuild (measured net-negative at
    // sf0.1; at cluster scale it adds driver pressure for nothing,
    // since the contribution aggregate's shuffle dominates either
    // way). Contrast kCore/labelPropagation/connectedComponents,
    // where the gate removes an EDGE-frame exchange or sort.
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))

    // (node, deg, n, r) — deg and n ride along so each round is
    // self-contained; both are per-node constants.
    var ranks = deg.select($"src".as("node"), $"deg")
      .crossJoin(broadcast(n))
      .withColumn("r", expr(s"CAST($S AS BIGINT) div n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.select($"node".as("src"), expr("r div deg").as("give")),
          "src")
        .groupBy($"dst").agg(sum($"give").as("got"))
      val next = ranks.drop("r")
        .join(contrib.select($"dst".as("node"), $"got"), Seq("node"), "left")
        .withColumn("r",
          expr(s"(CAST(${15L * S} AS BIGINT) div (100 * n)) " +
            "+ (85 * coalesce(got, 0L)) div 100"))
        .drop("got")
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before freeing the previous round
      ranks.unpersist()
      ranks = next
    }
    if (owned) edges.unpersist()
    // the final frame must stay cached (its lineage is the whole
    // loop); hand its lifecycle to the registry so clear() frees it
    graft.Derived.adopt(ranks)
  }

  /** Personalized PageRank — the SEEDED variant of [[pageRank]] that
    * recommendation/similar-entity retrieval actually runs: teleport
    * mass returns only to the seed set (customers with id ≤
    * `seedMax`), so scores measure proximity TO THE SEEDS rather than
    * global centrality, and after k rounds only nodes within k hops
    * hold mass (emitted rows are exactly those — the zero tail is
    * dropped on both engines).
    *
    * Same integer-exact recurrence as [[pageRankOnEdges]] with the
    * teleport term `(15·S·seed) div (100·m)` gated per node (m =
    * seeds present in the graph): every operand non-negative, so
    * Spark `div` and DuckDB `//` agree, and contributions sum as
    * int64 bounded by 85·S. Same round shape too — one contribution
    * agg shuffle per round against the shared cached edge frame, the
    * |V|-row rank frame persisted per round and freed after the next
    * materializes.
    */
  def personalizedPageRank(spark: SparkSession, d: String, iters: Int = 2,
                           seedMax: Long = 25L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val S = 1000000000000L
    val edges = tradeEdges(spark, d)
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val base = deg.select($"src".as("node"), $"deg")
      .withColumn("seed",
        when($"node" % 2 === 0 && expr("node div 2") <= seedMax, 1L)
          .otherwise(0L))
    val m = base.agg(sum($"seed").as("m"))
    var ranks = base.crossJoin(broadcast(m))
      .withColumn("r", expr(s"(seed * CAST($S AS BIGINT)) div m"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.select($"node".as("src"), expr("r div deg").as("give")),
          "src")
        .groupBy($"dst").agg(sum($"give").as("got"))
      val next = ranks.drop("r")
        .join(contrib.select($"dst".as("node"), $"got"), Seq("node"), "left")
        .withColumn("r",
          expr(s"(CAST(${15L * S} AS BIGINT) * seed) div (100 * m)" +
            " + (85 * coalesce(got, 0L)) div 100"))
        .drop("got")
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before freeing the previous round
      ranks.unpersist()
      ranks = next
    }
    graft.Derived.adopt(ranks)
    ranks.filter($"r" > 0)
      .select(
        when($"node" % 2 === 0, lit("cust")).otherwise(lit("supp")).as("kind"),
        expr("node div 2").as("entity_id"), $"r".as("ppr_p12"))
      .orderBy($"kind", $"entity_id")
  }

  /** Degree-distribution profile of the trade graph: nodes per
    * (side, degree) — the audit that tells you whether the
    * centrality run above it faces a power-law skew (a handful of
    * mega-degree nodes dominating the contribution shuffle) before
    * you pay for it. Reads the shared cached edge frame; the
    * per-node degree agg reuses its src partitioning without an
    * exchange.
    */
  def degreeDistribution(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    tradeEdges(spark, d)
      .groupBy($"src").agg(count(lit(1)).as("deg"))
      .select(
        when($"src" % 2 === 0, lit("cust")).otherwise(lit("supp")).as("kind"),
        $"deg")
      .groupBy($"kind", $"deg").agg(count(lit(1)).as("n_nodes"))
      .orderBy($"kind", $"deg")
  }

  /** BFS distance layers from a seed set — "everything within k hops
    * of these entities", the reachability/blast-radius query run over
    * relationship graphs (fraud rings, lineage impact, contamination
    * spread). Seeds are customers with id ≤ 50; three synchronous
    * frontier rounds over the shared [[tradeEdges]] cache, each round
    * ONE equi-join of the edge list against the previous frontier
    * (nodes first reached in round r−1) plus a min-aggregate — the
    * textbook distributed BFS whose per-round cost is |frontier
    * adjacency|, never |V|². The distance frame carried between
    * rounds is ≤ |V| rows; at deeper horizons it persists per round
    * exactly like [[pageRankOnEdges]]'s iteration discipline.
    * Output: per (side, distance) node counts + id checksums —
    * bounded at any scale.
    */
  def bfsLayers(spark: SparkSession, d: String, maxDist: Int = 3): DataFrame = {
    import spark.implicits._
    val edges = tradeEdges(spark, d)
    val seeds = edges.select($"src".as("node")).distinct()
      .filter($"node" % 2 === 0 && expr("node div 2") <= 50)
    bfsOnEdges(edges, seeds, maxDist)
      .select(when($"node" % 2 === 0, lit("cust")).otherwise(lit("supp")).as("kind"),
        $"dist", expr("node div 2").as("eid"))
      .groupBy($"kind", $"dist")
      .agg(count(lit(1)).as("n_nodes"), sum($"eid").as("id_sum"))
      .orderBy($"kind", $"dist")
  }

  /** Frame-based BFS core: (node, dist) for every node within
    * `maxDist` hops of a `seeds(node)` set over an `(src, dst)` edge
    * frame; unreached nodes are absent. Each round joins edges
    * against only the PREVIOUS round's frontier (dist = r−1 exactly),
    * so settled nodes re-expand never — work is frontier-adjacency
    * per round. */
  private[graft] def bfsOnEdges(edges: DataFrame, seeds: DataFrame,
                                maxDist: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    // no broadcast gate: the frontier join probes the edge frame on
    // its cached src partitioning — only the tiny frontier moves (the
    // pageRankOnEdges rationale)
    // each round reads `dist` twice (frontier filter + union); the
    // pageRankOnEdges persist discipline — materialize the round,
    // free its predecessor — keeps the lineage flat instead of
    // doubling the recompute tree every round
    var dist = seeds.select($"node", lit(0).as("dist"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (r <- 1 to maxDist) {
      val frontier = dist.filter($"dist" === r - 1).select($"node".as("src"))
      val next = edges.join(frontier, "src")
        .select($"dst".as("node"), lit(r).as("dist"))
      val merged = dist.unionAll(next)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      merged.count() // materialize before freeing the previous round
      dist.unpersist()
      dist = merged
    }
    graft.Derived.adopt(dist)
  }

  /** Earliest-arrival TEMPORAL reachability — "who can this reach
    * through time-RESPECTING interaction chains", the
    * contagion/provenance-flow census static BFS gets wrong: an edge
    * is usable only at its own timestamp, so a path must have
    * non-decreasing times (B's Monday contact cannot forward what B
    * learns on Friday). Interactions are customer↔supplier order
    * events stamped with their order day; seeds (customers with id ≤
    * `seedMax`) start at day 0, and after `maxHops` synchronous
    * rounds `arr(v)` is the exact earliest arrival day over
    * time-respecting paths of ≤ maxHops edges — the textbook
    * earliest-arrival recurrence (Bellman-Ford with a time gate).
    *
    * Scale shape: the [[bfsOnEdges]] round shape plus one map-side
    * time filter — per round ONE equi-join of the timestamped edge
    * frame (Derived-cached, hash-partitioned by u) against the
    * ≤|V|-row arrival frame, the `t ≥ arr(u)` gate applied before
    * anything shuffles, then a min-aggregate; per-round
    * `localCheckpoint` keeps the two-reference loop lineage flat.
    * Output is a bounded (kind, week) census with id checksums.
    */
  def temporalReachability(spark: SparkSession, d: String,
                           maxHops: Int = 3, seedMax: Long = 25L): DataFrame = {
    import spark.implicits._
    val sym = graft.Derived.frame(s"temporal-edges:$d") {
      val pairs = Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(spark, d)
          .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"),
          datediff($"o_orderdate", lit("1970-01-01")).cast("long").as("t"))
        .distinct()
      // both directions in one explode pass (the tradeEdges shape) —
      // an interaction at day t exposes both endpoints to each other
      // session-width (see the weighted-sym note: per-round arrival
      // joins would otherwise re-shuffle both sides)
      pairs.select(explode(array(
          struct($"c".as("u"), $"s".as("v"), $"t"),
          struct($"s".as("u"), $"c".as("v"), $"t"))).as("p"))
        .select($"p.u".as("u"), $"p.v".as("v"), $"p.t".as("t"))
        .repartition($"u")
    }
    val seeds = sym.select($"u".as("node")).distinct()
      .filter($"node" % 2 === 0 && expr("node div 2") <= seedMax)
    temporalOnEdges(sym, seeds, maxHops)
      .select(when($"node" % 2 === 0, lit("cust")).otherwise(lit("supp"))
          .as("kind"),
        expr("a div 7").as("week"), $"node")
      .groupBy($"kind", $"week")
      .agg(count(lit(1)).as("n_nodes"), sum(expr("node div 2")).as("id_sum"))
      .orderBy($"kind", $"week")
  }

  /** Frame-based earliest-arrival core: (node, a) for every node with
    * a time-respecting path of ≤ `maxHops` edges from a `seeds(node)`
    * set over a `(u, v, t)` edge frame; seeds start at a = 0,
    * unreached nodes are absent. Separated so specs can drive planted
    * temporal structures through the exact production recurrence. */
  private[graft] def temporalOnEdges(sym: DataFrame, seeds: DataFrame,
                                     maxHops: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    var arr = seeds.select(col(seeds.columns.head).as("node"),
      lit(0L).as("a")).localCheckpoint()
    for (_ <- 1 to maxHops) {
      val cand = sym
        .join(arr.select($"node".as("u"), $"a"), "u")
        .filter($"t" >= $"a") // the time gate — BEFORE anything shuffles
        .select($"v".as("node"), $"t".as("a"))
      val next = arr.unionAll(cand)
        .groupBy($"node").agg(min($"a").as("a"))
        .localCheckpoint() // eager — materialized before freeing prev
      arr.unpersist() // bfsOnEdges discipline: one cached frame alive
      arr = next
    }
    // final frame's lineage is the whole loop — registry owns it now,
    // mirroring bfsOnEdges/pageRankOnEdges
    graft.Derived.adopt(arr)
  }

  /** Undirected part co-occurrence edges — parts bought together in
    * at least one order, each edge once as (a < b). The trade graph
    * above is bipartite (triangle-free by construction); this one-mode
    * projection is where clustering structure lives. Shared via
    * [[graft.Derived]]: the edge list feeds the degree, orientation,
    * wedge, and closing-edge subtrees of [[triangleCount]] from cache
    * instead of re-running the self-join per subtree.
    */
  /** Distinct (order, part) basket items — the shared upstream of the
    * co-purchase family: [[copartEdges]] (→ q118/q128/q172) and
    * [[Behavior.assocRules]] (q171) both start from exactly this
    * distinct, so it is cached once per session and both pay one scan
    * between them instead of one each. Hash-partitioned by the basket
    * key `ok`, the join key every consumer probes.
    */
  private[graft] def basketItems(spark: SparkSession, d: String): DataFrame =
    graft.Derived.frame(s"basket-items:$d") {
      import spark.implicits._
      // session-width pinned layout, DELIBERATELY not Adaptive.byKey:
      // this frame feeds the basket pair SELF-JOINS (pairCounts /
      // copartEdges), whose work is O(sum deg^2) — compute-bound, not
      // byte-bound; a byte-derived width serialized the intersection
      // kernels onto 1-2 tasks (q327 measured 4.5s -> 8.5s)
      Tables.lineitem(spark, d)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
        .repartition($"ok")
    }

  /** Co-purchase pair counts — the basket self-join with its
    * multiplicity, the shared core of the weighted SSSP edge frame
    * (q186) and association rules (q171). `(a, b, cnt)` with a < b. */
  private[graft] def pairCounts(spark: SparkSession, d: String): DataFrame =
    graft.Derived.frame(s"copart-paircount:$d") {
      import spark.implicits._
      val items = basketItems(spark, d)
      items.toDF("ok", "a").join(items.toDF("ok", "b"), "ok")
        .filter($"a" < $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
    }

  private[graft] def copartEdges(spark: SparkSession, d: String): DataFrame =
    graft.Derived.frame(s"copart-edges:$d") {
      import spark.implicits._
      val items = basketItems(spark, d)
      items.toDF("ok", "a").join(items.toDF("ok", "b"), "ok")
        .filter($"a" < $"b")
        .select($"a", $"b").distinct()
    }

  /** Exact triangle count over the co-purchase graph — the clustering
    * census (closed wedges) behind community/cohesion metrics.
    *
    * Algorithm: degree-ordered orientation + EDGE-ITERATOR adjacency
    * intersection. Each undirected edge is oriented from the endpoint
    * that is smaller under the total order (degree, node) to the
    * larger; out-neighbor lists are collected per source; and each
    * oriented edge (u, v) contributes |N⁺(u) ∩ N⁺(v)| — every
    * triangle u→v, u→w, v→w counts exactly once, at its (u, v) edge
    * (v and u sit in nobody else's out-lists by the orientation).
    *
    * Why this shape: the orientation caps out-degrees at O(√E), so
    * intersection work is the same Σ C(outdeg, 2) = O(E^1.5)
    * arboricity bound a wedge enumeration pays — but the wedge SET IS
    * NEVER MATERIALIZED OR SHUFFLED. The first version of this query
    * self-joined spokes into 41M wedge rows at sf0.1 and shuffled
    * them into the closure probe: 20.8 s. Intersecting per-edge
    * adjacency arrays moves |E| rows through two equi-joins instead
    * (the adjacency side broadcasts under the measured
    * [[BroadcastAdjMaxEntries]] gate — its payload is |E| entries):
    * 41M-row exchange gone. Rank comparisons stay (deg, node)
    * lexicographic — no packed deg·K+id key to overflow at 100 TB id
    * ranges.
    *
    * The oracle runs the textbook unordered 3-way join a<b<c — same
    * count via opposite cost, exactly the differential-testing shape
    * we want.
    */
  /** Broadcast budget for the triangle probe's adjacency side, in
    * EDGE ENTRIES: the per-node out-neighbor arrays total exactly |E⃗|
    * longs (the orientation halves each undirected edge into one
    * list), so the payload is edge-count-sized, NOT node-count-sized —
    * 10M entries ≈ 80 MB serialized is the comfortable ceiling. The
    * gate is MEASURED (a count of the Derived-cached edge frame, one
    * cheap cache scan) because a hint never auto-falls-back: an
    * unconditional broadcast of a 10⁹-edge adjacency OOMs the driver.
    * Above the budget the joins degrade to src/dst-keyed shuffles of
    * |E| rows — still never the wedge set.
    */
  val BroadcastAdjMaxEntries = 10000000L

  /** Degree-ordered orientation of [[copartEdges]] — each undirected
    * edge once, pointing from the (degree, node)-smaller endpoint.
    * Shared via [[graft.Derived]] between [[triangleCount]] and
    * [[clusteringCoeff]]: it is CONSUMED BY MULTIPLE SUBTREES
    * (adjacency build, per-edge probe, node census), so an uncached
    * frame would re-run the degree aggregation and both degree joins
    * per subtree. `hinted` carries the caller's measured broadcast
    * gate for the degree frame.
    */
  private def orientedCopart(spark: SparkSession, d: String,
                             fits: Boolean): DataFrame =
    // the broadcast decision participates in the cache key: the first
    // caller's measured gate must not silently impose its plan shape
    // on a later caller that measured differently (or on a test
    // forcing the shuffle fallback)
    graft.Derived.frame(s"copart-oriented:$d:bc=$fits") {
      import spark.implicits._
      def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
      val e = copartEdges(spark, d)
      val deg = e.select($"a".as("node")).unionAll(e.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
      val lt = ($"da" < $"db") || ($"da" === $"db" && $"a" < $"b")
      e.join(hinted(deg.select($"node".as("a"), $"deg".as("da"))), "a")
        .join(hinted(deg.select($"node".as("b"), $"deg".as("db"))), "b")
        .select(
          when(lt, $"a").otherwise($"b").as("src"),
          when(lt, $"b").otherwise($"a").as("dst"))
    }

  /** Sorted adjacency lists of the oriented co-purchase graph —
    * probed TWICE per consumer (src and dst side of the corner join)
    * and shared between [[triangleCount]] and [[clusteringCoeff]], so
    * the sort+collect aggregate runs once per session, not 2× per
    * query. */
  private def copartAdj(spark: SparkSession, d: String,
                        fits: Boolean): DataFrame =
    graft.Derived.frame(s"copart-adj:$d:bc=$fits") {
      import spark.implicits._
      orientedCopart(spark, d, fits).groupBy($"src")
        .agg(sort_array(collect_list($"dst")).as("nbr"))
    }

  def triangleCount(spark: SparkSession, d: String,
                    maxBroadcastAdj: Long = BroadcastAdjMaxEntries): DataFrame = {
    import spark.implicits._
    val e = copartEdges(spark, d)
    // measured broadcast gate: |E| bounds both the degree frame (≤2|E|
    // nodes) and the adjacency payload (=|E| entries); e is already
    // cache-materialized by Derived, so this count is a cache scan
    val fits = e.count() <= maxBroadcastAdj
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    val oriented = orientedCopart(spark, d, fits)
    val adj = copartAdj(spark, d, fits)
    val perEdge = {
      import org.apache.spark.sql.graft.Bridge
      oriented
        .join(hinted(adj.toDF("src", "nu")), "src")
        .join(hinted(adj.toDF("dst", "nv")), "dst")
        // adjacency lists are sort_array'd: the codegen'd two-pointer
        // merge kernel counts the overlap allocation-free
        .select(Bridge.column(graft.functions.SortedIntersectCount(
          Bridge.expression($"nu"), Bridge.expression($"nv")))
          .cast("bigint").as("t"))
    }
    oriented.select($"src").unionAll(oriented.select($"dst")).distinct()
      .agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(perEdge.agg(coalesce(sum($"t"), lit(0L)).as("n_triangles")))
  }

  /** Connected components of the purchase-burst graph — orders of the
    * same customer link when ≤7 days apart in that customer's order
    * sequence, and a component is one shopping burst (the entity-
    * resolution / dedup-cluster primitive as a first-class operator:
    * q54's resolveClusters labels the bounded dup-pair graph, this
    * labels an arbitrary edge frame to a fixpoint with a convergence
    * proof per round).
    *
    * Algorithm: HashMin label propagation. Every node starts as its
    * own label; each round every node takes the min of its label and
    * its neighbors' — one edge-frame equi-join + one min aggregate,
    * i.e. one O(E) keyed shuffle per round, the edge frame hash-
    * partitioned once and reused (the pageRankOnEdges discipline).
    * Convergence is detected with a one-row scalar aggregate — the
    * label sum is strictly decreasing until fixpoint, so equal sums
    * on consecutive rounds ⇔ converged — never a changed-rows join.
    * Rounds needed = component diameter; burst chains bound it by
    * the max orders-per-customer run, and `maxIters` guards the
    * adversarial case (the published O(log n) fix — large-star/
    * small-star contraction, Kiveris et al. — is the next gear if an
    * input ever needs it; the round structure here is its inner
    * primitive).
    *
    * Day arithmetic is integer days-since-1970 (Spark `datediff`
    * from the epoch ≡ DuckDB `epoch_us // 86400e6` for the midnight
    * timestamps here) — no calendar semantics to diverge. The oracle
    * computes components by a DIFFERENT algorithm entirely (recursive
    * transitive closure + MIN over reachable labels), so the hash
    * gate proves the propagation fixpoint equals true reachability.
    */
  def connectedComponents(spark: SparkSession, d: String,
                          maxIters: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val o = Tables.orders(spark, d).select($"o_custkey".as("c"),
      $"o_orderkey".as("k"),
      datediff($"o_orderdate", lit("1970-01-01")).cast("long").as("day"))
    val w = Window.partitionBy($"c").orderBy($"day", $"k")
    val e = o
      .withColumn("pk", lag($"k", 1).over(w))
      .withColumn("pd", lag($"day", 1).over(w))
      .filter($"pk".isNotNull && $"day" - $"pd" <= 7)
      .select($"k".as("src"), $"pk".as("dst"))
    // symmetrize in ONE pass over the lag-window frame (a unionAll of
    // two projections would run the window twice — the q190 lesson)
    val sym0 = e.select(explode(array(
        struct($"src", $"dst"),
        struct($"dst".as("src"), $"src".as("dst")))).as("p"))
      .select($"p.src".as("src"), $"p.dst".as("dst"))
    // adaptive pinned width (window over one scan: estimate reliable)
    val sym = graft.operators.Adaptive.byKey(sym0)(sym0, $"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (labels, _) = hashMinLabels(sym,
      o.select($"k".as("node")), maxIters)
    sym.unpersist()
    labels.select($"node".as("o_orderkey"), $"label".as("component"))
      .orderBy($"o_orderkey")
  }

  /** The HashMin fixpoint kernel over a SYMMETRIC (src, dst) edge
    * frame. Each round propagates (every node takes the min of its
    * own and its neighbors' labels — one edge equi-join + one min
    * aggregate); with `shortcut` it additionally applies the
    * POINTER-JUMPING step `label(v) ← label(label(v))` (one
    * label-frame self-join), which squares the distance minima have
    * already traveled and cuts the round count from the component
    * DIAMETER to O(log diameter) — the spec pins a planted 64-hop
    * path at ≤10 rounds vs 65, and pins fixpoint equality. The
    * FIXPOINT is the same either way: both steps only decrease
    * labels, keep every label a node id inside its own component,
    * and a combined fixpoint forces labels constant per component
    * (propagation stability alone does), hence the component min —
    * what the oracle's transitive-closure twin verifies.
    *
    * `shortcut` defaults OFF and q155 runs WITHOUT it, measured: the
    * self-join doubles each round's shuffle work, and the burst
    * graph's diameter is BOUNDED BY CONSTRUCTION (7-day chains within
    * one customer's order sequence — it does not grow with data
    * volume), so the saved rounds never repay the doubled cost
    * (sf0.1 A/B: 2.81 s plain → 3.46 s shortcutted). The gear exists,
    * proven, for edge frames whose diameter is NOT domain-bounded —
    * the q316 star-contraction lane is the published O(log n)
    * alternative already serving that case as a first-class query.
    *
    * Convergence is checked every OTHER round: the label sum is
    * strictly decreasing while anything changes (min-merges), so an
    * UNCHANGED sum across a two-round window ⇔ both rounds changed
    * nothing ⇔ fixpoint. Odd rounds stay lazy — their checkpoint
    * blocks materialize inside the next check's job — halving the
    * per-round action floor that dominated this lane (the ~60 ms/job
    * scheduling tax × rounds × AQE stage jobs).
    *
    * NO broadcast gate here, deliberately (measured): unlike the
    * part-domain peels (kCore/labelPropagation), |V| here is the
    * ORDER-KEY domain — the label frame is fact-sized, and
    * collecting + rebroadcasting it every round cost more at sf0.1
    * than the src-keyed shuffle it replaced (2.4s → 3.3s full-suite).
    * The edge frame is already hash-partitioned by src, so the
    * propagation shuffle moves only the label frame — the cheap side.
    */
  private[graft] def hashMinLabels(sym: DataFrame, nodes: DataFrame,
      maxIters: Int, shortcut: Boolean = false): (DataFrame, Int) = {
    val spark = sym.sparkSession
    import spark.implicits._
    // per-round frames are lazy localCheckpoints (the ccStarContraction
    // loop discipline, NOT persist: a persisted frame still CARRIES its
    // logical lineage, so the analyzed plan nested one round deeper per
    // round and the driver's planning grew quadratically with the round
    // count — invisible at burst diameters, pathological on a planted
    // long path); the labelSum action below materializes the blocks
    var labels = nodes.select($"node", $"node".as("label"))
      .localCheckpoint(false)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum($"label".cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxIters) {
      round += 1
      val prop = sym
        .join(labels.select($"node".as("src"), $"label"), "src")
        .select($"dst".as("node"), $"label")
      val m1 = labels.unionAll(prop)
        .groupBy($"node").agg(min($"label").as("label"))
      // the self-join reads m1 twice — both sides share the same
      // aggregate subtree, so the propagation exchange is planned
      // once and reused (ReusedExchange), not recomputed; left join +
      // coalesce so a label value outside the node domain (a caller
      // passing foreign edges) degrades to no-op instead of dropping
      // the row
      val next = (if (!shortcut) m1
        else m1
          .join(m1.select($"node".as("__ln"), $"label".as("__l2")),
            $"label" === $"__ln", "left")
          .select($"node",
            least($"label", coalesce($"__l2", $"label")).as("label")))
        .localCheckpoint(false)
      labels = next
      // two-round convergence window (see scaladoc): only even rounds
      // pay a materializing action; the guard rail still checks the
      // final round so maxIters exits report the true round count
      if (round % 2 == 0 || round == maxIters) {
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
      }
    }
    graft.Derived.adopt(labels)
    (labels, round)
  }

  /** Connected components by TWO-PHASE STAR CONTRACTION (Kiveris et
    * al., "Connected Components in MapReduce and Beyond" — the
    * published O(log n)-round fix [[connectedComponents]]'s scaladoc
    * promises as the next gear): round count scales with the LOG of
    * the component diameter, not the diameter itself, so a planted
    * 200-hop path labels in ~8 alternations where HashMin needs 200
    * propagation rounds. Same output, same oracle as q155 — the
    * DuckDB twin computes components by recursive transitive
    * closure, a third independent algorithm.
    *
    * One alternation = LARGE-STAR (every node links its
    * strictly-larger neighbors to the min of its closed
    * neighborhood; doubles the rate at which low labels reach star
    * peripheries) then SMALL-STAR (every node links its ≤ neighbors
    * and itself to the neighborhood min; flattens chains into
    * stars). Both preserve connectivity; at the fixpoint the edge
    * set is a star forest rooted at component minima, read off as
    * labels (isolated nodes label themselves). Convergence is an
    * exact set check — equal counts + one anti-join — per
    * alternation, and each phase ends in `localCheckpoint` (the
    * repo's loop discipline: no lineage compounding, the q304
    * post-mortem).
    *
    * Scale shape per phase: one keyed equi-join of the edge frame
    * against its own per-node minima plus one distinct — O(E) keyed
    * shuffles, no windows, nothing driver-side; edge growth is
    * bounded (star edges only), and O(log diameter) total rounds is
    * the whole point at 100 TB where a 10⁶-hop chain would hold
    * HashMin hostage.
    */
  def ccTwoPhase(spark: SparkSession, d: String,
                 maxRounds: Int = 25): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d).select($"o_custkey".as("c"),
      $"o_orderkey".as("k"),
      datediff($"o_orderdate", lit("1970-01-01")).cast("long").as("day"))
    val w = Window.partitionBy($"c").orderBy($"day", $"k")
    val e = o
      .withColumn("pk", lag($"k", 1).over(w))
      .withColumn("pd", lag($"day", 1).over(w))
      .filter($"pk".isNotNull && $"day" - $"pd" <= 7)
      .select($"k".as("src"), $"pk".as("dst"))
    val (labels, _) = ccStarContraction(e, o.select($"k".as("node")),
      maxRounds)
    labels.select($"node".as("o_orderkey"), $"label".as("component"))
      .orderBy($"o_orderkey")
  }

  /** The star-contraction kernel over an arbitrary (src, dst) edge
    * frame: (labels, alternations used). `nodes` supplies the node
    * domain so isolated nodes keep a self-label. */
  private[graft] def ccStarContraction(edges0: DataFrame, nodes: DataFrame,
                                       maxRounds: Int = 25)
      : (DataFrame, Int) = {
    import edges0.sparkSession.implicits._
    var edges = edges0
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct().localCheckpoint()
    var rounds = 0
    val nEdges0 = edges.count()
    var done = nEdges0 == 0L
    // the per-node minima frames are ≤ |V| ≤ 2·|E| two-long rows:
    // under the adjacency gate they broadcast into the neighborhood
    // probe, so neither phase shuffles the edge frame (each phase's
    // SMJ paid exchange+sort of the |E|-row side to attach minima);
    // above the gate the keyed joins below run unchanged
    val fits = nEdges0 <= BroadcastAdjMaxEntries / 2
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    while (!done && rounds < maxRounds) {
      rounds += 1
      // LARGE-STAR over the symmetric neighborhood: per node u, link
      // every neighbor v > u to m = min(N(u) ∪ {u})
      val nbrL = edges.select($"a".as("u"), $"b".as("v"))
        .unionAll(edges.select($"b".as("u"), $"a".as("v")))
      val mL = nbrL.groupBy($"u").agg(min($"v").as("mv"))
        .select($"u", least($"mv", $"u").as("m"))
      val afterL = nbrL.join(hinted(mL), "u").filter($"v" > $"u")
        .select(least($"v", $"m").as("a"), greatest($"v", $"m").as("b"))
        .filter($"a" =!= $"b").distinct().localCheckpoint(false)
      // SMALL-STAR on the to-smaller orientation: per node u, link
      // all its smaller neighbors AND u itself to their min
      val nbrS = afterL.select($"b".as("u"), $"a".as("v"))
      val mS = nbrS.groupBy($"u").agg(min($"v").as("m"))
      val afterS = nbrS.join(hinted(mS), "u")
        .select(explode(array(struct($"v".as("x"), $"m"),
          struct($"u".as("x"), $"m"))).as("p"))
        .select(least($"p.x", $"p.m").as("a"),
          greatest($"p.x", $"p.m").as("b"))
        // lazy: the fixpoint check below is the round's ONE action and
        // materializes both phases' blocks in a single job (was 3
        // blocking jobs per alternation)
        .filter($"a" =!= $"b").distinct().localCheckpoint(false)
      // exact edge-set fixpoint in ONE job: both sides are distinct
      // sets, so an empty symmetric difference (rows appearing in
      // exactly one of the two) ⇔ equal sets
      done = afterS.unionAll(edges).groupBy($"a", $"b").count()
        .filter($"count" === 1).isEmpty
      edges = afterS
    }
    val labeled = edges.select($"b".as("node"), $"a".as("label"))
      .unionAll(edges.select($"a".as("node"), $"a".as("label")))
      .groupBy($"node").agg(min($"label").as("label"))
    val all = nodes.distinct().join(labeled, Seq("node"), "left")
      .select($"node", coalesce($"label", $"node").as("label"))
    (all, rounds)
  }

  /** Synchronous label-propagation communities over the co-purchase
    * part graph — the assortment/community census ([[kCore]] extracts
    * the dense backbone; LPA assigns EVERY node a community by
    * neighbor majority vote). Each node starts as its own label; each
    * round every node adopts the most frequent label among its
    * neighbors, ties broken to the smallest label — a fully
    * deterministic rule, so a FIXED round count is reproducible
    * bit-for-bit on any engine regardless of convergence (sync LPA
    * famously oscillates on bipartite structures; the co-purchase
    * projection is triangle-rich, and fixed rounds sidestep the
    * question entirely rather than hiding it in a convergence race).
    *
    * Scale shape: each round is ONE edge-frame equi-join against the
    * |V|-row label frame plus two hash aggregates — the vote count
    * `groupBy(u, label)` (map-side combinable) and the per-node
    * argmax, taken algebraically as `max(struct(votes, -label))` so
    * no per-node window ever funnels a hot node's votes through one
    * reducer (the [[graft.ext.Stats.fdAudit]] argmax discipline).
    * The label side rides the measured [[BroadcastAdjMaxEntries]]
    * gate: under it the per-round join broadcasts the |V|-row
    * (node, label) frame and the round is shuffle-free — the edge
    * frame stays hash-partitioned by u, which already clusters both
    * aggregates (HashPartitioning(u) satisfies the (u, label)
    * clustering) — while above it the join degrades to the v-keyed
    * shuffle, the always-safe path for a label frame too large for
    * the driver. Per-round `localCheckpoint` keeps the loop lineage
    * flat (the [[kCoreOf]] lesson). The oracle resolves the same
    * argmax with ROW_NUMBER windows — a different algorithm for the
    * decisive step, exactly what the hash gate should compare.
    */
  def labelPropagation(spark: SparkSession, d: String,
                       rounds: Int = 4,
                       maxBroadcastLabels: Long = BroadcastAdjMaxEntries): DataFrame = {
    import spark.implicits._
    // the symmetric projection is input-derived and round-invariant —
    // shared via the registry so repeated calls (bench passes, other
    // consumers) reuse one materialization
    val sym = graft.Derived.frame(s"copart-sym:$d") {
      val e = copartEdges(spark, d)
      val s0 = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      // adaptive pinned width: e is a materialized Derived frame, so
      // the union's estimate is 2x measured cache bytes — trustworthy
      graft.operators.Adaptive.byKey(s0)(s0, $"u")
    }
    // the converged |V|-row label frame is registry-shared (keyed by
    // every input that changes it, incl. the broadcast budget so the
    // gate spec's fallback run never reuses a hinted-path frame):
    // q185 and the modularity eval (q215) pay ONE propagation run per
    // session between them
    val labels = graft.Derived.frame(
      s"lpa-labels:$d:r=$rounds:b=$maxBroadcastLabels") {
      // measured gate: |V| ≤ |E_sym| (every node carries ≥1 edge
      // row), and the label frame is exactly |V| two-long rows every
      // round — one cache-scan count decides all rounds
      val fits = graft.Derived.scalar(s"copart-sym-n:$d")(sym.count()) <= maxBroadcastLabels
      def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
      var l = sym.select($"u".as("node")).distinct()
        .select($"node", $"node".as("label"))
        .localCheckpoint()
      for (_ <- 1 to rounds) {
        l = sym
          .join(hinted(l.select($"node".as("v"), $"label")), "v")
          .groupBy($"u", $"label").agg(count(lit(1)).as("c"))
          // argmax(votes, then min label) as an aggregate: labels are
          // positive part keys, so max of (c, -label) picks max votes
          // and, within a tie, the smallest label
          .groupBy($"u")
          .agg(max(struct($"c".as("c"), (-$"label").as("nl"))).as("m"))
          .select($"u".as("node"), (-$"m.nl").as("label"))
          .localCheckpoint()
      }
      l
    }
    labels.select($"node".as("part"), $"label".as("community"))
      .orderBy($"part")
  }

  /** Newman modularity of the [[labelPropagation]] communities — the
    * standard "is this partition better than chance" score that turns
    * a community ALGORITHM into an evaluated artifact: Q = Σ_c
    * [e_in(c)/m − (deg(c)/2m)²], here in symmetric-row counts as the
    * exact rational `(S·in − Σ deg_c²)/S²` with S = 2m rows, in = rows
    * whose endpoints share a community. Both aggregates stage
    * DECIMAL(38,0) and the single division rides the 10⁹-denominator
    * shift (Q may be negative; div vs // again).
    *
    * Scale shape: the community frame is the |V|-row LPA checkpoint
    * leaf; scoring is two equi-joins of the shared cached edge frame
    * against it plus map-side-combinable aggregates — the degree
    * census needs only the u-side join. No windows, no collect.
    */
  def modularity(spark: SparkSession, d: String,
                 rounds: Int = 4): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val comm = labelPropagation(spark, d, rounds)
      .select($"part".as("node"), $"community".as("label"))
    val sym = graft.Derived.frame(s"copart-sym:$d") {
      val e = copartEdges(spark, d)
      val s0 = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      // adaptive pinned width: e is a materialized Derived frame, so
      // the union's estimate is 2x measured cache bytes — trustworthy
      graft.operators.Adaptive.byKey(s0)(s0, $"u")
    }
    val degs = sym.join(comm.select($"node".as("u"), $"label".as("lu")), "u")
      .groupBy($"lu").agg(count(lit(1)).cast(dec).as("dc"))
    val dsq = degs.agg(sum($"dc" * $"dc").as("sd"),
      count(lit(1)).as("k"))
    val tot = sym
      .join(comm.select($"node".as("u"), $"label".as("lu")), "u")
      .join(comm.select($"node".as("v"), $"label".as("lv")), "v")
      .agg(count(lit(1)).cast(dec).as("s"),
        sum(when($"lu" === $"lv", 1L).otherwise(0L)).cast(dec).as("inr"))
    tot.crossJoin(broadcast(dsq))
      .select($"k".as("n_communities"),
        expr("CAST(s AS BIGINT)").as("s_rows"),
        expr("CAST(((s * inr - sd) * 1000000 + 1000000000 * (s * s))" +
          " div (s * s) - 1000000000 AS BIGINT)").as("q_q6"))
  }

  /** Weighted single-source shortest paths, `maxHops` Bellman-Ford
    * rounds — "how tightly is everything coupled to the seed set"
    * over the co-purchase graph, with edge length inverse to
    * co-purchase frequency (`w = 1 + 10⁶ div cocount`: frequently
    * co-bought parts are close). [[bfsLayers]] is the unweighted hop
    * census; this is the weighted metric, and a cheap 2-hop detour
    * through strong edges correctly beats a direct weak edge.
    *
    * All arithmetic is integer (`div` floors identically on both
    * engines for the positive counts here; distances are bounded by
    * maxHops·(10⁶+1) ≪ int64), so min-plus relaxation is
    * order-independent and engine-exact. Each round relaxes every
    * settled node — after round r, `dist` is the exact shortest
    * distance using ≤ r edges, the textbook synchronous Bellman-Ford
    * invariant — as ONE equi-join of the weighted edge frame against
    * the distance frame plus one min-aggregate; per-round
    * `localCheckpoint` flattens the two-reference round lineage.
    * Unreached nodes are absent, never sentinel-valued.
    */
  def ssspWeighted(spark: SparkSession, d: String, maxHops: Int = 3,
                   seedMax: Long = 50L): DataFrame = {
    import spark.implicits._
    // the weighted symmetric edge frame (basket self-join + count) is
    // the expensive input-derived intermediate — registry-shared, and
    // its pair-count core is shared further with assocRules (q171)
    val sym = graft.Derived.frame(s"copart-weighted-sym:$d") {
      val w = pairCounts(spark, d)
        .select($"a", $"b", expr("1 + (1000000 div cnt)").as("w"))
      // session-width: the SSSP rounds equi-join this frame against
      // exchange-produced frontier frames — a narrower pinned width
      // mismatches theirs and re-shuffles BOTH sides every round
      // (measured 14 MB -> 92 MB shuffled, wall +20%)
      w.select($"a".as("u"), $"b".as("v"), $"w")
        .unionAll(w.select($"b".as("u"), $"a".as("v"), $"w"))
        .repartition($"u")
    }
    // no broadcast gate: the relax join probes the edge frame on its
    // cached u partitioning — only the |settled|-row distance frame
    // moves (the pageRankOnEdges rationale)
    var dist = sym.select($"u".as("node")).distinct()
      .filter($"node" <= seedMax)
      .select($"node", lit(0L).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to maxHops) {
      val relaxed = sym
        .join(dist.select($"node".as("u"), $"dist".as("du")), "u")
        .select($"v".as("node"), ($"du" + $"w").as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .localCheckpoint()
    }
    dist.select($"node".as("part"), $"dist")
      .orderBy($"part")
  }

  /** k-core decomposition of the co-purchase part graph (dense-
    * community extraction: the subgraph where every part co-occurs
    * with ≥ k other parts — the "stable catalogue backbone" cut
    * recommendation pipelines mine). Classic iterative peeling:
    * remove all nodes of degree < k, which lowers neighbors' degrees,
    * and repeat until the survivor set is stable; the result is the
    * unique maximal subgraph with minimum degree ≥ k.
    *
    * Scale shape: each round is one map-side-combinable degree
    * aggregate plus TWO semi-joins of the edge list against the
    * survivor set. The survivor side rides the measured
    * [[BroadcastAdjMaxEntries]] gate: under it both semi-joins
    * broadcast and the round is shuffle-free (the edge frame stays
    * hash-partitioned by u across checkpoints, so even the degree
    * aggregate reuses the layout); above it they degrade to u/v-keyed
    * shuffles of the edge frame — never a broadcast of anything
    * unmeasured. Convergence is a scalar survivor COUNT per round
    * (the connectedComponents discipline: a strictly-decreasing
    * metric, not a changed-rows join); the edge frame shrinks
    * monotonically so late rounds are cheap. Round count is bounded
    * by the peel depth (5 at sf0.01), with `maxIters` guarding
    * adversarial chains.
    */
  def kCore(spark: SparkSession, d: String, k: Long = 65L,
            maxIters: Int = 30,
            maxBroadcastNodes: Long = BroadcastAdjMaxEntries): DataFrame = {
    import spark.implicits._
    // round 0 reads the SAME registry frame labelPropagation shares;
    // the peel never mutates it (each round derives a fresh frame)
    val sym0 = graft.Derived.frame(s"copart-sym:$d") {
      val e = copartEdges(spark, d)
      val s0 = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      // adaptive pinned width: e is a materialized Derived frame, so
      // the union's estimate is 2x measured cache bytes — trustworthy
      graft.operators.Adaptive.byKey(s0)(s0, $"u")
    }
    kCoreOnSym(sym0, k, maxIters, maxBroadcastNodes)
  }

  /** [[kCore]] on an explicit undirected edge frame `(a, b)` —
    * separated so property tests can drive random graphs through the
    * exact production peel. */
  private[graft] def kCoreOf(base: DataFrame, k: Long,
                             maxIters: Int = 30,
                             maxBroadcastNodes: Long = BroadcastAdjMaxEntries): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val s0 = base.select($"a".as("u"), $"b".as("v"))
      .unionAll(base.select($"b".as("u"), $"a".as("v")))
    kCoreOnSym(graft.operators.Adaptive.byKey(s0)(s0, $"u")
      .localCheckpoint(), k, maxIters, maxBroadcastNodes)
  }

  private def kCoreOnSym(sym0: DataFrame, k: Long,
                         maxIters: Int,
                         maxBroadcastNodes: Long = BroadcastAdjMaxEntries): DataFrame = {
    val spark = sym0.sparkSession
    import spark.implicits._
    // localCheckpoint (eager, MEMORY_AND_DISK) instead of persist: the
    // round plan embeds `sym` THREE times (directly + twice via keep),
    // so an un-truncated lineage is 3^rounds analyzer nodes — a slow
    // cascade (each round shaving a few nodes) OOMs the DRIVER long
    // before any executor sees pressure. Checkpointing resets each
    // round's plan to a leaf; blocks are reclaimed by the context
    // cleaner as the old rounds go out of scope.
    var sym = sym0
    // Convergence metric: EDGE count, not distinct-node count. The
    // two are equivalent here — a node leaves `keep` only with all
    // its rows (both semi-joins drop it everywhere), so the node set
    // changes iff the edge set does — and the edge count is free: it
    // is the row count of the frame the round materializes anyway,
    // while distinct(u) paid an extra shuffle per round.
    var nEdges = sym.count()
    // Measured broadcast gate (the [[BroadcastAdjMaxEntries]] shape):
    // the survivor set is ≤ |V| ≤ |E_sym| single-long node ids and the
    // peel only SHRINKS it, so the edge count the loop measures anyway
    // bounds every round's broadcast payload — one up-front decision,
    // no per-round measurement. Under the gate both endpoint filters
    // become broadcast semi-joins, and because `sym0` arrives hash-
    // partitioned by u (and localCheckpoint preserves partitioning)
    // the degree aggregate needs no exchange either: a whole peel
    // round is SHUFFLE-FREE. Above the gate — a billion-node survivor
    // set has no business on the driver — the joins degrade to the
    // u/v-keyed shuffles below, the always-safe path.
    val fits = nEdges <= maxBroadcastNodes
    var converged = false
    var round = 0
    while (!converged && round < maxIters) {
      round += 1
      // lazy checkpoint: the convergence count below is the single
      // materializing action of the round (eager localCheckpoint
      // would run its own job first and make count a second one)
      val next = kCoreRound(sym, k, fits).localCheckpoint(false)
      val n = next.count()
      sym = next
      converged = n == nEdges
      nEdges = n
    }
    sym.groupBy($"u".as("part")).agg(count(lit(1)).as("core_deg"))
      .orderBy($"part")
  }

  /** One peel round: drop edges whose u OR v endpoint fell under
    * degree k. ONE hinted survivor frame is probed by BOTH semi-joins
    * — the endpoint swap happens on the LEFT (edge) side as a free
    * projection, so both right sides are the IDENTICAL `kb` plan and
    * canonicalize equal: Spark builds ONE broadcast/shuffle exchange
    * per round and the second join reads a ReusedExchange, i.e. the
    * degree aggregate runs once per round, not once per endpoint.
    * (The v-side used to be a `keep.toDF("v")` re-alias, whose extra
    * Project defeated exchange reuse — KCoreReuseSpec pins the reuse.)
    */
  private[graft] def kCoreRound(sym: DataFrame, k: Long,
                                fits: Boolean): DataFrame = {
    import sym.sparkSession.implicits._
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    val keep = sym.groupBy($"u").agg(count(lit(1)).as("deg"))
      .filter($"deg" >= k).select($"u")
    val kb = hinted(keep)
    sym
      .join(kb, Seq("u"), "left_semi")
      .select($"v".as("u"), $"u".as("v")) // swap: filter the v end
      .join(kb, Seq("u"), "left_semi")
      .select($"v".as("u"), $"u".as("v")) // swap back
  }

  /** k-truss of the co-purchase graph — the EDGE-cohesion peel next
    * to [[kCore]]'s node peel: the maximal subgraph where every
    * surviving edge closes ≥ k−2 triangles WITH OTHER SURVIVORS.
    * Trusses are the standard community-core primitive one notch
    * stronger than cores (every k-truss sits inside the (k−1)-core,
    * never vice versa): a high-support edge is two products whose
    * co-purchase is embedded in a clique-like neighborhood, not one
    * popular hub.
    *
    * Algorithm: INCREMENTAL support-decrement peel — the distributed
    * form of the textbook truss decomposition, not a naive
    * recount-per-round:
    *
    *  1. Full per-edge support ONCE as the undirected common-neighbor
    *     count |N(a) ∩ N(b)| per edge via the codegen'd two-pointer
    *     merge kernel — count-only, in place, so no triangle row is
    *     ever materialized or shuffled (see [[trussSupport]]; the
    *     prior orientation + 3-credit-explode + re-aggregate form
    *     paid a 3·T-row exchange, 8.3 s at sf0.1; a node-ordered
    *     wedge self-join watchdogged outright — hub parts make it
    *     quadratic).
    *  2. Each peel round deletes the under-supported batch D and
    *     DECREMENTS the survivors touching destroyed triangles
    *     instead of recounting: support(e, E∖D) = support(e, E) −
    *     #{triangles through e with ≥1 edge in D} — exact by
    *     inclusion (triples found from EVERY deleted member edge are
    *     dedup'd on the sorted triple, so a 2-deleted-edge triangle
    *     decrements its lone survivor once, a 3-deleted one nobody).
    *     Every deleted edge has support < k−2 BY DEFINITION OF ITS
    *     DELETION, so it sits in < k−2 triangles — the destroyed set
    *     is |D|-bounded and rounds after the first cost O(|D|), not
    *     O(E^1.5). (The recount variant measured 8 × ~4 s at sf0.1;
    *     this shape pays the kernel once.)
    *  3. Rounds `localCheckpoint` (the support table re-enters its
    *     own next-round plan — the q304 lineage lesson); convergence
    *     = empty deletion batch, measured by the count each round
    *     materializes anyway.
    *
    * The oracle unrolls the equivalent recount peel (10 MATERIALIZED
    * rounds, the q172 recipe); the decrement identity above makes the
    * two algebras equal round-for-round, `maxIters` matches the
    * unroll, and KTrussSpec proves incremental == recount on planted
    * graphs and real data. Requires k ≥ 3 (the k = 2 truss is the
    * whole graph and the support table — keyed by triangled edges —
    * could not represent it).
    *
    * ROUND STRUCTURE, stated for the 100×-diameter question: unlike
    * connected components (where HashMin's diameter-many rounds have
    * the O(log n) large-star/small-star alternative — [[ccTwoPhase]],
    * q316) truss peeling's rounds are the CASCADE DEPTH of the
    * deletion order itself — each wave's victims are defined by the
    * previous wave's decrements, and the parallel-truss literature
    * (ParK/PKT-style peels) shares exactly this round structure, so
    * there is no semantics-preserving O(log n) contraction to switch
    * to. What this engine does instead: below the measured
    * [[DriverPeelMaxEdges]] gate a round costs microseconds in
    * [[kTrussDriverPeel]] (a 60-wave cascade is as cheap as a
    * 3-wave one — KTrussSpec plants one); above it, rounds are
    * |D|-bounded DELTA jobs against a never-rewritten support table,
    * so a deep cascade pays scheduling floors, never O(E) work per
    * wave.
    */
  /** Edge gate below which the truss PEEL (not the support kernel)
    * finishes on the driver — the [[graft.ext.Dedup]] discipline
    * (driver union-find below `DriverResolveMaxEdges`, distributed
    * label propagation above): the peel's cascade rounds are
    * |D|-bounded DELTAS, so running them as distributed jobs pays a
    * multi-job scheduling floor per round (measured 1-2 s even for a
    * 4-edge deletion batch) that dwarfs the actual work at any size a
    * driver can hold. 5M (a, b, s) rows ≈ 200 MB of peel state. Above
    * the gate, [[kTrussLoop]] runs the same algebra distributed. */
  val DriverPeelMaxEdges = 5000000L

  def kTruss(spark: SparkSession, d: String, k: Long = 4L,
             maxIters: Int = 10): DataFrame = {
    import spark.implicits._
    val e0 = copartEdges(spark, d)
    val nEdges = e0.count()
    // measured gate for the UNDIRECTED adjacency (payload 2|E|
    // entries, twice the oriented form's — hence the halved budget)
    val fits = nEdges <= BroadcastAdjMaxEntries / 2
    val undirAdj = graft.Derived.frame(s"copart-undadj:$d:bc=$fits") {
      e0.select($"a".as("node"), $"b".as("nbr"))
        .unionAll(e0.select($"b".as("node"), $"a".as("nbr")))
        .groupBy($"node").agg(sort_array(collect_list($"nbr")).as("nbr"))
    }
    if (nEdges <= DriverPeelMaxEdges)
      kTrussDriverPeel(e0, undirAdj, k, maxIters, fits)
    else kTrussLoop(e0, undirAdj, k, maxIters, fits)
  }

  /** [[kTruss]] on an explicit canonical (a < b) edge frame —
    * separated so specs can drive planted graphs through the exact
    * production DISTRIBUTED peel (`maxDriverPeel = 0` forces it even
    * below the gate; the default exercises the gate dispatch). Builds
    * (and checkpoints) its own undirected adjacency; the named-table
    * entry point shares the session-cached one instead. */
  private[graft] def kTrussOf(e0: DataFrame, k: Long, maxIters: Int,
      maxBroadcastAdj: Long = BroadcastAdjMaxEntries,
      maxDriverPeel: Long = DriverPeelMaxEdges): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val nEdges = e0.count()
    val fits = nEdges <= maxBroadcastAdj / 2
    val undirAdj = e0.select($"a".as("node"), $"b".as("nbr"))
      .unionAll(e0.select($"b".as("node"), $"a".as("nbr")))
      .groupBy($"node").agg(sort_array(collect_list($"nbr")).as("nbr"))
      .localCheckpoint(false)
    if (nEdges <= maxDriverPeel)
      kTrussDriverPeel(e0, undirAdj, k, maxIters, fits)
    else kTrussLoop(e0, undirAdj, k, maxIters, fits)
  }

  /** Below-gate peel: the SAME round algebra as [[kTrussLoop]] —
    * simultaneous deletion of every under-supported edge, destroyed
    * triangles dedup'd per sorted triple, surviving edges decremented
    * once per destroyed triangle, `maxIters` rounds — run in driver
    * memory over the collected (a, b, s) support table (the ONE
    * gated collect, [[DriverPeelMaxEdges]]). The distributed support
    * kernel still computes the initial per-edge supports; only the
    * |D|-bounded cascade moves to the driver, where a round costs
    * microseconds instead of a multi-job scheduling floor.
    * KTrussSpec proves driver == distributed == brute recount on
    * planted and pseudo-random graphs. */
  private def kTrussDriverPeel(e0: DataFrame, undirAdj: DataFrame,
      k: Long, maxIters: Int, fits: Boolean): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    require(k >= 3, s"kTruss needs k >= 3, got $k")
    val minSup = k - 2
    def dbg(msg: => String): Unit =
      if (sys.env.contains("GRAFT_TRUSS_DEBUG"))
        System.err.println(s"[ktruss-drv] $msg t=${System.nanoTime() / 1000000}")
    dbg("start")
    val rows = trussSupport(e0, undirAdj, fits)
      .collect() // gated: caller measured |E| <= DriverPeelMaxEdges
    dbg(s"collected n=${rows.length}")
    // peel state in SPECIALIZED LongMaps (nested a → b → value, never
    // a boxed (Long, Long) tuple key): the tuple-keyed HashMap form
    // hashed + allocated a tuple per probe, and at ~1.2M support rows
    // the peel's build + waves + census cost more driver time than
    // the distributed support kernel itself (measured 1.9 s vs 1.5 s
    // at sf0.1; the LongMap form runs the same algebra allocation-free
    // on the hot paths)
    import scala.collection.mutable.LongMap
    val sup = new LongMap[LongMap[Long]]()
    val adj = new LongMap[LongMap[Boolean]]()
    rows.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1); val s = r.getLong(2)
      sup.getOrElseUpdate(a, new LongMap[Long]).update(b, s)
      adj.getOrElseUpdate(a, new LongMap[Boolean]).update(b, true)
      adj.getOrElseUpdate(b, new LongMap[Boolean]).update(a, true)
    }
    var nLive = rows.length.toLong
    // round-1 victims by one scan; later rounds are DISCOVERED at
    // decrement time (an edge crossing the bar queues exactly once) —
    // no per-round rescan of the full support map
    var d = {
      val v = Vector.newBuilder[(Long, Long)]
      sup.foreach { case (a, m) =>
        m.foreach { case (b, s) => if (s < minSup) v += ((a, b)) }
      }
      v.result()
    }
    var applied = 0
    while (applied < maxIters && d.nonEmpty) {
      applied += 1
      // destroyed triangles of this round's simultaneous deletion:
      // common LIVE neighbors of each victim's endpoints, dedup'd on
      // the sorted triple (adjacency still includes the victims —
      // live-before-deletion, exactly the distributed form's `live`)
      val destroyed = new scala.collection.mutable.HashSet[(Long, Long, Long)]()
      d.foreach { case (a, b) =>
        val na = adj(a); val nb = adj(b)
        val (small, big) = if (na.size <= nb.size) (na, nb) else (nb, na)
        small.foreachKey { w =>
          if (w != a && w != b && big.contains(w)) {
            // sorted triple (x <= y are the edge's endpoints)
            val x = math.min(a, b); val y = math.max(a, b)
            val mid = if (w < x) x else if (w > y) y else w
            destroyed += ((math.min(x, w), mid, math.max(y, w)))
          }
        }
      }
      // delete the victims, then decrement each destroyed triangle's
      // SURVIVING edges once; survivors crossing the bar become the
      // next round's victims
      d.foreach { case (a, b) =>
        sup.get(a).foreach { m => if (m.contains(b)) { m -= b; nLive -= 1 } }
        adj(a) -= b; adj(b) -= a
      }
      val nextD = Vector.newBuilder[(Long, Long)]
      def dec(a: Long, b: Long): Unit = sup.get(a).foreach { m =>
        m.get(b).foreach { s =>
          val ns = s - 1
          m.update(b, ns)
          if (ns < minSup && ns + 1 >= minSup) nextD += ((a, b))
        }
      }
      destroyed.foreach { case (x, y, z) =>
        dec(x, y); dec(x, z); dec(y, z)
      }
      d = nextD.result()
    }
    dbg(s"peel done live=$nLive")
    val census = new LongMap[Long]()
    sup.foreach { case (a, m) =>
      m.foreachKey { b =>
        census.update(a, census.getOrElse(a, 0L) + 1L)
        census.update(b, census.getOrElse(b, 0L) + 1L)
      }
    }
    spark.createDataFrame(census.toSeq.sortBy(_._1))
      .toDF("part", "truss_deg").orderBy($"part")
  }

  private def kTrussLoop(e0: DataFrame, undirAdj: DataFrame,
      k: Long, maxIters: Int, fits: Boolean): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    require(k >= 3, s"kTruss needs k >= 3, got $k")
    val minSup = k - 2
    def dbg(msg: => String): Unit =
      if (sys.env.contains("GRAFT_TRUSS_DEBUG"))
        System.err.println(s"[ktruss] $msg t=${System.nanoTime() / 1000000}")
    dbg("start")
    // support over E0, once, and NEVER REWRITTEN after: the peel
    // maintains the current state as sup0 ⊖ deleted ⊖ cumDecr —
    // two |D|-bounded side frames — instead of republishing a full
    // |E|-row support table per round (the previous shape's per-round
    // localCheckpoint of ~|E| rows cost 1-2.7 s even on a 4-edge
    // deletion batch; the delta frames cost milliseconds). Edges
    // outside sup0 close no triangle: they are dead in every k ≥ 3
    // truss AND destroy nothing, so the cascade runs entirely on
    // sup0's keys.
    val sup0 = trussSupport(e0, undirAdj, fits).localCheckpoint(false)
    dbg("support done")
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    // peel-1 victims within the triangled set
    var d = sup0.filter($"s" < minSup).select($"a", $"b")
      .localCheckpoint(false)
    var dEdges = d.count()
    // everything peeled BEFORE the current round (checkpointed; grows
    // to the total deletion count, |E|-bounded and in practice a
    // small fraction)
    var deleted: DataFrame = Seq.empty[(Long, Long)].toDF("a", "b")
    // accumulated support decrements (a, b, dec) from destroyed
    // triangles, bounded by 3 × destroyed-triangle count
    var cumDecr: DataFrame = Seq.empty[(Long, Long, Long)]
      .toDF("a", "b", "dec")
    dbg(s"d0 done deleted=$dEdges")
    var applied = 0
    while (applied < maxIters && dEdges > 0) {
      applied += 1
      // d's size is MEASURED (dEdges, the loop's own convergence
      // count) and deleted edges have support < k−2, so the destroyed
      // set and its decrement rows are |d|-bounded too: everything
      // derived from d broadcasts under the gate. Without the hints,
      // checkpointed frames carry no statistics and every peel paid a
      // 1M-row sort-merge join against a 62k probe (measured 2-5 s
      // each; map-side broadcast makes the rebuild scan-speed).
      val dFits = fits && dEdges <= BroadcastAdjMaxEntries
      def dHint(df: DataFrame): DataFrame =
        if (dFits) broadcast(df) else df
      // live edge set BEFORE this round's deletion: sup0 minus the
      // PREVIOUSLY deleted (d itself is still live here — the
      // inclusion dedup below handles multi-deleted triangles)
      val live = sup0.join(hinted(deleted), Seq("a", "b"), "left_anti")
      // destroyed triangles: common neighbors of each deleted edge's
      // endpoints among live edges; adjacency restricted to D's
      // endpoints (a destroyed triangle's other edges each close
      // ≥ this triangle, so they sit in sup0 — its keys suffice)
      val nodesD = d.select($"a".as("srcn"))
        .unionAll(d.select($"b".as("srcn"))).distinct()
      val adjD = live.select($"a".as("srcn"), $"b".as("dstn"))
        .unionAll(live.select($"b".as("srcn"), $"a".as("dstn")))
        .join(dHint(nodesD), Seq("srcn"), "left_semi")
        .groupBy($"srcn").agg(collect_list($"dstn").as("nbr"))
      val tri = dHint(d)
        .join(adjD.select($"srcn".as("a"), $"nbr".as("na")), "a")
        .join(adjD.select($"srcn".as("b"), $"nbr".as("nb")), "b")
        .select($"a", $"b",
          explode(array_intersect($"na", $"nb")).as("w"))
      val decr = tri
        .select(array_sort(array($"a", $"b", $"w")).as("t")).distinct()
        .select(explode(array(
          struct($"t" (0).as("a"), $"t" (1).as("b")),
          struct($"t" (0).as("a"), $"t" (2).as("b")),
          struct($"t" (1).as("a"), $"t" (2).as("b")))).as("p"))
        .select($"p.a".as("a"), $"p.b".as("b"))
        .groupBy($"a", $"b").agg(count(lit(1)).as("dec"))
      // fold this round's decrements into the running total (rows for
      // deleted edges are harmless — deleted keys never re-enter) and
      // find the NEW victims: live survivors whose adjusted support
      // dropped under the bar — one lazy scan of the checkpointed
      // sup0 with broadcast side frames, nothing |E|-sized rewritten
      cumDecr = cumDecr.unionAll(decr)
        .groupBy($"a", $"b").agg(sum($"dec").as("dec"))
        .localCheckpoint(false)
      deleted = deleted.unionAll(d).localCheckpoint(false)
      d = sup0.join(dHint(deleted), Seq("a", "b"), "left_anti")
        .join(dHint(cumDecr), Seq("a", "b"), "left")
        .filter($"s" - coalesce($"dec", lit(0L)) < minSup)
        .select($"a", $"b")
        .localCheckpoint(false)
      dEdges = d.count()
      dbg(s"peel=$applied deleted=$dEdges")
    }
    val survivors = sup0.join(hinted(deleted), Seq("a", "b"), "left_anti")
    survivors.select($"a".as("part"))
      .unionAll(survivors.select($"b".as("part")))
      .groupBy($"part").agg(count(lit(1)).as("truss_deg"))
      .orderBy($"part")
  }

  /** Per-canonical-edge triangle support as the UNDIRECTED
    * common-neighbor count: support({a, b}) = |N(a) ∩ N(b)| —
    * computed per edge by the codegen'd two-pointer merge kernel
    * ([[graft.functions.SortedIntersectCount]]) over sorted undirected
    * adjacency, so NO triangle row is ever materialized or shuffled.
    * The previous form oriented the graph, exploded each found
    * triangle into its 3 canonical edge credits and re-aggregated —
    * a 3·T-row exchange that was the suite's biggest single line
    * (8.3 s at sf0.1); this one moves |E| rows through two
    * (gate-broadcast) joins and does the Σ(deg(a)+deg(b)) comparison
    * work in place — the same per-edge support every truss
    * decomposition must produce anyway. Only triangled edges keep a
    * row (the sup table's keyed-by-triangled-edges contract). */
  /** Absolute cap on the bitset-adjacency domain width (bits): above
    * it no per-row allocation is attempted regardless of density. */
  private val BitsetDomainMaxBits = 1L << 24

  private def trussSupport(e0: DataFrame, undirAdj: DataFrame,
      fits: Boolean): DataFrame = {
    import e0.sparkSession.implicits._
    import org.apache.spark.sql.graft.Bridge
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    // MEASURED dense-domain gate for the bitset intersection fast
    // path (one tiny aggregate over the cached adjacency): with node
    // ids spanning `width` and average degree `avg`, a bitset row is
    // width/8 bytes vs 8·avg for the sorted list, and the per-edge
    // intersect is width/64 branchless AND+popcount words vs
    // ~(deg_a + deg_b) branchy merge steps — both favor bitsets
    // exactly when width/64 ≤ avg (the co-purchase part graph at
    // sf0.1: width ≈ 20k bits = 313 words vs avg degree ≈ 1.2k — a
    // ~7x op and ~8x row-width reduction on the suite's hottest
    // kernel). Sparse or wide-id graphs (width/64 > avg, or width
    // past the absolute cap) keep the sorted-merge path bit-for-bit
    // (same counts — KTrussSpec pins truss equality through both).
    val dom = undirAdj
      .agg(min($"node").as("lo"), max($"node").as("hi"),
        count(lit(1)).as("nv"), sum(size($"nbr")).as("deg"))
      .head()
    val nv = dom.getLong(2)
    val lo = if (nv == 0) 0L else dom.getLong(0)
    val width = if (nv == 0) 0L else dom.getLong(1) - lo + 1
    val dense = nv > 0 && width <= BitsetDomainMaxBits &&
      (width >> 6) <= dom.getLong(3) / nv
    if (dense) {
      val bitAdj = undirAdj.select($"node",
        Bridge.column(graft.functions.BitsetFromSorted(
          Bridge.expression($"nbr"),
          Bridge.expression(lit(lo)), Bridge.expression(lit(width))))
          .as("nbr"))
      e0
        .join(hinted(bitAdj.toDF("a", "na")), "a")
        .join(hinted(bitAdj.toDF("b", "nb")), "b")
        .select($"a", $"b",
          Bridge.column(graft.functions.BitsetIntersectCount(
            Bridge.expression($"na"), Bridge.expression($"nb")))
            .cast("bigint").as("s"))
        .filter($"s" > 0)
    } else e0
      .join(hinted(undirAdj.toDF("a", "na")), "a")
      .join(hinted(undirAdj.toDF("b", "nb")), "b")
      .select($"a", $"b",
        Bridge.column(graft.functions.SortedIntersectCount(
          Bridge.expression($"na"), Bridge.expression($"nb")))
          .cast("bigint").as("s"))
      .filter($"s" > 0)
  }

  /** HITS hubs & authorities over the directed customer→supplier
    * purchase graph — the two-sided centrality ([[pageRank]] ranks
    * the symmetrized graph; HITS separates "good buyers" from
    * "good suppliers": an authority is a supplier bought by strong
    * hubs, a hub is a customer buying strong authorities).
    *
    * Integer-exact power iteration: scores start at 10⁶ and each
    * half-step renormalizes to MEAN 10⁶ — `x' = (raw·10⁶·n) div
    * Σraw` — instead of the textbook L2 norm, which would drag every
    * round through sqrt and float. The recurrence's fixpoint
    * direction is unchanged (any per-round positive rescaling
    * preserves HITS' eigenvector limit); all operands are positive so
    * Spark's truncating `div` and DuckDB's flooring `//` agree, and
    * sums are staged DECIMAL(38,0) (raw scores reach degree·10⁶·n —
    * past int64 at billion-node scale).
    *
    * Scale shape: each half-step is one equi-join of the edge frame
    * against the |V|-row score frame plus a map-side-combinable sum —
    * the [[pageRankOnEdges]] round shape — and the normalizer is a
    * one-row aggregate attached back as a broadcast scalar, never a
    * driver collect. Fixed `iters` keeps the unrolled oracle exact.
    *
    * Every half-step eagerly checkpoints its |V|-row RAW sum frame
    * (the kCore lineage discipline, NOT persist — see the in-body
    * comment for why cache-based pinning left a driver-side
    * exponential): the edge join+agg executes exactly once per
    * half-step and every consumer reads a materialized leaf. The
    * normalized score stays lazy — leaf × one-row broadcast, cheap to
    * re-derive — so a half-step costs ONE materializing action.
    */
  def hits(spark: SparkSession, d: String, iters: Int = 2,
           maxBroadcastNodes: Long = BroadcastAdjMaxEntries): DataFrame = {
    // iters == 0 would leave the authority side never computed (null
    // frame) — there is no meaningful zero-round HITS
    require(iters >= 1, s"hits needs at least one iteration, got $iters")
    import spark.implicits._
    val dec = "decimal(38,0)"
    // directed c→s half of the shared symmetric trade cache (even
    // ids are the customer side by tradeEdges' namespacing)
    val edges = tradeEdges(spark, d).filter($"src" % 2 === 0)
      .select($"src".as("c"), $"dst".as("s"))
    // The per-half-step score frames are |V|-row (≤ the trade node
    // domain) — broadcasting them into the cached edge probe saves the
    // SMJ that re-sorted the |E|-row edge half every half-step, but a
    // hint never auto-falls-back: at 10⁹ nodes an unconditional
    // broadcast collects a data-sized frame to the driver. Measured
    // gate (memoized node count, the hyperBall discipline): under the
    // budget the score side is hinted; above it the half-step keeps
    // the keyed join exactly as before the hint existed.
    val scoresFit = graft.Derived.scalar(s"trade-nodes-n:$d")(
      tradeEdges(spark, d).select($"src".as("node")).distinct().count()
    ) <= maxBroadcastNodes
    def hinted(df: DataFrame): DataFrame =
      if (scoresFit) broadcast(df) else df
    def normalized(raw: DataFrame, key: String, out: String): DataFrame = {
      val tot = raw.agg(sum($"raw").cast(dec).as("tot"),
        count(lit(1)).as("n"))
      raw.crossJoin(broadcast(tot))
        .select(col(key),
          expr(s"(CAST(raw AS $dec) * 1000000 * n) div tot").as(out))
    }
    // Round discipline: every pinned frame is an EAGER localCheckpoint
    // — a LogicalRDD leaf with no logical lineage (the kCore/
    // labelPropagation discipline). persist-based pinning is NOT
    // enough here: `normalized` embeds `raw` twice (crossJoin side +
    // tot aggregate), so the analyzed plan doubles per half-step, and
    // even though the data came from cache, the DRIVER's per-action
    // canonicalization/cache-lookup over 2^halfsteps embedded copies
    // of the edge lineage dominated the query (measured 28 s for the
    // last half-step alone at sf0.1; InMemoryRelation canonical forms
    // embed their child lineage, so rebasing onto the cache entry
    // does not truncate either). Checkpoint blocks are reclaimed by
    // the context cleaner as each round's frame goes out of scope;
    // the final hub/auth blocks live exactly as long as the returned
    // result references them — no registry entry to leak.
    def pin(df: DataFrame): DataFrame = df.localCheckpoint()
    // ONE pin per half-step — the RAW per-node sum, so the edge
    // join+agg executes exactly once. The normalized frame stays
    // UNPINNED: its whole lineage is the raw LEAF crossJoined with a
    // one-row broadcast aggregate over the same leaf, so re-deriving
    // it costs a |V|-row cache scan, not a recomputation — and the
    // plan stays constant-size per half-step (the exponential above
    // needed `raw` itself to carry lineage). Dropping the second pin
    // removes one materializing action per half-step, the r8-measured
    // residual cost of this query.
    def step(prev: DataFrame, inKey: String, outKey: String,
             out: String): DataFrame = {
      // prev is the |V|-row score frame — under the measured gate it
      // broadcasts into the edge probe: the SMJ this planned
      // (stats-less checkpoint leaves) re-sorted the cached |E|-row
      // edge half every half-step just to attach |V| scores
      val raw = pin(edges.join(hinted(prev), inKey).groupBy(col(outKey))
        .agg(sum(col(prev.columns.last).cast(dec)).as("raw")))
      normalized(raw, outKey, out)
    }
    var hub = pin(edges.select($"c").distinct()
      .select($"c", lit(1000000L).as("h")))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = step(hub, "c", "s", "a")
      hub = step(auth, "s", "c", "h")
    }
    hub.select(lit("cust").as("kind"), expr("c div 2").as("entity_id"),
        $"h".as("score_q6"))
      .unionAll(auth.select(lit("supp").as("kind"),
        expr("s div 2").as("entity_id"), $"a".as("score_q6")))
      .orderBy($"kind", $"entity_id")
  }

  /** Local clustering coefficient per node of the co-purchase graph —
    * the node-level closure census behind [[triangleCount]]'s global
    * number: cc(v) = triangles through v ÷ C(deg v, 2), the "how
    * clique-like is this part's neighborhood" score (integer q6; both
    * operands non-negative so div semantics agree across engines).
    *
    * Same oriented edge-iterator core as [[triangleCount]] (shared
    * via the Derived cache), but the per-edge intersection EXPLODES
    * its common neighbors so each triangle credits all three corners
    * exactly once — the materialized row count is the triangle count
    * itself (O(E^1.5) worst case, the arboricity bound), never the
    * wedge set. Per-corner credit then map-side-combines into |V|
    * rows and left-joins the degree census; triangle-free nodes
    * report 0, not null.
    */
  def clusteringCoeff(spark: SparkSession, d: String,
                      maxBroadcastAdj: Long = BroadcastAdjMaxEntries): DataFrame = {
    import spark.implicits._
    val e = copartEdges(spark, d)
    val fits = graft.Derived.scalar(s"copart-edges-n:$d")(e.count()) <= maxBroadcastAdj // measured gate, memoized cache scan
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    val oriented = orientedCopart(spark, d, fits)
    val adj = copartAdj(spark, d, fits)
    val corners = oriented
      .join(hinted(adj.toDF("src", "nu")), "src")
      .join(hinted(adj.toDF("dst", "nv")), "dst")
      .select($"src", $"dst", explode(array_intersect($"nu", $"nv")).as("w"))
    // ONE pass credits all three corners of each triangle — a 3-way
    // unionAll of `corners` projections would re-execute the join +
    // intersect explode per branch (plans don't share subtrees)
    val tri = corners
      .select(explode(array($"src", $"dst", $"w")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("nt"))
    val deg = e.select($"a".as("node")).unionAll(e.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    deg.join(tri, Seq("node"), "left")
      .select($"node".as("part"), $"deg",
        coalesce($"nt", lit(0L)).as("n_tri"))
      .select($"part", $"deg", $"n_tri",
        when($"deg" >= 2,
          expr("(2 * n_tri * 1000000) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_q6"))
      .orderBy($"part")
  }

  /** Seed-anchored Adamic–Adar link prediction — "related items" for
    * a seed set over the co-purchase graph: for each seed part, the
    * top-k NON-adjacent parts by `AA(a,b) = Σ_{w ∈ N(a)∩N(b)}
    * 1/ln(deg w)`, the standard common-neighbor score that discounts
    * hub centers.
    *
    * Scale shape — the retrieval form, NOT the all-pairs form: an
    * unanchored AA over this graph is Σ C(deg,2) ≈ 148M wedge rows at
    * sf0.1 (the shape [[triangleCount]]'s scaladoc documents
    * abandoning); anchoring on a seed set bounds every stage by
    * |seeds|·deg² regardless of corpus size — the only corpus-sized
    * work is the shared `copart-sym` frame + its degree census (one
    * map-side-combinable agg reusing the cached `u` partitioning).
    * The seed list is bounded by construction (|seeds| literal rows),
    * so its broadcast is size-safe at any scale; candidate expansion
    * is two keyed equi-joins probing the cached edge frame; adjacency
    * exclusion is a LEFT ANTI against the seeds' OWN adjacency rows
    * (already bounded, never the full edge set); and per-seed top-k
    * runs through the bounded [[graft.functions.TopKAgg]] partial —
    * ≤ k rows per seed ever cross the final shuffle.
    *
    * Exactness: the center weight is the per-VALUE integer
    * `10¹² div lq(deg_w)` with `lq = floor(ln(deg)·10⁶)` — the q177
    * LQ quantization, identical on both engines because ln runs on
    * the exact integer degree; AA sums and ranks are integer; ties
    * resolve by the documented (aa desc, b asc) total order. A common
    * neighbor has ≥ 2 distinct neighbors by construction, so
    * lq ≥ 693147 — no zero division.
    */
  def adamicAdarSeeded(spark: SparkSession, d: String,
                       nSeeds: Int = 10, k: Int = 10): DataFrame = {
    import spark.implicits._
    val sym = graft.Derived.frame(s"copart-sym:$d") {
      val e = copartEdges(spark, d)
      val s0 = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      // adaptive pinned width: e is a materialized Derived frame, so
      // the union's estimate is 2x measured cache bytes — trustworthy
      graft.operators.Adaptive.byKey(s0)(s0, $"u")
    }
    // degree census reuses the cached u-partitioning — no exchange
    val deg = sym.groupBy($"u").agg(count(lit(1)).as("deg"))
    // deterministic seed set: the nSeeds smallest node ids present —
    // TakeOrderedAndProject, bounded by construction
    val seeds = sym.select($"u").distinct().orderBy($"u".asc).limit(nSeeds)
    val sa = sym.join(broadcast(seeds.withColumnRenamed("u", "a")),
        sym("u") === $"a")
      .select($"a", $"v".as("w"))
    // per-VALUE LQ weight of each wedge center
    val wWeight = sa.join(deg.select($"u".as("w"), $"deg"), "w")
      .select($"a", $"w",
        expr("1000000000000 div CAST(floor(ln(CAST(deg AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)").as("wt_q6"))
    val wedges = wWeight.join(sym.select($"u".as("w"), $"v".as("b")), "w")
      .filter($"b" =!= $"a")
    // registry-shared: the bounded (seed, candidate) score table is
    // consumed twice below (top-k + cn re-attach) and across bench
    // passes — one materialization, not a re-run of the expansion
    val scored = graft.Derived.frame(s"aa-scored:$d:n=$nSeeds") {
      wedges
        // link PREDICTION: drop pairs already adjacent — the seeds'
        // own (bounded) adjacency rows, not the full edge set
        .join(sa.select($"a", $"w".as("b")), Seq("a", "b"), "left_anti")
        .groupBy($"a", $"b")
        .agg(count(lit(1)).as("cn"), sum($"wt_q6").as("aa_q6"))
    }
    val topk = udaf(new graft.functions.TopKAgg(k))
    scored.groupBy($"a")
      .agg(topk($"aa_q6".cast("double"), $"b").as("top"))
      .select($"a", explode($"top").as("e"))
      .select($"a", $"e._2".as("b"), $"e._1".cast("long").as("aa_q6"))
      .join(scored.select($"a", $"b", $"cn"), Seq("a", "b"))
      .orderBy($"a", $"aa_q6".desc, $"b")
  }

  /** Link-prediction score panel over the co-purchase graph — the
    * two classic neighborhood indices [[adamicAdarSeeded]] does NOT
    * produce, from the same seeded wedge expansion: neighborhood
    * JACCARD `|Γa∩Γb| / |Γa∪Γb|` (degree-normalized — a hub's many
    * incidental co-neighbors stop dominating) and RESOURCE
    * ALLOCATION `Σ_w 1/deg(w)` (Zhou et al.'s harsher-than-AA
    * 1/deg damping, the strongest simple index on dense graphs).
    * Both are exact integer rationals here — no ln crosses an
    * engine — with the union size derived as deg(a)+deg(b)−cn.
    *
    * Scale shape: identical to the AA gear — seeds are a bounded
    * broadcast, the wedge fan-out is seed-adjacency-sized, the
    * candidate table is (seed × 2-hop)-bounded, and degrees attach
    * by equi-join on the registry-shared symmetric edge frame. Never
    * an all-pairs product.
    */
  def linkPredictionScores(spark: SparkSession, d: String,
                           nSeeds: Int = 10, k: Int = 10): DataFrame = {
    import spark.implicits._
    val sym = graft.Derived.frame(s"copart-sym:$d") {
      val e = copartEdges(spark, d)
      val s0 = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      // adaptive pinned width: e is a materialized Derived frame, so
      // the union's estimate is 2x measured cache bytes — trustworthy
      graft.operators.Adaptive.byKey(s0)(s0, $"u")
    }
    val deg = sym.groupBy($"u").agg(count(lit(1)).as("deg"))
    val seeds = sym.select($"u").distinct().orderBy($"u".asc).limit(nSeeds)
    val sa = sym.join(broadcast(seeds.withColumnRenamed("u", "a")),
        sym("u") === $"a")
      .select($"a", $"v".as("w"))
    // RA weight of each wedge center: 10⁶ div deg(w) — exact
    val wWeight = sa.join(deg.select($"u".as("w"), $"deg"), "w")
      .select($"a", $"w", expr("1000000 div deg").as("ra_wt"))
    val wedges = wWeight.join(sym.select($"u".as("w"), $"v".as("b")), "w")
      .filter($"b" =!= $"a")
    val cand = wedges
      .join(sa.select($"a", $"w".as("b")), Seq("a", "b"), "left_anti")
      .groupBy($"a", $"b")
      .agg(count(lit(1)).as("cn"), sum($"ra_wt").as("ra_q6"))
    val scored = cand
      .join(deg.select($"u".as("a"), $"deg".as("deg_a")), "a")
      .join(deg.select($"u".as("b"), $"deg".as("deg_b")), "b")
      .select($"a", $"b", $"cn", $"ra_q6",
        expr("CAST(cn * 1000000 div (deg_a + deg_b - cn) AS BIGINT)")
          .as("jaccard_q6"))
    scored
      .withColumn("rn", row_number().over(org.apache.spark.sql
        .expressions.Window.partitionBy($"a")
        .orderBy($"jaccard_q6".desc, $"b".asc)))
      .filter($"rn" <= k).drop("rn")
      .orderBy($"a", $"jaccard_q6".desc, $"b")
  }

  /** Degree assortativity of the trade graph — Newman's r: the
    * Pearson correlation of (deg(src), deg(dst)) over the directed
    * edge list. Negative r (hubs attach to leaves) is the topology
    * signature that decides whether hub-first sampling or skew
    * salting matters downstream; the one-number summary next to the
    * full [[degreeDistribution]] profile.
    *
    * Scale shape: degrees are ONE count agg over the registry-shared
    * edge frame (probing its src partitioning); the two re-attach
    * joins are unhinted — AQE broadcasts the |V|-row degree frame at
    * small scale, shuffles above (the q222 discipline). One 6-sum
    * global agg ends the volume work.
    *
    * Exactness: every sum is an exact integer staged DECIMAL(38,0)
    * with the cast inside the aggregate (deg² terms wrap int64 in
    * the billions-of-edges regime); r is a per-VALUE double over the
    * six exact integers with identical expression text on both
    * engines, floored to q6; a zero-variance side (regular graph)
    * returns NULL through the same guarded CASE on both engines.
    */
  def degreeAssortativity(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val edges = tradeEdges(spark, d)
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val j = edges
      .join(deg.select($"src", $"deg".as("x")), "src")
      .join(deg.select($"src".as("dst"), $"deg".as("y")), "dst")
    val varx = "CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    val vary = "CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)" +
      " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    j.agg(count(lit(1)).cast(dec).as("m"),
        sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
        sum($"x".cast(dec) * $"y".cast(dec)).as("sxy"),
        sum($"x".cast(dec) * $"x".cast(dec)).as("sxx"),
        sum($"y".cast(dec) * $"y".cast(dec)).as("syy"))
      .select(expr("CAST(m AS BIGINT)").as("n_edges"),
        expr("CAST(sx * 100 div m AS BIGINT)").as("mean_deg_q2"),
        expr(s"""CASE WHEN ($varx) <= 0 OR ($vary) <= 0 THEN NULL
          ELSE CAST(floor(((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (sqrt($varx) * sqrt($vary))) * 1000000.0) AS BIGINT)
          END""").as("r_q6"))
  }

  /** Katz centrality, `iters` synchronous rounds — the walk-counting
    * centrality that (unlike PageRank's degree-normalized flow)
    * rewards being reachable by MANY short paths: x ← 1 + α·Aᵀx with
    * attenuation α = 1/8 as an exact integer right-shift of the
    * neighbor sum, ranks at scale 10⁶. On the shared bipartite trade
    * graph ([[tradeEdges]] — both directions materialized, so Aᵀ
    * reads as the plain src→dst contribution join).
    *
    * Integer contract (the q95 discipline): per-round neighbor sums
    * stage DECIMAL(38,0) and the attenuation is one `div 8` — no
    * float enters, so engines agree bit-for-bit. Convergence needs
    * α < 1/λ_max; 1/8 is chosen against this graph's measured
    * spectral bound the way any production Katz run tunes α, and
    * the unrolled-round form makes the cost explicit: each round is
    * ONE hash-agg shuffle of (dst, partial) keyed by node plus a
    * |V|-row join — never a matrix materialization.
    */
  /** HyperBall neighborhood function (Boldi–Vigna): per-node
    * ball-size estimates |B(v, t)| for t = 1, 2 from per-node HLL
    * register sets that merge ALONG EDGES by register-wise max —
    * the sketch trick that turns all-pairs reachability counting
    * (quadratic, hopeless at scale) into `rounds` × one edge join
    * over |V|·64 register rows. The summed ball sizes ARE the
    * neighborhood function N(t) — the curve whose saturation point
    * is the graph's effective diameter.
    *
    * Registers are the deterministic q127 integer kernel seeded with
    * each node's own id, so the estimates are bit-identical across
    * engines and the oracle verifies the whole merge-then-estimate
    * path by value. Per round: one (src ⋈ registers) shuffle + one
    * (node, bucket) max-merge — never a frontier expansion per pair,
    * never data-sized driver state.
    */
  def hyperBall(spark: SparkSession, d: String,
                rounds: Int = 2): DataFrame = {
    import spark.implicits._
    val edges = tradeEdges(spark, d)
    val nodes = edges.select($"src".as("node")).distinct()
    var regs = graft.ext.Stats.hllRegistersOfCols(
      nodes.select($"node", $"node".as("k")), Seq("node"), "k")
    // each round's register table is MATERIALIZED and registry-owned
    // before anything consumes it (the pageRankOnEdges iteration
    // discipline): round t's estimate and round t+1's merge would
    // otherwise both re-derive the whole prefix lineage, and the
    // RETURNED plan's round-t branch would re-derive it a third time
    // at execution (measured: 10.8 s interleaved at sf0.1). The
    // frames are |V|·64 rows — domain-sized, never data-sized — and
    // [[graft.Derived.adopt]]'s semantic-hash slots keep repeated
    // bench passes from accumulating copies.
    // the register frame is |V|·64 three-long rows: under a measured
    // node gate it broadcasts into the edge probe, so no round
    // re-sorts the cached edge frame (the katz/hits move); above the
    // gate the keyed join below is unchanged
    val regsFit = graft.Derived.scalar(s"trade-nodes-n:$d")(
      nodes.count()) <= graft.ext.Graph.BroadcastAdjMaxEntries / 64
    def hinted(df: DataFrame): DataFrame =
      if (regsFit) broadcast(df) else df
    val out = (1 to rounds).map { t =>
      val in = edges.join(hinted(regs.withColumnRenamed("node", "src")),
          "src")
        .select($"dst".as("node"), $"bucket", $"mj")
      val merged = regs.unionByName(in)
        .groupBy($"node", $"bucket").agg(max($"mj").as("mj"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      merged.count()
      graft.Derived.adopt(merged)
      regs = merged
      graft.ext.Stats.hllEstimateCols(regs, Seq("node"))
        .select($"node", expr("CAST(floor(est + 0.5d) AS BIGINT)")
          .as("ball"))
        .agg(count(lit(1)).as("n_nodes"),
          sum($"ball").as("sum_ball_est"),
          expr("CAST(sum(ball) * 1000000 div count(1) AS BIGINT)")
            .as("avg_ball_q6"))
        .select(lit(t).as("t"), $"n_nodes", $"sum_ball_est",
          $"avg_ball_q6")
    }
    out.reduce(_ unionByName _).orderBy($"t")
  }

  def katzCentrality(spark: SparkSession, d: String,
                     iters: Int = 3,
                     maxBroadcastNodes: Long = BroadcastAdjMaxEntries): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val edges = tradeEdges(spark, d)
    // the node domain feeds every round — derive it ONCE as a flat
    // leaf instead of re-running the |E|-row distinct per round
    val nodes = edges.select($"src".as("node")).distinct()
      .localCheckpoint(false)
    // The per-round score/contribution frames are |V|-row — hinting
    // them into the cached edge probe avoids re-sorting the |E|-row
    // edge frame each round (measured ~3x pageRank's task time per
    // iteration as an SMJ), but |V| is scale-proportional and a hint
    // never auto-falls-back. Measured gate (memoized node count, the
    // hyperBall discipline): above the budget both joins stay keyed
    // shuffles, exactly the pre-hint shape.
    val scoresFit = graft.Derived.scalar(s"trade-nodes-n:$d")(
      nodes.count()) <= maxBroadcastNodes
    def hinted(df: DataFrame): DataFrame =
      if (scoresFit) broadcast(df) else df
    var x = nodes.withColumn("x", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(hinted(x.withColumnRenamed("node", "src")), "src")
        .groupBy($"dst").agg(sum($"x".cast(dec)).as("sx"))
      x = nodes
        .join(hinted(contrib.withColumnRenamed("dst", "node")),
          Seq("node"), "left")
        .select($"node",
          (lit(1000000L) + expr("coalesce(sx, 0) div 8").cast("long"))
            .as("x"))
    }
    x.select(
        when($"node" % 2 === 0, lit("cust")).otherwise(lit("supp"))
          .as("kind"),
        expr("node div 2").as("entity_id"), $"x".as("katz_q6"))
      .orderBy($"kind", $"entity_id")
  }

  /** Sampled Brandes betweenness over the co-purchase graph — the
    * brokerage centrality the degree/PageRank/HITS family cannot
    * see (a low-degree node on the only path between two clusters is
    * invisible to all of them and is exactly what betweenness
    * ranks). Exact betweenness is O(V·E); the standard estimator
    * (Brandes–Pich) runs the dependency accumulation from a SAMPLE
    * of sources — here the `nSeeds` smallest node ids (deterministic
    * — the q226 seed discipline), each contributing its full
    * Brandes dependency:
    *
    *  - forward: BFS from each seed with per-node shortest-path
    *    counts σ (one frontier⋈edges join + one (seed, node) agg per
    *    level, levels bounded by `horizon` — a TRUNCATED-at-horizon
    *    betweenness, stated, the q202 temporal-reachability move);
    *  - backward: δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w)·(1 + δ(w)),
    *    accumulated level-by-level from the deepest frontier in — at
    *    q6 with per-TERM integer division (`σ_v·(10⁶+δ_w) div σ_w`),
    *    so the cascade is deterministic integer arithmetic the
    *    oracle replays level-for-level, never a floating fold.
    *
    * Scale shape: every step is a frontier-sized equi-join keyed on
    * the node (the registry-shared symmetric edge frame is
    * pre-partitioned on u) plus a (seed, node)-keyed aggregate;
    * per-level frames eagerly `localCheckpoint` — each level is
    * referenced twice (the frontier and the `all` anti-join), so a
    * lazy lineage would compound exponentially with the level count.
    * Nothing is all-pairs; σ and the q6 δ terms are
    * BIGINT-bounded at horizon 6 on this graph (σ < 2⁴⁰ measured;
    * a 10⁹-node deployment would stage δ DECIMAL(38,0)).
    */
  /** Seeded BFS with per-node shortest-path counts σ over the
    * co-purchase graph — the forward half shared by
    * [[betweennessSampled]] and [[harmonicCloseness]]: (seed, node,
    * dist, sigma) for every node within `horizon` of each of the
    * `nSeeds` smallest node ids. Per-level eager `localCheckpoint` —
    * the loop's frames reference each other twice (frontier + the
    * `all` anti-join), so lazy persist compounds the logical plan
    * exponentially with the level count; the flat checkpointed leaf
    * is the katz/pagerank loop discipline. */
  private def seededBfs(spark: SparkSession, d: String, nSeeds: Int,
                        horizon: Int): DataFrame =
    // registry-shared: betweenness (q304) and harmonic closeness
    // (q312) ride the SAME frontier expansion — one session pays the
    // level loop once, every consumer reads the cached (seed, node,
    // dist, sigma) frame
    graft.Derived.frame(s"seeded-bfs:$d:$nSeeds:$horizon") {
      seededBfsBuild(spark, d, nSeeds, horizon)
    }

  private def seededBfsBuild(spark: SparkSession, d: String, nSeeds: Int,
                             horizon: Int): DataFrame = {
    import spark.implicits._
    val sym = graft.Derived.frame(s"copart-sym:$d") {
      val e = copartEdges(spark, d)
      val s0 = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      // adaptive pinned width: e is a materialized Derived frame, so
      // the union's estimate is 2x measured cache bytes — trustworthy
      graft.operators.Adaptive.byKey(s0)(s0, $"u")
    }
    val seeds = sym.select($"u").distinct().orderBy($"u".asc).limit(nSeeds)
    // the frontier/visited frames are ≤ nSeeds·|V| rows of four longs:
    // under the measured labelPropagation gate they broadcast into the
    // edge probe, so no level shuffles the cached edge frame (each
    // level's SMJ cost ~5 AQE stage jobs for frontier-sized data);
    // above the gate the keyed-shuffle path is unchanged
    val fits = graft.Derived.scalar(s"copart-nodes-n:$d")(
      sym.select("u").distinct().count()) <=
      BroadcastAdjMaxEntries / nSeeds.max(1)
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var level = seeds
      .select($"u".as("seed"), $"u".as("node"),
        lit(0).as("dist"), lit(1L).as("sigma"))
      .localCheckpoint()
    var all = level
    for (l <- 1 to horizon) {
      // fresh column names per hop: the same edge frame re-joins at
      // every level and Spark's self-join ambiguity check (rightly)
      // rejects a repeated bare `sym`
      val hop = sym.toDF("eu", "ev")
      val next = hinted(level).join(hop, level("node") === hop("eu"))
        .select($"seed", $"ev".as("node2"), $"sigma")
        .join(hinted(all.select($"seed".as("s2"), $"node")),
          $"seed" === $"s2" && $"node2" === $"node", "left_anti")
        .groupBy($"seed", $"node2")
        .agg(sum($"sigma").as("sigma"))
        .select($"seed", $"node2".as("node"), lit(l).as("dist"), $"sigma")
        // tiny frontier frames: 8 partitions cut the per-round
        // materialization barrier cost (13 rounds of 32 near-empty
        // tasks measured as the query's dominant fixed cost)
        .coalesce(8)
        // LAZY checkpoint: the plan truncation (what kills the
        // two-consumer exponential) happens at creation either way;
        // lazy folds the blocks' materialization into the next
        // level's job instead of a dedicated barrier per hop
        .localCheckpoint(false)
      all = all.unionByName(next)
      level = next
    }
    all
  }

  /** Harmonic closeness of the BFS seeds — `H(s) = Σ_{v≠s} 1/d(s,v)`
    * truncated at `horizon` (unreached nodes contribute their true 0,
    * the property that makes the harmonic form the right closeness on
    * disconnected graphs — Boldi–Vigna). Rides [[seededBfs]]'s
    * frontier machinery; the per-distance reciprocal is quantized
    * once (`10⁶ div d`) and multiplied by the level's node count, so
    * the score is an exact integer the oracle replays level-for-level.
    */
  def harmonicCloseness(spark: SparkSession, d: String, nSeeds: Int = 5,
                        horizon: Int = 6): DataFrame = {
    import spark.implicits._
    seededBfs(spark, d, nSeeds, horizon)
      .filter($"dist" > 0)
      .groupBy($"seed", $"dist").agg(count(lit(1)).as("n_at"))
      .groupBy($"seed")
      .agg(sum($"n_at").as("n_reached"),
        sum(expr("n_at * (1000000 div dist)")).as("harm_q6"))
      .orderBy($"seed")
  }

  def betweennessSampled(spark: SparkSession, d: String, nSeeds: Int = 5,
                         horizon: Int = 6, k: Int = 20): DataFrame = {
    import spark.implicits._
    val all = seededBfs(spark, d, nSeeds, horizon)
    val sym = graft.Derived.frame(s"copart-sym:$d") {
      val e = copartEdges(spark, d)
      val s0 = e.select($"a".as("u"), $"b".as("v"))
        .unionAll(e.select($"b".as("u"), $"a".as("v")))
      // adaptive pinned width: e is a materialized Derived frame, so
      // the union's estimate is 2x measured cache bytes — trustworthy
      graft.operators.Adaptive.byKey(s0)(s0, $"u")
    }
    // backward: δ at the deepest level is 0; each shallower level
    // folds its successors' (1 + δ) through the σ ratio at q6
    // per-level frames are ≤ nSeeds·|V| rows — under the seededBfs
    // gate they broadcast into the edge probe (see seededBfsBuild)
    val fits = graft.Derived.scalar(s"copart-nodes-n:$d")(
      sym.select("u").distinct().count()) <=
      BroadcastAdjMaxEntries / nSeeds.max(1)
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var deltaAbove = all.filter($"dist" === horizon)
      .select($"seed", $"node".as("w"), $"sigma".as("sigma_w"),
        lit(0L).as("delta_q6"))
    val deltas = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (l <- (horizon - 1) to 0 by -1) {
      val curr = all.filter($"dist" === l)
        .select($"seed", $"node", $"sigma")
      val hop = sym.toDF("eu", "ev")
      val terms = hinted(curr).join(hop, curr("node") === hop("eu"))
        .select($"seed", $"node", $"sigma", $"ev".as("w"))
        .join(hinted(deltaAbove), Seq("seed", "w"))
        .select($"seed", $"node",
          expr("sigma * (1000000 + delta_q6) div sigma_w").as("t_q6"))
        .groupBy($"seed", $"node").agg(sum($"t_q6").as("delta_q6"))
      // eager checkpoint: dl has TWO consumers (the next round's
      // deltaAbove and the final union), so an unmaterialized chain
      // recomputes 2^h-fold at execution (measured 2x wall on h=6)
      val dl = curr.join(hinted(terms), Seq("seed", "node"), "left")
        .select($"seed", $"node", $"sigma",
          coalesce($"delta_q6", lit(0L)).as("delta_q6"))
        .coalesce(8)
        // lazy: same flat leaf (both consumers read cached blocks),
        // no per-level blocking job (see seededBfsBuild note)
        .localCheckpoint(false)
      deltas += dl.withColumn("dist", lit(l))
      deltaAbove = dl.select($"seed", $"node".as("w"),
        $"sigma".as("sigma_w"), $"delta_q6")
    }
    // a seed's own δ is bookkeeping, not brokerage — Brandes excludes
    // the source from its own accumulation
    deltas.reduce(_ unionByName _)
      .filter($"dist" > 0)
      .groupBy($"node")
      .agg(sum($"delta_q6").as("bc_q6"), count(lit(1)).as("n_seeds_seen"))
      .orderBy($"bc_q6".desc, $"node".asc)
      .limit(k)
  }

  /** Pointer-jumping (path-doubling) cycle decomposition of a
    * FUNCTIONAL graph — every node has exactly one successor, so
    * components are ρ-shapes (a tail draining into a cycle): hash
    * chains, retry/redirect maps, `succ = f(node)` iteration graphs.
    * The classic PRAM primitive: after round k each node carries
    * `p = f^(2^k)(node)` and `m = min of the first 2^k nodes on its
    * path`, maintained by ONE self-equi-join per round
    * (`p' = p(p)`, `m' = min(m, m(p))`) — O(log n) rounds total
    * where naive following needs O(cycle + tail) sequential steps.
    * With 2^r ≥ n: `p` lands on the cycle, so the cycle's canonical
    * id is `m` EVALUATED AT the landing node (its first 2^r path
    * nodes are all cycle nodes — min over the cycle, uncontaminated
    * by tail ids), and the cycle membership set is exactly image(p).
    *
    * Scale shape: each round is one key-partitioned self-join —
    * O(n) rows shuffled per round, O(n log n) total, no unbounded
    * state; `localCheckpoint` per round keeps the doubled lineage
    * flat (the q128/q304 loop discipline). Everything is integer and
    * deterministic, so the unrolled DuckDB twin replays it exactly.
    */
  private[graft] def pointerJumpCycles(f: DataFrame,
                                       rounds: Int): DataFrame = {
    val spark = f.sparkSession
    import spark.implicits._
    var st = f.select($"v", $"succ".as("p"), $"v".as("m"))
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      // the self-join's probe side keeps its layout; the build side is
      // an |n|-row frame of three longs off a stats-less checkpoint —
      // hint it broadcast so each round is one broadcast build + one
      // narrow job instead of a 3-stage SMJ (the kTruss dHint move)
      val other = st.select($"v".as("v2"), $"p".as("p2"), $"m".as("m2"))
      val next = st.join(broadcast(other), $"p" === $"v2")
        .select($"v", $"p2".as("p"), least($"m", $"m2").as("m"))
        .localCheckpoint() // eager — materialized before freeing prev
      st.unpersist()
      st = next
    }
    val landed = st.select($"v", $"p")
      .join(st.select($"v".as("w"), $"m".as("cyc")), $"p" === $"w")
      .select($"v", $"cyc")
    val img = st.select($"p".as("v")).distinct()
      .withColumn("on_cycle", lit(1L))
    // the final checkpoint stays referenced by the returned (lazy)
    // frame; the ContextCleaner reclaims it once consumed
    landed.join(img, Seq("v"), "left")
      .groupBy($"cyc".as("cycle_id"))
      .agg(sum(coalesce($"on_cycle", lit(0L))).as("cycle_len"),
        count(lit(1)).as("comp_size"))
      .orderBy($"cycle_id")
  }

  /** Tail distances (list ranking) on a functional graph — the
    * second PRAM primitive riding the [[pointerJumpCycles]] doubling
    * ladder: how many `succ` steps does each node take to REACH its
    * cycle? Sequential following is O(tail) per node; here the
    * doubling levels `p_k = f^(2^k)` are built once (O(log n)
    * self-joins) and each node BINARY-DESCENDS them: from the top
    * level down, take the 2^k-jump iff the landing node is still off
    * the cycle — "f^j(v) is off-cycle" is a prefix property in j, so
    * the greedy descent finds the last off-cycle index exactly, and
    * the tail distance is that index + 1 (0 for cycle nodes). Total
    * work O(n log n), O(log n) rounds — the textbook list-ranking
    * bound, with every round a key-partitioned join.
    *
    * Output is the bounded tail-length histogram (dist, n_nodes) —
    * the ρ-shape profile of the map (dist 0 = cycle mass).
    */
  private[graft] def tailDistances(f: DataFrame,
                                   rounds: Int): DataFrame = {
    val spark = f.sparkSession
    import spark.implicits._
    // doubling ladder, head = level `rounds`
    var levels: List[DataFrame] =
      List(f.select($"v", $"succ".as("p")).localCheckpoint())
    (1 to rounds).foreach { _ =>
      val prev = levels.head
      levels ::= prev
        .join(broadcast(prev.select($"v".as("v2"), $"p".as("p2"))),
          $"p" === $"v2")
        .select($"v", $"p2".as("p")).localCheckpoint()
    }
    val cyc = levels.head.select($"p".as("v")).distinct()
      .withColumn("onc", lit(1)).localCheckpoint()
    // descend levels rounds−1 … 0 (levels.tail, head-first is the
    // HIGHEST of those). The descent chain references each frame ONCE
    // per round, so its lineage is LINEAR — built lazily it runs as a
    // single job, where the previous per-round eager localCheckpoint
    // bought nothing (no frame is read twice) and cost ~5 AQE stage
    // jobs per round (measured: this lane ran 128 jobs for 4096 rows,
    // ~90% of its wall time pure per-job floor). The ladder levels
    // above DO stay checkpointed: each is read twice (next level +
    // descent), and the self-join doubling would compound
    // exponentially without the flat leaf. Checkpointed levels carry
    // no stats, so without a hint every descent join planned as a
    // 3-stage SMJ; the levels are |nodes|-row frames of two longs —
    // broadcast them (the kTruss dHint discipline; at this lane's
    // fixed n=4096 that is ~64 KB a side).
    var st = f.select($"v")
      .join(broadcast(cyc), Seq("v"), "left")
      .select($"v", $"v".as("cur"), lit(0L).as("dist"),
        coalesce($"onc", lit(0)).as("done"))
    levels.tail.zipWithIndex.foreach { case (lvl, i) =>
      val k = rounds - 1 - i
      st = st
        .join(broadcast(lvl.select($"v".as("cur"), $"p".as("tgt"))),
          Seq("cur"))
        .join(broadcast(cyc.select($"v".as("tgt"), $"onc".as("tonc"))),
          Seq("tgt"), "left")
        .select($"v",
          when($"done" === 1 || coalesce($"tonc", lit(0)) === 1, $"cur")
            .otherwise($"tgt").as("cur"),
          when($"done" === 1 || coalesce($"tonc", lit(0)) === 1, $"dist")
            .otherwise($"dist" + lit(1L << k)).as("dist"),
          $"done")
    }
    st.select($"v",
        when($"done" === 1, lit(0L)).otherwise($"dist" + 1L).as("dist"))
      .groupBy($"dist")
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy($"dist")
  }

  /** [[tailDistances]] over the q336 hash-successor map — same
    * fixed-n deterministic graph, so the histogram is closed-form
    * oracle-checkable (the oracle follows each tail with a recursive
    * CTE; the engine never does). */
  def hashChainTails(spark: SparkSession, d: String,
                     n: Int = 4096): DataFrame = {
    import spark.implicits._
    val rounds = 64 - java.lang.Long.numberOfLeadingZeros(n.toLong - 1)
    val f = spark.read.format("graft.sources.GenSource")
      .option("rows", n.toString).option("parts", "8").load()
      .select($"id".as("v"),
        expr(s"(id % 2147483647) * 2654435761 % 2147483647 % $n")
          .as("succ"))
    tailDistances(f, rounds.toInt)
  }

  /** [[pointerJumpCycles]] over the deterministic hash-successor map
    * `succ(v) = h(v) mod n` on `n` generator ids — non-bijective, so
    * the graph has genuine tails and multiple cycles; n is fixed
    * (scale-invariant output) and every value is a closed form the
    * oracle replays. */
  def hashChainCycles(spark: SparkSession, d: String,
                      n: Int = 4096): DataFrame = {
    import spark.implicits._
    val rounds = 64 - java.lang.Long.numberOfLeadingZeros(n.toLong - 1)
    val f = spark.read.format("graft.sources.GenSource")
      .option("rows", n.toString).option("parts", "8").load()
      .select($"id".as("v"),
        expr(s"(id % 2147483647) * 2654435761 % 2147483647 % $n")
          .as("succ"))
    pointerJumpCycles(f, rounds.toInt)
  }
}
