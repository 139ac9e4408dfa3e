package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-sequence analytics over the `events` stream: funnel
  * conversion, cohort retention, Markov transition matrices, and
  * frequent path mining — the behavioral layer of the reference's
  * analytics surface (its `ratings` fact is the same (user, item,
  * ts) event shape; `etl_pipeline_spark.py` stops at per-day
  * aggregates, these are the sequence-aware queries above them).
  */
object Behavior {

  /** Three-stage funnel (view → click → purchase) with min-timestamp
    * ordering semantics: a user converts a stage when their earliest
    * event of each later stage is at-or-after the earliest event of
    * every earlier one. One hash-agg per user (conditional mins are
    * algebraic — map-side partials shrink each task's events before
    * the shuffle), then a single global roll-up row. No window, no
    * sort, no per-user state: at 100 TB this is one shuffle of
    * 3 timestamps per user.
    */
  def funnel(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val stage = stageMins(Tables.events(spark, d))
    stage.agg(
      count(lit(1)).as("n_users"),
      sum(when($"t_view".isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when($"t_view" <= $"t_click", 1L).otherwise(0L)).as("n_click"),
      sum(when($"t_view" <= $"t_click" && $"t_click" <= $"t_buy", 1L)
        .otherwise(0L)).as("n_purchase"))
  }

  /** Per-user earliest timestamp of each funnel stage — conditional
    * mins are algebraic, so this exact frame also runs as a
    * Structured Streaming stateful aggregation
    * ([[graft.streaming.EventStream.funnelStages]]): the engine keeps
    * three timestamps per user and folds each micro-batch in.
    */
  private[graft] def stageMins(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("t_view"),
        min(when($"event_type" === "click", $"ts")).as("t_click"),
        min(when($"event_type" === "purchase", $"ts")).as("t_buy"))
  }

  /** Weekly cohort retention: users are assigned to the week of
    * their first event (weeks = whole 7-day buckets from a fixed
    * epoch, pure integer date math — no engine-specific
    * week-truncation semantics), and each (cohort week, weeks-since)
    * cell counts the distinct users active then. Shape: one per-user
    * min agg, one distinct over (user, week) — both algebraic — and
    * a final small matrix agg; the events table is scanned once.
    */
  def cohortRetention(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val wk = Tables.events(spark, d)
      .select($"user_id",
        expr("datediff(CAST(ts AS DATE), DATE'2024-01-01') div 7").as("wk"))
    val cohort = wk.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    wk.distinct()
      .join(cohort, "user_id")
      .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .select($"cohort_wk".cast("int").as("cohort_wk"),
        $"week_offset".cast("int").as("week_offset"), $"n_users")
      .orderBy($"cohort_wk", $"week_offset")
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: `lead` pairs consecutive event types (total order by
    * (ts, event_id) — the unique id breaks timestamp ties so the
    * successor is well-defined under any partitioning), then one
    * count agg per (from, to) and a per-from total for the
    * transition probability, emitted as the exact integer
    * `(n·10⁶) div total` (the q84 order-independence recipe).
    * Shape: one shuffle by user for the window, one tiny 25-row agg.
    */
  def markovTransitions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.events(spark, d)
      .select($"user_id", $"ts", $"event_id",
        $"event_type".as("from_type"))
      .withColumn("to_type", lead($"from_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).as("n_trans"))
    val totals = trans.groupBy($"from_type")
      .agg(sum($"n_trans").as("n_from"))
    trans.join(totals, "from_type")
      .select($"from_type", $"to_type", $"n_trans",
        expr("(n_trans * 1000000) div n_from").as("p_micro"))
      .orderBy($"from_type", $"to_type")
  }

  /** Frequent session-opening paths: each user's first five event
    * types (by (ts, event_id)) joined into a `a>b>c` path string,
    * counted, top 20 by frequency (path string breaks count ties so
    * the cut is total). The per-user sequence is assembled with
    * `collect_list(struct)` + `array_sort` — an agg, not a window,
    * so partial lists combine map-side; the final top-k is a
    * TakeOrderedAndProject, never a full sort at scale.
    */
  def topPaths(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"ts", $"event_id", $"event_type")))
        .as("seq"))
      .select(concat_ws(">",
        slice(expr("transform(seq, x -> x.event_type)"), 1, 5)).as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n_users"))
      .orderBy($"n_users".desc, $"path")
      .limit(20)
  }

  /** Linear multi-touch attribution with EXACT penny allocation —
    * every purchase splits its cents equally across the user's
    * clicks in the preceding hour, and the integer remainder goes to
    * the EARLIEST clicks (largest-remainder / Hamilton rounding with
    * a deterministic order), so credits conserve money to the cent:
    * per purchase, Σ credits = cents, always — the property float
    * splits can't give and finance reconciliation demands. q141 is
    * the last-touch policy; this is the linear one.
    *
    * Join shape: a point-in-interval join, fragmented like q154 but
    * one-sided — only the purchase's [p_ts−1h, p_ts] window
    * fragments into its ≤2 hour cells; a click is a point in exactly
    * ONE cell, so the (user, cell) equi-join meets every qualifying
    * pair exactly once with no dedup step. Per-purchase work
    * (count + rank windows keyed by the purchase id) is bounded by
    * clicks-per-user-hour, never by totals.
    */
  def multiTouchAttribution(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val hourUs = 3600000000L
    val ev = Tables.events(spark, d)
    val p = ev.filter($"event_type" === "purchase" && $"value".isNotNull)
      .select($"user_id", unix_micros($"ts").as("p_ts"),
        $"event_id".as("p_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .withColumn("cell", explode(sequence(
        expr(s"(p_ts - $hourUs) div $hourUs"), expr(s"p_ts div $hourUs"))))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("c_ts"),
        $"event_id".as("c_id"))
      .withColumn("cell", expr(s"c_ts div $hourUs"))
    val pairs = p.join(c, Seq("user_id", "cell"))
      .filter($"c_ts" >= $"p_ts" - hourUs && $"c_ts" <= $"p_ts")
    val byP = Window.partitionBy($"p_id")
    val credited = pairs
      .withColumn("k", count(lit(1)).over(byP))
      .withColumn("rn",
        row_number().over(byP.orderBy($"c_ts", $"c_id")))
      .withColumn("credit", expr("cents div k") +
        when($"rn" <= expr("cents % k"), 1L).otherwise(0L))
    credited
      .groupBy(expr(s"c_ts div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_credits"), sum($"credit").as("credited_cents"))
      .orderBy($"day")
  }

  /** Market-basket association rules over order baskets (the A-priori
    * support/confidence/lift census at pair depth): for each directed
    * part pair a→b with pair support ≥ `minSup`, confidence
    * P(b | a) and lift P(ab)/(P(a)P(b)).
    *
    * Scale shape: the pair generator is BASKET-KEYED — each order
    * self-joins only with itself, so a basket of m items yields
    * C(m,2) pairs (m is bounded by order size, ~7 here), never a
    * corpus-level cross join (the q147 tokenPmi discipline). Single-
    * item supports are one map-side-combinable groupBy; the rule
    * table after the `minSup` cut is association-structure-sized, not
    * data-sized, and the support joins against it are tiny.
    *
    * Exactness: confidence and lift are staged DECIMAL(38,0)
    * divisions on exact integer counts — order-independent, no
    * doubles anywhere.
    */
  def assocRules(spark: SparkSession, d: String,
                 minSup: Long = 3L): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    // shared with the co-purchase graph family (q118/q128/q172): one
    // cached distinct feeds both pair generators
    val items = Graph.basketItems(spark, d)
    val nBaskets = items.select($"ok").distinct().count()
    val singles = items.groupBy($"p").agg(count(lit(1)).as("c"))
    // registry-shared with the weighted co-purchase edge frame (q186)
    val pairs = Graph.pairCounts(spark, d)
      .withColumnRenamed("cnt", "c_ab")
      .filter($"c_ab" >= minSup)
    val directed = pairs.select($"a".as("ante"), $"b".as("cons"), $"c_ab")
      .unionAll(pairs.select($"b".as("ante"), $"a".as("cons"), $"c_ab"))
    directed
      .join(singles.toDF("ante", "c_a"), "ante")
      .join(singles.toDF("cons", "c_b"), "cons")
      .select($"ante", $"cons", $"c_ab", $"c_a", $"c_b",
        expr(s"CAST((CAST(c_ab AS $dec) * 1000000) div c_a AS BIGINT)")
          .as("conf_q6"),
        expr(s"CAST((CAST(c_ab AS $dec) * $nBaskets * 1000000)" +
          s" div (CAST(c_a AS $dec) * c_b) AS BIGINT)").as("lift_q6"))
      .orderBy($"ante", $"cons")
  }

  /** Inter-arrival burstiness per user — the bot/scraper screen over
    * an event stream: a user whose gap sizes vary far more than a
    * Poisson process (CV² ≫ 1) is bursty automation or sessionized
    * replay; CV² ≈ 1 is memoryless arrival; CV² ≈ 0 is a metronome
    * (cron traffic). Reported as the exact rational
    * CV² = n·Σg²/(Σg)² − 1 in q6 units (the identity
    * E[g²]/E[g]² = 1 + CV² makes the subtraction exact) — no square
    * roots, no floats:
    * gap sums in µs and squared sums in DECIMAL(38,0) (a month-long
    * gap squares past int64 — the q165 staging rule).
    *
    * Scale shape: ONE lag window keyed per user (never a global
    * order), one map-side-combinable per-user aggregate; users below
    * `minEvents` or with a zero span (all events simultaneous) are
    * filtered before any division.
    */
  def burstiness(spark: SparkSession, d: String,
                 minEvents: Int = 3): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    Tables.events(spark, d)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      // compute-width pin: AQE's byte-based coalescing squeezed this
      // lag-window + DECIMAL(38) aggregate onto ~5 ~1MB partitions and
      // one task carried the lane (guide §2.5 input-skew remedy —
      // explicit user-keyed fan-out; the window reuses the
      // partitioning, so this replaces the exchange rather than adding
      // one)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        $"user_id")
      .withColumn("pus", lag($"us", 1).over(w))
      .filter($"pus".isNotNull)
      .select($"user_id", ($"us" - $"pus").as("g"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"), sum($"g").as("span_us"),
        sum($"g".cast(dec) * $"g").as("g2"))
      .filter($"n_gaps" >= minEvents - 1 && $"span_us" > 0)
      .select($"user_id", $"n_gaps", $"span_us",
        (expr(s"CAST((CAST(n_gaps AS $dec) * g2 * 1000000)" +
          s" div (CAST(span_us AS $dec) * span_us) AS BIGINT)")
          - 1000000L).as("cv2_q6"))
      .orderBy($"user_id")
  }

  /** Seasonal decomposition (STL-lite) of the daily event-value
    * series: trend = 7-day centered moving average, weekday seasonal
    * index = weekday mean ÷ global mean, residual = value − trend —
    * the anomaly screen that doesn't false-alarm on weekends.
    *
    * Exactness: per-row cents quantization BEFORE the daily sum (a
    * raw double sum is partition-order dependent), so daily totals,
    * the trend `sum7 div 7`, and residuals are pure integers; the
    * seasonal index is one positive q6 division of integer means
    * (negative event values are excluded on both engines — the q193
    * div-parity discipline). Weekday = `datediff(day, epoch) % 7` —
    * integer arithmetic, immune to the engine weekday-numbering
    * divergences the DateDim scaladoc documents.
    *
    * Scale shape: ONE map-side-combinable daily agg is the only
    * volume-sized work; the trend window, weekday means, and global
    * mean all run on the bounded DAY domain (the q178 pattern —
    * windows over domain tables, never over the fact). Edge days
    * without a full 7-day window are dropped (count == 7), not
    * padded.
    */
  def seasonalDecomposition(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val daily = graft.sources.Tables.events(spark, d)
      .filter($"value".isNotNull && $"value" >= 0)
      .select(to_date($"ts").as("day"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v"))
      .groupBy($"day").agg(sum($"v").as("v"))
    // bounded day domain from here down
    val w7 = Window.orderBy($"day").rowsBetween(-3, 3)
    val withTrend = daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("sum7", sum($"v").over(w7))
      .filter($"n7" === 7)
      .select($"day", $"v", expr("sum7 div 7").as("trend"),
        expr("CAST(datediff(day, DATE'1995-01-01') % 7 AS BIGINT)")
          .as("wd"))
    val wdMeans = withTrend.groupBy($"wd")
      .agg(sum($"v").as("sv"), count(lit(1)).as("nd"))
    val g = withTrend.agg(sum($"v").as("gv"), count(lit(1)).as("gn"))
    withTrend
      .join(broadcast(wdMeans), "wd")
      .crossJoin(broadcast(g))
      .select($"day", $"v", $"trend", $"wd",
        // sv·gn·10⁶ ~ (total cents)·days·10⁶ outgrows int64 at scale:
        // DECIMAL(38,0) staging, single positive division
        expr("CAST((CAST(sv AS DECIMAL(38,0)) * gn * 1000000)" +
          " div (CAST(nd AS DECIMAL(38,0)) * gv) AS BIGINT)")
          .as("season_idx_q6"),
        ($"v" - $"trend").as("resid"))
      .orderBy($"day")
  }

  /** RFM segmentation — the classic recency/frequency/monetary
    * customer partitioning: per purchasing user, days since last
    * purchase (R), purchase count (F) and cents total (M), each
    * scored into quintiles 1–5 (5 best: most recent, most frequent,
    * highest spend), rolled up to the 125-cell RFM-code domain. The
    * behavioral sibling of [[cohortRetention]]: cohorts slice by
    * arrival time, RFM by engagement shape.
    *
    * Scale shape — the q205/q241 discipline: each quintile is
    * `((rank−1)·5) div n + 1` over ONE zero-shuffle
    * [[graft.operators.GlobalIndex]] ranking in a total order
    * (`ROW_NUMBER` without a partition key would funnel all users
    * through one reducer; the oracle uses exactly that window and
    * the hash gate proves equivalence). Three rankings over the
    * user-grain frame, n and the clock attach broadcast, then ONE
    * agg to the bounded 125-row domain.
    *
    * Exactness: all-integer — R in whole days via `div 86400·10⁶`
    * of exact microsecond stamps (the corpus max stands in for
    * "now", so the result is reproducible), quintile arithmetic
    * exact, M in cents.
    */
  def rfmSegments(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val users = Tables.events(spark, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull
        && $"value" >= 0)
      .groupBy($"user_id")
      .agg(max(unix_micros($"ts")).as("last_us"),
        count(lit(1)).as("f"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("m"))
    val clock = users.agg(max($"last_us").as("now_us"),
      count(lit(1)).as("n"))
    val base = users.crossJoin(broadcast(clock))
      .withColumn("r_days", expr("(now_us - last_us) div 86400000000"))
      .select($"user_id", $"r_days", $"f", $"m", $"n")
    def quintile(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                 score: String): DataFrame =
      graft.operators.GlobalIndex.withRowNumber(df, order, "__r")
        .withColumn(score, expr("((__r - 1) * 5) div n + 1"))
        .drop("__r")
    val scored = quintile(quintile(quintile(base,
      Seq($"r_days".desc, $"user_id".asc), "rs"),
      Seq($"f".asc, $"user_id".asc), "fs"),
      Seq($"m".asc, $"user_id".asc), "ms")
    scored.groupBy(($"rs" * 100 + $"fs" * 10 + $"ms").as("rfm_code"))
      .agg(count(lit(1)).as("n_users"), sum($"m").as("sum_cents"))
      .orderBy($"rfm_code")
  }

  /** EXACT Shapley channel attribution — the coalition-game upgrade
    * of the path heuristics ([[multiTouchAttribution]] splits within
    * one path; last-touch q141 ignores coalitions entirely): each
    * non-purchase channel's Shapley value over the 2⁴ exposure
    * coalitions, with the characteristic function v(S) = conversion
    * rate of users whose distinct-channel exposure set is exactly S.
    * Because the channel domain is FIXED (k = 4), the 2^k subset
    * lattice is a 16-row table and Shapley is exact — no sampling,
    * no permutation Monte Carlo.
    *
    * Exactness: all-integer — v is an exact rational at q6; weights
    * are scaled by k! = 24 (`|S|!·(k−|S|−1)!` ∈ {6,2,2,6}), so
    * `phi24_q6 = Σ_S w·(v(S∪i) − v(S))` is an exact signed integer
    * and `phi_q6` its single 10⁹-shift division by 24. An UNOBSERVED
    * coalition takes v = 0 (the pessimistic prior; its n_users = 0 is
    * visible in the v table so the caller can judge support).
    *
    * Scale shape: ONE per-user conditional-max agg (map-side
    * combinable) + ONE 16-row mask agg end the volume work; the
    * subset lattice, the bit-shift join and the per-channel rollup
    * all live on ≤ 64 rows.
    */
  def shapleyAttribution(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val users = Tables.events(spark, d).groupBy($"user_id").agg(
      (max(when($"event_type" === "click", 1L).otherwise(0L))
        + max(when($"event_type" === "error", 1L).otherwise(0L)) * 2L
        + max(when($"event_type" === "signup", 1L).otherwise(0L)) * 4L
        + max(when($"event_type" === "view", 1L).otherwise(0L)) * 8L)
        .as("mask"),
      max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
    val observed = users.groupBy($"mask")
      .agg(count(lit(1)).as("n_users"), sum($"y").as("n_conv"))
    val v = spark.range(16).select($"id".as("mask"))
      .join(observed, Seq("mask"), "left")
      .select($"mask",
        coalesce(expr("n_conv * 1000000 div n_users"), lit(0L))
          .as("v_q6"))
    val grid = v.select($"mask".as("s"), $"v_q6".as("v_s"))
      .crossJoin(spark.range(4).select($"id".as("b")))
      .filter(expr("(s >> b) & 1 = 0"))
      .withColumn("s_with", expr("s + shiftleft(CAST(1 AS BIGINT), " +
        "CAST(b AS INT))"))
      .join(v.select($"mask".as("s_with"), $"v_q6".as("v_si")), "s_with")
      .withColumn("w", expr("CASE bit_count(s) WHEN 0 THEN 6" +
        " WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"))
    grid.groupBy($"b")
      .agg(sum($"w" * ($"v_si" - $"v_s")).as("phi24_q6"))
      .select(
        expr("CASE b WHEN 0 THEN 'click' WHEN 1 THEN 'error'" +
          " WHEN 2 THEN 'signup' ELSE 'view' END").as("channel"),
        $"phi24_q6",
        expr("(phi24_q6 + 24000000000) div 24 - 1000000000")
          .as("phi_q6"))
      .orderBy($"channel")
  }

  /** DAU/WAU stickiness — per ISO week, the average daily-active
    * count over the weekly-active count, the engagement-density
    * ratio every consumer dashboard leads with. Monday-start
    * `date_trunc('week')` on both engines keeps the buckets
    * identical.
    *
    * Scale shape: DAU and WAU are both exact distinct-user rollups
    * — two hash aggregates keyed on (week, day, user) / (week,
    * user), each a partial-agg shuffle on keys with user-level
    * fan-in, never a global window; the closing ratio joins the
    * ≤53-row week frames. The q6 ratio `Σdau·10⁶ div (days·wau)`
    * is an integer division of positives — no engine divergence.
    */
  def stickiness(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d).select(
      date_trunc("week", $"ts").cast("date").as("wk"),
      to_date($"ts").as("day"), $"user_id")
    val dau = ev.groupBy($"wk", $"day")
      .agg(count_distinct($"user_id").as("dau"))
      .groupBy($"wk")
      .agg(count(lit(1)).as("n_days"), sum($"dau").as("sum_dau"))
    val wau = ev.groupBy($"wk")
      .agg(count_distinct($"user_id").as("wau"))
    dau.join(wau, "wk")
      .select($"wk", $"n_days", $"sum_dau", $"wau",
        expr("CAST(sum_dau * 1000000 div (n_days * wau) AS BIGINT)")
          .as("stick_q6"))
      .orderBy($"wk")
  }

  /** Time-to-convert quantiles — the latency distribution between a
    * user's FIRST view and their first purchase at or after it, read
    * off at p25/p50/p75/p90: the number product teams pair with the
    * q96 funnel's conversion RATE (how many convert vs how fast).
    * Quantiles are exact order statistics, never approximations.
    *
    * Scale shape: two conditional min-aggregates collapse the event
    * volume to one row per converting user; the exact quantile is the
    * q228 discipline — ONE [[graft.operators.GlobalIndex]] ranking of
    * the latency frame (range-partitioned, no global window), the
    * four K = ⌈n·p⌉ selectors broadcast as a 4-row frame, `rank = K`
    * equi-join. All integer: latencies in whole seconds, K in pure
    * integer ceil form.
    */
  def conversionLatency(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .select($"user_id", $"event_type",
        expr("unix_micros(ts)").as("us"))
    val firstView = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("tv"))
    val lat = ev.filter($"event_type" === "purchase")
      .join(firstView, "user_id")
      .filter($"us" >= $"tv")
      .groupBy($"user_id")
      .agg(expr("(min(us) - max(tv)) div 1000000").as("latency_sec"))
    val ranked = graft.operators.GlobalIndex
      .withRowNumber(lat, Seq($"latency_sec".asc, $"user_id".asc), "r")
    val ks = lat.agg(count(lit(1)).as("n_users"))
      .select($"n_users",
        explode(array(lit(25), lit(50), lit(75), lit(90))).as("pct"))
      .select($"n_users", $"pct",
        expr("(n_users * pct + 99) div 100").as("k"))
    ranked.join(broadcast(ks), $"r" === $"k")
      .select($"pct", $"n_users", $"latency_sec")
      .orderBy($"pct")
  }

  /** Deterministic negative sampling for recommender/ranker training
    * — for every purchasing user, k items they did NOT buy, drawn by
    * a hash total order over the catalog: the contrastive-pair
    * generator every two-tower/BPR pipeline runs next to its
    * positives. Determinism is the point — reruns, repartitions, and
    * the oracle all draw the same negatives (no `rand()`).
    *
    * Scale shape: the per-user k smallest hashes are drawn through
    * the bounded [[graft.functions.TopKAgg]] partial on score = −h —
    * ≤k (hash, item) pairs per user leave each task (map-side
    * partial), so aggregation state is k rows, never the catalog
    * (the collect-and-slice it replaces held the WHOLE catalog per
    * user in the buffer — the round-11 heap killer). For a large
    * catalog the candidate frame itself is pruned to the lowest
    * hash bucket first: only pairs with h < P·(oversample·k)/|C|
    * are generated (expected oversample·k survivors per user), and
    * the rare user whose bucket nets fewer than k non-positives
    * falls back to one exact full-catalog draw — bucket-sampled
    * generation with an exactness guarantee (k survivors below the
    * threshold ARE the global k smallest, since everything outside
    * the bucket hashes higher). The prefilter only engages when the
    * catalog is large enough to matter (|C| ≥ 64·k); specs force it
    * with `minCatalogForPrefilter = 0`.
    */
  def negativeSampling(spark: SparkSession, d: String,
                       k: Int = 3, oversample: Int = 16,
                       minCatalogForPrefilter: Long = 192L): DataFrame = {
    import spark.implicits._
    val P = 2147483647L
    val ev = Tables.events(spark, d)
      .select($"user_id",
        get_json_object($"props", "$.k").cast("int").as("item"),
        $"event_type")
      .filter($"item".isNotNull)
    val pos = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"item").distinct()
    val items = ev.select($"item").distinct()
    val users = pos.select($"user_id").distinct()
    val topk = udaf(new graft.functions.TopKAgg(k))
    // one per-user draw over the catalog restricted to h < hCap:
    // TopKAgg on (−h, item) yields h asc / item asc — the same total
    // order as the oracle's ROW_NUMBER(ORDER BY h, item)
    def draw(u: DataFrame, hCap: Long): DataFrame =
      u.crossJoin(broadcast(items))
        .select($"user_id", $"item",
          expr(s"(user_id * 2654435761 + item * 40503) % $P").as("h"))
        .filter($"h" < hCap)
        .join(pos, Seq("user_id", "item"), "left_anti")
        .groupBy($"user_id")
        .agg(topk(-$"h".cast("double"), $"item".cast("long")).as("top"))
    val nItems = graft.Derived.scalar(s"negsamp-catalog:$d")(items.count())
    val hCap =
      if (nItems >= minCatalogForPrefilter.max(1L))
        (P * oversample.toLong * k / nItems.max(1L)).min(P)
      else P
    val drawn =
      if (hCap >= P) draw(users, P)
      else {
        val low = draw(users, hCap)
        // k survivors under the cap are provably the global k
        // smallest; fewer means positives/scarcity ate the bucket —
        // exact fallback over the full catalog for just those users.
        // Shorts are users ABSENT from the done set (anti-join), not
        // low's own under-k rows: a user whose entire candidate set
        // hashes above the cap produces NO group row at all
        val done = low.filter(size($"top") === k)
        val short = users.join(done.select($"user_id"),
          Seq("user_id"), "left_anti")
        done.unionByName(draw(short, P))
      }
    drawn
      .select($"user_id", posexplode($"top").as(Seq("i", "e")))
      .select($"user_id", ($"i" + 1).cast("int").as("neg_rank"),
        $"e._2".cast("int").as("item"))
      .orderBy($"user_id", $"neg_rank")
  }

  /** Weekly growth accounting — the standard user-base ledger every
    * growth team reads: each week's active users split into NEW
    * (first-ever week), RETAINED (also active the prior week), and
    * RESURRECTED (returning after a gap), plus CHURNED (active the
    * prior week, absent this one) — so `new + resurrected − churned`
    * is exactly the week-over-week active-user delta. [[stickiness]]
    * reads intensity; this reads composition.
    *
    * Scale shape: ONE distinct over (user, week) is the only
    * event-volume-sized work; classification is a per-user min
    * (first week) plus a self-equi-join on (user, week−7) — keyed
    * shuffles, no windows, no per-user sort; churn is a left-anti
    * self-join on the shifted week. All counts are exact integers.
    * Weeks are Monday-start `date_trunc` on both engines (the q257
    * convention), so week+7 lands exactly on the next week's key.
    */
  def growthAccounting(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val act = Tables.events(spark, d)
      .select(date_trunc("week", $"ts").cast("date").as("wk"), $"user_id")
      .distinct()
    val firsts = act.groupBy($"user_id").agg(min($"wk").as("first_wk"))
    val prev = act.select(date_add($"wk", 7).as("wk"), $"user_id",
      lit(1L).as("was_prev"))
    val classified = act
      .join(firsts, "user_id")
      .join(prev, Seq("wk", "user_id"), "left")
      .groupBy($"wk")
      .agg(sum(when($"wk" === $"first_wk", 1L).otherwise(0L))
          .as("new_users"),
        sum(when($"wk" =!= $"first_wk" && $"was_prev".isNotNull, 1L)
          .otherwise(0L)).as("retained_users"),
        sum(when($"wk" =!= $"first_wk" && $"was_prev".isNull, 1L)
          .otherwise(0L)).as("resurrected_users"))
    val maxWk = act.agg(max($"wk").as("max_wk"))
    val churned = act.select($"user_id", date_add($"wk", 7).as("wk"))
      .join(act, Seq("user_id", "wk"), "left_anti")
      .crossJoin(broadcast(maxWk))
      .filter($"wk" <= $"max_wk")
      .groupBy($"wk").agg(count(lit(1)).as("churned_users"))
    // FULL outer: a week where every user churned has no active row
    // but must still report its churn count
    classified.join(churned, Seq("wk"), "full_outer")
      .select($"wk",
        coalesce($"new_users", lit(0L)).as("new_users"),
        coalesce($"retained_users", lit(0L)).as("retained_users"),
        coalesce($"resurrected_users", lit(0L)).as("resurrected_users"),
        coalesce($"churned_users", lit(0L)).as("churned_users"))
      .orderBy($"wk")
  }
}
