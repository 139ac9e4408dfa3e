package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Event-time operators over the `events` table — the batch-expressible
  * face of the reference's resumable micro-batch machinery (SURVEY.md
  * §2.10) plus the fill-forward window that powers its positional-file
  * parser (`/root/reference/etl_pipeline_spark.py:1114-1121`).
  *
  * Timestamps: the parquet column is nanosecond-precision; Spark reads
  * it at microsecond precision while DuckDB keeps ns, so every query
  * outputs `unix_micros(ts)` (oracle: `epoch_us(ts)`) — identical
  * BIGINTs on both engines (the generator emits µs-aligned values).
  *
  * Scale: every window below partitions by `user_id`, so state is
  * distributed across executors by key — no global single-partition
  * window anywhere. At 100 TB the same code runs with
  * `spark.sql.shuffle.partitions` sized to the cluster; skewed users
  * would be handled by AQE or key salting.
  */
object Events {
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def moneySum(c: Column): Column = round(sum(dec(c)).cast("double"), 2)
  private def r4(c: Column): Column = graft.Num.r4(c)

  /** W2 analog — LOCF (last observation carried forward): for every
    * event, the most recent 'purchase' value of the same user. Exactly
    * the reference's `last(ignorenulls=True)` over
    * rowsBetween(unboundedPreceding, currentRow).
    */
  def fillForward(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        last(when($"event_type" === "purchase", $"value"), ignoreNulls = true)
          .over(w).as("last_purchase_value"))
      .orderBy($"event_id")
  }

  /** Sessionization via lag-gap (30-minute inactivity): flag a new
    * session when the gap to the previous event exceeds the timeout,
    * then running-sum the flags into a session ordinal. This is the
    * batch twin of Structured Streaming's `session_window` (the
    * streaming form lives in [[graft.streaming.EventStream]]).
    */
  def sessionize(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, d)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros($"ts")).as("start_us"),
        max(unix_micros($"ts")).as("end_us"),
        moneySum($"value").as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** Tumbling event-time window (1 hour) per event_type — Spark's
    * `window()` function; oracle uses date_trunc (identical for
    * epoch-aligned 1h windows).
    */
  def tumblingWindow(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"user_id").as("n_users"),
        moneySum($"value").as("sum_value"))
      .select(unix_micros($"window.start").as("win_start_us"), $"event_type",
              $"n", $"n_users", $"sum_value")
      .orderBy($"win_start_us", $"event_type")
  }

  /** Sliding event-time window (1 hour every 30 minutes): each event
    * lands in 2 windows. Oracle expands via a 2-row cross join on the
    * shift index — same epoch-aligned window set Spark generates.
    */
  def slidingWindow(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy(window($"ts", "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), moneySum($"value").as("sum_value"))
      .select(unix_micros($"window.start").as("win_start_us"), $"n", $"sum_value")
      .orderBy($"win_start_us")
  }

  /** JSON access path: scalar extraction (`get_json_object`) with cast
    * and re-aggregation — the extension surface's `props` handling
    * (SURVEY.md §2.11).
    */
  /** SCD2 history construction — the warehouse-side "slowly changing
    * dimension" build the reference's overwrite-style dims lack: per
    * user, collapse consecutive runs of `event_type` into versioned
    * validity intervals (gaps-and-islands: change flag via lag, run id
    * via running sum), flagging the open current version. One window
    * pass + one aggregate, both partitioned by user — the standard
    * scale shape for history tables.
    */
  def scd2History(spark: SparkSession, d: String): DataFrame =
    scd2On(Tables.events(spark, d))

  /** [[scd2History]]'s core over any (user_id, event_id, ts,
    * event_type) frame — callers pick the event subset that defines
    * the dimension (q120 builds state history from non-click events).
    */
  private[graft] def scd2On(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val runs = events
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("chg",
        when(lag($"event_type", 1).over(w).isNull ||
             lag($"event_type", 1).over(w) =!= $"event_type", 1).otherwise(0))
      .withColumn("version",
        sum($"chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
    runs
      .groupBy($"user_id", $"version")
      .agg(
        min($"event_type").as("event_type"), // constant within a run
        min(unix_micros($"ts")).as("valid_from_us"),
        max(unix_micros($"ts")).as("valid_to_us"),
        count(lit(1)).as("n_events"))
      .withColumn("is_current",
        $"version" === max($"version").over(Window.partitionBy($"user_id")))
      .orderBy($"user_id", $"version")
  }

  /** MERGE-style SCD2 maintenance with LATE-ARRIVING updates — the
    * incremental path a warehouse actually runs: the dimension was
    * built from the on-time events ([[scd2On]]), then a late batch
    * lands (here the deterministic 10% slice `event_id % 10 == 7`,
    * standing in for yesterday's stragglers). Late rows can splice
    * INTO THE MIDDLE of a user's history — splitting runs, renumbering
    * versions, moving `is_current` — so per-row upserts are wrong;
    * the correct MERGE rebuilds exactly the affected users' histories
    * and passes every other user's rows through untouched:
    *
    *   affected  = distinct user_id of the late batch
    *   keep      = dim ANTI-JOIN affected      (pass-through)
    *   rebuilt   = scd2On(all events SEMI-JOIN affected)
    *   dim'      = keep UNION ALL rebuilt
    *
    * The claim proved by the oracle (which computes the full history
    * from scratch): merge(scd2(on-time), late) == scd2(everything) —
    * the incremental result is indistinguishable from a full rebuild.
    *
    * Scale shape: both joins key on user_id — a late batch touches
    * few users, so AQE broadcasts `affected` and the rebuild's window
    * pass runs over only those users' events; the pass-through `keep`
    * never re-sorts or re-windows. At 100 TB this is the difference
    * between re-windowing the whole dimension nightly and touching
    * O(|late|) state.
    */
  def scd2Merge(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .select($"user_id", $"event_id", $"ts", $"event_type")
    val late = ev.filter($"event_id" % 10 === 7)
    val base = ev.filter($"event_id" % 10 =!= 7)
    val dim = scd2On(base)
    val affected = late.select($"user_id").distinct()
    val keep = dim.join(affected, Seq("user_id"), "left_anti")
    val rebuilt = scd2On(ev.join(affected, Seq("user_id"), "left_semi"))
    keep.unionByName(rebuilt).orderBy($"user_id", $"version")
  }

  def jsonExtract(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .select(get_json_object($"props", "$.k").cast("int").as("k"), $"value")
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), moneySum($"value").as("sum_value"))
      .orderBy($"k")
  }

  /** Per-key EWMA over event time — the exponential smoothing every
    * metrics/feature pipeline keeps per entity: s₀ = v₀,
    * sₙ = α·vₙ + (1−α)·sₙ₋₁ over (ts, event_id) order.
    *
    * Implemented as a grouped ordered fold (sorted collect + one
    * array aggregate): α = 0.25 and 1−α = 0.75 are exact binary
    * doubles and both engines evaluate the identical `0.25·v + 0.75·s`
    * operand order, so the result is bit-deterministic. At unbounded
    * per-key history the same recurrence composes associatively
    * (affine maps (a,b)∘(c,d) = (ac, ad+b)), so a custom Aggregator
    * with affine partials — or [[graft.streaming.CdcStream]]-style
    * keyed state on a stream — replaces the collect without changing
    * results; group sizes here are event-scale, not corpus-scale.
    */
  def ewma(spark: SparkSession, d: String, alpha: Double = 0.25): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .filter($"value".isNotNull)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"value")
      .groupBy($"user_id")
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        aggregate(
          transform(
            array_sort(collect_list(struct($"ts_us", $"event_id", $"value"))),
            x => x.getField("value")),
          lit(null).cast("double"),
          (acc, v) => when(acc.isNull, v)
            .otherwise(lit(alpha) * v + lit(1 - alpha) * acc)).as("s"))
      .select($"user_id", $"n_events", r4($"s").as("ewma"))
      .orderBy($"user_id")
  }

  /** JSON as typed map: `from_json` into MapType + `explode` — the
    * generator (UDTF-shaped) path over parsed JSON.
    */
  def jsonMapExplode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .select($"event_id",
        explode(from_json($"props", org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("key", "val")))
      .orderBy($"event_id", $"key")
  }

  /** Per-user TIME-WEIGHTED average of `value` — each reading holds
    * until the next one, so the mean weights each value by how long
    * it was current (the IoT/finance TWAP semantics; a plain AVG
    * over-weights bursts of rapid updates). One lead window per user
    * gives the holding duration; weights are integer milliseconds ×
    * integer cents accumulated as DECIMAL(38,0), so the quotient is
    * a ratio of exact integers and bit-stable across engines and
    * partitionings. The final reading has no duration and drops out,
    * as do users with a single reading.
    */
  def timeWeightedAvg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .filter($"value".isNotNull)
      .select($"user_id", $"ts", $"event_id",
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .withColumn("dur_ms",
        expr("(unix_micros(lead(ts, 1) over " +
          "(partition by user_id order by ts, event_id)) " +
          "- unix_micros(ts)) div 1000"))
      .filter($"dur_ms".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).cast("int").as("n_intervals"),
        sum($"dur_ms".cast("decimal(38,0)")).as("total_ms"),
        sum(($"cents" * $"dur_ms").cast("decimal(38,0)")).as("wsum"))
      .select($"user_id", $"n_intervals",
        $"total_ms".cast("long").as("total_ms"),
        graft.Num.r4($"wsum".cast("double") / $"total_ms".cast("double")
          / 100.0).as("twa"))
      .orderBy($"user_id")
  }

  /** Rolling 7-day distinct active users — the DAU/WAU-style engagement
    * metric every product pipeline reports. Rolling COUNT(DISTINCT) has
    * no window form (distinct is not algebraic over sliding frames);
    * the scalable shape is a bounded fan-out: distinct (day, user)
    * pairs each replicate to the ≤7 target days they contribute to,
    * then one count-distinct aggregation per target day. Fan-out cost
    * is a fixed ×7 of the *deduplicated* day-grain pairs — independent
    * of raw event volume — and the aggregation shuffles by day, so no
    * single-reducer window anywhere (contrast a naive
    * `RANGE BETWEEN 6 PRECEDING` over a global day ordering). Target
    * days past the observed horizon are dropped (`max(day)` is a
    * one-row scalar agg, collected once like q73's avgdl).
    */
  def rollingDistinctUsers(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val du = Tables.events(spark, d)
      .select(to_date($"ts").as("day"), $"user_id").distinct()
    val maxDay = du.agg(max($"day")).head().getDate(0)
    du.select($"day", $"user_id", explode(sequence(lit(0), lit(6))).as("i"))
      .select(date_add($"day", $"i").as("day"), $"user_id")
      .filter($"day" <= lit(maxDay))
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("users_7d"))
      .orderBy($"day")
  }

  /** SCD2 point-in-time lookup — "what was this user's state when the
    * click happened": the dimension is the [[scd2On]] version history
    * of the user's NON-click events (views/purchases = state; clicks
    * are the probing fact, kept out of the dimension so the lookup
    * isn't self-referential), and each click fetches the version in
    * effect at its timestamp — greatest `valid_from ≤ ts`, i.e. a
    * backward as-of join, the standard fact-to-slowly-changing-
    * dimension temporal join. Clicks before a user's first state
    * version keep null version/state (left semantics).
    * Reuses [[graft.operators.AsOfJoin.asOf]], so the cost is one
    * keyed shuffle of probes ∪ versions by user — no range-predicate
    * join explosion, no per-probe scan of the full history. At 100 TB
    * both sides bucket by the key and the as-of merge runs
    * shuffle-free (see AsOfNativeSpec's exchange-free plan proof).
    */
  def scd2Lookup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
    val probes = ev
      .filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"),
        unix_micros($"ts").as("ts_us"))
    val versions = scd2On(ev.filter($"event_type" =!= "click"))
      .select($"user_id", $"valid_from_us".as("ts_us"),
        $"version", $"event_type".as("state"))
    graft.operators.AsOfJoin.asOf(
        probes, versions, keys = Seq("user_id"), ts = "ts_us",
        tieBreak = "version", rightPrefix = "v_")
      .select($"user_id", $"click_id", $"ts_us",
        $"v_version".as("version"), $"v_state".as("state"))
      .orderBy($"user_id", $"click_id")
  }

  /** Resample step for [[interpolate]]: 6 hours in microseconds. */
  val InterpStepUs = 21600000000L

  /** Time-series linear interpolation onto a fixed grid — the metric/
    * sensor resampling step that aligns irregular event series for
    * model features (the two-sided generalization of [[fillForward]]'s
    * LOCF): for each user and each 6-hour grid instant `g` inside the
    * corpus span, the purchase value linearly interpolated between the
    * last purchase at `t1 ≤ g` and the first at `t2 > g`; exact hits
    * return their value, points before the first or after the last
    * observation stay null (no extrapolation).
    *
    * Shape for scale: the grid generates per-user via
    * `explode(sequence)` (narrow), and BOTH neighbors come from one
    * union + one user-partitioned window pass over events∪grid — no
    * per-grid-point join, no range join, millions of small user
    * groups. Purchases collapse to one value per (user, instant)
    * first, so window and as-of implementations agree deterministically
    * even under timestamp ties. The oracle answers the same question
    * with DuckDB's native ASOF joins — a genuinely different
    * algorithm, which is the differential-testing shape we want.
    */
  def interpolate(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
    val p = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", unix_micros($"ts").as("t"))
      .agg(max($"value").as("v"))
    val (minUs, maxUs) = ev
      .agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .as[(Long, Long)].head()
    val h0 = (minUs + InterpStepUs - 1) / InterpStepUs
    val h1 = maxUs / InterpStepUs
    val grid = ev.select($"user_id").distinct()
      .select($"user_id", explode(sequence(lit(h0), lit(h1))).as("h"))
      .select($"user_id", ($"h" * InterpStepUs).as("t"),
        lit(null).cast("double").as("v"), lit("g").as("kind"))
    // 'e' < 'g': an event at exactly a grid instant sorts before the
    // grid row, so it lands in the preceding frame as t1 == g
    val pts = p.select($"user_id", $"t", $"v", lit("e").as("kind"))
    val isE = $"kind" === "e"
    val wPrev = Window.partitionBy($"user_id").orderBy($"t", $"kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward neighbor comes from a REVERSED running frame, not a
    // [current, unboundedFollowing] frame: Spark evaluates an
    // unbounded-FOLLOWING frame by rescanning the partition tail per
    // row (O(n²) per group — measured 3.2s at sf0.1); the reversed
    // sort sees the same row set with O(n) running state (1.0s)
    val wNext = Window.partitionBy($"user_id").orderBy($"t".desc, $"kind".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.unionByName(grid)
      .withColumn("t1", last(when(isE, $"t"), ignoreNulls = true).over(wPrev))
      .withColumn("v1", last(when(isE, $"v"), ignoreNulls = true).over(wPrev))
      .withColumn("t2", last(when(isE, $"t"), ignoreNulls = true).over(wNext))
      .withColumn("v2", last(when(isE, $"v"), ignoreNulls = true).over(wNext))
      .filter($"kind" === "g")
      .select($"user_id", $"t".as("grid_us"),
        r4(when($"t1".isNull, lit(null).cast("double"))
          .when($"t1" === $"t", $"v1")
          .when($"t2".isNull, lit(null).cast("double"))
          .otherwise($"v1" + ($"v2" - $"v1") *
            (($"t" - $"t1").cast("double") /
              ($"t2" - $"t1").cast("double")))).as("interp"))
      .orderBy($"user_id", $"grid_us")
  }

  /** Presence window each event opens for [[peakConcurrency]]:
    * 30 minutes in microseconds. */
  val PresenceUs = 1800000000L

  /** Peak concurrency per day — the max number of simultaneously-open
    * 30-minute presence windows, the capacity-planning census behind
    * "how many sessions must we serve at once".
    *
    * Sweep-line, HOUR-partitioned: each presence interval splits into
    * its ≤2 hour fragments (map-side explode over the hours it
    * spans), every fragment emits +1 at its clamped start and −1 at
    * its clamped end, and the running sum per (hour) — ends sorted
    * before starts at ties, i.e. half-open [s, e) — peaks exactly
    * where true concurrency peaks (every active interval contributes
    * a fragment covering the probe instant). Peak per day is then a
    * 24-row rollup. Partitioning by hour rather than day keeps each
    * sweep's group at one hour of traffic — the grain knob that keeps
    * the window parallel at any volume (drop to minutes at 100 TB;
    * same code shape). The oracle counts concurrency at every
    * fragment start via an in-hour range join — a different algorithm
    * for the same census.
    */
  def peakConcurrency(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val hourUs = 3600000000L
    val iv = Tables.events(spark, d)
      .select(unix_micros($"ts").as("s"),
        (unix_micros($"ts") + PresenceUs).as("e"))
    val frags = iv
      .select($"s", $"e", explode(sequence(
        expr(s"s div $hourUs"), expr(s"(e - 1) div $hourUs"))).as("h"))
      .select($"h",
        greatest($"s", $"h" * hourUs).as("fs"),
        least($"e", ($"h" + 1) * hourUs).as("fe"))
    // both sweep events per fragment in ONE pass (a unionAll of two
    // projections would re-run the interval-fragment explode twice)
    val deltas = frags.select($"h", explode(array(
        struct($"fs".as("t"), lit(1).as("delta")),
        struct($"fe".as("t"), lit(-1).as("delta")))).as("p"))
      .select($"h", $"p.t".as("t"), $"p.delta".as("delta"))
    val sweep = Window.partitionBy($"h").orderBy($"t", $"delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("conc", sum($"delta").over(sweep))
      .groupBy($"h").agg(max($"conc").as("hour_peak"))
      .groupBy(expr("h div 24").as("day"))
      .agg(max($"hour_peak").cast("int").as("peak"),
        count(lit(1)).as("n_active_hours"))
      .orderBy($"day")
  }

  /** User survival curve — S(k) = fraction of users whose observed
    * lifetime (days between first and last event) reaches k, for
    * k = 0..14: the retention half of churn analysis (q97's cohort
    * matrix reads the same signal by calendar week; this is the
    * Kaplan-Meier-flavored lifetime view). One per-user min/max
    * aggregate is the only event-volume-sized work; each user then
    * fans out to at most 15 (k) rows — bounded by the horizon, not
    * the data — and the day-count fraction is an exact integer ratio
    * under r4.
    */
  /** Kaplan–Meier log-survival with RIGHT CENSORING — the estimator
    * [[survivalCurve]]'s raw lifetime view cannot be: a subject whose
    * event has not happened by the end of its observation is STILL AT
    * RISK, not a death, and counting it as one biases survival down
    * (the classic churn-analysis mistake). Per day k:
    * n_k at risk (lifetime ≥ k), d_k events (uncensored lifetime
    * exactly k), KM factor (n_k − d_k)/n_k, and the product-limit
    * reported in LOG form — `logS_q9 = Σ_{j≤k} ⌊ln((n_j−d_j)/n_j)·10⁹⌋`
    * — because per-step quantization then integer cumulative sums is
    * exact and engine-portable, where a floating cumulative PRODUCT
    * is neither (the q212 ln discipline; S itself is exp(logS/10⁹)
    * for any consumer).
    *
    * Scale shape: one per-user min/max aggregate is the only
    * event-volume-sized work; the lifetime table collapses to the
    * bounded horizon domain (≤ 15 rows), where the at-risk counts
    * and the cumulative sum run as bounded-domain windows (the q191
    * discipline).
    */
  def kaplanMeier(spark: SparkSession, d: String,
                  horizon: Int = 14): DataFrame =
    kaplanMeierOf(lifetimes(spark, d, horizon))

  /** The conversion-survival lifetime frame [[kaplanMeier]] and
    * [[nelsonAalen]] share — subject: days from a user's first event
    * to their first PURCHASE (the conversion-survival companion of
    * q274's latency quantiles); a user with no purchase inside the
    * horizon is right-censored at min(lifetime, horizon) — exactly
    * the case that biases a censoring-blind estimate down. */
  private[graft] def lifetimes(spark: SparkSession, d: String,
                               horizon: Int): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .groupBy($"user_id")
      .agg(expr("min(unix_micros(ts))").as("t0"),
        expr("max(unix_micros(ts))").as("t1"),
        expr("min(CASE WHEN event_type = 'purchase'" +
          " THEN unix_micros(ts) END)").as("tp"))
    ev.select(
      expr("least(coalesce((tp - t0) div 86400000000," +
        s" (t1 - t0) div 86400000000), CAST($horizon AS BIGINT))")
        .as("k"),
      (!($"tp".isNotNull &&
        expr("(tp - t0) div 86400000000") <= lit(horizon.toLong)))
        .as("censored"))
  }

  /** [[kaplanMeier]]'s product-limit core over an explicit
    * (k, censored) frame — what the spec drives with a hand-computed
    * censored cohort. */
  private[graft] def kaplanMeierOf(lt: DataFrame): DataFrame = {
    import lt.sparkSession.implicits._
    val byK = lt.groupBy($"k")
      .agg(count(lit(1)).as("ended"),
        sum(when(!$"censored", 1L).otherwise(0L)).as("d"))
    // at-risk n_k = Σ_{j >= k} ended_j — a suffix sum over the
    // ≤ horizon+1-row domain
    val w = Window.orderBy($"k")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wc = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, 0)
    byK
      .withColumn("n_risk", sum($"ended").over(w))
      // a step where every at-risk user dies sends S to exactly 0:
      // ln is undefined from there on, so the log-survival reports
      // NULL for that and all later steps (the convention a consumer
      // can see, vs a silently-skipped −∞ term)
      .withColumn("dead", max(when($"n_risk" === $"d", 1).otherwise(0))
        .over(wc))
      .withColumn("lnf_q9",
        when($"n_risk" > $"d",
          expr("CAST(floor(ln(CAST(n_risk - d AS DOUBLE)" +
            " / CAST(n_risk AS DOUBLE)) * 1000000000.0) AS BIGINT)"))
          .otherwise(lit(0L)))
      .withColumn("log_surv_q9",
        when($"dead" === 1, lit(null)).otherwise(sum($"lnf_q9").over(wc)))
      .select($"k", $"n_risk", $"d".as("n_events"),
        ($"ended" - $"d").as("n_censored"), $"log_surv_q9")
      .orderBy($"k")
  }

  /** Nelson–Aalen cumulative hazard + Greenwood variance factor —
    * [[kaplanMeier]]'s two standard companions on the SAME lifetime
    * frame: `Ĥ_k = Σ_{j≤k} d_j/n_j` estimates cumulative hazard
    * directly (it stays finite even at a step where every at-risk
    * subject converts, where the product-limit S hits 0 and its log
    * leaves the scale), and Greenwood's
    * `Σ_{j≤k} d_j/(n_j·(n_j−d_j))` is the variance factor
    * `Var(Ŝ_k)/Ŝ_k²` a consumer multiplies into KM confidence bands.
    *
    * Exactness — better than the KM query's per-step ln floors: both
    * per-step terms are INTEGER rationals, `d·10⁹ div n` and
    * `d·10¹² div (n·(n−d))` (numerators staged DECIMAL(38,0) — d·10¹²
    * alone wraps int64 past ~9M subjects), quantized then
    * integer-cumulative-summed, so no libm call and no float crosses
    * an engine. Greenwood reports NULL from the first all-die step
    * onward (S = 0 there; its variance is undefined), the
    * [[kaplanMeierOf]] `dead` convention; the hazard keeps going.
    *
    * Scale shape: identical to KM — one per-user min/max aggregate is
    * the only event-volume-sized work; everything else lives on the
    * ≤ horizon+1-row day domain.
    */
  def nelsonAalen(spark: SparkSession, d: String,
                  horizon: Int = 14): DataFrame =
    nelsonAalenOf(lifetimes(spark, d, horizon))

  /** [[nelsonAalen]]'s estimator core over an explicit (k, censored)
    * frame — what the spec drives with a hand-computed cohort. */
  private[graft] def nelsonAalenOf(lt: DataFrame): DataFrame = {
    import lt.sparkSession.implicits._
    val byK = lt.groupBy($"k")
      .agg(count(lit(1)).as("ended"),
        sum(when(!$"censored", 1L).otherwise(0L)).as("d"))
    val w = Window.orderBy($"k")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wc = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, 0)
    byK
      .withColumn("n_risk", sum($"ended").over(w))
      .withColumn("dead", max(when($"n_risk" === $"d", 1).otherwise(0))
        .over(wc))
      .withColumn("na_q9", expr(
        "CAST(d AS decimal(38,0)) * 1000000000 div n_risk"))
      .withColumn("gw_q12",
        when($"n_risk" > $"d", expr(
          "CAST(d AS decimal(38,0)) * 1000000000000" +
            " div (CAST(n_risk AS decimal(38,0)) * (n_risk - d))"))
          .otherwise(lit(0L)))
      .withColumn("na_cumhaz_q9", sum($"na_q9").over(wc))
      .withColumn("greenwood_q12",
        when($"dead" === 1, lit(null)).otherwise(sum($"gw_q12").over(wc)))
      .select($"k", $"n_risk", $"d".as("n_events"),
        ($"ended" - $"d").as("n_censored"),
        $"na_cumhaz_q9", $"greenwood_q12")
      .orderBy($"k")
  }

  /** Log-rank test comparing two cohorts' conversion-survival curves
    * — the hypothesis-test companion of [[kaplanMeier]]: "do users
    * who signed up convert to purchase on a different schedule than
    * organic users?" is a question about the whole CURVE, and
    * comparing medians or day-k rates throws away the rest of it.
    * The log-rank statistic accumulates, at each event day k, the
    * cohort-1 observed events `d_1k` against the expectation under
    * the null `n_1k·d_k/n_k` (events split proportionally to the
    * at-risk sets) with the hypergeometric variance
    * `d_k·(n_1k/n_k)·(1−n_1k/n_k)·(n_k−d_k)/(n_k−1)`; the χ² is
    * `(O−E)²/V` on 1 df.
    *
    * Exactness discipline: the at-risk and event counts are exact
    * integers from the bounded day domain; each day's E and V terms
    * are per-VALUE doubles from those integers (identical operand
    * order in the DuckDB twin) quantized to q6 and integer-summed —
    * the q276 per-step-quantize-then-sum form, because a floating
    * cumulative sum is engine-order-dependent and this is not.
    * Censoring convention matches [[kaplanMeierOf]]: a subject
    * censored at k is at risk at k.
    *
    * Scale shape: one per-user aggregate is the only
    * event-volume-sized work (the cohort flag rides the same pass);
    * everything after lives on the ≤ horizon+1-row day domain, where
    * suffix-sum windows are free.
    */
  def logRankTest(spark: SparkSession, d: String,
                  horizon: Int = 14): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .groupBy($"user_id")
      .agg(expr("min(unix_micros(ts))").as("t0"),
        expr("max(unix_micros(ts))").as("t1"),
        expr("min(CASE WHEN event_type = 'purchase'" +
          " THEN unix_micros(ts) END)").as("tp"),
        expr("max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)")
          .as("cohort"))
    val lt = ev.select(
      expr("least(coalesce((tp - t0) div 86400000000," +
        s" (t1 - t0) div 86400000000), CAST($horizon AS BIGINT))")
        .as("k"),
      (!($"tp".isNotNull &&
        expr("(tp - t0) div 86400000000") <= lit(horizon.toLong)))
        .as("censored"),
      $"cohort")
    val byK = lt.groupBy($"k")
      .agg(count(lit(1)).as("ended"),
        sum(when(!$"censored", 1L).otherwise(0L)).as("d"),
        sum(when($"cohort" === 1, 1L).otherwise(0L)).as("ended1"),
        sum(when($"cohort" === 1 && !$"censored", 1L).otherwise(0L))
          .as("d1"))
    val w = Window.orderBy($"k")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val terms = byK
      .withColumn("n_risk", sum($"ended").over(w))
      .withColumn("n1_risk", sum($"ended1").over(w))
      // only event days enter the sums; a day of pure censoring
      // contributes nothing to O, E, or V
      .filter($"d" > 0)
      .withColumn("e1_q6", expr("CAST(floor(CAST(n1_risk AS DOUBLE)" +
        " * d / n_risk * 1000000.0) AS BIGINT)"))
      .withColumn("v_q6",
        when($"n_risk" > 1, expr("CAST(floor(" +
          "CAST(d AS DOUBLE) * n1_risk / n_risk" +
          " * (n_risk - n1_risk) / n_risk" +
          " * (n_risk - d) / (n_risk - 1) * 1000000.0) AS BIGINT)"))
          .otherwise(lit(0L)))
    terms
      .agg(count(lit(1)).as("n_event_days"),
        sum($"d1").as("o1"),
        sum($"e1_q6").as("e1_q6"),
        sum($"v_q6").as("v_q6"))
      .select($"n_event_days", $"o1", $"e1_q6", $"v_q6",
        // degenerate calibration (zero variance) surfaces as an
        // explicit NULL χ², never an Infinity cast
        when($"v_q6" > 0,
          expr("CAST(floor(power((o1 * 1000000 - e1_q6) / 1000000.0, 2)" +
            " / (v_q6 / 1000000.0) * 1000000.0) AS BIGINT)"))
          .otherwise(lit(null)).as("chi2_q6"))
  }

  def survivalCurve(spark: SparkSession, d: String,
                    horizon: Int = 14): DataFrame = {
    import spark.implicits._
    val lt = Tables.events(spark, d)
      .groupBy($"user_id")
      .agg(expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 86400000000")
        .as("lt"))
    val total = lt.count()
    lt.select(explode(sequence(lit(0L), least($"lt", lit(horizon.toLong))))
        .as("k"))
      .groupBy($"k").agg(count(lit(1)).as("n_surviving"))
      .select($"k", $"n_surviving",
        r4($"n_surviving".cast("double") / lit(total)).as("fraction"))
      .orderBy($"k")
  }

  /** Clamped running balance per user — purchases credit `value`,
    * views/clicks debit a flat unit, and the balance FLOORS AT ZERO
    * (an overdrawn account doesn't go negative; a consumed budget
    * doesn't bank a deficit). The clamp makes the scan NON-ASSOCIATIVE
    * — no plain window cumsum computes it — but the classic closed
    * form does: with prefix p_i over signed deltas in event order,
    *   balance_i = p_i − min(0, min_{j≤i} p_j)
    * (every time the raw prefix dips below its historical minimum the
    * clamp injects exactly the new deficit). Two stacked windows over
    * ONE user-partitioned sort — same scale shape as every per-user
    * scan here. Output is per-user day-end balances in integer cents.
    * The spec proves the closed form against a brute sequential loop;
    * the oracle mirrors the windows (DuckDB has no sequential scan).
    */
  def clampedBalance(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val deltas = Tables.events(spark, d)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_id",
        when($"event_type" === "purchase",
          round(coalesce($"value", lit(0.0)) * 100, 0).cast("long"))
          .otherwise(lit(-100L)).as("delta"))
    val scan = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = deltas
      .withColumn("p", sum($"delta").over(scan))
      .withColumn("floor_adj", least(lit(0L), min($"p").over(scan)))
      .withColumn("bal", $"p" - $"floor_adj")
    stepped
      .groupBy($"user_id", expr("t div 86400000000").as("day"))
      .agg(max_by($"bal", struct($"t", $"event_id")).as("day_end_balance"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"day")
  }

  /** ACF lags (hours) reported by [[autocorrelation]]: short-range
    * memory plus the daily-seasonality probe at 24. */
  val AcfLags: Seq[Int] = Seq(1, 2, 3, 24)

  /** Autocorrelation of the hourly event-count series per event type —
    * the seasonality/memory diagnostic behind traffic forecasting and
    * anomaly baselines (lag-24 reads daily rhythm directly).
    *
    * Scale shape: the ONLY event-volume-sized work is the per-(type,
    * hour) count aggregate — one partial-agg shuffle. Everything after
    * operates on the densified series, whose length is the time span
    * in hours (zero-filled via per-type `explode(sequence)`, no join
    * against a calendar table), independent of event volume: a
    * 100 TB month is still 720 points per type. The per-type lag
    * window runs over those bounded series — small by construction,
    * unlike q91's data-sized groups. ACF_k = corr(x_t, x_{t−k})
    * computed like q137: integer-exact DECIMAL(38,0) sufficient sums
    * (hourly counts can reach 10⁹ at full scale; their squares top
    * int64), doubles only in the final expression.
    */
  def autocorrelation(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val ev = Tables.events(spark, d)
    val hourly = ev
      .groupBy($"event_type",
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val (h0, h1) = ev
      .agg(min(expr("unix_micros(ts) div 3600000000")),
        max(expr("unix_micros(ts) div 3600000000")))
      .as[(Long, Long)].head()
    val dense = ev.select($"event_type").distinct()
      .select($"event_type", explode(sequence(lit(h0), lit(h1))).as("h"))
      .join(hourly, Seq("event_type", "h"), "left")
      .select($"event_type", $"h", coalesce($"cnt", lit(0L)).as("x"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
    val withLags = dense.select($"event_type" +: $"x" +:
      AcfLags.map(k => lag($"x", k).over(w).as(s"__y$k")): _*)
    val lagged = withLags.select($"event_type", $"x",
      explode(array(AcfLags.map(k =>
        struct(lit(k).as("lag"), col(s"__y$k").as("y"))): _*)).as("p"))
      .select($"event_type", $"p.lag".as("lag"), $"x", $"p.y".as("y"))
      .filter($"y".isNotNull)
    lagged
      .groupBy($"event_type", $"lag")
      .agg(count(lit(1)).as("n"),
        sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
        sum($"x".cast(dec) * $"y".cast(dec)).as("sxy"),
        sum($"x".cast(dec) * $"x".cast(dec)).as("sxx"),
        sum($"y".cast(dec) * $"y".cast(dec)).as("syy"))
      .select($"event_type", $"lag", $"n",
        r4(($"n".cast(dec) * $"sxy" - $"sx" * $"sy").cast("double") /
          (sqrt(($"n".cast(dec) * $"sxx" - $"sx" * $"sx").cast("double")) *
           sqrt(($"n".cast(dec) * $"syy" - $"sy" * $"sy").cast("double"))))
          .as("acf"))
      .orderBy($"event_type", $"lag")
  }

  /** Gaps-and-islands over per-customer order sequences — activity
    * runs (islands: consecutive orders ≤180 days apart, merged) with
    * the dormancy gap that preceded each run: the churn-risk /
    * ingestion-hole operator. Two stacked windows KEYED BY CUSTOMER
    * are the only passes — a lag flags island starts, a running sum
    * of flags numbers the islands (the classic formulation), and a
    * groupBy on (customer, island) collapses runs. No calendar
    * scaffold is ever generated and nothing is unkeyed, so the shape
    * survives any row count (contrast the generate-every-day-and-
    * anti-join form whose scaffold is span × customers). Day
    * arithmetic is integer days-since-epoch on both engines.
    */
  def dormancyIslands(spark: SparkSession, d: String,
                      maxRunGapDays: Long = 180L): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d).select($"o_custkey",
      $"o_orderkey",
      datediff($"o_orderdate", lit("1970-01-01")).cast("long").as("day"))
    val w = Window.partitionBy($"o_custkey").orderBy($"day", $"o_orderkey")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("prev_day", lag($"day", 1).over(w))
      .withColumn("starts",
        when($"prev_day".isNull || $"day" - $"prev_day" > maxRunGapDays, 1L)
          .otherwise(0L))
      .withColumn("gap_before",
        when($"starts" === 1L, $"day" - $"prev_day")) // null on first island
      .withColumn("island", sum($"starts").over(run))
      .groupBy($"o_custkey", $"island")
      .agg(min($"day").as("start_day"), max($"day").as("end_day"),
        count(lit(1)).as("n_orders"), max($"gap_before").as("gap_before_days"))
      .orderBy($"o_custkey", $"island")
  }

  /** Keyed interval-overlap join — per user, total overlap time (and
    * pair count) between view presence windows [ts, ts+20 min) and
    * purchase attention windows [ts, ts+10 min): the ad-attribution /
    * exposure-accounting join where BOTH sides are intervals, so
    * neither an equi-join nor an as-of join expresses it.
    *
    * Scale shape: the naive form is a range-predicate join (Spark
    * plans a per-key cartesian with a post-filter; at 100 TB the hot
    * keys explode). Here each interval fragments into the hour cells
    * it touches map-side (≤2 cells for these durations — the q139
    * grain knob: cell width caps fragment fan-out) and the join
    * becomes a plain EQUI-join on (user, cell), so Spark hash-joins
    * it and per-task work is bounded by per-(user, hour) density,
    * never per-user totals. Overlap sums clip to cell bounds — cells
    * partition the timeline, so per-cell clipped overlaps add to
    * exactly the pair overlap with no double count — and each pair
    * counts once, in the cell holding its overlap START (that cell's
    * clipped contribution is positive iff the pair truly overlaps,
    * so the HAVING keeps exactly the oracle's pair set). All epoch
    * micros, integer-exact.
    */
  def intervalOverlap(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val hourUs = 3600000000L
    val ev = Tables.events(spark, d)
    def iv(t: String, durUs: Long, p: String) = ev
      .filter($"event_type" === t)
      .select($"user_id", unix_micros($"ts").as(s"${p}_lo"),
        (unix_micros($"ts") + durUs).as(s"${p}_hi"))
      .withColumn("cell", explode(sequence(
        expr(s"${p}_lo div $hourUs"), expr(s"(${p}_hi - 1) div $hourUs"))))
    val a = iv("view", 1200000000L, "a")
    val b = iv("purchase", 600000000L, "b")
    a.join(b, Seq("user_id", "cell"))
      .withColumn("cl",
        greatest($"a_lo", $"b_lo", $"cell" * hourUs))
      .withColumn("ch",
        least($"a_hi", $"b_hi", ($"cell" + 1) * hourUs))
      .withColumn("contrib", greatest($"ch" - $"cl", lit(0L)))
      .withColumn("starts_here",
        $"cell" === expr(s"greatest(a_lo, b_lo) div $hourUs") &&
          $"contrib" > 0)
      .groupBy($"user_id")
      .agg(sum(when($"starts_here", 1L).otherwise(0L)).as("n_pairs"),
        sum($"contrib").as("overlap_us"))
      .filter($"n_pairs" > 0)
      .orderBy($"user_id")
  }
}
