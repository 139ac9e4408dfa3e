package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** The reference's analytical query surface (SURVEY.md §2.3–§2.8),
  * re-expressed over the driver's TPC-H-ish tables.
  *
  * Mapping: `fact_ratings` → `lineitem`/`orders`, `dim_movie` → `part`,
  * `dim_customer` → `customer`, `dim_date` → derived from the order/ship
  * timestamps. Each query mirrors a construct of the reference
  * (`/root/reference/schema.sql:131-238`,
  * `/root/reference/etl_pipeline_spark.py:1370-1502`).
  *
  * Determinism rules (oracle parity, SURVEY.md §7.4):
  *  - every query ends in an ORDER BY over a unique key combination;
  *  - floating aggregates are rounded (2dp money, 4dp ratios);
  *  - counts stay BIGINT on both engines (DuckDB oracles cast).
  *
  * Scale notes are on each operator: all aggregations are partial+final
  * hash aggregates (map-side combine), all small-dimension joins carry
  * explicit `broadcast()` hints, and the one big fact-fact join
  * (lineitem ⋈ orders) is a shuffle join on the natural key — at 100 TB
  * both sides would be bucketed by orderkey so the shuffle disappears.
  */
object Analytics {
  import org.apache.spark.sql.Column

  /** Money columns in the test data are exact 2-decimal values stored as
    * doubles. Summing them as doubles is order-dependent (different
    * partitionings → different last-ulp results → oracle hash
    * mismatches), so every money aggregate goes through an exact
    * DECIMAL(18,2) sum and is cast back to double at the end: both
    * engines then produce bit-identical results regardless of
    * parallelism — on 8 local threads or 1000 executors.
    */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def moneySum(c: Column): Column = round(sum(dec(c)).cast("double"), 2)

  /** Round a double quotient to 4dp the way DuckDB does (scale, round to
    * integer, unscale). Spark's `round(x, 4)` converts the exact binary
    * double to BigDecimal before HALF_UP — for quotients sitting at a
    * .00005 boundary the two implementations disagree by 1 ulp of the
    * last digit. Doing scale-round-unscale in IEEE doubles on BOTH
    * engines makes every step bit-identical.
    */
  private def r4(c: Column): Column = graft.Num.r4(c)
  private def moneyAvg(c: Column): Column =
    r4(sum(dec(c)).cast("double") / count(lit(1)))
  /** Average of an integral-valued double column (quantity): the sum is
    * exact in doubles, only the quotient needs boundary-safe rounding. */
  private def intishAvg(c: Column): Column = r4(sum(c) / count(lit(1)))
  /** SUM(price * (1 - discount)) in exact decimal arithmetic. The
    * scale-4 sum is rounded to 2 IN DECIMAL before the double cast:
    * rounding after the cast diverges between engines when the exact
    * sum lands on .xx5 — Spark rounds the double via its shortest
    * decimal string (".535" rounds up) while DuckDB's numeric path
    * sees .5349999… and rounds down (bit q109 at sf0.1). Decimal
    * rounding is exact and half-away-from-zero on both engines for
    * these non-negative sums; the rounded value casts to the
    * identical double. */
  private def discRevenue(price: Column, discount: Column): Column =
    round(sum(dec(price) * (lit(1.0).cast("decimal(3,2)") - discount.cast("decimal(3,2)"))),
      2).cast("double")

  /** A1+A6: grouped hash aggregation with arithmetic expressions — the
    * "daily rating summary" shape (schema.sql:131-146). Filter is a raw
    * timestamp comparison so it pushes down to the parquet scan.
    */
  def pricingSummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" < lit("2000-09-03").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        moneySum($"l_extendedprice").as("sum_base_price"),
        discRevenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        intishAvg($"l_quantity").as("avg_qty"),
        moneyAvg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** A2: global (grand) aggregate — the reference's dataset summary
    * (etl_pipeline_spark.py:1490-1497). Single-row output; partial
    * aggregation means only one row per task reaches the driver.
    */
  def globalStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct($"l_orderkey").as("n_orders"),
      min(to_date($"l_shipdate")).as("min_ship"),
      max(to_date($"l_shipdate")).as("max_ship"),
      intishAvg($"l_quantity").as("avg_qty"),
      moneySum($"l_extendedprice").as("sum_price"))
  }

  /** A3: distinct-extraction (etl_pipeline_spark.py:963-999 scrapes
    * distinct customer ids). Hash-aggregate distinct, shuffles only the
    * two projected columns.
    */
  def distinctSegments(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, d)
      .select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** A5: COUNT(DISTINCT) per group (schema.sql:139-140). Catalyst plans
    * this as expand + two-phase aggregate; stays fully distributed.
    */
  def statusCardinality(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        moneySum($"o_totalprice").as("total_price"))
      .orderBy($"o_orderstatus")
  }

  /** A7+O1+O2: HAVING + ORDER BY + LIMIT — "top 10 highest-rated movies
    * with ≥100 ratings" (schema.sql:198-211), with `part` playing
    * dim_movie. Broadcast the dimension; Spark plans the top-k as
    * TakeOrderedAndProject (no global sort materialization).
    */
  def topParts(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .join(broadcast(Tables.part(spark, d)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey", $"p_name")
      .agg(moneyAvg($"l_extendedprice").as("avg_price"),
           count(lit(1)).as("n_items"))
      .filter($"n_items" >= 20)
      .orderBy($"avg_price".desc, $"p_partkey")
      .limit(10)
  }

  /** J4 view analog: per-day summary (daily_rating_summary,
    * schema.sql:131-146): count, distinct parent count, averages.
    *
    * Hand-two-phased: partial sums per (day, orderkey), then the
    * per-day rollup where the distinct-order count is a plain row
    * count — one pipeline instead of `countDistinct`'s
    * rewrite-with-expand, and every partial is exact (quantity sums
    * are integral doubles < 2^53, money rides DECIMAL), so the
    * reassociated sums are bit-identical to the single-level form.
    */
  def dailySummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .groupBy(to_date($"l_shipdate").as("ship_date"), $"l_orderkey")
      .agg(
        count(lit(1)).as("__n"),
        sum($"l_quantity").as("__qty"),
        sum(dec($"l_extendedprice")).as("__price"))
      .groupBy($"ship_date")
      .agg(
        sum($"__n").as("n_items"),
        count(lit(1)).as("n_orders"),
        round(sum($"__qty"), 2).as("sum_qty"),
        r4(sum($"__price").cast("double") / sum($"__n")).as("avg_price"))
      .orderBy($"ship_date")
  }

  /** J1/J2: the star join — fact ⋈ fact-parent ⋈ three broadcast dims
    * (mirrors surrogate-key resolution joins,
    * etl_pipeline_spark.py:1149-1151, and the view joins). lineitem ⋈
    * orders shuffles on orderkey (bucket both at 100 TB); customer,
    * nation, region are explicit broadcasts like the reference's
    * `broadcast()` hints.
    */
  def starJoinRevenue(spark: SparkSession, d: String): DataFrame =
    starJoinRevenueFrames(
      Tables.lineitem(spark, d), Tables.orders(spark, d),
      Tables.customer(spark, d), Tables.nation(spark, d),
      Tables.region(spark, d))

  /** Frame-based core of [[starJoinRevenue]] — lets the same plan run
    * over any physical layout. With lineitem/orders bucketed on the
    * join key the fact join needs no exchange at all (BucketingSpec
    * proves this end-to-end on this exact code path).
    */
  def starJoinRevenueFrames(lineitem: DataFrame, orders: DataFrame,
                            customer: DataFrame, nation: DataFrame,
                            region: DataFrame): DataFrame = {
    import lineitem.sparkSession.implicits._
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        discRevenue($"l_extendedprice", $"l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  /** Left anti join — the orphaned-ratings verification query
    * (schema.sql:188-191) as an explicit operator: customers with no
    * orders. Broadcast the *filter side's keys*? No — orders is the big
    * side; Spark shuffles both on custkey. At scale a bloom-filter
    * pre-pass would cut the shuffle; AQE handles skew.
    */
  def customersWithoutOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Left semi join (EXISTS): customers having at least one
    * high-value order. Filter pushes below the join.
    */
  def bigSpenders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, d)
      .join(
        Tables.orders(spark, d).filter($"o_totalprice" > 400000.0),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** W1: row_number over (partitionBy, orderBy)
    * (etl_pipeline_spark.py:1101-1103): top-3 orders per customer.
    * One shuffle on the partition key; tie-broken by orderkey so the
    * ranking is total and engine-independent.
    */
  def topOrdersPerCustomer(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey",
              round($"o_totalprice", 2).as("total"))
      .orderBy($"o_custkey", $"rn")
  }

  /** W2 frame shape: running sum over
    * rowsBetween(unboundedPreceding, currentRow) — the exact frame the
    * reference's fill-forward uses (etl_pipeline_spark.py:1114-1121),
    * here as running revenue per customer.
    */
  def runningTotal(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, d)
      .select($"o_custkey", $"o_orderkey",
              round(sum(dec($"o_totalprice")).over(w).cast("double"), 2).as("running_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** U2: UNION ALL of per-table counts — the row-count verification
    * query (schema.sql:179-185).
    */
  def unionCounts(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Seq("customer", "orders", "lineitem", "part", "supplier", "nation", "region")
      .map(t => Tables.read(spark, d, t).agg(count(lit(1)).as("n")).select(lit(t).as("tbl"), $"n"))
      .reduce(_ union _)
      .orderBy($"tbl")
  }

  /** P6: when/otherwise conditional bucketing
    * (etl_pipeline_spark.py:789-795) + grouped agg.
    */
  def priceBuckets(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .withColumn("bucket",
        when($"o_totalprice" > 300000.0, "high")
          .when($"o_totalprice" > 150000.0, "mid")
          .otherwise("low"))
      .groupBy($"o_orderstatus", $"bucket")
      .agg(count(lit(1)).as("n"), moneyAvg($"o_totalprice").as("avg_price"))
      .orderBy($"o_orderstatus", $"bucket")
  }

  /** Most-active-customers query (schema.sql:227-238) incl. F15
    * date subtraction (days_active).
    */
  def mostActiveCustomers(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        moneySum($"o_totalprice").as("total_spent"),
        min(to_date($"o_orderdate")).as("first_order"),
        max(to_date($"o_orderdate")).as("last_order"))
      .withColumn("days_active", datediff($"last_order", $"first_order"))
      .orderBy($"n_orders".desc, $"o_custkey")
      .limit(20)
  }

  /** Yearly trend query (schema.sql:213-225): per-year counts, distinct
    * customers, averages.
    */
  def yearlyTrend(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy(year($"o_orderdate").cast("int").as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"),
        moneyAvg($"o_totalprice").as("avg_price"),
        moneySum($"o_totalprice").as("total_revenue"))
      .orderBy($"order_year")
  }

  /** Orphan check (schema.sql:188-191): count of fact rows whose parent
    * key is missing — anti join reduced to a single count row.
    */
  def orphanCheck(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
  }
}
