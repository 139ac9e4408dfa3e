package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ext.Stats

/** Drift/audit statistics on PLANTED contingencies with hand-computed
  * expected values — the mirrored DuckDB oracles prove engine parity,
  * but only a planted table proves the FORMULA is the one intended
  * (the msb-smear lesson: both engines can faithfully agree on a
  * wrong formula).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  /** orders.parquet shaped like testdata, with controllable status. */
  private def plantOrders(
      rows: Seq[(Long, String, Double, String)]): String = {
    val dir = Files.createTempDirectory("graft-drift").toString
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .select($"o_orderkey", ($"o_orderkey" % 7).as("o_custkey"),
        $"o_orderstatus", $"o_totalprice",
        to_timestamp(lit("1995-06-01")).as("o_orderdate"), $"o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("ksDrift: hand-computed ECDF gap, argmax bucket, P excluded") {
    // A ('F') buckets: 0,0,1,2  B ('O') buckets: 2,3  (bucket = $1000)
    // cum: b0 (2,0) gap 2*2=4; b1 (3,0) gap 6; b2 (4,1) gap 8-4=4;
    // b3 (4,2) gap 0  =>  D = 6/8 = 0.75 at bucket 1
    val d = plantOrders(Seq(
      (1L, "F", 500.0, "1-URGENT"), (2L, "F", 600.0, "1-URGENT"),
      (3L, "F", 1500.0, "1-URGENT"), (4L, "F", 2500.0, "1-URGENT"),
      (5L, "O", 2500.0, "1-URGENT"), (6L, "O", 3500.0, "1-URGENT"),
      (7L, "P", 100000.0, "1-URGENT"))) // P must not shift either ECDF
    val r = Stats.ksDrift(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 4L, "n_a")
    assert(r.head.getLong(1) == 2L, "n_b")
    assert(r.head.getLong(2) == 1L, "at_bucket = smallest argmax")
    assert(r.head.getDouble(3) == 0.75, "ks_q4")
  }

  test("ksDrift: identical distributions give zero distance") {
    val d = plantOrders(Seq(
      (1L, "F", 500.0, "1-URGENT"), (2L, "F", 1500.0, "1-URGENT"),
      (3L, "O", 700.0, "1-URGENT"), (4L, "O", 1600.0, "1-URGENT")))
    val r = Stats.ksDrift(spark, d).collect().head
    assert(r.getDouble(3) == 0.0)
    assert(r.getLong(2) == 0L, "ties resolve to the first bucket")
  }

  test("chiSquared: staged integer cells match the hand computation") {
    // 2x2: O = [[10,20],[30,40]], N=100, rT=(30,70), cT(F)=40, cT(O)=60
    def rows(n: Int, from: Long, st: String, pr: String) =
      (from until from + n).map(k => (k, st, 1000.0, pr))
    val d = plantOrders(
      rows(10, 0L, "F", "1-URGENT") ++ rows(20, 100L, "O", "1-URGENT") ++
      rows(30, 200L, "F", "2-HIGH") ++ rows(40, 300L, "O", "2-HIGH"))
    val got = Stats.chiSquared(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // cell_q6 = ((O^2*1e6 div rT) * N) div cT, e_q2 = rT*cT*100 div N
    assert(got(("1-URGENT", "F")) == ((10L, 30L, 40L, 1200L, 8333332L)))
    assert(got(("1-URGENT", "O")) == ((20L, 30L, 60L, 1800L, 22222221L)))
    assert(got(("2-HIGH", "F")) == ((30L, 70L, 40L, 2800L, 32142855L)))
    assert(got(("2-HIGH", "O")) == ((40L, 70L, 60L, 4200L, 38095236L)))
    // sum - N*1e6 tracks the true chi-square (0.79365..*1e6) to within
    // the <=2 micro-unit floor loss per cell
    val chi2q6 = got.values.map(_._5).sum - 100L * 1000000L
    assert(math.abs(chi2q6 - 793650L) <= 8L, s"got $chi2q6")
  }

  test("joinSizeForecast: exact when buckets resolve keys; collisions over-count") {
    val dir = Files.createTempDirectory("graft-jsf").toString
    val P = 2147483647L
    def bucket(k: Long) = (k % P) * 2654435761L % P % 1024
    // find a key colliding with key 1 in the 1024-bucket grid
    val k2 = (2L to 100000L).find(k => bucket(k) == bucket(1L)).get
    // A = {1, 5}, B = {k2, 5}: true join = 1 (key 5); the histogram
    // cannot distinguish 1 from k2, so forecast = 2 and over_q4 = 2
    Seq(1L, 5L).toDF("o_orderkey")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq(k2, 5L).toDF("l_orderkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Extended.joinSizeForecast(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 1L, 2.0)))

    // collision-free plant: forecast must equal the true join size
    val dir2 = Files.createTempDirectory("graft-jsf2").toString
    Seq(1L, 2L, 3L).toDF("o_orderkey")
      .coalesce(1).write.parquet(s"$dir2/orders.parquet")
    Seq(1L, 1L, 2L, 7L).toDF("l_orderkey")
      .coalesce(1).write.parquet(s"$dir2/lineitem.parquet")
    assert(Seq(1L, 2L, 3L, 7L).map(bucket).distinct.size == 4,
      "plant invariant: no accidental collisions")
    val r2 = graft.queries.Extended.joinSizeForecast(spark, dir2).collect().head
    assert((r2.getLong(0), r2.getLong(1), r2.getDouble(2)) == ((3L, 3L, 1.0)))
  }

  test("cusumChangepoint: level shift localizes to the last old-regime day") {
    // $100/day for 3 days then $200/day for 3 days: S_t = cum*6 - t*90000
    // peaks in magnitude at t=3 (|S|=90000), the last day before the
    // shift; normalized peak = 90000/(6*90000) = 1/6 -> 0.1667 under r4
    def onDay(k: Long, day: String, price: Double) =
      (k, "F", price, "1-URGENT", day)
    val rows = Seq(
      onDay(1L, "2024-01-01", 100.0), onDay(2L, "2024-01-02", 100.0),
      onDay(3L, "2024-01-03", 100.0), onDay(4L, "2024-01-04", 200.0),
      onDay(5L, "2024-01-05", 200.0), onDay(6L, "2024-01-06", 200.0))
    val dir = Files.createTempDirectory("graft-cusum").toString
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_orderdate_s")
      .select($"o_orderkey", ($"o_orderkey" % 7).as("o_custkey"),
        $"o_orderstatus", $"o_totalprice",
        to_timestamp($"o_orderdate_s").as("o_orderdate"), $"o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val r = Stats.cusumChangepoint(spark, dir).collect().head
    val day20240103 = java.time.LocalDate.of(2024, 1, 3).toEpochDay
    assert(r.getLong(0) == day20240103, "change day = last day of old regime")
    assert(r.getLong(1) == 6L)
    assert(r.getDouble(2) == 0.1667)

    // flat series: S_t = 0 everywhere, argmax ties resolve to day 1
    val dir2 = Files.createTempDirectory("graft-cusum2").toString
    Seq(onDay(1L, "2024-02-01", 50.0), onDay(2L, "2024-02-02", 50.0),
        onDay(3L, "2024-02-03", 50.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_orderdate_s")
      .select($"o_orderkey", ($"o_orderkey" % 7).as("o_custkey"),
        $"o_orderstatus", $"o_totalprice",
        to_timestamp($"o_orderdate_s").as("o_orderdate"), $"o_orderpriority")
      .coalesce(1).write.parquet(s"$dir2/orders.parquet")
    val r2 = Stats.cusumChangepoint(spark, dir2).collect().head
    assert(r2.getLong(0) == java.time.LocalDate.of(2024, 2, 1).toEpochDay)
    assert(r2.getDouble(2) == 0.0)
  }

  test("hodgesLehmannShift: Moses/Hollander-Wolfe CI on planted days") {
    // 4 weekend days x 5 weekday days -> m = 20 pairwise differences;
    // the CI indices must CENTER on the median of the differences
    // (c_off = floor(m/2 - z*sigma), round-12 advice: counting c from
    // the extremes gives ~100% coverage, not 95%)
    def onDay(k: Long, d: String, p: Double) = (k, "F", p, "1-URGENT", d)
    val weekendDays = Seq("2024-01-06", "2024-01-07", "2024-01-13",
      "2024-01-14") // Sat, Sun, Sat, Sun
    val weekdayDays = Seq("2024-01-08", "2024-01-09", "2024-01-10",
      "2024-01-11", "2024-01-12")
    val wePrices = Seq(310.0, 155.5, 242.25, 401.0)
    val wdPrices = Seq(100.0, 215.75, 90.5, 180.0, 260.25)
    val rows = (weekendDays.zip(wePrices) ++ weekdayDays.zip(wdPrices))
      .zipWithIndex.map { case ((d, p), i) => onDay(i + 1L, d, p) }
    val dir = Files.createTempDirectory("graft-hl").toString
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_orderdate_s")
      .select($"o_orderkey", ($"o_orderkey" % 7).as("o_custkey"),
        $"o_orderstatus", $"o_totalprice",
        to_timestamp($"o_orderdate_s").as("o_orderdate"), $"o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val r = Stats.hodgesLehmannShift(spark, dir).collect().head
    // brute-force reference in exact integer cents
    val we = wePrices.map(p => math.floor(p * 100).toLong)
    val wd = wdPrices.map(p => math.floor(p * 100).toLong)
    val diffs = (for (a <- we; b <- wd) yield a - b).sorted
    val (n1, n2) = (we.size, wd.size)
    val m = n1 * n2
    val cOff = math.max(0L, math.floor(m / 2.0 -
      1.959964 * math.sqrt(n1.toDouble * n2 * (n1 + n2 + 1) / 12.0)).toLong)
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("n_pairs") == m)
    assert(r.getAs[Long]("hl_lo_cents") == diffs((m + 1) / 2 - 1))
    assert(r.getAs[Long]("hl_hi_cents") == diffs(m / 2))
    assert(cOff > 0, "the planted sizes must exercise a nonzero offset")
    assert(r.getAs[Long]("ci_lo_cents") == diffs(cOff.toInt),
      "ci_lo = (c+1)-th smallest difference")
    assert(r.getAs[Long]("ci_hi_cents") == diffs(m - cOff.toInt - 1),
      "ci_hi = (m-c)-th smallest difference")
    // the interval must CONTAIN the point estimate (a centered interval
    // always does; the pre-fix extreme-counted one did only by accident)
    assert(r.getAs[Long]("ci_lo_cents") <= r.getAs[Long]("hl_lo_cents"))
    assert(r.getAs[Long]("ci_hi_cents") >= r.getAs[Long]("hl_hi_cents"))
  }

  test("benfordAudit: digit extraction and shares on a planted ledger") {
    val d = plantOrders(Seq(
      (1L, "F", 1.50, "1-URGENT"),   // 150    -> 1
      (2L, "F", 12.00, "1-URGENT"),  // 1200   -> 1
      (3L, "F", 0.19, "1-URGENT"),   // 19     -> 1
      (4L, "F", 2.50, "1-URGENT"),   // 250    -> 2
      (5L, "F", 35.00, "1-URGENT"),  // 3500   -> 3
      (6L, "F", 99.99, "1-URGENT"),  // 9998 (IEEE floor) -> 9
      (7L, "F", 0.05, "1-URGENT"),   // 5      -> 5
      (8L, "F", 0.50, "1-URGENT"))) // 50     -> 5
    val got = Stats.benfordAudit(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(4))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L, 9L))
    assert(got(1L)._1 == 3L && got(1L)._2 == 0.375)
    assert(got(5L)._1 == 2L && got(5L)._2 == 0.25)
    assert(got(2L)._1 == 1L && got(2L)._2 == 0.125)
    // dev = share - benford, at the r4 grid: 0.375 - 0.3010 = 0.074
    assert(got(1L)._3 == 0.074)
    // digit 5 runs ABOVE Benford here: 0.25 - 0.0792 = 0.1708
    assert(got(5L)._3 == 0.1708)
  }

  test("spendConcentration: hand-computed Gini and HHI; equality gives zero Gini") {
    // spends 100,200,300,400 cents: S = sum(i*x) = 3000,
    // gini = (2*3000 - 5*1000)/(4*1000) = 0.25; HHI = 300000/1e6 = 0.3
    val d = plantOrders(Seq(
      (1L, "F", 1.00, "1-URGENT"), (2L, "F", 2.00, "1-URGENT"),
      (3L, "F", 3.00, "1-URGENT"), (4L, "F", 4.00, "1-URGENT")))
    val r = graft.queries.Extended.spendConcentration(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 1000L, 250000L, 300000L)))

    // perfectly equal spends: Gini exactly 0, HHI = 1/n
    val d2 = plantOrders(Seq(
      (1L, "F", 1.00, "1-URGENT"), (2L, "F", 1.00, "1-URGENT"),
      (3L, "F", 1.00, "1-URGENT"), (4L, "F", 1.00, "1-URGENT")))
    val r2 = graft.queries.Extended.spendConcentration(spark, d2).collect().head
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 250000L)
  }

  /** documents + customer + orders shaped like testdata, minimal
    * columns, for the multi-table audit queries. */
  private def plantAudit(docs: Seq[(Long, String, String)],
                         cust: Seq[(Long, Int, String)],
                         ords: Seq[(Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-audit").toString
    docs.toDF("doc_id", "lang", "source")
      .withColumn("text", lit("t")).withColumn("n_chars", lit(1L))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    cust.toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .withColumn("c_name", lit("n")).withColumn("c_acctbal", lit(0.0))
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    ords.toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_totalprice", lit(1000.0))
      .withColumn("o_orderdate", to_timestamp(lit("1995-06-01")))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("entropyProfile: hand-computed entropy/norm/gini; k=1 columns zero out") {
    // lang en,en,de,de: H = ln4 - ln2 = ln2 -> 693147 q6, norm 1.0,
    // gini 1 - 2*(1/2)^2 = 0.5; single-valued columns all-zero
    val d = plantAudit(
      docs = Seq((1L, "en", "web"), (2L, "en", "web"),
        (3L, "de", "web"), (4L, "de", "web")),
      cust = Seq((1L, 0, "AUTO")),
      ords = Seq((1L, 1L, "1-URGENT"), (2L, 1L, "2-HIGH")))
    val got = Stats.entropyProfile(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got("lang") == ((4L, 2L, 693147L, 1000000L, 500000L)))
    assert(got("o_orderpriority") == ((2L, 2L, 693147L, 1000000L, 500000L)))
    assert(got("c_mktsegment") == ((1L, 1L, 0L, 0L, 0L)))
    assert(got("o_orderstatus") == ((2L, 1L, 0L, 0L, 0L)))
    assert(got("source") == ((4L, 1L, 0L, 0L, 0L)))
  }

  test("fdAudit: g3 strength counts majority-Y rows per X") {
    // source A -> (en,en,en,de), B -> (en,en): conform 3+2=5 of 6
    val d = plantAudit(
      docs = Seq((1L, "en", "A"), (2L, "en", "A"), (3L, "en", "A"),
        (4L, "de", "A"), (5L, "en", "B"), (6L, "en", "B")),
      cust = Seq((1L, 0, "AUTO"), (2L, 0, "AUTO"), (3L, 0, "BIKE"),
        (4L, 1, "SHIP")),
      ords = Seq((1L, 1L, "1-URGENT"), (2L, 1L, "1-URGENT"),
        (3L, 1L, "2-HIGH"), (4L, 2L, "2-HIGH")))
    val got = Stats.fdAudit(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got("doc_source_lang") == ((6L, 2L, 5L, 1L, 833333L)))
    assert(got("cust_nation_segment") == ((4L, 2L, 3L, 1L, 750000L)))
    assert(got("order_cust_priority") == ((4L, 2L, 3L, 1L, 750000L)))
  }

  test("splitBalance: deterministic hash split matches a brute-force reference") {
    val docs = (1L to 300L).map(i => (i, if (i % 3 == 0L) "de" else "en", "s"))
    val d = plantAudit(docs, Seq((1L, 0, "AUTO")), Seq((1L, 1L, "1-URGENT")))
    val P = 2147483647L
    def split(id: Long): String = {
      val b = (id % P) * 2654435761L % P % 100
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    val cells = docs.groupBy(t => (split(t._1), t._2))
      .view.mapValues(_.size.toLong).toMap
    val rt = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val n = 300L
    val got = Stats.splitBalance(spark, d).collect()
    assert(got.length == cells.size, "one row per non-empty cell")
    assert(got.map(_.getString(0)).toSet == cells.keySet.map(_._1),
      "every split the hash produced is present")
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val o = cells(key)
      assert(r.getLong(2) == o, s"observed $key")
      assert(r.getLong(3) == rt(key._1) && r.getLong(4) == ct(key._2))
      assert(r.getLong(5) == rt(key._1) * ct(key._2) * 100 / n)
      assert(r.getLong(6) == o * o * 1000000L / rt(key._1) * n / ct(key._2),
        s"cell staging $key")
    }
  }

  test("contractAudit: each planted violation lands in exactly its rule") {
    val dir = Files.createTempDirectory("graft-contract").toString
    // customer 1..3: one negative balance, one null segment
    Seq((1L, Some("AUTO"), 100.0), (2L, None, -50.0), (3L, Some("BIKE"), 0.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal").coalesce(1)
      .write.parquet(s"$dir/customer.parquet")
    // orders 1..4: order 4 references the missing customer 99
    Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 99L))
      .toDF("o_orderkey", "o_custkey")
      .withColumn("o_totalprice", lit(100.0)).coalesce(1)
      .write.parquet(s"$dir/orders.parquet")
    // lineitems: one orphan orderkey (77), quantities 0 and 51 out of
    // range (the orphan row's quantity is legal — rules are independent)
    Seq((1L, 5.0), (2L, 0.0), (3L, 51.0), (77L, 10.0))
      .toDF("l_orderkey", "l_quantity").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    // documents: one n_chars lie
    Seq((1L, "abc", 3L), (2L, "abcd", 99L))
      .toDF("doc_id", "text", "n_chars").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = Stats.contractAudit(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("fk_orders_customer") == ((4L, 1L, 250000L)))
    assert(got("fk_lineitem_orders") == ((4L, 1L, 250000L)))
    assert(got("range_quantity") == ((4L, 2L, 500000L)))
    assert(got("doc_chars_match") == ((2L, 1L, 500000L)))
    assert(got("null_mktsegment") == ((3L, 1L, 333333L)))
    assert(got("negative_acctbal") == ((3L, 1L, 333333L)))
  }

  test("mutualInformation: perfect dependence gives ln2, independence gives 0") {
    // docs: lang fully determined by source -> MI = ln2 (693147 q6);
    // customer: segment x nation perfectly independent -> MI = 0;
    // orders: single status value -> MI = 0 (no uncertainty to share)
    val d = plantAudit(
      docs = Seq((1L, "en", "A"), (2L, "en", "A"),
        (3L, "de", "B"), (4L, "de", "B")),
      cust = Seq((1L, 0, "AUTO"), (2L, 1, "AUTO"),
        (3L, 0, "BIKE"), (4L, 1, "BIKE")),
      ords = Seq((1L, 1L, "1-URGENT"), (2L, 1L, "2-HIGH")))
    val got = Stats.mutualInformation(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("doc_lang_source") == ((4L, 2L, 693147L)), s"got $got")
    assert(got("cust_segment_nation") == ((4L, 4L, 0L)))
    assert(got("order_status_priority") == ((2L, 2L, 0L)))
  }

  test("psiDrift: identical distributions give zero terms, a shifted one doesn't") {
    val dir = Files.createTempDirectory("graft-psi").toString
    // ref (1995): prices 1..20; cur (1997): same multiset -> every
    // bucket has c_ref = c_cur = 2 and u = v -> all terms exactly 0
    val ref = (1L to 20L).map(i => (i, i.toDouble, "1995-03-01"))
    val cur = (1L to 20L).map(i => (100 + i, i.toDouble, "1997-03-01"))
    (ref ++ cur).toDF("o_orderkey", "o_totalprice", "ds")
      .withColumn("o_orderdate", to_timestamp($"ds")).drop("ds")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val got = Stats.psiDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10 && got.forall(r => r._2 == 2L && r._3 == 2L)
      && got.forall(_._4 == 0L), s"got ${got.toSeq}")

    // all current mass at the top -> the top bucket's term dominates
    // and every term stays non-negative (PSI is a divergence)
    val dir2 = Files.createTempDirectory("graft-psi2").toString
    val cur2 = (1L to 20L).map(i => (100 + i, 20.0, "1997-03-01"))
    (ref ++ cur2).toDF("o_orderkey", "o_totalprice", "ds")
      .withColumn("o_orderdate", to_timestamp($"ds")).drop("ds")
      .coalesce(1).write.parquet(s"$dir2/orders.parquet")
    val got2 = Stats.psiDrift(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got2.forall(_._2 >= 0L), "divergence terms are non-negative")
    assert(got2.filter(_._1 == 10L).head._2 ==
      got2.map(_._2).max, "the receiving bucket carries the largest term")
    assert(got2.map(_._2).sum > 500000L,
      "concentrated drift pushes PSI past the 0.5 alarm range")
  }

  test("chiSquared: independent margins give near-zero statistic") {
    // perfectly proportional table: O = [[8,12],[16,24]] => chi2 = 0
    def rows(n: Int, from: Long, st: String, pr: String) =
      (from until from + n).map(k => (k, st, 1000.0, pr))
    val d = plantOrders(
      rows(8, 0L, "F", "1-URGENT") ++ rows(12, 100L, "O", "1-URGENT") ++
      rows(16, 200L, "F", "2-HIGH") ++ rows(24, 300L, "O", "2-HIGH"))
    val cells = Stats.chiSquared(spark, d).collect()
    val chi2q6 = cells.map(_.getLong(6)).sum - 60L * 1000000L
    assert(chi2q6 <= 0L && chi2q6 >= -8L,
      s"floors may undershoot zero by <=2 micro-units/cell, got $chi2q6")
  }

  test("aucRanked: perfect separation = exactly 1e6; hand-computed " +
    "interleave = 0.75") {
    // positives ('F') strictly above all negatives: ranks 3,4 of 4
    // ⇒ AUC = (2·7 − 2·3)/(2·2·2) = 1
    val perfect = plantOrders(Seq(
      (1L, "O", 100.00, "1-URGENT"), (2L, "O", 200.00, "1-URGENT"),
      (3L, "F", 300.00, "1-URGENT"), (4L, "F", 400.00, "1-URGENT")))
    val p = Stats.aucRanked(spark, perfect).collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) ==
      (4L, 2L, 2L, 1000000L), s"perfect separation must score 1e6: $p")
    // interleaved F at ranks 2 and 4 ⇒ (2·6 − 6)/8 = 0.75
    val mixed = plantOrders(Seq(
      (1L, "O", 100.00, "1-URGENT"), (2L, "F", 200.00, "1-URGENT"),
      (3L, "O", 300.00, "1-URGENT"), (4L, "F", 400.00, "1-URGENT")))
    val m = Stats.aucRanked(spark, mixed).collect().head
    assert(m.getLong(3) == 750000L, s"interleave must score exactly 0.75: $m")
  }

  test("decileGains: 10 near-equal buckets, monotone cumulative capture " +
    "ending at exactly 1e6") {
    val rows = Stats.decileGains(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "10 buckets")
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"NTILE populations differ by ≤1: ${sizes.toSeq}")
    val cum = rows.map(_.getLong(4))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b }, "monotone")
    assert(cum.last == 1000000L, s"full capture at decile 10, got ${cum.last}")
  }

  test("targetEncoding: out-of-fold means exclude the fold's own labels " +
    "— hand-computed smoothed rationals") {
    // one category, folds by o_orderkey % 5: fold 0 holds BOTH
    // positives, folds 1/2 hold a negative each. N=4, P=2, α=10.
    val d = plantOrders(Seq(
      (0L, "F", 100.0, "1-URGENT"), (5L, "F", 200.0, "1-URGENT"),
      (1L, "O", 300.0, "1-URGENT"), (2L, "O", 400.0, "1-URGENT")))
    val got = Stats.targetEncoding(spark, d).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // fold 0 must NOT see its own two positives: sum_excl = 0,
    // enc = (0·4 + 10·2)·10⁶ div ((2+10)·4) = 416666
    assert(got(("1-URGENT", 0L)) == ((2L, 0L, 416666L)),
      s"fold 0 leaked its own labels: ${got(("1-URGENT", 0L))}")
    // fold 1 sees both positives: (2·4 + 20)·10⁶ div ((3+10)·4) = 538461
    assert(got(("1-URGENT", 1L)) == ((3L, 2L, 538461L)),
      s"fold 1 encoding wrong: ${got(("1-URGENT", 1L))}")
  }

  test("cuped: y = 2x collapses both variants onto the pooled mean; " +
    "a constant covariate leaves the raw means untouched") {
    // y exactly 2x: θ must be exactly 2, and every adjusted mean
    // equals 2·mean(x) — the variant difference in x is fully
    // explained, so both variants read the SAME adjusted metric even
    // though their raw means differ
    val per = Seq(
      (0L, 100L, 200L), (2L, 300L, 600L), (4L, 500L, 1000L),
      (1L, 200L, 400L), (3L, 400L, 800L), (5L, 900L, 1800L))
      .toDF("user_id", "x", "y")
    val got = Stats.cupedFromPerUser(per).collect()
    assert(got.length == 2)
    // mean(x) = 2400/6 = 400 ⇒ adjusted mean = 800 everywhere
    got.foreach { r =>
      assert(r.getLong(3) == 2000000L, s"theta must be exactly 2, got $r")
      assert(r.getLong(4) == 800000000L,
        s"adjusted mean must be 2*mean(x) = 800 q6, got $r")
    }
    // raw means differ: variant 0 = (200+600+1000)/3 = 600,
    // variant 1 = (400+800+1800)/3 = 1000
    assert(got.map(_.getLong(2)).toSeq == Seq(600000000L, 1000000000L))

    // a CONSTANT covariate has var(X) = 0: D = 0 makes every division
    // NULL-divide — the readout must surface nulls, never a wrong
    // number (callers fall back to the raw mean, which stays exact)
    val flat = Seq((0L, 7L, 10L), (1L, 7L, 30L)).toDF("user_id", "x", "y")
    val fr = Stats.cupedFromPerUser(flat).collect()
    assert(fr.map(_.getLong(2)).toSeq == Seq(10000000L, 30000000L),
      "raw means must survive a degenerate covariate")
    assert(fr.forall(r => r.isNullAt(3) && r.isNullAt(4)),
      "zero-variance covariate must yield NULL theta/adjusted, not a value")
  }

  test("calibrationTable: hand-computed per-bin conf/acc/gap and ECE " +
    "on 4 planted rows") {
    // ranks 1..4 by price; bucket = ((r−1)·10) div 4 + 1 → 1,3,6,8;
    // singleton bins: conf = 250000·r, acc = y·10⁶
    val d = plantOrders(Seq(
      (1L, "O", 100.00, "1-URGENT"), (2L, "F", 200.00, "1-URGENT"),
      (3L, "O", 300.00, "1-URGENT"), (4L, "F", 400.00, "1-URGENT")))
    val rows = Stats.calibrationTable(spark, d).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 250000L, 0L, 250000L),
      (3L, 1L, 1L, 500000L, 1000000L, 500000L),
      (6L, 1L, 0L, 750000L, 0L, 750000L),
      (8L, 1L, 1L, 1000000L, 1000000L, 0L)), s"bins: ${got.toSeq}")
    // ECE = (250000 + 500000 + 750000 + 0) div 4 = 375000, identical
    // on every row
    assert(rows.map(_.getLong(6)).distinct.toSeq == Seq(375000L))
  }

  test("calibrationTable: sf0.001 invariants — near-equal NTILE " +
    "populations, ECE equals the row-derived sum") {
    val rows = Stats.calibrationTable(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "10 bins")
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"equal-population: ${sizes.toSeq}")
    val n = sizes.sum
    val ece = rows.map(r => r.getLong(1) * r.getLong(5)).sum / n
    assert(rows.head.getLong(6) == ece,
      s"ECE must equal the row-derived value $ece, got ${rows.head.getLong(6)}")
  }

  /** orders + customer pair for the rank-correlation fixtures. */
  private def plantSpend(orders: Seq[(Long, Long, Double)],
                         cust: Seq[(Long, Double)]): String = {
    val dir = Files.createTempDirectory("graft-spearman").toString
    orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .select($"o_orderkey", $"o_custkey", lit("F").as("o_orderstatus"),
        $"o_totalprice", to_timestamp(lit("1995-06-01")).as("o_orderdate"),
        lit("1-URGENT").as("o_orderpriority"))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    cust.toDF("c_custkey", "c_acctbal")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    dir
  }

  test("spearmanCorr: concordant = exactly 1e6, reversed = −1e6, one " +
    "swap on 3 rows = exactly 0.5") {
    def rho(d: String): (Long, Long, Long) = {
      val r = Stats.spearmanCorr(spark, d).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // spend order == balance order ⇒ Σd² = 0 ⇒ ρ = 1
    val conc = plantSpend(
      Seq((1L, 1L, 10.00), (2L, 2L, 20.00), (3L, 3L, 30.00)),
      Seq((1L, 1.00), (2L, 2.00), (3L, 3.00)))
    assert(rho(conc) == ((3L, 0L, 1000000L)), "concordant")
    // spend order reversed vs balance ⇒ Σd² = 4+0+4 ⇒ ρ = −1
    val rev = plantSpend(
      Seq((1L, 1L, 30.00), (2L, 2L, 20.00), (3L, 3L, 10.00)),
      Seq((1L, 1.00), (2L, 2.00), (3L, 3.00)))
    assert(rho(rev) == ((3L, 8L, -1000000L)), "reversed")
    // customers 2 and 3 swapped in spend ⇒ Σd² = 2 ⇒
    // ρ = 1 − 6·2/(3·8) = 0.5; customer 4 has no orders — dropped
    val mix = plantSpend(
      Seq((1L, 1L, 10.00), (2L, 2L, 30.00), (3L, 3L, 20.00)),
      Seq((1L, 1.00), (2L, 2.00), (3L, 3.00), (4L, 9.00)))
    assert(rho(mix) == ((3L, 2L, 500000L)), "one swap")
  }

  test("conformalThreshold: K = ceil((n+1)·0.9) order statistic, " +
    "empirical coverage on the disjoint split") {
    // cal = even keys, scores 10..100; n=10 ⇒ K = ⌈9.9⌉ = 10 ⇒
    // threshold = 100.00 (10000 cents). test = odd keys: 5 at/below,
    // 5 above ⇒ coverage exactly 0.5
    val cal = (1 to 10).map(i => (i * 2L, "F", i * 10.0, "1-URGENT"))
    val tst = (1 to 10).map(i =>
      (i * 2L - 1L, "F", if (i <= 5) 50.0 else 200.0, "1-URGENT"))
    val d = plantOrders(cal ++ tst)
    val r = Stats.conformalThreshold(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((10L, 10L, 10000L, 10L, 5L, 500000L)), s"got $r")
  }

  test("kAnonymity: class sizes, sensitive diversity, and both risk " +
    "flags on planted quasi-identifier cells") {
    val dir = Files.createTempDirectory("graft-kanon").toString
    // (1,A): 6 rows mixed sign — safe. (1,B): 2 rows, one sign —
    // k-risk AND l-risk. (2,A): 5 rows, one sign — l-risk only.
    val rows = Seq.fill(3)((1L, "A", 10.0)) ++ Seq.fill(3)((1L, "A", -10.0)) ++
      Seq.fill(2)((1L, "B", 5.0)) ++ Seq.fill(5)((2L, "A", -1.0))
    rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      .withColumn("c_custkey", monotonically_increasing_id())
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    val got = Stats.kAnonymity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, "A", 6L, 2L, 0L, 0L),
      (1L, "B", 2L, 1L, 1L, 1L),
      (2L, "A", 5L, 1L, 0L, 1L)), s"got ${got.toSeq}")
  }

  test("qiniCurve: hand-computed cumulative uplift; no-controls-yet " +
    "prefix yields NULL, balanced end cancels to exactly 0") {
    // plantOrders: custkey = key % 7, so keys 1/3 are treated (odd)
    // and 2/4 control. Ranks by price desc land one row per bucket
    // 1,3,6,8. n_t = 2.
    val d = plantOrders(Seq(
      (1L, "F", 400.00, "1-URGENT"), (2L, "O", 300.00, "1-URGENT"),
      (3L, "O", 200.00, "1-URGENT"), (4L, "F", 100.00, "1-URGENT")))
    val rows = Stats.qiniCurve(spark, d).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5))))
    // b1: cnc=0 → NULL; b3/b6: (1·1 − 0)·10⁶ div (1·2) = 500000;
    // b8: (1·2 − 1·2) div (2·2) = 0
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 1L, 0L, None),
      (3L, 0L, 1L, 0L, 0L, Some(500000L)),
      (6L, 1L, 0L, 0L, 0L, Some(500000L)),
      (8L, 0L, 1L, 0L, 1L, Some(0L))), s"got ${got.toSeq}")
  }

  test("wilsonRanking: the interval bound inverts the raw-rate order " +
    "— 2/2 must rank below 95/100") {
    val dir = Files.createTempDirectory("graft-wilson").toString
    val rows = Seq.fill(2)((1L, "N")) ++
      Seq.fill(95)((2L, "N")) ++ Seq.fill(5)((2L, "R"))
    rows.toDF("l_suppkey", "l_returnflag")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val got = Stats.wilsonRanking(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val (p1, w1) = got(1L)
    val (p2, w2) = got(2L)
    assert(p1 == 1000000L && p2 == 950000L, s"raw rates: $got")
    assert(w1 < w2, s"2/2 must bound BELOW 95/100: $got")
    assert(w1 > 0L && w2 < 1000000L, s"bounds inside (0,1): $got")
  }

  test("abZTest: perfect separation scores z = 2√2 exactly at q6; a " +
    "balanced split scores 0, not significant") {
    // plantOrders: custkey = key % 7; treated = odd custkey.
    // keys 1,3,5,8 → custkeys 1,3,5,1 (treated); 2,4,6,7 → 2,4,6,0
    def plant(statuses: Map[Long, String]): String = plantOrders(
      (1L to 8L).map(k => (k, statuses(k), 100.0, "1-URGENT")))
    // treated 4/4 convert, control 0/4: z = 1/√0.125 = 2√2
    val sep = plant(Map(1L -> "F", 3L -> "F", 5L -> "F", 8L -> "F",
      2L -> "O", 4L -> "O", 6L -> "O", 7L -> "O"))
    val r = Stats.abZTest(spark, sep).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 4L, 4L, 0L)), s"cells: $r")
    assert(r.getLong(6) == 2828427L && r.getLong(7) == 1L,
      s"z = 2828427 q6, significant: $r")
    // 2/4 in both arms: z exactly 0
    val bal = plant(Map(1L -> "F", 3L -> "F", 5L -> "O", 8L -> "O",
      2L -> "F", 4L -> "F", 6L -> "O", 7L -> "O"))
    val b = Stats.abZTest(spark, bal).collect().head
    assert(b.getLong(6) == 0L && b.getLong(7) == 0L, s"null effect: $b")
  }

  test("conformalByGroup: each group gets its own K-th order statistic " +
    "and coverage — the q228 fixture twice, shifted") {
    // group 1-URGENT: cal scores 10..100, test 5 covered / 5 not;
    // group 2-HIGH: same shape at 1010..1100
    val rows =
      (1 to 10).map(i => (i * 2L, "F", i * 10.0, "1-URGENT")) ++
      (1 to 10).map(i =>
        (i * 2L - 1L, "F", if (i <= 5) 50.0 else 200.0, "1-URGENT")) ++
      (1 to 10).map(i => (100L + i * 2L, "F", 1000.0 + i * 10.0, "2-HIGH")) ++
      (1 to 10).map(i =>
        (99L + i * 2L, "F", if (i <= 5) 1050.0 else 2000.0, "2-HIGH"))
    val d = plantOrders(rows)
    val got = Stats.conformalByGroup(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("1-URGENT", 10L, 10L, 10000L, 10L, 5L, 500000L),
      ("2-HIGH", 10L, 10L, 110000L, 10L, 5L, 500000L)), s"got ${got.toSeq}")
  }

  test("srmCheck: total concentration scores chi2 = 3n and flags; a " +
    "perfectly balanced split scores exactly 0") {
    // plantOrders: custkey = key % 7, arm = custkey % 4.
    // custkeys 0 and 4 both land arm 0: all 8 rows in one arm
    val conc = plantOrders(Seq(0L, 4L, 7L, 11L, 14L, 18L, 21L, 25L)
      .map(k => (k, "F", 100.0, "1-URGENT")))
    val r = Stats.srmCheck(spark, conc).collect().head
    // chi2num = (32-8)^2 + 3*64 = 768, chi2 = 768e6/32 = 24e6 = 3n
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((8L, 8L, 0L, 0L, 0L)), s"cells: $r")
    assert(r.getLong(5) == 24000000L && r.getLong(6) == 1L, s"flag: $r")
    // keys 0..3, 7..10 -> arms 0..3 twice: 2/2/2/2
    val bal = plantOrders((Seq(0L, 1L, 2L, 3L, 7L, 8L, 9L, 10L))
      .map(k => (k, "F", 100.0, "1-URGENT")))
    val b = Stats.srmCheck(spark, bal).collect().head
    assert(b.getLong(5) == 0L && b.getLong(6) == 0L, s"balanced: $b")
  }

  test("stratifiedAte: opposite per-stratum effects, never-ordered " +
    "customers count as y=0, off-support stratum reports NULL") {
    val dir = Files.createTempDirectory("graft-sate").toString
    // A: treated (odd keys) 2/2 convert vs control 0/2 -> +1;
    // B: mirrored -> -1; C: one treated customer only -> NULL.
    // customer 2 has NO orders at all (left-join y=0 path).
    Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
        (5L, "B"), (6L, "B"), (7L, "B"), (8L, "B"), (9L, "C"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, "F"), (2L, 3L, "F"), (3L, 4L, "O"),
        (4L, 6L, "F"), (5L, 8L, "F"), (6L, 5L, "O"), (7L, 9L, "O"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val got = Stats.stratifiedAte(spark, dir).collect()
    val byS = got.map(r => r.getString(0) -> r).toMap
    val a = byS("A")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4),
      a.getLong(5)) == ((4L, 2L, 2L, 2L, 0L)), s"A cells: $a")
    assert(a.getLong(6) == 1000000L, s"A effect: $a")
    // weight 4/9: wterm = floor(4e6/9) = 444444
    assert(a.getLong(7) == 444444L, s"A wterm: $a")
    val b = byS("B")
    assert(b.getLong(6) == -1000000L && b.getLong(7) == -444445L,
      s"B (floor of -4e6/9): $b")
    val c = byS("C")
    assert(c.isNullAt(6) && c.isNullAt(7), s"C off-support: $c")
  }

  test("diffInDiff: hand-computed cell means, shared trend cancelled") {
    val dir = Files.createTempDirectory("graft-did").toString
    // control 15→25, treated 20→50: DiD = 30 − 10 = 20.00 exactly
    Seq((1L, 2L, 10.00, "1997-06-01"), (2L, 2L, 20.00, "1997-06-01"),
        (3L, 2L, 20.00, "1999-06-01"), (4L, 2L, 30.00, "1999-06-01"),
        (5L, 1L, 10.00, "1997-06-01"), (6L, 1L, 30.00, "1997-06-01"),
        (7L, 1L, 40.00, "1999-06-01"), (8L, 1L, 60.00, "1999-06-01"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "ds")
      .select($"o_orderkey", $"o_custkey", lit("F").as("o_orderstatus"),
        $"o_totalprice", to_timestamp($"ds").as("o_orderdate"),
        lit("1-URGENT").as("o_orderpriority"))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val rows = Stats.diffInDiff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 2L, 1500000000L, 2000000000L),
      (0L, 1L, 2L, 2500000000L, 2000000000L),
      (1L, 0L, 2L, 2000000000L, 2000000000L),
      (1L, 1L, 2L, 5000000000L, 2000000000L)), s"got ${rows.toSeq}")
  }

  test("kendallTauB: brute-force BigInt recomputation at sf0.001 — a " +
    "third independent implementation agrees on every output") {
    val dir = "/root/testdata/sf0.001"
    val got = Stats.kendallTauB(spark, dir).collect().head
    // recompute from the same daily frame in plain Scala
    val daily = graft.sources.Tables.orders(spark, dir)
      .select(to_date($"o_orderdate").as("day"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy($"day")
      .agg(count(lit(1)).as("x"), sum($"c").as("y"))
      .as[(java.sql.Date, Long, Long)].collect()
      .sortBy(_._1.getTime)
    val n = daily.length
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n) {
      s += java.lang.Long.signum(daily(j)._2 - daily(i)._2) *
        java.lang.Long.signum(daily(j)._3 - daily(i)._3)
    }
    def tiePairs[K](key: ((java.sql.Date, Long, Long)) => K): BigInt =
      daily.groupBy(key).values
        .map(g => BigInt(g.size) * (g.size - 1) / 2).sum
    val (tx, ty, txy) =
      (tiePairs(_._2), tiePairs(_._3), tiePairs(r => (r._2, r._3)))
    val n0 = BigInt(n) * (n - 1) / 2
    def signedDiv(num: BigInt, den: BigInt): Long =
      (if (num < 0) -((-num) / den) else num / den).toLong
    assert(got.getLong(0) == n && got.getLong(1) == s)
    assert(got.getLong(2) == tx.toLong && got.getLong(3) == ty.toLong &&
      got.getLong(4) == txy.toLong)
    assert(got.getLong(5) == signedDiv(BigInt(s) * 1000000, n0))
    assert(got.getLong(6) == signedDiv(
      BigInt(s).sign * BigInt(s) * s * BigInt("1000000000000"),
      (n0 - tx) * (n0 - ty)))
    assert(got.getLong(7) == signedDiv(BigInt(s) * 1000000, n0 - tx))
    // and the census really exercised ties (x is a small discrete count)
    assert(tx > 0, "the day lattice must contain x ties for this test " +
      "to mean anything")
  }
}
