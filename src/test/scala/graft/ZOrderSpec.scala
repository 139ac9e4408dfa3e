package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Z-order layout: rows matching a two-predicate box query must
  * concentrate in fewer files than a single-column sort puts them in —
  * that concentration is exactly what parquet min/max skipping turns
  * into unread files at scale.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  private def filesWithMatches(path: String): Long =
    spark.read.parquet(path)
      .filter($"c_nationkey" === 3 && $"c_custkey" < 300)
      .select(input_file_name()).distinct().count()

  test("box query touches fewer files under z-order than custkey sort") {
    val base = Files.createTempDirectory("graft-zorder").toString
    val customers = graft.sources.Tables.customer(spark, d)

    graft.io.Sinks.writeZOrdered(customers, s"$base/zorder",
      "c_custkey", "c_nationkey", numFiles = 8)
    customers.repartitionByRange(8, $"c_custkey")
      .sortWithinPartitions($"c_custkey")
      .write.parquet(s"$base/linear")

    val zFiles = filesWithMatches(s"$base/zorder")
    val linFiles = filesWithMatches(s"$base/linear")
    val matches = customers
      .filter($"c_nationkey" === 3 && $"c_custkey" < 300).count()
    info(s"matches=$matches zorderFiles=$zFiles linearFiles=$linFiles of 8")
    assert(matches > 0)
    assert(zFiles <= linFiles,
      "z-order must cluster the box query at least as tightly as a linear sort")
    assert(zFiles < 8, "z-order must not smear the box query over every file")
  }

  test("skippingStats: pruning is sound and effective — skipped blocks hold no matching rows") {
    val stats = graft.queries.Extended.skippingStats(spark, d).collect()
    val total = stats.map(_.getLong(1)).sum
    val tbl = graft.sources.Tables.customer(spark, d)
    assert(total == tbl.count(), "block row counts partition the table")
    // soundness: every row matching the query box lives in a block
    // flagged would_scan — metadata pruning may never lose a match
    val scanned = stats.filter(_.getBoolean(6)).map(_.getLong(0)).toSet
    import spark.implicits._
    val matchBlocks = graft.queries.Extended.skippingStatsRowBlocks(spark, d)
      .filter($"c_custkey".between(100, 200) && $"c_nationkey".between(5, 10))
      .select($"block").distinct().as[Long].collect().toSet
    assert(matchBlocks.subsetOf(scanned), "a matching row escaped the scan set")
    // effectiveness: the box query must skip most blocks
    assert(scanned.size * 4 <= stats.length,
      s"z-order block stats should prune ≥75% of blocks (scan ${scanned.size}/${stats.length})")
  }

  test("activityBitmap: set bits reconstruct exactly the observed week residues") {
    import graft.sources.Tables
    val got = graft.queries.Extended.activityBitmap(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    val weeks = Tables.orders(spark, d)
      .join(Tables.customer(spark, d), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey",
        expr("datediff(o_orderdate, DATE'1970-01-01') div 7").as("wk"))
      .distinct().collect()
      .groupBy(_.getInt(0))
      .map { case (n, rs) => n -> rs.map(_.getLong(1)).toSet }
    got.foreach { case (nation, bitmap, nBuckets, nWeeksExact) =>
      val bits = (0 until 63).filter(b => (bitmap & (1L << b)) != 0).toSet
      val want = weeks(nation).map(w => (w % 63).toInt)
      assert(bits == want, s"nation $nation bitmap bits != week residues")
      assert(nBuckets == want.size && nWeeksExact == weeks(nation).size)
      assert(nBuckets <= nWeeksExact, "residue folding can only lose buckets")
    }
  }

  test("z key round-trips both dimensions (bit interleave is lossless)") {
    val rows = graft.queries.Extended.zorderKey(spark, d).collect()
    rows.foreach { r =>
      val (ck, nk, z) = (r.getLong(0), r.getInt(1), r.getLong(2))
      var (ua, ub) = (0L, 0L)
      for (i <- 0 until 31) {
        ua |= ((z >> (2 * i)) & 1L) << i
        ub |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ua == ck && ub == nk)
    }
  }
}
