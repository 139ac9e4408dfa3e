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

  test("row-group pruning: the box query admits strictly fewer row groups under z-order (parquet footers)") {
    // q67 computes the Morton key and q125 block-level skipping stats;
    // this closes the loop END-TO-END at the physical layer: write the
    // z-ordered parquet, read the actual FOOTERS back, and count which
    // row groups a (custkey, nationkey) box predicate admits under the
    // column min/max statistics — the exact metadata a scan's
    // row-group pruning consults — against the same count over an
    // unsorted layout of the same rows.
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("graft-zorder-rg").toString
    // sf0.1 (15K rows) + a small parquet block size → many row groups
    // per file, so the admit/total ratio is a real measurement
    val customers = graft.sources.Tables.customer(spark, "/root/testdata/sf0.1")
    val opts = Map("parquet.block.size" -> (32 * 1024).toString)
    graft.io.Sinks.writeZOrdered(customers, s"$base/zorder",
      "c_custkey", "c_nationkey", numFiles = 4, options = opts)
    customers.repartition(4)
      .write.options(opts).parquet(s"$base/unsorted")

    // a row group is ADMITTED when its [min,max] box for BOTH
    // predicate columns can intersect: c_custkey < 300 ∧ c_nationkey = 3
    def admitted(path: String): (Int, Int) = {
      val conf = spark.sessionState.newHadoopConf()
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      var total = 0
      var admit = 0
      fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(f.getPath, conf))
          try reader.getFooter.getBlocks.asScala.foreach { b =>
            total += 1
            def st(name: String) = b.getColumns.asScala
              .find(_.getPath.toDotString == name).get.getStatistics
            val ckMin = st("c_custkey").genericGetMin
              .asInstanceOf[java.lang.Long].longValue
            val nkMin = st("c_nationkey").genericGetMin
              .asInstanceOf[java.lang.Integer].intValue
            val nkMax = st("c_nationkey").genericGetMax
              .asInstanceOf[java.lang.Integer].intValue
            if (ckMin < 300L && nkMin <= 3 && nkMax >= 3) admit += 1
          } finally reader.close()
        }
      (admit, total)
    }
    val (zAdmit, zTotal) = admitted(s"$base/zorder")
    val (uAdmit, uTotal) = admitted(s"$base/unsorted")
    info(s"z-order admits $zAdmit/$zTotal row groups; unsorted $uAdmit/$uTotal")
    assert(zTotal >= 8 && uTotal >= 8,
      "layouts must produce several row groups for the measurement to mean anything")
    assert(zAdmit < uAdmit,
      s"z-order must admit strictly fewer row groups ($zAdmit/$zTotal) than unsorted ($uAdmit/$uTotal)")
    // pruning is metadata-only — the pruned layout still returns every match
    val expect = customers
      .filter($"c_nationkey" === 3 && $"c_custkey" < 300).count()
    val got = spark.read.parquet(s"$base/zorder")
      .filter($"c_nationkey" === 3 && $"c_custkey" < 300).count()
    assert(expect > 0 && got == expect,
      "the z-ordered layout must return exactly the matching rows")
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
