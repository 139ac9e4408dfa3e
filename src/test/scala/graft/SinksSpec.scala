package graft

import java.nio.file.Files

import graft.io.Sinks
import graft.queries.Extended

/** Sink + sketch specs: partitioned parquet round-trip with pruning
  * layout, and the HLL sketch's error bound vs the exact count.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned+sorted parquet write round-trips and lays out partition dirs") {
    val out = Files.createTempDirectory("graft-sink").toString + "/orders"
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("status", $"o_orderstatus")
    Sinks.writeParquet(orders, out,
      partitionCols = Seq("status"), sortCols = Seq("o_orderdate"),
      maxFilesPerPartition = 2)
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    // hive-style partition dirs exist → partition pruning on read
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("status=")) == 3)
    // pruned read only touches one directory
    val pruned = back.filter($"status" === "F")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanned.contains("PartitionFilters: [isnotnull(status"))
    assert(pruned.count() == orders.filter($"o_orderstatus" === "F").count())
  }

  test("orc write/read round-trips with pushdown-friendly layout") {
    val out = Files.createTempDirectory("graft-orc").toString + "/orders"
    val d = "/root/testdata/sf0.001"
    val orders = graft.sources.Tables.orders(spark, d)
    graft.io.Sinks.writeOrc(orders, out,
      partitionCols = Seq("o_orderstatus"), sortCols = Seq("o_orderdate"))
    val back = graft.sources.FileSources.readOrc(spark, out)
    assert(back.count() == orders.count())
    // partition pruning + predicate pushdown reach the ORC scan
    val pruned = back.filter($"o_orderstatus" === "F" && $"o_custkey" > 100)
    val leaves = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("PartitionFilters: [isnotnull(o_orderstatus"))
    assert(leaves.contains("PushedFilters: [IsNotNull(o_custkey), GreaterThan(o_custkey,100)"))
    assert(pruned.count() ==
      orders.filter($"o_orderstatus" === "F" && $"o_custkey" > 100).count())
    // values identical to the parquet source, not just counts
    val a = back.select($"o_orderkey", $"o_totalprice").orderBy($"o_orderkey").collect()
    val b = orders.select($"o_orderkey", $"o_totalprice").orderBy($"o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("csv export round-trips row count") {
    val out = Files.createTempDirectory("graft-csv").toString + "/part"
    Sinks.writeCsv(graft.sources.Tables.part(spark, "/root/testdata/sf0.001"), out)
    assert(spark.read.option("header", "true").csv(out).count() == 200)
  }

  test("jdbc append round-trips through an embedded Derby database") {
    // Embedded Derby (on the Spark unmanaged classpath) stands in for
    // the reference's PostgreSQL serving layer: a real JDBC driver,
    // real batched prepared-statement inserts, same Spark write path.
    val dbDir = Files.createTempDirectory("graft-derby").toString + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new java.util.Properties()
    val nation = graft.sources.Tables.nation(spark, "/root/testdata/sf0.001")
      .select($"n_nationkey", $"n_name", $"n_regionkey")

    Sinks.appendJdbc(nation, url, "nation_dim", props,
      batchSize = 7, connections = 2)
    val back = spark.read.jdbc(url, "nation_dim", props)
    assert(back.count() == 25)
    val got = back.collect()
      .map(r => (r.getInt(0), r.getString(1).trim, r.getInt(2))).toSet
    val want = nation.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(got == want)

    // append semantics: a second write adds rows instead of replacing
    Sinks.appendJdbc(nation, url, "nation_dim", props,
      batchSize = 7, connections = 2)
    assert(spark.read.jdbc(url, "nation_dim", props).count() == 50)
  }

  test("cosine_sim rejects non-float-array inputs at analysis time") {
    graft.functions.CosineSimilarity.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0, 2.0), array(1.0, 2.0))").collect()
    }
    assert(err.getMessage.contains("array<float>") ||
           err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("approx_count_distinct stays within HLL++ error bound of exact") {
    val rows = Extended.approxDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_orders") > 0L)
      assert(r.getAs[Boolean]("within_3sigma"),
        s"HLL++ estimate out of its 3-sigma contract for ${r.get(0)}")
    }
  }
}
