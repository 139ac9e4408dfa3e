package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSource V2 generator: parallelism, exact generation vs a Scala
  * reference, and column pruning reaching the connector.
  */
class GenSourceSpec extends SparkSpec {
  import spark.implicits._

  private def gen(rows: Long, parts: Int) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("generates exactly the formula rows, independent of slicing") {
    val P = 2147483647L
    val want = (0L until 1000L).map { id =>
      val h = (id % P) * 2654435761L % P
      (id, h % 1000L, (h / 1000L) % 100000L)
    }.toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = gen(1000, parts).as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("plans the requested number of input partitions") {
    val rdd = gen(10000, 7).rdd
    assert(rdd.getNumPartitions == 7)
  }

  test("column pruning reaches the connector's read schema") {
    val df = gen(1000, 2).select($"bucket")
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("bucket"),
      s"connector must materialize only the projected column, " +
        s"got ${scan.scan.readSchema().fieldNames.toSeq}")
    // pruned read still yields the right values
    val got = df.as[Long].collect().sorted.toSeq
    val want = (0L until 1000L)
      .map(id => ((id % 2147483647L) * 2654435761L % 2147483647L) % 1000L)
      .sorted
    assert(got == want)
  }
}
