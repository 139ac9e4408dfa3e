package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Methodology:
  *  - The action is a `noop`-format write, not `count()`: counting
  *    lets Catalyst prune final projections and drop the presentation
  *    sort, so it understates full materialization cost. The noop sink
  *    consumes every row of the complete plan (sort and projection
  *    included) without paying filesystem I/O.
  *  - Each query runs `SPARK_GRAFT_BENCH_N` times (default 3) and
  *    reports the median, so one-time per-plan codegen compilation is
  *    excluded from the steady-state number. A session-level warmup
  *    pass pays JVM JIT + parquet-footer costs before timing starts.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q02_global_stats")
      .foreach(f => try run(f(spark, sfDir)) catch { case _: Throwable => () })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until n).map { _ =>
        val t0 = System.nanoTime()
        try run(fn(spark, sfDir)) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2) // median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n":$n,"action":"noop_write_median"}""")
    spark.stop()
  }

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
