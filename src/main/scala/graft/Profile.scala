package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement harness (guide §1): per-query wall time PLUS the
  * job/stage/task/shuffle telemetry the bench's single number hides.
  * Runs every query warm (one untimed pass, then a timed pass with a
  * listener attached) and prints one TSV row per query:
  *
  *   name  sec  jobs  stages  tasks  shufMB  taskSec  gcSec
  *
  * High `jobs` at low data = per-job fixed overhead (AQE stage
  * materialization, eager checkpoints, driver-side measure jobs);
  * high `tasks` per stage at low data = partition-count overhead;
  * taskSec >> sec×cores would mean real compute. NOT part of the
  * driver contract — a local optimization tool only.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k2=v2" — ad-hoc session confs for local
    // A/B experiments (this tool is NOT part of the driver contract)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Derived.ensureBudget(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuf = new AtomicLong; val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shuf.addAndGet(m.shuffleReadMetrics.totalBytesRead +
            m.shuffleWriteMetrics.bytesWritten)
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
        }
      }
    })
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      shuf.set(0); taskMs.set(0); gcMs.set(0)
    }
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // pass 1: warm (codegen, footer caches, Derived registry)
    ordered.foreach { case (name, fn) =>
      try runOne(fn)
      catch { case t: Throwable => System.err.println(s"WARM FAIL $name: $t") }
    }
    // pass 2: timed with telemetry
    println("query\tsec\tjobs\tstages\ttasks\tshufMB\ttaskSec\tgcSec")
    ordered.zipWithIndex.foreach { case ((name, fn), i) =>
      if (i > 0 && i % 25 == 0) System.gc()
      reset()
      val t0 = System.nanoTime()
      val ok = try { runOne(fn); true }
        catch { case t: Throwable =>
          System.err.println(s"FAIL $name: $t"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
      if (ok) println(f"$name\t$dt%.3f\t${jobs.get}\t${stages.get}\t" +
        f"${tasks.get}\t${shuf.get / 1048576.0}%.2f\t" +
        f"${taskMs.get / 1000.0}%.2f\t${gcMs.get / 1000.0}%.2f")
    }
    Derived.clear()
    spark.stop()
    sys.exit(0)
  }
}
