package graft
import org.apache.spark.sql.SparkSession

/** Bounded execution of one query body for the gate mains
  * ([[Verify]], [[Bench]]): run `body` on a worker thread, wait at
  * most `timeoutSec`, and on expiry cancel the query's Spark job
  * group and report failure instead of blocking the suite.
  *
  * Why this exists: round 10 shipped one query whose lazy per-level
  * persists compounded the logical plan exponentially — the ENTIRE
  * verify and bench runs hung on it and the round lost both
  * artifacts. The watchdog turns that failure mode into one red row.
  *
  * Cancellation is best-effort by design: `cancelJobGroup` kills
  * running jobs, but a runaway DRIVER-side phase (analysis/optimizer
  * on a pathological plan) is not a job and cannot be interrupted —
  * the worker thread is abandoned (daemon, so JVM exit is never
  * blocked) and its cores reclaimed when the loop eventually dies.
  * The suite moves on either way, which is the property that matters.
  */
object Watchdog {
  /** Right(()) on success; Left(message) on failure or timeout. */
  def run(spark: SparkSession, group: String, timeoutSec: Long)
         (body: => Unit): Either[String, Unit] = {
    @volatile var result: Either[String, Unit] = null
    val t = new Thread(() => {
      try {
        spark.sparkContext.setJobGroup(group, group, interruptOnCancel = true)
        body
        result = Right(())
      } catch {
        case e: Throwable =>
          result = Left(s"${e.getClass.getName}: ${e.getMessage}")
      } finally spark.sparkContext.clearJobGroup()
    }, s"watchdog-$group")
    t.setDaemon(true)
    t.start()
    t.join(timeoutSec * 1000L)
    if (t.isAlive) {
      spark.sparkContext.cancelJobGroup(group)
      t.join(5000L) // grace for the cancel to surface
      if (t.isAlive) Left(s"TIMEOUT after ${timeoutSec}s (thread abandoned)")
      else Option(result).getOrElse(Left(s"TIMEOUT after ${timeoutSec}s"))
    } else Option(result).getOrElse(Left("no result recorded"))
  }
}
