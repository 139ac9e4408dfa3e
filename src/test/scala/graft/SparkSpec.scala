package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite via lazy val. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // static conf — must be set before the first (shared) session builds;
    // used by specs that saveAsTable (bucketing)
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()

  /** Run `body` with the AQE advisory partition size forced to 1 byte,
    * so [[graft.operators.GlobalIndex]]'s scale-adaptive width (plan
    * size estimate ÷ advisory, clamped to the shuffle-partition cap)
    * picks the MULTI-partition scale path even over spec-sized inputs.
    * Plan-shape audits wrap their query construction in this so they
    * keep asserting the 100 TB shape (range fan-out, __pid-keyed
    * numbering windows, no data-sized single-partition exchange) —
    * without it a tiny input legitimately collapses to ONE range
    * partition (a deliberate REPARTITION_BY_NUM choice, not a funnel)
    * and the audit would have nothing to audit. */
  def withScaleShape[T](body: => T): T = {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "1b")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
