package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin

/** Salted equi-join: exact equality with the plain join on a
  * deliberately skewed key distribution, and the salt really spreads
  * the hot key across sub-partitions.
  */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (0) carrying half the rows, a long tail for the rest
  // (hot rows take contiguous seq values so the salt — seq mod 8 —
  // actually varies within the hot key)
  private def skewed = {
    val rows = (0 until 20000).map { i =>
      val k = if (i < 10000) 0L else (i % 500).toLong
      (k, i.toLong, i * 1.5)
    }
    rows.toDF("key", "seq", "amount")
  }
  private def dim =
    (0 until 500).map(k => (k.toLong, s"grp${k % 7}")).toDF("key", "grp")

  test("salted join equals the plain join exactly") {
    val plain = skewed.join(dim, "key")
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"amount").as("amt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = SaltedJoin.equiJoin(skewed, dim, "key", "seq", 8)
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"amount").as("amt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("the hot key spreads across all salt buckets") {
    // same salt the operator computes: hash(saltSource) mod buckets
    val b = skewed.withColumn("__salt", pmod(hash($"seq"), lit(8)).cast("int"))
    val spread = b.filter($"key" === 0L)
      .groupBy($"__salt").count().collect()
    assert(spread.length == 8, "hot key must occupy every salt bucket")
    // no bucket holds more than ~2x the mean — the skew is actually gone
    val counts = spread.map(_.getLong(1))
    assert(counts.max < 2 * counts.sum / counts.length)
  }

  test("row multiplicity survives duplicate small-side keys") {
    val dupDim = (Seq((0L, "a"), (0L, "b"), (1L, "c"))).toDF("key", "grp")
    val big = Seq((0L, 10L), (1L, 11L), (2L, 12L)).toDF("key", "seq")
    val plain = big.join(dupDim, "key").collect().length
    val salted = SaltedJoin.equiJoin(big, dupDim, "key", "seq", 4).collect().length
    assert(salted == plain && salted == 3)
  }
}
