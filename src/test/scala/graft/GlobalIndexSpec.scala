package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalIndex

/** Distributed global row numbering: density, agreement with the
  * single-reducer window reference, and invariance to the input's
  * partition layout (the property the persist-between-passes exists
  * to protect).
  */
class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  private def reference(n: Int) = {
    // keys with heavy ties on k: total order needs the id tie-break
    (0 until n).map(i => (i.toLong, (i % 17).toLong)).toDF("id", "k")
  }

  test("dense 1..n and identical to the global-window reference under ties") {
    val df = reference(2000)
    val got = GlobalIndex.withRowNumber(df, Seq($"k", $"id"), "seq", parts = 8)
      .select($"id", $"seq").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("seq", row_number().over(Window.orderBy($"k", $"id")).cast("long"))
      .select($"id", $"seq").as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.values.toSeq.sorted == (1L to 2000L))
  }

  test("sequence is invariant to the input partition layout") {
    val base = reference(1500)
    val a = GlobalIndex.withRowNumber(base.repartition(13), Seq($"k", $"id"), "seq", parts = 5)
      .select($"id", $"seq").as[(Long, Long)].collect().toMap
    val b = GlobalIndex.withRowNumber(base.coalesce(1), Seq($"k", $"id"), "seq", parts = 5)
      .select($"id", $"seq").as[(Long, Long)].collect().toMap
    assert(a == b, "layout must not leak into the numbering")
  }

  test("withPrefixSums: several running totals in one pass match the " +
    "global-window reference (offsets branch)") {
    val df = reference(2000)
      .withColumn("one", lit(1L))
      .withColumn("w", ($"id" % 7).cast("long"))
    val got = GlobalIndex.withPrefixSums(df, Seq($"k", $"id"),
        Seq("one" -> "rn", "w" -> "cw"), parts = 8)
      .select($"id", $"rn", $"cw").as[(Long, Long, Long)]
      .collect().map { case (i, r, c) => i -> (r, c) }.toMap
    val wref = Window.orderBy($"k", $"id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("rn", sum($"one").over(wref))
      .withColumn("cw", sum($"w").over(wref))
      .select($"id", $"rn", $"cw").as[(Long, Long, Long)]
      .collect().map { case (i, r, c) => i -> (r, c) }.toMap
    assert(got == want)
  }

  test("withPrefixSums: single-partition branch equals the offsets branch") {
    val df = reference(600).withColumn("w", ($"id" % 5).cast("long"))
    def run(parts: Int) = GlobalIndex.withPrefixSums(df, Seq($"k", $"id"),
        Seq("w" -> "cw"), parts = parts)
      .select($"id", $"cw").as[(Long, Long)].collect().toMap
    assert(run(1) == run(7), "branch choice must not leak into the sums")
  }

  test("output partitioning stays parallel (no global-window funnel on the data)") {
    // AQE legitimately coalesces these tiny test partitions; switch
    // it off to observe the operator's own distribution
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val out = GlobalIndex.withRowNumber(reference(1000), Seq($"k", $"id"), "seq", parts = 6)
      assert(out.rdd.getNumPartitions > 1,
        "the numbered frame must remain range-distributed, not collapsed to one partition")
    } finally spark.conf.set(key, old)
  }
}
