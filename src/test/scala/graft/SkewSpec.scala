package graft

import org.apache.spark.sql.functions._

/** Skew demonstration for the salted two-phase aggregate: a key
  * distribution where one key owns half the rows is exactly where a
  * plain groupBy funnels 50% of the table through one reducer. The
  * salted form must produce identical results (it does — the
  * partial/merge pair is algebraic over exact decimals), while
  * spreading the hot key over `buckets` parallel sub-aggregations.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 400k rows: user 0 owns 50%; the rest spread over 1..1000.
  private lazy val skewed = spark.range(400000L)
    .select(
      when($"id" % 2 === 0, 0L)
        .otherwise(pmod($"id", lit(1000L)) + 1).as("user_id"),
      ($"id" % 997).cast("double").as("value"),
      $"id")

  test("salted aggregation equals the plain groupBy on a 50%-skewed key") {
    val t0 = System.nanoTime()
    val plain = skewed
      .groupBy($"user_id")
      .agg(
        round(sum($"value".cast("decimal(18,2)")).cast("double"), 2).as("total"),
        count(lit(1)).as("n"))
      .orderBy($"user_id")
      .collect()
    val tPlain = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val salted = graft.operators.SaltedAgg.sumCount(
        skewed, key = "user_id", valueCol = "value",
        saltSource = "id", buckets = 16)
      .orderBy($"user_id")
      .collect()
    val tSalted = (System.nanoTime() - t1) / 1e9

    info(f"plain=$tPlain%.2fs salted=$tSalted%.2fs (local[4]; the gap shows at cluster scale)")
    assert(salted.length == plain.length)
    assert(salted.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
           plain.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq)
  }

  test("AQE splits the skewed join partition and preserves results") {
    // force the skew machinery to engage at toy scale: every shuffle
    // partition over 16KB counts as skewed
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = spark.range(1001L).select($"id".as("user_id"),
        ($"id" % 7).as("segment"))
      val joined = skewed.join(dim, "user_id")
        .groupBy($"segment").agg(count(lit(1)).as("n"))
        .orderBy($"segment")
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // expected counts derivable exactly: user 0 (segment 0) has 200k rows
      val want = skewed.withColumn("segment", $"user_id" % 7)
        .groupBy($"segment").agg(count(lit(1)).as("n"))
        .orderBy($"segment")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot join partition as skewed")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hot key's partials actually spread across salt buckets") {
    // the hot key's rows are the even ids, so id mod 16 reaches the 8
    // even buckets — the point is the hot key fans out over many
    // parallel sub-aggregations instead of one reducer
    val partials = skewed
      .withColumn("__salt", pmod($"id", lit(16)))
      .filter($"user_id" === 0L)
      .groupBy($"__salt").count()
    assert(partials.count() == 8, "hot key should fan out across salt buckets")
  }

  test("partitionBalance: planted hot key surfaces as its reducer's load") {
    // lineitem plant: key 7 owns 900 of 1000 rows; 100 other keys get
    // one row each. The audit must (a) reproduce a brute-force Scala
    // reference of the same hash exactly and (b) put ~90% load and
    // hottest_key_rows == n_rows on key 7's pid.
    val dir = java.nio.file.Files.createTempDirectory("graft-bal").toString
    val keys = Seq.fill(900)(7L) ++ (100L until 200L)
    keys.toDF("l_orderkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val P = 2147483647L
    def pid(k: Long) = (k % P) * 2654435761L % P % 32
    val want = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .groupBy { case (k, _) => pid(k) }
      .map { case (p, m) =>
        val rows = m.values.sum
        p -> ((rows, m.size.toLong, m.values.max,
          math.round(rows.toDouble * 32 / 1000 * 10000) / 10000.0))
      }
    val got = graft.queries.Extended.partitionBalance(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got == want, s"got $got\nwant $want")
    val hot = got(pid(7L))
    assert(hot._3 == 900L && hot._1 >= 900L, "hot key owns its reducer")
    assert(hot._4 > 25.0, "load factor must flag the 90% reducer (~28.8x)")
  }
}
