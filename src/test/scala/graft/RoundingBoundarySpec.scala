package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Pins the decimal-first rounding recipe for scale-4 money sums on an
  * exact .xx5 boundary — the case where rounding AFTER a double cast
  * diverges between engines (Spark rounds the double through its
  * shortest decimal string, so a sum printing as ".545" rounds up;
  * DuckDB's numeric path sees .54499… and rounds down; q109 hit this
  * at sf0.1). The contract: SUM(price·(1−disc)) rounds as the EXACT
  * decimal — HALF_UP — regardless of double representability.
  */
class RoundingBoundarySpec extends SparkSpec {

  test("discounted-revenue sum on a .xx5 boundary rounds HALF_UP exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-round-fixture").toString
    // 100.05 × (1−0.10) = 90.0450; 50.00 × (1−0.11) = 44.5000
    // exact decimal sum = 134.5450 → HALF_UP(2) = 134.55
    Seq(
      ("A", "F", 1.0, 100.05, 0.10, Timestamp.valueOf("1995-01-01 00:00:00")),
      ("A", "F", 1.0, 50.00, 0.11, Timestamp.valueOf("1995-01-02 00:00:00")))
      .toDF("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val row = queries.Analytics.pricingSummary(spark, dir).collect()(0)
    assert(row.getAs[Double]("sum_disc_price") === 134.55,
      "the exact decimal half-up result, not the double-string artifact")
  }
}
