package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Band/range join: pairs of rows with equal keys whose timestamps lie
  * within a tolerance of each other. A naive formulation is an
  * inequality join (O(|L|·|R|) per key); this one buckets time by the
  * tolerance and equi-joins on (key, bucket) with the right side
  * expanded to its three candidate buckets — |ta−tb| ≤ tol implies the
  * bucket indices differ by at most 1 — then applies the exact
  * predicate. The shuffle is a plain hash join on (key, bucket): at
  * 100 TB this is the difference between a broadcast-nested-loop plan
  * and a normal shuffle join.
  */
object RangeJoin {

  /** @param tsUs   column name holding microsecond timestamps (long)
    * @param tolUs  inclusive tolerance in microseconds */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
             tsUs: String, tolUs: Long, rightPrefix: String = "r_"): DataFrame = {
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "RangeJoin reserves the __bucket column name")
    val collisions = right.columns.filterNot(keys.contains)
      .map(rightPrefix + _).toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"left columns collide with prefixed right columns: $collisions " +
      "(pass a different rightPrefix)")
    val keyCols: Seq[Column] = keys.map(col)
    val rRenamed = right.columns.filterNot(keys.contains)
      .foldLeft(right)((df, c) => df.withColumnRenamed(c, s"$rightPrefix$c"))
    // integral div (not floor of a double quotient): at epoch-µs
    // magnitudes a double division can round across a bucket boundary,
    // and a one-off bucket on only one side would escape the ±1
    // neighbor expansion entirely
    val l = left.withColumn("__bucket", expr(s"$tsUs div ${tolUs}L"))
    val r = rRenamed
      .withColumn("__b0", expr(s"$rightPrefix$tsUs div ${tolUs}L"))
      .withColumn("__bucket", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    l.join(r, keys :+ "__bucket")
      .filter(abs(col(tsUs) - col(s"$rightPrefix$tsUs")) <= tolUs)
      .drop("__bucket")
  }
}
