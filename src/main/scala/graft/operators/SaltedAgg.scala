package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation: when a grouping key is hot
  * (few distinct values, e.g. 3 order statuses over 100 TB), a plain
  * groupBy funnels each hot key through one reducer. Salting splits
  * each key into `buckets` sub-groups aggregated in parallel, then
  * merges the partials — results are exactly the aggregates of the
  * unsalted groupBy when the partial/merge pair is algebraic
  * (sum/count here; exact decimal sums keep it order-independent).
  *
  * The salt is deterministic (`hash(saltSource) mod buckets`), not
  * random — reruns produce identical partials, and the oracle compares
  * against the plain GROUP BY. Hashing keeps the spread full-width
  * even for narrow-range salt sources (see [[SaltedJoin]]).
  */
object SaltedAgg {

  /** sum+count of `valueCol` (as DECIMAL(18,2)) per `key`, salted by
    * `hash(saltSource) mod buckets`. */
  def sumCount(df: DataFrame, key: String, valueCol: String,
               saltSource: String, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltSource)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(
        round(sum(col("__psum")).cast("double"), 2).as("total"),
        sum(col("__pcnt")).as("n"))
}
