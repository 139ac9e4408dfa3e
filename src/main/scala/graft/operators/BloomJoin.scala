package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pre-pass — the shuffle-reduction pattern the
  * anti/semi-join Scaladocs promise at scale: before shuffling a huge
  * fact table into a join, test each row's key against a bloom filter
  * of the (much smaller) other side and drop the guaranteed-misses at
  * the scan. Catalyst's own runtime-filter injection does exactly this
  * for eligible shuffle joins; this operator makes the pattern an
  * explicit, composable primitive (usable where the optimizer's
  * heuristics decline, e.g. ahead of a semi join against a filtered
  * key set).
  *
  * Built on Spark's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` expression pair (the same machinery
  * runtime filtering uses, xxhash64 on both sides), so the probe side
  * stays inside whole-stage codegen — no UDF. Bloom filters have no
  * false negatives, so `semiJoin` results are exactly the plain semi
  * join's; the false-positive fraction only costs shuffle bytes, and
  * the exact join scrubs it.
  *
  * The sketch itself (≈1.2 MB per million keys at the default FPP)
  * rides to the driver once and enters the plan as a literal — the
  * same single-small-object hop a broadcast var would take.
  */
object BloomJoin {

  /** Aggregate `key`'s xxhash64 values into a serialized bloom filter
    * (map-side partials, one merged sketch on the driver). */
  def keyBloom(df: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(col(key)))), expectedItems)
    df.select(Bridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Keep only rows whose `key` might be in the bloom filter —
    * codegen'd predicate, pushable right after the scan. */
  def preFilter(big: DataFrame, key: String, bloom: Array[Byte]): DataFrame = {
    val pred = BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Bridge.expression(col(key)))))
    big.filter(Bridge.column(pred))
  }

  /** Bloom-prefiltered left-semi join: identical results to
    * `big.join(small, …, "left_semi")`, minus the shuffle volume of
    * every key the bloom filter can rule out. */
  def semiJoin(big: DataFrame, bigKey: String,
               small: DataFrame, smallKey: String,
               expectedItems: Long): DataFrame = {
    val bloom = keyBloom(small, smallKey, expectedItems)
    val filtered = preFilter(big, bigKey, bloom)
    // resolve keys against their own side — same-named keys on both
    // frames would otherwise be AMBIGUOUS_REFERENCE
    filtered.join(small, filtered(bigKey) === small(smallKey), "left_semi")
  }
}
