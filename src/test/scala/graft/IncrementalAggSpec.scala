package graft

import graft.operators.IncrementalAgg

/** Algebraic-state guarantees of incremental aggregation: batch
  * arrival order and grouping must not change the state, and the
  * incremental path must equal the one-shot aggregate exactly.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq

  test("merged batches equal the one-shot aggregate, in any order") {
    val orders = graft.sources.Tables.orders(spark, d)
    val batches = (0 until 3).map(i => orders.filter($"o_orderkey" % 3 === i))
    val partials = batches.map(b =>
      IncrementalAgg.partialState(b, "o_orderstatus", "o_totalprice"))

    val oneShot = rows(IncrementalAgg.finalize(
      IncrementalAgg.partialState(orders, "o_orderstatus", "o_totalprice"),
      "o_orderstatus"))
    val leftFold = rows(IncrementalAgg.finalize(
      partials.reduce(IncrementalAgg.merge(_, _, "o_orderstatus")), "o_orderstatus"))
    val reversed = rows(IncrementalAgg.finalize(
      partials.reverse.reduce(IncrementalAgg.merge(_, _, "o_orderstatus")), "o_orderstatus"))

    assert(leftFold == oneShot)
    assert(reversed == oneShot)
  }

  test("retraction inverts insertion exactly; fully-retracted keys compact away") {
    import spark.implicits._
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val state = IncrementalAgg.partialState(orders, "o_orderstatus", "o_totalprice")
    // delete everything back out → every key's count hits zero
    val emptied = IncrementalAgg.compact(IncrementalAgg.merge(
      state,
      IncrementalAgg.retractState(orders, "o_orderstatus", "o_totalprice"),
      "o_orderstatus"))
    assert(emptied.count() == 0, "state after full retraction must compact to nothing")
    // delete a slice, re-insert it: state returns to the original
    val slice = orders.filter($"o_orderkey" % 11 === 0)
    val rounded = IncrementalAgg.merge(
      IncrementalAgg.merge(state,
        IncrementalAgg.retractState(slice, "o_orderstatus", "o_totalprice"),
        "o_orderstatus"),
      IncrementalAgg.partialState(slice, "o_orderstatus", "o_totalprice"),
      "o_orderstatus")
    def rows(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.finalize(df, "o_orderstatus").collect().map(_.toSeq).toSeq
    assert(rows(rounded) == rows(state), "retract+reinsert must be the identity")
  }
}
