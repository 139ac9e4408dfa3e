package graft

/** Contract guardrails on the driver-facing registry. */
class RegistrySpec extends SparkSpec {

  /** Queries intentionally registered without an oracle (driver records
    * a rows-only check); each needs a reason. */
  private val rowsOnly = Map(
    "q43_approx_distinct" -> "HLL sketch values are engine-specific")

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle or a documented rows-only reason") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly.keySet
    assert(missing.isEmpty, s"queries missing oracle + undocumented: $missing")
  }

  test("all queries return rows at sf0.001 (driver smoke shape)") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (_, fn) =>
      fn(spark, "/root/testdata/sf0.001").isEmpty
    }.map(_._1)
    // q08: the generator gives every customer at least one order, so
    // the anti join is correctly empty; q26/q27/q36: similarity
    // thresholds may yield zero pairs at the smallest scale factor.
    val allowEmpty = Set("q08_anti_join",
      "q26_ngram_jaccard", "q27_minhash_lsh", "q36_embedding_neardup",
      "q54_dup_clusters", "q57_hyperplane_neardup")
    assert(empty.forall(allowEmpty), s"unexpectedly empty: ${empty.filterNot(allowEmpty)}")
  }
}
