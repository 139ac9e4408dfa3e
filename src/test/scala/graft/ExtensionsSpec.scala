package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The native functions are reachable from SQL. `withExtensions` only
  * applies to a freshly built session (getOrCreate reuses the suite
  * session), so this spec applies GraftExtensions to a bare
  * SparkSessionExtensions instance to prove the wiring, and registers
  * on the live session via the same builders to prove SQL evaluation.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions wiring applies cleanly") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws on malformed injection
  }

  test("native functions evaluate from spark.sql once registered") {
    graft.functions.CosineSimilarity.register(spark)
    org.apache.spark.sql.graft.Bridge.registerFunction(
      spark, "shingle_hash", exprs => graft.functions.ShingleHash(exprs.head))
    val cos = spark.sql(
      "SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val sh = spark.sql("SELECT shingle_hash('a b c d') AS h")
      .collect().head.getSeq[Long](0)
    assert(sh.length == 2) // shingles: "a b c", "b c d"
  }
}
