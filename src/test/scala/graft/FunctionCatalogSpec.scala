package graft

import org.apache.spark.sql.functions._

/** V2 FunctionCatalog: the engine's functions callable from plain SQL
  * with codegen-friendly magic-method binding.
  */
class FunctionCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      "graft.functions.GraftFunctionCatalog")

  test("graft.genhash resolves from SQL and matches the closed form") {
    ensureCatalog()
    val got = spark.sql(
      "SELECT id, graft.genhash(id) AS h FROM range(1000)")
      .as[(Long, Long)].collect().toMap
    val P = 2147483647L
    (0L until 1000L).foreach { id =>
      assert(got(id) == (id % P) * 2654435761L % P, s"id=$id")
    }
  }

  test("graft.zorder2 from SQL is byte-identical to the ZOrder2 " +
    "Catalyst expression (the DataFrame lane)") {
    ensureCatalog()
    val fromSql = spark.sql(
      "SELECT id, graft.zorder2(id % 311, id % 97) AS z FROM range(500)")
      .as[(Long, Long)].collect().toMap
    val expr = graft.functions.ZOrder2(
      org.apache.spark.sql.catalyst.expressions.Literal(0L),
      org.apache.spark.sql.catalyst.expressions.Literal(0L))
    (0L until 500L).foreach { id =>
      val want = expr.nullSafeEval(id % 311, id % 97).asInstanceOf[Long]
      assert(fromSql(id) == want, s"id=$id")
    }
  }

  test("magic-method binding: the call plans as a direct invoke, not " +
    "a reflective produceResult") {
    ensureCatalog()
    val df = spark.sql("SELECT graft.genhash(id) AS h FROM range(10)")
    // Invoke-bound V2 functions render as invoke(<fn>.invoke(args))
    // in the optimized plan; ApplyFunctionExpression (the reflective
    // fallback) would render as its class
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("invoke(") && plan.contains("GenHash"), plan)
    assert(!plan.contains("ApplyFunctionExpression"),
      s"magic method must bind via Invoke, not reflection:\n$plan")
    assert(df.as[Long].collect().length == 10)
  }

  test("unknown function and wrong arity fail analysis with clear errors") {
    ensureCatalog()
    val missing = intercept[Exception](
      spark.sql("SELECT graft.nope(1)").collect())
    assert(missing.getMessage.toLowerCase.contains("nope"))
    val arity = intercept[Exception](
      spark.sql("SELECT graft.genhash(1, 2)").collect())
    assert(arity.getMessage.toLowerCase.contains("genhash"))
  }

  test("catalog lists its functions") {
    ensureCatalog()
    val listed = spark.sql("SHOW FUNCTIONS IN graft")
      .as[String].collect().map(_.split("\\.").last).toSet
    assert(Set("genhash", "zorder2", "kmv").subsetOf(listed),
      listed.toString)
  }

  test("kmv aggregate: exact below k, partition-invariant above it, " +
    "and the merge path agrees with a sequential reference") {
    ensureCatalog()
    // below k (15 distinct ids, duplicated rows): exact count
    val small = spark.sql(
      "SELECT graft.kmv(id % 15) FROM range(1000)").as[Long].head()
    assert(small == 15L, s"below-k groups serve the exact count: $small")
    // above k: equals the sequential KMV closed form, regardless of
    // how rows are split across partitions (merge associativity)
    val P = 2147483647L
    val hs = (0L until 50000L).map(id => (id % P) * 2654435761L % P)
      .distinct.sorted
    val want = 15L * P / hs(15)
    for (parts <- Seq(1, 7)) {
      val got = spark.range(0, 50000, 1, parts)
        .createOrReplaceTempView(s"kmv_in_$parts")
      val est = spark.sql(
        s"SELECT graft.kmv(id) FROM kmv_in_$parts").as[Long].head()
      assert(est == want, s"parts=$parts: $est != $want")
    }
  }

  test("kmv aggregate: negative BIGINT inputs hash via floorMod " +
    "(Java % would sort a negative 'hash' below every real value)") {
    ensureCatalog()
    val P = 2147483647L
    // sequential reference over the SAME floorMod hash
    val ids = (-25000L until 25000L)
    val hs = ids.map(id =>
        Math.floorMod(Math.floorMod(id, P) * 2654435761L, P))
      .distinct.sorted
    val want = 15L * P / hs(15)
    spark.range(0, 50000, 1, 5)
      .selectExpr("id - 25000 AS id").createOrReplaceTempView("kmv_neg")
    val est = spark.sql(
      "SELECT graft.kmv(id) FROM kmv_neg").as[Long].head()
    assert(est == want && est > 0, s"$est != $want")
  }
}
