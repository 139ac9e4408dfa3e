package graft

import java.nio.file.Files

/** CREATE TABLE AS SELECT / REPLACE TABLE AS SELECT against the
  * versioned catalog.
  */
class CtasSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogRoot: String = {
    val root = Files.createTempDirectory("graft-gct").toString
    spark.conf.set("spark.sql.catalog.gct", "graft.io.AtomicCatalog")
    spark.conf.set("spark.sql.catalog.gct.root", root)
    root
  }

  test("CTAS creates, ids and loads; RTAS replaces schema and data") {
    catalogRoot
    spark.sql(
      "CREATE TABLE gct.t AS SELECT id, id * 2 AS v FROM range(0, 100)")
    assert(spark.sql("SELECT count(*), sum(v) FROM gct.t")
      .as[(Long, Long)].head == ((100L, 9900L)))
    spark.sql(
      "REPLACE TABLE gct.t AS " +
        "SELECT id, CAST(id AS STRING) AS s FROM range(0, 50)")
    assert(spark.table("gct.t").schema.fieldNames.toSeq ==
      Seq("id", "s"))
    assert(spark.sql("SELECT count(*) FROM gct.t").head.getLong(0)
      == 50L)
    spark.sql("DROP TABLE gct.t")
  }
}
