package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.io.Sinks
import graft.sources.FileSources

/** Schema-enforced CSV/JSON sources round-trip with the sinks, and
  * malformed CSV rows are dropped (not nulled).
  */
class FileSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val partSchema = StructType(Seq(
    StructField("p_partkey", LongType), StructField("p_name", StringType),
    StructField("p_brand", StringType), StructField("p_type", StringType),
    StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))

  test("csv sink -> csv source round-trips with explicit schema") {
    val dir = Files.createTempDirectory("graft-fs").toString + "/part"
    val part = graft.sources.Tables.part(spark, "/root/testdata/sf0.001")
    Sinks.writeCsv(part, dir)
    val back = FileSources.readCsv(spark, dir, partSchema)
    assert(back.count() == 200)
    assert(back.schema == partSchema)
  }

  test("malformed csv rows are dropped under DROPMALFORMED") {
    val dir = Files.createTempDirectory("graft-fs").toString + "/bad"
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", DoubleType)))
    Seq("id,v", "1,2.5", "not_an_int,3.5", "2,4.5")
      .toDF("value").coalesce(1).write.text(dir)
    val got = FileSources.readCsv(spark, dir, schema)
      .collect().map(_.getInt(0)).sorted
    assert(got.toSeq == Seq(1, 2))
  }

  test("json-lines source reads with explicit schema") {
    val dir = Files.createTempDirectory("graft-fs").toString + "/json"
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", $"value")
    ev.write.json(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = FileSources.readJsonLines(spark, dir, schema)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.countDistinct($"event_id"))
      .collect().head.getLong(0) == 1000)
  }
}
