package graft

import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards against silent testdata-schema drift (the round-6 failure mode:
  * the driver regenerated events.parquet from INT64-nanos to timestamp[us]
  * and 35 queries went red with opaque per-query errors).
  *
  * Two layers:
  *  1. A fingerprint of every driver table's Spark-read schema. When the
  *     generator changes an encoding again this fails LOUDLY, naming the
  *     table and the diff, instead of 35 downstream errors.
  *  2. `Tables.events` round-trips all three physical `ts` encodings it
  *     dispatches on (legacy INT64-nanos-as-long, TIMESTAMP_NTZ µs,
  *     session-TZ TimestampType) to identical normalized instants.
  */
class TablesSchemaSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  // Raw spark.read schemas (no reader normalization) as of 2026-08-13.
  // timestamp[us] without timezone reads as TimestampNTZType ("timestamp_ntz").
  private val expected = Map(
    "region"     -> "r_regionkey:int, r_name:string",
    "nation"     -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer"   -> "c_custkey:bigint, c_name:string, c_nationkey:int, c_acctbal:double, c_mktsegment:string",
    "supplier"   -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part"       -> "p_partkey:bigint, p_name:string, p_brand:string, p_type:string, p_size:int, p_retailprice:double",
    "orders"     -> "o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string",
    "lineitem"   -> "l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, l_linenumber:int, l_quantity:double, l_extendedprice:double, l_discount:double, l_tax:double, l_returnflag:string, l_linestatus:string, l_shipdate:timestamp_ntz",
    "events"     -> "event_id:bigint, ts:timestamp_ntz, user_id:bigint, event_type:string, value:double, props:string",
    "documents"  -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")

  private def fingerprint(schema: StructType): String =
    schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")

  test("testdata schemas match recorded fingerprints (drift detector)") {
    // nanosAsLong must be off for the raw fingerprint: we want the type
    // Spark reads by default, and Tables.events may have flipped the conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val drift = sources.Tables.all.flatMap { t =>
      val got = fingerprint(spark.read.parquet(s"$sfDir/$t.parquet").schema)
      if (got == expected(t)) None
      else Some(s"  $t:\n    expected: ${expected(t)}\n    actual:   $got")
    }
    assert(drift.isEmpty,
      "\nTESTDATA SCHEMA CHANGED — update graft.sources.Tables readers " +
        "(and this fingerprint) for:\n" + drift.mkString("\n"))
  }

  test("Tables.events normalizes real testdata ts to TimestampType, rows > 0") {
    val ev = sources.Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1)
  }

  // One instant, expressed under each physical encoding the reader handles.
  private val instants = Seq(
    Instant.parse("2024-03-01T12:34:56.789Z"),
    Instant.parse("2023-11-15T00:00:00Z"))

  private def readMicros(dir: String): Seq[Long] =
    sources.Tables.events(spark, dir)
      .select(unix_micros(col("ts"))).orderBy("ts")
      .collect().map(_.getLong(0)).toSeq

  private val expectedMicros =
    instants.map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L).sorted

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events-fixture")
    d.toString
  }

  test("events reader: legacy INT64-nanos fixture normalizes correctly") {
    import spark.implicits._
    val dir = tmp()
    instants.map(i => i.getEpochSecond * 1000000000L + i.getNano)
      .toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = sources.Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(readMicros(dir) === expectedMicros)
  }

  test("events reader: TIMESTAMP_NTZ µs fixture normalizes correctly") {
    import spark.implicits._
    val dir = tmp()
    instants.map(i => LocalDateTime.ofInstant(i, ZoneOffset.UTC))
      .toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType === TimestampNTZType,
      "fixture must exercise the NTZ branch")
    val got = sources.Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(readMicros(dir) === expectedMicros)
  }

  test("reading µs-typed events leaves the nanos legacy conf untouched") {
    // The conf is session-global and silently changes how every genuine
    // INT64(NANOS) column in the session reads — Tables.events may only
    // flip it on the retry path, never preemptively.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val before = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    sources.Tables.events(spark, sfDir).limit(1).count()
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") === before)
  }

  test("events reader: genuine INT64 TIMESTAMP(NANOS) file takes the retry path") {
    // Spark cannot WRITE nanos-annotated parquet, so build the file with
    // the low-level parquet-hadoop writer: this is the encoding Spark 4
    // refuses outright ([ILLEGAL_PARQUET_TYPE]) unless the legacy conf is
    // on — the one case where Tables.events may set it.
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageTypeParser, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val dir = tmp()
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val path = new org.apache.hadoop.fs.Path(s"$dir/events.parquet/part-0.parquet")
    val writer = ExampleParquetWriter.builder(path).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    instants.foreach { i =>
      writer.write(gf.newGroup().append("ts", i.getEpochSecond * 1000000000L + i.getNano))
    }
    writer.close()
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val got = sources.Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(readMicros(dir) === expectedMicros)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong") // retry path set it
  }

  test("events reader: session-TZ TimestampType fixture passes through") {
    import spark.implicits._
    val dir = tmp()
    instants.map(java.sql.Timestamp.from)
      .toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = sources.Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(readMicros(dir) === expectedMicros)
  }
}
