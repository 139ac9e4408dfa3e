package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingestion throughput benchmark — the direct comparison against the
  * reference's fact-load stage (BASELINE.md: 100M+ ratings in 8-12 min
  * on 4 cores, sample log 8,500 rec/s; 16-core claim ~4 min).
  *
  * Synthesizes a deterministic Netflix-format corpus (movie_titles.csv
  * + combined_data text with `MovieID:` blocks) under /tmp, then times
  * the full star build — positional fill-forward parse, dimension
  * assembly with surrogate keys, broadcast key resolution, parquet
  * fact write — and prints one JSON line with rec/s.
  *
  * Generation keeps each movie's block inside one Spark partition
  * (ranges partition by id), so every generated text file is a valid
  * standalone combined_data file.
  *
  * Usage: graft.IngestBench [nRatings...] (default 5,000,000). Each
  * size runs in the same session and reports one result; the combined
  * JSON goes to stdout and, when `SPARK_GRAFT_INGEST_OUT` is set, to
  * that file — the per-round `INGEST_r{N}.json` artifact that keeps
  * the flagship ingest path regression-tracked like the query suite.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = sizes.map(n => runOnce(spark, n))
    val json = s"""{"metric":"ingest_throughput","runs":[${results.mkString(",")}]}"""
    println(json)
    sys.env.get("SPARK_GRAFT_INGEST_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }

  private def runOnce(spark: SparkSession, nRatings: Long): String = {
    val nMovies = 17770L
    val nCustomers = 480189L
    val perMovie = math.max(1L, nRatings / nMovies)
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val ratingsDir = s"$base/combined"
    val moviesDir = s"$base/movies"
    val outDir = s"$base/star"

    // deterministic synthetic corpus
    spark.range(1, nMovies + 1)
      .select($"id", explode(sequence(lit(0L), lit(perMovie))).as("i"))
      .select(when($"i" === 0, concat($"id", lit(":")))
        .otherwise(concat(
          (($"id" * 2654435761L + $"i" * 40503L) % nCustomers + 1).cast("long"), lit(","),
          (($"id" + $"i") % 5 + 1).cast("long"), lit(","),
          date_format(date_add(lit("1999-01-01").cast("date"),
            (($"id" * 31 + $"i") % 2500).cast("int")), "yyyy-MM-dd")))
        .as("value"))
      .write.mode("overwrite").text(ratingsDir)
    spark.range(1, nMovies + 1)
      .select(concat($"id", lit(","), lit(1900) + $"id" % 110, lit(",Movie Title, Episode "),
                     $"id").as("value"))
      .write.mode("overwrite").text(moviesDir)

    val t0 = System.nanoTime()
    val star = graft.ingest.StarBuilder.build(
      spark, spark.read.text(moviesDir), spark.read.text(ratingsDir),
      dateStart = "1999-01-01", dateEnd = "2005-12-31")
    star.factRatings.write.mode("overwrite").parquet(s"$outDir/fact_ratings")
    star.dimMovie.write.mode("overwrite").parquet(s"$outDir/dim_movie")
    star.dimCustomer.write.mode("overwrite").parquet(s"$outDir/dim_customer")
    star.dimDate.write.mode("overwrite").parquet(s"$outDir/dim_date")
    val elapsed = (System.nanoTime() - t0) / 1e9
    star.cleanup()

    val factRows = spark.read.parquet(s"$outDir/fact_ratings").count()
    val customers = spark.read.parquet(s"$outDir/dim_customer").count()
    // zero-loss gate: every generated detail line must survive the
    // parse and both dim lookups — a silent drop would otherwise just
    // deflate the throughput number without failing the run
    val expected = nMovies * perMovie
    require(factRows == expected,
      s"row loss: generated $expected detail rows, fact has $factRows")
    // a 100M-row run leaves a multi-GB corpus — do not accumulate
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
    s"""{"fact_rows":$factRows,"customers":$customers,""" +
      s""""elapsed_sec":$elapsed,"rec_per_sec":${(factRows / elapsed).toLong}}"""
  }
}
