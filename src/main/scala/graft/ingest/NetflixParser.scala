package graft.ingest

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas.{Movie, RatingRaw}

/** Parsers for the two Netflix Prize raw formats (SURVEY.md §1.2).
  *
  * == movie_titles.csv ==
  * `MovieID,YearOfRelease,Title` where Title may itself contain commas
  * (reference parse: `/root/reference/etl_pipeline_spark.py:886-909`):
  * split with limit 3, 2-field malformed rows fall back to the year
  * slot for the title, year is null-on-bad-cast, title truncated to
  * 500 chars, rows without a numeric id dropped.
  *
  * == combined_data_N.txt ==
  * Header lines `MovieID:` followed by detail lines
  * `CustomerID,Rating,Date` — a positional, stateful format: a detail
  * row's movie is the nearest preceding header
  * (`etl_pipeline_spark.py:1086-1090`).
  *
  * The reference fill-forwards inside 10k-row buckets of
  * `monotonically_increasing_id` (`:1097-1121`), which silently drops
  * detail rows whose header fell in the previous bucket and is
  * layout-dependent (SURVEY.md §7.4-1). Here instead: the classic
  * two-pass parallel prefix scan, with **zero shuffles**:
  *
  *  1. a lightweight `mapPartitions` pass records each partition's
  *     carry-out (its last header id) — one tiny row per partition;
  *  2. the driver prefix-scans those (#partitions entries — trivially
  *     small even at 100 TB) into each partition's carry-in;
  *  3. a second `mapPartitions` pass streams every line once, filling
  *     forward from the carry-in — per-partition sequential state,
  *     which is exactly what a positional format demands.
  *
  * `mapPartitions` is deliberate ((d) in the preference order): any
  * window/join formulation must first shuffle the full text to group
  * by derived keys, while the text scan already delivers lines in file
  * order per split. Results are identical under any partitioning —
  * proven by the repartition-invariance test — because the semantics
  * depend only on the global line order, which split order preserves.
  */
object NetflixParser {

  // ---------- movie_titles.csv ----------

  /** Parse raw movie-title lines (a `value: string` DataFrame, e.g.
    * from `spark.read.text`). try_cast mirrors the reference's
    * null-on-bad-cast (ANSI off there; Spark 4 is ANSI on).
    */
  def parseMovieTitles(lines: DataFrame): Dataset[Movie] = {
    import lines.sparkSession.implicits._
    // `get` (not `[i]`/getItem): ANSI mode turns out-of-bounds array
    // indexing into a runtime error; get() is null-safe on short rows.
    val p = split($"value", ",", 3)
    lines
      .select(
        expr("try_cast(get(split(value, ',', 3), 0) AS INT)").as("movie_id"),
        expr("try_cast(get(split(value, ',', 3), 1) AS SMALLINT)").as("release_year"),
        substring(coalesce(get(p, lit(2)), get(p, lit(1))), 1, 500).as("title"))
      .filter($"movie_id".isNotNull && $"title".isNotNull)
      .as[Movie]
  }

  def readMovieTitles(spark: SparkSession, path: String): Dataset[Movie] =
    parseMovieTitles(spark.read.text(path))

  /** A rejected input line with its machine-readable reject reason. */
  final case class Quarantined(line: String, reason: String)

  /** Validation split — the reference's validate-and-skip stage
    * (`etl_pipeline_spark.py:433-567` logs bad rows and drops them)
    * re-expressed as DATA: one classification of each line by the
    * same try_cast rules [[parseMovieTitles]] applies, with good rows
    * becoming typed Movies and bad rows carrying a reason into a
    * quarantine frame a pipeline can sink, alert on, and replay after
    * repair. Both frames are narrow selections over the same scan —
    * no shuffle, no driver round-trip; callers that consume both
    * should persist `lines` (or write the quarantine first) to avoid
    * a second text scan, exactly like StarBuilder's parse reuse.
    */
  def parseMovieTitlesWithQuarantine(
      lines: DataFrame): (Dataset[Movie], Dataset[Quarantined]) = {
    import lines.sparkSession.implicits._
    val p = split($"value", ",", 3)
    val classified = lines.select(
      $"value",
      expr("try_cast(get(split(value, ',', 3), 0) AS INT)").as("movie_id"),
      expr("try_cast(get(split(value, ',', 3), 1) AS SMALLINT)").as("release_year"),
      substring(coalesce(get(p, lit(2)), get(p, lit(1))), 1, 500).as("title"))
    val good = classified
      .filter($"movie_id".isNotNull && $"title".isNotNull)
      .select($"movie_id", $"release_year", $"title").as[Movie]
    val bad = classified
      .filter($"movie_id".isNull || $"title".isNull)
      .select($"value".as("line"),
        when($"movie_id".isNull, lit("unparseable_movie_id"))
          .otherwise(lit("missing_title")).as("reason"))
      .as[Quarantined]
    (good, bad)
  }

  // ---------- combined_data_N.txt ----------

  private val DateFmt = DateTimeFormatter.ISO_LOCAL_DATE

  /** Strip a trailing \r so CRLF files parse identically to LF files
    * (spark.read.text splits on \n and keeps the \r — without this a
    * Windows-encoded file would silently lose every header and with it
    * every rating). */
  private def stripCr(line: String): String =
    if (line.nonEmpty && line.charAt(line.length - 1) == '\r')
      line.substring(0, line.length - 1)
    else line

  /** `MovieID:` header test — digits-only before the colon (a signed
    * "+5:" is malformed input to drop, not a header); cheap suffix
    * check before the numeric parse; runs once per line. */
  private def headerId(line: String): Option[Int] =
    if (line.length > 1 && line.charAt(line.length - 1) == ':' && {
        var i = 0; var digits = true
        while (digits && i < line.length - 1) {
          digits = line.charAt(i) >= '0' && line.charAt(i) <= '9'; i += 1
        }
        digits
      })
      line.substring(0, line.length - 1).toIntOption
    else None

  /** Parse one detail line; None for malformed (reference drops them
    * via null-casts + filter, `etl_pipeline_spark.py:1129-1137`). */
  private def parseDetail(movieId: Int, line: String): Option[RatingRaw] = {
    val parts = line.split(",", 3)
    if (parts.length < 3) None
    else for {
      cust <- parts(0).toIntOption
      rating <- parts(1).toShortOption
      date <- try Some(LocalDate.parse(parts(2).trim, DateFmt)) catch { case _: Exception => None }
    } yield RatingRaw(movieId, cust, rating, java.sql.Date.valueOf(date))
  }

  /** Fill-forward parse of a combined_data text scan. `lines` must be a
    * single-column (`value: string`) DataFrame whose per-partition
    * iteration order is the file order (true for `spark.read.text` and
    * for `parallelize`d test fixtures).
    */
  def parseCombinedData(lines: DataFrame): Dataset[RatingRaw] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val ds = lines.select($"value").as[String]

    // Pass 1: per-partition carry-out = last header id in the partition
    // (None if the partition contains no header). One row per partition.
    val carryOuts: Array[(Int, Option[Int])] = ds
      .mapPartitions { it =>
        var lastHeader: Option[Int] = None
        it.foreach { line => headerId(stripCr(line)).foreach(h => lastHeader = Some(h)) }
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(), lastHeader))
      }
      .collect()
      .sortBy(_._1)

    // Driver prefix scan: carry-in of partition p = last carry-out of
    // any earlier partition. (#partitions entries — negligible.)
    val carryIn = scala.collection.mutable.HashMap[Int, Option[Int]]()
    var running: Option[Int] = None
    carryOuts.foreach { case (pid, out) =>
      carryIn(pid) = running
      running = out.orElse(running)
    }
    val carryInB = spark.sparkContext.broadcast(carryIn.toMap)

    // Pass 2: stream every line once, filling forward from the carry-in.
    ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var current: Option[Int] = carryInB.value.getOrElse(pid, None)
      it.flatMap { rawLine =>
        val line = stripCr(rawLine)
        headerId(line) match {
          case h @ Some(_) => current = h; Iterator.empty
          case None => current.iterator.flatMap(m => parseDetail(m, line))
        }
      }
    }
  }

  def readCombinedData(spark: SparkSession, paths: String*): Dataset[RatingRaw] =
    parseCombinedData(spark.read.text(paths: _*))
}
