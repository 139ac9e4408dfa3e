package graft

import graft.ingest.NetflixParser
import graft.model.Schemas.RatingRaw

/** Parser specs over in-repo fixtures (FIXTURES.md §A): embedded-comma
  * titles, malformed rows, and — the critical one — fill-forward
  * invariance under any partitioning, including headers split from
  * their details at partition boundaries (the case the reference's
  * bucketed window silently drops, SURVEY.md §7.4-1).
  */
class NetflixParserSpec extends SparkSpec {
  import spark.implicits._

  private val movieLines = Seq(
    "1,2003,Dinosaur Planet",
    "2,1999,The Lord of the Rings: The Fellowship, of the Ring", // embedded commas
    "3,Character",                 // 2-field malformed: title from year slot
    "4,NULL,Nullyear Movie",       // NULL year
    "5,2001," + ("x" * 600),       // >500-char title
    "junk,2000,Bad Id")            // non-numeric id → dropped

  test("movie_titles: commas, malformed, NULL year, truncation") {
    val parsed = NetflixParser.parseMovieTitles(movieLines.toDF("value"))
      .collect().sortBy(_.movie_id)
    assert(parsed.map(_.movie_id).toSeq == Seq(1, 2, 3, 4, 5))
    assert(parsed(1).title == "The Lord of the Rings: The Fellowship, of the Ring")
    assert(parsed(2).title == "Character" && parsed(2).release_year.isEmpty)
    assert(parsed(3).release_year.isEmpty && parsed(3).title == "Nullyear Movie")
    assert(parsed(4).title.length == 500)
    assert(parsed(0).release_year.contains(2003.toShort))
  }

  private val ratingLines = Seq(
    "1:",
    "1488844,3,2005-09-06",
    "822109,5,2005-05-13",
    "885013,4,2005-10-19",
    "2:",
    "30878,4,2005-12-26",
    "oops,not,a-line",              // malformed detail → dropped
    "823519,3,2004-05-03",
    "3:",
    "893988,3,2005-11-17",
    "124105,4,2004-08-05")

  private val expected = Set(
    (1, 1488844, 3), (1, 822109, 5), (1, 885013, 4),
    (2, 30878, 4), (2, 823519, 3),
    (3, 893988, 3), (3, 124105, 4))

  private def parse(slices: Int): Set[(Int, Int, Int)] =
    NetflixParser.parseCombinedData(
      spark.createDataset(spark.sparkContext.parallelize(ratingLines, slices)).toDF("value"))
      .collect().map(r => (r.movie_id, r.customer_id, r.rating.toInt)).toSet

  test("combined_data: basic fill-forward + malformed drop") {
    assert(parse(1) == expected)
  }

  test("combined_data: invariant under partitioning (boundary-split blocks)") {
    // 3..11 slices put partition boundaries inside movie blocks — the
    // exact layouts where the reference's bucketed window loses rows.
    (2 to 11).foreach { n => assert(parse(n) == expected, s"slices=$n") }
  }

  test("combined_data: CRLF files parse identically to LF files") {
    val crlf = ratingLines.map(_ + "\r")
    val got = NetflixParser.parseCombinedData(crlf.toDF("value"))
      .collect().map(r => (r.movie_id, r.customer_id, r.rating.toInt)).toSet
    assert(got == expected)
  }

  test("combined_data: signed header ids are malformed, not headers") {
    val lines = Seq("+5:", "1,3,2005-01-01", "7:", "2,4,2005-01-02")
    val got = NetflixParser.parseCombinedData(lines.toDF("value"))
      .collect().map(r => (r.movie_id, r.customer_id)).toSet
    assert(got == Set((7, 2))) // "+5:" dropped; detail before real header dropped
  }

  test("combined_data: details before any header are dropped") {
    val lines = Seq("7,5,2005-01-01", "9:", "8,4,2005-01-02")
    val got = NetflixParser.parseCombinedData(lines.toDF("value")).collect()
    assert(got.toSeq == Seq(RatingRaw(9, 8, 4, java.sql.Date.valueOf("2005-01-02"))))
  }

  test("combined_data: rating date parsed as exact date") {
    val d = parseDates().head
    assert(d == java.sql.Date.valueOf("2005-09-06"))
  }

  private def parseDates(): Seq[java.sql.Date] =
    NetflixParser.parseCombinedData(Seq("1:", "1488844,3,2005-09-06").toDF("value"))
      .collect().map(_.rating_date).toSeq

  test("quarantine split: good+bad partition the input, reasons classify") {
    val lines = Seq(
      "1,2003,Alpha",          // good
      "x,2003,Beta",           // unparseable id
      "2,notayear,Gamma, Co",  // good: year nulls, title survives
      "3,1999",                // missing third field: title falls back to field 1
      "",                      // empty: no id
      "4,2001,Delta").toDF("value")
    val (good, bad) = NetflixParser.parseMovieTitlesWithQuarantine(lines)
    val g = good.collect().map(m => (m.movie_id, m.title)).toSet
    assert(g == Set((1, "Alpha"), (2, "Gamma, Co"), (3, "1999"), (4, "Delta")))
    val b = bad.collect().map(q => (q.line, q.reason)).toSet
    assert(b == Set(
      ("x,2003,Beta", "unparseable_movie_id"),
      ("", "unparseable_movie_id")))
    // strict parser == quarantine's good side, and nothing is lost
    val strict = NetflixParser.parseMovieTitles(lines).collect().toSet
    assert(strict == good.collect().toSet)
    assert(good.count() + bad.count() == 6)
  }
}
