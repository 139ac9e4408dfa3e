package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ingest.NetflixParser

/** Property tests: the distributed fill-forward parser agrees with a
  * trivial sequential reference on arbitrary inputs (headers, details,
  * garbage interleaved) under arbitrary partitioning — the invariant
  * the reference's bucketed-window parser violates (SURVEY.md §7.4-1).
  */
object ParserProps extends Properties("NetflixParser") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genLine: Gen[String] = Gen.frequency(
    2 -> Gen.choose(1, 50).map(id => s"$id:"),
    6 -> (for {
      c <- Gen.choose(1, 99999)
      r <- Gen.choose(1, 5)
      m <- Gen.choose(1, 12)
      day <- Gen.choose(1, 28)
    } yield f"$c,$r,2005-$m%02d-$day%02d"),
    1 -> Gen.oneOf("garbage", "x,y", "12,notnum,2005-01-01", "", ":", "abc:"))

  /** Sequential single-threaded reference: the spec of the format. */
  private def reference(lines: Seq[String]): Set[(Int, Int, Int, String)] = {
    var cur: Option[Int] = None
    val out = Seq.newBuilder[(Int, Int, Int, String)]
    lines.foreach { line =>
      if (line.nonEmpty && line.last == ':' && line.dropRight(1).forall(_.isDigit)
          && line.length > 1) {
        cur = Some(line.dropRight(1).toInt)
      } else cur.foreach { m =>
        val p = line.split(",", 3)
        if (p.length == 3 && p(0).nonEmpty && p(0).forall(_.isDigit)
            && p(1).nonEmpty && p(1).forall(_.isDigit) && p(1).toLong <= Short.MaxValue
            && scala.util.Try(java.time.LocalDate.parse(p(2))).isSuccess)
          out += ((m, p(0).toInt, p(1).toShort.toInt, p(2)))
      }
    }
    out.result().toSet
  }

  property("matches sequential reference under any partitioning") =
    Prop.forAll(Gen.listOf(genLine), Gen.choose(1, 9)) { (lines, slices) =>
      import spark.implicits._
      val parsed = NetflixParser.parseCombinedData(
        spark.createDataset(spark.sparkContext.parallelize(lines, slices)).toDF("value"))
        .collect()
        .map(r => (r.movie_id, r.customer_id, r.rating.toInt, r.rating_date.toString))
        .toSet
      parsed == reference(lines)
    }
}
