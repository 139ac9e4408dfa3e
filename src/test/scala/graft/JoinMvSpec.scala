package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The delta-join MV ([[graft.operators.JoinMv]]): chained
  * append-only refreshes land on exactly the full join, and each
  * refresh reads ONLY the side the other delta needs — proven the
  * hard way, by deleting the unneeded side before refreshing.
  */
class JoinMvSpec extends SparkSpec {
  import spark.implicits._

  private def fullJoin(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame) =
    a.join(b, a("k") === b("bk"))
      .select($"id", $"k", $"bk", $"payload")
      .orderBy($"id", $"bk", $"payload")
      .collect().toSeq

  test("chained delta refreshes == the direct join, including the " +
    "late-arriving right rows whose left matches were already loaded") {
    val dir = Files.createTempDirectory("graft-joinmv").toString
    def aRows(r: Range) = r.map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "k")
    def bRows(r: Range) = r.map(i => ((i % 7).toLong, s"p$i"))
      .toDF("bk", "payload")
    val aPath = s"$dir/a"
    val bPath = s"$dir/b"
    aRows(1 to 40).write.parquet(aPath)
    bRows(1 to 5).write.parquet(bPath)
    val d0 = graft.operators.JoinMv.materialize(spark,
      graft.operators.JoinMv.Def(aPath, bPath, "k", "bk", "id",
        s"$dir/mv"))
    // batch 1: left-only; batch 2: both sides — b rows 6..9 match
    // keys of a rows loaded in EARLIER batches (the naive
    // delta-against-dims refresh would drop those join rows)
    val da1 = aRows(41 to 70)
    da1.write.mode("append").parquet(aPath)
    val d1 = graft.operators.JoinMv
      .refreshIncremental(spark, d0, Some(da1), None)
    val da2 = aRows(71 to 90)
    val db2 = bRows(6 to 9)
    da2.write.mode("append").parquet(aPath)
    db2.write.mode("append").parquet(bPath)
    val d2 = graft.operators.JoinMv
      .refreshIncremental(spark, d1, Some(da2), Some(db2))
    val got = graft.operators.JoinMv.serve(spark, d2)
      .select($"id", $"k", $"bk", $"payload")
      .orderBy($"id", $"bk", $"payload").collect().toSeq
    val want = fullJoin(aRows(1 to 90), bRows(1 to 9))
    assert(got == want,
      "chained delta-join appends must equal the full join")
  }

  test("a left-only batch never reads the left side; a right-only " +
    "batch never reads the right side (deleted before refreshing)") {
    val dir = Files.createTempDirectory("graft-joinmv2").toString
    def aRows(r: Range) = r.map(i => (i.toLong, (i % 5).toLong))
      .toDF("id", "k")
    def bRows(r: Range) = r.map(i => ((i % 5).toLong, s"p$i"))
      .toDF("bk", "payload")
    val aPath = s"$dir/a"
    val bPath = s"$dir/b"
    aRows(1 to 30).write.parquet(aPath)
    bRows(1 to 6).write.parquet(bPath)
    val d0 = graft.operators.JoinMv.materialize(spark,
      graft.operators.JoinMv.Def(aPath, bPath, "k", "bk", "id",
        s"$dir/mv"))
    // ΔA-only: the A′ recovery term is absent, so A′ itself must
    // never be opened — delete it and refresh
    val da = aRows(31 to 45)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(aPath))
    val d1 = graft.operators.JoinMv
      .refreshIncremental(spark, d0, Some(da), None)
    // restore A′ (now reflecting ΔA) for the symmetric case
    aRows(1 to 45).write.parquet(aPath)
    // ΔB-only: ΔA⋈B′ is absent, so B′ must never be opened
    val db = bRows(7 to 9)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(bPath))
    val d2 = graft.operators.JoinMv
      .refreshIncremental(spark, d1, None, Some(db))
    val got = graft.operators.JoinMv.serve(spark, d2)
      .select($"id", $"k", $"bk", $"payload")
      .orderBy($"id", $"bk", $"payload").collect().toSeq
    val want = fullJoin(aRows(1 to 45), bRows(1 to 9))
    assert(got == want,
      "side-blind refreshes must still land on the full join")
  }
}
