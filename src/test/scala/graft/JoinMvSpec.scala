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

  test("z-set retraction: a mixed batch (left deletes, right inserts " +
    "AND deletes) nets to the direct post-CDC join; the Δ×Δ term " +
    "corrects same-batch overlap; compaction preserves the state") {
    val dir = Files.createTempDirectory("graft-joinmv3").toString
    def aRows(r: Range) = r.map(i => (i.toLong, (i % 6).toLong))
      .toDF("id", "k")
    def bRows(r: Range) = r.map(i => ((i % 6).toLong, s"p$i"))
      .toDF("bk", "payload")
    val aPath = s"$dir/a"
    val bPath = s"$dir/b"
    aRows(1 to 40).write.parquet(aPath)
    bRows(1 to 4).write.parquet(bPath)
    val z0 = graft.operators.JoinMv.materializeZ(spark,
      graft.operators.JoinMv.ZDef(aPath, bPath, "k", "bk", s"$dir/zmv"))
    // the batch: delete a-ids ≡ 0 mod 4; insert b rows 5..8 and
    // delete b row 2. Deleted a rows share keys with the INSERTED b
    // rows — without the −ΔA⋈ΔB term those pairs would net to −1+0
    // instead of 0 (insert +1 from A′⋈ΔB includes only surviving A′)
    val cdcA = aRows(1 to 40).filter($"id" % 4 === 0)
      .withColumn("op", lit(-1))
    val cdcB = bRows(5 to 8).withColumn("op", lit(1))
      .unionByName(bRows(2 to 2).withColumn("op", lit(-1)))
    // sides reflect the batch first (the family's contract)
    val aPost = aRows(1 to 40).filter($"id" % 4 =!= 0)
    val bPost = bRows(1 to 8).except(bRows(2 to 2))
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(aPath))
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(bPath))
    aPost.write.parquet(aPath)
    bPost.write.parquet(bPath)
    val z1 = graft.operators.JoinMv.refreshRetract(
      spark, z0, Some(cdcA), Some(cdcB))
    val got = graft.operators.JoinMv.serveZ(spark, z1)
      .select($"id", $"k", $"bk", $"payload")
      .orderBy($"id", $"bk", $"payload").collect().toSeq
    val want = aPost.join(bPost, $"k" === $"bk")
      .select($"id", $"k", $"bk", $"payload")
      .orderBy($"id", $"bk", $"payload").collect().toSeq
    assert(got == want,
      "netted z-set must equal the direct post-CDC join")
    // the retraction log genuinely holds net-zero rows (the deletes)
    val logRows = spark.read.parquet(z1.mvPath).count()
    assert(logRows > want.size,
      "the log must carry retracted rows before compaction")
    // compaction folds the log and serves identically
    val zc = graft.operators.JoinMv.compactZ(spark, z1, s"$dir/zmv2")
    val compacted = graft.operators.JoinMv.serveZ(spark, zc)
      .select($"id", $"k", $"bk", $"payload")
      .orderBy($"id", $"bk", $"payload").collect().toSeq
    assert(compacted == want, "compaction must preserve the state")
    assert(spark.read.parquet(zc.mvPath).count() == want.size,
      "the compacted table must hold exactly the live rows")
  }
}
