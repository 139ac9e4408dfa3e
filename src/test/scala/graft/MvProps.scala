package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.plans.MvRewrite

/** Property test for incremental MV maintenance: a CHAIN of
  * append-only delta refreshes must land on exactly the state a
  * from-scratch build over the full history produces — the algebraic
  * `merge(partial(A), partial(B)) == partial(A ∪ B)` law, iterated.
  * Randomizes the row population (values, NULLs in the sum column,
  * group skew) and the batch boundaries, the two axes a single
  * example-based split cannot cover.
  */
object MvProps extends Properties("mv") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mv-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // (group key, min-max value, nullable sum value) rows plus 1–3 cut
  // points partitioning them into an initial load and delta batches
  private val genCase: Gen[(List[(String, Long, Option[Long])], List[Int])] =
    for {
      n <- Gen.choose(8, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(-50L, 50L)
        s <- Gen.option(Gen.choose(-9L, 9L))
      } yield (g, v, s))
      nCuts <- Gen.choose(1, 3)
      cuts <- Gen.listOfN(nCuts, Gen.choose(1, n - 1))
    } yield (rows, cuts.distinct.sorted)

  property("chained delta refreshes == from-scratch rebuild") =
    Prop.forAll(genCase) { case (rows, cuts) =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-mv-props").toString
      try {
        val batches = {
          val bounds = 0 +: cuts :+ rows.length
          bounds.zip(bounds.tail).map { case (lo, hi) => rows.slice(lo, hi) }
        }.filter(_.nonEmpty)
        def df(b: List[(String, Long, Option[Long])]) =
          b.toDF("g", "v", "s")
        df(batches.head).write.parquet(s"$dir/base")
        var mv = MvRewrite.materialize(spark, s"$dir/base",
          groupCols = Seq("g"), sumCols = Seq("s"),
          mvPath = s"$dir/mv0", minMaxCols = Seq("v"))
        batches.tail.zipWithIndex.foreach { case (b, i) =>
          mv = MvRewrite.refreshIncremental(spark, mv, df(b), s"$dir/mv${i + 1}")
        }
        df(rows).write.parquet(s"$dir/full")
        val rebuilt = MvRewrite.materialize(spark, s"$dir/full",
          groupCols = Seq("g"), sumCols = Seq("s"),
          mvPath = s"$dir/mvfull", minMaxCols = Seq("v"))
        def state(path: String) = {
          val t = spark.read.parquet(path)
          t.select(t.columns.sorted.map(col): _*).orderBy($"g")
            .collect().map(_.toSeq).toSeq
        }
        val got = state(mv.mvPath)
        val want = state(rebuilt.mvPath)
        MvRewrite.clear()
        got == want
      } finally {
        MvRewrite.clear()
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }

  // base rows (with a unique id so deletes are exact row images),
  // a delete subset, and an insert batch — the CDC retraction case.
  // No min-max columns: refreshRetract refuses them by scope.
  private val genRetract: Gen[(List[(Long, String, Option[Long])],
    Set[Long], List[(Long, String, Option[Long])])] =
    for {
      n <- Gen.choose(6, 40)
      base <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        s <- Gen.option(Gen.choose(-9L, 9L))
      } yield (g, s))
      delIdx <- Gen.someOf(0 until n)
      m <- Gen.choose(0, 15)
      ins <- Gen.listOfN(m, for {
        g <- Gen.oneOf("a", "b", "c")
        s <- Gen.option(Gen.choose(-9L, 9L))
      } yield (g, s))
    } yield (
      base.zipWithIndex.map { case ((g, s), i) => (i.toLong, g, s) },
      delIdx.map(_.toLong).toSet,
      ins.zipWithIndex.map { case ((g, s), i) => (1000L + i, g, s) })

  property("retraction refresh == rebuild over (base \\ deletes) ∪ inserts") =
    Prop.forAll(genRetract) { case (base, delIds, inserts) =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-mv-retract-props").toString
      try {
        def df(b: List[(Long, String, Option[Long])]) = b.toDF("id", "g", "s")
        df(base).write.parquet(s"$dir/base")
        val mv0 = MvRewrite.materialize(spark, s"$dir/base",
          groupCols = Seq("g"), sumCols = Seq("s"), mvPath = s"$dir/mv0")
        val dels = base.filter(r => delIds(r._1))
        val cdc = df(dels).withColumn("op", lit(-1))
          .unionByName(df(inserts).withColumn("op", lit(1)))
        val refreshed = MvRewrite.refreshRetract(
          spark, mv0, cdc, "op", s"$dir/mv1")
        val net = base.filterNot(r => delIds(r._1)) ++ inserts
        def build(rows: List[(Long, String, Option[Long])], tag: String) = {
          if (rows.isEmpty)
            spark.emptyDataset[(Long, String, Option[Long])]
              .toDF("id", "g", "s")
              .write.parquet(s"$dir/$tag")
          else df(rows).write.parquet(s"$dir/$tag")
          MvRewrite.materialize(spark, s"$dir/$tag",
            groupCols = Seq("g"), sumCols = Seq("s"),
            mvPath = s"$dir/mv-$tag")
        }
        val rebuilt = build(net, "net")
        def state(path: String) = {
          val t = spark.read.parquet(path)
          t.select(t.columns.sorted.map(col): _*).orderBy($"g")
            .collect().map(_.toSeq).toSeq
        }
        val got = state(refreshed.mvPath)
        val want = state(rebuilt.mvPath)
        MvRewrite.clear()
        got == want
      } finally {
        MvRewrite.clear()
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }

  // the rederive case: same CDC shape but WITH a min-max column —
  // refreshRetract's refusal class, served by touched-cell
  // re-derivation from the post-CDC base instead
  private val genRederive: Gen[(List[(Long, String, Long, Option[Long])],
    Set[Long], List[(Long, String, Long, Option[Long])])] =
    for {
      n <- Gen.choose(6, 40)
      base <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(-50L, 50L)
        s <- Gen.option(Gen.choose(-9L, 9L))
      } yield (g, v, s))
      delIdx <- Gen.someOf(0 until n)
      m <- Gen.choose(0, 15)
      ins <- Gen.listOfN(m, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(-50L, 50L)
        s <- Gen.option(Gen.choose(-9L, 9L))
      } yield (g, v, s))
    } yield (
      base.zipWithIndex.map { case ((g, v, s), i) => (i.toLong, g, v, s) },
      delIdx.map(_.toLong).toSet,
      ins.zipWithIndex.map { case ((g, v, s), i) => (1000L + i, g, v, s) })

  property("rederive retraction (MIN/MAX) == rebuild over " +
    "(base \\ deletes) ∪ inserts") =
    Prop.forAll(genRederive) { case (base, delIds, inserts) =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-mv-rederive-props").toString
      try {
        def df(b: List[(Long, String, Long, Option[Long])]) =
          b.toDF("id", "g", "v", "s")
        val net = base.filterNot(r => delIds(r._1)) ++ inserts
        // the rederive contract: the source reflects the CDC already
        if (net.isEmpty)
          spark.emptyDataset[(Long, String, Long, Option[Long])]
            .toDF("id", "g", "v", "s").write.parquet(s"$dir/net")
        else df(net).write.parquet(s"$dir/net")
        // the MV holds the PRE-CDC partials, registered for net
        val mv0 = MvRewrite.materializeFrom(df(base), MvRewrite.MvDef(
          s"$dir/net", groupCols = Seq("g"), sumCols = Seq("s"),
          mvPath = s"$dir/mv0", minMaxCols = Seq("v")))
        val dels = base.filter(r => delIds(r._1))
        val cdc = df(dels).withColumn("op", lit(-1))
          .unionByName(df(inserts).withColumn("op", lit(1)))
        val refreshed = MvRewrite.refreshRetractRederive(
          spark, mv0, cdc, s"$dir/mv1")
        val rebuilt = MvRewrite.materializeFrom(
          spark.read.parquet(s"$dir/net"), MvRewrite.MvDef(s"$dir/net",
            groupCols = Seq("g"), sumCols = Seq("s"),
            mvPath = s"$dir/mv-net", minMaxCols = Seq("v")))
        def state(path: String) = {
          val t = spark.read.parquet(path)
          t.select(t.columns.sorted.map(col): _*).orderBy($"g")
            .collect().map(_.toSeq).toSeq
        }
        val got = state(refreshed.mvPath)
        val want = state(rebuilt.mvPath)
        MvRewrite.clear()
        got == want
      } finally {
        MvRewrite.clear()
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }

  property("quantile sketch: delta chain + signed retraction == " +
    "rebuild over the net state") =
    Prop.forAll(genRederive) { case (base, delIds, inserts) =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-qs-props").toString
      try {
        // v doubles as the sketch value: negatives exercise the
        // kernel's x >= 0 drop on BOTH the maintained and the
        // rebuilt side
        def df(b: List[(Long, String, Long, Option[Long])]) =
          b.toDF("id", "g", "v", "s")
        val cut = base.length / 2
        val qd = graft.operators.QuantileMv.Def(Seq("g"), "v", s"$dir/mv0")
        val mv0 = graft.operators.QuantileMv
          .materializeFrom(df(base.take(cut)), qd)
        val mv1 = graft.operators.QuantileMv.refreshIncremental(
          spark, mv0, df(base.drop(cut)), s"$dir/mv1")
        val dels = base.filter(r => delIds(r._1))
        val cdc = df(dels).withColumn("op", lit(-1))
          .unionByName(df(inserts).withColumn("op", lit(1)))
        val mv2 = graft.operators.QuantileMv.refreshRetract(
          spark, mv1, cdc, "op", s"$dir/mv2")
        val net = base.filterNot(r => delIds(r._1)) ++ inserts
        val rebuilt = graft.operators.QuantileMv.materializeFrom(
          if (net.isEmpty)
            spark.emptyDataset[(Long, String, Long, Option[Long])]
              .toDF("id", "g", "v", "s")
          else df(net),
          graft.operators.QuantileMv.Def(Seq("g"), "v", s"$dir/mv-net"))
        def state(path: String) = spark.read.parquet(path)
          .orderBy($"g", $"id").collect().map(_.toSeq).toSeq
        state(mv2.mvPath) == state(rebuilt.mvPath)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }

  property("HLL rederive retraction == rebuilt registers over the " +
    "net state") =
    Prop.forAll(genRederive) { case (base, delIds, inserts) =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-hll-props").toString
      try {
        // the row id doubles as the distinct key (non-null longs)
        def df(b: List[(Long, String, Long, Option[Long])]) =
          b.map(r => (r._1, r._2)).toDF("k", "g")
        val net = base.filterNot(r => delIds(r._1)) ++ inserts
        if (net.isEmpty)
          spark.emptyDataset[(Long, String)].toDF("k", "g")
            .write.parquet(s"$dir/net")
        else df(net).write.parquet(s"$dir/net")
        // registers hold the PRE-CDC state, declared against net
        val mv0 = graft.operators.HllMv.materializeFrom(df(base),
          graft.operators.HllMv.Def(Seq("g"), "k", s"$dir/mv0",
            Some(s"$dir/net")))
        val dels = base.filter(r => delIds(r._1))
        val cdc = df(dels).withColumn("op", lit(-1))
          .unionByName(df(inserts).withColumn("op", lit(1)))
        val refreshed = graft.operators.HllMv.refreshRetractRederive(
          spark, mv0, cdc, s"$dir/mv1")
        val rebuilt = graft.operators.HllMv.materializeFrom(
          spark.read.parquet(s"$dir/net"),
          graft.operators.HllMv.Def(Seq("g"), "k", s"$dir/mv-net"))
        def state(path: String) = spark.read.parquet(path)
          .orderBy($"g", $"bucket").collect().map(_.toSeq).toSeq
        state(refreshed.mvPath) == state(rebuilt.mvPath)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }

  property("bitmap rederive retraction == rebuilt words over the net " +
    "state — multiplicity-safe, negative keys included") =
    Prop.forAll(genRederive) { case (base, delIds, inserts) =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-bm-props").toString
      try {
        // the key is the VALUE column (-50..50): keys collide across
        // rows and go negative, so deleting one holder must keep the
        // bit while another holder survives — exactly the
        // monotonicity case OR cannot retract and rederive can
        def df(b: List[(Long, String, Long, Option[Long])]) =
          b.map(r => (r._3, r._2)).toDF("k", "g")
        val net = base.filterNot(r => delIds(r._1)) ++ inserts
        if (net.isEmpty)
          spark.emptyDataset[(Long, String)].toDF("k", "g")
            .write.parquet(s"$dir/net")
        else df(net).write.parquet(s"$dir/net")
        val mv0 = graft.operators.BitmapMv.materializeFrom(df(base),
          graft.operators.BitmapMv.Def(Seq("g"), "k", s"$dir/mv0",
            Some(s"$dir/net")))
        val dels = base.filter(r => delIds(r._1))
        val cdc = df(dels).withColumn("op", lit(-1))
          .unionByName(df(inserts).withColumn("op", lit(1)))
        val refreshed = graft.operators.BitmapMv.refreshRetractRederive(
          spark, mv0, cdc, s"$dir/mv1")
        val rebuilt = graft.operators.BitmapMv.materializeFrom(
          spark.read.parquet(s"$dir/net"),
          graft.operators.BitmapMv.Def(Seq("g"), "k", s"$dir/mv-net"))
        def state(path: String) = spark.read.parquet(path)
          .orderBy($"g", $"w").collect().map(_.toSeq).toSeq
        state(refreshed.mvPath) == state(rebuilt.mvPath)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
}
