package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.streaming.{MvMaintainer, MvStream}

/** Continuous MV maintenance: micro-batched refreshes land on exactly
  * the state a from-scratch build over the full history produces, a
  * redelivered batch is a no-op, and a restarted maintainer resumes
  * from the committed marker — the three properties that make a
  * foreachBatch refresh correct under streaming's at-least-once
  * failure model.
  */
final case class MvRow(g: String, prio: String, v: Long)

class MvStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-mv-stream").toString

  private def rows(r: Range): Seq[MvRow] =
    r.map(i => MvRow(s"g${i % 3}", s"p${i % 5}", (i % 7).toLong))

  private def state(path: String) = {
    val t = spark.read.parquet(path)
    val cols = t.columns.sorted.map(col)
    t.select(cols: _*).orderBy(cols: _*)
      .collect().map(_.toSeq).toSeq
  }

  test("micro-batched maintenance == from-scratch rebuild over full history") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    val m = new MvMaintainer(s"$root/source", Seq("g", "prio"), Seq("v"),
      s"$root/mv", minMaxCols = Seq("v"))
    val input = MemoryStream[MvRow]
    val query = MvStream.maintain(input.toDF(), m).start()
    try {
      // three separate micro-batches: base load + two delta refreshes
      Seq(rows(1 to 50), rows(51 to 80), rows(81 to 120)).foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    assert(m.lastBatchId == 2, "three micro-batches must have committed")
    val full = freshRoot()
    rows(1 to 120).toDF().write.parquet(s"$full/fact")
    MvRewrite.materialize(spark, s"$full/fact",
      groupCols = Seq("g", "prio"), sumCols = Seq("v"),
      mvPath = s"$full/mv", minMaxCols = Seq("v"))
    assert(state(m.mv.mvPath) == state(s"$full/mv"),
      "streamed refreshes must equal the from-scratch build")
    MvRewrite.clear()
  }

  test("a redelivered batch is skipped — the refresh is idempotent") {
    val root = freshRoot()
    val m = new MvMaintainer(s"$root/source", Seq("g"), Seq("v"), s"$root/mv")
    m.apply(rows(1 to 40).toDF(), 0L)
    m.apply(rows(41 to 60).toDF(), 1L)
    val before = state(m.mv.mvPath)
    val path = m.mv.mvPath
    // at-least-once delivery replays batch 1: folding it again would
    // double-count rows 41-60
    m.apply(rows(41 to 60).toDF(), 1L)
    assert(m.mv.mvPath == path, "a skipped batch must not flip the A/B copy")
    assert(state(m.mv.mvPath) == before, "state must be unchanged")
    MvRewrite.clear()
  }

  test("CDC mode: a changelog stream (inserts, deletes, updates) lands " +
    "on the net state; replay across the retraction path is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    // changelog rows: the MvRow fields + op
    val m = new MvMaintainer(s"$root/source", Seq("g", "prio"), Seq("v"),
      s"$root/mv", opCol = Some("op"))
    def cdc(r: Range, op: Int) =
      rows(r).map(x => (x.g, x.prio, x.v, op))
    val input = MemoryStream[(String, String, Long, Int)]
    val query = MvStream.maintain(
      input.toDF().toDF("g", "prio", "v", "op"), m).start()
    try {
      // batch 0: inserts 1..60 (pure-append CDC)
      input.addData(cdc(1 to 60, 1))
      query.processAllAvailable()
      // batch 1: delete 1..20, insert 61..80
      input.addData(cdc(1 to 20, -1) ++ cdc(61 to 80, 1))
      query.processAllAvailable()
      // batch 2: update 30..40 as delete+insert with v+5
      input.addData(cdc(30 to 40, -1) ++
        rows(30 to 40).map(x => (x.g, x.prio, x.v + 5L, 1)))
      query.processAllAvailable()
    } finally query.stop()
    assert(m.lastBatchId == 2, "three CDC micro-batches must have committed")
    // net state: 21..60 with 30..40 bumped, plus 61..80
    val net = (rows(21 to 29) ++ rows(30 to 40).map(x => x.copy(v = x.v + 5L)) ++
      rows(41 to 80))
    val full = freshRoot()
    net.toDF().write.parquet(s"$full/fact")
    MvRewrite.materialize(spark, s"$full/fact",
      groupCols = Seq("g", "prio"), sumCols = Seq("v"), mvPath = s"$full/mv")
    assert(state(m.mv.mvPath) == state(s"$full/mv"),
      "streamed changelog folds must equal a rebuild over the net state")
    // redelivery across the retraction path: re-applying batch 2
    // would retract the updates twice
    val before = state(m.mv.mvPath)
    m.apply((cdc(30 to 40, -1) ++
      rows(30 to 40).map(x => (x.g, x.prio, x.v + 5L, 1)))
      .toDF("g", "prio", "v", "op"), 2L)
    assert(state(m.mv.mvPath) == before, "replayed CDC batch must be a no-op")
    // min-max views refuse CDC mode at construction
    intercept[IllegalArgumentException] {
      new MvMaintainer(s"$root/source2", Seq("g"), Seq("v"),
        s"$root/mv2", minMaxCols = Seq("v"), opCol = Some("op"))
    }
    MvRewrite.clear()
  }

  test("HLL maintainer: streamed register folds == from-scratch build; " +
    "replay no-op; restart resumes") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    val m = new graft.streaming.HllMaintainer("g", "k", s"$root/mv")
    val input = MemoryStream[(String, Long)]
    val query = MvStream.maintainHll(input.toDF().toDF("g", "k"), m).start()
    def batchRows(r: Range) = r.map(i => (s"g${i % 3}", (i % 40).toLong))
    try {
      Seq(batchRows(1 to 50), batchRows(51 to 120), batchRows(121 to 200))
        .foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    assert(m.lastBatchId == 2)
    val direct = graft.operators.HllMv.materializeFrom(
      batchRows(1 to 200).toDF("g", "k"),
      graft.operators.HllMv.Def("g", "k", s"$root/direct"))
    def regs(p: String) = spark.read.parquet(p)
      .orderBy($"g", $"bucket").collect().toSeq
    assert(regs(m.mv.mvPath) == regs(direct.mvPath),
      "streamed register folds must equal the from-scratch registers")
    // replay + restart
    val before = regs(m.mv.mvPath)
    val path = m.mv.mvPath
    m.apply(batchRows(121 to 200).toDF("g", "k"), 2L)
    assert(m.mv.mvPath == path && regs(m.mv.mvPath) == before,
      "replayed batch must be a protocol-level no-op")
    val m2 = new graft.streaming.HllMaintainer("g", "k", s"$root/mv")
    assert(m2.lastBatchId == 2L && m2.mv.mvPath == path,
      "restart must resume the committed id and serve the committed copy")
  }

  test("stream-maintained registers serve approx_count_distinct through " +
    "the rewrite == batch build (the q217 gear over the streaming path)") {
    GraftRuntime.ensure(spark)
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    def batchRows(r: Range) = r.map(i => (s"g${i % 3}", (i % 40).toLong))
    // the declared fact: same rows the stream will deliver
    val src = s"$root/fact.parquet"
    batchRows(1 to 200).toDF("g", "k").write.parquet(src)
    val m = new graft.streaming.HllMaintainer("g", "k", s"$root/mv",
      sourcePath = Some(src))
    val input = MemoryStream[(String, Long)]
    val query = MvStream.maintainHll(input.toDF().toDF("g", "k"), m).start()
    try {
      Seq(batchRows(1 to 50), batchRows(51 to 120), batchRows(121 to 200))
        .foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    try {
      // the maintainer registered its committed def on each commit —
      // a declarative approx-distinct over the fact path must rewrite
      // onto the STREAM-maintained register table
      val served = spark.read.parquet(src).groupBy($"g")
        .agg(approx_count_distinct($"k").as("acd")).orderBy($"g")
      val leaves = served.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      assert(leaves.contains(m.mv.mvPath.substring(m.mv.mvPath.indexOf("graft"))),
        s"serve must scan the maintained register table:\n$leaves")
      assert(!leaves.contains("fact.parquet"),
        "serve must never scan the fact")
      // … and equal the batch-built twin's serve exactly (registers
      // are deterministic — value equality, no error bars)
      val direct = graft.operators.HllMv.materializeFrom(
        batchRows(1 to 200).toDF("g", "k"),
        graft.operators.HllMv.Def("g", "k", s"$root/direct"))
      val want = graft.operators.HllMv.serveDistinct(spark, direct)
        .select($"g", expr("CAST(floor(est + 0.5d) AS BIGINT)").as("acd"))
        .orderBy($"g").collect().toSeq
      assert(served.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) ==
        want.map(r => (r.getString(0), r.getLong(1))),
        "stream-maintained serve == batch-built serve")
      // restart re-registers for serving immediately
      MvRewrite.clear()
      val m2 = new graft.streaming.HllMaintainer("g", "k", s"$root/mv",
        sourcePath = Some(src))
      assert(m2.lastBatchId == 2L)
      val again = spark.read.parquet(src).groupBy($"g")
        .agg(approx_count_distinct($"k").as("acd")).orderBy($"g")
      assert(!again.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString.contains("fact.parquet"),
        "a restarted maintainer must serve through the rewrite too")
    } finally MvRewrite.clear()
  }

  test("bitmap maintainer: streamed OR folds == from-scratch words; " +
    "exact count(DISTINCT) serves through the rewrite") {
    GraftRuntime.ensure(spark)
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    def batchRows(r: Range) = r.map(i => (s"g${i % 3}", (i % 40).toLong))
    val src = s"$root/fact.parquet"
    batchRows(1 to 200).toDF("g", "k").write.parquet(src)
    val m = new graft.streaming.BitmapMaintainer(Seq("g"), "k",
      s"$root/mv", sourcePath = Some(src))
    val input = MemoryStream[(String, Long)]
    val query = MvStream.maintainBitmap(input.toDF().toDF("g", "k"), m)
      .start()
    try {
      Seq(batchRows(1 to 50), batchRows(51 to 120), batchRows(121 to 200))
        .foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    try {
      assert(m.lastBatchId == 2)
      // word state == from-scratch build over the full history
      val direct = graft.operators.BitmapMv.materializeFrom(
        batchRows(1 to 200).toDF("g", "k"),
        graft.operators.BitmapMv.Def(Seq("g"), "k", s"$root/direct"))
      assert(state(m.mv.mvPath) == state(direct.mvPath),
        "streamed OR folds must equal the from-scratch words")
      // exact count(DISTINCT) over the fact path serves from the
      // STREAM-maintained bitmap table — and, the serve being exact,
      // equals the direct distinct count by value
      val served = spark.read.parquet(src).groupBy($"g")
        .agg(countDistinct($"k").as("dct")).orderBy($"g")
      val leaves = served.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      assert(leaves.contains(
        m.mv.mvPath.substring(m.mv.mvPath.indexOf("graft"))),
        s"serve must scan the maintained bitmap table:\n$leaves")
      assert(!leaves.contains("fact.parquet"),
        "serve must never scan the fact")
      val want = batchRows(1 to 200).toDF("g", "k").groupBy($"g")
        .agg(countDistinct($"k").as("dct")).orderBy($"g")
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      assert(served.collect().toSeq
        .map(r => (r.getString(0), r.getLong(1))) == want,
        "stream-maintained exact serve == direct count(distinct)")
      // a redelivered batch is a protocol-level no-op
      val before = state(m.mv.mvPath)
      val path = m.mv.mvPath
      m.apply(batchRows(121 to 200).toDF("g", "k"), 2L)
      assert(m.mv.mvPath == path && state(m.mv.mvPath) == before,
        "replayed batch must be a no-op")
      // restart resumes and re-registers for serving immediately
      MvRewrite.clear()
      val m2 = new graft.streaming.BitmapMaintainer(Seq("g"), "k",
        s"$root/mv", sourcePath = Some(src))
      assert(m2.lastBatchId == 2L && m2.mv.mvPath == path)
      val again = spark.read.parquet(src).groupBy($"g")
        .agg(countDistinct($"k").as("dct")).orderBy($"g")
      assert(!again.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString.contains("fact.parquet"),
        "a restarted maintainer must serve through the rewrite too")
    } finally MvRewrite.clear()
  }

  test("quantile maintainer: streamed CDC folds == from-scratch sketch " +
    "over the net state; serve rides the approx-percentile rewrite") {
    GraftRuntime.ensure(spark)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, lit, percentile_approx}
    val root = freshRoot()
    // net effective rows: inserts 1..200 minus deletes of ids % 4 == 0
    def ins(r: Range) = r.map(i => (s"g${i % 2}", (i % 61) * 2L, 1))
    def del(r: Range) = r.filter(_ % 4 == 0)
      .map(i => (s"g${i % 2}", (i % 61) * 2L, -1))
    val eff = (1 to 200).filter(_ % 4 != 0)
      .map(i => (s"g${i % 2}", (i % 61) * 2L))
    val src = s"$root/fact.parquet"
    eff.toDF("g", "v").write.parquet(src)
    val m = new graft.streaming.QuantileMaintainer(Seq("g"), "v",
      s"$root/mv", sourcePath = Some(src), opCol = Some("op"))
    val input = MemoryStream[(String, Long, Int)]
    val query = MvStream.maintainQuantile(
      input.toDF().toDF("g", "v", "op"), m).start()
    try {
      Seq(ins(1 to 120) ++ del(1 to 80),
        ins(121 to 200) ++ del(81 to 200))
        .foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    try {
      assert(m.lastBatchId == 1)
      // streamed signed folds == from-scratch sketch over net state
      val direct = graft.operators.QuantileMv.materializeFrom(
        eff.toDF("g", "v"),
        graft.operators.QuantileMv.Def(Seq("g"), "v", s"$root/direct"))
      def h(p: String) = spark.read.parquet(p)
        .orderBy(col("g"), col("id")).collect().toSeq
      assert(h(m.mv.mvPath) == h(direct.mvPath),
        "streamed signed folds must equal the net-state histogram")
      // a declarative approx_percentile over the fact path serves
      // from the STREAM-maintained sketch
      val served = spark.read.parquet(src).groupBy(col("g"))
        .agg(percentile_approx(col("v"), lit(0.5), lit(1000)).as("p50v"))
        .orderBy(col("g"))
      val leaves = served.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      assert(!leaves.contains("fact.parquet"),
        s"serve must never scan the fact:\n$leaves")
      val want = graft.operators.QuantileMv
        .serveQuantiles(spark, direct, Seq(50))
        .select(col("g"), col("p50").as("p50v")).orderBy(col("g"))
      assert(served.collect().toSeq == want.collect().toSeq,
        "stream-maintained serve == batch-built sketch estimate")
    } finally MvRewrite.clear()
  }

  test("restart resumes from the committed marker") {
    val root = freshRoot()
    val m1 = new MvMaintainer(s"$root/source", Seq("g"), Seq("v"), s"$root/mv")
    m1.apply(rows(1 to 40).toDF(), 0L)
    m1.apply(rows(41 to 60).toDF(), 1L)
    val committedState = state(m1.mv.mvPath)
    // a new maintainer over the same root — the restart path
    val m2 = new MvMaintainer(s"$root/source", Seq("g"), Seq("v"), s"$root/mv")
    assert(m2.lastBatchId == 1L, "restart must resume the committed batch id")
    assert(m2.mv.mvPath == m1.mv.mvPath, "restart must serve the committed copy")
    m2.apply(rows(41 to 60).toDF(), 1L) // replay across restart — skipped
    assert(state(m2.mv.mvPath) == committedState)
    m2.apply(rows(61 to 90).toDF(), 2L) // new data still folds
    val full = freshRoot()
    rows(1 to 90).toDF().write.parquet(s"$full/fact")
    MvRewrite.materialize(spark, s"$full/fact",
      groupCols = Seq("g"), sumCols = Seq("v"), mvPath = s"$full/mv")
    assert(state(m2.mv.mvPath) == state(s"$full/mv"),
      "post-restart refreshes must continue the same algebra")
    MvRewrite.clear()
  }

  test("join maintainer: a left CDC stream against the dimension lands " +
    "on the net join; redelivery and restart ride the shared protocol") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    // dimension: 6 keys with payloads
    val dim = (0L to 5L).map(k => (k, s"d$k")).toDF("bk", "payload")
    dim.write.parquet(s"$root/dim")
    val m = new graft.streaming.JoinMaintainer(
      s"$root/dim", "k", "bk", s"$root/jmv")
    def cdc(r: Range, op: Int) =
      r.map(i => (i.toLong, (i % 6).toLong, op))
    val input = MemoryStream[(Long, Long, Int)]
    val query = graft.streaming.MvStream.maintainJoin(
      input.toDF().toDF("id", "k", "op"), m).start()
    try {
      input.addData(cdc(1 to 40, 1)) // batch 0: inserts
      query.processAllAvailable()
      // batch 1: delete ids ≡ 0 mod 4, insert 41..50
      input.addData(cdc(1 to 40, -1).filter(_._1 % 4 == 0) ++
        cdc(41 to 50, 1))
      query.processAllAvailable()
    } finally query.stop()
    assert(m.lastBatchId == 1, "two micro-batches must have committed")
    // net left state: 1..50 minus (≤40 ∧ ≡0 mod 4)
    val live = (1 to 50).filterNot(i => i <= 40 && i % 4 == 0)
    val want = live.map(i => (i.toLong, (i % 6).toLong))
      .toDF("id", "k").join(dim, col("k") === col("bk"))
      .select(col("id"), col("k"), col("bk"), col("payload"))
      .orderBy(col("id")).collect().toSeq
    val got = m.serve(spark)
      .select(col("id"), col("k"), col("bk"), col("payload"))
      .orderBy(col("id")).collect().toSeq
    assert(got == want, "streamed CDC join folds must equal the " +
      "direct net-state join")
    // redelivery of the last batch is a no-op
    val before = state(m.zdef.mvPath)
    m.apply((cdc(1 to 40, -1).filter(_._1 % 4 == 0) ++ cdc(41 to 50, 1))
      .toDF("id", "k", "op"), 1L)
    assert(state(m.zdef.mvPath) == before,
      "replayed batch must be a no-op")
    // restart resumes from the marker and keeps folding
    val m2 = new graft.streaming.JoinMaintainer(
      s"$root/dim", "k", "bk", s"$root/jmv")
    assert(m2.lastBatchId == 1L && m2.zdef.mvPath == m.zdef.mvPath,
      "restart must resume the committed copy")
    m2.apply(cdc(51 to 60, 1).toDF("id", "k", "op"), 2L)
    val live2 = live ++ (51 to 60)
    val want2 = live2.map(i => (i.toLong, (i % 6).toLong))
      .toDF("id", "k").join(dim, col("k") === col("bk"))
      .select(col("id"), col("k"), col("bk"), col("payload"))
      .orderBy(col("id")).collect().toSeq
    val got2 = m2.serve(spark)
      .select(col("id"), col("k"), col("bk"), col("payload"))
      .orderBy(col("id")).collect().toSeq
    assert(got2 == want2,
      "post-restart folds must continue the same algebra")
  }

  test("join maintainer: out-of-order retraction (delete delivered a " +
    "batch before its insert) nets to zero instead of over-counting; " +
    "state keeps the pending negative bounded-compacted") {
    val root = freshRoot()
    val dim = (0L to 3L).map(k => (k, s"d$k")).toDF("bk", "payload")
    dim.write.parquet(s"$root/dim")
    val m = new graft.streaming.JoinMaintainer(
      s"$root/dim", "k", "bk", s"$root/jmv")
    // batch 0: the DELETE of (id=7, k=1) arrives BEFORE its insert,
    // alongside a normal insert (id=1, k=0)
    m.apply(Seq((1L, 0L, 1), (7L, 1L, -1)).toDF("id", "k", "op"), 0L)
    assert(m.serve(spark).select(col("id")).as[Long].collect().toSeq
      == Seq(1L), "a pending retraction must not serve")
    // ...but it must SURVIVE the per-fold compaction in state
    val st = spark.read.parquet(m.zdef.mvPath)
    assert(st.filter(col("__m") < 0).count() == 1,
      "state must retain the net-negative row awaiting its insert")
    // batch 1: the late insert lands; net 0 — the true order
    // (insert then delete) means ABSENT. The dropped-retraction bug
    // served id=7 here.
    m.apply(Seq((7L, 1L, 1)).toDF("id", "k", "op"), 1L)
    assert(m.serve(spark).select(col("id")).as[Long].collect().toSeq
      == Seq(1L), "late insert must cancel against the retraction")
    // net-zero rows are compacted OUT of state entirely
    assert(spark.read.parquet(m.zdef.mvPath)
      .filter(col("id") === 7L).count() == 0,
      "cancelled pairs must not linger in state")
    // a SECOND insert of the same row outlives the single delete
    m.apply(Seq((7L, 1L, 1)).toDF("id", "k", "op"), 2L)
    assert(m.serve(spark).select(col("id")).as[Long]
      .collect().sorted.toSeq == Seq(1L, 7L))
  }

  test("compactZ keeps net-negative rows: an out-of-order retraction " +
    "survives batch-lane compaction and still cancels its insert") {
    import graft.operators.JoinMv
    val root = freshRoot()
    val dim = Seq((1L, "d1")).toDF("bk", "payload")
    dim.write.parquet(s"$root/dim")
    Seq((1L, 1L)).toDF("id", "k").write.parquet(s"$root/left")
    val d = JoinMv.materializeZ(spark,
      JoinMv.ZDef(s"$root/left", s"$root/dim", "k", "bk", s"$root/zmv"))
    // the retraction of a row the MV has not seen yet (out-of-order)
    JoinMv.refreshRetract(spark, d,
      Some(Seq((7L, 1L, -1)).toDF("id", "k", "op")), None)
    val compacted = JoinMv.compactZ(spark, d, s"$root/zmv2")
    assert(spark.read.parquet(compacted.mvPath)
      .filter(col("__m") < 0).count() == 1,
      "compaction must retain the pending negative")
    // the insert arrives post-compaction and cancels exactly
    JoinMv.refreshRetract(spark, compacted,
      Some(Seq((7L, 1L, 1)).toDF("id", "k", "op")), None)
    assert(JoinMv.serveZ(spark, compacted).select(col("id"))
      .as[Long].collect().toSeq == Seq(1L),
      "post-compaction insert must cancel against the kept negative")
  }
}
