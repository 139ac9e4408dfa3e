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
}
