package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

import graft.plans.MvRewrite
import graft.plans.MvRewrite.MvDef

/** The batch-id / marker / alternating-path two-phase commit protocol
  * shared by [[MvMaintainer]] and [[HllMaintainer]] — ONE copy of the
  * failure-model machinery, so a future fix to the crash semantics
  * cannot drift between the two maintainers:
  *
  *  - state alternates between `<root>/a` and `<root>/b`; a refresh
  *    reads the COMMITTED copy and overwrites the other;
  *  - the commit point is one atomic rename of the tiny `_committed`
  *    marker (`batchId,path`) — a crash after the parquet write but
  *    before [[commit]] leaves the committed state untouched, and the
  *    replay overwrites the half-written copy from the committed one;
  *  - a new instance over the same root resumes from the marker
  *    (committed path + batch id); a never-committed root starts at
  *    (-1, pathA).
  *
  * This is the file-system miniature of [[graft.io.AtomicSink]]'s
  * two-phase commit — on object storage the marker would be the
  * table-format commit (the role a Delta/Iceberg snapshot pointer
  * plays).
  */
private[streaming] final class CommitLog(root: String) {
  val pathA = s"$root/a"
  val pathB = s"$root/b"
  private val marker: Path = Paths.get(root, "_committed")

  private var state: (Long, String) = {
    if (Files.exists(marker)) {
      val Array(b, p) = Files.readString(marker).trim.split(",", 2)
      (b.toLong, p)
    } else (-1L, pathA)
  }

  /** Last committed batch id; -1 before the first commit. */
  def batchId: Long = state._1

  /** The committed copy's path (valid only after the first commit,
    * except as the conventional initial target). */
  def path: String = state._2

  /** The NON-committed path — where the next refresh writes. */
  def next: String = if (state._2 == pathA) pathB else pathA

  /** Atomically advance the committed state to (batchId, path). */
  def commit(batchId: Long, path: String): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp: Path = Paths.get(root, "_committed.tmp")
    Files.write(tmp, s"$batchId,$path".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    state = (batchId, path)
  }
}

/** Continuous materialized-view maintenance — the streaming completion
  * of [[graft.plans.MvRewrite.refreshIncremental]]: a `foreachBatch`
  * sink folds every micro-batch of appends into the registered MV, so
  * rollup freshness tracks ingestion instead of waiting for a manual
  * rebuild (the reference re-aggregates its full fact table per load,
  * `etl_pipeline_spark.py:1398-1455`; q197 is the one-shot form).
  *
  * Correctness under streaming's failure model, which a plain
  * refresh-per-batch would NOT have:
  *
  *  - **At-least-once redelivery**: the refresh is additive, so
  *    re-applying a batch would double-count. The maintainer commits
  *    the applied `batchId` and skips any batch at or below it — the
  *    standard `foreachBatch` idempotency contract.
  *  - **Crash mid-refresh / restart**: the [[CommitLog]] protocol
  *    above.
  *
  * State is the grouping-domain-sized MV itself plus one marker file;
  * nothing here scales with stream volume.
  *
  * Two input shapes: append-only batches (default) fold through
  * [[graft.plans.MvRewrite.refreshIncremental]]; with `opCol` set the
  * stream is a CHANGELOG (rows + op ∈ {+1, −1}, updates as
  * delete+insert) and batches fold through the signed partial merge
  * ([[graft.plans.MvRewrite.refreshRetract]]) — deletes and updates
  * keep the MV fresh too, at the stated cost that MIN/MAX partials
  * are out of scope (refused at construction).
  */
final class MvMaintainer(sourcePath: String, groupCols: Seq[String],
                         sumCols: Seq[String], root: String,
                         minMaxCols: Seq[String] = Nil,
                         opCol: Option[String] = None) {

  // CDC mode folds batches through the SIGNED partial merge
  // ([[MvRewrite.refreshRetract]]), whose hard scope line is no
  // MIN/MAX partials — refuse at construction, not at batch 7
  require(opCol.isEmpty || minMaxCols.isEmpty,
    s"MvMaintainer: CDC mode (opCol=$opCol) cannot maintain MIN/MAX " +
      s"partials $minMaxCols — deletes make them non-derivable")

  private val log = new CommitLog(root)

  /** The currently-served MV definition (registered on construction
    * so serving queries rewrite immediately after a restart). */
  def mv: MvDef = MvDef(sourcePath, groupCols, sumCols, log.path, minMaxCols)
  MvRewrite.register(mv)

  def lastBatchId: Long = log.batchId

  /** Fold one micro-batch of appends into the MV. Skips batches at or
    * below the committed id (redelivery); commits via atomic marker
    * rename. Called serially by the streaming engine — foreachBatch
    * never overlaps invocations of one query.
    */
  def apply(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= log.batchId) return // redelivered batch — already folded
    // the maintainer's session is long-lived by definition — bound
    // the Derived registry by the measured default (idempotent;
    // explicit budgets win)
    graft.Derived.ensureBudget(batch.sparkSession)
    val next = log.next
    val refreshed =
      if (log.batchId < 0L)
        // first batch = the base load: build, don't merge (there is
        // no committed copy to read yet). In CDC mode the batch's
        // SIGNED partials are the initial state — equal to the plain
        // partials when every op is +1, and correct for intra-batch
        // delete+insert pairs
        opCol match {
          case Some(op) => MvRewrite.baseFromCdc(batch,
            MvDef(sourcePath, groupCols, sumCols, next, minMaxCols), op)
          case None => MvRewrite.materializeFrom(batch,
            MvDef(sourcePath, groupCols, sumCols, next, minMaxCols))
        }
      else opCol match {
        case Some(op) =>
          MvRewrite.refreshRetract(batch.sparkSession, mv, batch, op, next)
        case None =>
          MvRewrite.refreshIncremental(batch.sparkSession, mv, batch, next)
      }
    log.commit(batchId, next)
    MvRewrite.register(refreshed)
  }
}

object MvStream {

  /** Attach a maintainer to a stream of appends: every micro-batch
    * refreshes the MV, and the registered definition always points at
    * the last COMMITTED copy. */
  def maintain(stream: DataFrame, m: MvMaintainer)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => m.apply(batch, id))
      .outputMode("append")

  /** [[maintain]] for the HLL register table. */
  def maintainHll(stream: DataFrame, m: HllMaintainer)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => m.apply(batch, id))
      .outputMode("append")

  /** [[maintain]] for the quantile-sketch table. */
  def maintainQuantile(stream: DataFrame, m: QuantileMaintainer)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => m.apply(batch, id))
      .outputMode("append")

  /** [[maintain]] for the exact-distinct bitmap table. */
  def maintainBitmap(stream: DataFrame, m: BitmapMaintainer)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => m.apply(batch, id))
      .outputMode("append")

  /** [[maintain]] for the z-set join MV. */
  def maintainJoin(stream: DataFrame, m: JoinMaintainer)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => m.apply(batch, id))
      .outputMode("append")
}

/** Continuous maintenance of the z-set join MV
  * ([[graft.operators.JoinMv]]'s signed path) — the fact-stream ×
  * dimension pattern: the LEFT side arrives as a CHANGELOG stream
  * (full row payloads + op ∈ {+1, −1}), the right side is the
  * dimension table at `rightPath` (the slowly-changing side, updated
  * by the batch lane), and every micro-batch folds `ΔA ⋈ B′` with
  * ΔA's signs into the maintained join. The fifth maintained
  * structure over the one shared [[CommitLog]] protocol: committed
  * batch id turns at-least-once redelivery into a no-op, state
  * alternates two paths with the atomic marker rename as the commit
  * point, a restarted maintainer resumes from the marker.
  *
  * Each fold rewrites the netted state (committed ∪ signed delta,
  * multiplicities netted to their non-zero sums — compaction rides
  * along on EVERY fold, so the state never accumulates a retraction
  * log; its size is bounded by |live join rows| + |out-of-order
  * retractions still awaiting their insert|, independent of stream
  * history, and the marker/paths of the [[CommitLog]] are a constant
  * 2 directories + 1 file regardless of batch count). Net-NEGATIVE
  * rows stay in state (a delete delivered a batch before its insert
  * must cancel it later); only [[serve]] filters to `__m` > 0.
  * That is MV-sized I/O
  * per batch — the honest price of the alternating-copy crash model
  * on plain parquet; a table-format deployment (Delta/Iceberg)
  * appends the delta files under the format's snapshot commit
  * instead, same algebra, delta-sized I/O. The stated scope line:
  * RIGHT-side changes ride the batch lane
  * ([[graft.operators.JoinMv.refreshRetract]]'s two-sided form), not
  * this stream.
  */
final class JoinMaintainer(rightPath: String, leftKey: String,
                           rightKey: String, root: String,
                           opCol: String = "op") {

  import graft.operators.JoinMv

  private val log = new CommitLog(root)

  def lastBatchId: Long = log.batchId

  /** The committed copy — what [[serve]] reads. */
  def zdef: JoinMv.ZDef =
    JoinMv.ZDef("", rightPath, leftKey, rightKey, log.path)

  def serve(spark: org.apache.spark.sql.SparkSession): DataFrame =
    JoinMv.serveZ(spark, zdef)

  def apply(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= log.batchId) return // redelivered — already folded
    graft.Derived.ensureBudget(batch.sparkSession) // long-lived session
    val next = log.next
    val delta = JoinMv.leftCdcDelta(batch.sparkSession, rightPath,
      leftKey, rightKey, batch, opCol)
    val merged =
      if (log.batchId < 0L) delta // first batch — nothing committed yet
      else batch.sparkSession.read.parquet(log.path).unionByName(delta)
    // nettedSigned, NOT netted: state keeps net-negative rows so a
    // retraction delivered before its insert (out-of-order CDC across
    // micro-batches) still cancels when the insert arrives; the
    // __m > 0 live filter applies only in serveZ
    JoinMv.nettedSigned(merged).write.mode("overwrite").parquet(next)
    log.commit(batchId, next)
  }
}

/** Continuous maintenance of the mergeable HLL register table
  * ([[graft.operators.HllMv]]) — distinct-count freshness tracking
  * ingestion the way [[MvMaintainer]] tracks it for the algebraic
  * partials. Identical failure-model machinery via the shared
  * [[CommitLog]]: committed batch id turns at-least-once redelivery
  * into a no-op, the table alternates two paths with one atomic
  * marker rename as the commit point, a restarted maintainer resumes
  * from the marker. The fold itself is register-wise MAX — idempotent,
  * so even a REAPPLIED batch would land on the same registers; the
  * batch-id skip still guards it because idempotence is a property of
  * THIS fold, not of the protocol, and the protocol must not depend
  * on it. Insert-only by [[graft.operators.HllMv]]'s stated scope.
  */
final class HllMaintainer(grpCol: String, keyCol: String, root: String,
                          sourcePath: Option[String] = None) {

  import graft.operators.HllMv

  private val log = new CommitLog(root)

  def mv: HllMv.Def = HllMv.Def(grpCol, keyCol, log.path, sourcePath)
  def lastBatchId: Long = log.batchId

  // with a declared source, serving queries rewrite through
  // MvRewrite's approx-distinct gear immediately after a restart —
  // the same construction-time registration MvMaintainer does
  if (sourcePath.isDefined) MvRewrite.registerHll(mv)

  def apply(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= log.batchId) return // redelivered — already folded
    graft.Derived.ensureBudget(batch.sparkSession) // long-lived session
    val next = log.next
    val folded =
      if (log.batchId < 0L)
        HllMv.materializeFrom(batch, HllMv.Def(grpCol, keyCol, next, sourcePath))
      else
        HllMv.refreshIncremental(batch.sparkSession, mv, batch, next)
    log.commit(batchId, next)
    if (sourcePath.isDefined) MvRewrite.registerHll(folded)
  }
}

/** Continuous maintenance of the exact-distinct bitmap table
  * ([[graft.operators.BitmapMv]]) — EXACT distinct-count freshness
  * tracking ingestion, the fourth maintained structure over the one
  * shared [[CommitLog]] protocol. The fold is word-wise OR —
  * idempotent like the HLL register MAX (a redelivered key sets a
  * bit that is already set), and the batch-id skip still guards it
  * for the same reason stated on [[HllMaintainer]]: idempotence is a
  * property of THIS fold, not of the protocol. Insert-only by
  * [[graft.operators.BitmapMv]]'s stated scope — deletes go through
  * the batch-side touched-cell rederive, not the stream.
  */
final class BitmapMaintainer(grpCols: Seq[String], keyCol: String,
                             root: String,
                             sourcePath: Option[String] = None) {

  import graft.operators.BitmapMv

  private val log = new CommitLog(root)

  def mv: BitmapMv.Def = BitmapMv.Def(grpCols, keyCol, log.path, sourcePath)
  def lastBatchId: Long = log.batchId

  // with a declared source, serving queries rewrite through the
  // exact-distinct gear immediately after a restart
  if (sourcePath.isDefined) MvRewrite.registerBitmap(mv)

  def apply(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= log.batchId) return // redelivered — already folded
    graft.Derived.ensureBudget(batch.sparkSession) // long-lived session
    val next = log.next
    val folded =
      if (log.batchId < 0L)
        BitmapMv.materializeFrom(batch,
          BitmapMv.Def(grpCols, keyCol, next, sourcePath))
      else
        BitmapMv.refreshIncremental(batch.sparkSession, mv, batch, next)
    log.commit(batchId, next)
    if (sourcePath.isDefined) MvRewrite.registerBitmap(folded)
  }
}

/** Continuous maintenance of the log-linear quantile-sketch table
  * ([[graft.operators.QuantileMv]]) — percentile freshness tracking
  * ingestion, completing the maintained-sketch trio (algebraic
  * partials, HLL registers, bucket histograms) over the one shared
  * [[CommitLog]] protocol. Two input shapes, exactly as
  * [[MvMaintainer]]: append-only batches fold by bucket-count ADD;
  * with `opCol` set the stream is a changelog and batches fold
  * through the SIGNED merge ([[graft.operators.QuantileMv
  * .refreshRetract]]) — bucket counts subtract, so unlike the HLL
  * maintainer there is no insert-only scope line at all.
  */
final class QuantileMaintainer(grpCols: Seq[String], valCol: String,
                               root: String,
                               sourcePath: Option[String] = None,
                               opCol: Option[String] = None) {

  import graft.operators.QuantileMv

  private val log = new CommitLog(root)

  def mv: QuantileMv.Def = QuantileMv.Def(grpCols, valCol, log.path, sourcePath)
  def lastBatchId: Long = log.batchId

  // with a declared source, serving queries rewrite through the
  // approx-percentile gear immediately after a restart
  if (sourcePath.isDefined) MvRewrite.registerQuantile(mv)

  def apply(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= log.batchId) return // redelivered — already folded
    graft.Derived.ensureBudget(batch.sparkSession) // long-lived session
    val next = log.next
    val folded =
      if (log.batchId < 0L) {
        // first batch = base load; in CDC mode the batch's NET signed
        // histogram (intra-batch delete+insert pairs cancel exactly)
        val d0 = QuantileMv.Def(grpCols, valCol, next, sourcePath)
        opCol match {
          case Some(op) => QuantileMv.baseFromCdc(batch, d0, op)
          case None => QuantileMv.materializeFrom(batch, d0)
        }
      }
      else opCol match {
        case Some(op) =>
          QuantileMv.refreshRetract(batch.sparkSession, mv, batch, op, next)
        case None =>
          QuantileMv.refreshIncremental(batch.sparkSession, mv, batch, next)
      }
    log.commit(batchId, next)
    if (sourcePath.isDefined) MvRewrite.registerQuantile(folded)
  }
}
