package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN materialization — the MV family
  * member the aggregate gears ([[graft.plans.MvRewrite]], [[HllMv]],
  * [[QuantileMv]], [[BitmapMv]]) cannot cover: a materialized
  * `A ⋈ B` whose refresh under append-only deltas is the classic
  * delta-join algebra
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B′  ∪  (A′ \ ΔA) ⋈ ΔB
  *
  * with A′/B′ the POST-append side tables (the same
  * already-reflects-the-batch contract as
  * [[graft.plans.MvRewrite.refreshRetractRederive]]): the first term
  * joins the small left delta against the new right side, the second
  * joins the old left side (recovered as `A′ anti ΔA` on the row
  * identity — no second copy of A is ever stored) against the small
  * right delta, and together they are exactly the new join rows. The
  * reference's pipeline re-joins its full fact and dimension tables
  * every load (`etl_pipeline_spark.py` rebuilds the star join per
  * batch); this reads each FULL side only when the OTHER side's
  * delta is non-empty — an empty ΔB skips A′ entirely (spec-proven
  * by deleting A′ before such a refresh), and both joins are
  * delta×table, never table×table.
  *
  * At 100 TB the residual full-side scan is the cost driver, and the
  * standard mitigations compose: bucket both sides on the join key
  * ([[graft.io.Sinks]] bucketing) so the delta join co-locates, and
  * let AQE runtime-filter the big side by the delta's keys. What the
  * operator REFUSES: deletes/updates (a retraction join-MV needs
  * per-row lineage counts — out of the append-only scope stated
  * here) and non-equi predicates.
  */
object JoinMv {

  /** A registered join view: `leftPath ⋈ rightPath` on
    * `leftKey = rightKey`, materialized at `mvPath`; `leftId` names a
    * column unique per LEFT row (the row identity the `A′ \ ΔA`
    * recovery anti-joins on). */
  final case class Def(leftPath: String, rightPath: String,
                       leftKey: String, rightKey: String,
                       leftId: String, mvPath: String)

  private def joined(a: DataFrame, b: DataFrame, d: Def): DataFrame =
    a.join(b, a(d.leftKey) === b(d.rightKey))

  /** Build + write the join MV over the initial side snapshots. */
  def materialize(spark: SparkSession, d: Def): Def = {
    joined(spark.read.parquet(d.leftPath),
      spark.read.parquet(d.rightPath), d)
      .write.mode("overwrite").parquet(d.mvPath)
    d
  }

  /** Fold one append-only batch (ΔA, ΔB — either may be empty) into
    * the MV by APPENDING the delta-join rows — the existing MV files
    * are never read or rewritten. Contract: the side tables at
    * `leftPath`/`rightPath` ALREADY reflect the batch. Reads: the
    * deltas, B′ when ΔA is non-empty, A′ when ΔB is non-empty —
    * never both sides when one delta is empty (spec-proven by
    * deleting the unneeded side first), never a table×table join.
    * Crash semantics are the plain parquet-append ones; an exactly-
    * once deployment wraps this in [[graft.io.AtomicSink]]'s 2PC the
    * way the streaming maintainers wrap theirs in the CommitLog. */
  def refreshIncremental(spark: SparkSession, d: Def,
                         deltaLeft: Option[DataFrame],
                         deltaRight: Option[DataFrame]): Def = {
    val t1 = deltaLeft.map { da =>
      joined(da, spark.read.parquet(d.rightPath), d)
    }
    val t2 = deltaRight.map { db =>
      val aNew = spark.read.parquet(d.leftPath)
      // A′ \ ΔA on the declared row identity — the pre-batch left
      // side, recovered without ever storing a second copy of A
      val aOld = deltaLeft match {
        case Some(da) =>
          val ids = da.select(col(d.leftId).as("__delta_id"))
          aNew.join(ids, aNew(d.leftId) === ids("__delta_id"), "left_anti")
        case None => aNew
      }
      joined(aOld, db, d)
    }
    (t1.toSeq ++ t2.toSeq).reduceOption(_ unionByName _)
      .foreach(_.write.mode("append").parquet(d.mvPath))
    d
  }

  /** Serve the materialized join — no side access. */
  def serve(spark: SparkSession, d: Def): DataFrame =
    spark.read.parquet(d.mvPath)

  // ---------------------------------------------------------------
  // Z-set (signed-multiplicity) join MV — the retraction-complete
  // sibling of the append-only path above, lifting the stated
  // "deletes/updates refused" scope. The MV is a bag with an explicit
  // multiplicity column `__m`; a CDC batch carries full row payloads
  // with an op column (+1 insert / −1 delete), and one refresh
  // APPENDS the signed delta-join rows
  //
  //   Δ(A ⋈ B) = ΔA ⋈ B′  +  A′ ⋈ ΔB  −  ΔA ⋈ ΔB
  //
  // (A′/B′ the POST-batch sides; signs multiply through the join,
  // the third term un-double-counts the delta×delta overlap — the
  // standard bilinear form over z-sets, cf. the DBSP incremental
  // view-maintenance literature). Every term is delta×table or
  // delta×delta; the MV itself is NEVER read by a refresh. Serving
  // nets multiplicities (group by the row, sum(__m), keep > 0);
  // `compactZ` folds the retraction log into a fresh table when the
  // net-zero fraction warrants it — the same maintenance knob as the
  // quantile sketch's signed merge.
  // ---------------------------------------------------------------

  /** A registered z-set join view: like [[Def]] but no row-identity
    * column is needed — retraction rides multiplicities, not
    * anti-join recovery. */
  final case class ZDef(leftPath: String, rightPath: String,
                        leftKey: String, rightKey: String,
                        mvPath: String)

  private def zJoined(a: DataFrame, b: DataFrame, d: ZDef): DataFrame =
    a.join(b, a(d.leftKey) === b(d.rightKey))

  /** Build + write the z-set join MV (every row at `__m` = 1). */
  def materializeZ(spark: SparkSession, d: ZDef): ZDef = {
    zJoined(spark.read.parquet(d.leftPath),
      spark.read.parquet(d.rightPath), d)
      .withColumn("__m", lit(1L))
      .write.mode("overwrite").parquet(d.mvPath)
    d
  }

  /** Fold one CDC batch (either side, inserts AND deletes) by
    * appending the signed delta-join rows. CDC frames carry the full
    * row payload plus `opCol` ∈ {+1, −1}; the side tables ALREADY
    * reflect the batch (the family's contract). Reads: B′ when ΔA is
    * non-empty, A′ when ΔB is non-empty, the deltas — never the MV,
    * never table×table. */
  def refreshRetract(spark: SparkSession, d: ZDef,
                     cdcLeft: Option[DataFrame],
                     cdcRight: Option[DataFrame],
                     opCol: String = "op"): ZDef = {
    // __m is pinned LONG: materializeZ writes 1L and parquet appends
    // must agree on the column type across files
    def signed(df: DataFrame, m: org.apache.spark.sql.Column,
               drop: Seq[String]) = {
      val cols = df.columns.filterNot(drop.contains).toSeq
      df.withColumn("__m", m.cast("long"))
        .select((cols :+ "__m").map(col): _*)
    }
    val t1 = cdcLeft.map { da =>
      signed(zJoined(da, spark.read.parquet(d.rightPath), d),
        col(opCol), Seq(opCol))
    }
    val t2 = cdcRight.map { db =>
      signed(zJoined(spark.read.parquet(d.leftPath), db, d),
        col(opCol), Seq(opCol))
    }
    val t3 = (cdcLeft, cdcRight) match {
      case (Some(da), Some(db)) =>
        val dbb = db.withColumnRenamed(opCol, "__op_r")
        Some(signed(zJoined(da, dbb, d),
          -col(opCol) * col("__op_r"), Seq(opCol, "__op_r")))
      case _ => None
    }
    (t1.toSeq ++ t2.toSeq ++ t3.toSeq).reduceOption(_ unionByName _)
      .foreach(_.write.mode("append").parquet(d.mvPath))
    d
  }

  /** Net a signed frame's multiplicities, keeping every row whose net
    * is NON-ZERO — the state form. Persisted state (the streaming
    * maintainer's fold, [[compactZ]]) must retain net-NEGATIVE rows:
    * a delete delivered before its matching insert across batches
    * nets to −1, and dropping it would make the later insert
    * over-count (the z-set log keeps signed rows until serve). */
  private[graft] def nettedSigned(t: DataFrame): DataFrame = {
    val cols = t.columns.filter(_ != "__m").toSeq
    t.groupBy(cols.map(col): _*).agg(sum(col("__m")).as("__m"))
      .filter(col("__m") =!= 0)
  }

  /** Net and keep LIVE rows (`__m` > 0) — the serve form only;
    * state folds use [[nettedSigned]]. */
  private[graft] def netted(t: DataFrame): DataFrame =
    nettedSigned(t).filter(col("__m") > 0)

  /** Signed delta-join rows of one LEFT-side CDC batch against the
    * CURRENT right side — ΔA ⋈ B′ carrying ΔA's signs, the per-batch
    * term of the fact-stream × dimension maintenance pattern
    * ([[graft.streaming.JoinMaintainer]]). */
  def leftCdcDelta(spark: SparkSession, rightPath: String,
                   leftKey: String, rightKey: String,
                   cdc: DataFrame, opCol: String = "op"): DataFrame = {
    val b = spark.read.parquet(rightPath)
    val j = cdc.join(b, cdc(leftKey) === b(rightKey))
    val cols = j.columns.filter(_ != opCol).toSeq
    j.withColumn("__m", col(opCol).cast("long"))
      .select((cols :+ "__m").map(col): _*)
  }

  /** Serve the z-set MV: net the multiplicities, keep live rows. One
    * MV-sized keyed aggregate, no side access. */
  def serveZ(spark: SparkSession, d: ZDef): DataFrame = {
    val t = spark.read.parquet(d.mvPath)
    netted(t).drop("__m")
  }

  /** Fold the retraction log into a fresh netted table (every
    * surviving row back at `__m` = net) — the compaction knob.
    * Keeps net-negative rows ([[nettedSigned]]): compaction is a
    * state fold, not a serve, and must not lose out-of-order
    * retractions still waiting for their insert. */
  def compactZ(spark: SparkSession, d: ZDef, newMvPath: String): ZDef = {
    nettedSigned(spark.read.parquet(d.mvPath))
      .write.mode("overwrite").parquet(newMvPath)
    d.copy(mvPath = newMvPath)
  }
}
