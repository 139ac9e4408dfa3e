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
}
