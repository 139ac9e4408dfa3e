package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latest-wins upsert — the `MERGE INTO … WHEN MATCHED THEN UPDATE /
  * WHEN NOT MATCHED THEN INSERT` family expressed as an
  * aggregate-then-join, the batch CDC-apply shape.
  *
  * The reference applies updates by collecting rows to the driver and
  * issuing per-row UPDATEs (`etl_pipeline_spark.py:1370-1455`, the
  * customer-aggregate refresh); the Spark-native form stays fully
  * distributed:
  *
  *  1. collapse the update feed to one winner per key with
  *     `max_by(struct(values), seq)` — an algebraic aggregate, so
  *     map-side partials shrink each task's update run BEFORE the
  *     shuffle (a `row_number` window formulation would shuffle and
  *     sort the entire feed instead);
  *  2. one full-outer join against the base on the merge key. A base
  *     bucketed by that key skips its exchange; when the collapsed
  *     feed is small relative to the base (the common CDC case) AQE
  *     broadcasts it.
  */
object Upsert {

  /** Merge `updates` into `base`. `setCols` maps base columns to the
    * update-side columns that overwrite them on a key match; a null
    * update value keeps the base value (COALESCE semantics — use a
    * sentinel struct if null must overwrite). `seq` must order the
    * feed totally per key (unique CDC sequence / LSN): ties would make
    * the winner nondeterministic. Output: base schema plus `op` in
    * {keep, update, insert}.
    */
  def latestWins(base: DataFrame, updates: DataFrame, baseKey: String,
                 updKey: String, seq: String,
                 setCols: Map[String, String]): DataFrame = {
    require(setCols.nonEmpty, "setCols must map at least one column")
    require(base.columns.contains(baseKey), s"base lacks key '$baseKey'")
    require(setCols.keys.forall(base.columns.contains),
      "every setCols target must be a base column")
    val uCols = setCols.values.toSeq.distinct
    // null merge keys can match nothing (equi-merge semantics); left in,
    // the null group would survive the full-outer join as a phantom row
    // mislabeled 'keep' carrying feed values — drop them like a MERGE's
    // ON clause would
    val latest = updates
      .filter(col(updKey).isNotNull)
      .groupBy(col(updKey).as("__mk"))
      .agg(max_by(struct(uCols.map(col): _*), col(seq)).as("__u"))
    val outCols: Seq[Column] =
      (coalesce(col(baseKey), col("__mk")).as(baseKey) +:
        base.columns.toSeq.filterNot(_ == baseKey).map { c =>
          setCols.get(c) match {
            case Some(uc) => coalesce(col("__u").getField(uc), col(c)).as(c)
            case None => col(c)
          }
        }) :+
        when(col("__mk").isNull, lit("keep"))
          .when(col(baseKey).isNull, lit("insert"))
          .otherwise(lit("update")).as("op")
    base.join(latest, col(baseKey) === col("__mk"), "full_outer")
      .select(outCols: _*)
  }
}
