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
  *  2. one full-outer join against the base on the merge key. Spark
  *     never plans a broadcast hash join for FULL OUTER, so this is
  *     always a sort-merge/shuffled-hash join on the key; a base
  *     bucketed by that key skips its exchange, and AQE sizes the
  *     (small, already-collapsed) feed-side shuffle.
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

  /** Snapshot diff — the inverse of [[latestWins]]: compare two
    * versions of a table on a key and emit the change feed
    * (added / removed / changed with before+after values) that would
    * transform `before` into `after`. This is how a pipeline without
    * a transaction log generates CDC: diff the new snapshot against
    * the previous one and publish the delta.
    *
    * One full-outer shuffle join on the key (both sides bucketed by
    * the key → no exchange at all); unchanged rows are filtered
    * before the presentation sort so the output is delta-sized, not
    * snapshot-sized.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must name at least one column")
    val b = before.select((key +: compareCols).map(c => col(c).as(s"b_$c")): _*)
    val a = after.select((key +: compareCols).map(c => col(c).as(s"a_$c")): _*)
    val changed = compareCols
      .map(c => !(col(s"b_$c") <=> col(s"a_$c")))
      .reduce(_ || _)
    b.join(a, col(s"b_$key") === col(s"a_$key"), "full_outer")
      .withColumn("op",
        when(col(s"b_$key").isNull, lit("added"))
          .when(col(s"a_$key").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("op").isNotNull)
      .select((coalesce(col(s"b_$key"), col(s"a_$key")).as(key) +: col("op") +:
        compareCols.flatMap(c => Seq(col(s"b_$c"), col(s"a_$c")))): _*)
  }
}
