package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental JOIN maintenance under insert-only deltas — the join
  * sibling of [[IncrementalAgg]]: when base tables A and B have
  * already-joined history J = A ⋈ B and batches ΔA, ΔB land, the
  * refreshed join is
  *
  *   J ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * — three delta-sized joins instead of one full recompute (the
  * algebraic identity holds because A/ΔA and B/ΔB are disjoint
  * partitions). At 100 TB the deltas are MB-scale against TB-scale
  * bases: ΔA ⋈ B and A ⋈ ΔB broadcast the delta side (or prune the
  * base scan via the delta's runtime bloom filter /
  * InjectRuntimeFilter), so no full shuffle of either base ever
  * happens on refresh. q109 proves the identity against a DuckDB
  * oracle that joins the full tables directly.
  *
  * Reference scope: the reference re-derives its joined aggregates
  * from the full fact table on every load
  * (`etl_pipeline_spark.py:1398-1455`); this is the engine-native
  * refresh path.
  */
object DeltaJoin {

  /** The new join rows contributed by (ΔA, ΔB). */
  def delta(a: DataFrame, da: DataFrame, b: DataFrame, db: DataFrame,
            keys: Seq[String]): DataFrame =
    da.join(b, keys)
      .unionByName(a.join(db, keys))
      .unionByName(da.join(db, keys))

  /** Full refreshed join from history + deltas. */
  def maintain(j: DataFrame, a: DataFrame, da: DataFrame,
               b: DataFrame, db: DataFrame, keys: Seq[String]): DataFrame =
    j.unionByName(delta(a, da, b, db, keys))
}
