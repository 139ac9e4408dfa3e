package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join — the join-side companion of
  * [[SaltedAgg]]: when one join key is hot (a celebrity user, a
  * default value), a plain shuffle join funnels every row of that key
  * through one reducer task. Salting splits each key into `buckets`
  * sub-keys: the big side gets a deterministic salt from a secondary
  * column, the small side is replicated once per salt value, and the
  * join runs on (key, salt) — each hot key now spreads over `buckets`
  * reducers. The result equals the plain join exactly (every big-side
  * row still meets every matching small-side row, exactly once).
  *
  * Cost model: small side grows ×buckets, so this is for
  * moderate-cardinality small sides where a broadcast doesn't fit but
  * a ×buckets replication does. (When the small side is broadcastable,
  * broadcast — no shuffle, no skew. AQE's skew-join split handles the
  * in-between; this operator is the explicit form that doesn't depend
  * on runtime stats, e.g. for a first run with no history.)
  *
  * The salt is deterministic (`hash(saltSource) mod buckets`, same
  * policy as [[SaltedAgg]]) so reruns produce identical intermediate
  * partitions and the oracle compares against the plain join. Hashing
  * the salt source (rather than using it mod buckets directly) keeps
  * the spread full-width even when the source has a narrow or skewed
  * range — e.g. l_linenumber ∈ 1..7 would otherwise never hit bucket 0
  * and land 8-way salt on ≤7 buckets.
  */
object SaltedJoin {

  /** Inner equi-join of `big` and `small` on the shared column `key`,
    * salted `buckets` ways by big-side `saltSource mod buckets`. */
  def equiJoin(big: DataFrame, small: DataFrame, key: String,
               saltSource: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(big.columns.contains(key) && small.columns.contains(key),
      s"both sides must carry join column '$key'")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    // hash() maps NULL to its seed (non-null), so NULL saltSource rows
    // still salt deterministically and keep the ==-plain-join
    // contract; NULL join KEYS drop in both forms, as equi-joins do
    val b = big.withColumn("__salt",
      pmod(hash(col(saltSource)), lit(buckets)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    // shuffle_hash hint: salting exists precisely because the small
    // side is NOT broadcastable — don't let a small test input take
    // the broadcast path and hide the salted shuffle this operator is
    // about (hash beats sort-merge here: no sort, salt spreads skew)
    b.join(s.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
