package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Canonical cross-engine numeric presentation helpers. */
object Num {

  /** Scale-round-unscale at 4 decimals — the only rounding form whose
    * result agrees between Spark (BigDecimal HALF_UP) and DuckDB at
    * .5 boundaries — with IEEE signed zero canonicalized: `+ 0.0`
    * maps a -0.0 (which Spark's round never emits but other engines'
    * can) to +0.0, so byte-level result hashes agree for
    * negative-capable metrics. Oracle twins use
    * `ROUND(x * 10000, 0) / 10000` plus `+ 0.0` when x can be
    * negative. Every module-level `r4` delegates here — do not fork
    * local variants (a copy without the canonicalization reintroduced
    * the q82/q87 -0.0 hash mismatch once already).
    */
  def r4(c: Column): Column =
    round(c * lit(10000.0), 0) / lit(10000.0) + lit(0.0)
}
