package graft

import org.apache.spark.sql.functions._

import graft.queries.Extended

/** Two-phase checksum reconciliation: identical replicas produce an
  * EMPTY diff (no false positives — clean ranges never reach the
  * row-level phase), and planted edits come back as exactly the
  * edited keys with the right classification.
  */
class RangedDiffSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, Long)]) = rows.toDF("k", "h")

  test("identical replicas diff to empty") {
    val a = frame((1L to 5000L).map(k => (k, k * 37 % 1000003)))
    assert(Extended.rangedDiff(a, a).count() == 0)
  }

  test("planted missing/extra/modified keys come back exactly") {
    val base = (1L to 5000L).map(k => (k, k * 37 % 1000003))
    val b = base.filterNot(_._1 == 777L) ++        // 777 missing in b
      Seq((9999L, 1L)) ++                          // 9999 extra in b
      Seq.empty
    val bMod = b.map { case (k, h) => if (k == 2500L) (k, h + 1) else (k, h) }
    val got = Extended.rangedDiff(frame(base), frame(bMod))
      .as[(Long, String)].collect().toMap
    assert(got == Map(777L -> "missing_in_b", 9999L -> "extra_in_b",
      2500L -> "modified"))
  }

  test("only dirty ranges reach the row phase (clean-range rows never join)") {
    // one edit in range 0; ranges 1..9 stay clean — the row-level
    // outer join input must be bounded by the dirty range's size
    val base = (1L to 5000L).map(k => (k, k))
    val bMod = base.map { case (k, h) => if (k == 100L) (k, h + 1) else (k, h) }
    val diff = Extended.rangedDiff(frame(base), frame(bMod))
    assert(diff.as[(Long, String)].collect().toSeq == Seq((100L, "modified")))
  }
}
