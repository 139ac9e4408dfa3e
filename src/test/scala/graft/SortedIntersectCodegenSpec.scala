package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** The hybrid sorted-intersect kernel has two code paths (two-pointer
  * merge / iterate-smaller + gallop-bigger at ≥16x size skew) in two
  * implementations (interpreted eval and the whole-stage-codegen
  * template). This spec drives the CODEGEN path through a real plan —
  * hub-vs-leaf shapes included — and pins it to the engine's own
  * `array_intersect` on the same rows. FunctionProps covers the
  * interpreted twin against a set reference.
  */
class SortedIntersectCodegenSpec extends SparkSpec {
  import spark.implicits._

  test("codegen kernel = array_intersect across merge and gallop shapes") {
    // row i: a = multiples of (i%7+1) up to 40 elems (small side),
    //        b = a long arithmetic strip (large side, ratio >= 16 for
    //        small a), plus symmetric/boundary edge cases
    val df = spark.range(0, 200)
      .select($"id",
        expr("transform(sequence(0, CAST(id % 7 AS INT)), " +
          "x -> CAST(x * (id % 13 + 2) AS BIGINT))").as("a"),
        expr("transform(sequence(0, 800), " +
          "x -> CAST(x + id % 5 AS BIGINT))").as("b"))
      .select($"id", $"a", $"b",
        Bridge.column(graft.functions.SortedIntersectCount(
          Bridge.expression($"a"), Bridge.expression($"b"))).as("got"),
        Bridge.column(graft.functions.SortedIntersectCount(
          Bridge.expression($"b"), Bridge.expression($"a"))).as("got_flip"),
        size(array_intersect($"a", $"b")).as("want"))
    val bad = df.filter($"got" =!= $"want" || $"got_flip" =!= $"want")
      .collect()
    assert(bad.isEmpty, s"kernel diverged on ${bad.take(3).mkString(";")}")
    // balanced-size rows exercise the merge branch
    val eq = spark.range(0, 50)
      .select(
        expr("transform(sequence(0, 30), x -> CAST(x * 2 AS BIGINT))").as("a"),
        expr("transform(sequence(0, 30), x -> CAST(x * 3 AS BIGINT))").as("b"))
      .select(Bridge.column(graft.functions.SortedIntersectCount(
          Bridge.expression($"a"), Bridge.expression($"b"))).as("got"),
        size(array_intersect($"a", $"b")).as("want"))
      .filter($"got" =!= $"want").collect()
    assert(eq.isEmpty, "merge branch diverged")
  }
}
