package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity join via deletion-neighborhood blocking
  * (the SymSpell recipe): every string generates its |s|+1 variants
  * (itself plus each single-character deletion); two strings within
  * one edit — substitution, insertion, or deletion — necessarily
  * share a variant, so candidates come from a plain equi-join on the
  * variant key and only candidates pay the exact `levenshtein`
  * verification. The all-pairs quadratic compare never happens:
  * at 100 TB this is an explode (|s|+1 rows per string, map-only), a
  * string-keyed shuffle whose groups are tiny by construction, and a
  * per-candidate scalar check. q111's DuckDB oracle deliberately runs
  * the quadratic all-pairs definition, so the correctness gate proves
  * the blocking loses no pair.
  */
object FuzzyJoin {

  /** Distinct (a_name, b_name, dist) pairs with dist ≤ 1, a < b, from
    * a frame with a `name` column.
    */
  def editOnePairs(names: DataFrame): DataFrame = {
    import names.sparkSession.implicits._
    val variants = names.select($"name", explode(concat(
      array($"name"),
      expr("""transform(sequence(0, length(name) - 1),
               i -> concat(substring(name, 1, i),
                           substring(name, i + 2, length(name))))""")))
      .as("variant"))
    variants.select($"name".as("a_name"), $"variant")
      .join(variants.select($"name".as("b_name"), $"variant"), "variant")
      .filter($"a_name" < $"b_name")
      .select($"a_name", $"b_name").distinct()
      .withColumn("dist", levenshtein($"a_name", $"b_name"))
      .filter($"dist" <= 1)
      .orderBy($"a_name", $"b_name")
  }
}
