package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of DISTINCT character n-grams of a string — the hot loop of
  * the duplicate-n-gram compressibility screen
  * ([[graft.ext.TextStats.dupGramCompressibility]], q286).
  *
  * Semantically identical to the HOF pipeline
  * `size(array_distinct(transform(sequence(1, length(text) - n + 1),
  * i -> substring(text, i, n))))` — n-grams are CODE-POINT windows
  * (what Spark's `substring`/`length` count) and distinctness is
  * exact string equality, so the DuckDB oracle twin is UNCHANGED —
  * but evaluated as one native sliding-window loop per row instead of
  * O(len) interpreted expression-tree nodes per document (the
  * round-12 verdict measured the HOF form at 4.3 s where this shape
  * costs < 1 s).
  *
  * CodegenFallback is deliberate, same as [[ShingleHash]]: the
  * per-row work (a hash-set insert per window) dwarfs the one virtual
  * call the fallback costs, and the surrounding operators still
  * codegen.
  */
case class DistinctCharGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = LongType
  override def prettyName: String = "distinct_char_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    // code points, not UTF-16 units — Spark's substring/length (and
    // DuckDB's substr/length) count characters
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val windows = cps.length - n + 1
    if (windows <= 0) return 0L
    val seen = new java.util.HashSet[String](windows * 2)
    var i = 0
    while (i < windows) {
      seen.add(new String(cps, i, n))
      i += 1
    }
    seen.size.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
