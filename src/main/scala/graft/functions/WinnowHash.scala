package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint: the minimum polynomial hash over
  * sliding character windows (`window` chars, every `stride`-th
  * position) — one fused loop per row replacing the interpreted HOF
  * pipeline `array_min(transform(sequence(0, len-w, s), i ->
  * aggregate(split(substring(...), ''), ...)))`, whose per-char
  * lambda nodes dominated q33's runtime the same way they did before
  * [[ShingleHash]]. Same fold `(acc * 31 + char) mod 2^31-1`, same
  * full-window positions, null when the text is shorter than one
  * window. The DuckDB oracle twin is unchanged.
  */
case class WinnowHash(child: Expression, window: Int = 5, stride: Int = 4)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_hash"

  // analysis-time guard: a non-string child would ClassCastException
  // mid-job in nullSafeEval otherwise
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    // code points, not UTF-16 units: Spark's length/substring/ascii and
    // DuckDB's LENGTH/ord both count code points, so supplementary-
    // plane characters must occupy one window slot, not two
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < window) return null
    var min = Long.MaxValue
    var i = 0
    while (i + window <= n) {
      var acc = 0L
      var c = 0
      while (c < window) {
        acc = (acc * 31 + cps(i + c)) % P
        c += 1
      }
      if (acc < min) min = acc
      i += stride
    }
    min
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
