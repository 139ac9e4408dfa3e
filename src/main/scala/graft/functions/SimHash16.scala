package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash signature in one fused loop per row: distinct
  * polynomial token hashes (identical tokenization and fold to the
  * HOF pipeline it replaces — split on single space, `(acc*31 + char)
  * mod 2^31-1`, first-occurrence distinct), then per-bit ±1 votes
  * summed and thresholded. Replaces 16 interpreted `aggregate` lambdas
  * per row in q28; the DuckDB oracle twin is unchanged.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = IntegerType
  override def prettyName: String = "simhash16"

  // analysis-time guard: a non-string child would ClassCastException
  // mid-job in nullSafeEval otherwise
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.split(" ", -1)
    val seen = new mutable.LinkedHashSet[Long]
    var i = 0
    while (i < toks.length) {
      // fold code points (what ascii()/ord() hash), not UTF-16 units
      val cps = toks(i).codePoints().toArray
      var acc = 0L
      var c = 0
      while (c < cps.length) {
        acc = (acc * 31 + cps(c)) % P
        c += 1
      }
      seen += acc
      i += 1
    }
    val votes = new Array[Long](16)
    seen.foreach { h =>
      var b = 0
      while (b < 16) {
        votes(b) += ((h >> b) & 1L) * 2 - 1
        b += 1
      }
    }
    var sig = 0
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) sig |= 1 << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
