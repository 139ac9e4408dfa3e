package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte size of a string (java.util.zip, level 6)
  * — the kernel behind the compression-ratio quality screen
  * ([[graft.ext.TextStats.compressionQuality]]): highly repetitive
  * or templated text compresses far below the corpus norm, and
  * near-random noise barely compresses at all; both tails are what a
  * curation pipeline drops (the classic Gopher-style repetition
  * rule, measured by the compressor instead of n-gram counting).
  *
  * Deterministic for a fixed JDK (Deflater with a fixed level and
  * strategy is a pure function of its input bytes), which the spec
  * pins; there is no SQL twin — DuckDB has no DEFLATE — so the
  * operator is spec-verified, outside the oracle surface like the
  * media decodes. CodegenFallback for the same reason as
  * [[ShingleHash]]: per-row work dwarfs the virtual call.
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
