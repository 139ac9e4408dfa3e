package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) key for two non-negative int dimensions:
  * bit-interleaves the low 31 bits of `a` and `b` (a in even
  * positions, b in odd) into one long, so sorting by the key clusters
  * rows that are close in BOTH dimensions into the same parquet row
  * groups/files — multi-column min/max data skipping from a single
  * sort column, the standard lakehouse layout trick for two-predicate
  * scans. 31 bits per dimension is lossless for every non-negative
  * int (keys, ids, bucketed timestamps); shift-offset negative
  * dimensions into that range upstream.
  *
  * CodegenFallback like the other fused-loop expressions; the
  * surrounding sort/scan still codegens.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  private def integral(t: DataType): Boolean =
    t == IntegerType || t == LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects integral inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  private def toLong(x: Any): Long = x match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ua = toLong(a) & 0x7fffffffL
    val ub = toLong(b) & 0x7fffffffL
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((ua >> i) & 1L) << (2 * i)
      z |= ((ub >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
