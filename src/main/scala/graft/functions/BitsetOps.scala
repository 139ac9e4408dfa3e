package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Bitset encoding of a bounded-domain long set: bit `v - base` of
  * the packed long-array word `(v - base) >>> 6`. The DENSE-domain
  * fast path for set intersection ([[BitsetIntersectCount]]): when a
  * graph's node ids live in a measured narrow range and its adjacency
  * lists are long (the co-purchase part graph: ~|V| ids, average
  * degree a large fraction of |V|), intersecting two sorted lists
  * walks O(deg_a + deg_b) branchy comparisons per edge while the
  * bitset form does `domain/64` branchless AND+popcount words — and
  * the bitset row (domain/8 bytes) is NARROWER than the sorted-array
  * row (8·deg bytes) whenever deg > domain/64, exactly the density
  * condition the caller's gate measures. Callers own the contract
  * that every value v satisfies `0 ≤ v - base < width`.
  */
case class BitsetFromSorted(child: Expression, base: Expression,
    width: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = child
  override def second: Expression = base
  override def third: Expression = width
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitset_from_sorted"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && base.dataType == LongType && width.dataType == LongType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint, bigint), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def nullSafeEval(c: Any, b: Any, w: Any): Any = {
    val arr = c.asInstanceOf[ArrayData]
    val base = b.asInstanceOf[Long]
    val width = w.asInstanceOf[Long]
    val words = new Array[Long](((width + 63) >>> 6).toInt)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val off = arr.getLong(i) - base
      words((off >>> 6).toInt) |= (1L << (off & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, b, w) => {
      val words = ctx.freshName("words")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      s"""
         |long[] $words = new long[(int) (($w + 63L) >>> 6)];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $off = $c.getLong($i) - $b;
         |  $words[(int) ($off >>> 6)] |= (1L << ($off & 63L));
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(child = f, base = s, width = t)
}

/** popcount(a AND b) over two packed-long bitsets of the SAME domain
  * ([[BitsetFromSorted]]) — |a ∩ b| as `width/64` branchless words.
  * Null-intolerant like the other native kernels here. */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bitset_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var c = 0
    while (i < n) {
      c += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $c += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
