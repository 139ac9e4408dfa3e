package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |a ∩ b| for two ASCENDING-SORTED long arrays without duplicates —
  * the verify kernel of the set-similarity join
  * ([[graft.ext.Dedup.setSimilarityJoin]]).
  *
  * `size(array_intersect(a, b))` materializes a hash set and an output
  * array per row in the interpreted evaluator; on the ~1.7M candidate
  * pairs the prefix filter emits at sf0.1 that allocation dominated the
  * query. Sorted inputs admit the two-pointer merge: one fused loop,
  * zero allocation, primitive long comparisons, inside whole-stage
  * codegen ([[doGenCode]]).
  *
  * Contract: both arrays ascending and duplicate-free (what
  * `array_sort` over a set of hashes produces — callers own this, it
  * is NOT checked at runtime); null-intolerant like the other native
  * kernels here.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

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

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val t = ctx.freshName("t")
      val bnd = ctx.freshName("bnd"); val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi"); val mid = ctx.freshName("mid")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val xa = ctx.freshName("xa"); val ya = ctx.freshName("ya")
      val swap = ctx.freshName("swap")
      // same hybrid as [[SortedIntersectCount.count]]: plain merge on
      // comparable sizes, iterate-smaller + gallop-bigger when one
      // side is ≥16x longer (hub adjacency vs leaf adjacency)
      val AD = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |$AD $xa = $a; $AD $ya = $b;
         |if ($xa.numElements() > $ya.numElements()) {
         |  $AD $swap = $xa; $xa = $ya; $ya = $swap;
         |}
         |int $nx = $xa.numElements(); int $ny = $ya.numElements();
         |int $c = 0;
         |if ((long) $nx * 16L >= (long) $ny) {
         |  int $i = 0; int $j = 0;
         |  while ($i < $nx && $j < $ny) {
         |    long $xi = $xa.getLong($i); long $yj = $ya.getLong($j);
         |    if ($xi == $yj) { $c++; $i++; $j++; }
         |    else if ($xi < $yj) { $i++; } else { $j++; }
         |  }
         |} else {
         |  int $j = 0;
         |  for (int $i = 0; $i < $nx && $j < $ny; $i++) {
         |    long $t = $xa.getLong($i);
         |    if ($ya.getLong($j) < $t) {
         |      int $bnd = 1;
         |      while ($j + $bnd < $ny && $ya.getLong($j + $bnd) < $t) {
         |        $bnd <<= 1;
         |      }
         |      int $lo = $j + ($bnd >> 1);
         |      int $hi = java.lang.Math.min($ny, $j + $bnd);
         |      while ($lo + 1 < $hi) {
         |        int $mid = ($lo + $hi) >>> 1;
         |        if ($ya.getLong($mid) < $t) { $lo = $mid; }
         |        else { $hi = $mid; }
         |      }
         |      $j = $hi;
         |    }
         |    if ($j < $ny && $ya.getLong($j) == $t) { $c++; $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** |a ∩ b| over ascending duplicate-free long arrays — hybrid
    * kernel (the interpreted twin of [[SortedIntersectCount.doGenCode]]'s
    * template; the spec cross-checks the two and a naive reference):
    *  - comparable sizes: the plain two-pointer merge,
    *    O(nx + ny) with one comparison per step;
    *  - one side ≥16x longer (a hub's adjacency probed by a leaf's —
    *    the truss support kernel's skew case): iterate the SMALLER
    *    side and GALLOP the larger one forward (exponential probe +
    *    binary search from a moving cursor), O(min·log(max/min))
    *    amortized instead of O(max) — the merge was paying the hub's
    *    whole list length per edge regardless of the overlap.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (x, y) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val nx = x.numElements(); val ny = y.numElements()
    var c = 0
    if (nx.toLong * 16L >= ny.toLong) {
      var i = 0; var j = 0
      while (i < nx && j < ny) {
        val xi = x.getLong(i); val yj = y.getLong(j)
        if (xi == yj) { c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
    } else {
      var j = 0; var i = 0
      while (i < nx && j < ny) {
        val t = x.getLong(i)
        if (y.getLong(j) < t) {
          // gallop: find the first y[j'] >= t past the cursor
          var bound = 1
          while (j + bound < ny && y.getLong(j + bound) < t) bound <<= 1
          var lo = j + (bound >> 1) // y[lo] < t (previous probe)
          var hi = math.min(ny, j + bound) // y[hi] >= t or hi == ny
          while (lo + 1 < hi) {
            val mid = (lo + hi) >>> 1
            if (y.getLong(mid) < t) lo = mid else hi = mid
          }
          j = hi
        }
        if (j < ny && y.getLong(j) == t) { c += 1; j += 1 }
        i += 1
      }
    }
    c
  }
}
