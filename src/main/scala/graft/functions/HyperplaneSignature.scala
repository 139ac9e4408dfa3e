package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH band keys for a float-vector column — the
  * angular-similarity analogue of MinHash banding
  * ([[graft.ext.Dedup]]): bit r of band b is the sign of the dot
  * product with pseudo-random hyperplane j = b*rows + r, and each
  * band's `rows` bits pack into one long key. Vectors whose angle is
  * small agree on most signs (P[bit match] = 1 - θ/π), so true
  * near-dups (cos ≥ 0.9 → p ≈ 0.86) collide in some band with near
  * certainty while distant pairs rarely do.
  *
  * Hyperplane components are a deterministic LCG of the flat index —
  * `((1103515245*(j*dim+i) + 12345) mod 2^31-1) - 2^30` — zero-mean
  * integers both engines can recompute exactly, which is what makes
  * the whole LSH pipeline oracle-verifiable (the DuckDB twin evaluates
  * the identical formula and the identical left-to-right double
  * accumulation, so even the sign of a near-zero dot agrees).
  *
  * CodegenFallback for the same reason as [[ShingleHash]]: the
  * per-row work (bands*rows*dim fused multiply-adds) dwarfs the one
  * virtual call, and the surrounding operators still codegen.
  */
case class HyperplaneSignature(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_signature"

  // analysis-time guard (matches CosineSimilarity): getFloat() on a
  // differently-backed ArrayData would return garbage or throw
  // mid-job instead of failing the query up front
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rows) {
        val j = (b * rows + r).toLong
        var acc = 0.0
        var i = 0
        while (i < d) {
          val v = (1103515245L * (j * d + i) + 12345L) % 2147483647L - 1073741823L
          acc += arr.getFloat(i).toDouble * v
          i += 1
        }
        if (acc > 0) key |= (1L << r)
        r += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
