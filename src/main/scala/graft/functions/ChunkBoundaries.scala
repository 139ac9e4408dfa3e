package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundary positions of a space-tokenized
  * string — the hot loop of [[graft.ext.Corpus.contentChunkFrame]]:
  * position i (0-based) is a boundary iff it is the last token or the
  * polynomial hash of the trailing `window`-token context ≡ 0 mod
  * `mask`.
  *
  * Semantically identical to the HOF pipeline
  * `filter(sequence(0, n-1), i -> i = n-1 OR fold(slice(th, …)) % mask
  * = 0)` over `ShingleHash(n=1)` token hashes — same tokenization
  * (split on single space, limit -1), same per-token char fold
  * `(acc·31 + codepoint) mod 2^31-1`, same window re-fold — but one
  * native loop per row instead of O(tokens·window) interpreted lambda
  * nodes. The DuckDB oracle twin (SparkEntry, q89) is unchanged.
  *
  * CodegenFallback for the same reason as [[ShingleHash]]: the
  * per-row char work dwarfs the one virtual call.
  */
case class ChunkBoundaries(child: Expression, window: Int = 3,
                           mask: Long = 16L)
    extends UnaryExpression with CodegenFallback {

  require(window >= 1, s"window must be >= 1, got $window")
  require(mask >= 1, s"mask must be >= 1, got $mask")

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "chunk_boundaries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = toks.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      val cps = toks(i).codePoints().toArray
      var c = 0
      while (c < cps.length) {
        acc = (acc * 31 + cps(c)) % P
        c += 1
      }
      th(i) = acc
      i += 1
    }
    val out = new mutable.ArrayBuffer[Int]
    i = 0
    while (i < n) {
      var acc = 0L
      var j = math.max(0, i - window + 1)
      while (j <= i) {
        acc = (acc * 31 + th(j)) % P
        j += 1
      }
      if (i == n - 1 || acc % mask == 0) out += i
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
