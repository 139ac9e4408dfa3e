package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial hashes of the n-token shingles of a space-tokenized
  * string — the hot inner loop of the near-dup operators
  * ([[graft.ext.Dedup]]). `distinct = true` (the default) yields the
  * set form MinHash/Jaccard need; `distinct = false` keeps
  * multiplicities for repetition scoring ([[graft.ext.TextStats]]).
  *
  * Semantically identical to the HOF pipeline
  * `array_distinct(transform(sequence(...), i -> aggregate(split(...),
  * ...)))` — same tokenization (split on single space, limit -1), same
  * fold `(acc * 31 + char) mod 2^31-1`, same first-occurrence distinct
  * order — but evaluated as one native loop per row instead of ~3000
  * interpreted expression nodes per document. The DuckDB oracle twin
  * (SparkEntry.ShingleHashes) is unchanged.
  *
  * CodegenFallback is deliberate: the per-row work (thousands of char
  * ops) dwarfs the one virtual call the fallback costs, and the
  * surrounding operators still codegen.
  *
  * `skipEmpty` (n = 1 only) drops empty tokens natively — the
  * per-token form's oracle twins filter `t != ''` BEFORE hashing, and
  * the old caller-side `h != 0` filter was not equivalent: a nonempty
  * token of ≥ 6 chars can hash to 0 mod 2³¹−1 (~2⁻³¹ per token), in
  * which case the filter dropped a real token the oracle kept. For
  * n > 1 the flag is inert: separators fold into the shingle hash and
  * no caller filters on the value.
  */
case class ShingleHash(child: Expression, n: Int = 3, distinct: Boolean = true,
                       skipEmpty: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

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
    val slots = toks.length - n + 1
    if (slots <= 0) return new GenericArrayData(Array.empty[Long])
    val out =
      if (distinct) new mutable.LinkedHashSet[Long]
      else new mutable.ArrayBuffer[Long](slots)
    // pre-fold to code points (what ascii()/ord() hash, and what both
    // engines' length semantics count) — not UTF-16 units
    val tokCps = toks.map(_.codePoints().toArray)
    var i = 0
    while (i < slots) {
      if (skipEmpty && n == 1 && tokCps(i).length == 0) { i += 1 }
      else {
      var acc = 0L
      var t = 0
      while (t < n) {
        if (t > 0) acc = (acc * 31 + ' ') % P
        val cps = tokCps(i + t)
        var c = 0
        while (c < cps.length) {
          acc = (acc * 31 + cps(c)) % P
          c += 1
        }
        t += 1
      }
      out += acc
      i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
