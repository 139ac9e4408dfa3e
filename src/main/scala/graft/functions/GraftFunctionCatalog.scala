package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, FunctionCatalog}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `FunctionCatalog` — the engine's functions exposed to
  * plain SQL as catalog functions: register with
  * `spark.sql.catalog.graft = graft.functions.GraftFunctionCatalog`
  * and call `graft.genhash(id)` / `graft.zorder2(x, y)` from any SQL
  * string, no Scala imports and no session-scoped UDF registration.
  * This is the public-SQL half of the extension story: the Catalyst
  * `Expression`s under `graft.functions` serve the DataFrame API, and
  * this catalog serves the SQL surface with the SAME semantics.
  *
  * Each `ScalarFunction` carries a typed magic `invoke` method, so
  * analysis binds it through `Invoke` and the call participates in
  * whole-stage codegen as a direct method call — primitive-long in,
  * primitive-long out, no boxing, no UDF serialization penalty
  * (`produceResult` stays as the reflective fallback the contract
  * requires). Both functions are deterministic pure integer maps, so
  * they are oracle-verifiable: the DuckDB twin evaluates the same
  * closed form (q325).
  *
  * Functions:
  *  - `genhash(id BIGINT) -> BIGINT`: the engine's bijective
  *    multiplicative hash `(id mod P)·A mod P` with P = 2^31 − 1,
  *    A = 2654435761 (Knuth) — the same map the GenSource columns and
  *    the salted-join/sampling lanes use.
  *  - `zorder2(a BIGINT, b BIGINT) -> BIGINT`: the 31+31-bit Morton
  *    interleave, IDENTICAL to [[ZOrder2]] (`nullSafeEval` delegates
  *    to the same bit loop), so a SQL user z-ordering a write gets
  *    byte-identical keys to the DataFrame layout lane (q67).
  */
class GraftFunctionCatalog extends FunctionCatalog {
  import GraftFunctionCatalog._

  private var catalogName: String = "graft"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Names.map(Identifier.of(namespace, _))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().nonEmpty) throw noSuchFn(ident)
    else ident.name().toLowerCase match {
      case "genhash" => GenHash
      case "zorder2" => ZOrder2Fn
      case "kmv" => KmvFn
      case _ => throw noSuchFn(ident)
    }

  private def noSuchFn(ident: Identifier) =
    new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
      catalogName, ident.toString)
}

object GraftFunctionCatalog {
  private val Names = Array("genhash", "zorder2", "kmv")

  val P = 2147483647L
  val A = 2654435761L

  /** `(id mod P)·A mod P` — P = 2^31 − 1 keeps the product inside
    * Long, so the arithmetic is exact for every input. */
  object GenHash extends UnboundFunction with ScalarFunction[Long] {
    override def name(): String = "genhash"
    override def description(): String =
      "genhash(id BIGINT) -> BIGINT: bijective multiplicative hash " +
        "(id mod (2^31-1)) * 2654435761 mod (2^31-1)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 1 && inputType.head.dataType == LongType,
        s"genhash expects (BIGINT), got ${inputType.catalogString}")
      this
    }
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def canonicalName(): String = "graft.genhash"
    /** Magic method: analysis binds this via `Invoke` — a direct
      * primitive call inside whole-stage codegen. */
    def invoke(id: Long): Long = (id % P) * A % P
    override def produceResult(input: InternalRow): Long =
      invoke(input.getLong(0))
  }

  /** SQL twin of the [[ZOrder2]] Catalyst expression — delegates to
    * the very same evaluator so the two surfaces cannot drift. */
  object ZOrder2Fn extends UnboundFunction with ScalarFunction[Long] {
    override def name(): String = "zorder2"
    override def description(): String =
      "zorder2(a BIGINT, b BIGINT) -> BIGINT: 31+31-bit Morton " +
        "interleave (a even bits, b odd bits)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 2 &&
        inputType.forall(_.dataType == LongType),
        s"zorder2 expects (BIGINT, BIGINT), got ${inputType.catalogString}")
      this
    }
    override def inputTypes(): Array[DataType] = Array(LongType, LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def canonicalName(): String = "graft.zorder2"
    def invoke(a: Long, b: Long): Long =
      ZOrder2(null, null).nullSafeEval(a, b).asInstanceOf[Long]
    override def produceResult(input: InternalRow): Long =
      invoke(input.getLong(0), input.getLong(1))
  }

  /** KMV state: up to k DISTINCT smallest hashes, sorted ascending.
    * A case class (not a bare Array) because the V2 aggregate
    * contract requires `S <: java.io.Serializable` statically. */
  case class KmvState(hs: Array[Long]) extends Serializable

  /** V2 AGGREGATE function in the catalog — `graft.kmv(id)` is the
    * k-minimum-values distinct estimate (the q108 recipe: the
    * multiplicative hash is a bijection mod P, so the k-th smallest
    * distinct hash — and with it `(k−1)·P div h_k` — is a pure
    * integer function of the distinct key set, hence
    * oracle-checkable, unlike an HLL sketch whose registers are
    * engine-specific). Spark plans it as a real partial aggregate:
    * `update` runs map-side, `merge` combines task partials, and the
    * ≤ k-entry state is the only thing crossing the shuffle — the
    * same bounded-partial discipline as TopKAgg, now reachable from
    * PLAIN SQL through the catalog. k = 16; groups with fewer than k
    * distinct keys serve the exact count.
    */
  object KmvFn extends UnboundFunction
      with org.apache.spark.sql.connector.catalog.functions
        .AggregateFunction[KmvState, Long] {
    private val K = 16

    override def name(): String = "kmv"
    override def description(): String =
      "kmv(id BIGINT) -> BIGINT: k-minimum-values distinct estimate " +
        s"(k = $K) over the engine hash; exact below k"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 1 && inputType.head.dataType == LongType,
        s"kmv expects (BIGINT), got ${inputType.catalogString}")
      this
    }
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def canonicalName(): String = "graft.kmv"

    override def newAggregationState(): KmvState =
      KmvState(Array.empty)

    private def insert(hs: Array[Long], h: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(hs, h)
      if (idx >= 0) hs // already present: KMV counts DISTINCT hashes
      else if (hs.length < K) {
        val at = -idx - 1
        val out = new Array[Long](hs.length + 1)
        System.arraycopy(hs, 0, out, 0, at)
        out(at) = h
        System.arraycopy(hs, at, out, at + 1, hs.length - at)
        out
      } else if (h >= hs(K - 1)) hs
      else {
        val at = -idx - 1
        val out = new Array[Long](K)
        System.arraycopy(hs, 0, out, 0, at)
        out(at) = h
        System.arraycopy(hs, at, out, at + 1, K - 1 - at)
        out
      }
    }

    override def update(state: KmvState, input: InternalRow): KmvState =
      if (input.isNullAt(0)) state
      // floorMod, not %: Java remainder of a negative BIGINT is
      // negative, which would sort below every legitimate hash and
      // corrupt both the k-min state and the (K-1)*P/h_k estimate
      else KmvState(insert(state.hs,
        Math.floorMod(Math.floorMod(input.getLong(0), P) * A, P)))

    override def merge(s1: KmvState, s2: KmvState): KmvState =
      KmvState(s2.hs.foldLeft(s1.hs)(insert))

    override def produceResult(state: KmvState): Long =
      if (state.hs.length < K) state.hs.length.toLong
      else (K - 1).toLong * P / state.hs(K - 1)
  }
}
