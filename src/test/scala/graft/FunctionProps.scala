package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{HyperplaneSignature, ShingleHash, SimHash16, SortedIntersectCount, WinnowHash}

/** Property tests for the native expressions against trivial Scala
  * reference implementations (the HOF pipelines they replaced), plus
  * structural invariants: hyperplane signatures are invariant under
  * positive scaling (power-of-two scaling is exact in IEEE floats, so
  * every dot-product sign is preserved bit-for-bit).
  */
object FunctionProps extends Properties("functions") {

  private val P = 2147483647L

  // fold CODE POINTS (what Spark's ascii()/DuckDB's ord() hash), so the
  // reference stays correct when the generator emits non-BMP chars
  private def polyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 31 + c) % P)

  // mostly ascii tokens with occasional supplementary-plane chars —
  // the case where UTF-16-unit iteration would diverge from both
  // engines' code-point semantics
  private val genToken: Gen[String] = Gen.frequency(
    9 -> Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar)),
    1 -> Gen.oneOf("😀a", "x🚀", "🤖"))

  private val genText: Gen[String] =
    Gen.listOf(genToken).map(_.take(15).mkString(" "))

  private def evalStr(e: org.apache.spark.sql.catalyst.expressions.Expression): Any =
    e.eval(null)

  property("ShingleHash(n, distinct=false) = sliding-window reference") =
    Prop.forAll(genText, Gen.choose(1, 4)) { (text, n) =>
      val got = evalStr(ShingleHash(Literal(UTF8String.fromString(text)), n, distinct = false))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      val toks = text.split(" ", -1).toSeq
      val want = toks.sliding(n).filter(_.length == n).map(w => polyHash(w.mkString(" "))).toSeq
      got == want
    }

  property("ShingleHash distinct keeps first occurrences in order") =
    Prop.forAll(genText) { text =>
      val all = evalStr(ShingleHash(Literal(UTF8String.fromString(text)), 3, distinct = false))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      val dist = evalStr(ShingleHash(Literal(UTF8String.fromString(text)), 3, distinct = true))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      dist == all.distinct
    }

  property("SortedIntersectCount = set-intersection reference on sorted distinct arrays") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 60L)), Gen.listOf(Gen.choose(0L, 60L))) { (xs, ys) =>
      val a = xs.distinct.sorted
      val b = ys.distinct.sorted
      def lit(v: Seq[Long]) = Literal.create(v.toArray,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false))
      val got = evalStr(SortedIntersectCount(lit(a), lit(b))).asInstanceOf[Int]
      got == (a.toSet & b.toSet).size
    }

  // the hybrid kernel's GALLOP branch only engages when one side is
  // >= 16x longer — drive it explicitly with hub-vs-leaf shapes (the
  // truss support kernel's skew case), including overlaps at the
  // array boundaries where gallop cursor arithmetic is easiest to
  // get wrong
  property("SortedIntersectCount gallop branch = set reference on " +
    "16x-asymmetric arrays") =
    Prop.forAll(
      Gen.listOfN(6, Gen.choose(0L, 5000L)),
      Gen.listOfN(900, Gen.choose(0L, 5000L))) { (xs, ys) =>
      val a = xs.distinct.sorted
      val b = ys.distinct.sorted
      def lit(v: Seq[Long]) = Literal.create(v.toArray,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false))
      val small = evalStr(SortedIntersectCount(lit(a), lit(b))).asInstanceOf[Int]
      val flipped = evalStr(SortedIntersectCount(lit(b), lit(a))).asInstanceOf[Int]
      small == (a.toSet & b.toSet).size && flipped == small
    }

  property("BitsetFromSorted + BitsetIntersectCount = set reference " +
    "on bounded-domain arrays") =
    Prop.forAll(Gen.listOf(Gen.choose(100L, 800L)),
      Gen.listOf(Gen.choose(100L, 800L))) { (xs, ys) =>
      val a = xs.distinct.sorted
      val b = ys.distinct.sorted
      def lit(v: Seq[Long]) = Literal.create(v.toArray,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false))
      val base = Literal(100L)
      val width = Literal(701L)
      val got = evalStr(graft.functions.BitsetIntersectCount(
        graft.functions.BitsetFromSorted(lit(a), base, width),
        graft.functions.BitsetFromSorted(lit(b), base, width)))
        .asInstanceOf[Int]
      got == (a.toSet & b.toSet).size
    }

  property("WinnowHash = min over strided window reference") =
    Prop.forAll(genText) { text =>
      val got = evalStr(WinnowHash(Literal(UTF8String.fromString(text))))
      val cps = text.codePoints().toArray
      val wins = (0 to cps.length - 5 by 4).map(i =>
        cps.slice(i, i + 5).foldLeft(0L)((acc, c) => (acc * 31 + c) % P))
      if (cps.length < 5) got == null
      else got == wins.min
    }

  property("SimHash16 = per-bit vote reference") =
    Prop.forAll(genText) { text =>
      val got = evalStr(SimHash16(Literal(UTF8String.fromString(text)))).asInstanceOf[Int]
      val hashes = text.split(" ", -1).map(polyHash).distinct
      val want = (0 until 16).map { b =>
        val vote = hashes.map(h => ((h >> b) & 1L) * 2 - 1).sum
        if (vote > 0) 1 << b else 0
      }.sum
      got == want
    }

  private val genVec: Gen[List[Float]] =
    Gen.listOfN(16, Gen.choose(-1000, 1000).map(_ / 100.0f))

  property("HyperplaneSignature invariant under power-of-two scaling") =
    Prop.forAll(genVec) { v =>
      def sig(x: List[Float]): Seq[Long] =
        evalStr(HyperplaneSignature(
          Literal.create(x, ArrayType(FloatType)), bands = 4, rows = 6))
          .asInstanceOf[ArrayData].toLongArray.toSeq
      sig(v) == sig(v.map(_ * 4.0f))
    }

  property("ChunkBoundaries = windowed-fold reference (incl. trailing boundary)") =
    Prop.forAll(genText, Gen.choose(1, 4), Gen.oneOf(2L, 4L, 16L)) { (text, w, mask) =>
      val got = evalStr(graft.functions.ChunkBoundaries(
          Literal(UTF8String.fromString(text)), w, mask))
        .asInstanceOf[ArrayData].toIntArray.toSeq
      val th = text.split(" ", -1).map(polyHash)
      val want = th.indices.filter { i =>
        val wh = (math.max(0, i - w + 1) to i)
          .foldLeft(0L)((acc, j) => (acc * 31 + th(j)) % P)
        i == th.length - 1 || wh % mask == 0
      }
      got == want
    }

  property("ChunkBoundaries spans tile the token range exactly") =
    Prop.forAll(genText) { text =>
      val bpos = evalStr(graft.functions.ChunkBoundaries(
          Literal(UTF8String.fromString(text)), 3, 16L))
        .asInstanceOf[ArrayData].toIntArray.toSeq
      val n = text.split(" ", -1).length
      bpos.nonEmpty && bpos.last == n - 1 &&
        bpos == bpos.sorted && bpos.distinct == bpos
    }

  property("DistinctCharGrams = distinct code-point-window reference") =
    Prop.forAll(genText, Gen.choose(1, 5)) { (text, n) =>
      val got = evalStr(graft.functions.DistinctCharGrams(
        Literal(UTF8String.fromString(text)), n)).asInstanceOf[Long]
      // the HOF pipeline it replaced: substring windows over CODE
      // POINTS, distinct by exact string equality
      val cps = text.codePoints().toArray
      val want = (0 to cps.length - n)
        .map(i => new String(cps, i, n)).distinct.size.toLong
      got == want
    }
}
