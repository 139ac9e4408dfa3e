package graft

import org.apache.spark.sql.functions._
import graft.ext.Corpus

/** Corpus-preparation operators: chunk boundaries, pack budget math,
  * and quantization range/monotonicity — plus plan-shape checks that
  * the map-only ops stay map-only.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("chunkDocs: every chunk has ≤ window tokens, tail chunk keeps the remainder") {
    val out = Corpus.chunkDocs(spark, d, window = 20, stride = 15)
      .select($"doc_id", $"chunk_idx", $"n_chunk_tokens",
        size(split($"chunk_text", " ")).as("actual"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, actual) = (r.getInt(2), r.getInt(3))
      assert(n >= 1 && n <= 20)
      assert(actual == n, s"declared $n tokens but chunk_text has $actual")
    }
    // chunks per doc = |{0, 15, 30, …} ∩ [0, n_tokens)| — verify against
    // the doc's own token count
    val docs = graft.sources.Tables.documents(spark, d)
      .select($"doc_id", size(split($"text", " ")).as("n")).as[(Long, Int)]
      .collect().toMap
    val perDoc = out.groupBy(_.getLong(0)).view.mapValues(_.length)
    perDoc.foreach { case (id, nChunks) =>
      val expected = (docs(id) + 14) / 15 // ceil(n/stride), starts < n
      assert(nChunks == expected, s"doc $id: $nChunks chunks, expected $expected")
    }
  }

  test("chunkDocs reconstructs the document at stride == window (no overlap)") {
    // collect_list order is not deterministic — sort by chunk_idx first
    val rebuilt = Corpus.chunkDocs(spark, d, window = 15, stride = 15)
      .groupBy($"doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"chunk_idx", $"chunk_text"))),
          x => x.getField("chunk_text")), " ").as("rebuilt"))
    val orig = graft.sources.Tables.documents(spark, d).select($"doc_id", $"text")
    val mismatches = rebuilt.join(orig, "doc_id")
      .filter($"rebuilt" =!= $"text").count()
    assert(mismatches == 0)
  }

  test("packSequences: pack token totals respect the budget split") {
    val budget = 512
    val packs = Corpus.packSequences(spark, d, budget).collect()
    assert(packs.nonEmpty)
    // pack ids per language are a contiguous 0..max range (the cumsum
    // grid has no holes: a doc starting past pack p implies pack p was
    // crossed by an earlier doc)
    packs.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getInt(1)).sorted
      assert(ids.head == 0 && ids.last == ids.length - 1)
    }
    // every doc's start offset lands in its assigned pack: re-derive
    // from the totals — sum of tokens across packs == corpus tokens
    val corpusToks = graft.sources.Tables.documents(spark, d)
      .select(sum(size(split($"text", " ")))).as[Long].head()
    assert(packs.map(_.getLong(3)).sum == corpusToks)
  }

  test("quantizeEmbeddings: int8 range, extremes hit the ends, sum matches brute force") {
    val out = Corpus.quantizeEmbeddings(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qmin, qmax) = (r.getLong(5), r.getLong(6))
      assert(qmin >= -128 && qmax <= 127)
      assert(qmin == -128, "the vector minimum must quantize to -128")
      assert(qmax == 127, "the vector maximum must quantize to 127")
    }
    // brute-force one vector on the driver
    val (vecId, emb) = graft.sources.Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].head()
    val mn = emb.min.toDouble; val mx = emb.max.toDouble
    val expected = emb.map(x => math.floor((x.toDouble - mn) / (mx - mn) * 255).toLong - 128)
    val row = out.find(_.getLong(0) == vecId).get
    assert(row.getLong(4) == expected.sum)
  }

  test("chunkDocs and quantizeEmbeddings plans are shuffle-free before the sort") {
    for (df <- Seq(Corpus.chunkDocs(spark, d), Corpus.quantizeEmbeddings(spark, d))) {
      val plan = df.queryExecution.executedPlan.toString
      // exactly one exchange: the range partitioning of the final sort
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges <= 1, s"expected map-only + sort, got:\n$plan")
    }
  }

  test("sourceQuota keeps exactly the quota earliest doc_ids per source") {
    val out = Corpus.sourceQuota(spark, d, quota = 10).collect()
    val bySource = out.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, d)
      .select($"source", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(10).toSeq)
    bySource.foreach { case (src, rows) =>
      assert(rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq == docs(src))
    }
  }

  test("qualityFilter score is a pure function of the text stats") {
    val out = Corpus.qualityFilter(spark, d).collect()
    assert(out.nonEmpty)
    // keep is consistent with the reported (rounded) score except in
    // the +-1e-4 rounding band around the threshold
    out.foreach { r =>
      val (q, keep) = (r.getDouble(2), r.getBoolean(3))
      if (q > 2.0001) assert(keep)
      if (q < 1.9999) assert(!keep)
    }
  }

  test("chunking applies unchanged to a stream (chunk-at-ingest twin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val input = MemoryStream[(Long, String)]
    val query = Corpus.chunkFrame(input.toDF().toDF("doc_id", "text"), 20, 15)
      .writeStream.format("memory").queryName("chunk_stream_out")
      .outputMode("append").start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      val streamed = spark.table("chunk_stream_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3))).toSet
      val batch = Corpus.chunkDocs(spark, d)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3))).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("contentChunks: chunks partition the doc and survive a point edit (fixed grids don't)") {
    // 200-token doc built from a varied vocabulary so rolling hashes
    // actually cut; deterministic generator, no RNG
    val toks = (0 until 200).map(i => s"w${(i * 37 + i * i * 11) % 101}")
    val orig = toks.mkString(" ")
    // insert one token near the front — everything after shifts by one
    val edited = (toks.take(5) ++ Seq("INSERTED") ++ toks.drop(5)).mkString(" ")
    val both = Seq((1L, orig), (2L, edited)).toDF("doc_id", "text")
    val out = Corpus.contentChunkFrame(both).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(5), r.getString(6)))
    // chunks tile the document exactly: contiguous, complete, in order
    for (id <- Seq(1L, 2L)) {
      val chunks = out.filter(_._1 == id).sortBy(_._2)
      assert(chunks.head._3 == 0)
      chunks.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._4 + 1, "chunks must be contiguous")
        case _ =>
      }
      val full = if (id == 1L) orig else edited
      assert(chunks.map(_._6).mkString(" ") == full, "chunks must reassemble the doc")
    }
    val origHashes = out.filter(_._1 == 1L).map(_._5).toSet
    val editHashes = out.filter(_._1 == 2L).map(_._5).toSet
    val shared = origHashes.intersect(editHashes).size
    // content-defined boundaries re-sync after the edit: most chunks
    // keep their hash, so chunk-level dedup reuses them
    assert(shared >= origHashes.size / 2,
      s"expected most chunk hashes stable under a point edit, shared=$shared of ${origHashes.size}")
    // the fixed grid loses (almost) everything after the insertion
    // point: every window shifts by one token
    val g1 = Corpus.chunkFrame(both.filter($"doc_id" === 1L), 20, 20)
      .select($"chunk_text").as[String].collect().toSet
    val g2 = Corpus.chunkFrame(both.filter($"doc_id" === 2L), 20, 20)
      .select($"chunk_text").as[String].collect().toSet
    val gridShared = g1.intersect(g2).size
    val gridFrac = gridShared.toDouble / g1.size
    val cdcFrac = shared.toDouble / origHashes.size
    assert(gridFrac < cdcFrac,
      s"fixed grid must reuse strictly less under a point edit: grid $gridShared/${g1.size} vs cdc $shared/${origHashes.size}")
  }

  test("tfidf ranks rare terms above common ones within a doc") {
    val out = Corpus.tfidfTopTerms(spark, d, k = 3).collect()
    assert(out.nonEmpty)
    // rn is 1..3 per doc and scores are non-increasing in rn
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRn = rows.sortBy(_.getInt(1))
      assert(byRn.map(_.getInt(1)).toSeq == (1 to byRn.length))
      val scores = byRn.map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sparseCosinePairs: hand-computed cosine, stop terms pruned before the join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spcos").toString
    // A="a a b", B="a b b" → tf A=(a:2,b:1), B=(a:1,b:2): dot=4,
    // norms²=5,5 → cos=0.8. 18 unique-token fillers raise nDocs to 20
    // so df(a)=df(b)=2 passes df·10 ≤ n; the shared stop token 'the'
    // (df=20) must be pruned or every filler pair would score too.
    val docs = Seq((1L, "a a b the"), (2L, "a b b the")) ++
      (3L to 20L).map(i => (i, s"u$i the"))
    docs.toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Corpus.sparseCosinePairs(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 4L, 5L, 5L, 6400L)),
      "one pair: dot 4, norms² 5/5, ⌊10⁴·16/25⌋ = 6400")
  }

  test("tokenizerFertility: single-char words stay 1 token; the lone " +
    "8-char word compresses to 3 tokens after 5 lexicographic merges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fert").toString
    // merges greedily take (a,b),(ab,c),(abc,d),(abcd,e),(abcde,f) —
    // all pair counts are 1, lhs-lexicographic tiebreak — leaving
    // |abcdef||g||h| = 3 tokens; "a" is unsplittable at 1
    Seq((1L, "a a a a", "en"), (2L, "abcdefgh", "de"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Corpus.tokenizerFertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("de", 1L, 1L, 3L, 3000000L),
      ("en", 1L, 4L, 4L, 1000000L)), s"got ${got.toSeq}")
  }

  test("ppsSample: slots land proportional to weight, sub-step doc " +
    "excluded, multiplicities sum to the step count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pps").toString
    // weights 2/8/90, 10 slots over W=100 -> step 10: doc 1 never
    // crosses a boundary, doc 3 takes 9 of the 10 slots
    Seq((1L, "x", 2L), (2L, "y", 8L), (3L, "z", 90L))
      .toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Corpus.ppsSample(spark, dir, slots = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 8L, 10L, 1L), (3L, 90L, 100L, 9L)),
      s"got ${got.toSeq}")
    assert(got.map(_._4).sum == 10L, "multiplicities cover every slot")
  }

  test("jsDivergence: identical distributions score exactly 0; " +
    "disjoint ones score exactly the quantized ln 2 bound") {
    val same = java.nio.file.Files.createTempDirectory("graft-js1").toString
    Seq((1L, "a b", "src0"), (2L, "a b", "src1"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.parquet(s"$same/documents.parquet")
    val s = graft.ext.TextStats.jsDivergence(spark, same).collect().head
    assert(s.getLong(5) == 0L, s"identical: $s")
    val disj = java.nio.file.Files.createTempDirectory("graft-js2").toString
    Seq((1L, "a a a", "src0"), (2L, "b b b", "src1"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.parquet(s"$disj/documents.parquet")
    val r = graft.ext.TextStats.jsDivergence(spark, disj).collect().head
    // per token LQ(18)-LQ(9) = 2890371-2197224 = 693147 = floor(ln2 q6)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 2L)),
      s"totals: $r")
    assert(r.getLong(3) == 693147L && r.getLong(4) == 693147L &&
      r.getLong(5) == 693147L, s"ln2 bound: $r")
  }

  test("tokenPmi: planted co-occurrence — hand-computed PMI, negatives included") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    // N=4 docs; {a,b} ride together twice, c pairs with a and x once:
    // PMI(a,b)=ln(4·2/(3·2)), PMI(a,c)=ln(4·1/(3·2))<0, PMI(c,x)=ln 2
    Seq((1L, "a b"), (2L, "a b"), (3L, "c"), (4L, "c x a"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Corpus.tokenPmi(spark, dir, minDocs = 1L)
      .select($"tok_a", $"tok_b", $"pmi")
      .as[(String, String, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 0.2877), ("a", "c", -0.4055), ("a", "x", 0.2877),
      ("c", "x", 0.6931)), s"got $got")
  }

  test("heavyHitters: planted skew, exact counts through the decrement path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hh").toString
    // 100 docs: 'zipf' ×10 everywhere (1000), 'beta' ×10 in docs 1-20
    // (200), plus one unique filler per doc (100 singletons) — 1300
    // tokens, 102 distinct. k=8 counters << 102 distinct forces real
    // Misra-Gries decrement rounds; ratio=8 keeps the k+1 >= ratio
    // guarantee, threshold 1300/8 = 162.5 → exactly {zipf, beta}.
    val docs = (1L to 100L).map { i =>
      val beta = if (i <= 20) " beta" * 10 else ""
      (i, ("zipf " * 10).trim + beta + s" u$i")
    }
    docs.toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Corpus.heavyHitters(spark, dir, k = 8, ratio = 8L)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("zipf", 1000L), ("beta", 200L)),
      s"expected exact counts for the two planted heavy tokens, got $got")
  }

  test("invertedIndex: df/cf exact, postings are the k smallest doc ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inv").toString
    Seq((1L, "a b a"), (2L, "b c"), (3L, "a"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = Corpus.invertedIndex(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got("a") == ((2L, 3L, "1,3")), "tf 2 in doc 1 counts once in df")
    assert(got("b") == ((2L, 2L, "1,2")))
    assert(got("c") == ((1L, 1L, "2")))

    // df stays exact while the posting sample is bounded at k
    val dir2 = java.nio.file.Files.createTempDirectory("graft-inv2").toString
    (1L to 4L).map(i => (i, "z")).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir2/documents.parquet")
    val z = Corpus.invertedIndex(spark, dir2, k = 2).collect().head
    assert((z.getLong(1), z.getString(3)) == ((4L, "1,2")))
  }

  test("stratifiedSample: exactly alloc rows per stratum, smallest hashes win") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssamp").toString
    // nations 0:{1..6} 1:{10..12} 2:{20}; budget 5 over N=10 ->
    // quotas 3.0/1.5/0.5, floors 3/1/0, one residual slot on the
    // remainder tie (n1, n2 both .5) -> smaller nation key: n1.
    // alloc = 3/2/0 (nation 2 contributes NO rows)
    val custs = (1L to 6L).map((_, 0)) ++ (10L to 12L).map((_, 1)) ++ Seq((20L, 2))
    custs.toDF("c_custkey", "c_nationkey").coalesce(1)
      .write.parquet(s"$dir/customer.parquet")
    val P = 2147483647L
    def h(k: Long): Long = (k % P) * 2654435761L % P
    val expect = custs.groupBy(_._2).flatMap { case (nation, ks) =>
      val alloc = Map(0 -> 3, 1 -> 2, 2 -> 0)(nation)
      ks.map(_._1).sortBy(k => (h(k), k)).take(alloc).zipWithIndex
        .map { case (k, i) => (nation.toLong, i + 1L, k, h(k)) }
    }.toSet
    val got = Corpus.stratifiedSample(spark, dir, budget = 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expect, s"got $got expect $expect")
    assert(got.size == 5L, "sample size equals the budget exactly")
  }

  test("bpeMerges: greedy overlap, lexicographic ties, cascading merges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    // corpus: abab x3, aaa x2, abc x4
    // r1: (a,b)=6+4=10 wins; abab -> [ab,ab] (BOTH pairs merge — a
    //     broken overlap/replace would leave [ab,a,b]), abc -> [ab,c]
    // r2: (a,a)=4 ties (ab,c)=4 -> lex smaller l='a' wins; aaa->[aa,a]
    // r3: (ab,c)=4; r4: (ab,ab)=3 — exists ONLY if r1 merged both
    // r5: (aa,a)=2 — the merged token cascades into later rounds
    Seq((1L, "abab abab abab aaa aaa abc abc abc abc"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = Corpus.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", 10L), (2L, "a", "a", 4L), (3L, "ab", "c", 4L),
      (4L, "ab", "ab", 3L), (5L, "aa", "a", 2L)), s"got ${got.toSeq}")
  }

  test("oovRate: boundary ties resolve by token order; rates exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-oov").toString
    // freqs: a=3, b=1, c=1; vocabSize=2 -> tie (b,c) at the boundary
    // breaks to token asc: vocab = {a, b}, c is OOV
    Seq((1L, "a a b"), (2L, "c"), (3L, "a"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.ext.TextStats.oovRate(spark, dir, vocabSize = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 0L, 0L)), s"got ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 1000000L)))
    assert(got(3L) == ((1L, 0L, 0L)))
  }

  test("quotaAllocation: floors + largest remainders sum exactly to the budget") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quota").toString
    Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 2))
      .toDF("c_custkey", "c_nationkey").coalesce(1)
      .write.parquet(s"$dir/customer.parquet")
    val got = Corpus.quotaAllocation(spark, dir, budget = 7L).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // quotas: n0 21/5=4 r1, n1 7/5=1 r2, n2 7/5=1 r2; one residual
    // slot -> remainder tie (n1, n2) breaks to the smaller nation key
    assert(got(0L) == ((3L, 4L, 0L, 4L)))
    assert(got(1L) == ((1L, 1L, 1L, 2L)))
    assert(got(2L) == ((1L, 1L, 0L, 1L)))
    assert(got.values.map(_._4).sum == 7L, "allocations sum EXACTLY to budget")
  }

  test("vocabGrowth: first occurrences land in their decile; cumulative is exact") {
    // 5 docs, 5 buckets -> one doc per decile
    val docs = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "a b"), (4L, "d"), (5L, "b e e"))
      .toDF("doc_id", "text")
    val got = graft.ext.Corpus.vocabGrowthOf(docs, buckets = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 2L, 2L),   // a, b are new
      (2L, 1L, 2L, 1L, 3L),   // c new, a repeats
      (3L, 1L, 2L, 0L, 3L),   // nothing new
      (4L, 1L, 1L, 1L, 4L),   // d new
      (5L, 1L, 3L, 1L, 5L)),  // e new (twice), b repeats
      s"got ${got.toSeq}")
  }

  test("zipfFit: quantized fit tracks an independent double least squares") {
    // counts a=4, b=2, c=1 -> ranks 1,2,3; the quantized integer fit
    // must land within quantization distance of the real-valued
    // least squares on (ln rank, ln count) — an independent reference,
    // not a mirror of the engine's staged formulas
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val r = graft.ext.TextStats.zipfFitOf(docs).collect().head
    assert(r.getLong(0) == 3L, "n_vocab")
    assert(r.getLong(1) == 7L, "n_occurrences")
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(slope < 0, "rank-frequency slope must be negative")
    assert(math.abs(r.getLong(2) / 1e6 - slope) < 1e-3,
      s"slope_q6=${r.getLong(2)} vs ref $slope")
    assert(math.abs(r.getLong(3) / 1e6 - icept) < 1e-3,
      s"intercept_q6=${r.getLong(3)} vs ref $icept")
  }
}
