package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus-preparation operators over `documents` / `embeddings` — the
  * chunk/pack/weigh stages a training-data pipeline runs after
  * cleaning (SURVEY.md §2.11 extension surface): sliding-window
  * chunking, token-budget sequence packing, TF-IDF term weighting,
  * and int8 embedding quantization.
  */
object Corpus {
  private def r4(c: Column): Column = graft.Num.r4(c)

  /** Sliding-window document chunking (context-window fill): split each
    * document into `window`-token chunks every `stride` tokens, keeping
    * the tail chunk. Pure per-row explode — no shuffle before the
    * presentation sort, so it scales as a map-only pass; downstream
    * consumers see (doc_id, chunk_idx) keys that preserve provenance.
    */
  def chunkDocs(spark: SparkSession, d: String,
                window: Int = 20, stride: Int = 15): DataFrame = {
    import spark.implicits._
    chunkFrame(Tables.documents(spark, d), window, stride)
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** The chunking transform itself — narrow ops only, so it applies
    * unchanged to a streaming frame (chunk-at-ingest): no state, no
    * watermark, each micro-batch chunks independently. */
  def chunkFrame(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks",
        posexplode(sequence(lit(0), greatest(size($"toks") - 1, lit(0)), lit(stride))))
      .select($"doc_id",
        $"pos".as("chunk_idx"),
        least(lit(window), size($"toks") - $"col").as("n_chunk_tokens"),
        array_join(slice($"toks", $"col" + 1, lit(window)), " ").as("chunk_text"))
  }

  /** Token-budget sequence packing (concatenate-and-split): stream each
    * language's documents in doc_id order into a contiguous token
    * stream and cut it every `budget` tokens — pack_id is the pack the
    * document STARTS in. One window cumsum per language partition plus
    * one partial-agg shuffle; at 100 TB the lang partitions are
    * independent and the cumsum is the textbook prefix-scan (Spark
    * range-partitions the window), so nothing funnels through a single
    * reducer except per-language ordering, which packing semantically
    * requires.
    */
  def packSequences(spark: SparkSession, d: String, budget: Int = 512): DataFrame = {
    import spark.implicits._
    val nToks = size(split($"text", " "))
    Tables.documents(spark, d)
      .select($"doc_id", $"lang", nToks.cast("bigint").as("n_tokens"))
      .withColumn("cum_tokens",
        sum($"n_tokens").over(Window.partitionBy($"lang").orderBy($"doc_id")))
      .withColumn("pack_id",
        floor(($"cum_tokens" - $"n_tokens") / lit(budget.toDouble)).cast("int"))
      .groupBy($"lang", $"pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"pack_id")
  }

  /** Broadcast budget for the document-frequency (vocabulary) side of
    * the TF-IDF/BM25 joins, in TERMS. A df row is a token string plus
    * a count (~50 serialized bytes), so 1M terms ≈ 50 MB — inside a
    * comfortable executor broadcast. A 100 TB corpus's vocabulary
    * (10⁸+ terms) blows any broadcast; above the budget the hint is
    * DROPPED and the token-keyed join shuffles instead (same result,
    * |tf| rows exchanged once). Measured, not guessed: the df frame is
    * persisted and counted before the hint is placed — the same
    * measured-gate house style as [[graft.ext.Dedup.resolveClusters]]'s
    * driver-edge budget.
    */
  val BroadcastVocabMaxTerms = 1000000L

  /** The document-frequency table for `d`, persisted and row-counted;
    * returns the frame plus its term count for the broadcast gate. */
  private def dfSide(spark: SparkSession, toks: DataFrame): (DataFrame, Long) = {
    import spark.implicits._
    // registry-cached under the tokenization's plan hash (a faithful
    // (tokenizer, input-dir) key): the three consumers with the same
    // tokenization — and repeat invocations in one session — share one
    // cached copy instead of each persisting a fresh one
    val df = graft.Derived.frame(
      s"df-side:${toks.queryExecution.analyzed.semanticHash()}") {
      toks.select($"doc_id", $"token").distinct()
        .groupBy($"token").agg(count(lit(1)).as("df"))
    }
    (df, df.count())
  }

  /** TF-IDF top terms per document: tf(d,t) · ln(N/df(t)), top 3 terms
    * per doc by score. Plan shape for scale: explode → (doc_id, token)
    * partial-agg → token-keyed df join (df is a token-count aggregate,
    * broadcast only while the measured vocabulary fits
    * [[BroadcastVocabMaxTerms]]) → per-doc top-k. The ranking window
    * partitions by doc_id — millions of tiny groups, so no reducer
    * funnel (contrast q34's 5-query window, which needed
    * [[graft.functions.TopKAgg]]).
    */
  def tfidfTopTerms(spark: SparkSession, d: String, k: Int = 3,
                    maxBroadcastTerms: Long = BroadcastVocabMaxTerms): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val nDocs = Tables.documents(spark, d).count()
    val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val (df, nTerms) = dfSide(spark, toks)
    val dfHinted = if (nTerms <= maxBroadcastTerms) broadcast(df) else df
    val scored = tf.join(dfHinted, "token")
      .withColumn("tfidf", $"tf" * log(lit(nDocs.toDouble) / $"df"))
    val rn = row_number().over(
      Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"token"))
    scored.withColumn("rn", rn)
      .filter($"rn" <= k)
      .select($"doc_id", $"rn", $"token", $"tf".cast("bigint").as("tf"),
        $"df".cast("bigint").as("df"), r4($"tfidf").as("tfidf"))
      .orderBy($"doc_id", $"rn")
  }

  /** BM25 top terms per document — the IR-standard upgrade of
    * [[tfidfTopTerms]] with term-frequency saturation (k1) and
    * document-length normalization (b). Same scale-shaped plan: tf
    * partial-agg, measured-gate df join (broadcast only under
    * [[BroadcastVocabMaxTerms]]), per-doc ranking window over
    * millions of tiny groups. avgdl is a two-long scalar aggregate
    * collected once (exact integer sums → exact double division, so
    * both engines compute the identical constant).
    */
  def bm25TopTerms(spark: SparkSession, d: String, k: Int = 3,
                   maxBroadcastTerms: Long = BroadcastVocabMaxTerms): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val nDocs = Tables.documents(spark, d).count()
    val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val (df, nTerms) = dfSide(spark, toks)
    val (dlSum, dlN) = dl.agg(sum($"dl"), count(lit(1)))
      .as[(Long, Long)].head()
    val avgdl = dlSum.toDouble / dlN
    // expression tree mirrored token-for-token in the oracle SQL: every
    // op is exactly-rounded IEEE, so identical trees → identical bits.
    // Constants appear as decimal literals (2.2, not k1+1 — a JVM-
    // computed 1.2+1 can be one ulp off the parsed literal 2.2)
    val idf = log((lit(nDocs.toDouble) - $"df" + 0.5) / ($"df" + 0.5) + 1.0)
    val score = idf * ($"tf" * lit(2.2)) /
      ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * ($"dl" / lit(avgdl))))
    val rn = row_number().over(
      Window.partitionBy($"doc_id").orderBy($"bm25_raw".desc, $"token"))
    val dfHinted = if (nTerms <= maxBroadcastTerms) broadcast(df) else df
    tf.join(dfHinted, "token").join(dl, "doc_id")
      .withColumn("bm25_raw", score)
      .withColumn("rn", rn)
      .filter($"rn" <= k)
      .select($"doc_id", $"rn", $"token", $"tf", $"df", $"dl",
        r4($"bm25_raw").as("bm25"))
      .orderBy($"doc_id", $"rn")
  }

  /** Per-source quota cap — the per-domain cap a crawl pipeline
    * applies so no single source dominates the corpus: keep the first
    * `quota` documents (by doc_id) of each source. Rides the bounded
    * [[graft.functions.TopKAgg]] partial aggregate: each task forwards
    * ≤quota rows per source into the shuffle, so a source with 10⁹
    * pages costs the same shuffle as one with 10³ — the property a
    * row_number window over a handful of giant source groups loses.
    */
  def sourceQuota(spark: SparkSession, d: String, quota: Int = 10): DataFrame = {
    import spark.implicits._
    val topk = udaf(new graft.functions.TopKAgg(quota))
    Tables.documents(spark, d)
      .groupBy($"source")
      .agg(topk((-$"doc_id").cast("double"), $"doc_id").as("kept"))
      .select($"source", posexplode($"kept").as(Seq("pos", "entry")))
      .select($"source", ($"pos" + 1).cast("int").as("rn"),
        $"entry._2".as("doc_id"))
      .orderBy($"source", $"rn")
  }

  /** Linear quality score + keep decision (the C4/Gopher-style rule
    * family, composed as one weighted score): average token length,
    * stopword ratio, and a length prior. Deliberately linear — every
    * term is an exactly-rounded IEEE op on exact integer ratios, so
    * the score (and the keep threshold comparison) is bit-identical
    * on any engine, which a sigmoid would not guarantee. Map-only.
    */
  def qualityFilter(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    val nToks = size(toks).cast("double")
    val avgLen = aggregate(transform(toks, t => length(t)), lit(0),
      (acc, x) => acc + x).cast("double") / nToks
    val stopRatio = size(filter(toks,
      t => t.isin(TextStats.Stopwords: _*))).cast("double") / nToks
    val score = avgLen * 0.5 + stopRatio * 2.0 - nToks * 0.002
    Tables.documents(spark, d)
      .select($"doc_id", size(toks).as("n_tokens"), score.as("raw"))
      .select($"doc_id", $"n_tokens", r4($"raw").as("quality"),
        ($"raw" >= 2.0).as("keep"))
      .orderBy($"doc_id")
  }

  /** Int8 scalar quantization of the embedding column — the ANN-index
    * compression pass (4× smaller vectors): per-vector min/max → 256
    * uniform buckets, `floor((x-mn)/(mx-mn)*255) - 128`. Map-only.
    * floor (not round) keeps both engines' integer conversion
    * identical; all arithmetic is widened to double before any op so
    * float promotion rules can't diverge.
    */
  def quantizeEmbeddings(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val mn = array_min($"embedding").cast("double")
    val mx = array_max($"embedding").cast("double")
    val q = transform($"embedding", x =>
      floor((x.cast("double") - $"mn") / ($"mx" - $"mn") * 255).cast("bigint") - 128)
    Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding", mn.as("mn"), mx.as("mx"))
      .filter($"mx" > $"mn") // degenerate constant vectors are dropped
      .select($"vec_id",
        size($"embedding").as("n_dims"),
        r4($"mn").as("v_min"),
        r4($"mx").as("v_max"),
        q.as("q"))
      .select($"vec_id", $"n_dims", $"v_min", $"v_max",
        aggregate($"q", lit(0L), (acc, x) => acc + x).as("q_sum"),
        array_min($"q").cast("bigint").as("q_min"),
        array_max($"q").cast("bigint").as("q_max"))
      .orderBy($"vec_id")
  }

  /** Content-defined chunking — rolling-hash boundaries instead of the
    * fixed token grid of [[chunkDocs]]: a chunk ends wherever the
    * polynomial hash of the trailing `window`-token context ≡ 0 mod
    * `mask` (and at end-of-document). Insertions or deletions only
    * reflow chunks NEAR the edit — downstream chunk-hash dedup
    * (the `chunk_hash` output feeds the same hash-groupBy as
    * [[graft.ext.Dedup.hashDedup]]) then re-uses every untouched
    * chunk, which is the property fixed grids lack and the reason CDC
    * storage systems chunk this way.
    *
    * Entirely map-only (token hashes come from the native ShingleHash
    * expression; boundaries, spans, and chunk hashes are per-row array
    * folds) — no shuffle before the presentation sort, so it scales
    * like every other scoring pass.
    */
  def contentChunks(spark: SparkSession, d: String,
                    window: Int = 3, mask: Long = 16L): DataFrame =
    contentChunkFrame(Tables.documents(spark, d), window, mask)

  /** Frame-based core of [[contentChunks]] (docs must carry doc_id,
    * text) — exercised on planted-edit fixtures by CorpusSpec to prove
    * the edit-stability property fixed grids lack. Narrow ops only, so
    * like [[chunkFrame]] it applies unchanged to a stream. */
  private[graft] def contentChunkFrame(docs: DataFrame,
      window: Int = 3, mask: Long = 16L): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.graft.Bridge
    val P = graft.ext.Dedup.P
    val th0 = Bridge.column(graft.functions.ShingleHash(
      Bridge.expression($"text"), n = 1, distinct = false))
    // boundary scan fused into one native loop (the HOF form —
    // filter(sequence(...), i -> fold(slice(th, ...)) % mask == 0) —
    // interpreted O(tokens·window) lambda nodes per doc)
    val bpos0 = Bridge.column(graft.functions.ChunkBoundaries(
      Bridge.expression($"text"), window, mask))
    def fold(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, h) => (acc * 31 + h) % P)
    val len = $"se.end" - $"se.start" + 1
    docs
      .select($"doc_id", split($"text", " ").as("toks"), th0.as("th"),
        bpos0.as("bpos"))
      .select($"doc_id", $"toks", $"th",
        posexplode(transform(sequence(lit(0), size($"bpos") - 1),
          j => struct(
            when(j === 0, lit(0)).otherwise(get($"bpos", j - 1) + 1).as("start"),
            get($"bpos", j).as("end"))))
          .as(Seq("chunk_idx", "se")))
      .select($"doc_id",
        $"chunk_idx".cast("int").as("chunk_idx"),
        $"se.start".cast("int").as("start_tok"),
        $"se.end".cast("int").as("end_tok"),
        len.cast("int").as("n_chunk_tokens"),
        fold(slice($"th", $"se.start" + 1, len)).as("chunk_hash"),
        array_join(slice($"toks", $"se.start" + 1, len), " ").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** Deterministic corpus mixing — the language-rebalancing pass of a
    * training-data pipeline (the Pile/LLaMA-style "don't let the
    * biggest language drown the mix" step): every language is
    * down-sampled toward the size of the smallest via a per-language
    * keep-probability, applied as a pure hash predicate so the kept
    * set is reproducible across reruns, partitionings, and engines.
    *
    * The keep test is integer-exact end-to-end: threshold
    * `(target · P) div n_lang` and multiplicative hash
    * `((doc_id mod P) · 2654435761) mod P` are both integer
    * arithmetic, so there is no float boundary to diverge on. The id
    * is reduced mod P BEFORE the multiply: (P-1)·2654435761 ≈ 5.7e18
    * fits int64, whereas multiplying a raw id above ~3.5e9 would
    * silently wrap in Spark while DuckDB promotes to HUGEINT. Shape at scale: one
    * tiny per-language count aggregate broadcasts back over the
    * corpus scan — the corpus itself never shuffles (the output here
    * aggregates per language, with a kept-id checksum standing in for
    * the materialized rows).
    */
  def mixCorpus(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d).select($"doc_id", $"lang")
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_l"))
    val target = counts.agg(min($"n_l").as("t"))
    val thr = counts.crossJoin(broadcast(target))
      .select($"lang", $"n_l", $"t",
        expr("(t * 2147483647) div n_l").as("thr"))
    docs.join(broadcast(thr), "lang")
      .select($"lang", $"doc_id", $"n_l", $"t",
        (($"doc_id" % 2147483647L) * 2654435761L % 2147483647L < $"thr")
          .as("keep"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        max($"t").as("n_target"),
        sum($"keep".cast("long")).as("n_kept"),
        sum(when($"keep", $"doc_id")).as("kept_sum"))
      .select($"lang", $"n_docs", $"n_target", $"n_kept", $"kept_sum",
        r4($"n_kept".cast("double") / $"n_docs").as("keep_rate"))
      .orderBy($"lang")
  }

  /** DSIR-style importance weighting (Xie et al. 2023's data-selection
    * recipe): score every document by how much its hashed-n-gram
    * profile looks like a TARGET corpus (here `targetSource`) rather
    * than the raw pool, then select the positive-scoring tail. Per
    * hashed bucket b the smoothed log-ratio is
    * `LQ(c_t(b)+1) + LQ(N_s+B) − LQ(c_s(b)+1) − LQ(N_t+B)` and a
    * document's importance is the SUM of its tokens' bucket ratios —
    * the add-1 bag-of-buckets likelihood ratio.
    *
    * Exactness: the q177 LQ discipline (⌊ln·10⁶⌋ of exact integers,
    * then pure integer sums) — kept as FOUR separate LQ terms rather
    * than LQ of the cross-products, so no operand ever exceeds a
    * token count (the product form wraps int64 once corpus-token ×
    * bucket-count passes ~10¹⁸ — exactly the 100 TB regime).
    *
    * Scale shape: tokenize-explode + ONE conditional bucket count
    * (map-side combinable, output bounded by `buckets`); the
    * log-ratio table re-attaches BROADCAST by construction (≤
    * `buckets` rows — a bounded pinned broadcast, not a data-sized
    * hint); one per-doc partial agg closes. The corpus never
    * shuffles by anything wider than doc_id.
    */
  def dsirSelection(spark: SparkSession, d: String, buckets: Int = 64,
                    targetSource: String = "src0"): DataFrame = {
    import spark.implicits._
    val P = graft.ext.Dedup.P
    def lq(x: String): String =
      s"CAST(floor(ln(CAST(($x) AS DOUBLE)) * 1000000.0) AS BIGINT)"
    // per-token polynomial via the fused native kernel (n=1 keeps one
    // hash per token, in order); skipEmpty drops empty tokens IN the
    // kernel — the oracle's `t != ''` pre-filter exactly, where the
    // old h≠0 form would also have dropped a real ≥6-char token that
    // happens to hash to 0 mod 2³¹−1
    import org.apache.spark.sql.graft.Bridge
    val hashed = Tables.documents(spark, d)
      .select($"doc_id", $"source",
        explode(Bridge.column(graft.functions.ShingleHash(
          Bridge.expression($"text"), 1, distinct = false,
          skipEmpty = true))).as("h"))
      .select($"doc_id", $"source", ($"h" % buckets).as("b"))
    val counts = hashed.groupBy($"b")
      .agg(sum(when($"source" === targetSource, 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cs"))
    val totals = counts.agg(sum($"ct").as("nt"), sum($"cs").as("ns"))
    val lr = counts.crossJoin(broadcast(totals))
      .select($"b",
        (expr(lq("ct + 1")) + expr(lq(s"ns + $buckets"))
          - expr(lq("cs + 1")) - expr(lq(s"nt + $buckets"))).as("lr_q6"))
    hashed.join(broadcast(lr), "b")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"), sum($"lr_q6").as("dsir_q6"))
      .withColumn("selected", $"dsir_q6" > 0)
      .orderBy($"doc_id")
  }

  /** Temperature-based corpus mixing — the mT5/multilingual-LM
    * rebalancing step [[mixCorpus]]'s hard floor generalizes to:
    * languages keep share ∝ n_l^α (α = ½ here — `⌊√n_l⌋` of an exact
    * integer is engine-identical, no float boundary), so big
    * languages are damped rather than truncated to the minimum and
    * small ones gain share. Per-language target `(N·w_l) div Σw`,
    * applied as the same reproducible multiplicative-hash keep
    * predicate as [[mixCorpus]] (same int64 envelope: ids reduced mod
    * P before the multiply; per-language targets under ~4.3·10⁹ keep
    * `target·P` in int64 — the documented [[mixCorpus]] bound).
    *
    * Scale shape: one tiny per-language count aggregate broadcasts
    * back over the corpus scan; the corpus itself never shuffles and
    * SCANS ONCE for the model (the N/Σw totals come from a window
    * over the language-domain aggregate — bounded by the number of
    * languages by construction, so the single-partition window is a
    * few-row frame, never data-sized; deriving them as a separate
    * aggregate would re-run the corpus count scan, plans don't share
    * subtrees).
    */
  def temperatureMix(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val P = graft.ext.Dedup.P
    val isqrt = "CAST(floor(sqrt(CAST(n_l AS DOUBLE))) AS BIGINT)"
    val docs = Tables.documents(spark, d).select($"doc_id", $"lang")
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_l"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val thr = counts
      .withColumn("n", sum($"n_l").over(all))
      .withColumn("sw", sum(expr(isqrt)).over(all))
      .select($"lang", $"n_l", expr(isqrt).as("w_half"),
        expr(s"(n * $isqrt) div sw").as("n_target"))
      .select($"lang", $"n_l", $"w_half", $"n_target",
        least(expr(s"(n_target * $P) div n_l"), lit(P)).as("thr"))
    docs.join(broadcast(thr), "lang")
      .select($"lang", $"n_l", $"w_half", $"n_target", $"doc_id",
        (($"doc_id" % P) * 2654435761L % P < $"thr").as("keep"))
      .groupBy($"lang")
      .agg(max($"n_l").as("n_docs"), max($"w_half").as("w_half"),
        max($"n_target").as("n_target"),
        sum($"keep".cast("long")).as("n_kept"),
        sum(when($"keep", $"doc_id")).as("kept_sum"))
      .select($"lang", $"n_docs", $"w_half", $"n_target", $"n_kept",
        $"kept_sum",
        r4($"n_kept".cast("double") / $"n_docs").as("keep_rate"))
      .orderBy($"lang")
  }

  /** Adjacent-token-pair counts — the first merge-candidate scan of a
    * BPE tokenizer-training run (count every adjacent symbol pair
    * across the corpus, with multiplicity; the top pair becomes the
    * next merge rule). Complements [[graft.ext.TextStats.vocabulary]]
    * (the unigram pass).
    *
    * Map-only pair explosion (one `transform` over index positions —
    * no self-join, no window), then a partial-agg count where each
    * task forwards one row per distinct pair, and a bounded top-k
    * presentation (TakeOrderedAndProject — the full pair vocabulary
    * never sorts globally).
    */
  def bpePairs(spark: SparkSession, d: String, k: Int = 30): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(filter(split($"text", " "), t => t =!= "").as("toks"))
      .filter(size($"toks") >= 2)
      .select(explode(transform(sequence(lit(0), size($"toks") - 2),
        i => concat_ws(" ", get($"toks", i), get($"toks", i + 1)))).as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"pair")
      .limit(k)
  }

  /** Sparse cosine similarity join over term-frequency vectors via an
    * inverted index — the lexical sibling of the dense-embedding
    * near-dup path: document pairs with cos(tfᵃ, tfᵇ) ≥ 0.5 found by
    * joining postings on the shared term, never by comparing vector
    * pairs.
    *
    * The scale lever is document-frequency pruning: terms appearing
    * in more than 10% of the corpus are dropped BEFORE the posting
    * join (the surviving vocabulary attaches AQE-sized — broadcast
    * when runtime stats fit, keyed shuffle otherwise; a pinned hint
    * on a vocabulary-sized frame is the q71/q73 mistake), so the
    * join-explosion risk — a stop term whose posting list is the
    * whole corpus, making the self-join quadratic — is excluded
    * structurally, the same reason the q119 prefix probes only rare
    * tokens. Remaining cost: posting self-join keyed by term with
    * bounded lists, pair partial-agg keyed by (doc_a, doc_b), two
    * per-doc norm joins.
    *
    * Exactness: tf and norms are integer; the keep decision
    * `4·dot² ≥ nsqᵃ·nsqᵇ` (⇔ cos ≥ 0.5, tf is non-negative) and the
    * reported `cos2_q4 = ⌊10⁴·dot²/(nsqᵃ·nsqᵇ)⌋` are integer
    * arithmetic — engine-independent with no rounding-mode appeals.
    * The squares/products are computed in DECIMAL(38,0) (HUGEINT on
    * the oracle side): dot and nsq reach (doc length)², so dot² — the
    * worst term, with the 10⁴ scale on top — passes int64 already at
    * ~10³-token documents, and Spark would wrap silently where DuckDB
    * raises. Only the ≤10⁴ quotient returns to BIGINT at the edge.
    */
  def sparseCosinePairs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val nDocs = Tables.documents(spark, d).count()
    val rareVocab = tf.groupBy($"token").agg(count(lit(1)).as("df"))
      .filter($"df" * 10 <= nDocs)
      .select($"token")
    val kept = tf.join(rareVocab, "token")
    val norm = kept.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("nsq"))
    val dot = kept.toDF("token", "doc_a", "tf_a")
      .join(kept.toDF("token", "doc_b", "tf_b"), "token")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(sum($"tf_a" * $"tf_b").as("dot"))
    dot
      .join(norm.toDF("doc_a", "nsq_a"), "doc_a")
      .join(norm.toDF("doc_b", "nsq_b"), "doc_b")
      .filter(expr("4 * CAST(dot AS DECIMAL(38,0)) * dot") >=
        expr("CAST(nsq_a AS DECIMAL(38,0)) * nsq_b"))
      .select($"doc_a", $"doc_b", $"dot", $"nsq_a", $"nsq_b",
        expr("CAST((CAST(dot AS DECIMAL(38,0)) * dot * 10000) div " +
          "(CAST(nsq_a AS DECIMAL(38,0)) * nsq_b) AS BIGINT)").as("cos2_q4"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Misra–Gries counter budget for [[heavyHitters]]. The guarantee
    * needs `counters + 1 >= ratio`: a token with global count
    * > N/ratio must exceed N_p/ratio in at least one partition
    * (pigeonhole), and MG with k counters retains any item whose
    * partition count exceeds N_p/(k+1). 64 counters cover the
    * ratio=50 contract with slack.
    */
  val MisraGriesCounters = 64

  /** EXACT heavy hitters — every token whose corpus count clears
    * N/`ratio` — via the two-phase bounded-state pattern, not a full
    * `groupBy(token)`:
    *
    *  1. per-partition Misra–Gries with `k` counters (`mapPartitions`,
    *     O(k) memory per task, zero shuffle) emits a candidate
    *     superset: any globally-heavy token survives in some
    *     partition's counter set, per the pigeonhole bound on
    *     [[MisraGriesCounters]];
    *  2. an exact recount of ONLY the candidates (broadcast semi-side
    *     of ≤ k·#partitions tokens, bounded by construction) followed
    *     by the threshold filter.
    *
    * Why this beats the obvious `groupBy(token).count.filter` at
    * 100 TB: the full aggregate shuffles the ENTIRE distinct token
    * domain (billions of keys for a web corpus) to answer a question
    * about dozens of keys; the two-phase form shuffles k·P candidate
    * strings and the final output is exact, not sketch-approximate.
    * The `total` scalar is one partial-agg count pass.
    */
  def heavyHitters(spark: SparkSession, d: String,
                   k: Int = MisraGriesCounters, ratio: Long = 50L): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "").as[String]
    val total = toks.count()
    val candidates = toks.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](2 * k)
      it.foreach { t =>
        val cur = counters.get(t)
        if (cur != null) counters.put(t, cur + 1)
        else if (counters.size < k) counters.put(t, 1L)
        else {
          // decrement-all round: the MG step that charges one unit to
          // every counter plus the unmatched arrival
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
          }
        }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        counters.keySet().iterator()).asScala
    }.toDF("token").distinct()
    toks.toDF("token")
      .join(broadcast(candidates), "token")
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * lit(ratio) >= lit(total))
      .orderBy($"cnt".desc, $"token")
  }

  /** Pointwise mutual information over within-document token pairs —
    * the association statistic behind collocation mining and
    * phrase/entity discovery: PMI(a,b) = ln(N·c_ab / (c_a·c_b)) over
    * document-level co-occurrence, keeping pairs seen in ≥`minDocs`
    * documents.
    *
    * Scale shape: distinct tokens per doc first (explode + distinct —
    * the per-doc set is content-bounded), pair generation is a
    * doc-keyed self-join of those sets (never a corpus-level
    * cross join; per-doc cost is C(set size, 2)), and everything
    * aggregates to vocabulary²-bounded rows before the single-token
    * counts join back. All counts are exact integers; ln runs on the
    * identical double ratio both engines compute.
    */
  def tokenPmi(spark: SparkSession, d: String, minDocs: Long = 50L): DataFrame = {
    import spark.implicits._
    val docToks = Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .distinct()
    val nDocs = Tables.documents(spark, d).count()
    // document frequencies via the shared measured-gate helper: the
    // hint only survives while the counted vocabulary fits the budget
    val (tokDf, nTerms) = dfSide(spark, docToks)
    def hinted(df: DataFrame): DataFrame =
      if (nTerms <= BroadcastVocabMaxTerms) broadcast(df) else df
    val pairs = docToks.toDF("doc_id", "tok_a")
      .join(docToks.toDF("doc_id", "tok_b"), "doc_id")
      .filter($"tok_a" < $"tok_b")
      .groupBy($"tok_a", $"tok_b").agg(count(lit(1)).as("c_ab"))
      .filter($"c_ab" >= minDocs)
    pairs
      .join(hinted(tokDf.toDF("tok_a", "df_a")), "tok_a")
      .join(hinted(tokDf.toDF("tok_b", "df_b")), "tok_b")
      .select($"tok_a", $"tok_b", $"c_ab", $"df_a", $"df_b",
        r4(log(lit(nDocs.toDouble) * $"c_ab" / ($"df_a" * $"df_b")))
          .as("pmi"))
      .orderBy($"tok_a", $"tok_b")
  }

  /** Inverted-index construction (the search/retrieval side of a
    * corpus store): per token, document frequency, collection
    * frequency, and a BOUNDED posting sample — the k smallest doc
    * ids, rendered as a comma string.
    *
    * Scale shape: the (token, doc) distinct+tf pass is one map-side
    * combinable groupBy; the posting sample rides [[graft.functions
    * .TopKAgg]] so each task forwards ≤k entries per token into the
    * shuffle — a stop word costs k rows, not its full posting list
    * (the unbounded `collect_list` form OOMs on exactly those
    * tokens). Full postings at 100 TB would stay EXPLODED as (token,
    * doc, tf) parquet sorted by token — the sample here is the index
    * metadata/debug surface, which is the part that must be bounded.
    *
    * Doc ids ≤ 2⁵³ are exact in TopKAgg's double score (negated for
    * ascending order); ties impossible (ids distinct per token).
    */
  def invertedIndex(spark: SparkSession, d: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val topk = udaf(new graft.functions.TopKAgg(k))
    val td = Tables.documents(spark, d)
      .select(explode(split($"text", " ")).as("token"), $"doc_id")
      .filter($"token" =!= "")
      .groupBy($"token", $"doc_id").agg(count(lit(1)).as("tf"))
    td.groupBy($"token")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"),
        topk((-$"doc_id").cast("double"), $"doc_id").as("top"))
      .select($"token", $"df", $"cf",
        array_join(transform($"top", e => e.getField("_2")), ",")
          .as("postings"))
      .orderBy($"token")
  }

  /** Largest-remainder (Hamilton) apportionment of a fixed sample
    * budget across strata — the sampling PLAN that q74's per-source
    * cap and q52's per-stratum rates execute: allocate exactly
    * `budget` slots across customer nations proportional to size,
    * with ⌊quota⌋ guaranteed and the residual slots going to the
    * largest fractional remainders (ties to the smaller nation key).
    * Unlike independent rounding, the allocations SUM EXACTLY to the
    * budget — the property a downstream "take n per stratum" stage
    * relies on.
    *
    * Scale shape: one map-side-combinable groupBy is the only
    * volume-sized work; everything after runs on the strata table,
    * whose cardinality is the nation domain (bounded by definition of
    * a stratification key, not by row count) — the remainder-rank
    * window is over that bounded frame and is documented as such.
    * All arithmetic is exact integers: floor = (B·cᵢ) div N,
    * remainder = (B·cᵢ) mod N.
    */
  def quotaAllocation(spark: SparkSession, d: String,
                      budget: Long = 997L): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val strata = Tables.customer(spark, d)
      .groupBy($"c_nationkey".cast("long").as("nation"))
      .agg(count(lit(1)).as("c"))
    strata
      .crossJoin(broadcast(strata.agg(sum($"c").as("n"))))
      .withColumn("fl",
        expr(s"CAST(($budget * CAST(c AS $dec)) div n AS BIGINT)"))
      .withColumn("rem",
        expr(s"CAST(($budget * CAST(c AS $dec)) % n AS BIGINT)"))
      .withColumn("rr", row_number().over(
        Window.orderBy($"rem".desc, $"nation")))
      .withColumn("residual",
        (lit(budget) - sum($"fl").over(Window.partitionBy())).cast("long"))
      .select($"nation", $"c", $"fl",
        when($"rr" <= $"residual", 1L).otherwise(0L).as("extra"),
        ($"fl" + when($"rr" <= $"residual", 1L).otherwise(0L))
          .as("alloc"))
      .orderBy($"nation")
  }

  /** Byte-pair-encoding TRAINING — `rounds` actual merge steps, not
    * just the pair census ([[bpePairs]] is round 1's counting half):
    * per round, count adjacent symbol pairs weighted by word
    * frequency, merge the most frequent pair (ties → lexicographic
    * (l, r)) greedily left-to-right in every word, repeat. The
    * emitted merge table IS the tokenizer artifact a pipeline ships.
    *
    * Words are framed as individually-wrapped symbols
    * (`"ab" → "|a||b|"`) so the merge is ONE engine-portable
    * `replace(s, '|l||r|', '|lr|')`: both Spark (UTF8String) and
    * DuckDB scan left-to-right without overlap, which is exactly
    * BPE's greedy convention — `|a||a||a|` merges once, `|a||b||a||b|`
    * merges twice. (Single-delimiter framing would break: the shared
    * `|` between adjacent pairs gets consumed by the first match.)
    * Words containing the reserved `|` are excluded up front.
    *
    * Scale shape: the corpus is touched ONCE (the word-frequency
    * aggregate); every round then runs on the VOCABULARY table —
    * the classic word-count formulation of BPE training — with one
    * pair-explode aggregate, a 1-row top-pair broadcast, and a
    * map-only replace. Each round's vocabulary is localCheckpoint'd:
    * the round plan references it twice (pair agg + rewrite), so an
    * un-truncated lineage doubles per round and recomputes
    * exponentially.
    */
  def bpeMerges(spark: SparkSession, d: String,
                rounds: Int = 5): DataFrame =
    bpeMergesOf(
      Tables.documents(spark, d)
        .select(explode(split(col("text"), " ")).as("w")),
      rounds)

  /** [[bpeMerges]] on an explicit one-column word frame — separated
    * so property tests can drive random corpora through the exact
    * production merge loop. */
  private[graft] def bpeMergesOf(wordsRaw: DataFrame,
                                 rounds: Int): DataFrame = {
    val spark = wordsRaw.sparkSession
    import spark.implicits._
    var cur = wordsRaw
      .filter($"w" =!= "" && !$"w".contains("|"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .select(concat(lit("|"), concat_ws("||", split($"w", "")),
        lit("|")).as("s"), $"wc")
      .localCheckpoint()
    val merges = (1 to rounds).map { r =>
      val pairs = cur
        .select($"wc", expr("filter(split(substring(s, 2," +
          " length(s)-2), '\\\\|\\\\|'), x -> x != '')").as("t"))
        .filter(size($"t") >= 2)
        .select($"wc", explode(expr(
          """transform(sequence(1, size(t) - 1),
             i -> struct(t[i-1] AS l, t[i] AS r))""")).as("p"))
        .groupBy($"p.l".as("lhs"), $"p.r".as("rhs"))
        .agg(sum($"wc").as("cnt"))
      // LAZY checkpoints (the kTruss discipline): `top` is read twice
      // (this round's rewrite + the final merge-table union) and `cur`
      // twice per round (pair census + rewrite), so both need flat
      // truncation — but materializing each EAGERLY serialized every
      // round into ~5 driver-blocking jobs (this lane ran 26 jobs with
      // ~1s of total task time: pure per-job floor). Lazily, each
      // round's blocks land when its first consumer runs and later
      // readers hit the cache — same flat lineage, a fraction of the
      // job count.
      val top = pairs.orderBy($"cnt".desc, $"lhs", $"rhs").limit(1)
        .select(lit(r.toLong).as("round"), $"lhs", $"rhs", $"cnt")
        .localCheckpoint(false)
      cur = cur
        .crossJoin(broadcast(top.select($"lhs".as("ml"), $"rhs".as("mr"))))
        .select(expr("replace(s, '|' || ml || '||' || mr || '|'," +
          " '|' || ml || mr || '|')").as("s"), $"wc")
        .localCheckpoint(false)
      top
    }
    merges.reduce(_ unionAll _).orderBy($"round")
  }

  /** Byte-pair-encoding APPLICATION — the other half of the tokenizer
    * lifecycle ([[bpeMerges]] trains the merge table; this ENCODES the
    * corpus with it and reports per-document token statistics, the
    * number every training-data pipeline budgets by). Runs the same
    * `rounds` greedy merges over the VOCABULARY — carrying the raw
    * word through the loop so the final frame is a word → encoding
    * lookup — then joins each document's words against it and sums:
    * `n_tokens` is the post-BPE symbol count, `n_words` the word
    * count, both exact integers.
    *
    * Scale shape: identical to training (corpus touched once for the
    * word-frequency aggregate, every round vocabulary-sized with a
    * 1-row broadcast top pair and a map-only replace), plus ONE
    * word-keyed join of the exploded corpus against the vocab-sized
    * lookup — broadcast while the measured vocabulary fits
    * [[BroadcastVocabMaxTerms]], an ordinary shuffle join beyond.
    * The merge-table replace chain is engine-portable exactly as in
    * training (`|`-framed symbols, left-to-right non-overlapping).
    */
  def bpeEncode(spark: SparkSession, d: String, rounds: Int = 5,
                maxBroadcastTerms: Long = BroadcastVocabMaxTerms): DataFrame = {
    import spark.implicits._
    bpeDocTokens(spark, d, rounds, maxBroadcastTerms).orderBy($"doc_id")
  }

  /** Per-document (n_words, n_tokens) after `rounds` BPE merges —
    * the unordered body of [[bpeEncode]], registry-shared so the
    * encode (q196) and the fertility report ([[tokenizerFertility]])
    * pay for the merge loop once per session. */
  private[ext] def bpeDocTokens(spark: SparkSession, d: String,
                                rounds: Int = 5,
                                maxBroadcastTerms: Long = BroadcastVocabMaxTerms): DataFrame =
   graft.Derived.frame(s"bpe-doc-tokens:$d:$rounds:$maxBroadcastTerms") {
    import spark.implicits._
    val words = Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "" && !$"w".contains("|"))
    var cur = words
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .select($"w", concat(lit("|"), concat_ws("||", split($"w", "")),
        lit("|")).as("s"), $"wc")
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val pairs = cur
        .select($"wc", expr("filter(split(substring(s, 2," +
          " length(s)-2), '\\\\|\\\\|'), x -> x != '')").as("t"))
        .filter(size($"t") >= 2)
        .select($"wc", explode(expr(
          """transform(sequence(1, size(t) - 1),
             i -> struct(t[i-1] AS l, t[i] AS r))""")).as("p"))
        .groupBy($"p.l".as("lhs"), $"p.r".as("rhs"))
        .agg(sum($"wc").as("cnt"))
      val top = pairs.orderBy($"cnt".desc, $"lhs", $"rhs").limit(1)
      cur = cur
        .crossJoin(broadcast(top.select($"lhs".as("ml"), $"rhs".as("mr"))))
        .select($"w", expr("replace(s, '|' || ml || '||' || mr || '|'," +
          " '|' || ml || mr || '|')").as("s"), $"wc")
        .localCheckpoint()
    }
    val nTerms = cur.count() // cache scan of the checkpointed vocab
    val wtok = cur.select($"w",
      expr("size(filter(split(substring(s, 2, length(s)-2)," +
        " '\\\\|\\\\|'), x -> x != ''))").cast("bigint").as("ntok"))
    val hinted = if (nTerms <= maxBroadcastTerms) broadcast(wtok) else wtok
    words.join(hinted, "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), sum($"ntok").as("n_tokens"))
  }

  /** Systematic probability-proportional-to-size sampling — the
    * deterministic PPS design ([[stratifiedSample]] is uniform within
    * strata; this weights inclusion by document SIZE, the right frame
    * when the estimand is token-weighted): lay every document's
    * n_chars weight end-to-end on a line, cut the line into
    * `slots` equal steps, and select each document the cut points
    * land in. Inclusion probability is proportional to weight, a doc
    * larger than one step earns multiple slots (`slots_hit` — the
    * sampling multiplicity an estimator must divide by), and there
    * is NO randomness: re-runs, replicas and both engines select the
    * identical rows (the q52/q66 determinism contract).
    *
    * Scale shape: the running weight total rides
    * [[graft.operators.GlobalIndex.withPrefixSum]] — the two-pass
    * prefix-offset scan, never `sum().over(Window.orderBy)`'s
    * single-reducer funnel (the oracle USES that window; the hash
    * gate proves the distributed scan recovers it). The step size
    * attaches as a broadcast scalar; selection is a map-only integer
    * predicate.
    */
  def ppsSample(spark: SparkSession, d: String, slots: Long = 100L): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
      .select($"doc_id", $"n_chars".as("w"))
    val cum = graft.operators.GlobalIndex
      .withPrefixSum(docs, Seq($"doc_id".asc), "w", "cum")
    val step = docs.agg(expr(s"sum(w) div $slots").as("step"))
    cum.crossJoin(broadcast(step))
      .withColumn("slots_hit",
        expr("cum div step - (cum - w) div step"))
      .filter($"slots_hit" > 0)
      .select($"doc_id", $"w", $"cum", $"slots_hit")
      .orderBy($"doc_id")
  }

  /** Tokenizer fertility per language — post-BPE tokens per
    * whitespace word, the metric that tells a multilingual pipeline
    * which languages the tokenizer fragments (fertility ≫ 1 means a
    * language pays more sequence length per word, skewing both cost
    * and mixing weights; the per-language readout [[bpeEncode]]'s
    * corpus totals hide).
    *
    * Scale shape: rides the registry-shared [[bpeDocTokens]] frame —
    * the merge loop never re-runs; one doc_id join to attach the
    * language tag and one map-side-combinable agg to the bounded
    * language domain. Token sums stage DECIMAL(38,0) (the 10⁶
    * blow-up outgrows int64 at ~10¹³ tokens).
    */
  def tokenizerFertility(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    bpeDocTokens(spark, d)
      .join(Tables.documents(spark, d).select($"doc_id", $"lang"),
        "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words".cast(dec)).as("sw"),
        sum($"n_tokens".cast(dec)).as("st"))
      .select($"lang", $"n_docs",
        expr("CAST(sw AS BIGINT)").as("sum_words"),
        expr("CAST(st AS BIGINT)").as("sum_tokens"),
        expr("CAST(st * 1000000 div sw AS BIGINT)").as("fertility_q6"))
      .orderBy($"lang")
  }

  /** Execute [[quotaAllocation]]'s sampling plan: per stratum take
    * EXACTLY its allocated slot count, members chosen by smallest
    * engine-portable key hash — a deterministic uniform-without-
    * replacement sample (no `rand()`: re-runs, replicas, and both
    * engines pick the identical rows, the property that makes the
    * sample itself hash-verifiable).
    *
    * Scale shape: selection rides the bounded [[graft.functions
    * .TopKAgg]] partial aggregate — every task forwards ≤ budget
    * rows per stratum into the shuffle, so a billion-row stratum
    * costs the same post-scan shuffle as a thousand-row one. The
    * oracle's per-stratum ROW_NUMBER window funnels each stratum
    * through one reducer — exactly the shape this avoids; the hash
    * gate proves the bounded partial top-k recovers windowed
    * semantics. The allocation table is strata-domain-sized and
    * broadcasts by construction.
    */
  def stratifiedSample(spark: SparkSession, d: String,
                       budget: Long = 997L): DataFrame = {
    import spark.implicits._
    val topk = udaf(new graft.functions.TopKAgg(budget.toInt))
    val alloc = quotaAllocation(spark, d, budget)
      .select($"nation", $"alloc")
    Tables.customer(spark, d)
      .select($"c_nationkey".cast("long").as("nation"), $"c_custkey")
      .withColumn("h",
        expr("(c_custkey % 2147483647) * 2654435761 % 2147483647"))
      .groupBy($"nation")
      // score = −h: TopKAgg keeps the k LARGEST scores ⇒ the k
      // smallest hashes; its (score, id) tie-break matches the
      // oracle's ORDER BY h, c_custkey (−h is exact in a double:
      // h < 2³¹ ≪ 2⁵³)
      .agg(topk((-$"h").cast("double"), $"c_custkey").as("top"))
      .select($"nation", posexplode($"top"))
      .select($"nation", ($"pos" + 1).cast("long").as("pos"),
        $"col._2".as("c_custkey"), (-$"col._1").cast("long").as("h"))
      .join(broadcast(alloc), "nation")
      .filter($"pos" <= $"alloc")
      .select($"nation", $"pos", $"c_custkey", $"h")
      .orderBy($"nation", $"pos")
  }

  /** Vocabulary growth curve (Heaps' law audit) — new vs cumulative
    * token types per ingestion decile, in document order. The shape
    * tells a corpus builder whether more data still buys vocabulary
    * (curve still climbing ⇒ the corpus hasn't saturated its domain)
    * and exposes ingestion anomalies (a decile suddenly minting types
    * ⇒ an encoding break or a new source slipped in). Companion to
    * [[graft.ext.TextStats.zipfFit]]: Zipf profiles the static
    * rank-frequency law, Heaps the growth law.
    *
    * Everything is exact integer counting. Document order rides
    * [[graft.operators.GlobalIndex]] (never a global ROW_NUMBER
    * window); decile assignment is the arithmetic NTILE
    * `(rank−1)·B div n + 1` (q176's form); a token's first-occurrence
    * decile is `min(decile)` — valid because the decile is monotone
    * in the rank — so first occurrences come from ONE
    * map-side-combinable aggregate over the exploded stream, never a
    * per-token ordered window. The only window left runs over the
    * B-row decile table (bounded by construction), accumulating
    * cum_types.
    */
  def vocabGrowth(spark: SparkSession, d: String,
                  buckets: Int = 10): DataFrame =
    vocabGrowthOf(Tables.documents(spark, d), buckets)

  private[graft] def vocabGrowthOf(docs: DataFrame,
                                   buckets: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val ranked = graft.operators.GlobalIndex.withRowNumber(
      docs.select($"doc_id", $"text"), Seq(col("doc_id")), "rnk")
    val n = ranked.agg(count(lit(1)).as("n"))
    val bucketed = ranked.crossJoin(broadcast(n))
      .select($"doc_id", $"text",
        expr(s"((rnk - 1) * $buckets) div n + 1").as("decile"))
    val toks = bucketed
      .select($"decile", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val occ = toks.groupBy($"decile")
      .agg(count(lit(1)).as("n_occurrences"))
    val docsPer = bucketed.groupBy($"decile").agg(count(lit(1)).as("n_docs"))
    val firsts = toks.groupBy($"token").agg(min($"decile").as("decile"))
      .groupBy($"decile").agg(count(lit(1)).as("new_types"))
    docsPer.join(occ, "decile").join(firsts, Seq("decile"), "left")
      .select($"decile", $"n_docs", $"n_occurrences",
        coalesce($"new_types", lit(0L)).as("new_types"))
      .withColumn("cum_types",
        sum($"new_types").over(Window.orderBy($"decile")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy($"decile")
  }

  /** Per-source quality scorecard — the provenance report a curation
    * pipeline reads before setting mixing weights ([[mixCorpus]],
    * [[temperatureMix]]): for every source, volume, mean length,
    * stopword density (fluency proxy), language-label disagreement
    * (the q30 vote vs the recorded tag), and the share of docs with
    * at least one verified near-duplicate partner.
    *
    * Scale shape: three corpus passes (doc census, token census, the
    * q30 vote) — each ONE map-side-combinable agg to the bounded
    * source domain; the dup flag rides the registry-shared LSH
    * candidate set ([[graft.ext.Dedup]]) and attaches by a left-semi
    * doc_id join. All shares are single positive divisions; the two
    * corpus-sized sums stage DECIMAL(38,0) (token count × 10⁶
    * outgrows int64 at ~10¹³ tokens — the 100 TB regime).
    */
  def sourceScorecard(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dec = "DECIMAL(38,0)"
    val docs = Tables.documents(spark, d)
    val base = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("schars"))
    val toks = docs
      .select($"source", explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
    val ts = toks.groupBy($"source")
      .agg(count(lit(1)).as("n_toks"),
        sum(when($"tok".isin(TextStats.Stopwords: _*), 1L)
          .otherwise(0L)).as("n_stop"))
    val mism = TextStats.langId(spark, d)
      .select($"doc_id",
        when($"predicted" =!= $"lang", 1L).otherwise(0L).as("mm"))
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .groupBy($"source").agg(sum($"mm").as("n_mismatch"))
    val dup = docs.select($"doc_id", $"source")
      .join(Dedup.verifiedDupDocIds(spark, d), Seq("doc_id"), "left_semi")
      .groupBy($"source").agg(count(lit(1)).as("n_dup"))
    base.join(ts, "source").join(mism, "source")
      .join(dup, Seq("source"), "left")
      .select($"source", $"n_docs",
        expr(s"CAST(CAST(schars AS $dec) * 100 div n_docs AS BIGINT)")
          .as("mean_chars_q2"),
        expr(s"CAST(CAST(n_stop AS $dec) * 1000000 div n_toks AS BIGINT)")
          .as("stop_share_q6"),
        expr("CAST(n_mismatch * 1000000 div n_docs AS BIGINT)")
          .as("mismatch_q6"),
        expr("CAST(coalesce(n_dup, 0) * 1000000 div n_docs AS BIGINT)")
          .as("dup_share_q6"))
      .orderBy($"source")
  }
}
