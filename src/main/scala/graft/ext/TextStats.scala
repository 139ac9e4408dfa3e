package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators over `documents` (SURVEY.md §2.11 extension
  * surface): token counting, quality stats, language-ID heuristic,
  * document fingerprinting. All are per-row projections (no shuffle at
  * all until the final presentation ORDER BY), so they scale linearly —
  * the natural shape for a 100 TB map-only scoring pass.
  */
object TextStats {
  private def r4(c: Column): Column = graft.Num.r4(c)
  private val P = Dedup.P

  val Stopwords: Seq[String] = Seq("the", "a", "is", "of", "and", "to", "in", "it")

  /** Per-document quality stats: char/token counts, average token
    * length, stopword ratio — the length/punct/stopword scoring family.
    */
  def textStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    Tables.documents(spark, d)
      .select($"doc_id", $"lang",
        length($"text").as("n_chars_calc"),
        size(toks).as("n_tokens"),
        r4(aggregate(transform(toks, t => length(t)), lit(0),
             (acc, x) => acc + x).cast("double") / size(toks)).as("avg_token_len"),
        r4(size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks))
          .as("stopword_ratio"))
      .orderBy($"doc_id")
  }

  /** Corpus vocabulary: the top-50 tokens by frequency — the corpus
    * statistic every tokenizer/BPE training run starts from. Explode →
    * partial-agg count → TakeOrderedAndProject top-k: each task
    * forwards one partial count per distinct token and the top-k sort
    * never materializes the full vocabulary globally.
    */
  def vocabulary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token")
      .limit(50)
  }

  /** Benchmark-contamination check — the train/eval overlap scan every
    * LLM data pipeline runs before training: which corpus documents
    * share any 3-token shingle with the eval set (here a deterministic
    * pseudo-benchmark: doc_id ≡ 0 mod 97)? Shingles explode to
    * (doc_id, hash) and the overlap is a plain equi-join on the hash —
    * shuffle on a 8-byte key, no pairwise document comparison, which
    * is what lets it run corpus × benchmark at 100 TB.
    */
  def contamination(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val sh = Tables.documents(spark, d)
      .select($"doc_id", explode(Dedup.shingleHashes($"text")).as("h"))
    val eval = sh.filter($"doc_id" % 97 === 0)
      .select($"doc_id".as("eval_id"), $"h")
    sh.filter($"doc_id" % 97 =!= 0)
      .join(eval, "h")
      .groupBy($"doc_id")
      .agg(countDistinct($"eval_id").as("n_eval_docs"),
        countDistinct($"h").as("n_shared_shingles"))
      .orderBy($"doc_id")
  }

  /** Repetition scoring (the Gopher/C4-style quality rule): fraction
    * of duplicate 2-token shingles per document. Multiplicity-keeping
    * shingle hashes make it a pure per-row projection — no shuffle.
    */
  def repetition(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    val grams = Bridge.column(graft.functions.ShingleHash(
      Bridge.expression($"text"), n = 2, distinct = false))
    Tables.documents(spark, d)
      .select($"doc_id", grams.as("grams"))
      .filter(size($"grams") > 0)
      .select($"doc_id",
        size($"grams").as("n_grams"),
        size(array_distinct($"grams")).as("n_distinct"),
        r4(lit(1.0) - size(array_distinct($"grams")).cast("double") / size($"grams"))
          .as("rep_ratio"))
      .orderBy($"doc_id")
  }

  /** PII redaction: regex-replace planted email addresses with a
    * sentinel — map-only, the scrubbing pass that runs before any
    * text leaves the pipeline. The pattern sticks to RE2/Java-common
    * syntax so the oracle evaluates the identical regex.
    */
  def redactPii(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val planted = concat($"text", lit(" contact user"), $"doc_id",
      lit("@mail.com or admin"), $"doc_id", lit("@web.org now"))
    val redacted = regexp_replace(planted, "[a-z0-9]+@[a-z]+\\.(com|org)", "<EMAIL>")
    Tables.documents(spark, d)
      .select($"doc_id", redacted.as("red"))
      .select($"doc_id",
        (((length($"red") - length(regexp_replace($"red", "<EMAIL>", ""))) / 7)
          .cast("int")).as("n_emails"),
        substring($"red", -25, 25).as("tail25"),
        length($"red").as("red_len"))
      .orderBy($"doc_id")
  }

  /** Language-ID by stopword-profile voting: count profile words per
    * language, argmax with a fixed alphabetical tie-break. (A real
    * system uses char n-gram profiles; the operator shape — per-row
    * score + argmax — is identical.)
    */
  def langId(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val profiles = Seq(
      "de" -> Seq("der", "die", "und"),
      "en" -> Seq("the", "a", "is"),
      "es" -> Seq("el", "la", "y"),
      "fr" -> Seq("le", "la", "et"))
    val toks = split($"text", " ")
    val scored = Tables.documents(spark, d).select(($"doc_id" +: $"lang" +:
      profiles.map { case (l, ws) =>
        size(filter(toks, t => t.isin(ws: _*))).as(s"s_$l")
      }): _*)
    val Seq(de, en, es, fr) = profiles.map(p => col(s"s_${p._1}"))
    scored.select($"doc_id", $"lang",
        when(de >= en && de >= es && de >= fr, "de")
          .when(en >= es && en >= fr, "en")
          .when(es >= fr, "es")
          .otherwise("fr").as("predicted"),
        de.as("s_de"), en.as("s_en"), es.as("s_es"), fr.as("s_fr"))
      .orderBy($"doc_id")
  }

  /** Token counting with a BPE-ish regex (letters | digits | single
    * punct) — `regexp_extract_all`, identical dialect in Java regex and
    * RE2 for this pattern.
    */
  def tokenCountRegex(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id",
        size(split($"text", " ")).as("n_ws_tokens"),
        size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .as("n_bpeish_tokens"))
      .orderBy($"doc_id")
  }

  /** Whole-document fingerprint: polynomial rolling hash over every
    * char, mod 2^31-1 — a content checksum both engines compute
    * identically (vs sha2, which DuckDB also has; this one shows the
    * HOF fold form).
    */
  def fingerprint(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id",
        aggregate(filter(split($"text", ""), ch => ch =!= ""), lit(0L),
          (acc, ch) => (acc * 31 + ascii(ch)) % P).as("fp"))
      .orderBy($"doc_id")
  }

  /** Feature hashing (the "hashing trick") — the fixed-dimension text
    * vectorizer that needs NO vocabulary pass: each token hashes to
    * one of `dims` buckets with a ±1 sign from an independent hash
    * bit (Weinberger et al. — the sign makes collisions cancel in
    * expectation instead of biasing upward). Output per doc: the
    * sparse vector's nnz, L1 mass, and a deterministic Σbucket·w
    * checksum — bounded one row per doc, with the full vector
    * recoverable from the (doc, bucket, w) intermediate.
    *
    * Scale shape: tokenize-explode + ONE map-side-combinable
    * groupBy(doc, bucket) + a per-doc rollup — no vocabulary table,
    * no joins, nothing driver-side; exactly why the trick exists at
    * 100 TB. Token hash is the shared [[fingerprint]] char-fold
    * polynomial, so both engines agree bit-for-bit.
    */
  def featureHashing(spark: SparkSession, d: String,
                     dims: Int = 64): DataFrame = {
    import spark.implicits._
    // per-token polynomial via the fused native kernel (n=1 → one
    // hash per token); skipEmpty drops empty tokens IN the kernel —
    // exactly the oracle's `t != ''` pre-filter, where the old h≠0
    // filter would also have dropped a real ≥6-char token that
    // happens to hash to 0 mod 2³¹−1
    val hashed = {
      import org.apache.spark.sql.graft.Bridge
      Tables.documents(spark, d)
        .select($"doc_id",
          explode(Bridge.column(graft.functions.ShingleHash(
            Bridge.expression($"text"), 1, distinct = false,
            skipEmpty = true))).as("h"))
    }
    val vec = hashed.select($"doc_id", ($"h" % dims).as("bucket"),
        when(expr(s"(h div $dims) % 2") === 0, lit(1L)).otherwise(lit(-1L))
          .as("sgn"))
      .groupBy($"doc_id", $"bucket").agg(sum($"sgn").as("w"))
      .filter($"w" =!= 0)
    vec.groupBy($"doc_id").agg(
        count(lit(1)).as("nnz"),
        sum(abs($"w")).as("l1"),
        sum($"bucket" * $"w").as("checksum"))
      .orderBy($"doc_id")
  }

  /** Per-token corpus-divergence profile — "which terms shifted
    * between corpus A and corpus B" (old crawl vs new crawl, source
    * vs source), the topic-drift screen run before mixing corpora:
    * the signed smoothed log-odds `ln((c_A+1)(N_B+V)) −
    * ln((c_B+1)(N_A+V))` per token, positive = A-leaning. Periods
    * are the deterministic doc_id parity split; a support floor
    * drops the noise tail (and bounds output by the vocabulary,
    * which grows sublinearly — Heaps — and is further cut by the
    * floor).
    *
    * Exactness: the q177 LQ discipline — ln is taken of EXACT
    * integer products quantized to q6 (`floor(ln(x)·10⁶)`), so both
    * engines hash-match bit-for-bit; the subtraction of two LQ
    * integers is exact. Scale shape: tokenize-explode + ONE
    * map-side-combinable conditional count per token; totals attach
    * as a broadcast one-row scalar; no joins, no windows.
    */
  def tokenDivergence(spark: SparkSession, d: String,
                      minSupport: Long = 5L): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select(($"doc_id" % 2).as("period"),
        explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
    val counts = toks.groupBy($"tok")
      .agg(sum(when($"period" === 0, 1L).otherwise(0L)).as("ca"),
        sum(when($"period" === 1, 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum($"ca").as("na"), sum($"cb").as("nb"),
      count(lit(1)).as("v"))
    counts.filter($"ca" + $"cb" >= minSupport)
      .crossJoin(broadcast(totals))
      .select($"tok", $"ca", $"cb",
        (expr("CAST(floor(ln(CAST((ca + 1) * (nb + v) AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)") -
          expr("CAST(floor(ln(CAST((cb + 1) * (na + v) AS DOUBLE))" +
            " * 1000000.0) AS BIGINT)")).as("dlq"))
      .orderBy($"tok")
  }

  /** Jensen–Shannon divergence between two sources' token
    * distributions — the symmetric, bounded ([0, ln 2]) corpus-drift
    * number that [[tokenDivergence]]'s per-token profile rolls up to:
    * `JS = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q))`, the distance a
    * mixing pipeline tracks between a new source and its reference
    * before granting quota.
    *
    * Exactness — the q177/q212 LQ discipline end-to-end: with
    * `p = ca/Na` and `q = cb/Nb`, each log ratio cross-multiplies to
    * EXACT integers — `2p/(p+q) = 2·ca·Nb / (ca·Nb + cb·Na)` — so
    * every per-token term is a difference of `floor(ln(int)·10⁶)`
    * values; terms weight by the exact counts into DECIMAL(38,0)
    * sums, and the three closing divisions are 10⁹-shift sign-safe.
    * A token absent from one side contributes only to the other's
    * half (`greatest(c,1)` keeps ln's argument positive; the `c`
    * weight zeroes the dead branch).
    *
    * Scale shape: tokenize-explode + ONE conditional count agg per
    * token + ONE DECIMAL rollup; totals attach as a broadcast one-row
    * scalar. No joins beyond the scalar, no windows.
    */
  def jsDivergence(spark: SparkSession, d: String,
                   srcA: String = "src0", srcB: String = "src1"): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val toks = Tables.documents(spark, d)
      .filter($"source".isin(srcA, srcB))
      .select($"source", explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
    val counts = toks.groupBy($"tok")
      .agg(sum(when($"source" === srcA, 1L).otherwise(0L)).as("ca"),
        sum(when($"source" === srcB, 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum($"ca").as("na"), sum($"cb").as("nb"))
    def lq(x: String): String =
      s"CAST(floor(ln(CAST(($x) AS DOUBLE)) * 1000000.0) AS BIGINT)"
    val sums = counts.crossJoin(broadcast(totals))
      .select($"ca", $"cb", $"na", $"nb",
        (expr(lq("2 * greatest(ca, 1) * nb")) -
          expr(lq("greatest(ca, 1) * nb + cb * na"))).as("ta"),
        (expr(lq("2 * greatest(cb, 1) * na")) -
          expr(lq("ca * nb + greatest(cb, 1) * na"))).as("tb"))
      .agg(max($"na").as("na"), max($"nb").as("nb"),
        count(lit(1)).as("vocab"),
        sum($"ca".cast(dec) * $"ta").as("sa"),
        sum($"cb".cast(dec) * $"tb").as("sb"))
    sums.select($"na", $"nb", $"vocab",
      expr(s"""CAST((sa + 1000000000 * CAST(na AS $dec))
        | div nullif(na, 0) - 1000000000 AS BIGINT)"""
        .stripMargin.replace("\n", "")).as("half_a_q6"),
      expr(s"""CAST((sb + 1000000000 * CAST(nb AS $dec))
        | div nullif(nb, 0) - 1000000000 AS BIGINT)"""
        .stripMargin.replace("\n", "")).as("half_b_q6"))
      .withColumn("js_q6",
        expr("(half_a_q6 + half_b_q6 + 4000000000) div 2 - 2000000000"))
  }

  /** Winnowing-style fingerprint: minimum polynomial hash over 5-char
    * grams sampled every 4 chars — the rolling-hash document sketch
    * (min-sampling variant of winnowing).
    */
  def winnowFingerprint(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    Tables.documents(spark, d)
      .select($"doc_id",
        Bridge.column(graft.functions.WinnowHash(Bridge.expression($"text")))
          .as("winnow_fp"))
      .orderBy($"doc_id")
  }

  /** Unigram language-model rarity score — the corpus-statistics
    * quality signal (the cheap cousin of KenLM perplexity filtering):
    * train a unigram model from corpus token counts, score each
    * document by the mean inverse token probability
    * `avg(N_total / count(token))` over its tokens (with
    * multiplicity). Rare-token-heavy docs score high; boilerplate
    * scores near its copy count's inverse frequency.
    *
    * The per-token summand is computed as EXACT integer division
    * `(N_total · 10⁴) div count` so per-doc sums are integer adds —
    * order-independent under any parallelism and bit-identical across
    * engines (a float `-log p` sum would be neither). Shape at scale:
    * explode → token-count partial agg → join back on the token (AQE
    * broadcasts the vocabulary when it fits) → per-doc partial agg.
    */
  def unigramScore(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val counts = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum($"cnt").as("n_total"))
    toks.join(counts, "token")
      .crossJoin(broadcast(total))
      .select($"doc_id", expr("(n_total * 10000) div cnt").as("inv"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_tokens"),
           sum($"inv").as("inv_sum"))
      .select($"doc_id", $"n_tokens",
        r4($"inv_sum".cast("double") / $"n_tokens" / 10000.0).as("rarity_score"))
      .orderBy($"doc_id")
  }

  /** Bigram language-model fluency score — [[unigramScore]]'s
    * second-order sibling: train bigram/head counts over the corpus,
    * score each document by the mean conditional probability
    * `avg(P(w2|w1))` of its own bigrams. High scores mark documents
    * whose word order follows corpus-typical continuations;
    * scrambled or boilerplate-stitched text scores low.
    *
    * The per-bigram summand is the EXACT integer
    * `(cnt(w1,w2)·10⁶) div cnt(w1·)`, so per-doc sums are
    * order-independent integer adds (q84's recipe). Shape at scale:
    * explode adjacent pairs → bigram-count partial agg → head-count
    * roll-up of that (tiny) model → join back on the bigram (AQE
    * broadcasts the model when it fits) → per-doc partial agg.
    */
  def bigramScore(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val bg = Tables.documents(spark, d)
      .select($"doc_id",
        expr("filter(split(text, ' '), t -> t != '')").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", explode(
        expr("""transform(sequence(1, size(toks) - 1),
                 i -> struct(toks[i-1] AS w1, toks[i] AS w2))"""))
        .as("b"))
      .select($"doc_id", $"b.w1", $"b.w2")
    val pairCnt = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("cnt"))
    val headCnt = pairCnt.groupBy($"w1").agg(sum($"cnt").as("head_cnt"))
    bg.join(pairCnt, Seq("w1", "w2"))
      .join(headCnt, "w1")
      .select($"doc_id", expr("(cnt * 1000000) div head_cnt").as("p"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum($"p").as("p_sum"))
      .select($"doc_id", $"n_bigrams",
        r4($"p_sum".cast("double") / $"n_bigrams" / 1000000.0)
          .as("fluency_score"))
      .orderBy($"doc_id")
  }

  /** Per-document log-perplexity under an add-1-smoothed corpus
    * unigram LM — THE standard perplexity-filtering signal of
    * training-data pipelines (drop/downweight documents whose token
    * stream the corpus model finds surprising). Per-token surprisal
    * −ln p(t) = ln(N+V) − ln(c_t+1); the report is each document's
    * token count, total surprisal, and mean (avg negative
    * log-likelihood, natural-log µnats).
    *
    * Exactness: ln is quantized per VALUE — LQ(x) = ⌊ln(x)·10⁶⌋
    * applied to the (c_t+1) each token resolves to and once to the
    * scalar (N+V) — so per-doc totals are integer sums, order-
    * independent under any parallelism and bit-identical across
    * engines (the q166 entropy discipline; a float Σ −ln p would be
    * neither). Shape at scale: explode → token-count partial agg →
    * join back on the token (AQE broadcasts the vocabulary when it
    * fits; above that it's a keyed shuffle, never a pinned hint —
    * the q71/q73 gate precedent) → per-doc partial agg.
    */
  def logPerplexity(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val counts = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val model = counts.agg(
      expr("CAST(floor(ln(CAST(sum(cnt) + count(1) AS DOUBLE))" +
        " * 1000000.0) AS BIGINT)").as("lq_nv"))
    toks.join(counts, "token")
      .crossJoin(broadcast(model))
      .select($"doc_id",
        ($"lq_nv" - expr("CAST(floor(ln(CAST(cnt + 1 AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)")).as("s"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"s").as("nll_q6"))
      .select($"doc_id", $"n_tokens", $"nll_q6",
        expr("nll_q6 div n_tokens").as("avg_nll_q6"))
      .orderBy($"doc_id")
  }

  /** Bigram add-1 LM surprisal per document — [[logPerplexity]]'s
    * context-aware sibling: the unigram score misses word-ORDER
    * pathologies (shuffled text, keyword stuffing, n-gram spam score
    * exactly like prose under a bag-of-words model), while the
    * conditional `p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V)` penalizes
    * improbable transitions. Per doc: Σ over its bigrams of
    * `LQ(c(w₁)+V) − LQ(c(w₁w₂)+1)` — the q175/q177 LQ discipline, ln
    * of exact integers quantized to q6, so totals are exact integer
    * sums and both engines hash-match.
    *
    * Scale shape: one explode to (doc, w₁, w₂) via a zipped
    * self-slide (no join), one bigram-count partial agg, then the
    * scoring joins keyed by bigram and by w₁ — corpus-derived model
    * tables, AQE-sized (never a pinned broadcast — the bigram table
    * is vocabulary², the q71/q73 lesson squared); one per-doc partial
    * agg closes.
    */
  def bigramPerplexity(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val big = Tables.documents(spark, d)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        // try_element_at: the last slot's i+2 is out of bounds, which
        // ANSI element_at would throw on; NULL w2 is filtered below
        "filter(transform(ws, (w, i) -> struct(w AS w1, " +
          "try_element_at(ws, i + 2) AS w2)), p -> p.w1 != '' AND " +
          "p.w2 IS NOT NULL AND p.w2 != '')")).as("p"))
      .select($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
    val uni = big.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val nv = uni.agg(count(lit(1)).as("v"))
    val pairs = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    big.join(pairs, Seq("w1", "w2"))
      .join(uni, "w1")
      .crossJoin(broadcast(nv))
      .select($"doc_id",
        (expr("CAST(floor(ln(CAST(c1 + v AS DOUBLE)) * 1000000.0) AS BIGINT)")
          - expr("CAST(floor(ln(CAST(c12 + 1 AS DOUBLE)) * 1000000.0)" +
            " AS BIGINT)")).as("s"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"s").as("nll_q6"))
      .select($"doc_id", $"n_bigrams", $"nll_q6",
        expr("nll_q6 div n_bigrams").as("avg_nll_q6"))
      .orderBy($"doc_id")
  }

  /** Interpolated Kneser–Ney bigram probability per document — the
    * smoothing the add-1 LMs (q175/q214) are the strawman for: add-1
    * hands every unseen continuation the same mass regardless of how
    * PROMISCUOUS the continuation word is, while KN backs off to the
    * continuation probability `N1+(·w₂)/T` ("in how many contexts
    * does w₂ appear"), the property that made it the standard n-gram
    * smoother (Chen–Goodman). With the discount fixed at the
    * textbook D = 3/4 the whole model is EXACT integer rationals:
    *
    *   P(w₂|w₁) = max(c₁₂ − ¾, 0)/c₁ + (¾·N1+(w₁·)/c₁)·N1+(·w₂)/T
    *            = [max(4c₁₂ − 3, 0)·T + 3·N1+(w₁·)·N1+(·w₂)]
    *              / (4·c₁·T)
    *
    * quantized once per bigram at q9 (one positive integer division,
    * DECIMAL(38,0)-staged — c₁₂·T crosses int64 at warehouse corpus
    * sizes), summed per document as order-independent integer adds.
    * Per w₁ the probabilities sum to 1 exactly — the discount mass
    * D·N1+(w₁·)/c₁ is redistributed by continuation weight, nothing
    * invented, nothing lost.
    *
    * Scale shape: the q214 slide to (doc, w₁, w₂); bigram-count,
    * head (c₁, N1+(w₁·)) and continuation (N1+(·w₂)) partial aggs —
    * all model tables are type-domain-sized; scoring joins keyed by
    * bigram/w₁/w₂ (AQE-sized, never pinned); one per-doc agg closes.
    */
  def knBigramScore(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val big = Tables.documents(spark, d)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        "filter(transform(ws, (w, i) -> struct(w AS w1, " +
          "try_element_at(ws, i + 2) AS w2)), p -> p.w1 != '' AND " +
          "p.w2 IS NOT NULL AND p.w2 != '')")).as("p"))
      .select($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
    val pairs = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val heads = pairs.groupBy($"w1")
      .agg(sum($"c12").as("c1"), count(lit(1)).as("nh"))
    val tails = pairs.groupBy($"w2").agg(count(lit(1)).as("nt"))
    val types = pairs.agg(count(lit(1)).as("t"))
    big.join(pairs, Seq("w1", "w2"))
      .join(heads, "w1")
      .join(tails, "w2")
      .crossJoin(broadcast(types))
      .select($"doc_id",
        expr(s"CAST(((CAST(greatest(4 * c12 - 3, 0) AS $dec) * t" +
          s" + CAST(3 AS $dec) * nh * nt) * 1000000000)" +
          s" div (CAST(4 AS $dec) * c1 * t) AS BIGINT)").as("p_q9"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"p_q9").as("kn_sum_q9"))
      .select($"doc_id", $"n_bigrams", $"kn_sum_q9",
        expr("kn_sum_q9 div n_bigrams").as("avg_p_q9"))
      .orderBy($"doc_id")
  }

  /** Out-of-vocabulary rate per document against the corpus top-k
    * vocabulary — the tokenizer-coverage gate: a document whose
    * tokens mostly fall outside the vocabulary the tokenizer was
    * sized for will fragment into long byte-level sequences (wasted
    * context) or carry boilerplate/noise; pipelines cap OOV rate
    * before admission.
    *
    * Vocabulary selection is deterministic — top `vocabSize` by
    * (count DESC, token ASC), a total order — so both engines pick
    * the identical set and the rates hash-match. Scale shape: one
    * explode + token-count partial agg; the vocabulary itself is a
    * global top-k (TakeOrderedAndProject — bounded k rows, never a
    * full sort) and joins back BROADCAST by construction (≤ vocabSize
    * rows — a bounded pinned broadcast, unlike the unbounded df-table
    * hint the q71/q73 gate removed); one per-doc partial agg closes.
    */
  def oovRate(spark: SparkSession, d: String,
              vocabSize: Int = 1000): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val vocab = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(vocabSize)
      .select($"token", lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum(when($"in_vocab".isNull, 1L)), lit(0L)).as("n_oov"))
      .select($"doc_id", $"n_tokens", $"n_oov",
        expr("CAST(n_oov * 1000000 div n_tokens AS BIGINT)")
          .as("oov_q6"))
      .orderBy($"doc_id")
  }

  /** Zipf rank-frequency fit — least-squares slope/intercept of
    * ln(count) against ln(rank) over the corpus vocabulary. Natural
    * corpora track slope ≈ −1 (Zipf's law); a corpus that deviates
    * hard (slope → 0: synthetic/templated text; slope ≪ −1: a few
    * tokens dominating) fails the distributional-health gate the same
    * way [[oovRate]] fails the coverage gate.
    *
    * Exactness: both coordinates are integer ln quantizations (LQ(v) =
    * ⌊ln v·10⁶⌋ — the q166/q175 discipline), so all five regression
    * sums are integer, order-independent, engine-exact; per-term
    * products stay under 2·10¹⁵ (int64) and the DECIMAL(38,0)-staged
    * normal equations hold to vocabularies of ~10⁸ types (sx·sy·10⁶ ≈
    * 3·10³⁶ at that size). The slope is computed as the NEGATED
    * magnitude `(sx·sy − n·sxy) div den` — guaranteed ≥ 0 by
    * Chebyshev's sum inequality (rank ascending ⇒ count descending),
    * so integer division never sees a negative operand and Spark's
    * truncation agrees with DuckDB's floor (the q177 divergence
    * class, avoided structurally instead of shifted away).
    *
    * Scale shape: one explode + map-side-combinable token count is
    * the only corpus-sized pass; ranking the vocabulary rides
    * [[graft.operators.GlobalIndex]] (range-partitioned two-pass
    * numbering — never the textbook single-reducer ROW_NUMBER the
    * oracle uses), and the fit itself is one scalar aggregate.
    */
  def zipfFit(spark: SparkSession, d: String): DataFrame =
    zipfFitOf(Tables.documents(spark, d))

  private[graft] def zipfFitOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val dec = "decimal(38,0)"
    val counts = docs
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
    val ranked = graft.operators.GlobalIndex.withRowNumber(
      counts, Seq(col("cnt").desc, col("token")), "rank")
    ranked
      .select($"cnt",
        expr("CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT)")
          .as("x"),
        expr("CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT)")
          .as("y"))
      .agg(count(lit(1)).as("n"), sum($"cnt").as("occ"),
        sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
        sum(($"x" * $"y").cast(dec)).as("sxy"),
        sum(($"x" * $"x").cast(dec)).as("sxx"))
      .select($"n", $"occ", $"sx", $"sy",
        expr("((sx * sy - n * sxy) * 1000000)" +
          " div (n * sxx - sx * sx)").as("sneg"))
      .select($"n".as("n_vocab"), $"occ".as("n_occurrences"),
        (-$"sneg").cast("bigint").as("slope_q6"),
        // sy is q6 and sneg·sx is q12: scale sy up, then the n·10⁶
        // divisor lands the intercept back in q6
        expr("CAST((sy * 1000000 + sneg * sx) div (n * 1000000)" +
          " AS BIGINT)").as("intercept_q6"))
  }

  /** Code-switching screen — [[langId]] applied to the document's
    * THIRDS: a doc whose windows classify to different languages is
    * mixed-language (concatenated boilerplate, scraped navigation, a
    * quoted translation) and poisons monolingual training mixes even
    * though its whole-doc vote looks clean. Windows cut by the exact
    * integer thirds `(w·n div 3, (w+1)·n div 3]` — the q176 arithmetic
    * partition, so both engines slice identically; each window runs
    * the SAME stopword-profile vote and deterministic tie-break chain
    * as q30.
    *
    * Scale shape: map-only — slices, filters, and the vote are
    * per-row array ops; the only shuffle is the presentation sort.
    */
  def codeSwitch(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val profiles = Seq(
      "de" -> Seq("der", "die", "und"),
      "en" -> Seq("the", "a", "is"),
      "es" -> Seq("el", "la", "y"),
      "fr" -> Seq("le", "la", "et"))
    val toks = split($"text", " ")
    val n = size(toks)
    def window(w: Int): Column = {
      val start = expr(s"($w * n_toks) div 3 + 1")
      val len = expr(s"(${w + 1} * n_toks) div 3 - ($w * n_toks) div 3")
      slice($"toks", start, len)
    }
    def vote(win: Column): Column = {
      val Seq(de, en, es, fr) = profiles.map { case (_, ws) =>
        size(filter(win, t => t.isin(ws: _*)))
      }
      when(de >= en && de >= es && de >= fr, "de")
        .when(en >= es && en >= fr, "en")
        .when(es >= fr, "es")
        .otherwise("fr")
    }
    Tables.documents(spark, d)
      .select($"doc_id", $"lang", $"text")
      // compute-width fan-out: the three window votes off the one-split
      // scan ran serially (the q179 pin)
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select($"doc_id", $"lang", toks.as("toks"), n.as("n_toks"))
      .filter($"n_toks" >= 3)
      .select($"doc_id", $"lang",
        vote(window(0)).as("l1"), vote(window(1)).as("l2"),
        vote(window(2)).as("l3"))
      .withColumn("n_langs",
        size(array_distinct(array($"l1", $"l2", $"l3"))).cast("long"))
      .orderBy($"doc_id")
  }

  /** Good–Turing count-of-counts table — the frequency-of-frequency
    * profile and the GT-discounted adjusted count r* = (r+1)·n_{r+1}/n_r
    * that language-model smoothing (Katz, simple Good–Turing) starts
    * from, built over token BIGRAMS (the unigram vocabulary here is
    * closed, so only the pair spectrum has a populated low-count head).
    *
    * Scale shape: one bigram-keyed partial-agg shuffle builds the pair
    * frequencies (q103's adjacent-pair explode with map-side combine),
    * then the count-of-counts rollup keys on the FREQUENCY, whose
    * domain is tiny (≤ distinct observed counts); the r+1 lookup is a
    * self-join of that bounded frame, and the output is the SMALLEST
    * `headK` observed counts — the smoothing head where GT estimates
    * are used, bounded at any corpus size (an absolute `r ≤ k` clip
    * empties as counts inflate with the data). `rstar_q6` is one
    * truncating divide of positives, DECIMAL-staged (n_r·r·10⁹ tops
    * int64 once n_r ~ 10⁹); an empty r+1 bucket keeps NULL r* on both
    * engines (left join).
    */
  def goodTuring(spark: SparkSession, d: String,
                 headK: Int = 20): DataFrame = {
    import spark.implicits._
    val freqs = Tables.documents(spark, d)
      .select(expr("filter(split(text, ' '), t -> t != '')").as("toks"))
      .filter(size($"toks") >= 2)
      .select(explode(
        expr("""transform(sequence(1, size(toks) - 1),
                 i -> struct(toks[i-1] AS w1, toks[i] AS w2))"""))
        .as("b"))
      .groupBy($"b.w1", $"b.w2").agg(count(lit(1)).as("r"))
    val coc = freqs.groupBy($"r").agg(count(lit(1)).as("n_r"))
    val tot = coc.agg(sum($"r" * $"n_r").as("n_tokens"))
    coc.orderBy($"r".asc).limit(headK)
      .join(coc.select(($"r" - 1L).as("r"), $"n_r".as("n_r1")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select($"r", $"n_r", $"n_r1",
        expr("CAST(CAST(n_r1 AS DECIMAL(38,0)) * (r + 1) * 1000000" +
          " div n_r AS BIGINT)").as("rstar_q6"),
        expr("CAST(CAST(n_r AS DECIMAL(38,0)) * r * 1000000000" +
          " div n_tokens AS BIGINT)").as("mass_q9"))
      .orderBy($"r")
  }

  /** Compression-ratio quality screen — per document, the DEFLATE
    * size over the raw byte size ([[graft.functions.DeflateSize]]):
    * the compressor-as-quality-model trick large-corpus curation
    * uses instead of hand-tuned n-gram repetition rules, because a
    * general compressor catches EVERY kind of redundancy (repeated
    * lines, templated spans, boilerplate) at once. Low ratios flag
    * repetitive/templated docs, ratios near 1 flag noise — both
    * tails are drop candidates. [[repetition]] (q62) counts one
    * fixed redundancy (2-gram dups); this measures all of them.
    *
    * Scale shape: MAP-ONLY — one native expression per row, no
    * shuffle before the presentation sort; exactly the per-document
    * scoring pass shape every quality gate in this engine uses.
    * Spec-verified (no SQL twin exists for DEFLATE): determinism,
    * and the repetitive < diverse < noise ratio ordering.
    */
  def compressionQuality(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    Tables.documents(spark, d)
      .select($"doc_id", $"source",
        length($"text").cast("long").as("n_bytes"),
        Bridge.column(graft.functions.DeflateSize(
          Bridge.expression($"text"))).cast("long").as("z_bytes"))
      .select($"doc_id", $"source", $"n_bytes", $"z_bytes",
        r4($"z_bytes".cast("double") / $"n_bytes").as("ratio"))
      .orderBy($"doc_id")
  }

  /** Duplicate-4-gram compressibility proxy — per document, the
    * fraction of its character-4-gram windows that are repeats
    * (1 − distinct/total, q6): the deterministic, SQL-expressible
    * stand-in for the DEFLATE screen above, and the standard
    * "duplicated n-gram fraction" quality signal large-corpus
    * curation gates on. High dup4 ⇒ templated/repetitive text, the
    * same tail [[compressionQuality]]'s low ratios flag — but every
    * number here is exact integer arithmetic, so the DuckDB oracle
    * hash-matches (no SQL DEFLATE exists; the real compressor
    * remains the spec-verified gear).
    *
    * Scale shape: MAP-ONLY — each row computes its own distinct-gram
    * count in place via the native
    * [[graft.functions.DistinctCharGrams]] expression (one fused
    * sliding-window loop per row — semantically identical to the
    * `size(array_distinct(transform(sequence(...))))` HOF pipeline it
    * replaced, which the round-12 verdict measured at 4.3 s of
    * interpreted expression-tree evaluation; state per row is bounded
    * by the document's own size, exactly like holding the text), so
    * there is NO explode, NO shuffle, and no join before the
    * presentation sort — the per-document scoring shape every quality
    * gate here uses. Docs shorter than 4 chars keep a row (uniq4 = 0,
    * ratio NULL) — the cell-completeness lesson.
    */
  def dupGramCompressibility(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    Tables.documents(spark, d)
      .select($"doc_id", $"source",
        length($"text").cast("long").as("n_chars"), $"text")
      .select($"doc_id", $"source", $"n_chars",
        greatest($"n_chars" - 3, lit(0L)).as("n4"),
        when($"n_chars" >= 4, Bridge.column(
          graft.functions.DistinctCharGrams(
            Bridge.expression($"text"), 4)).cast("long"))
          .otherwise(lit(0L)).as("uniq4"))
      .select($"doc_id", $"source", $"n_chars", $"n4", $"uniq4",
        when($"n4" > 0,
          expr("CAST((n4 - uniq4) * 1000000 div n4 AS BIGINT)"))
          .as("dup4_q6"))
      .orderBy($"doc_id")
  }

  /** FORCAST readability per source — the one classic readability
    * formula that needs NO sentence segmentation (it was built for
    * forms and technical fragments): grade = 20 − N_mono/10 per 150
    * words, where N_mono is the monosyllabic-word count. Exactly
    * right for a corpus without punctuation, where a Flesch-style
    * words-per-sentence term would be undefined. Syllables are the
    * standard vowel-group proxy (runs of [aeiou] — one regexp count,
    * no dictionary), the same heuristic every readability library
    * ships.
    *
    * Exactness: pooled per source — grade_q6 = 20·10⁶ −
    * (N_mono·150·10⁶ div W) div 10, pure integer arithmetic with one
    * positive div; mean word length as a q6 rational. Scale shape:
    * tokenize-explode + ONE map-side-combinable groupBy(source) —
    * no joins, no windows, nothing driver-side.
    */
  def forcastReadability(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"source", explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
      .select($"source", length($"tok").cast("long").as("len"),
        (size(expr("regexp_extract_all(tok, '[aeiou]+', 0)")) === 1)
          .cast("long").as("mono"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_words"),
        sum($"mono").as("n_mono"),
        sum($"len").as("sum_len"))
      .select($"source", $"n_words", $"n_mono",
        expr("CAST(sum_len * 1000000 div n_words AS BIGINT)")
          .as("mean_wordlen_q6"),
        expr("CAST(20000000 - (n_mono * 150000000 div n_words) div 10" +
          " AS BIGINT)").as("forcast_grade_q6"))
      .orderBy($"source")
  }

  /** MATTR — moving-average type-token ratio at window w = 25: the
    * lexical-diversity score that, unlike raw TTR, does not collapse
    * with document length (TTR falls as length grows because types
    * saturate while tokens keep counting; averaging the ratio over a
    * FIXED window removes the length confound, which is why MATTR is
    * the form corpus-quality filters actually use). Per document:
    * mean over all n−w+1 sliding windows of
    * |distinct(toks[i..i+w−1])| / w, reported as the exact integer
    * ratio Σ distinct-counts ·10⁶ div (w · n_windows).
    *
    * Scale shape: entirely map-side — one higher-order-function pass
    * per document (O(tokens·w) integer work inside the row, no
    * explode, no shuffle beyond the final ORDER BY); short documents
    * (< w tokens) are excluded, the standard MATTR convention.
    */
  def mattr(spark: SparkSession, d: String, w: Int = 25): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", $"lang", $"text")
      // compute-width fan-out: the documents scan is ONE small split,
      // so this lane's per-row text kernel ran serially; round-robin
      // the pruned rows across the session width first (the q179 pin)
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select($"doc_id", $"lang", split($"text", " ").as("toks"))
      .filter(size($"toks") >= w)
      .select($"doc_id", $"lang", size($"toks").cast("long").as("n_toks"),
        expr(s"transform(sequence(1, size(toks) - ${w - 1}), i -> " +
          s"size(array_distinct(slice(toks, i, $w))))").as("dw"))
      .select($"doc_id", $"lang", $"n_toks",
        size($"dw").cast("long").as("n_windows"),
        expr("aggregate(dw, CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("sum_types"))
      .select($"doc_id", $"lang", $"n_toks", $"n_windows", $"sum_types",
        expr(s"CAST(sum_types * 1000000 div ($w * n_windows) AS BIGINT)")
          .as("mattr_q6"))
      .orderBy($"doc_id")
  }
}
