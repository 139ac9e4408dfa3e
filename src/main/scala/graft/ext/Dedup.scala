package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators over the `documents` table — the
  * training-data-pipeline extension surface (SURVEY.md §2.11).
  *
  * Four tiers, cheapest to most robust:
  *  1. exact dedup (hash groupBy on the full text),
  *  2. content-hash dedup (sha2-256, the form that scales to a
  *     follow-up join against a bloom/registry),
  *  3. blocked n-gram Jaccard (equal-length blocking inside language,
  *     then pairwise shingle overlap),
  *  4. MinHash + LSH banding (the 100 TB path: candidate pairs come
  *     from an equi-join on band keys — no quadratic pair enumeration
  *     anywhere; the band join shuffles on the band key exactly like
  *     any other distributed join).
  *  5. SimHash (per-doc 16-bit signature; near-dups differ in ≤k bits).
  *
  * Every hash is a polynomial char fold mod 2^31-1, chosen because both
  * Spark and DuckDB can evaluate it exactly (higher-order functions on
  * both sides), making even the LSH pipeline oracle-verifiable.
  */
object Dedup {
  private def r4(c: Column): Column = graft.Num.r4(c)

  /** Modulus for all polynomial hashes (2^31 - 1, prime). */
  val P = 2147483647L
  /** MinHash permutation params: h_i(x) = (a_i * x + b_i) mod P. */
  val NumHashes = 16
  val BandSize = 4 // 4 bands x 4 rows
  def hashA(i: Int): Long = 2L * i + 3
  def hashB(i: Int): Long = 97L + 31 * i

  /** Distinct polynomial hashes of 3-token shingles. MinHash runs on
    * shingles, not tokens: with a small shared vocabulary the token
    * *sets* of unrelated documents overlap heavily, while the shingle
    * space is combinatorial — signatures only collide for genuinely
    * similar text.
    *
    * Backed by the native [[graft.functions.ShingleHash]] expression
    * (one fused loop per row) — the equivalent HOF pipeline spent
    * seconds per query interpreting per-char lambda nodes.
    */
  private[ext] def shingleHashes(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.ShingleHash(Bridge.expression(c)))
  }

  /** Exact dedup: keep the smallest doc_id per identical text
    * (dropDuplicates semantics made deterministic). One hash-aggregate
    * shuffle on the text; at scale you'd group on sha2(text) instead to
    * shuffle 32 bytes, not whole documents — that variant is
    * [[hashDedup]].
    */
  def exactDedup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .groupBy($"text")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies", length($"text").as("text_len"))
      .orderBy($"keep_id")
  }

  /** Content-hash dedup: sha2-256 fingerprint, grouped. The shuffle
    * carries 64 hex chars per row regardless of document size.
    */
  def hashDedup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", sha2($"text", 256).as("content_hash"))
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  /** Blocked n-gram Jaccard near-dup: candidate pairs share
    * (lang, token_count) — an equi-join blocking key, so the pair space
    * is per-block quadratic, not global — then 3-gram shingle Jaccard
    * filters real near-dups. Blocking on exact length is the classic
    * cheap blocker for near-identical documents.
    */
  def ngramJaccard(spark: SparkSession, d: String): DataFrame =
    ngramJaccardFrames(Tables.documents(spark, d))

  /** Frame-based core of [[ngramJaccard]] — exercised on planted
    * near-dup fixtures by RecallSpec to quantify what exact-length
    * blocking trades away. */
  private[graft] def ngramJaccardFrames(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // Jaccard over shingle *hashes* (not shingle strings): same native
    // ShingleHash expression as the LSH path, and array_intersect over
    // longs beats set ops over ~30-char strings.
    // docs with <3 tokens have no shingles: jaccard would be 0/0 —
    // exclude them on both engines (oracle has the same predicate)
    val sh = docs
      // compute-width fan-out: shingling off the one-split scan ran
      // serially (the q179 pin)
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .select($"doc_id", $"lang", size(split($"text", " ")).as("n_toks"),
        shingleHashes($"text").as("shingles"))
      .filter($"n_toks" >= 3)
    val a = sh.select($"doc_id".as("a_id"), $"lang", $"n_toks", $"shingles".as("a_sh"))
    val b = sh.select($"doc_id".as("b_id"), $"lang", $"n_toks", $"shingles".as("b_sh"))
    val inter = size(array_intersect($"a_sh", $"b_sh"))
    val uni = size($"a_sh") + size($"b_sh") - inter
    a.join(b, Seq("lang", "n_toks"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id", $"lang",
        r4(inter.cast("double") / uni).as("jaccard"))
      .filter($"jaccard" >= 0.01)
      .orderBy($"a_id", $"b_id")
  }

  /** Sorted-neighborhood candidate generation + exact verify — the
    * third classic blocking scheme next to equal-length blocking
    * ([[ngramJaccard]]) and LSH banding ([[minhashLsh]]): sort the
    * corpus by a domain key (here the normalized text prefix), and
    * compare each record only to its `w` successors in that order.
    * Near-duplicates that share a prefix land adjacent and get
    * verified; the pair space is N·w, never N². The operator reports
    * every window candidate with its exact shingle Jaccard (as
    * integer q6 — inter·10⁶ div union, both operands non-negative so
    * div semantics agree) and leaves thresholding to the consumer —
    * candidate generation and policy are separate stages in a real
    * dedup pipeline.
    *
    * Scale shape: the global sort rank rides
    * [[graft.operators.GlobalIndex]] (range-partitioned two-pass
    * numbering), and the neighbor pairing is an EQUI-join on the rank
    * bucket `rank div w` — each right row also registers under the
    * preceding bucket, so every (i, j) with 0 < j−i ≤ w meets in
    * exactly one bucket and the join shuffles N·2 rows instead of
    * running the oracle's rank range-join (which Spark would execute
    * as a broadcast nested loop). No window functions anywhere.
    */
  def sortedNeighborhood(spark: SparkSession, d: String,
                         w: Int = 3): DataFrame =
    sortedNeighborhoodOf(Tables.documents(spark, d), w)

  private[graft] def sortedNeighborhoodOf(docs: DataFrame,
                                          w: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val keyed = docs
      .select($"doc_id",
        regexp_replace(lower($"text"), "[^a-z0-9]", "")
          .substr(1, 16).as("skey"),
        shingleHashes($"text").as("sh"))
      .filter(size($"sh") > 0) // <3-token docs: no shingles, 0/0 sim
    val ranked = graft.operators.GlobalIndex.withRowNumber(
      keyed, Seq(col("skey"), col("doc_id")), "rank")
    val left = ranked.select($"doc_id".as("a_id"), $"rank".as("ra"),
      $"sh".as("a_sh"), expr(s"rank div $w").as("bkt"))
    val right = ranked.select($"doc_id".as("b_id"), $"rank".as("rb"),
      $"sh".as("b_sh"), expr(s"rank div $w").as("bkt"))
    val rkeys = right
      .unionAll(right.withColumn("bkt", $"bkt" - 1))
    val inter = size(array_intersect($"a_sh", $"b_sh")).cast("long")
    val uni = size($"a_sh").cast("long") + size($"b_sh") - inter
    left.join(rkeys, "bkt")
      .filter($"rb" > $"ra" && $"rb" - $"ra" <= w)
      .select($"a_id", $"b_id", ($"rb" - $"ra").as("rank_gap"),
        inter.as("i"), uni.as("u"))
      // integer division, not `/` (which round-trips through double)
      .select($"a_id", $"b_id", $"rank_gap",
        expr("(i * 1000000) div u").as("sim_q6"))
      .orderBy($"a_id", $"b_id")
  }

  /** MinHash + LSH banding — the scale path for near-dup detection:
    * 16 min-hashes per doc, grouped into 4 bands of 4; docs sharing any
    * band key become candidate pairs via a plain equi-join on
    * (band_idx, band_key). Candidates are then verified with exact
    * Jaccard over the token-hash sets. No step enumerates the global
    * pair space.
    */
  /** Per-doc shingle-hash sets eligible for LSH. Short docs (<3
    * tokens) have empty shingle sets: every signature would be null
    * and all their band keys would collapse to the same value,
    * degenerating the band join into a cross product of all short docs
    * (and 0/0 jaccard downstream). Exclude them; exact dedup (q24/q25)
    * is the right tool for degenerate-length text.
    */
  private def hashSets(spark: SparkSession, d: String): DataFrame =
    // registry-cached: the shingle-hash arrays are the shared upstream
    // of the banding (via sharedPairs), the q27/q209 re-attach joins,
    // and the measured broadcast gate below — one materialization per
    // session instead of re-hashing the corpus per query, and the
    // gate's entry count becomes a cache scan
    graft.Derived.frame(s"lsh-hashsets:$d")(
      hashSetsOf(Tables.documents(spark, d)))

  /** Broadcast budget for the per-doc shingle-hash re-attach joins, in
    * HASH ENTRIES (the arrays dominate the payload): 10M longs ≈ 80 MB
    * serialized — the [[graft.ext.Graph.BroadcastAdjMaxEntries]]
    * envelope. MEASURED against the Derived-cached hash-set frame (one
    * cache scan) because a pinned hint never auto-degrades: an
    * unconditional broadcast of a 10⁹-doc corpus's shingle arrays OOMs
    * the driver. Above the budget the re-attach degrades to a
    * doc_id-keyed shuffle join — the candidate set is already
    * id-keyed, so no wider exchange appears.
    */
  val BroadcastShingleMaxEntries = 10000000L

  /** Broadcast budget for cluster-membership frames (ids only):
    * bounded by docs that appear in candidate pairs — tiny relative
    * to the corpus by LSH construction, but an adversarial corpus
    * (everything duplicated) makes it corpus-sized, so it is measured,
    * never assumed. */
  val BroadcastClusterMaxRows = 10000000L

  private def shingleEntries(d: String, hs: DataFrame): Long =
    // session-memoized: input-derived, so the measuring job runs once
    // per dir — bench passes 2..n read the memo
    graft.Derived.scalar(s"shingle-entries:$d") {
      import hs.sparkSession.implicits._
      hs.agg(coalesce(sum(size($"hashes")), lit(0)).cast("long")).head.getLong(0)
    }

  private[graft] def hashSetsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", shingleHashes($"text").as("hashes"))
      .filter(size($"hashes") > 0)
  }

  /** (doc_id, band_idx, band_key) rows — the LSH banding shared by the
    * batch candidate join and the streaming near-dup state operator
    * ([[graft.streaming.DocStream]]): narrow ops only, so it runs
    * identically over a batch or streaming frame. */
  private[graft] def bandedKeys(hs: DataFrame): DataFrame = {
    import hs.sparkSession.implicits._
    val sigs = (0 until NumHashes).map { i =>
      array_min(transform($"hashes", h => (h * hashA(i) + hashB(i)) % P)).as(s"s$i")
    }
    val withSig = hs.select(($"doc_id" +: sigs): _*)
    val bands = (0 until NumHashes / BandSize).map { j =>
      concat_ws("-", (0 until BandSize).map(k => col(s"s${j * BandSize + k}")): _*)
    }
    withSig.select($"doc_id", posexplode(array(bands: _*)).as(Seq("band_idx", "band_key")))
  }

  /** LSH candidate pairs (a_id < b_id): docs sharing any band key.
    * The band join carries only (doc_id, band_idx, band_key) — never
    * the hash arrays; shuffling/deduping ~100-element arrays through
    * the candidate join dominated the runtime before.
    *
    * No persist here: callers that want the materialized shared copy
    * go through [[sharedPairs]] (the [[graft.Derived]] registry,
    * which owns an explicit unpersist lifecycle — an anonymous cached
    * block inside a lazily-returned DataFrame could never be freed).
    */
  private[graft] def candidatePairs(hs: DataFrame): DataFrame = {
    import hs.sparkSession.implicits._
    val banded = bandedKeys(hs)
    banded.select($"doc_id".as("a_id"), $"band_idx", $"band_key")
      .join(banded.select($"doc_id".as("b_id"), $"band_idx", $"band_key"),
            Seq("band_idx", "band_key"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
  }

  /** [[candidatePairs]] over the corpus at `d`, materialized once per
    * session via [[graft.Derived]] — the pair graph is the shared
    * upstream of q27 (jaccard scoring), q54 (cluster resolution), and
    * q85 (survivor materialization), and it is tiny (ids only)
    * relative to the work that derives it.
    */
  private def sharedPairs(spark: SparkSession, d: String): DataFrame =
    graft.Derived.frame(s"lsh-candidate-pairs:$d")(
      candidatePairs(hashSets(spark, d)))

  def minhashLsh(spark: SparkSession, d: String,
                 maxBroadcastEntries: Long = BroadcastShingleMaxEntries): DataFrame = {
    import spark.implicits._
    val hs = hashSets(spark, d)
    // Arrays are attached only after the distinct — broadcast under
    // the measured entry gate, doc_id-keyed shuffle join above it.
    val fits = shingleEntries(d, hs) <= maxBroadcastEntries
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    val withH = sharedPairs(spark, d)
      .join(hinted(hs.select($"doc_id".as("a_id"), $"hashes".as("a_h"))), "a_id")
      .join(hinted(hs.select($"doc_id".as("b_id"), $"hashes".as("b_h"))), "b_id")
    val inter = size(array_intersect($"a_h", $"b_h"))
    val uni = size($"a_h") + size($"b_h") - inter
    withH.select($"a_id", $"b_id", r4(inter.cast("double") / uni).as("jaccard"))
      .orderBy($"a_id", $"b_id")
  }

  /** DIRECTED containment scoring over the LSH candidates — the
    * asymmetric complement of [[minhashLsh]]'s Jaccard: a short quote
    * inside a long document scores near-zero Jaccard (the union is
    * huge) but containment |A∩B|/|A| ≈ 1 from the quote's side, which
    * is exactly the quote/boilerplate/partial-copy signal a curation
    * pipeline needs next to symmetric near-dup. Both directions are
    * reported per pair as positive q6 integer divisions — exactly
    * hash-verifiable.
    *
    * Scale shape: rides the SAME shared banded candidate set and
    * per-doc shingle sets as q27/q54/q85 (Derived registry — one
    * materialization serves all four), never all-pairs. Stated recall
    * caveat: minhash banding targets symmetric Jaccard, so extreme
    * short-in-long containments can miss the band collision — the
    * winnowing fingerprints (q33) are the high-recall path for those;
    * this operator scores the candidate set it is given.
    */
  def containment(spark: SparkSession, d: String,
                  maxBroadcastEntries: Long = BroadcastShingleMaxEntries): DataFrame = {
    import spark.implicits._
    val hs = hashSets(spark, d)
    // same measured re-attach gate as [[minhashLsh]]
    val fits = shingleEntries(d, hs) <= maxBroadcastEntries
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    sharedPairs(spark, d)
      .join(hinted(hs.select($"doc_id".as("a_id"), $"hashes".as("a_h"))), "a_id")
      .join(hinted(hs.select($"doc_id".as("b_id"), $"hashes".as("b_h"))), "b_id")
      .select($"a_id", $"b_id",
        size(array_intersect($"a_h", $"b_h")).cast("long").as("n_inter"),
        size($"a_h").cast("long").as("na"),
        size($"b_h").cast("long").as("nb"))
      .select($"a_id", $"b_id", $"n_inter",
        expr("CAST(n_inter * 1000000 div na AS BIGINT)").as("cont_a_q6"),
        expr("CAST(n_inter * 1000000 div nb AS BIGINT)").as("cont_b_q6"))
      .orderBy($"a_id", $"b_id")
  }

  /** Longest duplicated token span per LSH candidate pair — the
    * exact-substring dedup signal (Lee et al. 2022's "Deduplicating
    * Training Data" cuts repeated SPANS, not whole documents; a long
    * verbatim run shared by two docs is memorization fuel even when
    * their overall Jaccard is low). For each candidate pair the span
    * is recovered from POSITIONAL 3-gram hashes: a matching 3-gram at
    * positions (pa, pb) extends a run along the diagonal pa−pb, so the
    * longest common token run is `k − 1 +` the longest consecutive-pa
    * island within a (pair, diagonal) group — the gaps-and-islands
    * `pa − ROW_NUMBER()` trick, exactly mirrored by the oracle.
    *
    * Scale shape: the positional explode is corpus-token-sized but
    * narrow (doc_id, pos, hash); matches come from TWO KEYED joins
    * (candidates ⋈ a-positions on doc id, then ⋈ b-positions on
    * (doc id, hash)) — never an all-pairs or hash-only join, so the
    * match set is bounded by the candidates' shared-shingle mass. The
    * island window partitions by (pair, diagonal) — many tiny groups,
    * no global sort. Within a diagonal, pb = pa − diag is determined,
    * so pa is unique and ROW_NUMBER's order is total — both engines
    * see the identical islands.
    */
  def longestDupSpan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // multiplicity-keeping ShingleHash preserves POSITIONAL order, so
    // posexplode yields (position, hash) directly from the fused
    // native kernel — the interpreted transform/aggregate lambda tree
    // this replaces re-hashed every position through ~100 HOF nodes
    // and was the whole query's hotspot (3.0 s → 1.2 s at sf0.1)
    import org.apache.spark.sql.graft.Bridge
    val pos = Tables.documents(spark, d)
      .select($"doc_id", Bridge.column(graft.functions.ShingleHash(
        Bridge.expression($"text"), 3, distinct = false)).as("hs"))
      .filter(size($"hs") > 0)
      .select($"doc_id", posexplode($"hs").as(Seq("p", "h")))
    val m = sharedPairs(spark, d)
      .join(pos.select($"doc_id".as("a_id"), $"p".as("pa"), $"h"), "a_id")
      .join(pos.select($"doc_id".as("b_id"), $"p".as("pb"), $"h"),
        Seq("b_id", "h"))
      .select($"a_id", $"b_id", ($"pa" - $"pb").as("diag"), $"pa")
    val isle = $"pa" - row_number().over(
      Window.partitionBy($"a_id", $"b_id", $"diag").orderBy($"pa"))
    m.withColumn("isle", isle)
      .groupBy($"a_id", $"b_id", $"diag", $"isle")
      .agg(count(lit(1)).as("run"))
      .groupBy($"a_id", $"b_id")
      .agg((max($"run") + 2).as("span_tokens"))
      .orderBy($"a_id", $"b_id")
  }

  /** Cross-source duplication matrix — "which crawls copy which": the
    * per-source-pair census of near-duplicate pairs, the provenance
    * signal a curation pipeline reads before deciding which source to
    * keep when dup clusters straddle feeds (mirror detection, syndication
    * mapping, licensing triage). Pairs come from the SAME shared LSH
    * candidate set as q27/q54 and verify by integer q6 Jaccard
    * (`10⁶·|a∩b| div |a∪b|` — exact on both engines); the source pair
    * is normalized (least, greatest) so the matrix is one triangle.
    *
    * Scale shape: candidate-bounded verification (never all-pairs),
    * then TWO doc_id-keyed joins attach the sources — unhinted, so
    * AQE sizes them (the corpus-sized doc→source frame must never be
    * a pinned broadcast), and one census aggregate over the
    * source-pair domain closes.
    */
  def crossSourceDups(spark: SparkSession, d: String,
                      minJacQ6: Long = 500000L,
                      maxBroadcastEntries: Long = BroadcastShingleMaxEntries): DataFrame = {
    import spark.implicits._
    val hs = hashSets(spark, d)
    val fits = shingleEntries(d, hs) <= maxBroadcastEntries
    def hinted(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    val src = Tables.documents(spark, d).select($"doc_id", $"source")
    val inter = size(array_intersect($"a_h", $"b_h")).cast("long")
    val uni = (size($"a_h") + size($"b_h")).cast("long") - inter
    sharedPairs(spark, d)
      .join(hinted(hs.select($"doc_id".as("a_id"), $"hashes".as("a_h"))), "a_id")
      .join(hinted(hs.select($"doc_id".as("b_id"), $"hashes".as("b_h"))), "b_id")
      .select($"a_id", $"b_id", inter.as("n_inter"), uni.as("n_uni"))
      .select($"a_id", $"b_id",
        expr("CAST(n_inter * 1000000 div n_uni AS BIGINT)").as("jac_q6"))
      .filter($"jac_q6" >= minJacQ6)
      .join(src.select($"doc_id".as("a_id"), $"source".as("src_a")), "a_id")
      .join(src.select($"doc_id".as("b_id"), $"source".as("src_b")), "b_id")
      .select(least($"src_a", $"src_b").as("source_a"),
        greatest($"src_a", $"src_b").as("source_b"), $"jac_q6")
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_pairs"), sum($"jac_q6").as("sum_jac_q6"))
      .orderBy($"source_a", $"source_b")
  }

  /** Duplicate-cluster resolution: connected components over the LSH
    * candidate pairs, labels = smallest doc_id reachable. Iterative
    * min-label propagation — each round is one join + aggregate, the
    * driver only checks a convergence count (#iterations ≈ component
    * diameter, tiny for dup clusters). The full dedup story:
    * [[minhashLsh]] finds the edges at scale, this collapses them into
    * keep/drop groups.
    */
  /** Edge-count threshold below which cluster resolution runs as a
    * driver-side union-find: LSH candidate graphs are small relative
    * to the corpus by construction, and a few-MB edge list resolves in
    * microseconds on the driver versus several Spark jobs per
    * propagation round. Above the threshold the distributed
    * label-propagation loop takes over.
    */
  val DriverResolveMaxEdges = 1000000L

  /** Target edges per partition for the distributed label-propagation
    * path: each undirected edge is two 16-byte rows, so 2M edges/part
    * keeps a partition's working set in the tens of MB.
    */
  val EdgesPerPartition = 2000000L

  /** CLUSTER-SAFE train/val/test split — the leakage fix for a famous
    * eval bug: a per-document hash split puts near-duplicate documents
    * on BOTH sides of the train/test boundary, so the model is graded
    * on paraphrases of its training data. Here the split unit is the
    * near-dup CLUSTER: every document hashes by its component label
    * (`coalesce(cluster_id, doc_id)` — unclustered docs are their own
    * unit), so a whole duplicate family lands in one split by
    * construction. Same portable multiplicative hash and 90/5/5 cut
    * as the per-doc split (q170) — the ONLY change is the hash key,
    * which is exactly the point.
    *
    * Scale shape: the cluster labels ride the shared [[dupClusters]]
    * resolution (Derived-cached LSH candidates); the corpus pays one
    * left join against the clustered-doc frame (bounded by docs in
    * candidate pairs, tiny vs the corpus) and one map-side-combinable
    * census aggregate.
    */
  def clusterSafeSplit(spark: SparkSession, d: String,
                       maxBroadcastRows: Long = BroadcastClusterMaxRows): DataFrame = {
    import spark.implicits._
    val clusters = dupClusters(spark, d)
      .select($"doc_id", $"cluster_id")
    // measured gate (BroadcastClusterMaxRows): the membership frame is
    // USUALLY tiny, but only a count proves it — above the budget the
    // left join degrades to a doc_id-keyed shuffle
    val hinted =
      if (clusters.count() <= maxBroadcastRows) broadcast(clusters)
      else clusters
    Tables.documents(spark, d).select($"doc_id", $"lang")
      .join(hinted, Seq("doc_id"), "left")
      .select($"doc_id", $"lang",
        coalesce($"cluster_id", $"doc_id").as("gid"))
      .withColumn("bucket",
        expr("(gid % 2147483647) * 2654435761 % 2147483647 % 100"))
      .withColumn("split",
        when($"bucket" < 90, "train").when($"bucket" < 95, "val")
          .otherwise("test"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("id_sum"))
      .orderBy($"split", $"lang")
  }

  def dupClusters(spark: SparkSession, d: String,
                  maxDriverEdges: Long = DriverResolveMaxEdges): DataFrame =
    // Cheap pair generation (no jaccard/hash arrays/global sort — the
    // oracle side shares its candidate CTE chain the same way).
    resolveClusters(sharedPairs(spark, d), maxDriverEdges)

  /** Connected components over ANY (a_id, b_id) edge frame — shared by
    * the text dup path ([[dupClusters]]) and the embedding SemDeDup
    * path ([[graft.ext.Similarity.semanticDedup]]): driver union-find
    * below the edge gate, distributed min-label propagation above it.
    */
  private[graft] def resolveClusters(edgeFrame: DataFrame,
      maxDriverEdges: Long = DriverResolveMaxEdges): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edgeFrame.sparkSession
    // A frame owned by the Derived registry arrives already cached —
    // leave its lifecycle alone (unpersisting it here would evict the
    // shared copy other queries rely on).
    val owned = edgeFrame.storageLevel == StorageLevel.NONE
    val pairs =
      if (owned) edgeFrame.persist(StorageLevel.MEMORY_AND_DISK)
      else edgeFrame
    val nEdges = pairs.count()
    val out =
      if (nEdges <= maxDriverEdges) driverUnionFind(spark, pairs)
      else propagateLabels(pairs, nEdges)
    if (owned) pairs.unpersist()
    out
  }

  /** Driver-side path: path-compressing union-find over a bounded,
    * collected edge list; labels = min id of the component. */
  private def driverUnionFind(spark: SparkSession, pairs: DataFrame): DataFrame = {
    import spark.implicits._
    val edgeList = pairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val ids = edgeList.iterator.flatMap(e => Iterator(e._1, e._2)).toSeq.distinct
    ids.map(id => (id, find(id))).toDF("doc_id", "cluster_id")
      .orderBy($"doc_id")
  }

  /** Distributed path: iterative min-label propagation with pointer
    * doubling; one join+aggregate round per iteration, driver sees
    * only a convergence count. */
  private[graft] def propagateLabels(pairs: DataFrame, nEdges: Long): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    // undirected edge list, both directions. persist + materialize so
    // each iteration reads the cache instead of re-deriving the LSH
    // join; superseded label frames are freed as soon as the next round
    // is materialized (no session-lifetime leak). The final labels
    // frame stays cached — it is bounded by the number of docs that
    // appear in candidate pairs (tiny relative to the corpus).
    // Partition count scales with the edge list (2 rows per undirected
    // edge), capped by the session shuffle parallelism: a billion-edge
    // near-dup graph spreads across the cluster, while a 100-row graph
    // avoids paying 32-partition scheduling overhead per iteration.
    val numParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      2 * nEdges / EdgesPerPartition)).toInt
    // partition by b_id — the key every iteration's join probes — so
    // the cached layout is reused instead of re-exchanged per round
    val edges = pairs.union(pairs.select($"b_id".as("a_id"), $"a_id".as("b_id")))
      .repartition(numParts, $"b_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select($"a_id".as("id")).distinct()
      .select($"id", $"id".as("label"))
      .repartition(numParts, $"id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    while (!converged) {
      val viaNeighbors = edges
        .join(labels.select($"id".as("b_id"), $"label"), "b_id")
        .groupBy($"a_id".as("id")).agg(min($"label").as("nlabel"))
      // pointer doubling: also adopt the label of one's current label —
      // component depth halves per round, so convergence is O(log n)
      // rounds instead of O(diameter), which also keeps the (analyzed)
      // plan depth small without checkpointing
      val viaParent = labels.select($"id".as("label"), $"label".as("plabel"))
      val next = labels
        .join(viaNeighbors, Seq("id"), "left")
        .join(viaParent, Seq("label"), "left")
        .select($"id", least($"label",
          coalesce($"nlabel", $"label"), coalesce($"plabel", $"label")).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.select($"id", $"label".as("old")), "id")
        .filter($"label" =!= $"old").count() // materializes `next`
      labels.unpersist()
      labels = next
      converged = changed == 0
    }
    edges.unpersist()
    labels.select($"id".as("doc_id"), $"label".as("cluster_id"))
      .orderBy($"doc_id")
  }

  /** Cross-document duplicated-shingle fraction — the scalable
    * stand-in for exact-substring dedup (the Lee et al. 2022
    * "Deduplicating Training Data" suffix-array pass): for each
    * document, the share of its distinct 3-token shingles that occur
    * in at least one other document. High fractions flag boilerplate
    * and templated spans that whole-document LSH similarity misses.
    *
    * Shape at scale: explode to (doc_id, hash) → count per hash →
    * join back → per-doc aggregate. Two shuffles on an 8-byte hash
    * key, partial aggregation on both groupBys, no pairwise document
    * comparison anywhere — linear in total corpus shingles.
    */
  def crossDocDup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ex = hashSets(spark, d).select($"doc_id", explode($"hashes").as("h"))
    // hashes are distinct per doc, so nd = #documents containing h
    val counts = ex.groupBy($"h").agg(count(lit(1)).as("nd"))
    ex.join(counts, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_shingles"),
           sum(when($"nd" >= 2, 1).otherwise(0)).cast("int").as("n_dup"))
      .select($"doc_id", $"n_shingles", $"n_dup",
        r4($"n_dup".cast("double") / $"n_shingles").as("dup_frac"))
      .orderBy($"doc_id")
  }

  /** Corpus materialization after near-dup resolution — the step that
    * actually APPLIES [[dupClusters]]: drop every document that sits in
    * an LSH duplicate cluster but is not its canonical (minimum-id)
    * member, then report the surviving corpus per language.
    *
    * The drop set is bounded by the docs that appear in candidate
    * pairs — tiny relative to the corpus by LSH construction — so it
    * broadcasts UNDER THE MEASURED [[BroadcastClusterMaxRows]] gate
    * (an adversarial everything-duplicated corpus makes it
    * corpus-sized; the count proves it, a hint never auto-degrades);
    * the corpus itself never shuffles under the gate: scan →
    * broadcast anti-join → partial agg. At 100 TB this is the shape
    * you want for "write the deduplicated corpus": the only wide op
    * is over the dup graph, never the data.
    */
  def dedupSurvivors(spark: SparkSession, d: String,
                     maxBroadcastRows: Long = BroadcastClusterMaxRows): DataFrame = {
    import spark.implicits._
    val drop = dupClusters(spark, d)
      .filter($"doc_id" =!= $"cluster_id").select($"doc_id")
    // measured gate, same rationale as [[clusterSafeSplit]]
    val hinted =
      if (drop.count() <= maxBroadcastRows) broadcast(drop) else drop
    Tables.documents(spark, d)
      .join(hinted, Seq("doc_id"), "left_anti")
      .groupBy($"lang")
      .agg(count(lit(1)).cast("int").as("n_docs"),
           sum($"n_chars").as("total_chars"))
      .orderBy($"lang")
  }

  /** SimHash: 16-bit signature — bit b is the sign of the sum of ±1
    * votes from each token hash's bit b. Near-dup docs have signatures
    * within small Hamming distance (pairing by signature bucket is then
    * an equi-join, like LSH).
    */
  def simhash(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    Tables.documents(spark, d)
      .select($"doc_id",
        Bridge.column(graft.functions.SimHash16(Bridge.expression($"text")))
          .as("simhash16"))
      .orderBy($"doc_id")
  }

  /** Exact set-similarity join with prefix filtering (SSJoin/PPJoin
    * family) — all document pairs whose token-set Jaccard ≥ 0.9,
    * found WITHOUT the all-pairs compare and WITHOUT the MinHash
    * probabilistic recall loss: under a global token order (rarest
    * first — ascending document frequency), two sets with J ≥ τ must
    * share a token within each one's first `n − ⌈τ·n⌉ + 1` tokens, so
    * an equi-join on prefix tokens alone yields a candidate superset,
    * and an exact `array_intersect` verify keeps the true pairs.
    *
    * Sets are per-token HASHES (the native [[graft.functions
    * .ShingleHash]] at n=1 — the same sets every other Jaccard op in
    * this engine uses): intersecting long arrays runs ~8× faster than
    * set ops over 30-char strings. Two further PPJoin levers make the
    * dup-heavy corpus tractable (measured at sf0.1: 8.8M → 1.7M
    * candidate rows, 230 s → seconds, recall bit-identical):
    *  - set-identical documents COLLAPSE to their min-id
    *    representative first (with a `members` count) — J=1 pairs
    *    inside an identical-set family are the exact-dedup product
    *    (q24/q25), not near-dup signal, and they alone contributed
    *    ~94% of the naive output here;
    *  - the length filter (0.9 ≤ |a|/|b| ≤ 1/0.9) and the POSITION
    *    filter (a match at sorted-order positions pa, pb caps the
    *    overlap at 1 + min(na−pa, nb−pb), which must still reach
    *    α = ⌈9(na+nb)/19⌉) prune before the distinct.
    *
    * Scale shape: the candidate join carries only prefix tokens —
    * ~n/10 of each set at τ=0.9, and the rarest ones, so hot tokens
    * (huge posting lists, the join-explosion risk) are systematically
    * excluded from the probe side; df attachment broadcasts under the
    * measured [[graft.ext.Corpus.BroadcastVocabMaxTerms]] gate (the
    * vocabulary aggregate grows with the corpus — the q71/q73
    * lesson), an h-keyed shuffle above it; the verify
    * join is keyed by doc id. The ranking window partitions by
    * doc_id — millions of tiny groups, never a global sort. This is
    * the deterministic sibling of [[minhashLsh]]: exact recall at
    * higher verify cost, the right tool when τ is high and misses
    * are expensive.
    *
    * The integer threshold `10·|a∩b| ≥ 9·|a∪b|` keeps the keep
    * decision exact on both engines; `jacc` itself is one IEEE
    * division of exact integers — bit-identical everywhere.
    */
  def setSimilarityJoin(spark: SparkSession, d: String,
      maxBroadcastTerms: Long = graft.ext.Corpus.BroadcastVocabMaxTerms): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.expressions.Window
    // referenced three times below (token explode + both verify
    // sides) — the collapsed-set aggregate lives in the Derived
    // registry under an input-derived key, so each reference (and
    // each repeat invocation in the same session — the 3-pass bench)
    // reads ONE cached copy instead of re-hashing the corpus or
    // accumulating a fresh persisted frame per call
    val sets = graft.Derived.frame(s"ppjoin-sets:$d") {
      Tables.documents(spark, d)
        .select($"doc_id",
          array_sort(Bridge.column(graft.functions.ShingleHash(
            Bridge.expression($"text"), n = 1))).as("l"))
        .withColumn("n", size($"l"))
        .filter($"n" > 0)
        .groupBy($"l", $"n")
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("members"))
    }
    val toks = sets.select($"doc_id", $"n", explode($"l").as("h"))
    // measured vocabulary gate for the df attachment (the q71/q73
    // lesson: a token-frequency table is vocabulary-sized, which
    // grows with the corpus): broadcast under the budget, h-keyed
    // shuffle join above it. One distinct-count over the cached sets
    // per invocation; the decision participates in the cache key.
    val fits = graft.Derived.scalar(s"ppjoin-terms:$d")(
      toks.select($"h").distinct().count()) <= maxBroadcastTerms
    // both sides of the candidate self-join — registry-cached for the
    // same reason as `sets`
    val prefix = graft.Derived.frame(s"ppjoin-prefix:$d:bc=$fits") {
      val df = toks.groupBy($"h").agg(count(lit(1)).as("df"))
      val dfHinted = if (fits) broadcast(df) else df
      val w = Window.partitionBy($"doc_id").orderBy($"df", $"h")
      toks.join(dfHinted, "h")
        .withColumn("rn", row_number().over(w))
        // prefix length n − ⌈0.9n⌉ + 1, with ⌈0.9n⌉ = ⌊(9n+9)/10⌋
        .filter($"rn" <= $"n" - expr("(9 * n + 9) div 10") + 1)
        .select($"h", $"doc_id", $"n", $"rn")
    }
    val cands = prefix.toDF("h", "doc_a", "na", "pa")
      .join(prefix.toDF("h", "doc_b", "nb", "pb"), "h")
      .filter($"doc_a" < $"doc_b" &&
        $"na" * 10 >= $"nb" * 9 && $"nb" * 10 >= $"na" * 9 &&
        lit(19) * (lit(1) + least($"na" - $"pa", $"nb" - $"pb")) >=
          lit(9) * ($"na" + $"nb"))
      .select($"doc_a", $"doc_b").distinct()
    // two-pointer merge over the sorted hash arrays (codegen'd native
    // kernel) — size(array_intersect(...)) builds a hash set + output
    // array per candidate pair and dominated the verify
    val inter = Bridge.column(graft.functions.SortedIntersectCount(
      Bridge.expression($"ta"), Bridge.expression($"tb"))).cast("bigint")
    cands
      .join(sets.select($"doc_id".as("doc_a"), $"l".as("ta"),
        $"n".cast("bigint").as("na"), $"members".as("members_a")), "doc_a")
      .join(sets.select($"doc_id".as("doc_b"), $"l".as("tb"),
        $"n".cast("bigint").as("nb"), $"members".as("members_b")), "doc_b")
      .withColumn("inter", inter)
      .filter($"inter" * 10 >= ($"na" + $"nb" - $"inter") * 9)
      .select($"doc_a", $"doc_b", $"inter", $"na", $"nb",
        $"members_a", $"members_b",
        ($"inter".cast("double") / ($"na" + $"nb" - $"inter")).as("jacc"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** q6-Jaccard-verified LSH pairs (a_id < b_id) — the confirmed
    * near-duplicate edge set downstream consumers share through the
    * registry (the scorecard's dup flag, [[deltaDedup]]'s novelty
    * screen). Candidate-bounded (shared LSH set), arrays attach
    * unhinted (AQE-sized, the q222 discipline). */
  private[ext] def verifiedPairs(spark: SparkSession, d: String,
                                 minJacQ6: Long = 500000L): DataFrame =
    graft.Derived.frame(s"lsh-verified-pairs:$d:$minJacQ6") {
      import spark.implicits._
      val hs = hashSets(spark, d)
      val inter = size(array_intersect($"a_h", $"b_h")).cast("long")
      val uni = (size($"a_h") + size($"b_h")).cast("long") - inter
      sharedPairs(spark, d)
        .join(hs.select($"doc_id".as("a_id"), $"hashes".as("a_h")), "a_id")
        .join(hs.select($"doc_id".as("b_id"), $"hashes".as("b_h")), "b_id")
        .select($"a_id", $"b_id", inter.as("ni"), uni.as("nu"))
        .filter(expr(s"ni * 1000000 div nu >= $minJacQ6"))
        .select($"a_id", $"b_id")
    }

  /** Distinct doc ids appearing in any q6-Jaccard-verified LSH pair —
    * the "has at least one near-duplicate" flag the per-source
    * scorecard ([[graft.ext.Corpus.sourceScorecard]]) censuses. */
  private[ext] def verifiedDupDocIds(spark: SparkSession, d: String,
                                     minJacQ6: Long = 500000L): DataFrame = {
    import spark.implicits._
    verifiedPairs(spark, d, minJacQ6)
      .select(explode(array($"a_id", $"b_id")).as("doc_id"))
      .distinct()
  }

  /** Incremental (delta-vs-base) dedup — the decision a CONTINUOUS
    * ingestion pipeline makes per new batch: docs `doc_id % 10 = 0`
    * play the incoming delta, the rest the already-accepted base.
    * A delta doc is accepted only if it has no verified near-dup
    * partner in the base AND none among delta docs that precede it
    * (smaller id — the arrival order within the batch), so accepting
    * the whole batch at once never admits two copies of the same
    * novel document.
    *
    * Scale shape: rides the registry-shared [[verifiedPairs]] edge
    * set — the delta never re-scans the base corpus; the partner
    * census is candidate-bounded (LSH-banded, never all-pairs) and
    * the classification is one agg over the symmetrized pair list.
    * This is the batch twin of the streaming near-dup state operator
    * ([[graft.streaming.DocStream]]).
    */
  def deltaDedup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val vp = verifiedPairs(spark, d)
    val sym = vp.select(explode(array(
        struct($"a_id".as("doc_id"), $"b_id".as("partner")),
        struct($"b_id".as("doc_id"), $"a_id".as("partner")))).as("p"))
      .select($"p.doc_id".as("doc_id"), $"p.partner".as("partner"))
    Tables.documents(spark, d).select($"doc_id")
      .filter($"doc_id" % 10 === 0)
      .join(sym, Seq("doc_id"), "left")
      .groupBy($"doc_id")
      .agg(
        sum(when($"partner" % 10 =!= 0, 1L).otherwise(0L))
          .as("n_base_dups"),
        sum(when($"partner" % 10 === 0 && $"partner" < $"doc_id", 1L)
          .otherwise(0L)).as("n_prior_delta_dups"))
      .withColumn("accept",
        ($"n_base_dups" === 0L && $"n_prior_delta_dups" === 0L)
          .cast("long"))
      .orderBy($"doc_id")
  }

  /** Fellegi–Sunter record-linkage scoring over the shared LSH
    * candidates — the probabilistic-linkage layer on top of the
    * similarity chain: for each candidate pair, per-field agreement
    * (language, source, length bucket) is weighted by
    * `log(m_f/u_f)` on agree and `log((1−m_f)/(1−u_f))` on
    * disagree, where m/u are the field's agreement rates among
    * matches / non-matches. m and u are estimated ON THIS CORPUS
    * from the verified-Jaccard labels ([[verifiedPairs]]) with
    * Laplace +1 smoothing (a field that never disagrees among
    * matches must not emit log 0).
    *
    * Exactness — the q177 LQ discipline: every weight is a
    * difference of `floor(ln(exact integer product)·10⁶)` values
    * (`m/u = (am+1)(nu+2) / (au+1)(nm+2)` — cross-multiplied so ln
    * only ever sees exact integers), and the pair score sums ≤ 3
    * already-quantized integers. Scale shape: the label and weight
    * estimation is ONE agg over the candidate-bounded pair set; the
    * six weight scalars re-attach as a broadcast one-row frame;
    * attributes attach by unhinted doc_id equi-joins (AQE-sized,
    * the q222 discipline). Never all-pairs.
    */
  def fellegiSunter(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val attrs = Tables.documents(spark, d)
      .select($"doc_id", $"lang", $"source",
        expr("n_chars div 100").as("lenb"))
    val labeled = sharedPairs(spark, d)
      .join(verifiedPairs(spark, d).withColumn("m", lit(1L)),
        Seq("a_id", "b_id"), "left")
      .withColumn("m", coalesce($"m", lit(0L)))
      .join(attrs.select($"doc_id".as("a_id"), $"lang".as("la"),
        $"source".as("sa"), $"lenb".as("ba")), "a_id")
      .join(attrs.select($"doc_id".as("b_id"), $"lang".as("lb"),
        $"source".as("sb"), $"lenb".as("bb")), "b_id")
      .select($"a_id", $"b_id", $"m",
        when($"la" === $"lb", 1L).otherwise(0L).as("fl"),
        when($"sa" === $"sb", 1L).otherwise(0L).as("fs"),
        when($"ba" === $"bb", 1L).otherwise(0L).as("fb"))
    val stats = labeled.agg(
      sum($"m").as("nm"), sum(lit(1L) - $"m").as("nu"),
      sum($"m" * $"fl").as("amL"), sum((lit(1L) - $"m") * $"fl").as("auL"),
      sum($"m" * $"fs").as("amS"), sum((lit(1L) - $"m") * $"fs").as("auS"),
      sum($"m" * $"fb").as("amB"), sum((lit(1L) - $"m") * $"fb").as("auB"))
    // LQ(i) = floor(ln(i)·10⁶) of an exact positive integer; weights
    // are LQ differences of the cross-multiplied smoothed rationals
    def lq(x: String): String =
      s"CAST(floor(ln(CAST(($x) AS DOUBLE)) * 1000000.0) AS BIGINT)"
    def wAgree(am: String, au: String): String =
      s"${lq(s"($am + 1) * (nu + 2)")} - ${lq(s"($au + 1) * (nm + 2)")}"
    def wDis(am: String, au: String): String =
      s"${lq(s"(nm + 1 - $am) * (nu + 2)")} - " +
        s"${lq(s"(nu + 1 - $au) * (nm + 2)")}"
    def term(f: String, am: String, au: String): String =
      s"CASE WHEN $f = 1 THEN ${wAgree(am, au)} ELSE ${wDis(am, au)} END"
    labeled.crossJoin(broadcast(stats))
      .select($"a_id", $"b_id", $"m".as("is_match"),
        $"fl", $"fs", $"fb",
        expr(s"${term("fl", "amL", "auL")} + ${term("fs", "amS", "auS")}" +
          s" + ${term("fb", "amB", "auB")}").as("fs_score_q6"))
      .orderBy($"a_id", $"b_id")
  }

  /** Edit-distance verification over the shared LSH candidates — the
    * character-level verify for the near-dup family: shingle Jaccard
    * is insertion/deletion-blind at the token level, Levenshtein
    * (native on both engines) measures the actual edit cost, so this
    * is the verifier fuzzy record-matching pipelines run after
    * blocking. Reported as the normalized similarity
    * `(maxlen − lev)·10⁶ div maxlen` — an exact integer rational.
    *
    * Scale shape: candidates come from the SAME registry-shared LSH
    * set as q27/q54/q85 (never all-pairs); the corpus-sized text
    * frame attaches by two unhinted doc_id equi-joins (AQE-sized,
    * the q222 discipline — never a pinned broadcast); and the O(n·m)
    * Levenshtein kernel runs ONLY on pairs surviving the ±10% length
    * prefilter — a length mismatch that large already bounds the
    * similarity below interest, so the quadratic work is skipped
    * map-side, before it happens.
    */
  def editDistanceVerify(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val txt = Tables.documents(spark, d)
      .select($"doc_id", $"text", length($"text").cast("long").as("len"))
    sharedPairs(spark, d)
      .join(txt.select($"doc_id".as("a_id"), $"text".as("ta"),
        $"len".as("la")), "a_id")
      .join(txt.select($"doc_id".as("b_id"), $"text".as("tb"),
        $"len".as("lb")), "b_id")
      // prune BEFORE the quadratic kernel: |la−lb| ≤ 10% of maxlen
      .filter(abs($"la" - $"lb") * 10 <= greatest($"la", $"lb"))
      .select($"a_id", $"b_id", $"la", $"lb",
        levenshtein($"ta", $"tb").cast("long").as("lev"))
      .select($"a_id", $"b_id", $"la", $"lb", $"lev",
        expr("CAST((greatest(la, lb) - lev) * 1000000" +
          " div greatest(la, lb) AS BIGINT)").as("sim_q6"))
      .orderBy($"a_id", $"b_id")
  }

  /** MinHash estimator calibration — the sketch-accuracy eval for the
    * LSH family: over the q26 equal-length block pairs, bucket pairs
    * by how many of the 16 minhash components AGREE and report the
    * mean EXACT Jaccard per bucket next to the estimator's expectation
    * m/16. The table answers "how biased is my 16-hash sketch on THIS
    * corpus" — the number that justifies (or indicts) the banding
    * thresholds q27/q54/q85 run on.
    *
    * Exactness: per-pair Jaccard is the integer rational
    * `inter·10⁶ div union` (shingle-hash sets, never strings);
    * component agreement is an integer count; the per-bucket mean
    * divides a sum of already-quantized q6 integers — everything
    * positive, div and // agree. Scale shape: the pair space is the
    * q26 blocking bound (per-block quadratic, never corpus-quadratic);
    * signatures are map-side array transforms; the final rollup is a
    * 17-row bucket domain.
    */
  def minhashCalibration(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, d)
      // compute-width fan-out: the documents scan is ONE small split,
      // so this lane's per-row text kernel ran serially; round-robin
      // the pruned rows across the session width first (the q179 pin)
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select($"doc_id", $"lang", size(split($"text", " ")).as("n_toks"),
        shingleHashes($"text").as("shingles"))
      .filter($"n_toks" >= 3)
      .select($"doc_id", $"lang", $"n_toks", $"shingles",
        array((0 until NumHashes).map(i =>
          array_min(transform($"shingles",
            h => (h * hashA(i) + hashB(i)) % P))): _*).as("sig"))
    val a = base.select($"doc_id".as("a_id"), $"lang", $"n_toks",
      $"shingles".as("a_sh"), $"sig".as("a_sig"))
    val b = base.select($"doc_id".as("b_id"), $"lang", $"n_toks",
      $"shingles".as("b_sh"), $"sig".as("b_sig"))
    a.join(b, Seq("lang", "n_toks"))
      .filter($"a_id" < $"b_id")
      .select(
        size(filter(zip_with($"a_sig", $"b_sig", (x, y) => x === y),
          x => x)).cast("long").as("m"),
        size(array_intersect($"a_sh", $"b_sh")).cast("long").as("inter"),
        (size($"a_sh") + size($"b_sh")).cast("long").as("sz"))
      .withColumn("jacc_q6",
        expr("CAST(inter * 1000000 div (sz - inter) AS BIGINT)"))
      .groupBy($"m")
      .agg(count(lit(1)).as("n_pairs"), sum($"jacc_q6").as("sj"))
      .select($"m", $"n_pairs",
        expr("CAST(sj div n_pairs AS BIGINT)").as("mean_jacc_q6"),
        expr("CAST(m * 1000000 div 16 AS BIGINT)").as("expected_q6"))
      .orderBy($"m")
  }

  /** Per-document shingle-novelty census — for every document, the
    * fraction of its distinct 3-token shingles that appear in ANY
    * other document: the corpus-wide memorization/boilerplate screen
    * that catches partial duplication (shared headers, templated
    * spans, quoted passages) pairwise Jaccard misses because no
    * single partner crosses a similarity floor. Dedup keeps the
    * novel; this measures HOW novel each survivor is.
    *
    * Scale shape — the inverted-index form: explode the
    * registry-shared `lsh-hashsets` frame (one hashing pass per
    * session, shared with the whole LSH family) into (doc, shingle)
    * rows, ONE map-side-combinable groupBy(shingle) census (distinct
    * hashes per doc by construction, so `count` is document
    * frequency), one keyed join back, one groupBy(doc) rollup —
    * three keyed shuffles of the shingle stream, no self-join, no
    * pair enumeration, nothing driver-side. The share is the single
    * positive rational `shared·10⁶ div total`: div and // agree.
    */
  /** Blocking-scheme quality audit — the two numbers that justify (or
    * indict) a candidate generator before anyone trusts its dedup:
    * REDUCTION RATIO (what fraction of the all-pairs space the
    * blocking never has to compare) and PAIRS COMPLETENESS (what
    * fraction of true near-dup pairs it still surfaces), measured for
    * the LSH banding against exhaustive ground truth on a
    * DETERMINISTIC DOC SAMPLE (doc_id ≡ 0 mod 5, capped at absolute
    * id 100000). The 1-in-5 sample is the scale story: exhaustive
    * truth is all-pairs by definition, so the audit bounds it to a
    * 1/25 pair subspace (the id cap bounds it absolutely whatever
    * the corpus grows to) — the standard
    * evaluate-on-a-slice discipline ([[minhashCalibration]] audits
    * the estimator; this audits the CANDIDATE SET) — while the
    * candidate side reads the same registry-shared pair graph the
    * production queries serve from.
    *
    * Gold = sampled pairs with exact shingle Jaccard ≥ 0.5 (the
    * integer rational `inter·10⁶ div union` — div and // agree).
    * All metrics are exact integer counts and positive q6 divisions;
    * an empty gold set yields NULL completeness via nullif, never a
    * division error.
    */
  def blockingQuality(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // the 1-in-5 id sample plus an ABSOLUTE id cap: the audit's truth
    // side is all-pairs by definition, so its slice must stay bounded
    // whatever the corpus grows to (cap inert at test SFs)
    val sampled = hashSets(spark, d)
      .filter($"doc_id" % 5 === 0 && $"doc_id" < 100000L)
    val a = sampled.select($"doc_id".as("a_id"), $"hashes".as("a_sh"),
      size($"hashes").as("la"))
      // the cached sample sits in a couple of blocks; spread the
      // nested-loop probe side across the cluster
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val b = sampled.select($"doc_id".as("b_id"), $"hashes".as("b_sh"),
      size($"hashes").as("lb"))
    val inter = size(array_intersect($"a_sh", $"b_sh")).cast("long")
    val gold = a.crossJoin(broadcast(b))
      // J >= 0.5 implies min|set| >= max|set|/2: prune on the cheap
      // length test BEFORE any intersect — pure implication, so the
      // gold set is unchanged
      .filter($"a_id" < $"b_id" &&
        lit(2) * least($"la", $"lb") >= greatest($"la", $"lb"))
      .select($"a_id", $"b_id",
        (inter * 1000000L).as("i6"),
        (($"la" + $"lb").cast("long") - inter).as("u"))
      .filter(expr("i6 div u >= 500000"))
      .select($"a_id", $"b_id")
      // gold is read TWICE (the count and the hit semi-join) and its
      // lineage is the all-pairs intersect — the lane's entire cost;
      // a lazy checkpoint computes it once (bounded: the sampled,
      // capped, J>=0.5 pair set)
      .localCheckpoint(false)
    val cand = sharedPairs(spark, d)
      .filter($"a_id" % 5 === 0 && $"b_id" % 5 === 0 &&
        $"a_id" < 100000L && $"b_id" < 100000L)
    val nd = sampled.agg(count(lit(1)).as("n_docs"))
    val ng = gold.agg(count(lit(1)).as("n_gold"))
    val nc = cand.agg(count(lit(1)).as("n_cand"))
    val nh = gold.join(cand, Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    nd.crossJoin(broadcast(ng)).crossJoin(broadcast(nc))
      .crossJoin(broadcast(nh))
      .select($"n_docs",
        expr("(n_docs * (n_docs - 1)) div 2").as("n_all_pairs"),
        $"n_cand", $"n_gold", $"n_hit")
      .select($"n_docs", $"n_all_pairs", $"n_cand", $"n_gold", $"n_hit",
        expr("CAST((n_all_pairs - n_cand) * 1000000" +
          " div nullif(n_all_pairs, 0) AS BIGINT)").as("reduction_q6"),
        expr("CAST(n_hit * 1000000 div nullif(n_gold, 0) AS BIGINT)")
          .as("completeness_q6"))
  }

  def shingleNovelty(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val sh = hashSets(spark, d)
      .select($"doc_id", explode($"hashes").as("h"))
    val byH = sh.groupBy($"h").agg(count(lit(1)).as("nd"))
    sh.join(byH, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"nd" >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select($"doc_id", $"n_shingles", $"n_shared",
        expr("CAST(n_shared * 1000000 div n_shingles AS BIGINT)")
          .as("dup_q6"))
      .orderBy($"doc_id")
  }

  /** Content-defined-chunking dedup — the storage-industry dedup
    * primitive (LBFS/Rabin chunking) brought to the corpus: chunk
    * boundaries are declared wherever the rolling 3-token hash hits
    * `h ≡ 0 (mod 8)`, so they are a function of LOCAL CONTENT, not
    * position — insert a sentence at the front of a document and
    * every later chunk still re-aligns and dedups, where fixed-size
    * blocks would all shift (the boundary-shift problem fixed-window
    * dedup cannot escape). Shingle fingerprints (q227) answer "how
    * much n-gram mass is shared"; CDC answers the operational
    * question "how many CONTIGUOUS SPANS could be stored/transferred
    * once" — per source: chunk count, chunk token mass, and the
    * share of that mass living in chunks that appear in ≥ 2
    * documents.
    *
    * The rolling hash is the multiplicity-keeping
    * [[graft.functions.ShingleHash]] kernel (n = 3), so the cut
    * predicate is one native loop per row; chunk assembly is pure
    * higher-order-function arithmetic on the token array (map-only,
    * no fan-out until the chunk explode). The census joins on the
    * CHUNK TEXT itself — no second hash for the oracle to mirror.
    * Expected chunk length = 8 shingles ≈ 10 tokens; the `% 8` grid
    * and the n = 3 window are the two knobs.
    *
    * Scale shape: one map-only pass per document (O(tokens) hash +
    * cut arithmetic), one explode to ~tokens/10 chunk rows, one
    * chunk-keyed census shuffle, one source-keyed rollup — every
    * stage keyed and partition-parallel; nothing is pairwise.
    */
  def cdcChunkDedup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, d)
      .select($"doc_id", $"source", split($"text", " ").as("toks"),
        org.apache.spark.sql.graft.Bridge.column(
          graft.functions.ShingleHash(
            org.apache.spark.sql.graft.Bridge.expression($"text"),
            n = 3, distinct = false))
          .as("hs"))
      .filter(size($"toks") >= 3)
    val chunks = docs
      // shingle k (1-indexed) covers toks[k..k+2]; a hit cuts AFTER
      // token k+2, so chunk starts are 1 and every cut+1
      .withColumn("cuts", expr(
        "transform(filter(sequence(1, size(hs))," +
          " k -> element_at(hs, k) % 8 = 0), k -> k + 2)"))
      .withColumn("starts", expr(
        "concat(array(1), transform(cuts, c -> c + 1))"))
      .withColumn("ends", expr(
        "concat(cuts, array(size(toks)))"))
      .select($"doc_id", $"source", explode(expr(
        "filter(transform(sequence(1, size(starts)), k -> " +
          "named_struct('len', element_at(ends, k)" +
          " - element_at(starts, k) + 1, " +
          "'chunk', array_join(slice(toks, element_at(starts, k), " +
          "element_at(ends, k) - element_at(starts, k) + 1), ' ')))," +
          " s -> s.len > 0)")).as("c"))
      .select($"doc_id", $"source", $"c.chunk".as("chunk"),
        $"c.len".as("len"))
    val census = chunks.groupBy($"chunk")
      .agg(countDistinct($"doc_id").as("nd"))
    chunks.join(census, "chunk")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_chunks"),
        sum($"len").as("chunk_toks"),
        sum(when($"nd" >= 2, $"len").otherwise(0L)).as("dup_toks"))
      .select($"source", $"n_chunks", $"chunk_toks", $"dup_toks",
        expr("CAST(dup_toks * 1000000 div chunk_toks AS BIGINT)")
          .as("dup_share_q6"))
      .orderBy($"source")
  }
}
