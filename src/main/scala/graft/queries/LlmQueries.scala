package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Fingerprint, TextAnalysis, VecAgg}
import graft.operators.{Ann, CorpusStats, Decontaminate, Dedup, Multimodal}
import graft.sources.Tables

/** LLM-training-data pipeline queries (SURVEY.md §2.3).
  *
  * The synthetic `documents` corpus has no natural duplicates (500 distinct
  * texts), so the dedup queries build a duplicate-bearing corpus
  * deterministically in-query: every doc with `doc_id % 5 == 0` gets a
  * copy at `doc_id + 10000` — byte-identical for exact dedup, or with a
  * fixed appended tail for the near-dup family (high but non-1.0 Jaccard).
  */
object LlmQueries {

  private val DupTail = " spark engine dedup suffix tail"

  private def withExactCopies(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  private[graft] def withNearCopies(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(DupTail)).as("text")))
  }

  /** §2.3 #31 — exact dedup over md5 buckets. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    orderedSmall(Dedup.exactGroups(withExactCopies(s, dir), "doc_id", "text")
      .filter(col("n_copies") > 1), col("keep_id"))

  /** §2.3 #31b — exact dedup after text normalization (lowercase +
    * whitespace collapse): catches case/spacing variants byte-exact dedup
    * misses. Corpus plants uppercased copies. */
  def dedupExactNorm(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(upper(col("text")), lit("  ")).as("text")))
    orderedSmall(Dedup.exactGroups(corpus, "doc_id", "text", normalize = true)
      .filter(col("n_copies") > 1), col("keep_id"))
  }

  /** §2.3 #39b — the end-use of quality scoring: keep documents passing
    * the signal thresholds (the training-data filter step). */
  def textFilter(s: SparkSession, dir: String): DataFrame = {
    val sig = TextAnalysis.qualitySignals(col("text")).toMap
    Tables.documents(s, dir)
      .filter(sig("n_tokens") >= 20 &&
        sig("stopword_ratio") >= 0.01 &&
        sig("mean_token_len") < lit(12.0))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** §2.3 #32 — MinHash+LSH near-dup pipeline. 8 bands of 8 is the
    * production shape for this corpus: the background 5-gram Jaccard
    * between unrelated synthetic docs is ~0.18-0.30 (measured), so only
    * r=8 rows per band keeps background band-collisions (p=J^8≈1e-6) — and
    * with them the candidate set — linear; wider-recall bandings (r≤4)
    * admit a few percent of ALL pairs as candidates, which is the
    * quadratic blow-up LSH exists to avoid. The statistical recall at the
    * 0.7 threshold is spec-covered; the driver gate pins the full output
    * through the [[dedupMinhashSig]] golden signature. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    orderedSmall(Dedup.minhashPairs(withNearCopies(s, dir), "doc_id", "text",
        shingleK = 5, numHashes = 64, bands = 8, threshold = 0.7),
      col("id_a"), col("id_b"))

  /** Golden-signature gate for [[dedupMinhash]]: collapses the pipeline's
    * full output (pair identities and verified Jaccards) into one exact
    * row — count, key sums, and the DECIMAL-summed rounded Jaccard — so
    * the driver can hash-compare it against pinned literals. The sketch
    * hashes aren't SQL-expressible, but at fixed data and fixed hash
    * constants the output is a constant; any regression in shingling,
    * hashing, banding, or verification moves the signature. */
  def dedupMinhashSig(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(withNearCopies(s, dir), "doc_id", "text",
        shingleK = 5, numHashes = 64, bands = 8, threshold = 0.7)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("id_a")).cast("long").as("sum_ida"),
        sum(col("id_b")).cast("long").as("sum_idb"),
        sum(round(col("jaccard"), 6).cast("decimal(18,6)"))
          .cast("double").as("sum_j"))

  /** §2.3 #33 — SimHash near-dup (rows-only gate; golden signature below). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    orderedSmall(Dedup.simhashPairs(withNearCopies(s, dir), "doc_id", "text",
        shingleK = 5, maxHamming = 3), col("id_a"), col("id_b"))

  /** Golden-signature gate for [[dedupSimhash]] (see [[dedupMinhashSig]]);
    * all-integer output, so the signature is exact by construction. */
  def dedupSimhashSig(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(withNearCopies(s, dir), "doc_id", "text",
        shingleK = 5, maxHamming = 3)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("id_a")).cast("long").as("sum_ida"),
        sum(col("id_b")).cast("long").as("sum_idb"),
        sum(col("hamming")).cast("long").as("sum_ham"))

  /** §2.3 #34 — exact 3-gram Jaccard on the planted candidate pairs. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val corpus = withNearCopies(s, dir)
    val pairs = corpus.filter(col("doc_id") >= 10000)
      .select((col("doc_id") - 10000).as("id_a"), col("doc_id").as("id_b"))
    orderedSmall(Dedup.jaccardVerify(pairs, corpus, "doc_id", "text", shingleK = 3),
      col("id_a"))
  }

  /** §2.3 #31c — near-dup pairs → duplicate CLUSTERS → canonical
    * survivors. The planted pairs are CONSECUTIVE-generation only
    * ((orig, v1) and (v1, v2), never (orig, v2)), so the original and v2
    * connect ONLY through transitive closure — exactly what pair-level
    * dedup cannot do and [[Dedup.connectedComponents]] exists for. */
  def dedupClusterKeep(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def gen(offset: Int, tail: String) =
      docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + offset).as("doc_id"),
          concat(col("text"), lit(tail)).as("text"))
    val corpus = docs.unionByName(gen(100000, " v1")).unionByName(gen(200000, " v2"))
    val base = docs.filter(col("doc_id") % 20 === 0).select(col("doc_id"))
    val pairs = base.select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      .unionByName(base.select((col("doc_id") + 100000).as("id_a"),
        (col("doc_id") + 200000).as("id_b")))
    val cc = Dedup.connectedComponents(pairs)
    orderedSmall(corpus.join(cc, corpus("doc_id") === cc("id"), "left_outer")
      .select(corpus("doc_id"),
        coalesce(col("label"), corpus("doc_id")).as("cluster"),
        (col("label").isNull || col("label") === corpus("doc_id")).as("kept")),
      col("doc_id"))
  }

  /** §2.3 #43c — deterministic hash split + hash sampling: the same row
    * lands in the same set on every run, engine and partitioning (a
    * rand() split re-draws per materialization and leaks val into
    * train). Oracled cross-engine through md5-hex string compare. */
  def qHashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .orderBy(col("doc_id"))
      .select(col("doc_id"),
        graft.operators.Sampling.splitLabel(col("doc_id"), "graft",
          Seq(("train", 0.9), ("val", 0.05), ("test", 0.05))).as("split"),
        graft.operators.Sampling.sampledBy(col("doc_id"), "s2", 0.25).as("in_quarter"))

  /** §2.3 #43d — dataset mixing: per-stratum deterministic sampling
    * (keep 50% of English, all of French, 10% of everything else). */
  def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(graft.operators.Sampling.stratifiedSampleBy(
        col("doc_id"), col("lang"), "mix",
        Map("en" -> 0.5, "fr" -> 1.0), defaultFrac = 0.1))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** §2.3 #43e — token-budget dataset mixing (the budget side of #43d's
    * rate side): each source contributes documents in deterministic
    * md5-hash order until its whitespace-token budget fills — src0 capped
    * tight, src1 excluded outright (budget 0), everything else on the
    * default. Greedy-prefix semantics, engine/run/partitioning-stable
    * selection. One shuffle; strata fill in parallel. */
  def qTokenBudgetMix(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      graft.operators.Sampling.budgetFill(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "source", col("n_tokens"), salt = "mix",
        budgets = Map("src0" -> 120L, "src1" -> 0L), defaultBudget = 200L),
      col("doc_id"))

  /** §2.3 #43f — sequence packing: documents concatenate (in
    * deterministic hash order, 16 parallel lanes) into 512-token context
    * windows; each doc is assigned the bin where its first token lands.
    * The last training-prep step before chunking feeds the model. */
  def qPackSequences(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      graft.operators.Sampling.packSequences(
        Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", col("n_tokens"), salt = "pack", maxPerBin = 512L),
      col("doc_id"))

  /** §2.3 #43h — packed-sequence RENDERING: the bins of #43f become the
    * actual training artifacts — docs concatenate in packer order with
    * an EOS separator; the gate carries each bin's doc count, token
    * total and rendered-sequence digest (the concat that produced the
    * digest IS the sequence, without megabytes of gate surface). */
  def qPackRender(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      graft.operators.Sampling.renderPackedSequences(
        Tables.documents(s, dir).select(col("doc_id"), col("text"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "text", col("n_tokens"), salt = "pack", maxPerBin = 512L,
        sep = "\n<|eos|>\n"),
      col("bucket"), col("bin"))

  /** §2.3 #43g — shard-manifest export: every document deterministically
    * assigned to one of 8 shards (same md5 draw as the split/sample
    * family, so shard membership survives re-runs and engine swaps) and
    * each shard summarized by count, token total, and an
    * order-independent content signature any engine can recompute to
    * verify the delivery. */
  def qShardManifest(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      graft.operators.Sampling.shardManifest(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", TextAnalysis.tokenCount(col("text")).cast("long"),
        salt = "shard", nShards = 8),
      col("shard_id"))

  /** §2.3 #35 — embedding near-dup: top-50 all-pairs cosine on a bounded
    * id range (bucketed LSH variant gated separately in ann_lsh). */
  def embedNeardup(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(s, dir).filter(col("vec_id") < 100)
    Dedup.embeddingPairs(vecs, "vec_id", "embedding", threshold = -1.0, bucketBits = 0)
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(50)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cos_r"))
  }

  /** §2.3 #36 — brute-force cosine top-k (exact ANN baseline). */
  def annTopk(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir)
    Ann.bruteForceTopK(
        all.filter(col("vec_id") < 20), all.filter(col("vec_id") >= 20),
        "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** §2.3 #37 — LSH-bucketed ANN (rows-only gate; recall is statistical,
    * measured ≥0.7 at these parameters by LlmOperatorsSpec — this corpus'
    * neighbors sit near cosine 0.44, so few bits + many tables). */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir)
    Ann.lshTopK(
        all.filter(col("vec_id") < 20), all.filter(col("vec_id") >= 20),
        "vec_id", "embedding", k = 5, bits = 4, tables = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Golden-signature gate for [[annLsh]] (see [[dedupMinhashSig]]): the
    * bucketed top-k is approximate by design (≈2/3 of ranks differ from
    * brute force at these params), so the gate pins the approximate answer
    * itself rather than forcing recall-1 parameters that would reduce the
    * operator to brute force. */
  def annLshSig(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir)
    Ann.lshTopK(
        all.filter(col("vec_id") < 20), all.filter(col("vec_id") >= 20),
        "vec_id", "embedding", k = 5, bits = 4, tables = 8)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("query_id")).cast("long").as("sum_qid"),
        sum(col("neighbor_id")).cast("long").as("sum_nid"),
        sum(col("rank")).cast("long").as("sum_rank"),
        sum(round(col("cosine"), 6).cast("decimal(18,6)"))
          .cast("double").as("sum_cos"))
  }

  /** §2.3 #37b — IVF-bucketed ANN. Probing ALL cells makes IVF exact
    * (same results as brute force through the cell machinery), so this is
    * hash-gated against the brute-force oracle; partial-probe recall is
    * covered by LlmOperatorsSpec. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir)
    Ann.ivfTopK(
        all.filter(col("vec_id") < 20), all.filter(col("vec_id") >= 20),
        "vec_id", "embedding", k = 5, nCentroids = 16, nProbe = 16)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** §2.3 #37c — SQ8 scalar-quantized ANN. At rerankFactor=4 the exact
    * float re-rank over the quantized candidate pool reproduces brute
    * force exactly on this corpus, so the gate is the same brute-force
    * SQL oracle as ann_topk (the quantize→asym-score→re-rank machinery
    * must round-trip to the exact answer); quantization-error bounds and
    * recall on adversarial random vectors are spec-covered.
    *
    * GATE PRECONDITION (pinned property of the CURRENT corpus, not an
    * algorithm guarantee): exactness holds only while every true top-5
    * neighbor survives quantized pre-ranking into the 5×4-candidate pool.
    * SQ8 is an approximation — if the testdata embeddings are ever
    * regenerated and this gate flips with no code change, re-measure the
    * pool recall (AnnSpec's sq8 properties) before suspecting the
    * operator; the principled re-gating is a recall floor like ann_lsh's,
    * with this exact-match check as the corpus-specific stronger pin. */
  def annSq8(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir)
    Ann.sq8TopK(
        all.filter(col("vec_id") < 20), all.filter(col("vec_id") >= 20),
        "vec_id", "embedding", k = 5, rerankFactor = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** §2.3 #37d — product-quantized top-k through the full PQ machinery
    * (normalize → train per-subspace codebooks → encode to m ints →
    * asymmetric codebook scoring → candidate pool → exact re-rank),
    * gated the way `ann_ivf` gates full-probe: with the pool covering
    * the corpus, the machinery must be EXACTLY brute force — any encode/
    * scoring/re-rank defect breaks the hash. The APPROXIMATE operating
    * point (rerankFactor 8) is pinned separately by a measured recall
    * floor in LlmOperatorsSpec; these near-random testdata embeddings
    * (true cosines ~0.25) are PQ's worst case, so an exact-match gate at
    * a small pool would pin corpus noise, not operator correctness.
    *
    * The exactness pool is DERIVED from the corpus size at gate-build
    * time (`ceil(|corpus| / k)` — one bounded count, the same class of
    * driver-side scalar as the trainers' model collects) instead of a
    * literal sized to one SF: the gate then holds at ANY scale factor
    * the driver points it at, and a testdata regeneration can't produce
    * a known-red gate. */
  private def exactRerankFactor(corpus: DataFrame, k: Int): Int =
    math.max(1, ((corpus.count() + k - 1) / k).toInt)

  def annPq(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir)
    val corpus = all.filter(col("vec_id") >= 20)
    Ann.pqTopK(
        all.filter(col("vec_id") < 20), corpus,
        "vec_id", "embedding", k = 5,
        m = 8, nCodes = 64, trainIters = 3,
        rerankFactor = exactRerankFactor(corpus, 5))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** §2.3 #37e — IVF-PQ through the combined machinery, gated at its
    * exactness envelope (every cell probed + pool covering the corpus ≡
    * brute force — the `ann_ivf`/`ann_pq` convention); the approximate
    * operating point is pinned by a measured recall floor in
    * LlmOperatorsSpec. */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir)
    val corpus = all.filter(col("vec_id") >= 20)
    Ann.ivfPqTopK(
        all.filter(col("vec_id") < 20), corpus,
        "vec_id", "embedding", k = 5,
        nCentroids = 16, nProbe = 16, m = 8, nCodes = 64, trainIters = 3,
        rerankFactor = exactRerankFactor(corpus, 5))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** §2.3 #47b — power-iteration PCA over the embedding corpus: 3
    * iterations of `v ← normalize(Σ (x·v)x)` under the decimal-exact
    * training regime, then every vector's projection onto the learned
    * direction. The DuckDB oracle REPLAYS the full iteration (per-dim
    * decimal sums, decimal-squared norm) — training and scoring both
    * cross-engine verified. */
  def embedPca(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val (v, lambda) = graft.operators.Pca.powerIteration(emb, "embedding", iters = 3)
    orderedSmall(
      graft.operators.Pca.project(emb, "embedding", v)
        .select(col("vec_id"), round(col("proj"), 6).as("proj_r"),
          round(lit(lambda), 6).as("lambda_r")),
      col("vec_id"))
  }

  /** §2.3 #47c — top-2 PCA via Hotelling deflation: component 1 as in
    * [[embedPca]], then every vector deflates by its v1 component and
    * the same exact power iteration extracts v2. Projections report each
    * component's own variance axis (p2 over the DEFLATED vectors — with
    * exact orthogonality the two definitions coincide; over floats this
    * one is the variance v2 actually captured). Oracle replays BOTH
    * chains and the deflation. */
  def embedPca2(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val ((v1, l1), (v2, l2)) = graft.operators.Pca.top2(emb, "embedding", iters = 3)
    val defl = graft.operators.Pca.deflate(emb, "embedding", v1, "__defl")
    val p1 = graft.operators.Pca.project(defl, "embedding", v1)
      .withColumnRenamed("proj", "__p1")
    orderedSmall(
      graft.operators.Pca.project(p1, "__defl", v2)
        .select(col("vec_id"),
          round(col("__p1"), 6).as("p1_r"), round(col("proj"), 6).as("p2_r"),
          round(lit(l1), 6).as("l1_r"), round(lit(l2), 6).as("l2_r")),
      col("vec_id"))
  }

  /** §2.3 #38 — heuristic language ID. */
  def textLangid(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .orderBy(col("doc_id")) // sort-first: keep stats out of the range-sample pass
      .select(col("doc_id"), col("lang"),
        TextAnalysis.textStats(col("text")).as("__st"))
      .select(col("doc_id"),
        TextAnalysis.langIdFromStats(col("__st")).as("pred_lang"),
        (TextAnalysis.langIdFromStats(col("__st")) === col("lang")).as("matches_label"))

  /** §2.3 #39 — quality scoring signals. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val sig = TextAnalysis.qualitySignalsFromStats(col("__st"))
    Tables.documents(s, dir)
      .orderBy(col("doc_id")) // sort-first: see textLangid
      .select(col("doc_id"), TextAnalysis.textStats(col("text")).as("__st"))
      .select(col("doc_id") +: sig.map { case (n, c) => c.as(n) }: _*)
  }

  /** §2.3 #40 — whitespace + BPE-ish token counting. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .orderBy(col("doc_id")) // sort-first: see textLangid
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"))

  /** §2.3 #41 — winnowed rolling-hash fingerprints (rows-only gate; pinned
    * by FingerprintSpec). */
  def docFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .orderBy(col("doc_id")) // sort-first: see textLangid
      .select(col("doc_id"),
        Fingerprint.fingerprint64(col("text")).as("fp64"),
        size(Fingerprint.winnow(col("text"), 8, 16)).as("n_winnow"))

  /** Golden-signature gate for [[docFingerprint]] (see [[dedupMinhashSig]]):
    * pins every fingerprint through a modular sum — a change to the rolling
    * hash, the winnow window, or any single document's fp64 moves it. */
  def docFingerprintSig(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Fingerprint.fingerprint64(col("text")).as("fp64"),
        size(Fingerprint.winnow(col("text"), 8, 16)).as("n_winnow"))
      .agg(count(lit(1)).as("n_docs"),
        sum(pmod(col("fp64"), lit(1000003L))).cast("long").as("sum_fp_mod"),
        sum(col("n_winnow")).cast("long").as("sum_winnow"))

  /** §2.3 #42 — multimodal plumbing: text payload → binary media frame →
    * partition-batched (stub) decode → typed features. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaFrame(
      Tables.documents(s, dir), "doc_id", "text", "txt")
    Multimodal.decodeFeatures(media, batchSize = 64)
      .toDF()
      .select(col("id"), col("nBytes").as("n_bytes"),
        col("width"), col("height"))
      .orderBy(col("id"))
  }

  /** §2.3 #42d — REAL image decode, oracle-gated: each doc_id < 100 gets
    * a deterministic `(4 + id%13) x (3 + id%7)` PNG encoded ON THE
    * EXECUTORS (ImageIO write), then flows through the production decode
    * path ([[Multimodal.decodeFeatures]] → ImageIO read). The oracle
    * recomputes the dimensions ANALYTICALLY from doc_id — so the gate
    * proves the real encode→decode round-trip recovers the true raster
    * geometry, not a stub formula, row by row. */
  def multimodalDecodeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 100).as[Long]
    val media = ids.map { id =>
      val w = 4 + (id % 13).toInt
      val h = 3 + (id % 7).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var x = 0
      while (x < w) {
        var y = 0
        while (y < h) { img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF); y += 1 }
        x += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.MediaRecord(id, bos.toByteArray, "png")
    }
    orderedSmall(
      Multimodal.decodeFeatures(media, batchSize = 32).toDF()
        .select(col("id").as("doc_id"), col("width"), col("height")),
      col("doc_id"))
  }

  /** §2.3 #42e — REAL audio decode, oracle-gated: each doc_id < 100 gets
    * a deterministic mono sine WAV synthesized ON THE EXECUTORS
    * (`Multimodal.wavBytes`, 8 kHz, `1 + id%3` seconds, `200 + (id%5)·100`
    * Hz at half amplitude), then flows through the production decode path
    * ([[Multimodal.audioFeatures]] → `javax.sound.sampled`). The oracle
    * recomputes geometry ANALYTICALLY from doc_id and asserts the decoded
    * RMS sits at the sine's a/√2 — so the gate proves the WAV container
    * round-trip recovers the true PCM stream, not a byte-length stub. */
  def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 100).as[Long]
    val media = ids.map { id =>
      val sr = 8000
      val seconds = 1 + (id % 3).toInt
      val freq = 200 + (id % 5).toInt * 100
      val n = sr * seconds
      val samples = Array.tabulate(n)(i =>
        (math.sin(2 * math.Pi * freq * i / sr) * 16384).toShort)
      Multimodal.MediaRecord(id, Multimodal.wavBytes(samples, sr), "wav")
    }
    orderedSmall(
      Multimodal.audioFeatures(media, batchSize = 32).toDF()
        .select(col("id").as("doc_id"),
          col("sampleRate").as("sample_rate"), col("channels"),
          col("nFrames").as("n_frames"), col("durationMs").as("duration_ms"),
          (abs(col("rms") - lit(0.5 / math.sqrt(2.0))) < 0.005).as("rms_ok")),
      col("doc_id"))
  }

  /** §2.3 #42f — REAL multi-frame (video-shape) decode, oracle-gated:
    * each doc_id < 60 gets an animated GIF of `2 + id%4` solid-color
    * frames (`8 + id%5` × `6 + id%3`) written ON THE EXECUTORS by the
    * JDK's GIF writer, then decoded through the production multi-frame
    * path ([[Multimodal.videoFrameFeatures]]). Geometry and frame count
    * are analytic from doc_id; `rgb_ok` proves the decoded top-left
    * pixel survived the container round-trip bit-exactly (solid frames
    * are palettization-stable). */
  def multimodalVideo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 60).as[Long]
    val media = ids.map { id =>
      val w = 8 + (id % 5).toInt
      val h = 6 + (id % 3).toInt
      val frames = (0 until 2 + (id % 4).toInt).map { i =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color((10 + 40 * i) % 256, (id % 200).toInt, 50))
        g.fillRect(0, 0, w, h)
        g.dispose()
        img
      }
      Multimodal.MediaRecord(id, Multimodal.gifBytes(frames), "gif")
    }
    orderedSmall(
      Multimodal.videoFrameFeatures(media).toDF()
        .select(col("id").as("doc_id"), col("frameIdx").as("frame_idx"),
          col("width"), col("height"),
          (col("rgb0") ===
            (((lit(10) + lit(40) * col("frameIdx")) % 256) * 65536 +
              (col("id") % 200) * 256 + 50)).as("rgb_ok")),
      col("doc_id"), col("frame_idx"))
  }

  /** §2.3 #42b — multimodal fan-out: strided frame sampling over binary
    * payloads (1 → n rows, partition-local), frames fingerprinted for the
    * oracle compare. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaFrame(
      Tables.documents(s, dir), "doc_id", "text", "vid")
    Multimodal.sampleFrames(media, frameSize = 256, stride = 512, maxFrames = 8)
      .toDF()
      .select(col("id"), col("frameIdx").as("frame_idx"), col("offset"),
        md5(col("frameBytes")).as("frame_md5"))
      .orderBy(col("id"), col("frame_idx"))
  }

  /** §2.3 #45 — PII redaction: scrub emails / IPv4 / phone numbers from a
    * corpus before training. PII is planted deterministically in-query
    * (the synthetic corpus has none), redacted with the codegen'd
    * `regexp_replace` chain, and the counts come from `regexp_count` so
    * the oracle can assert both the rewritten text and how much was
    * removed. Row-local → embarrassingly parallel at any scale. */
  def textRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir)
      .orderBy(col("doc_id")) // sort-first: see textLangid
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or admin@test.org now")))
        .when(col("doc_id") % 3 === 1,
          lit(" call 555-123-4567 or 555-999-0000 today"))
        .otherwise(lit(" server at 10.0.0.7 and 192.168.1.42 responded")))
        .as("text"))
    planted.select(col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("redacted"),
      regexp_count(col("text"), lit(TextAnalysis.EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(TextAnalysis.IpRe)).cast("long").as("n_ips"),
      regexp_count(col("text"), lit(TextAnalysis.PhoneRe)).cast("long").as("n_phones"))
  }

  /** §2.3 #46 — repetition signals (Gopher-style quality filters): distinct
    * word fraction and the most-repeated bigram, as exact counts (ratios
    * divide downstream — keeps the output integer-exact cross-engine).
    * Word stats are array ops inside the scan; the bigram top-count is one
    * explode + two-level aggregation keyed by doc_id, so the shuffle is
    * (doc_id, bigram)-partitioned and skew-free at corpus scale. */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    // hash-keyed scan-starvation guard (no-op at real scan widths): the
    // single-file local scan otherwise runs the split/explode/partial-agg
    // of BOTH branches serially; both branches project the same
    // (doc_id, w), so the guard's one exchange feeds them both
    val words = graft.operators.Skew.feedClusterBy(
      Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w")),
      col("doc_id"))
    val base = words.select(col("doc_id"),
      size(col("w")).cast("long").as("n_words"),
      size(array_distinct(col("w"))).cast("long").as("n_distinct_words"),
      col("w"))
    // the <2-word guard matters under ANSI mode: sequence(0, -1) yields a
    // DESCENDING [0,-1], whose indices make element_at throw — a single
    // one-token document would otherwise kill the whole job
    val bigramCounts = words
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(w) < 2 THEN array()
          |ELSE transform(sequence(0, size(w)-2),
          |  i -> concat(element_at(w, i+1), ' ', element_at(w, i+2))) END"""
          .stripMargin))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
    val top = bigramCounts.groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram_n"),
        count(lit(1)).as("n_distinct_bigrams"))
    // left join + 0-fill: a bigram-less doc still appears in the output
    base.drop("w").join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"))
      .orderBy(col("doc_id"))
  }

  /** §2.3 #47 — per-cluster embedding centroids via the typed
    * [[graft.functions.VecAgg.ScaledVecSum]] Aggregator: one fixed-size
    * buffer per group folded map-side, instead of a 64× posexplode
    * fan-out before the shuffle. Output is the exact scaled-long sum per
    * dimension (the mean is sum/n downstream), exploded to rows only for
    * the oracle compare. */
  def embedCentroid(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(VecAgg.sumScaled(col("embedding"), dims = 64).as("vsum"),
        count(lit(1)).as("n_vecs"))
      .select(col("label"), col("n_vecs"), posexplode(col("vsum")).as(Seq("dim", "sum_scaled")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        col("sum_scaled"), col("n_vecs"))
      .orderBy(col("label"), col("dim"))
  }

  /** §2.3 #44b — the SQL-function surface: graft kernels called from SQL
    * TEXT (`graft_token_count`, `graft_langid`, `graft_fingerprint`)
    * through the runtime-registered function registry
    * ([[graft.functions.GraftFunctions.register]]); same expressions as
    * the Column API, so the existing oracles apply verbatim. */
  def sqlFunctions(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    s.sql("""
      SELECT doc_id,
        graft_token_count(text) AS n_ws_tokens,
        graft_bpeish_count(text) AS n_bpeish,
        graft_langid(text) AS pred_lang
      FROM documents ORDER BY doc_id""")
  }

  /** §2.3 #48 — benchmark decontamination: word-5-gram overlap of each
    * training document against the evaluation set. Eval set = every 7th
    * doc; the training corpus deliberately re-plants those texts under
    * shifted ids (full contamination, ratio 1.0) next to the clean rest
    * (near-zero background overlap) so both sides of the threshold are
    * exercised. Docs under 5 tokens have no 5-grams and drop out — in
    * both engines, via explode/unnest of an empty list. */
  def decontamOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 7 === 0)
    val trainDocs = docs.filter(col("doc_id") % 7 =!= 0)
      .unionByName(evalDocs.select((col("doc_id") + 20000).as("doc_id"), col("text")))
    orderedSmall(
      Decontaminate.overlap(trainDocs, evalDocs, "doc_id", "text",
        n = 5, threshold = 0.5),
      col("doc_id"))
  }

  /** §2.3 #48b — per-EVAL-item contamination report, the mirror view of
    * [[decontamOverlap]]: which eval items are burned, and how badly.
    * Half the eval docs (doc_id % 14 == 0) are planted into train, so
    * the gate exercises burned, partially-hit, and clean eval items. */
  def decontamReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 7 === 0)
    val trainDocs = docs.filter(col("doc_id") % 7 =!= 0)
      .unionByName(docs.filter(col("doc_id") % 14 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
    orderedSmall(
      Decontaminate.reportPerEval(trainDocs, evalDocs, "doc_id", "text",
        n = 5, threshold = 0.5),
      col("doc_id"))
  }

  /** §2.3 #31d — repeated-span detection
    * ([[graft.operators.SpanDedup]]): per document, how many of its
    * 8-token spans occur at another (doc, position) site anywhere in the
    * corpus, and how many tokens their island-merged union covers — the
    * positioned-fingerprint form of exact-substring training-data dedup.
    * The synthetic corpus has a real cross-doc repeated-phrase signal
    * (~1k duplicated 8-grams at sf0.01), so nothing is planted. */
  def textDupSpans(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      graft.operators.SpanDedup.duplicatedSpanStats(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8),
      col("doc_id"))

  /** §2.3 #31e — quality-aware survivor selection
    * ([[Dedup.keepBest]]): the planted two-generation copy chain of
    * [[dedupClusterKeep]], but each generation appends a longer tail and
    * the survivor policy is "keep the longest" (score = length) — so the
    * LAST generation wins where min-id would keep the original. Output
    * is the surviving corpus (id, length). */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def gen(offset: Int, tail: String) =
      docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + offset).as("doc_id"),
          concat(col("text"), lit(tail)).as("text"))
    val corpus = docs.unionByName(gen(100000, " v1")).unionByName(gen(200000, " v2xx"))
    val base = docs.filter(col("doc_id") % 20 === 0).select(col("doc_id"))
    val pairs = base.select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      .unionByName(base.select((col("doc_id") + 100000).as("id_a"),
        (col("doc_id") + 200000).as("id_b")))
    orderedSmall(
      Dedup.keepBest(corpus, "doc_id", pairs, length(col("text")))
        .select(col("doc_id"), length(col("text")).cast("long").as("len")),
      col("doc_id"))
  }

  /** §2.3 #31f — incremental batch-vs-corpus dedup
    * ([[Dedup.dedupAgainstCorpus]]): the continuous-ingestion shape. The
    * planted batch carries docs already in the corpus (doc_id % 6 == 0,
    * killed by the corpus set) and within-batch copies (+70000 ids,
    * killed by keep-first), so both kill paths gate. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .unionByName(docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 70000).as("doc_id"), col("text")))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      .unionByName(docs.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 50000).as("doc_id"), col("text")))
    orderedSmall(
      Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text")
        .select(col("doc_id"), length(col("text")).cast("long").as("len")),
      col("doc_id"))
  }

  /** §2.3 #48c — source-to-source 5-gram overlap matrix
    * ([[CorpusStats.sourceOverlapMatrix]]): shared distinct grams and
    * set-Jaccard per source pair — the pre-mixing curation view. The
    * synthetic corpus shares real cross-source phrases (32 nonzero
    * pairs at sf0.01), so nothing is planted. */
  def decontamMatrix(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      CorpusStats.sourceOverlapMatrix(Tables.documents(s, dir), "source", "text", n = 5),
      col("src_a"), col("src_b"))

  /** §2.3 #31d (filter form) — span-level dedup as a document filter:
    * drop documents whose duplicated-span coverage exceeds 30% of their
    * tokens ([[graft.operators.SpanDedup.dropMostlyDuplicated]]). */
  def textSpanFilter(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      graft.operators.SpanDedup.dropMostlyDuplicated(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8, maxDupFrac = 0.3)
        .select(col("doc_id")),
      col("doc_id"))

  /** §2.3 #31g — snapshot diff between two corpus versions (dataset
    * versioning: which docs were added / removed / changed between
    * yesterday's corpus and today's). Full outer join on id comparing
    * content hashes — the exchange carries `(id, md5)`, 24 bytes/row,
    * never text; unchanged rows drop before the output. The planted v2
    * removes `% 13 == 0`, appends to `% 11 == 0`, and adds `+90000`
    * copies of `% 17 == 0`. */
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val v2 = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" upd")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 90000).as("doc_id"), col("text")))
    val a = docs.select(col("doc_id"), md5(col("text")).as("__h1"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("__h2"))
    orderedSmall(
      a.join(b, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("__h1").isNull, lit("added"))
            .when(col("__h2").isNull, lit("removed"))
            .when(col("__h1") =!= col("__h2"), lit("changed")))
        .filter(col("status").isNotNull)
        .select(col("doc_id"), col("status")),
      col("doc_id"))
  }

  /** §2.3 #43i — weighted sampling without replacement
    * ([[graft.operators.Sampling.weightedSamplePerStratum]],
    * Efraimidis–Spirakis): top-5 docs per source under the
    * `u^(1/n_tokens)` exponential-key order — longer documents win
    * proportionally, the draw replays from (salt, id, weight) alone. */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    orderedSmall(
      graft.operators.Sampling.weightedSamplePerStratum(docs, "doc_id",
        col("source"), col("n_tokens"), "wsr", 5),
      col("source"), col("doc_id"))
  }

  /** §2.3 #31h — NEAR-dup incremental screening
    * ([[Dedup.neardupAgainstCorpus]]): the fuzzy half of continuous
    * ingestion. Planted batch: lightly-edited copies of corpus docs
    * (screened out through band-collision + Jaccard verify) and
    * hex-digest rows (no shingle overlap with prose — kept). At the
    * fixed data and hash constants the outcome is deterministic, so the
    * closed-form oracle is exact. */
  def dedupNeardupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 40000).as("doc_id"),
        concat(col("text"), lit(" tiny edit")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 40000).as("doc_id"), md5(col("text")).as("text")))
    orderedSmall(
      Dedup.neardupAgainstCorpus(batch, docs, "doc_id", "text"),
      col("doc_id"))
  }

  /** §2.3 #49 — corpus heavy-hitter bigrams (boilerplate detection).
    * Deterministic cut: total order (count DESC, ngram ASC) before the
    * top-20 limit. */
  def textTopNgrams(s: SparkSession, dir: String): DataFrame =
    CorpusStats.topNgrams(Tables.documents(s, dir), "text", n = 2, k = 20)

  /** §2.3 #50 — per-document top-3 terms by TF-IDF with BM25 alongside
    * (k1=1.2, b=0.75). Scores rounded to 6 places for the cross-engine
    * hash; ties broken by term so the row_number cut is deterministic. */
  def textTfidf(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      CorpusStats.tfidfBm25(Tables.documents(s, dir), "doc_id", "text", topPerDoc = 3),
      col("doc_id"), col("rank"))

  /** §2.3 #51 — C4-style boilerplate-line removal. Every doc gets a
    * shared header and footer line planted around its text; lines in ≥3
    * distinct docs are stripped, surviving lines keep their order, and
    * an all-boilerplate doc would come back empty. Any naturally
    * repeated lines inside the synthetic texts are stripped identically
    * by both engines, so the gate holds regardless of corpus content. */
  def textBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      concat(lit("=== COMMON HEADER ===\n"), col("text"),
        lit("\n=== COMMON FOOTER ===")).as("text"))
    orderedSmall(
      CorpusStats.removeBoilerplateLines(docs, "doc_id", "text", minDocFreq = 3)
        .select(col("doc_id"), length(col("text")).as("n_chars_clean"), col("text")),
      col("doc_id"))
  }

  /** §2.3 #51b — global exact line dedup (the RefinedWeb rule, keep-first
    * semantics): a shared footer line is planted on every document, so
    * the gate proves only the FIRST occurrence survives and every doc
    * whose content line duplicates an earlier doc's collapses. */
  def textLineDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"), lit("\n=== SHARED FOOTER ===")).as("text"))
    orderedSmall(
      CorpusStats.dedupLinesGlobal(docs, "doc_id", "text")
        .select(col("doc_id"), length(col("text")).as("n_chars_kept"), col("text")),
      col("doc_id"))
  }

  /** §2.3 #51c — PARAGRAPH-granularity global dedup
    * ([[CorpusStats.dedupUnitsGlobal]] at `"\n\n"`): the planted shared
    * disclaimer is a two-LINE paragraph, so the gate separates the
    * granularities — paragraph dedup removes it as one unit where line
    * dedup would treat its lines independently. */
  def textParaDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        lit("\n\n=== SHARED DISCLAIMER ===\nplease do not redistribute"))
        .as("text"))
    orderedSmall(
      CorpusStats.dedupUnitsGlobal(docs, "doc_id", "text", sep = "\n\n")
        .select(col("doc_id"), length(col("text")).as("n_chars_kept"), col("text")),
      col("doc_id"))
  }

  /** §2.3 #45b — URL/domain filtering (the crawl-pipeline front gate:
    * drop documents from blocklisted hosts, keep the parsed domain as
    * provenance). URLs are planted deterministically (the corpus has
    * none); extraction is one Java/RE2-compatible `regexp_extract`, the
    * blocklist a broadcast semi-anti-join — at 100 TB the list side is
    * tiny and the corpus never shuffles. */
  def textUrlFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      concat(lit("https://host"), col("doc_id") % 7,
        lit(".example.com/doc/"), col("doc_id")).as("url"))
    val domain = regexp_extract(col("url"), "^https?://([^/]+)/", 1)
    val block = s.createDataFrame(
      Seq(Tuple1("host0.example.com"), Tuple1("host3.example.com"))
    ).toDF("bad_domain")
    orderedSmall(
      docs.withColumn("domain", domain)
        .join(broadcast(block), col("domain") === col("bad_domain"), "left_anti"),
      col("doc_id"))
  }

  /** §2.3 #52c — corpus-ADAPTIVE quality filter: the CCNet move of
    * thresholding each document's LM score against a corpus percentile
    * instead of a fixed constant (fixed thresholds rot as the corpus
    * mix shifts; percentiles self-calibrate). Keeps docs at or below
    * the P90 unigram NLL. The gate uses the EXACT interpolated
    * percentile (deterministic, DuckDB `quantile_cont` ≡ Spark
    * `percentile`, both `lo + frac·(hi−lo)` over the 6-dp-rounded
    * scores); at 100 TB the drop-in is `percentile_approx` with the
    * same broadcast-threshold plan shape — one extra 1-row aggregate,
    * the corpus streams once either way. */
  def textAdaptiveFilter(s: SparkSession, dir: String): DataFrame = {
    // Lazy-checkpoint the doc-sized scoring so BOTH consumers (the
    // percentile's broadcast build and the per-doc projection) read one
    // evaluation — the un-checkpointed form re-ran the full unigram-NLL
    // subtree (two corpus tokenize passes) once per consumer.
    // localCheckpoint, NOT persist: a persisted plan registers with the
    // CacheManager and is matched BY CANONICALIZED PLAN session-wide, so
    // it would silently serve the plan-equal scoring subtree of OTHER
    // queries (text_unigram_nll) and of later bench reps — cross-query
    // result reuse, not optimization (measured: unigram_nll task-CPU
    // 0.39 → 0.03 under a leftover cache). A checkpoint is keyed to its
    // RDD, invisible to plan matching, and released on GC.
    val scored = CorpusStats.unigramNll(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "doc_id", "text").localCheckpoint(false)
    val thr = scored.agg(expr("percentile(avg_nll, 0.9)").as("t"))
    orderedSmall(
      scored.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("avg_nll"),
          round(col("t"), 6).as("p90_r"),
          (col("avg_nll") <= round(col("t"), 6)).as("kept")),
      col("doc_id"))
  }

  /** §2.3 #52c (approx path) — the documented 100 TB drop-in GATED:
    * `percentile_approx` (GK sketch, mergeable, no full sort of the score
    * column) picks the threshold NEXT TO the exact interpolated
    * percentile, and the output carries `approx_ok` = the two thresholds
    * flip at most 2% of keep decisions (a P90 threshold moved by one rank
    * flips ~1/N of them, so 2% is a real bound, not slack). The per-doc
    * `kept` is the exact decision DuckDB replays; `approx_ok` is the
    * in-engine accuracy clause the oracle asserts true. */
  def textAdaptiveFilterApprox(s: SparkSession, dir: String): DataFrame = {
    def scored = CorpusStats.unigramNll(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "doc_id", "text")
    // Both thresholds and the flip rate are THREE driver scalars — probe
    // them eagerly off one cached evaluation instead of nesting the
    // scoring subtree under every downstream reference: Spark plans no
    // exchange reuse across the crossJoin arms (measured: 12 scans / 38
    // aggregates in the nested form), so the lazy formulation re-scored
    // the corpus ~4x per materialization. Cached-probe + literal
    // thresholds costs the same two subtree evaluations as the exact
    // twin. Rounding matches Spark's round(): HALF_UP at 6 dp.
    // Lazy localCheckpoint, NOT persist: the old persist registered the
    // scoring plan with the CacheManager, which matches by canonicalized
    // plan session-wide — with the unpersist gone (see below) it would
    // serve plan-equal subtrees of other queries and later reps. The
    // checkpoint is RDD-keyed: one evaluation inside THIS invocation,
    // invisible to every other plan, released on GC.
    val probe = scored.localCheckpoint(false)
    val r = probe.agg(
      expr("percentile(avg_nll, 0.9)").as("t"),
      expr("percentile_approx(avg_nll, 0.9, 10000)").as("t_a"),
      count(lit(1)).as("n")).head()
    def r6(v: Double): Double = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val (t, tA, n) = (r6(r.getDouble(0)), r6(r.getDouble(1)), r.getLong(2))
    val flips = probe
      .filter((col("avg_nll") <= t) =!= (col("avg_nll") <= tA)).count()
    // The final projection reads the SAME checkpointed scoring the probes
    // materialized (the old form re-derived `scored`, paying a THIRD full
    // subtree evaluation — two corpus tokenize passes — for rows already
    // sitting in storage). The checkpoint outlives this function because
    // the result is lazy; the ContextCleaner releases it when the
    // returned frame is GC'd.
    orderedSmall(
      probe.select(col("doc_id"), col("avg_nll"),
        (col("avg_nll") <= t).as("kept"),
        lit(flips <= n * 0.02).as("approx_ok")),
      col("doc_id"))
  }

  /** §2.3 #52 — unigram-NLL quality scoring (perplexity proxy): each
    * doc's mean −ln p(token) under the corpus's own add-one-smoothed
    * unigram distribution. Decimal-summed per doc, so the gate is exact
    * and partition-independent. */
  def textUnigramNll(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      CorpusStats.unigramNll(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text"),
      col("doc_id"))

  /** §2.3 #52b — interpolated bigram-LM quality scoring (the CCNet-style
    * perplexity filter): each doc's mean −ln p(w2|w1) under the corpus's
    * own bigram model with an add-one-smoothed unigram interpolation
    * floor. λ literals are written separately in both engines (0.7/0.3 —
    * never `1 − λ`, which differs in IEEE double), and the per-doc mean
    * is decimal-summed, so the gate is exact and partition-independent. */
  def textBigramNll(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      CorpusStats.bigramNll(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", lambdaBg = 0.7, lambdaUni = 0.3),
      col("doc_id"))

  /** §2.3 #39c — compression-ratio quality signal (the Gopher rule):
    * `deflate_len / n_bytes` per document under fixed-level raw DEFLATE.
    * Template soup and near-duplicate boilerplate compress far below
    * natural prose; the flag marks documents under a 0.25 ratio floor.
    * DuckDB has no deflate, so the gate is the integer-sum signature
    * companion ([[textCompressSig]]) — same regime as dedup_minhash. */
  def textCompress(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.deflateStats(col("text")).as("__d"))
        .select(col("doc_id"),
          col("__d")("n_bytes").as("n_bytes"),
          col("__d")("deflate_len").as("deflate_len"),
          // nullif: an empty document (0 bytes) has no defined ratio, and
          // a bare /0 THROWS under ANSI — NULL fails the threshold instead
          round(col("__d")("deflate_len").cast("double") /
            nullif(col("__d")("n_bytes"), lit(0L)), 6).as("ratio_r"),
          (col("__d")("deflate_len").cast("double") /
            nullif(col("__d")("n_bytes"), lit(0L)) <
            lit(0.25)).as("low_entropy")),
      col("doc_id"))

  /** Golden-signature gate for [[textCompress]]: all-integer sums (byte
    * and deflate totals are exact), so the pin is float-free and
    * partition-independent. */
  def textCompressSig(s: SparkSession, dir: String): DataFrame =
    textCompress(s, dir)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).cast("long").as("sum_bytes"),
        sum(col("deflate_len")).cast("long").as("sum_deflate"),
        sum(col("low_entropy").cast("int")).cast("long").as("n_low_entropy"))

  /** §2.3 #39d — TRAINED quality classifier (the fastText/CCNet-style
    * filter step, distilled to its scalable core): full-batch logistic
    * regression over the gate-proven text features (stopword / punct /
    * upper ratios) with label `lang = 'en'`, 3 deterministic GD
    * iterations at lr 0.5, then per-doc scoring. The DuckDB oracle
    * REPLAYS ALL THREE training iterations (decimal-summed gradients,
    * 6-dp-rounded sigmoid, fixed association) and the scoring pass —
    * the entire train-then-classify pipeline is cross-engine verified,
    * like the BPE trainer. */
  def textQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val st = TextAnalysis.textStats(col("text"))
    val feats = Tables.documents(s, dir)
      .select(col("doc_id"), (col("lang") === "en").cast("int").as("y"),
        st.as("__st"))
      .select(col("doc_id"), col("y"),
        // n_chars via nullif: one empty document would otherwise throw
        // DIVIDE_BY_ZERO under ANSI and kill training; NULL features make
        // the row drop out of every decimal gradient sum and score NULL
        (TextAnalysis.statsField(col("__st"), "en").cast("double") /
          TextAnalysis.statsField(col("__st"), "n_tokens")).as("x_stop"),
        (TextAnalysis.statsField(col("__st"), "n_punct").cast("double") /
          nullif(TextAnalysis.statsField(col("__st"), "n_chars"), lit(0))).as("x_punct"),
        (TextAnalysis.statsField(col("__st"), "n_upper").cast("double") /
          nullif(TextAnalysis.statsField(col("__st"), "n_chars"), lit(0))).as("x_upper"))
      // lazy localCheckpoint, not persist (r21): the feature frame feeds
      // 3 eager GD iterations AND the lazily-returned scoring, so its
      // storage must outlive this function — a persist would register
      // with the CacheManager and serve plan-equal feature subtrees of
      // later bench reps (cross-run reuse); the checkpoint is RDD-keyed
      // and GC-released
      .localCheckpoint(false)
    val w = graft.operators.QualityClassifier.train(
      feats, "y", Seq("x_stop", "x_punct", "x_upper"), lr = 0.5, iters = 3)
    orderedSmall(
      graft.operators.QualityClassifier
        .score(feats, w, Seq("x_stop", "x_punct", "x_upper"))
        .select(col("doc_id"), col("y"), col("p").as("p_en"),
          col("pred").as("pred_en")),
      col("doc_id"))
  }

  /** §2.3 — corpus-trained BPE vocabulary: the first 6 merge rounds of
    * distributed byte-pair-encoding training over the documents corpus.
    * Fully SQL-oracled: DuckDB replays the identical rounds (same
    * segmentation-string representation, same replace-based merge, same
    * freq-desc/pair-asc tie-break), so every merge decision is
    * cross-engine verified — not just pinned. */
  /** One training run per (corpus dir, rounds) per JVM: the vocab and
    * encode entries both need the trained merge list, and retraining
    * inside encode doubled every verify/bench execution's cost. The
    * merges are driver-local by construction (one row per round), the
    * input parquet at a dir is immutable for the run, and the result is
    * session-independent data — so a plain keyed cache is sound. */
  private val bpeMerges = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), Seq[(Int, String, String, String, Long)]]()
  private def trainedBpe(s: SparkSession, dir: String,
      rounds: Int): Seq[(Int, String, String, String, Long)] =
    bpeMerges.computeIfAbsent((dir, rounds), _ =>
      graft.operators.Bpe.trainMergesList(
        Tables.documents(s, dir).select(col("text")), "text", rounds))

  def textBpeVocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainedBpe(s, dir, rounds = 6)
      .toDF("round", "pair_left", "pair_right", "merged", "freq")
      .orderBy(col("round"))
  }

  /** §2.3 — the tokenizer's APPLY side: per-doc word and subword-token
    * counts under the corpus-trained 6-merge vocabulary. Training and
    * encoding both replay in the DuckDB oracle, so the whole
    * train-then-tokenize pipeline is cross-engine verified. */
  def textBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val merges = trainedBpe(s, dir, rounds = 6).map(m => (m._2, m._3))
    orderedSmall(
      graft.operators.Bpe.encodeTokenCounts(docs, "doc_id", "text", merges),
      col("doc_id"))
  }

  /** §2.3 — context-window chunking: every document split into 64-token
    * chunks with 8 tokens of overlap (posexplode keeps the chunk index),
    * the standard long-document preparation step before packing into a
    * model's context. One scan, one kernel call per doc; the only shuffle
    * is the oracle ordering. */
  def textChunks(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokenChunks(col("text"), 64, 8))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id"),
          size(split(col("chunk"), "\\s+")).as("n_tokens"),
          md5(col("chunk")).as("chunk_md5")),
      col("doc_id"), col("chunk_id"))

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_vocab" -> (textBpeVocab _),
    "text_bpe_encode" -> (textBpeEncode _),
    "text_chunks" -> (textChunks _),
    "decontam_overlap" -> (decontamOverlap _),
    "text_top_ngrams" -> (textTopNgrams _),
    "text_tfidf" -> (textTfidf _),
    "text_boilerplate" -> (textBoilerplate _),
    "text_unigram_nll" -> (textUnigramNll _),
    "text_adaptive_filter" -> (textAdaptiveFilter _),
    "text_adaptive_filter_approx" -> (textAdaptiveFilterApprox _),
    "text_line_dedup" -> (textLineDedup _),
    "text_para_dedup" -> (textParaDedup _),
    "text_url_filter" -> (textUrlFilter _),
    "text_bigram_nll" -> (textBigramNll _),
    "text_compress" -> (textCompress _),
    "text_compress_sig" -> (textCompressSig _),
    "text_quality_classifier" -> (textQualityClassifier _),
    "dedup_exact" -> (dedupExact _),
    "dedup_exact_norm" -> (dedupExactNorm _),
    "text_filter" -> (textFilter _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_minhash_sig" -> (dedupMinhashSig _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_simhash_sig" -> (dedupSimhashSig _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_cluster_keep" -> (dedupClusterKeep _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_neardup_incremental" -> (dedupNeardupIncremental _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_weighted_sample" -> (qWeightedSample _),
    "text_dup_spans" -> (textDupSpans _),
    "text_span_filter" -> (textSpanFilter _),
    "decontam_report" -> (decontamReport _),
    "decontam_matrix" -> (decontamMatrix _),
    "q_hash_split" -> (qHashSplit _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_token_budget_mix" -> (qTokenBudgetMix _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_pack_render" -> (qPackRender _),
    "q_shard_manifest" -> (qShardManifest _),
    "embed_neardup" -> (embedNeardup _),
    "ann_topk" -> (annTopk _),
    "ann_lsh" -> (annLsh _),
    "ann_lsh_sig" -> (annLshSig _),
    "ann_ivf" -> (annIvf _),
    "ann_sq8" -> (annSq8 _),
    "ann_pq" -> (annPq _),
    "ann_ivf_pq" -> (annIvfPq _),
    "embed_pca" -> (embedPca _),
    "embed_pca2" -> (embedPca2 _),
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "token_count" -> (tokenCount _),
    "doc_fingerprint" -> (docFingerprint _),
    "doc_fingerprint_sig" -> (docFingerprintSig _),
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_decode_roundtrip" -> (multimodalDecodeRoundtrip _),
    "multimodal_audio" -> (multimodalAudio _),
    "multimodal_video" -> (multimodalVideo _),
    "multimodal_frames" -> (multimodalFrames _),
    "q_sql_functions" -> (sqlFunctions _),
    "text_redact" -> (textRedact _),
    "text_repetition" -> (textRepetition _),
    "embed_centroid" -> (embedCentroid _),
  )

  private val enList = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(",")
  private val deList = TextAnalysis.stopwords("de").map(w => s"'$w'").mkString(",")
  private val frList = TextAnalysis.stopwords("fr").map(w => s"'$w'").mkString(",")
  private val esList = TextAnalysis.stopwords("es").map(w => s"'$w'").mkString(",")

  /** DuckDB replay of [[textBpeVocab]]'s training rounds, generated for a
    * fixed round count: chained CTEs, one (pair-count → top-1 → replace)
    * stage per round over the same ` l  o  w `-framed segmentations. */
  private def bpeOracle(rounds: Int): String = {
    val head =
      """WITH words AS (
        |  SELECT word, count(*) AS wc FROM (
        |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE length(word) >= 2 GROUP BY word),
        |seg0 AS (
        |  SELECT wc, ' ' || array_to_string(
        |      list_transform(generate_series(1, length(word)),
        |        i -> substring(word, i, 1)), '  ') || ' ' AS seg
        |  FROM words)""".stripMargin
    val stages = (1 to rounds).map { r =>
      s"""pr$r AS (
         |  SELECT wc, unnest(list_transform(generate_series(1, len(syms) - 1),
         |      i -> array_to_string(syms[i:i+1], ' '))) AS pair
         |  FROM (SELECT wc, regexp_split_to_array(trim(seg), '\\s+') AS syms
         |        FROM seg${r - 1})),
         |m$r AS (
         |  SELECT $r AS round, split_part(pair, ' ', 1) AS pair_left,
         |    split_part(pair, ' ', 2) AS pair_right, freq
         |  FROM (SELECT pair, CAST(sum(wc) AS BIGINT) AS freq
         |        FROM pr$r GROUP BY pair)
         |  ORDER BY freq DESC, pair LIMIT 1),
         |seg$r AS (
         |  SELECT s.wc, replace(s.seg,
         |    ' ' || m.pair_left || '  ' || m.pair_right || ' ',
         |    ' ' || m.pair_left || m.pair_right || ' ') AS seg
         |  FROM seg${r - 1} s CROSS JOIN m$r m)""".stripMargin
    }
    val union = (1 to rounds).map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ")
    (head +: stages).mkString(",\n") +
      s"""
         |SELECT round, pair_left, pair_right,
         |  pair_left || pair_right AS merged, freq
         |FROM ($union) ORDER BY round""".stripMargin
  }

  /** DuckDB replay of [[textBpeEncode]]: the same training CTE chain as
    * [[bpeOracle]], then every document word char-segments and runs the
    * trained merges as a nested replace chain (scalar subqueries into the
    * per-round top-1 CTEs) before per-doc counting. */
  private def bpeEncodeOracle(rounds: Int): String = {
    val head = bpeOracle(rounds)
    val cte = head.substring(0, head.indexOf("\nSELECT round"))
    val charSegSql =
      """' ' || array_to_string(list_transform(generate_series(1, length(word)),
        |      i -> substring(word, i, 1)), '  ') || ' '""".stripMargin
    val segExpr = (1 to rounds).foldLeft(charSegSql) { (acc, r) =>
      s"""replace($acc,
         |      (SELECT ' ' || pair_left || '  ' || pair_right || ' ' FROM m$r),
         |      (SELECT ' ' || pair_left || pair_right || ' ' FROM m$r))""".stripMargin
    }
    s"""$cte,
       |doc_toks AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id,
       |    len(regexp_split_to_array(trim($segExpr), '\\s+')) AS n_sub
       |  FROM doc_toks)
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subtokens
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** One GD-iteration gradient CTE for the classifier oracle: the same
    * decimal-rounded sums the Spark trainer aggregates. `p` is the
    * (6-dp-rounded) sigmoid under the PREVIOUS iteration's weights. */
  private def qcGrad(name: String, p: String, from: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT
       |    sum(round((y - $p), 9)::DECIMAL(28,9))::DOUBLE AS g0,
       |    sum(round((y - $p) * x1, 9)::DECIMAL(28,9))::DOUBLE AS g1,
       |    sum(round((y - $p) * x2, 9)::DECIMAL(28,9))::DOUBLE AS g2,
       |    sum(round((y - $p) * x3, 9)::DECIMAL(28,9))::DOUBLE AS g3
       |  FROM $from)""".stripMargin
  /** Rounded sigmoid under weights (b, a1, a2, a3) — fixed left-assoc
    * order, matching QualityClassifier.prob exactly. */
  private def qcP(b: String, a1: String, a2: String, a3: String): String =
    s"round(1.0::DOUBLE/(1.0::DOUBLE+exp(-($b + $a1*x1 + $a2*x2 + $a3*x3))), 6)"
  private def qcW(name: String, wPrev: String, g: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT b + 0.5::DOUBLE * g0 / n AS b, a1 + 0.5::DOUBLE * g1 / n AS a1,
       |    a2 + 0.5::DOUBLE * g2 / n AS a2, a3 + 0.5::DOUBLE * g3 / n AS a3
       |  FROM $wPrev CROSS JOIN $g CROSS JOIN nn)""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_bpe_vocab" -> bpeOracle(6),
    "text_bpe_encode" -> bpeEncodeOracle(6),
    // stride 56 = size 64 - overlap 8; slice is 1-based inclusive, so
    // [s+1 : least(s+64, n)] is exactly tokens s..end-1 of the kernel
    "text_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, 56)) AS s
        |  FROM toks)
        |SELECT doc_id, CAST(s // 56 AS INT) AS chunk_id,
        |  CAST(least(s + 64, len(t)) - s AS INT) AS n_tokens,
        |  md5(array_to_string(t[s+1 : least(s+64, len(t))], ' ')) AS chunk_md5
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,
    "decontam_overlap" ->
      """WITH eval_docs AS (
        |  SELECT text FROM documents WHERE doc_id % 7 = 0),
        |train_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 20000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |eval_ng AS (
        |  SELECT DISTINCT unnest(list_transform(
        |      generate_series(1, len(toks) - 4),
        |      i -> array_to_string(toks[i:i+4], ' '))) AS ngram
        |  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |        FROM eval_docs)
        |  WHERE len(toks) >= 5),
        |train_ng AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(toks) - 4),
        |      i -> array_to_string(toks[i:i+4], ' '))) AS ngram
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |        FROM train_docs)
        |  WHERE len(toks) >= 5),
        |agg AS (
        |  SELECT t.doc_id, count(*) AS n_ngrams,
        |    sum(CASE WHEN e.ngram IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_hits
        |  FROM train_ng t LEFT JOIN eval_ng e ON t.ngram = e.ngram
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_ngrams, n_hits,
        |  n_hits::DOUBLE / n_ngrams AS overlap_ratio,
        |  n_hits::DOUBLE / n_ngrams >= 0.5 AS contaminated
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_unigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |counts AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |tot AS (SELECT sum(c)::BIGINT AS t_tokens, count(*) AS v_vocab FROM counts),
        |scored AS (
        |  SELECT t.doc_id,
        |    -ln((counts.c + 1.0::DOUBLE) / (tot.t_tokens + tot.v_vocab)) AS nll
        |  FROM toks t JOIN counts USING (term) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  ((2 * CAST(sum(round(nll, 6)::DECIMAL(18,6)) * 1000000 AS BIGINT)
        |      + count(*)) // (2 * count(*)))::DOUBLE / 1000000 AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // threshold = exact interpolated P90 (quantile_cont ≡ Spark
    // percentile) over the integer-micro-exact NLL scores (the mean is
    // half-up integer arithmetic in BOTH engines — no double division
    // whose 1-ulp wobble can cross a rounding boundary)
    "text_adaptive_filter" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |counts AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |tot AS (SELECT sum(c)::BIGINT AS t_tokens, count(*) AS v_vocab FROM counts),
        |nll AS (
        |  SELECT t.doc_id,
        |    -ln((counts.c + 1.0::DOUBLE) / (tot.t_tokens + tot.v_vocab)) AS nll
        |  FROM toks t JOIN counts USING (term) CROSS JOIN tot),
        |scored AS (
        |  SELECT doc_id,
        |    ((2 * CAST(sum(round(nll, 6)::DECIMAL(18,6)) * 1000000 AS BIGINT)
        |        + count(*)) // (2 * count(*)))::DOUBLE / 1000000 AS avg_nll
        |  FROM nll GROUP BY doc_id),
        |thr AS (SELECT quantile_cont(avg_nll, 0.9::DOUBLE) AS t FROM scored)
        |SELECT doc_id, avg_nll, round(t, 6) AS p90_r,
        |  avg_nll <= round(t, 6) AS kept
        |FROM scored CROSS JOIN thr ORDER BY doc_id""".stripMargin,
    // exact decisions replayed; approx_ok (the <=2%-flips accuracy clause
    // of the percentile_approx drop-in) asserted true — DuckDB has no GK
    // sketch to replay, so that clause is the in-engine half of the gate
    "text_adaptive_filter_approx" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |counts AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |tot AS (SELECT sum(c)::BIGINT AS t_tokens, count(*) AS v_vocab FROM counts),
        |nll AS (
        |  SELECT t.doc_id,
        |    -ln((counts.c + 1.0::DOUBLE) / (tot.t_tokens + tot.v_vocab)) AS nll
        |  FROM toks t JOIN counts USING (term) CROSS JOIN tot),
        |scored AS (
        |  SELECT doc_id,
        |    ((2 * CAST(sum(round(nll, 6)::DECIMAL(18,6)) * 1000000 AS BIGINT)
        |        + count(*)) // (2 * count(*)))::DOUBLE / 1000000 AS avg_nll
        |  FROM nll GROUP BY doc_id),
        |thr AS (SELECT quantile_cont(avg_nll, 0.9::DOUBLE) AS t FROM scored)
        |SELECT doc_id, avg_nll, avg_nll <= round(t, 6) AS kept,
        |  true AS approx_ok
        |FROM scored CROSS JOIN thr ORDER BY doc_id""".stripMargin,
    // the oracle retrains the classifier: 3 GD iterations with the same
    // decimal-summed gradients, 6-dp sigmoid, and w + (lr*g)/n update
    "text_quality_classifier" -> {
      val p = qcP("b", "a1", "a2", "a3")
      s"""WITH f AS (
         |  SELECT doc_id, (lang = 'en')::INT AS y,
         |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |        x -> x IN ($enList)))::DOUBLE
         |      / len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS x1,
         |    length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE
         |      / nullif(length(text), 0) AS x2,
         |    length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE
         |      / nullif(length(text), 0) AS x3
         |  FROM documents),
         |nn AS (SELECT count(*)::BIGINT AS n FROM f),
         |w0 AS (SELECT 0.0::DOUBLE AS b, 0.0::DOUBLE AS a1,
         |  0.0::DOUBLE AS a2, 0.0::DOUBLE AS a3),
         |${qcGrad("gr1", p, "f CROSS JOIN w0")},
         |${qcW("w1", "w0", "gr1")},
         |${qcGrad("gr2", p, "f CROSS JOIN w1")},
         |${qcW("w2", "w1", "gr2")},
         |${qcGrad("gr3", p, "f CROSS JOIN w2")},
         |${qcW("w3", "w2", "gr3")}
         |SELECT doc_id, y, $p AS p_en, $p >= 0.5::DOUBLE AS pred_en
         |FROM f CROSS JOIN w3 ORDER BY doc_id""".stripMargin
    },
    // keep-first = row_number over md5(line) ordered by (doc, pos);
    // 1-based DuckDB positions vs 0-based Spark are internal only
    "text_line_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text || chr(10) || '=== SHARED FOOTER ===' AS text
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, generate_subscripts(string_split(text, chr(10)), 1) AS i,
        |    unnest(string_split(text, chr(10))) AS line
        |  FROM corpus),
        |ranked AS (
        |  SELECT doc_id, i, line,
        |    row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, i) AS rn
        |  FROM pos WHERE length(trim(line)) > 0),
        |kept AS (
        |  SELECT doc_id, i, line FROM pos WHERE length(trim(line)) = 0
        |  UNION ALL
        |  SELECT doc_id, i, line FROM ranked WHERE rn = 1),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, length(coalesce(r.text, '')) AS n_chars_kept,
        |  coalesce(r.text, '') AS text
        |FROM corpus c LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin,
    // planted URLs, RE2/Java-shared extraction pattern, NOT IN blocklist
    "text_url_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'https://host' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/doc/'
        |      || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^https?://([^/]+)/', 1) AS domain
        |FROM d
        |WHERE regexp_extract(url, '^https?://([^/]+)/', 1)
        |  NOT IN ('host0.example.com', 'host3.example.com')
        |ORDER BY doc_id""".stripMargin,
    // same replay as text_line_dedup at paragraph granularity: units
    // split on the double newline, keep-first by (doc, pos)
    "text_para_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text || chr(10) || chr(10) ||
        |    '=== SHARED DISCLAIMER ===' || chr(10) || 'please do not redistribute'
        |    AS text
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, chr(10) || chr(10)), 1) AS i,
        |    unnest(string_split(text, chr(10) || chr(10))) AS unit
        |  FROM corpus),
        |ranked AS (
        |  SELECT doc_id, i, unit,
        |    row_number() OVER (PARTITION BY md5(unit) ORDER BY doc_id, i) AS rn
        |  FROM pos WHERE length(trim(unit)) > 0),
        |kept AS (
        |  SELECT doc_id, i, unit FROM pos WHERE length(trim(unit)) = 0
        |  UNION ALL
        |  SELECT doc_id, i, unit FROM ranked WHERE rn = 1),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(unit, chr(10) || chr(10) ORDER BY i) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, length(coalesce(r.text, '')) AS n_chars_kept,
        |  coalesce(r.text, '') AS text
        |FROM corpus c LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin,
    // λ literals written as 0.7/0.3 in BOTH engines (1-0.7 != 0.3 in
    // IEEE double); per-doc mean decimal-summed over tf-weighted rounded
    // NLLs — same reproducibility regime as text_unigram_nll
    "text_bigram_nll" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |uni AS (SELECT unnest(toks) AS term FROM t),
        |ucounts AS (SELECT term, count(*) AS cu FROM uni GROUP BY term),
        |tot AS (SELECT sum(cu)::BIGINT AS t_tokens, count(*) AS v_vocab FROM ucounts),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(toks) - 1),
        |      i -> array_to_string(toks[i:i+1], ' '))) AS bg
        |  FROM t WHERE len(toks) >= 2),
        |bgc AS (SELECT bg, count(*) AS cbg FROM bg GROUP BY bg),
        |hist AS (
        |  SELECT split_part(bg, ' ', 1) AS w1, sum(cbg)::BIGINT AS ch
        |  FROM bgc GROUP BY 1),
        |tf AS (SELECT doc_id, bg, count(*) AS tf FROM bg GROUP BY doc_id, bg),
        |scored AS (
        |  SELECT f.doc_id, f.tf,
        |    -ln(0.7::DOUBLE * bgc.cbg / hist.ch +
        |        0.3::DOUBLE * (uc.cu + 1.0::DOUBLE) / (tot.t_tokens + tot.v_vocab)) AS nll
        |  FROM tf f
        |  JOIN bgc USING (bg)
        |  JOIN hist ON hist.w1 = split_part(f.bg, ' ', 1)
        |  JOIN ucounts uc ON uc.term = split_part(f.bg, ' ', 2)
        |  CROSS JOIN tot)
        |SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
        |  ((2 * CAST(sum(round(nll, 6)::DECIMAL(18,6) * tf) * 1000000 AS BIGINT)
        |      + sum(tf)) // (2 * sum(tf)))::DOUBLE / 1000000 AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_boilerplate" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    '=== COMMON HEADER ===' || chr(10) || text || chr(10) ||
        |      '=== COMMON FOOTER ===' AS text
        |  FROM documents),
        |dl AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, chr(10))) AS line
        |  FROM corpus),
        |boiler AS (
        |  SELECT line FROM dl WHERE length(trim(line)) > 0
        |  GROUP BY line HAVING count(*) >= 3),
        |pos AS (
        |  SELECT doc_id, generate_subscripts(string_split(text, chr(10)), 1) AS i,
        |    unnest(string_split(text, chr(10))) AS line
        |  FROM corpus),
        |kept AS (
        |  SELECT p.doc_id, p.i, p.line
        |  FROM pos p LEFT JOIN boiler b USING (line) WHERE b.line IS NULL),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, length(coalesce(r.text, '')) AS n_chars_clean,
        |  coalesce(r.text, '') AS text
        |FROM corpus c LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin,
    "text_top_ngrams" ->
      """WITH ng AS (
        |  SELECT unnest(list_transform(
        |      generate_series(1, len(toks) - 1),
        |      i -> array_to_string(toks[i:i+1], ' '))) AS ngram
        |  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 2)
        |SELECT ngram, count(*) AS n_occurrences
        |FROM ng GROUP BY ngram
        |ORDER BY n_occurrences DESC, ngram LIMIT 20""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |tot AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |scored AS (
        |  -- every fractional literal cast to DOUBLE: DuckDB parses bare
        |  -- 1.2 as DECIMAL and decimal-division rounding would diverge
        |  -- from Spark's IEEE double arithmetic
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    tf.tf * ln((tot.n_docs + 1.0::DOUBLE) / (df.df + 1.0::DOUBLE)) AS tfidf,
        |    ln(1.0::DOUBLE + (tot.n_docs - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE)) *
        |      (tf.tf * (1.2::DOUBLE + 1)) /
        |      (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / tot.avgdl)) AS bm25
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN tot),
        |ranked AS (
        |  SELECT doc_id, term, tf, tfidf, bm25,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, tf,
        |  round(tfidf, 6) AS tfidf_r, round(bm25, 6) AS bm25_r
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // closed form of the planted chain under keep-longest: the v2xx
    // generation (longest tail) survives each cluster; everything
    // unclustered survives untouched
    "dedup_keep_best" ->
      """SELECT doc_id, len FROM (
        |  SELECT doc_id, length(text)::BIGINT AS len
        |  FROM documents WHERE doc_id % 20 <> 0
        |  UNION ALL
        |  SELECT doc_id + 200000, (length(text) + 5)::BIGINT
        |  FROM documents WHERE doc_id % 20 = 0
        |) t ORDER BY doc_id""".stripMargin,
    // batch-vs-corpus anti-join on (md5:len) signatures + keep-first
    // within the batch, replayed literally
    "dedup_incremental" ->
      """WITH batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 70000, text FROM documents WHERE doc_id % 9 = 0),
        |corpus AS (
        |  SELECT text FROM documents WHERE doc_id % 3 <> 0
        |  UNION ALL
        |  SELECT text FROM documents WHERE doc_id % 6 = 0),
        |csigs AS (
        |  SELECT DISTINCT md5(text) || ':' || length(text)::VARCHAR AS sig
        |  FROM corpus),
        |surv AS (
        |  SELECT doc_id, text,
        |    row_number() OVER (
        |      PARTITION BY md5(text) || ':' || length(text)::VARCHAR
        |      ORDER BY doc_id) AS rn
        |  FROM batch
        |  WHERE md5(text) || ':' || length(text)::VARCHAR
        |    NOT IN (SELECT sig FROM csigs))
        |SELECT doc_id, length(text)::BIGINT AS len FROM surv
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // closed form: edited copies screen out (band-collide + verify),
    // hex-digest rows share no prose shingles and survive
    "dedup_neardup_incremental" ->
      """SELECT doc_id + 40000 AS doc_id, md5(text) AS text
        |FROM documents WHERE doc_id % 10 = 5
        |ORDER BY doc_id""".stripMargin,
    // Efraimidis-Spirakis keys replayed: 13 md5 hex digits -> exact
    // 52-bit uniform, pow key rounded to 9 with doc_id tiebreak
    "q_weighted_sample" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, source, n_tokens,
        |    round(pow(
        |      ((('0x' || substr(md5('wsr' || CAST(doc_id AS VARCHAR)), 1, 13))
        |        ::BIGINT)::DOUBLE + 0.5) / 4503599627370496.0,
        |      1.0 / n_tokens::DOUBLE), 9) AS key
        |  FROM t WHERE n_tokens > 0),
        |r AS (
        |  SELECT doc_id, source, n_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id) AS rn
        |  FROM k)
        |SELECT doc_id, source, n_tokens FROM r WHERE rn <= 5
        |ORDER BY source, doc_id""".stripMargin,
    // v2 rebuilt literally; status from hash comparison on the full outer
    "q_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' upd' ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 90000, md5(text) FROM documents WHERE doc_id % 17 = 0)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.h1 IS NULL THEN 'added'
        |       WHEN v2.h2 IS NULL THEN 'removed'
        |       WHEN v1.h1 <> v2.h2 THEN 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |WHERE CASE WHEN v1.h1 IS NULL THEN 'added'
        |       WHEN v2.h2 IS NULL THEN 'removed'
        |       WHEN v1.h1 <> v2.h2 THEN 'changed' END IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // positioned 8-gram fingerprints: spans duplicated across (doc,pos)
    // sites, per-doc site count + island-merged token coverage via the
    // same running-max window as the Spark plan
    "text_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
        |  FROM toks WHERE len(t) >= 8),
        |spans AS (
        |  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+7], ' ')) AS g
        |  FROM st),
        |dup AS (SELECT g FROM spans GROUP BY g HAVING count(*) > 1),
        |dp AS (SELECT doc_id, pos FROM spans JOIN dup USING (g)),
        |cov AS (
        |  SELECT doc_id, greatest(0, pos + 8 - greatest(coalesce(
        |      max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos), pos)) AS c
        |  FROM dp)
        |SELECT doc_id, count(*) AS n_dup_spans, sum(c)::BIGINT AS dup_tokens
        |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // span stats + whitespace token totals -> 30% coverage filter; the
    // fraction literal is ::DOUBLE so both engines compare in IEEE
    "text_span_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
        |  FROM toks WHERE len(t) >= 8),
        |spans AS (
        |  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+7], ' ')) AS g
        |  FROM st),
        |dup AS (SELECT g FROM spans GROUP BY g HAVING count(*) > 1),
        |dp AS (SELECT doc_id, pos FROM spans JOIN dup USING (g)),
        |cov AS (
        |  SELECT doc_id, greatest(0, pos + 8 - greatest(coalesce(
        |      max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos), pos)) AS c
        |  FROM dp),
        |stats AS (SELECT doc_id, sum(c)::BIGINT AS dup_tokens FROM cov GROUP BY doc_id)
        |SELECT k.doc_id FROM (
        |  SELECT doc_id, len(t)::BIGINT AS n FROM toks) k
        |LEFT JOIN stats s ON k.doc_id = s.doc_id
        |WHERE coalesce(s.dup_tokens, 0)::DOUBLE <= k.n::DOUBLE * 0.3::DOUBLE
        |ORDER BY k.doc_id""".stripMargin,
    // distinct (source, 5-gram) -> source-set per gram -> pair counts;
    // sim = exact int/int Jaccard of the two gram sets
    "decontam_matrix" ->
      """WITH g AS (
        |  SELECT DISTINCT source AS src, unnest(list_transform(
        |      generate_series(1, len(toks) - 4),
        |      i -> array_to_string(toks[i:i+4], ' '))) AS gram
        |  FROM (SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 5),
        |tot AS (SELECT src, count(*)::BIGINT AS n FROM g GROUP BY src),
        |sh AS (
        |  SELECT a.src AS src_a, b.src AS src_b, count(*)::BIGINT AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, shared,
        |  shared::DOUBLE / (ta.n + tb.n - shared) AS sim
        |FROM sh
        |JOIN tot ta ON ta.src = sh.src_a
        |JOIN tot tb ON tb.src = sh.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    // per-eval view: distinct 5-grams per eval doc, membership-probed
    // against the distinct train gram set (half the eval docs planted)
    "decontam_report" ->
      """WITH eval_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |train_docs AS (
        |  SELECT text FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT text FROM documents WHERE doc_id % 14 = 0),
        |eval_ng AS (
        |  SELECT DISTINCT doc_id, ngram FROM (
        |    SELECT doc_id, unnest(list_transform(
        |        generate_series(1, len(toks) - 4),
        |        i -> array_to_string(toks[i:i+4], ' '))) AS ngram
        |    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |          FROM eval_docs)
        |    WHERE len(toks) >= 5)),
        |train_ng AS (
        |  SELECT DISTINCT unnest(list_transform(
        |      generate_series(1, len(toks) - 4),
        |      i -> array_to_string(toks[i:i+4], ' '))) AS ngram
        |  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |        FROM train_docs)
        |  WHERE len(toks) >= 5)
        |SELECT e.doc_id, count(*) AS n_ngrams,
        |  sum(CASE WHEN t.ngram IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_hit,
        |  sum(CASE WHEN t.ngram IS NULL THEN 0 ELSE 1 END)::DOUBLE / count(*)
        |    AS hit_ratio,
        |  sum(CASE WHEN t.ngram IS NULL THEN 0 ELSE 1 END)::DOUBLE / count(*) >= 0.5
        |    AS burned
        |FROM eval_ng e LEFT JOIN train_ng t USING (ngram)
        |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,
    // closed form of the planted chain: originals keep themselves; both
    // copy generations collapse (transitively) onto the original's cluster
    "dedup_cluster_keep" ->
      """SELECT doc_id, cluster, kept FROM (
        |  SELECT doc_id, doc_id AS cluster, true AS kept FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, doc_id, false FROM documents WHERE doc_id % 20 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000, doc_id, false FROM documents WHERE doc_id % 20 = 0
        |) t ORDER BY doc_id""".stripMargin,
    // per-stratum rates: en 0.5 -> '8000', fr 1.0 -> always, rest 0.1 -> '199a'
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CASE lang
        |  WHEN 'en' THEN substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        |  WHEN 'fr' THEN true
        |  ELSE substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 4) < '199a'
        |END
        |ORDER BY doc_id""".stripMargin,
    "q_token_budget_mix" ->
      """SELECT doc_id, source, n_tokens, cum_weight FROM (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY md5('mix' || CAST(doc_id AS VARCHAR))
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_weight
        |  FROM (SELECT doc_id, source,
        |      CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
        |        AS n_tokens
        |    FROM documents))
        |WHERE cum_weight <= (CASE source WHEN 'src0' THEN 120
        |  WHEN 'src1' THEN 0 ELSE 200 END)
        |ORDER BY doc_id""".stripMargin,
    // same md5-hex-prefix string compare, fraction thresholds in hex:
    // 0.9 -> e666, 0.95 -> f333, 0.25 -> 4000
    // same window as q_pack_sequences; the bin text renders in packer
    // (md5) order with the chr(10)<|eos|>chr(10) separator, then digests
    "q_pack_render" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, text, n_tokens,
        |    substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
        |    md5('pack' || CAST(doc_id AS VARCHAR)) AS h,
        |    CAST(sum(n_tokens) OVER (
        |      PARTITION BY substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 1)
        |      ORDER BY md5('pack' || CAST(doc_id AS VARCHAR))
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM base),
        |b AS (
        |  SELECT bucket, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin,
        |    text, n_tokens, h
        |  FROM w)
        |SELECT bucket, bin, count(*) AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
        |  md5(string_agg(text, chr(10) || '<|eos|>' || chr(10) ORDER BY h, text))
        |    AS seq_md5
        |FROM b GROUP BY bucket, bin ORDER BY bucket, bin""".stripMargin,
    // shard = md5-hex-prefix parsed as int mod 8 (Spark conv ≡ DuckDB
    // '0x' cast); content_sig = md5 over the numerically-sorted id list
    "q_shard_manifest" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER
        |      % 8) AS shard_id,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents)
        |SELECT shard_id, count(*) AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
        |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
        |    AS content_sig
        |FROM d GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    "q_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
        |       WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
        |       ELSE 'test' END AS split,
        |  substr(md5('s2' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000' AS in_quarter
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM corpus GROUP BY text HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,
    "dedup_exact_norm" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, upper(text) || '  ' FROM documents WHERE doc_id % 5 = 0),
        |normed AS (
        |  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
        |  FROM corpus)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM normed GROUP BY t HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,
    "text_filter" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang, n_chars, text,
        |    length(text) AS nc,
        |    len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        |        x -> x IN ($enList))) AS n_stop
        |  FROM documents)
        |SELECT doc_id, lang, n_chars FROM t
        |WHERE n_tokens >= 20
        |  AND n_stop::DOUBLE / n_tokens >= 0.01
        |  AND (nc - (n_tokens - 1))::DOUBLE / n_tokens < 12.0
        |ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text || '$DupTail' FROM documents WHERE doc_id % 5 = 0),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    list_filter(
        |      [substr(lower(text), x::INT, 3) for x in range(1, greatest(length(text)-1, 2))],
        |      g -> length(g) = 3)) AS s
        |  FROM corpus)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE /
        |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 10000
        |WHERE a.doc_id % 5 = 0 AND a.doc_id < 10000
        |ORDER BY id_a""".stripMargin,
    // Golden signatures, SF-RELATIVE: the sketch/fingerprint hash families
    // are not SQL-expressible, so these gates pin each pipeline's full
    // output via an exact aggregate signature computed once from the
    // verified implementation — any regression in shingling, hashing,
    // banding, winnowing, or verification moves the signature and fails
    // the hash compare. The expected row is selected by a corpus
    // DISCRIMINANT read from the data itself (sum of documents text
    // lengths — unique across the three driver SFs, where row count alone
    // is not: sf0.001 and sf0.01 both have 500 docs), so the same gate is
    // green at sf0.001/sf0.01/sf0.1 with no exemption class; an unknown
    // corpus selects NO row and fails the rows compare loudly instead of
    // silently passing.
    // integer-exact deflate totals (JDK zlib, level 6, nowrap)
    "text_compress_sig" ->
      """WITH k AS (SELECT sum(length(text)) AS sl FROM documents)
        |SELECT n_docs, sum_bytes, sum_deflate, n_low_entropy
        |FROM (VALUES
        |  (153156,  CAST(500 AS BIGINT),  CAST(153156 AS BIGINT),  CAST(72598 AS BIGINT),  CAST(0 AS BIGINT)),
        |  (149174,  CAST(500 AS BIGINT),  CAST(149174 AS BIGINT),  CAST(71349 AS BIGINT),  CAST(0 AS BIGINT)),
        |  (1485576, CAST(5000 AS BIGINT), CAST(1485576 AS BIGINT), CAST(710682 AS BIGINT), CAST(0 AS BIGINT))
        |) AS sig(sl, n_docs, sum_bytes, sum_deflate, n_low_entropy)
        |JOIN k ON sig.sl = k.sl""".stripMargin,
    "dedup_minhash_sig" ->
      """WITH k AS (SELECT sum(length(text)) AS sl FROM documents)
        |SELECT n_pairs, sum_ida, sum_idb, sum_j
        |FROM (VALUES
        |  (153156,  CAST(134 AS BIGINT),  CAST(57806 AS BIGINT),   CAST(1093715 AS BIGINT),  CAST(120.572928 AS DOUBLE)),
        |  (149174,  CAST(130 AS BIGINT),  CAST(30007 AS BIGINT),   CAST(1084397 AS BIGINT),  CAST(116.230869 AS DOUBLE)),
        |  (1485576, CAST(1258 AS BIGINT), CAST(3073134 AS BIGINT), CAST(13381227 AS BIGINT), CAST(1129.670585 AS DOUBLE))
        |) AS sig(sl, n_pairs, sum_ida, sum_idb, sum_j)
        |JOIN k ON sig.sl = k.sl""".stripMargin,
    "dedup_simhash_sig" ->
      """WITH k AS (SELECT sum(length(text)) AS sl FROM documents)
        |SELECT n_pairs, sum_ida, sum_idb, sum_ham
        |FROM (VALUES
        |  (153156,  CAST(59 AS BIGINT),  CAST(12175 AS BIGINT),   CAST(376812 AS BIGINT),  CAST(116 AS BIGINT)),
        |  (149174,  CAST(66 AS BIGINT),  CAST(14999 AS BIGINT),   CAST(449384 AS BIGINT),  CAST(130 AS BIGINT)),
        |  (1485576, CAST(587 AS BIGINT), CAST(1382942 AS BIGINT), CAST(5346322 AS BIGINT), CAST(1093 AS BIGINT))
        |) AS sig(sl, n_pairs, sum_ida, sum_idb, sum_ham)
        |JOIN k ON sig.sl = k.sl""".stripMargin,
    "doc_fingerprint_sig" ->
      """WITH k AS (SELECT sum(length(text)) AS sl FROM documents)
        |SELECT n_docs, sum_fp_mod, sum_winnow
        |FROM (VALUES
        |  (153156,  CAST(500 AS BIGINT),  CAST(377937181 AS BIGINT),  CAST(16131 AS BIGINT)),
        |  (149174,  CAST(500 AS BIGINT),  CAST(376978025 AS BIGINT),  CAST(15671 AS BIGINT)),
        |  (1485576, CAST(5000 AS BIGINT), CAST(3760687987 AS BIGINT), CAST(155958 AS BIGINT))
        |) AS sig(sl, n_docs, sum_fp_mod, sum_winnow)
        |JOIN k ON sig.sl = k.sl""".stripMargin,
    // the ANN gate reads embeddings, but embeddings row counts collide at
    // sf0.001/sf0.01 (500 each) — the documents discriminant identifies
    // the SF dir as a whole, so it keys this gate too
    "ann_lsh_sig" ->
      """WITH k AS (SELECT sum(length(text)) AS sl FROM documents)
        |SELECT n_rows, sum_qid, sum_nid, sum_rank, sum_cos
        |FROM (VALUES
        |  (153156,  CAST(100 AS BIGINT), CAST(950 AS BIGINT), CAST(26596 AS BIGINT), CAST(300 AS BIGINT), CAST(30.218323 AS DOUBLE)),
        |  (149174,  CAST(100 AS BIGINT), CAST(950 AS BIGINT), CAST(26423 AS BIGINT), CAST(300 AS BIGINT), CAST(31.289087 AS DOUBLE)),
        |  (1485576, CAST(100 AS BIGINT), CAST(950 AS BIGINT), CAST(93428 AS BIGINT), CAST(300 AS BIGINT), CAST(36.621895 AS DOUBLE))
        |) AS sig(sl, n_rows, sum_qid, sum_nid, sum_rank, sum_cos)
        |JOIN k ON sig.sl = k.sl""".stripMargin,
    "embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |           FROM embeddings WHERE vec_id < 100)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.emb, b.emb), 6) AS cos_r
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, id_a, id_b
        |LIMIT 50""".stripMargin,
    // full-probe IVF is exact → same oracle as brute force
    "ann_ivf" ->
      """WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id >= 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.emb, c.emb) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id) AS rank
        |  FROM q CROSS JOIN c)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_r
        |FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // same brute-force oracle as ann_topk: SQ8's exact re-rank must
    // round-trip the quantized pre-ranking back to the exact answer
    "ann_sq8" ->
      """WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id >= 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.emb, c.emb) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id) AS rank
        |  FROM q CROSS JOIN c)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_r
        |FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // the oracle replays all 3 power iterations: per-dim decimal sums,
    // decimal-squared norms, seed 1/√64 = 0.125 exact in binary
    "embed_pca" -> {
      def wCte(i: Int, vPrev: String) =
        s"""w$i AS (
           |  SELECT d, sum(round(p * x[d], 9)::DECIMAL(28,9))::DOUBLE AS w
           |  FROM (SELECT x, list_inner_product(x, (SELECT v FROM $vPrev)) AS p FROM f)
           |  CROSS JOIN dims GROUP BY d)""".stripMargin
      def nCte(i: Int) =
        s"n$i AS MATERIALIZED (SELECT sqrt(sum(round(w*w, 9)::DECIMAL(28,9))::DOUBLE) AS nrm FROM w$i)"
      def vCte(i: Int) =
        s"v$i AS MATERIALIZED (SELECT list(w / (SELECT nrm FROM n$i) ORDER BY d) AS v FROM w$i)"
      s"""WITH f AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |v0 AS (SELECT list_transform(generate_series(1, 64), i -> 0.125::DOUBLE) AS v),
         |${wCte(1, "v0")}, ${nCte(1)}, ${vCte(1)},
         |${wCte(2, "v1")}, ${nCte(2)}, ${vCte(2)},
         |${wCte(3, "v2")}, ${nCte(3)}, ${vCte(3)}
         |SELECT vec_id,
         |  round(list_inner_product(x, (SELECT v FROM v3)), 6) AS proj_r,
         |  round((SELECT nrm FROM n3), 6) AS lambda_r
         |FROM f ORDER BY vec_id""".stripMargin
    },
    // both chains + the deflation replayed; lambdas reference v via
    // CROSS JOIN (DuckDB forbids subqueries inside lambdas)
    "embed_pca2" -> {
      def wCte(name: String, src: String, vPrev: String) =
        s"""$name AS MATERIALIZED (
           |  SELECT d, sum(round(p * x[d], 9)::DECIMAL(28,9))::DOUBLE AS w
           |  FROM (SELECT x, list_inner_product(x, (SELECT v FROM $vPrev)) AS p FROM $src)
           |  CROSS JOIN dims GROUP BY d)""".stripMargin
      def nCte(name: String, w: String) =
        s"$name AS MATERIALIZED (SELECT sqrt(sum(round(w*w, 9)::DECIMAL(28,9))::DOUBLE) AS nrm FROM $w)"
      def vCte(name: String, w: String, n: String) =
        s"$name AS MATERIALIZED (SELECT list(w / (SELECT nrm FROM $n) ORDER BY d) AS v FROM $w)"
      s"""WITH f AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
         |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
         |v0 AS (SELECT list_transform(generate_series(1, 64), i -> 0.125::DOUBLE) AS v),
         |${wCte("w1", "f", "v0")}, ${nCte("n1", "w1")}, ${vCte("v1", "w1", "n1")},
         |${wCte("w2", "f", "v1")}, ${nCte("n2", "w2")}, ${vCte("v2", "w2", "n2")},
         |${wCte("w3", "f", "v2")}, ${nCte("n3", "w3")}, ${vCte("v3", "w3", "n3")},
         |fd AS MATERIALIZED (
         |  SELECT vec_id, list_transform(generate_series(1, 64),
         |    i -> x[i] - list_inner_product(x, v) * v[i]) AS x
         |  FROM f CROSS JOIN v3),
         |${wCte("w21", "fd", "v0")}, ${nCte("n21", "w21")}, ${vCte("v21", "w21", "n21")},
         |${wCte("w22", "fd", "v21")}, ${nCte("n22", "w22")}, ${vCte("v22", "w22", "n22")},
         |${wCte("w23", "fd", "v22")}, ${nCte("n23", "w23")}, ${vCte("v23", "w23", "n23")}
         |SELECT f.vec_id,
         |  round(list_inner_product(f.x, (SELECT v FROM v3)), 6) AS p1_r,
         |  round(list_inner_product(fd.x, (SELECT v FROM v23)), 6) AS p2_r,
         |  round((SELECT nrm FROM n3), 6) AS l1_r,
         |  round((SELECT nrm FROM n23), 6) AS l2_r
         |FROM f JOIN fd USING (vec_id) ORDER BY f.vec_id""".stripMargin
    },
    // full-probe + full-pool IVF-PQ is exact → brute-force truth
    "ann_ivf_pq" ->
      """WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id >= 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.emb, c.emb) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id) AS rank
        |  FROM q CROSS JOIN c)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_r
        |FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // same exact-top-k truth as ann_sq8: PQ + re-rank must recover it
    "ann_pq" ->
      """WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id >= 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.emb, c.emb) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id) AS rank
        |  FROM q CROSS JOIN c)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_r
        |FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "ann_topk" ->
      """WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id >= 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.emb, c.emb) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id) AS rank
        |  FROM q CROSS JOIN c)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_r
        |FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "text_langid" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
        |    regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, lang, cjk,
        |    len(list_filter(toks, x -> x IN ($enList))) AS en,
        |    len(list_filter(toks, x -> x IN ($deList))) AS de,
        |    len(list_filter(toks, x -> x IN ($frList))) AS fr,
        |    len(list_filter(toks, x -> x IN ($esList))) AS es
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN cjk > 0 THEN 'zh'
        |       WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |       WHEN de >= fr AND de >= es THEN 'de'
        |       WHEN fr >= es THEN 'fr' ELSE 'es' END AS pred_lang,
        |  (CASE WHEN cjk > 0 THEN 'zh'
        |       WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |       WHEN de >= fr AND de >= es THEN 'de'
        |       WHEN fr >= es THEN 'fr' ELSE 'es' END) = lang AS matches_label
        |FROM hits ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (
        |  SELECT doc_id, text,
        |    length(text) AS n_chars,
        |    len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
        |    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
        |    length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        |        x -> x IN ($enList))) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_chars, n_tokens,
        |  n_punct::DOUBLE / nullif(n_chars, 0) AS punct_ratio,
        |  n_upper::DOUBLE / nullif(n_chars, 0) AS upper_ratio,
        |  (n_chars - (n_tokens - 1))::DOUBLE / n_tokens AS mean_token_len,
        |  n_stop::DOUBLE / n_tokens AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sql_functions" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang, text,
        |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
        |    regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, text, toks, cjk,
        |    len(list_filter(toks, x -> x IN ($enList))) AS en,
        |    len(list_filter(toks, x -> x IN ($deList))) AS de,
        |    len(list_filter(toks, x -> x IN ($frList))) AS fr,
        |    len(list_filter(toks, x -> x IN ($esList))) AS es
        |  FROM t)
        |SELECT doc_id,
        |  len(toks) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish,
        |  CASE WHEN cjk > 0 THEN 'zh'
        |       WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |       WHEN de >= fr AND de >= es THEN 'de'
        |       WHEN fr >= es THEN 'fr' ELSE 'es' END AS pred_lang
        |FROM hits ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id AS id,
        |  octet_length(encode(text)) AS n_bytes,
        |  octet_length(encode(text)) % 64 AS width,
        |  (octet_length(encode(text)) // 64) % 64 AS height
        |FROM documents ORDER BY id""".stripMargin,
    "q_pack_sequences" ->
      """SELECT doc_id, bucket, n_tokens, cum_weight,
        |  CAST(floor((cum_weight - n_tokens) / 512.0) AS BIGINT) AS bin
        |FROM (
        |  SELECT doc_id,
        |    substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
        |    n_tokens,
        |    CAST(sum(n_tokens) OVER (
        |      PARTITION BY substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 1)
        |      ORDER BY md5('pack' || CAST(doc_id AS VARCHAR))
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_weight
        |  FROM (SELECT doc_id,
        |      CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
        |        AS n_tokens
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // the analytic truth of the executor-encoded raster geometry: the
    // Spark side must recover these through a REAL ImageIO encode→decode
    "multimodal_decode_roundtrip" ->
      """SELECT doc_id, CAST(4 + doc_id % 13 AS INT) AS width,
        |  CAST(3 + doc_id % 7 AS INT) AS height
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // the analytic truth of the synthesized PCM stream: geometry from
    // doc_id, rms_ok because a half-amplitude sine's RMS is a/sqrt(2)
    "multimodal_audio" ->
      """SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  8000 * (1 + doc_id % 3) AS n_frames,
        |  1000 * (1 + doc_id % 3) AS duration_ms,
        |  true AS rms_ok
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // analytic truth of the synthesized animation: frame fan-out and
    // geometry from doc_id; rgb_ok because solid GIF frames round-trip
    "multimodal_video" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(8 + doc_id % 5 AS INT) AS width,
        |  CAST(6 + doc_id % 3 AS INT) AS height,
        |  true AS rgb_ok
        |FROM (
        |  SELECT doc_id, unnest(generate_series(0, CAST(1 + doc_id % 4 AS BIGINT))) AS f
        |  FROM documents WHERE doc_id < 60)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // documents are ASCII (octet_length = length verified), so text
    // substring is byte-exact for the frame windows
    "multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS id, text AS b, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT id, CAST(i AS INT) AS frame_idx, i * 512 AS offset,
        |  md5(substring(b, CAST(i * 512 + 1 AS INT), 256)) AS frame_md5
        |FROM m, generate_series(0, 7) s(i)
        |WHERE i * 512 + 256 <= n
        |ORDER BY id, frame_idx""".stripMargin,
    "text_redact" ->
      s"""WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |           THEN ' contact user' || doc_id || '@example.com or admin@test.org now'
        |         WHEN doc_id % 3 = 1
        |           THEN ' call 555-123-4567 or 555-999-0000 today'
        |         ELSE ' server at 10.0.0.7 and 192.168.1.42 responded' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
        |    '${TextAnalysis.IpRe}', '<IP>', 'g'),
        |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.IpRe}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones
        |FROM planted ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |bg AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS b
        |  FROM w),
        |cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |top AS (SELECT doc_id, max(c) AS top_bigram_n,
        |    count(*) AS n_distinct_bigrams FROM cnt GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(l) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct_words,
        |  top_bigram_n, n_distinct_bigrams
        |FROM w JOIN top ON w.doc_id = top.doc_id
        |ORDER BY w.doc_id""".stripMargin,
    // exact scaled-long element-wise sums (float -> round(v*1e6) as BIGINT)
    // so the distributed fold is order-independent on both engines
    "embed_centroid" ->
      """WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS ord,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS se
        |  FROM embeddings),
        |n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label),
        |s AS (SELECT label, CAST(ord - 1 AS BIGINT) AS dim,
        |    CAST(sum(se) AS BIGINT) AS sum_scaled FROM e GROUP BY label, ord)
        |SELECT s.label, s.dim, s.sum_scaled, n.n_vecs
        |FROM s JOIN n ON s.label = n.label
        |ORDER BY s.label, s.dim""".stripMargin,
  )
}
