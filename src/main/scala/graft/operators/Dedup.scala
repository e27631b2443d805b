package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Deduplication operators for training-data pipelines (SURVEY.md §2.3
  * #31-35). Every operator is shaped for 100 TB: no all-pairs comparisons —
  * candidates come from hash buckets (exact), LSH band buckets (MinHash),
  * or pigeonhole chunks (SimHash), and only candidates are verified.
  */
object Dedup {

  /** Exact duplicate groups. Groups on `(md5, length)` of the (optionally
    * normalized) text instead of the text itself, so the shuffle carries
    * 24 bytes per row, not documents. Returns one row per duplicate group:
    * `(keep_id, n_copies)` with keep_id = min id. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String,
      normalize: Boolean = false): DataFrame = {
    val t = if (normalize) regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
            else col(textCol)
    docs
      .select(col(idCol), md5(t).as("__h"), length(t).as("__len"))
      .groupBy(col("__h"), col("__len"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
  }

  /** Exact-duplicate pairs among SUB-K (shingle-less) documents — the
    * companion every banding pipeline unions in: `hasShingles` excludes
    * sub-k texts from banding (their sentinel signatures would band-join
    * all-pairs, Θ(N²)), but two IDENTICAL sub-k texts are still real
    * duplicates a near-dup pass must report. Candidates come from a
    * hash-groupBy on `(md5, length)` — 24 bytes/row over the sub-k slice
    * only, never text, never all-pairs. Pair output is quadratic in copy
    * multiplicity (as is the main path's within-group expansion): run
    * [[exactGroups]] removal first if short boilerplate has million-copy
    * groups. */
  private def subkExactPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame =
    docs
      .filter(!graft.functions.Sketches.hasShingles(col(textCol), shingleK))
      // LOWERCASED, matching the shingle kernel's equality: two sub-k
      // texts differing only in case would pair at Jaccard 1.0 if they
      // were long enough to shingle, so the companion must use the same
      // duplicate definition, not a stricter byte-exact one
      .select(col(idCol), md5(lower(col(textCol))).as("__h"),
        length(lower(col(textCol))).as("__len"))
      .groupBy(col("__h"), col("__len"))
      .agg(collect_list(col(idCol)).as("__m"))
      .filter(size(col("__m")) > 1)
      .select(col("__m"), posexplode(col("__m")))
      .toDF("__m", "__i", "__x")
      .select(col("__x"), col("__i"), posexplode(col("__m")))
      .toDF("__x", "__i", "__j", "__y")
      .filter(col("__i") < col("__j"))
      .select(least(col("__x"), col("__y")).as("id_a"),
        greatest(col("__x"), col("__y")).as("id_b"))

  /** MinHash signatures, computed partition-locally in one pass over each
    * document (graft.functions.Sketches) — the explode+groupBy formulation
    * would shuffle one row per (doc, shingle), which at 100 TB dwarfs the
    * hashing itself. Zero shuffle, stays inside the scan stage. */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64): DataFrame =
    docs.select(col(idCol),
      graft.functions.Sketches.minhashSig(col(textCol), shingleK, numHashes).as("sig"))

  /** LSH banding: candidate pairs whose signatures collide in ≥1 band
    * (bands×rowsPerBand = numHashes). Classic S-curve: with 8 bands of 8,
    * pairs at Jaccard 0.9 collide with p≈0.99 while a 0.4-Jaccard
    * background pair collides with p≈0.005 — the knob that keeps the
    * candidate set linear-ish instead of quadratic on corpora with high
    * baseline similarity. */
  def minhashCandidates(sigs: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sigs.select(col(idCol),
      posexplode(array((0 until bands).map(b =>
        hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)))
      .toDF(idCol, "__band", "__bsig")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col(s"a.__band") === col(s"b.__band") &&
        col(s"a.__bsig") === col(s"b.__bsig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact k-gram Jaccard for given candidate pairs (the verify step —
    * only candidates pay the set comparison). The pair joins carry raw
    * TEXT and the set comparison happens in a single-pass two-text kernel
    * ([[graft.functions.Sketches.jaccard]]): materializing shingle
    * arrays before the join shipped ~10× the bytes through both
    * exchanges and was the whole cost of the minhash pipeline at the 10×
    * ladder (12s of 13s). Values are identical to the
    * `array_intersect/array_union` form (same sets, same division). */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, shingleK: Int): DataFrame = {
    val txt = docs.select(col(idCol).as("__id"), col(textCol).as("__t"))
    pairs
      .join(txt.withColumnRenamed("__id", "id_a").withColumnRenamed("__t", "__ta"), "id_a")
      .join(txt.withColumnRenamed("__id", "id_b").withColumnRenamed("__t", "__tb"), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.Sketches.jaccard(col("__ta"), col("__tb"), shingleK)
          .as("jaccard"))
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → minhash → band →
    * bucket-join → exact-Jaccard verify ≥ threshold — with EXACT-DEDUP
    * COLLAPSE first: identical texts carry identical signatures, bands,
    * and Jaccards (every stage is a pure function of text), so each
    * distinct text runs the sketch pipeline ONCE through its minimum-id
    * representative and rep-level pairs expand back to member pairs.
    * On duplicate-heavy corpora (the common case that makes near-dup
    * worth running) this cuts band-join candidates quadratically in the
    * copy multiplicity: m exact copies are C(m,2) all-pairs work direct,
    * one rep plus an output-sized expansion here. Output is row-identical
    * to [[minhashPairsDirect]] (spec-pinned).
    *
    * Scale shape: signatures are computed partition-locally in the scan;
    * the collapse shuffles `(md5, id, sig)` — ~300 bytes/row, never
    * text; verify ships text for candidate REPRESENTATIVES only; the
    * expansions are joins on the rep ids carrying member-id lists
    * (bounded by copy multiplicity — run [[exactGroups]] removal first
    * if the corpus has million-copy boilerplate groups). */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 8,
      threshold: Double = 0.7): DataFrame =
    minhashPairsImpl(docs, idCol, textCol, shingleK, numHashes, bands,
      threshold)._1

  /** [[minhashPairs]] plus a handle on its checkpointed collapse frame
    * (kept for spec access to the collapse groups). The checkpoint is
    * RDD-keyed, not CacheManager-registered, so it needs no explicit
    * release — its storage dies with the frame on GC. */
  private def minhashPairsImpl(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, bands: Int,
      threshold: Double): (DataFrame, DataFrame) = {
    // Shingle-less documents (shorter than k after lowercasing) all carry
    // the sentinel all-zero signature: without this filter they band-join
    // ALL-PAIRS across the corpus's sub-k docs — Θ(N²) candidates that can
    // never verify (their pairwise Jaccard is NaN or 0). Scan-stage
    // predicate, no extra pass; exact duplicates among the excluded sub-k
    // docs are recovered by the [[subkExactPairs]] companion below.
    val base = docs.select(col(idCol), col(textCol))
      .filter(graft.functions.Sketches.hasShingles(col(textCol), shingleK))
    // Lazy localCheckpoint, NOT persist (r21): the collapse frame feeds
    // three consumers (band join, cross-expansion, within-expansion), so
    // one materialization is load-bearing — but a persisted plan
    // registers with the CacheManager, which matches by CANONICALIZED
    // PLAN session-wide, so the lazily-returned result kept serving the
    // collapse of every LATER execution of the same query (bench reps
    // 2..N read the first rep's cache: measured shuffle-read spread
    // [66 KB vs 2.03 MB] across reps — warm-cache headlines, not
    // recomputation). A checkpoint is keyed to its RDD: shared within
    // THIS invocation, invisible to every other plan, released on GC.
    val grouped = base
      .select(col(idCol), md5(col(textCol)).as("__th"),
        graft.functions.Sketches.minhashSig(col(textCol), shingleK, numHashes).as("sig"))
      .groupBy(col("__th"))
      .agg(min(col(idCol)).as("__rep"),
        collect_list(col(idCol)).as("__members"),
        first(col("sig")).as("sig")) // all sigs in a group are identical
      .localCheckpoint(false)
    val repSigs = grouped.select(col("__rep").as(idCol), col("sig"))
    val cands = minhashCandidates(repSigs, idCol, bands, numHashes / bands)
    val verified = jaccardVerify(cands, base, idCol, textCol, shingleK)
      .filter(col("jaccard") >= threshold)
    // cross-group: every member pair of a verified rep pair, normalized
    val cross = verified
      .join(grouped.select(col("__rep").as("id_a"), col("__members").as("__ma")), "id_a")
      .join(grouped.select(col("__rep").as("id_b"), col("__members").as("__mb")), "id_b")
      .select(col("jaccard"), explode(col("__ma")).as("__x"), col("__mb"))
      .select(col("jaccard"), col("__x"), explode(col("__mb")).as("__y"))
      .select(least(col("__x"), col("__y")).as("id_a"),
        greatest(col("__x"), col("__y")).as("id_b"), col("jaccard"))
    // within-group: exact copies always band-collide, so each multi-member
    // group contributes all its pairs at the kernel's self-Jaccard (1.0 —
    // shingle-less texts were already excluded at `base`)
    val within = grouped
      .filter(size(col("__members")) > 1)
      .join(base, col("__rep") === base(idCol))
      .select(col("__members"),
        graft.functions.Sketches.jaccard(col(textCol), col(textCol), shingleK)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("jaccard"), col("__members"), posexplode(col("__members")))
      .toDF("jaccard", "__m", "__i", "__x")
      .select(col("jaccard"), col("__x"), col("__i"), posexplode(col("__m")))
      .toDF("jaccard", "__x", "__i", "__j", "__y")
      .filter(col("__i") < col("__j"))
      .select(least(col("__x"), col("__y")).as("id_a"),
        greatest(col("__x"), col("__y")).as("id_b"), col("jaccard"))
    // sub-k texts are excluded from banding above, but IDENTICAL sub-k
    // texts are still duplicates: their exact pairs come from the
    // hash-groupBy companion (Jaccard 1.0 by identity — the shingle
    // kernel is undefined below k)
    val subk = subkExactPairs(docs, idCol, textCol, shingleK)
      .withColumn("jaccard", lit(1.0))
    (cross.unionByName(within).unionByName(subk), grouped)
  }

  /** Bench receipt for the minhash ladder: (band-join candidate pairs at
    * the collapsed rep level, final verified output pairs) under the same
    * parameters as [[minhashPairs]]. Distinguishes output-proportional
    * growth (a corpus with genuinely more near-dups emits more pairs —
    * fine) from quadratic candidate structure (band buckets degenerating
    * into all-pairs — the scale killer). Counts only; never collected
    * beyond two longs. */
  def minhashLadderStats(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 8,
      threshold: Double = 0.7): (Long, Long) = {
    val repSigs = docs
      .filter(graft.functions.Sketches.hasShingles(col(textCol), shingleK))
      .select(col(idCol), md5(col(textCol)).as("__th"),
        graft.functions.Sketches.minhashSig(col(textCol), shingleK, numHashes).as("sig"))
      .groupBy(col("__th"))
      .agg(min(col(idCol)).as(idCol), first(col("sig")).as("sig"))
      .drop("__th")
    val candidates = minhashCandidates(repSigs, idCol, bands, numHashes / bands).count()
    val (pairsDf, grouped) =
      minhashPairsImpl(docs, idCol, textCol, shingleK, numHashes, bands, threshold)
    val pairs = pairsDf.count()
    // the counts are materialized; the checkpointed collapse frame has no
    // CacheManager entry to drop (it is RDD-keyed) and its storage is
    // released when this frame goes out of scope — nothing to unpersist
    (candidates, pairs)
  }

  /** The collapse-free formulation of [[minhashPairs]]: every document
    * through sketch/band/verify individually. Same rows (the spec pins
    * it); quadratic in exact-copy multiplicity. Kept as the equivalence
    * oracle. */
  def minhashPairsDirect(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    // same shingle-less exclusion as [[minhashPairs]] (sub-k docs share
    // the sentinel signature and a NaN pairwise Jaccard, which Spark's
    // NaN-is-greatest ordering would pass through `>= threshold`)
    val eligible = docs.filter(
      graft.functions.Sketches.hasShingles(col(textCol), shingleK))
    val sigs = minhashSignature(eligible, idCol, textCol, shingleK, numHashes)
    val cands = minhashCandidates(sigs, idCol, bands, numHashes / bands)
    jaccardVerify(cands, eligible, idCol, textCol, shingleK)
      .filter(col("jaccard") >= threshold)
      // identical sub-k texts: same exact-pair companion as [[minhashPairs]]
      .unionByName(subkExactPairs(docs, idCol, textCol, shingleK)
        .withColumn("jaccard", lit(1.0)))
  }

  /** 64-bit SimHash per document: bit b is the sign of Σ±1 over shingle
    * hashes. Partition-local single pass (see minhashSignature). */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5): DataFrame =
    docs.select(col(idCol),
      graft.functions.Sketches.simhash64(col(textCol), shingleK).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`:
    * pigeonhole on 4 16-bit chunks — any pair within distance ≤ 3 must
    * agree on ≥1 chunk, so candidates come from an equi-join on chunk
    * value, and only candidates pay the popcount. The 4-chunk split only
    * guarantees recall for `maxHamming < 4` (4 differing bits can land
    * one per chunk), so larger radii are rejected rather than silently
    * under-recalling. Shingle-less documents (shorter than k) all hash
    * to the zero signature — without exclusion they'd emit hamming-0
    * "near-dup" pairs between unrelated texts AND all-pairs-join at
    * scale, so they are excluded from chunking; IDENTICAL sub-k texts
    * still pair (hamming 0) via the exact-pair companion. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"4-chunk pigeonhole guarantees recall only for maxHamming in [0,3], got $maxHamming")
    val sh = simhash(
      docs.filter(graft.functions.Sketches.hasShingles(col(textCol), shingleK)),
      idCol, textCol, shingleK)
    val chunked = sh.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))): _*)))
      .toDF(idCol, "simhash", "__chunk", "__cval")
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b,
        col("a.__chunk") === col("b.__chunk") &&
        col("a.__cval") === col("b.__cval") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      // identical sub-k texts: same exact-pair companion as [[minhashPairs]]
      // (identical text ⇒ identical simhash ⇒ hamming 0)
      .unionByName(subkExactPairs(docs, idCol, textCol, shingleK)
        .withColumn("hamming", lit(0)))
  }

  /** Connected components over an undirected near-dup pair graph — the
    * step that turns PAIRS into duplicate CLUSTERS, because pairs alone
    * cannot dedup transitively (A~B and B~C without an (A,C) pair must
    * still collapse to one survivor).
    *
    * Algorithm: iterative min-label propagation. State is one (id, label)
    * row per node; each round every node adopts the minimum label among
    * itself and its neighbors (one join + one aggregation), until a fixed
    * point — the distributed-graph standard when the cluster diameter is
    * small, which near-dup graphs are (copies of one source document).
    * Rounds = longest chain; every round local-checkpoints its state so
    * iteration N+1's lineage does not replay rounds 1..N. Non-convergence
    * within `maxIters` THROWS — silently stopping early would under-merge
    * clusters and ship duplicates into a training set.
    *
    * Output: (id, label) for every node appearing in `pairs`, label = the
    * minimum id of the node's component. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // persisted pre-partitioned on the propagation join key, NOT
    // localCheckpointed: a cached InMemoryRelation keeps its
    // HashPartitioning under AQE (a checkpoint's LogicalRDD does not),
    // so the rounds reuse one edge exchange instead of re-shuffling the
    // edge list every round (cf. Graph.pageRank, PlanAuditSpec)
    val edges = pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .union(pairs.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      // one edge-sized exchange: hash(dst) satisfies the (src,dst) dedup's
      // clustering (subset rule), so dropDuplicates after the repartition
      // is partition-local — distinct-then-repartition shuffled twice
      // (see Graph.pageRank's identical fold)
      .repartition(col("dst"))
      .dropDuplicates("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Fixed-point detection by LABEL-SUM SIGNATURE, not a next⋈old diff
      // join: each round every node adopts min(self, neighbors) — element-
      // wise monotone NON-INCREASING over an unchanging node set — so the
      // label sum strictly decreases iff any label changed, and one
      // map-side-combined aggregate (label-sized scan, no exchange beyond
      // the partial-sum reduce) replaces a label-sized join + count job
      // per round. decimal(38,0): 10^12 nodes × long-sized labels sum to
      // ~10^30, inside decimal precision at any corpus (a long sum could
      // overflow silently pre-ANSI, masking a change — same widening
      // reasoning as [[graft.operators.Pca]]'s decimal accumulators).
      // A NULL sum over a NON-EMPTY label set can only be a decimal
      // overflow (non-ANSI mode returns null instead of throwing): two
      // consecutive overflowed rounds would compare None == None and
      // report FALSE convergence — silent under-merged clusters. Fail
      // loudly instead; the count rides the same single aggregate job.
      def labelSig(df: DataFrame): Option[java.math.BigDecimal] = {
        val row = df.agg(
          sum(col("label").cast("decimal(38,0)")), count(lit(1))).head()
        val sig = Option(row.getDecimal(0))
        require(sig.isDefined || row.getLong(1) == 0L,
          "connectedComponents label-sum signature overflowed decimal(38,0) " +
            "on a non-empty label set - convergence detection would be " +
            "unsound (needs ~1e19 max-long labels; inspect the id domain)")
        sig
      }
      // seeded from the DST column: the edge list is symmetrized (src and
      // dst sets are identical), and edges is cached hash(dst), so the
      // dedup runs partition-local with no exchange of its own — the src
      // formulation paid a node-keyed shuffle for the same set
      // LAZY checkpoints throughout the loop: the label-sum signature
      // aggregate that follows each round is the round's only consumer
      // and runs immediately, so it materializes (and persists) the
      // checkpointed state in the SAME job — the eager form paid a
      // separate driver-blocking materialization job per round, doubling
      // the loop's job count for zero extra information (measured at
      // sf0.1: dedup_cluster_keep 1.58 → ~1.1 s). Lineage is still cut
      // every round: iteration N+1 reads the persisted round-N RDD.
      var labels = edges.select(col("dst").as("id")).dropDuplicates("id")
        .select(col("id"), col("id").as("label"))
        .localCheckpoint(false)
      var prevSig = labelSig(labels)
      var iter = 0
      while (iter < maxIters) {
        // NO join-strategy hint here, measured (unlike Graph.pageRank's
        // iteration join): a shuffle_hash hint on the label side blocked
        // AQE's runtime SMJ→broadcast conversion of exactly that side —
        // near-dup cluster graphs are SPARSE (labels ≈ a few hundred rows
        // per planted chain at the gates, duplicate-cluster-sized in
        // production), so the broadcast is usually right and the forced
        // hash build measured +50% task-CPU at sf0.1. PageRank's case
        // differs in kind: its rank side is the FULL node set and its
        // edge side big enough that the per-iteration sort is real work.
        val neighbor = edges.join(labels, edges("dst") === labels("id"))
          .select(edges("src").as("id"), col("label"))
        val next = neighbor.union(labels)
          .groupBy(col("id")).agg(min(col("label")).as("label"))
          .localCheckpoint(false)
        val sig = labelSig(next)
        labels = next
        if (sig == prevSig) return labels
        prevSig = sig
        iter += 1
      }
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          "(pathological chain length — raise maxIters)")
    } finally edges.unpersist(false)
  }

  /** Canonical-document selection: given near-dup pairs, keep ONE doc per
    * duplicate cluster (the minimum id) and every unpaired doc. The
    * cluster map is |nodes-in-pairs| rows — tiny next to the corpus — so
    * the survivor join broadcasts; the corpus is never shuffled. */
  def keepCanonical(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    // collision-proof internal names: drop-by-name after a join removes ALL
    // columns with that name, so a corpus column literally called "id" or
    // "label" would otherwise be silently dropped from the output
    val cc = broadcast(connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("label").as("__cc_label")))
    docs.join(cc, docs(idCol) === cc("__cc_id"), "left_outer")
      .filter(col("__cc_label").isNull || col("__cc_label") === docs(idCol))
      .drop("__cc_id", "__cc_label")
  }

  /** Incremental dedup of a NEW batch against an EXISTING corpus — the
    * production shape for continuous ingestion (a daily crawl appended
    * to a 100 TB training set): a batch row survives iff its content
    * signature occurs nowhere in the corpus AND it is the first
    * occurrence (min id) of its signature within the batch.
    *
    * Scale shape: the batch's distinct signature set is batch-sized, so
    * it broadcasts INTO the corpus scan as a semi-join — the corpus
    * contributes only signatures the batch actually carries (typically a
    * tiny kill set), which broadcast back as an anti-join. The corpus is
    * never shuffled and never rescanned per batch row; nothing larger
    * than the batch ever crosses an exchange. */
  def dedupAgainstCorpus(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, normalize: Boolean = false): DataFrame = {
    def sig(c: Column) = {
      val t = if (normalize) regexp_replace(trim(lower(c)), "\\s+", " ") else c
      concat(md5(t), lit(":"), length(t).cast("string"))
    }
    val batchSigs = batch.select(sig(col(textCol)).as("__sig")).distinct()
    val killSet = corpus.select(sig(col(textCol)).as("__sig"))
      .join(broadcast(batchSigs), Seq("__sig"), "left_semi")
      .distinct()
    val withSig = batch.withColumn("__sig", sig(col(textCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__sig")).orderBy(col(idCol))
    withSig
      .join(broadcast(killSet), Seq("__sig"), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__sig", "__rn")
  }

  /** NEAR-dup screening of a new batch against an existing corpus — the
    * fuzzy companion of [[dedupAgainstCorpus]] (which only catches exact
    * content): batch documents whose MinHash bands collide with any
    * corpus document AND whose exact Jaccard clears `threshold` are
    * dropped; the rest survive.
    *
    * Scale shape: the corpus side is a banded signature table — 8 rows
    * of ~16 bytes per document, the persistent near-dup INDEX a real
    * pipeline materializes once and bucket-joins per batch; the probe
    * side is batch-sized. Only band-colliding candidate pairs ship text
    * into the Jaccard verify. */
  def neardupAgainstCorpus(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 5, numHashes: Int = 64, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    // shingle-less docs: a sub-k batch row can never clear the Jaccard
    // verify (NaN — which Spark's NaN-is-greatest ordering would PASS
    // through >= threshold, wrongly killing it against any sub-k corpus
    // row), and sub-k corpus rows band-join all-pairs against them; both
    // sides exclude them up front — such batch rows always survive.
    def banded(df: DataFrame, outId: String) =
      minhashSignature(
        df.filter(graft.functions.Sketches.hasShingles(col(textCol), shingleK)),
        idCol, textCol, shingleK, numHashes)
        .select(col(idCol).as(outId),
          posexplode(array((0 until bands).map(b =>
            hash(slice(col("sig"), b * rows + 1, rows))): _*)))
        .toDF(outId, "__band", "__bsig")
    val cands = banded(batch, "__b_id")
      .join(banded(corpus, "__c_id"), Seq("__band", "__bsig"))
      .select(col("__b_id"), col("__c_id")).distinct()
    val bTxt = batch.select(col(idCol).as("__b_id"), col(textCol).as("__bt"))
    val cTxt = corpus.select(col(idCol).as("__c_id"), col(textCol).as("__ct"))
    val hit = cands.join(bTxt, "__b_id").join(cTxt, "__c_id")
      .filter(graft.functions.Sketches.jaccard(col("__bt"), col("__ct"), shingleK)
        >= threshold)
      .select(col("__b_id")).distinct()
    batch.join(hit, batch(idCol) === col("__b_id"), "left_anti")
  }

  /** Quality-aware canonical selection: keep the HIGHEST-`score` document
    * of each duplicate cluster (ties broken toward the minimum id) and
    * every unpaired doc — the production policy when near-dup clusters
    * mix a clean original with truncated or boilerplate-padded copies
    * and "min id" would keep an arbitrary one.
    *
    * Scale shape: the cluster map is |nodes-in-pairs| rows, so it
    * broadcasts to score the members (the corpus is never shuffled); the
    * per-cluster argmax reduces over nodes only; the survivor map
    * broadcasts back. */
  def keepBest(docs: DataFrame, idCol: String, pairs: DataFrame,
      score: Column): DataFrame = {
    val cc = connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("label").as("__cc_label"))
    // score only the clustered members: broadcast the node map into the
    // corpus scan, reduce (score, -id) lexicographically per cluster
    val best = docs
      .join(broadcast(cc), docs(idCol) === col("__cc_id"))
      .groupBy(col("__cc_label"))
      .agg(max(struct(score.as("s"), (-col("__cc_id")).as("neg_id"))).as("__b"))
      .select(col("__cc_label").as("__kb_label"),
        (-col("__b.neg_id")).as("__keep_id"))
    val survivorByNode = cc.join(best, col("__cc_label") === col("__kb_label"))
      .select(col("__cc_id").as("__kb_id"), col("__keep_id"))
    docs.join(broadcast(survivorByNode), docs(idCol) === col("__kb_id"), "left_outer")
      .filter(col("__keep_id").isNull || col("__keep_id") === docs(idCol))
      .drop("__kb_id", "__keep_id")
  }

  /** Embedding near-duplicate pairs: exact cosine over LSH-bucketed
    * candidates (random-hyperplane signature). For corpora small enough to
    * broadcast, pass `bucketBits = 0` to verify all pairs. */
  def embeddingPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketBits: Int = 12, dims: Int = 64): DataFrame = {
    import graft.functions.VectorMath
    val withBucket =
      (if (bucketBits == 0) vecs.select(col(idCol), col(vecCol), lit(0L).as("__bkt"))
      else vecs.select(col(idCol), col(vecCol),
        VectorMath.hyperplaneBucket(col(vecCol), bucketBits, dims).as("__bkt")))
    val a = withBucket.alias("a")
    val b = withBucket.alias("b")
    a.join(b, col("a.__bkt") === col("b.__bkt") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        VectorMath.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
