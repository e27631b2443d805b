package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.functions.TextAnalysis

/** Benchmark decontamination for training corpora (SURVEY.md §2.3 #48):
  * flag training documents whose word n-grams overlap an evaluation set —
  * the standard guard against test-set leakage into training data.
  *
  * Scale shape (100 TB corpus, eval set of any size). The eval side is
  * measured (its distinct n-gram set is materialized, checkpointed and
  * counted in one pass — the same stored set every downstream join then
  * probes) and the regime follows:
  *
  *   - **broadcast regime** (benchmark-sized evals, the common case): the
  *     distinct eval n-gram set is BROADCAST and the corpus side is a
  *     single scan → explode → broadcast hash join → per-doc aggregate
  *     with map-side partials. The corpus is never shuffled except for the
  *     one-row-per-(doc, partition) partial-agg exchange.
  *   - **beyond-broadcast regime** (eval past
  *     [[Decontaminate.MaxBroadcastTokens]] distinct n-grams): the per-doc
  *     n-gram DENOMINATOR moves out of the join entirely
  *     (`size(wordNgrams(text))` in the corpus scan), and the HIT count
  *     becomes a Bloom-prefiltered INNER shuffle join — a ~1%-fpp Bloom
  *     filter of the eval n-grams (built distributed, broadcast as bytes)
  *     drops non-candidate corpus n-grams BEFORE the exchange, so the
  *     shuffle carries candidates (near-zero on a clean corpus), not the
  *     corpus. The string equi-join after the filter keeps the count
  *     exact: false positives only cost shuffled bytes, never a wrong hit.
  *
  * No all-pairs structure in either regime; both produce identical rows
  * (spec-pinned equivalence).
  */
object Decontaminate {

  /** Eval-set size (distinct n-grams) above which the broadcast regime
    * would strain the driver/executors and the Bloom-prefiltered shuffle
    * regime takes over. ~2M 5-gram strings is roughly a half-GB hash
    * relation — past any sane broadcast budget. */
  val MaxBroadcastTokens: Long = 2_000_000L

  /** Per-training-document n-gram overlap against `eval`.
    *
    * Overlap is occurrence-based (a doc repeating a leaked n-gram counts
    * each occurrence), matching the usual contaminated-fraction metric.
    * Documents with fewer than `n` tokens have no n-grams and are absent
    * from the output (they cannot be contaminated at width n).
    *
    * Output: `(idCol, n_ngrams, n_hits, overlap_ratio, contaminated)`;
    * `overlap_ratio` is an exact int/int double division, so it is
    * bit-reproducible cross-engine with no rounding step.
    *
    * @param maxBroadcastTokens regime knob, see [[MaxBroadcastTokens]];
    *   tests force the beyond-broadcast regime by passing 0. */
  def overlap(train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.5,
      maxBroadcastTokens: Long = MaxBroadcastTokens): DataFrame = {
    // ONE materialized pass over the eval side, deliberately eager: the
    // distinct n-gram set is checkpointed and counted here. The exact
    // count IS the regime signal (better than a chars-per-token
    // estimate), and the materialization pins the set so a
    // non-deterministic or expensive eval lineage cannot pick the regime
    // on different data than the joins probe — the broadcast build, the
    // Bloom build, and the exact-verify join all read this one stored
    // copy instead of re-running the eval lineage (it was evaluated up
    // to 3x before). localCheckpoint, NOT persist (r21): a persisted
    // plan registers with the CacheManager, which matches by
    // CANONICALIZED PLAN session-wide — the retained entry kept serving
    // the eval set of every LATER execution of the same query (bench
    // reps 2..N read rep 1's cache; the old comment's "LRU-evicted"
    // lifecycle is exactly the cross-run reuse the bench must not
    // measure). The checkpoint is RDD-keyed: shared within THIS
    // invocation only, storage released on GC.
    val evalNgrams = eval
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__ngram"))
      .distinct()
      .localCheckpoint(false)
    val nEvalNgrams = evalNgrams.count()

    val counted =
      if (nEvalNgrams <= maxBroadcastTokens) {
        train
          .select(col(idCol), explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__ngram"))
          .join(broadcast(evalNgrams.withColumn("__hit", lit(1L))),
            Seq("__ngram"), "left_outer")
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_ngrams"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      } else {
        val trainNgrams = train
          .select(col(idCol), explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__ngram"))
        val hits = bloomFiltered(trainNgrams, evalNgrams, "__ngram",
            expectedItems = math.max(nEvalNgrams, 1L))
          .join(evalNgrams, Seq("__ngram"))
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_hits"))
        train
          .select(col(idCol),
            size(TextAnalysis.wordNgrams(col(textCol), n)).cast("long").as("n_ngrams"))
          .filter(col("n_ngrams") > 0)
          .join(hits, Seq(idCol), "left_outer")
          .select(col(idCol), col("n_ngrams"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      }

    counted.select(col(idCol), col("n_ngrams"), col("n_hits"),
      (col("n_hits").cast("double") / col("n_ngrams")).as("overlap_ratio"),
      (col("n_hits").cast("double") / col("n_ngrams") >= threshold).as("contaminated"))
  }

  /** Per-EVAL-item contamination report — the mirror of [[overlap]]: for
    * each evaluation document, how many of ITS distinct n-grams occur
    * anywhere in the training corpus. This is the view a benchmark owner
    * reads ("which eval items are burned?") where [[overlap]] is the view
    * the corpus owner reads ("which training docs to drop?").
    *
    * Scale shape: the eval side is small by definition, so its distinct
    * n-gram set broadcasts INTO the corpus scan as a semi-join — the
    * corpus contributes only the n-grams that match an eval n-gram
    * (near-zero on a clean corpus), which are then dedup'd (corpus-
    * occurrence counts don't matter for this view, membership does) and
    * joined back to the per-eval-doc gram table. The corpus is never
    * shuffled; the only exchanges carry eval-sized gram sets.
    *
    * Output: `(idCol, n_ngrams, n_hit, hit_ratio, burned)` — one row per
    * eval doc with ≥1 n-gram; `n_hit` counts its distinct n-grams found
    * in train, `burned` = hit_ratio ≥ threshold. */
  def reportPerEval(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5, threshold: Double = 0.5): DataFrame = {
    // lazy localCheckpoint, not persist — same CacheManager-reuse
    // reasoning as [[overlap]]: shared by the broadcast set and the
    // join-back within this invocation, invisible to later executions
    val evalGrams = eval
      .select(col(idCol), explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__ngram"))
      .distinct()
      .localCheckpoint(false)
    val evalSet = evalGrams.select(col("__ngram")).distinct()
    val hitGrams = train
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__ngram"))
      .join(broadcast(evalSet), Seq("__ngram"), "left_semi")
      .distinct()
      .withColumn("__hit", lit(1L))
    evalGrams
      .join(hitGrams, Seq("__ngram"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col(idCol), col("n_ngrams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_ngrams")).as("hit_ratio"),
        (col("n_hit").cast("double") / col("n_ngrams") >= threshold).as("burned"))
  }

  /** Rows of `probe` whose `colName` MIGHT be in `build`'s `colName` set,
    * by a ~1%-fpp Bloom filter built distributed over the build side and
    * broadcast as serialized bytes. Probe and build hash through the same
    * `xxhash64` column (the filter stores longs), evaluated by Spark's own
    * codegen'd [[BloomFilterMightContain]] — no UDF, no per-row boxing. */
  private[operators] def bloomFiltered(probe: DataFrame, build: DataFrame,
      colName: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.select(xxhash64(col(colName)).as("__nh"))
      .stat.bloomFilter("__nh", expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    probe.filter(mightContain(out.toByteArray, xxhash64(col(colName))))
  }

  private def mightContain(serializedBloom: Array[Byte], hashed: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(serializedBloom, BinaryType), GraftBridge.expression(hashed)))
}
