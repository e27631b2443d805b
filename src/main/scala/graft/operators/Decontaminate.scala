package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Benchmark decontamination for training corpora (SURVEY.md §2.3 #48):
  * flag training documents whose word n-grams overlap an evaluation set —
  * the standard guard against test-set leakage into training data.
  *
  * Scale shape (100 TB corpus, benchmark-sized eval set): the eval
  * n-gram set is distinct-ed and BROADCAST, so the corpus side is a
  * single scan → explode → broadcast hash join → per-doc aggregate with
  * map-side partial aggregation. The corpus is never shuffled except for
  * the one-row-per-(doc, partition) partial-agg exchange; no all-pairs
  * structure anywhere. If the eval set ever outgrew broadcast range, the
  * drop-in replacement is a Bloom filter of eval n-grams (same join
  * column, probabilistic hits) — not needed for benchmark-sized evals,
  * which are MBs against the corpus's TBs.
  */
object Decontaminate {

  /** Per-training-document n-gram overlap against `eval`.
    *
    * Overlap is occurrence-based (a doc repeating a leaked n-gram counts
    * each occurrence), matching the usual contaminated-fraction metric.
    * Documents with fewer than `n` tokens have no n-grams and are absent
    * from the output (they cannot be contaminated at width n).
    *
    * Output: `(idCol, n_ngrams, n_hits, overlap_ratio, contaminated)`;
    * `overlap_ratio` is an exact int/int double division, so it is
    * bit-reproducible cross-engine with no rounding step. */
  def overlap(train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.5): DataFrame = {
    val evalNgrams = eval
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__ngram"))
      .distinct()
      .withColumn("__hit", lit(1L))
    train
      .select(col(idCol), explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__ngram"))
      .join(broadcast(evalNgrams), Seq("__ngram"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col(idCol), col("n_ngrams"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_ngrams")).as("overlap_ratio"),
        (col("n_hits").cast("double") / col("n_ngrams") >= threshold).as("contaminated"))
  }
}
