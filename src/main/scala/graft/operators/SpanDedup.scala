package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Repeated-span detection over a corpus (SURVEY.md §2.3 #31d): find the
  * k-token spans that occur at more than one (document, position) site
  * anywhere in the corpus, and report per document how many of its spans
  * are duplicated and how many of its tokens the duplicated spans cover
  * (overlapping spans merged into islands, counted once).
  *
  * This is the positioned-fingerprint approximation of exact-substring
  * training-data dedup (the suffix-array formulation of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better" — a global
  * suffix array is not expressible as a Spark plan; fixed-width span
  * fingerprints at every token position detect the same ≥k-token repeats,
  * since any repeated substring of ≥ k tokens contains a repeated k-token
  * span at its start).
  *
  * Scale shape (100 TB): the one heavy exchange carries
  * `(md5(span), doc_id, pos)` — 32+12 bytes per token of corpus, never
  * document text. Duplicate sites are found by hash aggregation with
  * map-side partials (skew-safe where a window-over-span partition would
  * hot-spot on boilerplate spans repeated billions of times; the join
  * back is AQE-skew-splittable). The coverage window partitions by
  * document, bounded by document length.
  */
object SpanDedup {

  /** Every k-token span of every document as `(idCol, pos, span_md5)`,
    * pos = 0-based token index of the span start (the kernel emits grams
    * in document order, so the posexplode index IS the position). */
  def spanSites(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol), posexplode(TextAnalysis.wordNgrams(col(textCol), k)))
      .select(col(idCol), col("pos"), md5(col("col")).as("span_md5"))

  /** Per-document duplicated-span statistics. Output one row per document
    * that contains at least one duplicated span:
    * `(idCol, n_dup_spans, dup_tokens)` — the count of span positions
    * whose k-gram occurs elsewhere in the corpus (or again in the same
    * document), and the number of tokens covered by the union of those
    * spans (gaps-and-islands via a running-max window, so overlapping
    * spans never double-count a token). */
  def duplicatedSpanStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val sites = spanSites(docs, idCol, textCol, k)
    // spans with >1 site corpus-wide; partial aggregation keeps the
    // billion-occurrence boilerplate span from hot-spotting one task
    val dup = sites.groupBy(col("span_md5"))
      .agg(count(lit(1)).as("__sites"))
      .filter(col("__sites") > 1)
      .select(col("span_md5"))
    val dupPos = sites.join(dup, "span_md5").select(col(idCol), col("pos"))
    // island coverage: a span starting at pos covers [pos, pos+k); the
    // contribution of each span is what the running max end has not
    // already covered
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevEnd = max(col("pos") + lit(k)).over(w)
    dupPos
      .withColumn("__c",
        greatest(lit(0), col("pos") + lit(k) -
          greatest(coalesce(prevEnd, col("pos")), col("pos"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("__c")).cast("long").as("dup_tokens"))
  }

  /** Documents whose duplicated-span token coverage stays at or below
    * `maxDupFrac` of their tokens — the filter step of span-level dedup
    * (documents that are mostly repeats of other corpus content drop
    * out; the stats side is [[duplicatedSpanStats]]). The stats table is
    * one row per contaminated document — corpus-bounded but typically
    * sparse — joined back without shuffling the corpus side payload. */
  def dropMostlyDuplicated(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDupFrac: Double): DataFrame = {
    // collision-proof internal names: drop-by-name after a join removes
    // ALL columns with that name, so a corpus column literally called
    // "dup_tokens" must not be shadowed by the stats side
    val stats = duplicatedSpanStats(docs, idCol, textCol, k)
      .select(col(idCol).as("__sd_id"), col("dup_tokens").as("__sd_dup"))
    docs
      .withColumn("__sd_n", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .join(stats, docs(idCol) === col("__sd_id"), "left_outer")
      .filter(coalesce(col("__sd_dup"), lit(0L)).cast("double") <=
        col("__sd_n").cast("double") * maxDupFrac)
      .drop("__sd_id", "__sd_dup", "__sd_n")
  }
}
