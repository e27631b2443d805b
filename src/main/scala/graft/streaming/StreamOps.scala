package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming relational operators beyond the merge pipeline — the
  * Structured Streaming surface a CDC-fed lakehouse needs day one:
  * stream-stream interval joins (attribute one stream's events to
  * another's within a time window, with watermark-bounded state) and
  * watermark-bounded deduplication of at-least-once feeds. */
object StreamOps {

  /** Interval join: rows of `left` pair with rows of `right` sharing
    * `keyCol`, where right.ts ∈ [left.ts, left.ts + within]. Both sides
    * carry `watermark` so join state is dropped once the window can no
    * longer match. Works identically on batch frames (watermark no-op). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, within: String, watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
      col(s"r.$tsCol") >= col(s"l.$tsCol") &&
      col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $within"))
  }

  /** At-least-once feed → effectively-once rows: drop duplicate keys with
    * state bounded by the watermark (duplicates arriving later than the
    * watermark delay are the source's contract violation, exactly the
    * reference's at-least-once + idempotent-apply stance). */
  def dedupWithinWatermark(df: DataFrame, keyCols: Seq[String],
      tsCol: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming corpus ingestion — the LLM-pipeline front door as one
    * continuous flow: quality-gate each arriving document (single-pass
    * token-count kernel, same threshold semantics as the batch
    * `text_filter`), then drop content duplicates within the watermark
    * keyed on the `(md5, length)` signature. Dedup state holds ~40 bytes
    * per distinct recent document — never text — and the watermark
    * bounds it. A batch frame takes the same filter+signature path with
    * a plain distinct-on-signature (Spark rejects watermark dedup on
    * batch plans), so backfill and live ingestion share one call. */
  def corpusIngest(docs: DataFrame, textCol: String, tsCol: String,
      minTokens: Int, watermark: String): DataFrame = {
    val sig = docs
      .filter(graft.functions.TextAnalysis.tokenCount(col(textCol)) >= minTokens)
      .withColumn("__sig",
        concat(md5(col(textCol)), lit(":"), length(col(textCol))))
    val deduped =
      if (docs.isStreaming) dedupWithinWatermark(sig, Seq("__sig"), tsCol, watermark)
      else sig.dropDuplicates("__sig")
    deduped.drop("__sig")
  }
}
