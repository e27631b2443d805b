package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines
  * (SURVEY.md §2.3 #38-40). Everything is built from native, codegen'd
  * Spark functions — no UDFs — so the expressions stay inside
  * WholeStageCodegen next to the parquet scan.
  */
object TextAnalysis {

  /** Whitespace tokens of the trimmed, lowercased text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation: letter runs, digit runs, and single
    * non-alphanumeric marks — the classic pre-tokenizer split. ASCII
    * classes only so Java regex (Spark) and RE2 (warehouse engines)
    * agree. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Stopword-hit count for a language's function-word list. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  /** Tiny per-language function-word lists for the n-gram/stopword
    * language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "was", "for", "with"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "du", "ich", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du", "est", "je", "que", "pour"),
    "es" -> Seq("el", "la", "que", "de", "y", "en", "un", "los", "se", "no", "por", "con"))

  /** CJK codepoint count (Han unified block) — presence short-circuits
    * language ID to zh. */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))

  /** Heuristic language ID over {en,de,fr,es,zh}: CJK presence → zh, else
    * the language with the most stopword hits; ties break in the fixed
    * order en > de > fr > es so the result is deterministic. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, stopwords("en"))
    val de = stopwordHits(text, stopwords("de"))
    val fr = stopwordHits(text, stopwords("fr"))
    val es = stopwordHits(text, stopwords("es"))
    when(cjkCount(text) > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Quality-signal struct: length, token count, punctuation density, mean
    * word length, uppercase ratio, stopword density (en). All exact integer
    * arithmetic until the final double divisions, for cross-engine
    * reproducibility. */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nTokens = tokenCount(text)
    val nPunct = length(regexp_replace(text, "[^.,!?;:]", ""))
    val nUpper = length(regexp_replace(text, "[^A-Z]", ""))
    val nStop = stopwordHits(text, stopwords("en"))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "punct_ratio" -> nPunct.cast("double") / nChars,
      "upper_ratio" -> nUpper.cast("double") / nChars,
      "mean_token_len" -> (nChars - (nTokens - lit(1))).cast("double") / nTokens,
      "stopword_ratio" -> nStop.cast("double") / nTokens)
  }

  /** Distinct character k-gram shingles (the unit for MinHash/Jaccard).
    * Single-pass static call — the `transform(sequence, substr)`
    * formulation re-scans the string per position (O(len²)/doc). */
  def shingles(text: Column, k: Int): Column = Sketches.shingleSet(text, k)
}
