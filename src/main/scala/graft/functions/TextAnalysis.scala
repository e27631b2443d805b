package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis column functions for large-scale training-data pipelines
  * (SURVEY.md §2.3 #38-40). The per-document statistics are computed by
  * ONE single-pass static call ([[TextAnalysisImpl.textStats]], codegen'd
  * via StaticInvoke) shared by language-ID, quality scoring and token
  * counting — the pure-expression formulation walked the text once per
  * signal (three regex replaces + four tokenize-and-filter trees) and its
  * generated-code size dominated small-batch latency. Semantics are
  * IDENTICAL to the expression forms (and to the DuckDB oracle SQL):
  * tokens = `split(trim(lower(text)), '\s+')` with Java-split field rules.
  */
object TextAnalysis {

  /** struct<n_chars,n_tokens,n_punct,n_upper,cjk,en,de,fr,es> computed in
    * one pass over the document. */
  def textStats(text: Column): Column =
    GraftBridge.column(StaticInvoke(
      TextAnalysisImpl.getClass, TextAnalysisImpl.statsType, "textStats",
      Seq(GraftBridge.expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true, returnNullable = true))

  /** Whitespace tokens of the trimmed, lowercased text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace token count (single-pass). */
  def tokenCount(text: Column): Column = statsField(textStats(text), "n_tokens")

  /** Struct-field access that also works inside SQL FUNCTION BUILDERS:
    * `st("name")` makes an UnresolvedExtractValue column node the analyzer
    * won't resolve when the expression is born outside a DataFrame (e.g.
    * from `GraftFunctions` builders, whose inputs are already resolved) —
    * there, emit a direct GetStructField. */
  private[graft] def statsField(st: Column, name: String): Column = {
    val e = GraftBridge.expression(st)
    if (e.resolved)
      GraftBridge.column(org.apache.spark.sql.catalyst.expressions.GetStructField(
        e, TextAnalysisImpl.statsType.fieldIndex(name), Some(name)))
    else st(name)
  }

  /** BPE-ish subword segmentation: letter runs, digit runs, and single
    * non-alphanumeric marks — the classic pre-tokenizer split. ASCII
    * classes only so Java regex (Spark) and RE2 (warehouse engines)
    * agree. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    GraftBridge.column(StaticInvoke(
      TextAnalysisImpl.getClass, IntegerType, "bpeishCount",
      Seq(GraftBridge.expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true, returnNullable = false))

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
  def langId(text: Column): Column = langIdFromStats(textStats(text))

  /** langId over an already-computed [[textStats]] struct (compute the
    * stats once when a query also reads other signals). */
  def langIdFromStats(st: Column): Column = {
    val (en, de, fr, es) = (statsField(st, "en"), statsField(st, "de"),
      statsField(st, "fr"), statsField(st, "es"))
    when(statsField(st, "cjk") > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Quality-signal columns: length, token count, punctuation density, mean
    * word length, uppercase ratio, stopword density (en). One stats pass;
    * exact integer arithmetic until the final double divisions, for
    * cross-engine reproducibility.
    *
    * Empty text (`n_chars = 0`) yields NULL character ratios — under ANSI
    * mode a bare division by zero THROWS, so one empty document would
    * kill the whole scan; NULL is this codebase's malformed-input policy
    * (fails every threshold, sorts last). `n_tokens` needs no guard:
    * `split` of an empty string keeps one empty field, so it is ≥ 1. */
  def qualitySignals(text: Column): Seq[(String, Column)] =
    qualitySignalsFromStats(textStats(text))

  def qualitySignalsFromStats(st: Column): Seq[(String, Column)] = {
    val nChars = statsField(st, "n_chars")
    val nCharsNz = nullif(nChars, lit(0))
    val nTokens = statsField(st, "n_tokens")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "punct_ratio" -> statsField(st, "n_punct").cast("double") / nCharsNz,
      "upper_ratio" -> statsField(st, "n_upper").cast("double") / nCharsNz,
      "mean_token_len" -> (nChars - (nTokens - lit(1))).cast("double") / nTokens,
      "stopword_ratio" -> statsField(st, "en").cast("double") / nTokens)
  }

  /** Distinct character k-gram shingles (the unit for MinHash/Jaccard).
    * Single-pass static call — the `transform(sequence, substr)`
    * formulation re-scans the string per position (O(len²)/doc). */
  def shingles(text: Column, k: Int): Column = Sketches.shingleSet(text, k)

  /** Word n-grams of the whitespace tokens (with multiplicity, in
    * document order — the unit for decontamination and corpus term
    * statistics). Single-pass static call: the higher-order
    * `transform(sequence)+slice+concat_ws` formulation runs on Spark's
    * interpreted HOF path and re-evaluates the token split per
    * subexpression — measured up to 20× slower on the corpus bench
    * (text_top_ngrams 6.0s → 0.30s at sf0.1). Semantics
    * are identical to `split(trim(lower(text)), '\s+')` n-grams joined
    * by single spaces (the oracle-SQL form): space-only trim, Java split
    * field rules, `tokens < n` → empty array. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    GraftBridge.column(StaticInvoke(
      TextAnalysisImpl.getClass, ArrayType(StringType, containsNull = false),
      "wordNgrams",
      Seq(GraftBridge.expression(text), GraftBridge.expression(lit(n))),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = true))
  }

  /** Fixed-size token chunks with `overlap` shared tokens between
    * consecutive chunks (single-pass kernel; see
    * [[TextAnalysisImpl.tokenChunks]] for the exact windowing). */
  def tokenChunks(text: Column, size: Int, overlap: Int): Column = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    GraftBridge.column(StaticInvoke(
      TextAnalysisImpl.getClass, ArrayType(StringType, containsNull = false),
      "tokenChunks",
      Seq(GraftBridge.expression(text), GraftBridge.expression(lit(size)),
        GraftBridge.expression(lit(overlap))),
      inputTypes = Seq(StringType, IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))
  }

  /** PII patterns, restricted to syntax Java regex and RE2 (DuckDB)
    * interpret identically, so the redaction is oracle-checkable
    * cross-engine. Public so oracle SQL can interpolate the same
    * strings. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** PII scrubbing for training corpora: emails, IPv4 addresses, and
    * NANP-style phone numbers → typed placeholder tokens. Pure codegen'd
    * `regexp_replace` chain — no UDF, stays inside whole-stage codegen.
    * Email runs first (its local-part could contain digits a later
    * pattern would chew up); IP before phone so dotted quads are never
    * half-matched as phone fragments. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  /** struct<n_bytes,deflate_len> — the document's UTF-8 size and its
    * DEFLATE-compressed size (zlib, fixed `level`). `deflate_len /
    * n_bytes` is the Gopher-style compression-ratio quality signal:
    * near-duplicate boilerplate and template soup compress far below
    * natural prose, and machine-generated repetition is the classic
    * low-ratio tell. Both fields are exact integers, so the gate
    * signature is float-free. Single pass, codegen'd StaticInvoke —
    * the Deflater is JDK zlib, no dependencies. */
  def deflateStats(text: Column, level: Int = 6): Column = {
    require(level >= 0 && level <= 9, s"deflate level must be in [0,9], got $level")
    GraftBridge.column(StaticInvoke(
      TextAnalysisImpl.getClass, TextAnalysisImpl.deflateType, "deflateStats",
      Seq(GraftBridge.expression(text), GraftBridge.expression(lit(level))),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = true))
  }
}

/** Single-pass implementations behind [[TextAnalysis]]'s StaticInvoke
  * columns. Tokenization matches `split(trim(lower(text)), "\\s+")`
  * exactly (Spark/DuckDB `trim` strips 0x20 only; Java split field rules —
  * the oracle gate hash-verifies the equivalence). */
object TextAnalysisImpl {

  val statsType: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("cjk", IntegerType, nullable = false),
    StructField("en", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false)))

  private val wsSplit = java.util.regex.Pattern.compile("\\s+")
  private def set(lang: String) =
    new java.util.HashSet[String](java.util.Arrays.asList(
      TextAnalysis.stopwords(lang): _*))
  private val enSet = set("en")
  private val deSet = set("de")
  private val frSet = set("fr")
  private val esSet = set("es")

  def textStats(text: UTF8String): InternalRow = {
    if (text == null) return null
    val raw = text.toString
    val n = raw.length
    var nPunct = 0
    var nUpper = 0
    var cjk = 0
    var i = 0
    while (i < n) {
      val c = raw.charAt(i)
      c match {
        case '.' | ',' | '!' | '?' | ';' | ':' => nPunct += 1
        case _ if c >= 'A' && c <= 'Z'         => nUpper += 1
        case _ if c >= 0x4e00 && c <= 0x9fff   => cjk += 1
        case _                                 => ()
      }
      i += 1
    }
    // tokens of split(trim(lower(text)), "\s+"): trim strips 0x20 only
    var lo = 0
    var hi = n
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    // Spark's split() is str.split(regex, -1): trailing empties KEPT
    val toks = wsSplit.split(raw.substring(lo, hi).toLowerCase, -1)
    var en = 0; var de = 0; var fr = 0; var es = 0
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      if (enSet.contains(w)) en += 1
      if (deSet.contains(w)) de += 1
      if (frSet.contains(w)) fr += 1
      if (esSet.contains(w)) es += 1
      t += 1
    }
    new GenericInternalRow(Array[Any](
      text.numChars(), toks.length, nPunct, nUpper, cjk, en, de, fr, es))
  }

  /** Word n-grams over the canonical tokenization (space-only trim,
    * lowercase, `\s+` split with trailing empties kept — identical to
    * `split(trim(lower(text)), '\s+')`), joined by single spaces.
    * `tokens < n` → empty array, matching the SQL `len(toks) >= n`
    * guard. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val raw = text.toString
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    val toks = wsSplit.split(raw.substring(lo, hi).toLowerCase, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fixed-size token chunks with overlap — context-window preparation
    * for training pipelines: canonical tokens (see [[wordNgrams]]) are
    * windowed at stride `size - overlap`; every start index below the
    * token count opens a chunk, the last chunk may run short, chunks are
    * single-space joined. Mirrors the SQL `generate_series(0, n-1,
    * stride)` + slice form exactly. */
  def tokenChunks(text: UTF8String, size: Int, overlap: Int): ArrayData = {
    // duplicated from the Column wrapper: the kernel is callable directly
    // (and from generated code), and overlap >= size would otherwise be a
    // divide-by-zero / negative-stride, not a clear error
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    if (text == null) return null
    val raw = text.toString
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    val toks = wsSplit.split(raw.substring(lo, hi).toLowerCase, -1)
    val n = toks.length
    val stride = size - overlap
    val m = (n + stride - 1) / stride // starts 0, stride, ... below n
    val out = new Array[Any](m)
    var c = 0
    while (c < m) {
      val start = c * stride
      val end = math.min(start + size, n)
      val sb = new java.lang.StringBuilder
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches, single sweep. */
  def bpeishCount(text: UTF8String): Int = {
    if (text == null) return 0
    val s = text.toString
    val n = s.length
    var count = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        count += 1
        i += 1
        while (i < n && {
          val d = s.charAt(i); (d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z')
        }) i += 1
      } else if (c >= '0' && c <= '9') {
        count += 1
        i += 1
        while (i < n && { val d = s.charAt(i); d >= '0' && d <= '9' }) i += 1
      } else if (!isJavaRegexWs(c)) {
        count += 1
        i += 1
      } else i += 1
    }
    count
  }

  // Java regex \s = [ \t\n\x0B\f\r] (ASCII-only, unlike Character.isWhitespace)
  private def isJavaRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  val deflateType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("deflate_len", LongType, nullable = false)))

  /** See [[TextAnalysis.deflateStats]]. Raw DEFLATE (nowrap) so the
    * measurement is the entropy-coded stream alone — no zlib header/adler
    * constant that would bias short documents. Deterministic for a given
    * (input, level): Deflater wraps the JDK's bundled zlib with fixed
    * default strategy. */
  def deflateStats(text: UTF8String, level: Int): InternalRow = {
    if (text == null) return null
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(level, true)
    var total = 0L
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) total += d.deflate(buf)
    } finally d.end()
    new GenericInternalRow(Array[Any](bytes.length.toLong, total))
  }
}
