package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-level term statistics for training-data pipelines (SURVEY.md
  * §2.3 #49-50): heavy-hitter n-grams and per-document TF-IDF / BM25 term
  * scoring. Both are classic one-scan shapes: explode terms → hash
  * aggregate with map-side partial aggregation, so the shuffle carries one
  * row per distinct key per partition — never one row per token.
  */
object CorpusStats {

  /** Top-k corpus n-grams by occurrence count (boilerplate detection /
    * vocabulary heavy hitters). Total order `(count DESC, ngram ASC)`
    * before the limit makes the cut deterministic; Spark plans the
    * order+limit as TakeOrderedAndProject — each partition keeps a k-row
    * heap and only k rows per partition reach the driver-side merge,
    * so the full sorted term dictionary is never materialized. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)

  /** Per-document top terms by TF-IDF, with BM25 alongside (the two
    * standard relevance scores a quality/boilerplate pipeline wants).
    *
    *   idf      = ln((N + 1) / (df + 1))           (smoothed)
    *   tfidf    = tf · idf
    *   idf_bm25 = ln(1 + (N − df + 0.5)/(df + 0.5))  (Robertson-Sparck Jones)
    *   bm25     = idf_bm25 · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * All counts stay exact integers until the final double formulas, and
    * `avgdl` is an integer-sum average (exact in double far past any real
    * corpus size), so the scores are reproducible cross-engine and
    * independent of partitioning.
    *
    * Scale shape: tf is one explode + partial-agg'd hash aggregate; df
    * reuses tf (no second corpus scan); N/avgdl is a 1-row aggregate
    * (riding dl's doc-sized partial-agg chain) broadcast into the scoring
    * join; `dl` itself is NOT a join — it is a window sum over the same
    * doc_id exchange the per-doc top-k window needs anyway. The former
    * tf⋈dl join exchanged the full term-level tf table by doc_id a second
    * time purely to attach a per-doc sum the window partitioning already
    * co-locates (measured at sf0.1: 2.05 → 1.4 s wall, one fewer
    * tf-sized exchange). */
  def tfidfBm25(docs: DataFrame, idCol: String, textCol: String,
      topPerDoc: Int = 3, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totals = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    val wdl = Window.partitionBy(col(idCol))
    val scored = tf
      .join(df, Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("dl", sum(col("tf")).over(wdl))
      .withColumn("tfidf", col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)))
      .withColumn("bm25",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))

    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topPerDoc)
      .select(col(idCol), col("rank"), col("term"), col("tf"),
        round(col("tfidf"), 6).as("tfidf_r"), round(col("bm25"), 6).as("bm25_r"))
  }

  /** Per-document unigram negative log-likelihood — the perplexity-proxy
    * quality signal (documents whose tokens are improbable under the
    * corpus's own unigram distribution are gibberish, boilerplate soup,
    * or the wrong language):
    *
    *   p(term)  = (count(term) + 1) / (T + V)   (add-one smoothing)
    *   avg_nll  = mean over the doc's tokens of −ln p(term)
    *
    * The per-doc mean sums ROUNDED per-token values through DECIMAL, so
    * the aggregate is exact and order-independent — a raw double sum
    * would make the result depend on partitioning. The MEAN itself is
    * then taken in exact integer micro-units (half-up on the rational
    * sum/n, `(2s+n) div 2n`), not as a rounded double division: the
    * division's 1-ulp wobble across engines can land the unrounded mean
    * on opposite sides of a 6dp rounding boundary (observed once at
    * sf0.1: 3.402035 vs 3.402036), and integer arithmetic is the one
    * form both engines compute identically.
    *
    * Scale shape: one explode feeds both the corpus counts (partial-agg'd
    * hash aggregate) and the scoring join on the term — vocab-sized build
    * side, corpus tokens stream; the 1-row totals broadcast; the per-doc
    * mean regroups on the doc id. */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("t_tokens"), count(lit(1)).as("v_vocab"))
    toks
      // vocab-sized build side, corpus tokens stream: without the hint AQE
      // may sort-merge — shuffling every token row twice (plan-audited)
      .join(broadcast(counts), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("nll", -log((col("c") + 1.0) / (col("t_tokens") + col("v_vocab"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(round(col("nll"), 6).cast("decimal(18,6)")).as("__sum_dec"))
      .select(col(idCol), col("n_tokens"),
        (expr("(2 * CAST(__sum_dec * 1000000 AS BIGINT) + n_tokens) div (2 * n_tokens)")
          .cast("double") / 1e6).as("avg_nll"))
  }

  /** C4/RefinedWeb-style boilerplate-line removal: strip every line that
    * appears in at least `minDocFreq` distinct documents (headers,
    * footers, navigation chrome, license banners), preserving the order
    * of the surviving lines.
    *
    * Scale shape: document TEXT never shuffles. Two corpus scans — one
    * explode to count per-line document frequency (map-side partial agg
    * on the line hash), one to locate removal positions — and the only
    * per-doc shuffle carries `(doc, position:int)` for removed lines.
    * The boilerplate set is broadcast into the position join, and
    * reconstruction is a columnar indexed `filter` over `split(text)`
    * against each doc's (typically tiny) removed-position set; documents
    * with no boilerplate short-circuit to their original text. A doc
    * that is ALL boilerplate comes back as the empty string. */
  def removeBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines
      // blank lines are STRUCTURE (paragraph separators), not boilerplate:
      // without this guard any corpus with >= minDocFreq multi-paragraph
      // docs silently collapses paragraph breaks corpus-wide
      .filter(length(trim(col("__line"))) > 0)
      .select(col(idCol), col("__line")).distinct()
      .groupBy(col("__line")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__line"))
    val removed = lines.join(broadcast(boiler), Seq("__line"))
      .groupBy(col(idCol)).agg(collect_set(col("__pos")).as("__rm"))
    docs.join(removed, Seq(idCol), "left_outer")
      .select(col(idCol),
        when(col("__rm").isNull, col(textCol))
          .otherwise(array_join(
            filter(split(col(textCol), "\n"),
              (l, i) => !array_contains(col("__rm"), i)),
            "\n")).as(textCol))
  }

  /** RefinedWeb-style GLOBAL exact line dedup: every non-blank line that
    * already occurred anywhere earlier in the corpus (first occurrence =
    * smallest `(doc, position)`) is removed; the first occurrence stays.
    * Complements [[removeBoilerplateLines]]: boilerplate removal deletes
    * ALL occurrences of lines crossing a document-frequency threshold,
    * line dedup keeps exactly ONE canonical copy of every distinct line
    * corpus-wide. Blank lines are structure and never dedup.
    *
    * Scale shape: document text never shuffles — the keep-first window
    * partitions on `md5(line)` PROJECTED BEFORE the exchange, so the
    * shuffle carries `(id, pos:int, hash)` per line occurrence, not the
    * line text; removal positions regroup on the doc id and the
    * reconstruction is the same columnar indexed filter as boilerplate
    * removal. A doc whose every line was seen earlier comes back empty. */
  def dedupLinesGlobal(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    dedupUnitsGlobal(docs, idCol, textCol, sep = "\n")

  /** [[dedupLinesGlobal]] generalized to any exact unit separator — pass
    * `"\n\n"` for RefinedWeb's PARAGRAPH-granularity pass (both
    * granularities run in production pipelines: paragraphs catch
    * reflowed copies whose lines differ, lines catch shared headers
    * inside unique paragraphs). The separator is treated literally
    * (regex-quoted) and rejoins losslessly. */
  def dedupUnitsGlobal(docs: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val occurrences = docs
      .select(col(idCol),
        posexplode(split(col(textCol), sepRe)).as(Seq("__pos", "__line")))
      .filter(length(trim(col("__line"))) > 0)
      // hash BEFORE the window's exchange: the unit text stays columnar
      // in the scan and never crosses the wire
      .select(col(idCol), col("__pos"), md5(col("__line")).as("__h"))
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol), col("__pos"))
    val removed = occurrences
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .groupBy(col(idCol)).agg(collect_set(col("__pos")).as("__rm"))
    docs.join(removed, Seq(idCol), "left_outer")
      .select(col(idCol),
        when(col("__rm").isNull, col(textCol))
          .otherwise(array_join(
            filter(split(col(textCol), sepRe),
              (l, i) => !array_contains(col("__rm"), i)),
            sep)).as(textCol))
  }

  /** Per-document interpolated BIGRAM negative log-likelihood — the
    * CCNet-style language-model perplexity filter, one notch above
    * [[unigramNll]] (it catches shuffled-word salad that unigram
    * statistics cannot: every token common, every transition improbable):
    *
    *   p(w2|w1) = λ_bg · c(w1 w2)/h(w1)  +  λ_uni · (c(w2)+1)/(T+V)
    *   avg_nll  = mean over the doc's bigrams of −ln p
    *
    * where `h(w1)` is w1's count as a bigram HEAD (so the conditional
    * sums to 1 over the observed continuations) and the unigram arm uses
    * the same add-one smoothing as [[unigramNll]]. Scoring the training
    * corpus itself means every scored bigram exists in the model — the
    * smoothing arm handles the interpolation floor, not unseen events.
    * `lambdaBg`/`lambdaUni` are SEPARATE parameters (not 1−λ) so both
    * literals reach the plan exactly as given — `1 − 0.7` in IEEE double
    * is not `0.3`, and the oracle writes `0.3`.
    *
    * The per-doc mean multiplies each DISTINCT bigram's rounded NLL
    * (decimal) by its exact integer in-doc count before the decimal sum,
    * so the aggregate is exact and partition-order-independent.
    *
    * Scale shape: the corpus token stream collapses to per-doc distinct
    * bigrams (map-side partial agg) BEFORE any join; the bigram model —
    * the one table that outgrows a broadcast at corpus scale (it grows
    * ~linearly with corpus size where the vocab saturates) — joins on the
    * bigram key both sides already hash on; the head-count and unigram
    * tables are vocab-sized broadcasts; the 1-row totals broadcast; the
    * final mean regroups on the doc id. Documents with fewer than two
    * tokens have no bigrams and are absent from the result. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
      lambdaBg: Double = 0.7, lambdaUni: Double = 0.3): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val ucounts = toks.groupBy(col("term")).agg(count(lit(1)).as("cu"))
    val totals = ucounts.agg(sum(col("cu")).as("t_tokens"),
      count(lit(1)).as("v_vocab"))
    // ONE bigram-keyed exchange shared three ways (guide §2.4): the
    // model count (groupBy bg), the per-doc tf (groupBy (id, bg) —
    // hash(bg) satisfies its clustering by the subset rule), and their
    // join all consume the same repartition through ReusedExchange. The
    // former shape paid three separate bigram-level exchanges: the model
    // build, the tf build, and a re-shuffle of tf onto the join key.
    val bg = docs
      .select(col(idCol), explode(TextAnalysis.wordNgrams(col(textCol), 2)).as("bg"))
      .repartition(col("bg"))
    val bgc = bg.groupBy(col("bg")).agg(count(lit(1)).as("cbg"))
    val hist = bgc
      .groupBy(substring_index(col("bg"), " ", 1).as("__w1"))
      .agg(sum(col("cbg")).as("ch"))
    val tf = bg.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("tf"))
    tf
      .join(bgc, Seq("bg"))
      .withColumn("__head", substring_index(col("bg"), " ", 1))
      .withColumn("__cont", substring_index(col("bg"), " ", -1))
      .join(broadcast(hist), col("__head") === col("__w1"))
      .join(broadcast(ucounts.withColumnRenamed("term", "__t")),
        col("__cont") === col("__t"))
      .crossJoin(broadcast(totals))
      .withColumn("nll", -log(
        lit(lambdaBg) * col("cbg") / col("ch") +
          lit(lambdaUni) * (col("cu") + 1.0) / (col("t_tokens") + col("v_vocab"))))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        sum(round(col("nll"), 6).cast("decimal(18,6)") * col("tf")).as("__sum_dec"))
      // same exact integer-micro mean as unigramNll (see its Scaladoc)
      .select(col(idCol), col("n_bigrams"),
        (expr("(2 * CAST(__sum_dec * 1000000 AS BIGINT) + n_bigrams) div (2 * n_bigrams)")
          .cast("double") / 1e6).as("avg_nll"))
  }

  /** Source-to-source n-gram overlap matrix (SURVEY.md §2.3 #48c): for
    * every pair of corpus sources, how many distinct word n-grams they
    * share and the Jaccard of their gram sets — the dataset-curation
    * view that finds mirrored crawls, re-scraped dumps, and common
    * boilerplate BETWEEN datasets before they are mixed.
    *
    * Scale shape: one distinct over `(source, gram)`, then grams reduce
    * to their source SET (bounded by the number of sources, never by
    * corpus size) and each gram emits its ≤C(s,2) source pairs — the
    * matrix aggregation is over pair keys, so nothing corpus-sized
    * crosses the second exchange. No text survives the first projection. */
  def sourceOverlapMatrix(docs: DataFrame, srcCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = docs
      .select(col(srcCol).as("src"),
        explode(graft.functions.TextAnalysis.wordNgrams(col(textCol), n)).as("__g"))
      .distinct()
    val totals = grams.groupBy(col("src")).agg(count(lit(1)).as("__n"))
    val pairs = grams
      .groupBy(col("__g")).agg(sort_array(collect_set(col("src"))).as("__srcs"))
      .filter(size(col("__srcs")) > 1)
      .select(col("__srcs"), posexplode(col("__srcs")))
      .toDF("__srcs", "__i", "src_a")
      .select(col("src_a"), col("__i"), posexplode(col("__srcs")))
      .toDF("src_a", "__i", "__j", "src_b")
      .filter(col("__i") < col("__j"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(totals.select(col("src").as("src_a"), col("__n").as("__na"))), "src_a")
      .join(broadcast(totals.select(col("src").as("src_b"), col("__n").as("__nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared"),
        (col("shared").cast("double") /
          (col("__na") + col("__nb") - col("shared"))).as("sim"))
  }
}
