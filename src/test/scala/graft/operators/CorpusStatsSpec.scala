package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.TextAnalysis

class CorpusStatsSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ngramsOf(text: String, n: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(TextAnalysis.wordNgrams(col("text"), n).as("ng"))
      .as[Seq[String]].head()

  test("wordNgrams emits ordered n-grams with multiplicity") {
    ngramsOf("the cat sat on the cat", 2) shouldBe
      Seq("the cat", "cat sat", "sat on", "on the", "the cat")
  }

  test("wordNgrams normalizes case/whitespace and guards short docs") {
    ngramsOf("  The   CAT  ", 2) shouldBe Seq("the cat")
    ngramsOf("one two", 3) shouldBe Seq.empty // size < n → empty, not sequence-down
    ngramsOf("word", 1) shouldBe Seq("word")
  }

  test("topNgrams counts across docs and cuts deterministically") {
    val docs = Seq("a b c", "a b d", "x a b").toDF("text")
    val top = CorpusStats.topNgrams(docs, "text", n = 2, k = 2)
      .as[(String, Long)].collect().toSeq
    top shouldBe Seq(("a b", 3L), ("b c", 1L)) // tie at 1 → lexicographic
  }

  test("tfidfBm25 matches hand-computed scores on a 3-doc corpus") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"), (3L, "durian"))
      .toDF("doc_id", "text")
    val out = CorpusStats.tfidfBm25(docs, "doc_id", "text", topPerDoc = 1)
      .as[(Long, Int, String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap

    // N=3, avgdl = (3+2+1)/3 = 2.0
    def idf(df: Long) = math.log((3 + 1.0) / (df + 1.0))
    def bm25(tf: Long, df: Long, dl: Long) =
      math.log(1.0 + (3 - df + 0.5) / (df + 0.5)) *
        (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    out(1L) shouldBe (("apple", 2L, r6(2 * idf(1)), r6(bm25(2, 1, 3))))
    // doc 2: banana and cherry tie on tf=1 — cherry's df=1 gives higher idf
    out(2L) shouldBe (("cherry", 1L, r6(idf(1)), r6(bm25(1, 1, 2))))
    // doc 3: single term
    out(3L) shouldBe (("durian", 1L, r6(idf(1)), r6(bm25(1, 1, 1))))
  }

  test("decontaminate flags planted eval copies and passes clean docs") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // full copy → ratio 1.0
      (2L, "intro words alpha beta gamma delta epsilon zeta outro"), // partial
      (3L, "totally unrelated text with many different words here"), // clean
      (4L, "tiny doc")) // < 5 tokens → absent from output
      .toDF("doc_id", "text")
    val out = Decontaminate.overlap(train, eval, "doc_id", "text", n = 5, threshold = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((2L, 2L, 1.0, true))
    // doc 2: 9 tokens → 5 five-grams, 2 of which are eval n-grams
    out(2L) shouldBe ((5L, 2L, 0.4, false))
    out(3L)._2 shouldBe 0L
    out(3L)._4 shouldBe false
  }

  test("token chunking windows at stride size-overlap; short tail kept") {
    import graft.functions.TextAnalysis
    // 10 tokens, size 4, overlap 1 -> stride 3 -> starts 0,3,6,9
    val text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    val out = Seq(text).toDF("text")
      .select(explode(TextAnalysis.tokenChunks(col("text"), 4, 1)).as("c"))
      .as[String].collect().toSeq
    out shouldBe Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9")
    // no overlap: exact partition
    val out2 = Seq(text).toDF("text")
      .select(explode(TextAnalysis.tokenChunks(col("text"), 5, 0)).as("c"))
      .as[String].collect().toSeq
    out2 shouldBe Seq("t0 t1 t2 t3 t4", "t5 t6 t7 t8 t9")
    // shorter than one chunk: a single chunk, canonical tokenization
    val out3 = Seq("  Hello   World  ").toDF("text")
      .select(explode(TextAnalysis.tokenChunks(col("text"), 64, 8)).as("c"))
      .as[String].collect().toSeq
    out3 shouldBe Seq("hello world")
    // degenerate geometry is a clear error, not a /-by-zero: overlap ==
    // size (stride 0) and overlap > size (negative stride) both refuse,
    // in the Column wrapper and in the kernel itself
    an[IllegalArgumentException] shouldBe thrownBy(
      TextAnalysis.tokenChunks(col("text"), 4, 4))
    an[IllegalArgumentException] shouldBe thrownBy(
      TextAnalysis.tokenChunks(col("text"), 4, 7))
    an[IllegalArgumentException] shouldBe thrownBy(
      graft.functions.TextAnalysisImpl.tokenChunks(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c"), 2, 2))
  }

  test("decontaminate beyond-broadcast regime is row-identical to broadcast") {
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six seven")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "intro words alpha beta gamma delta epsilon zeta outro"),
      (3L, "totally unrelated text with many different words here"),
      (4L, "tiny doc"),
      (5L, "zero one two three four five six seven eight"))
      .toDF("doc_id", "text")
    def rows(maxBroadcastTokens: Long) =
      Decontaminate.overlap(train, eval, "doc_id", "text", n = 5,
          threshold = 0.5, maxBroadcastTokens = maxBroadcastTokens)
        .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    // maxBroadcastTokens = 0 forces the Bloom-prefiltered shuffle regime
    rows(0L) shouldBe rows(Long.MaxValue)
  }

  test("decontaminate bloom prefilter passes every true member (no false negatives)") {
    val build = (1 to 500).map(i => s"ngram token sequence number $i").toDF("g")
    val probe = (1 to 1000).map(i => s"ngram token sequence number $i").toDF("g")
    val kept = Decontaminate.bloomFiltered(probe, build, "g", expectedItems = 500)
      .as[String].collect().toSet
    (1 to 500).foreach(i => kept should contain(s"ngram token sequence number $i"))
  }

  test("unigram NLL matches the hand-computed smoothed distribution") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2, b=2, c=1; T=5, V=3 → p(a)=p(b)=3/8, p(c)=2/8
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nA = r6(-math.log(3.0 / 8)); val nC = r6(-math.log(2.0 / 8))
    val out = CorpusStats.unigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out(1L) shouldBe ((3L, r6((nA * 3) / 3))) // all three tokens share p=3/8
    out(2L) shouldBe ((2L, r6((nA + nC) / 2)))
  }

  test("global line dedup keeps first occurrence, blank structure, doc order") {
    val docs = Seq(
      (1L, "alpha\n\nshared\nbeta"),
      (2L, "shared\ngamma\nalpha"),
      (3L, "shared")).toDF("doc_id", "text")
    val out = CorpusStats.dedupLinesGlobal(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "alpha\n\nshared\nbeta" // first occurrences all stay
    out(2L) shouldBe "gamma"                 // shared+alpha seen in doc 1
    out(3L) shouldBe ""                      // everything seen earlier
    // in-doc repeats dedup too: only the first copy inside a doc stays
    val rep = CorpusStats.dedupLinesGlobal(
      Seq((1L, "x\nx\ny")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    rep(1L) shouldBe "x\ny"
  }

  test("bigram NLL matches the hand-computed interpolated model") {
    val docs = Seq((1L, "a b b a"), (2L, "a b")).toDF("doc_id", "text")
    // uni: a=3, b=3, T=6, V=2 → smoothed p(a)=p(b)=4/8
    // bigrams: "a b"=2, "b b"=1, "b a"=1; heads: a→2, b→2
    // p(b|a)=.7*2/2+.3*.5=0.85  p(b|b)=.7*1/2+.3*.5=0.5  p(a|b)=0.5
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nAB = r6(-math.log(0.85)); val nHalf = r6(-math.log(0.5))
    val out = CorpusStats.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out(1L) shouldBe ((3L, r6((nAB + nHalf + nHalf) / 3)))
    out(2L) shouldBe ((1L, nAB))
    // a one-token doc has no bigrams and is absent, not zero
    val single = CorpusStats.bigramNll(
      Seq((1L, "a b"), (2L, "lonely")).toDF("doc_id", "text"), "doc_id", "text")
    single.select("doc_id").as[Long].collect().toSet shouldBe Set(1L)
  }

  test("bigram NLL scores word salad above natural-order text") {
    // identical token multiset, scrambled transitions: unigram NLL would
    // tie these, the bigram model must separate them
    val docs = ((1L to 10L).map(i => (i, "the cat sat on the mat")) :+
      (11L, "sat the cat on mat the")).toDF("doc_id", "text")
    val nll = CorpusStats.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    nll(11L) should be > (nll(1L) * 1.5)
  }

  test("deflate stats: repetition compresses below prose; nulls propagate") {
    val docs = Seq(
      (1L, "spam " * 200),
      (2L, (1 to 200).map(i => s"w${i * 7919 % 1000}").mkString(" ")),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.deflateStats(col("text")).as("d"))
      .select(col("doc_id"), col("d")("n_bytes").as("nb"),
        col("d")("deflate_len").as("dl"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out(3L) shouldBe ((None, None))
    val rRep = out(1L)._2.get.toDouble / out(1L)._1.get
    val rVar = out(2L)._2.get.toDouble / out(2L)._1.get
    rRep should be < 0.05   // pure repetition: near-zero entropy
    rVar should be > (rRep * 3)
    out(1L)._1.get shouldBe 1000L // 200 × "spam " = exact utf-8 bytes
  }

  test("boilerplate lines strip across docs; order survives; unique lines stay") {
    val docs = Seq(
      (1L, "HEADER\nalpha\nbeta\nFOOTER"),
      (2L, "HEADER\ngamma\nFOOTER"),
      (3L, "HEADER\ndelta\nHEADER\nFOOTER"), // repeated boilerplate inside one doc
      (4L, "HEADER\nFOOTER")) // all boilerplate → empty
      .toDF("doc_id", "text")
    val out = CorpusStats.removeBoilerplateLines(docs, "doc_id", "text", minDocFreq = 3)
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "alpha\nbeta"
    out(2L) shouldBe "gamma"
    out(3L) shouldBe "delta"
    out(4L) shouldBe ""
  }

  test("boilerplate never strips blank lines: paragraph structure survives") {
    // the blank paragraph separator appears in all 3 docs — a naive doc-freq
    // count would classify it as boilerplate and collapse every paragraph
    val docs = Seq(
      (1L, "HEADER\npara one\n\npara two\nHEADER"),
      (2L, "HEADER\nalpha\n\nbeta\nHEADER"),
      (3L, "HEADER\ngamma\n\ndelta\nHEADER"))
      .toDF("doc_id", "text")
    val out = CorpusStats.removeBoilerplateLines(docs, "doc_id", "text", minDocFreq = 3)
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "para one\n\npara two"
    out(2L) shouldBe "alpha\n\nbeta"
    out(3L) shouldBe "gamma\n\ndelta"
  }

  test("boilerplate threshold counts distinct docs, not occurrences") {
    // "dup" appears 3 times but only in 2 docs → below minDocFreq=3, kept
    val docs = Seq(
      (1L, "dup\ndup\na"), (2L, "dup\nb"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = CorpusStats.removeBoilerplateLines(docs, "doc_id", "text", minDocFreq = 3)
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "dup\ndup\na"
    out(2L) shouldBe "dup\nb"
  }

  test("decontaminate overlap is occurrence-based for repeated leaks") {
    val eval = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    // the leaked 5-gram appears twice among the doc's 6 five-grams
    val train = Seq((10L,
      "one two three four five one two three four five")).toDF("doc_id", "text")
    val row = Decontaminate.overlap(train, eval, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Double, Boolean)].head()
    row._2 shouldBe 6L
    row._3 shouldBe 2L
  }

  test("source overlap matrix counts distinct shared grams with set Jaccard") {
    val docs = Seq(
      ("a", "one two three four"),   // grams: {one two, two three, three four}
      ("a", "one two extra words"),  // adds {one two(dup), two extra, extra words}
      ("b", "one two three zz"),     // shares {one two, two three} with a
      ("c", "totally disjoint text here")).toDF("source", "text")
    val m = CorpusStats.sourceOverlapMatrix(docs, "source", "text", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // a has 5 distinct grams, b has 3, shared 2 -> jaccard 2/(5+3-2)
    m(("a", "b"))._1 shouldBe 2L
    m(("a", "b"))._2 shouldBe 2.0 / 6.0
    m.keySet shouldBe Set(("a", "b")) // c appears in no pair
  }
}
