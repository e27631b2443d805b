package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.TextAnalysis

/** Degenerate-input behavior across the operator families: EMPTY frames
  * and all-filtered corpora must flow through every pipeline as empty
  * results (or documented errors), never crashes — at 100 TB a pipeline
  * stage receiving zero rows (a filter that matched nothing, a quiet
  * ingestion day, an empty source partition) is routine, and an operator
  * that throws on it takes the whole job down. Trained-model operators
  * (IVF/PQ/PCA/BPE/classifier) are the documented exception: a model
  * cannot be trained on nothing, and they REQUIRE non-empty input with a
  * clear message instead of returning a silent garbage model. */
class DegenerateInputSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
  private val someDocs = Seq(
    (1L, "a real document with plenty of text to shingle"),
    (2L, "another unrelated document full of different words")).toDF("doc_id", "text")

  test("dedup family: empty corpus flows through as empty, not a crash") {
    Dedup.exactGroups(noDocs, "doc_id", "text").count() shouldBe 0L
    Dedup.minhashPairs(noDocs, "doc_id", "text").count() shouldBe 0L
    Dedup.minhashPairsDirect(noDocs, "doc_id", "text").count() shouldBe 0L
    Dedup.simhashPairs(noDocs, "doc_id", "text").count() shouldBe 0L
    // a corpus whose every doc is shingle-less behaves like an empty one
    val allShort = Seq((1L, "ab"), (2L, "xy")).toDF("doc_id", "text")
    Dedup.minhashPairs(allShort, "doc_id", "text").count() shouldBe 0L
    Dedup.simhashPairs(allShort, "doc_id", "text").count() shouldBe 0L
  }

  test("cluster selection with no pairs keeps every document") {
    Dedup.connectedComponents(noPairs).count() shouldBe 0L
    Dedup.keepCanonical(someDocs, "doc_id", noPairs)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    Dedup.keepBest(someDocs, "doc_id", noPairs,
        org.apache.spark.sql.functions.length(col("text")))
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("incremental dedup: empty batch and empty corpus are both identities") {
    Dedup.dedupAgainstCorpus(noDocs, someDocs, "doc_id", "text").count() shouldBe 0L
    Dedup.dedupAgainstCorpus(someDocs, noDocs, "doc_id", "text")
      .count() shouldBe 2L
    Dedup.neardupAgainstCorpus(noDocs, someDocs, "doc_id", "text").count() shouldBe 0L
    Dedup.neardupAgainstCorpus(someDocs, noDocs, "doc_id", "text")
      .count() shouldBe 2L
  }

  test("corpus statistics over an empty corpus are empty") {
    CorpusStats.topNgrams(noDocs, "text", 2, 10).count() shouldBe 0L
    CorpusStats.tfidfBm25(noDocs, "doc_id", "text").count() shouldBe 0L
    CorpusStats.unigramNll(noDocs, "doc_id", "text").count() shouldBe 0L
    CorpusStats.bigramNll(noDocs, "doc_id", "text").count() shouldBe 0L
    CorpusStats.removeBoilerplateLines(noDocs, "doc_id", "text", 2).count() shouldBe 0L
    CorpusStats.dedupLinesGlobal(noDocs, "doc_id", "text").count() shouldBe 0L
    SpanDedup.duplicatedSpanStats(noDocs, "doc_id", "text", 5).count() shouldBe 0L
    SpanDedup.dropMostlyDuplicated(someDocs, "doc_id", "text", 5, 0.5)
      .count() shouldBe 2L // no duplicated spans -> nothing dropped
  }

  test("decontamination against an empty eval set flags nothing") {
    val r = Decontaminate.overlap(someDocs, noDocs, "doc_id", "text")
    r.filter(col("contaminated")).count() shouldBe 0L
    r.count() shouldBe 2L
    Decontaminate.reportPerEval(someDocs, noDocs, "doc_id", "text").count() shouldBe 0L
  }

  test("ANN: empty query side is empty; empty corpus rejects training clearly") {
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    Ann.bruteForceTopK(noVecs, vecs, "vec_id", "embedding", 3).count() shouldBe 0L
    Ann.lshTopK(noVecs, vecs, "vec_id", "embedding", 3).count() shouldBe 0L
    // model trainers refuse an empty corpus loudly (a silent empty model
    // would "work" and return zero neighbors for every query)
    an[IllegalArgumentException] should be thrownBy
      Ann.trainCentroids(noVecs.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", 4, 1)
  }

  test("sampling and packing over empty frames stay empty") {
    Sampling.budgetFill(noDocs, "doc_id", "text", lit(1L), "s", Map.empty, 10L)
      .count() shouldBe 0L
    Sampling.packSequences(noDocs, "doc_id", lit(1L), "s", 16L).count() shouldBe 0L
    Sampling.renderPackedSequences(noDocs, "doc_id", "text", lit(1L), "s", 16L, " ")
      .count() shouldBe 0L
    Sampling.shardManifest(noDocs, "doc_id", lit(1L), "s", 8).count() shouldBe 0L
    Sampling.weightedSamplePerStratum(noDocs, "doc_id", lit("x"), lit(1.0), "s", 3)
      .count() shouldBe 0L
  }

  test("weighted sampling: non-positive and NaN weights are never selected") {
    // w < 0 made u^(1/w) > 1 -- winning every draw; w = 0 divided by zero;
    // NaN passed `> 0` (Spark orders NaN above every double) and its NaN
    // key ranked FIRST under the DESC draw
    val rows = Seq((1L, "s", -5.0), (2L, "s", 0.0), (5L, "s", Double.NaN),
      (3L, "s", 1.0), (4L, "s", 2.0))
      .toDF("id", "st", "w")
    val kept = Sampling.weightedSamplePerStratum(rows, "id", col("st"), col("w"), "x", 2)
      .select("id").as[Long].collect().sorted
    kept shouldBe Array(3L, 4L)
  }

  test("running-total operators exclude malformed weights instead of poisoning the stratum") {
    // a NaN weight in a cumulative sum makes every LATER row's total NaN:
    // budgetFill then silently truncates the stratum (NaN fails <=), and
    // packSequences dies on the NaN -> long bin cast under ANSI; a
    // negative weight refunds budget never spent
    val rows = Seq(
      (1L, "s", Some(5.0)), (2L, "s", Some(Double.NaN)), (3L, "s", Some(-3.0)),
      (4L, "s", None: Option[Double]), (5L, "s", Some(5.0)), (6L, "s", Some(0.0)))
      .toDF("id", "st", "w")
    val filled = Sampling.budgetFill(rows, "id", "st", col("w"), "bf",
      Map.empty, defaultBudget = 100L)
    // every well-formed row admitted; the NaN/negative/NULL rows excluded,
    // NOT the rows hashing after them
    filled.select("id").as[Long].collect().sorted shouldBe Array(1L, 5L, 6L)
    val packed = Sampling.packSequences(rows, "id", col("w"), "pk", 16L)
    packed.select("id").as[Long].collect().sorted shouldBe Array(1L, 5L, 6L)
    packed.filter(col("bin").isNull || col("bin") < 0).count() shouldBe 0L
  }

  // ANSI mode (on in GraftSession) turns division by zero into a THROWN
  // error, so a single degenerate document would kill a whole corpus scan
  // if any quality ratio divided by a zero count. The guards route those
  // through nullif -> NULL (the malformed-input policy: fails every
  // threshold, sorts last).
  test("empty / whitespace-only documents: quality signals NULL, never a crash") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "A real document, here."))
      .toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id") +: TextAnalysis.qualitySignals(col("text"))
        .map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id")).collect()
    out(0).getAs[Int]("n_chars") shouldBe 0
    out(0).isNullAt(out(0).fieldIndex("punct_ratio")) shouldBe true
    out(0).isNullAt(out(0).fieldIndex("upper_ratio")) shouldBe true
    // whitespace-only: n_chars > 0 (space-only trim feeds the tokenizer),
    // all ratios defined
    out(1).getAs[Int]("n_chars") shouldBe 3
    out(1).getAs[Double]("punct_ratio") shouldBe 0.0
    out(2).getAs[Double]("punct_ratio") should be > 0.0
    // a threshold filter over the signals drops the empty doc (NULL
    // predicate), instead of throwing DIVIDE_BY_ZERO
    val sig = TextAnalysis.qualitySignals(col("text")).toMap
    docs.filter(sig("n_tokens") >= 1 && sig("punct_ratio") >= 0.0)
      .count() shouldBe 2L
  }

  test("classifier training survives an empty document in the corpus") {
    val docs = Seq((1L, ""), (2L, "the quick brown fox."), (3L, "AND THE LOUD ONE"))
      .toDF("doc_id", "text")
    val st = TextAnalysis.textStats(col("text"))
    val feats = docs
      .select(col("doc_id"), (col("doc_id") % 2 === 0).cast("int").as("y"), st.as("__st"))
      .select(col("doc_id"), col("y"),
        (TextAnalysis.statsField(col("__st"), "n_punct").cast("double") /
          nullif(TextAnalysis.statsField(col("__st"), "n_chars"), lit(0))).as("x1"))
    val w = QualityClassifier.train(feats, "y", Seq("x1"), lr = 0.5, iters = 2)
    w.foreach(v => assert(!v.isNaN, "weights must stay finite"))
    val scored = QualityClassifier.score(feats, w, Seq("x1"))
    scored.count() shouldBe 3L
    // the empty doc scores NULL (feature NULL), the others get real probs
    scored.filter(col("doc_id") === 1L && col("p").isNull).count() shouldBe 1L
    scored.filter(col("p").isNotNull).count() shouldBe 2L
  }

  test("deflate ratio of an empty document is NULL under the nullif guard") {
    val docs = Seq((1L, ""), (2L, "some genuinely compressible text text text"))
      .toDF("doc_id", "text")
    val r = docs
      .select(col("doc_id"), TextAnalysis.deflateStats(col("text")).as("__d"))
      .select(col("doc_id"), col("__d")("n_bytes").as("nb"),
        (col("__d")("deflate_len").cast("double") /
          nullif(col("__d")("n_bytes"), lit(0L))).as("ratio"))
      .orderBy(col("doc_id")).collect()
    r(0).getAs[Long]("nb") shouldBe 0L
    r(0).isNullAt(r(0).fieldIndex("ratio")) shouldBe true
    r(1).getAs[Double]("ratio") should be > 0.0
  }

  test("PQ / IVF-PQ: zero-norm vectors are excluded, not a DIVIDE_BY_ZERO") {
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f)), (4L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0f, 0.1f)), (11L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pq = Ann.pqTopK(queries, corpus, "vec_id", "embedding", k = 2,
      m = 2, nCodes = 2, trainIters = 1, rerankFactor = 4)
    pq.filter(col("query_id") === 11L).count() shouldBe 0L
    pq.filter(col("neighbor_id") === 3L).count() shouldBe 0L
    pq.filter(col("query_id") === 10L).count() should be > 0L
    val ivfpq = Ann.ivfPqTopK(queries, corpus, "vec_id", "embedding", k = 2,
      nCentroids = 2, nProbe = 2, m = 2, nCodes = 2, trainIters = 1,
      rerankFactor = 4)
    ivfpq.filter(col("query_id") === 11L).count() shouldBe 0L
    ivfpq.filter(col("neighbor_id") === 3L).count() shouldBe 0L
  }

  test("IVF-PQ: a failed trainer propagates from the concurrent barrier") {
    // the two trainers run concurrently over one shared cache; the await
    // is all-then-rethrow, so a PQ seed shortfall (nCodes > corpus rows)
    // must surface as the trainer's own require, never a hang or a
    // swallowed failure with a half-trained model
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ann.ivfPqTopK(queries, corpus, "vec_id", "embedding", k = 1,
        nCentroids = 2, nProbe = 2, m = 2, nCodes = 64, trainIters = 1,
        rerankFactor = 2).collect()
    }
    e.getMessage should include ("nCodes")
  }

  test("NaN-component embeddings: cosine NULL, excluded from quantized ANN") {
    import graft.functions.VectorMath
    // a NaN component makes the norm NaN, not zero: `denom == 0` missed
    // it and `__nrm > 0` passed it (NaN > 0 is true in Spark) — the NaN
    // cosine then outranked every real neighbor under NaN-is-greatest
    // ordering, the exact failure the zero-norm guard exists to close
    // Infinity components are the same class: Inf > 0 passes a bare
    // positivity check, NaN <= MaxValue and Inf <= MaxValue are both
    // false, and x/Inf = NaN would poison normalized vectors
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(Float.NaN, 1.0f)),
      (3L, Array(0.6f, 0.8f)), (4L, Array(0.0f, 1.0f)),
      (5L, Array(Float.PositiveInfinity, 1.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0f, 0.1f)), (11L, Array(Float.NaN, 2.0f)))
      .toDF("vec_id", "embedding")
    val cos = corpus.select(
      VectorMath.cosine(col("embedding"), typedLit(Seq(1.0, 0.0))).as("c"))
      .collect()
    cos.count(_.isNullAt(0)) shouldBe 2 // NaN and Inf rows NULL, never NaN
    cos.filter(!_.isNullAt(0)).foreach(r => assert(!r.getDouble(0).isNaN))
    // brute force: the NaN corpus row can never be a ranked neighbor
    val bf = Ann.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 2)
    bf.filter(col("neighbor_id") === 2L && col("cosine").isNotNull)
      .count() shouldBe 0L
    // quantized paths: NaN-norm vectors are excluded on both sides like
    // zero-norm ones (a NaN reaching the quantizer poisons min/max stats)
    val pq = Ann.pqTopK(queries, corpus, "vec_id", "embedding", k = 2,
      m = 2, nCodes = 2, trainIters = 1, rerankFactor = 4)
    pq.filter(col("query_id") === 11L).count() shouldBe 0L
    pq.filter(col("neighbor_id") === 2L || col("neighbor_id") === 5L)
      .count() shouldBe 0L
    val ivfpq = Ann.ivfPqTopK(queries, corpus, "vec_id", "embedding", k = 2,
      nCentroids = 2, nProbe = 2, m = 2, nCodes = 2, trainIters = 1,
      rerankFactor = 4)
    ivfpq.filter(col("query_id") === 11L).count() shouldBe 0L
    ivfpq.filter(col("neighbor_id") === 2L || col("neighbor_id") === 5L)
      .count() shouldBe 0L
  }

  test("profile and drift over empty frames: defined, not crashing") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val prof = Profile.profile(empty, Seq("k", "v"))
    prof.count() shouldBe 2L // one row per profiled column
    prof.filter(col("n_rows") === 0).count() shouldBe 2L
    Drift.psiReport(empty, empty, col("k")).count() shouldBe 0L
  }
}
