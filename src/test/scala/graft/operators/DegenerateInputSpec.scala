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

  test("weighted sampling: non-positive weights are never selected") {
    // w < 0 made u^(1/w) > 1 -- winning every draw; w = 0 divided by zero
    val rows = Seq((1L, "s", -5.0), (2L, "s", 0.0), (3L, "s", 1.0), (4L, "s", 2.0))
      .toDF("id", "st", "w")
    val kept = Sampling.weightedSamplePerStratum(rows, "id", col("st"), col("w"), "x", 2)
      .select("id").as[Long].collect().sorted
    kept shouldBe Array(3L, 4L)
  }

  test("profile and drift over empty frames: defined, not crashing") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val prof = Profile.profile(empty, Seq("k", "v"))
    prof.count() shouldBe 2L // one row per profiled column
    prof.filter(col("n_rows") === 0).count() shouldBe 2L
    Drift.psiReport(empty, empty, col("k")).count() shouldBe 0L
  }
}
