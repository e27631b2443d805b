package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.{Fingerprint, TextAnalysis, VectorMath}

class LlmOperatorsSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"), // near-dup of 1
    (3L, "completely different content about spark query engines at scale"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups byte-identical texts") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    g.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
  }

  test("minhash LSH finds near-dups and not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L)) // near-dup
    pairs should contain((1L, 4L)) // exact dup
    pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
  }

  test("collapsed minhash pipeline is row-identical to the direct plan") {
    // exact-copy families (the collapse target), near-dups, unrelated
    // docs, and shingle-less short texts (all-zero sentinel signatures:
    // excluded up front — their pairwise Jaccard is NaN, which Spark's
    // NaN-is-greatest ordering would otherwise pass through >= threshold,
    // pairing unrelated texts like "ab"/"xy")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "the quick brown fox jumps over the lazy dog again and again!"),
      (5L, "completely different content about spark query engines at scale"),
      (6L, "completely different content about spark query engines at scale"),
      (7L, "ab"), (8L, "ab"), (9L, "xy"),
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().sorted.toSeq
    val fast = rows(Dedup.minhashPairs(corpus, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.5))
    val direct = rows(Dedup.minhashPairsDirect(corpus, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.5))
    fast shouldBe direct
    // sanity: the copy families actually expanded
    fast.map(r => (r._1, r._2)) should contain allOf ((1L, 2L), (1L, 3L),
      (2L, 3L), (5L, 6L))
    // shingle-less docs are excluded from banding (no NaN passes, no
    // all-pairs candidate blowup from the shared sentinel signature) —
    // but IDENTICAL sub-k texts still pair via the exact companion
    val subkSide = Set(7L, 8L, 9L)
    fast.filter(r => subkSide(r._1) || subkSide(r._2))
      .map(r => (r._1, r._2)) shouldBe Seq((7L, 8L)) // and nothing else
    fast should contain((7L, 8L, 1.0))
    fast.forall(r => !r._3.isNaN) shouldBe true
    // the companion matches the shingle kernel's LOWERCASED equality:
    // case-differing sub-k texts are duplicates, like their longer kin
    val cased = Seq((21L, "Ab"), (22L, "aB"), (23L, "xy")).toDF("doc_id", "text")
    Dedup.minhashPairs(cased, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet shouldBe
      Set((21L, 22L))
  }

  test("simhash: identical docs at hamming 0, near-dups close, others far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    sh(1L) shouldBe sh(4L)
    java.lang.Long.bitCount(sh(1L) ^ sh(2L)) should be <= 6
    java.lang.Long.bitCount(sh(1L) ^ sh(3L)) should be > 10
  }

  test("simhash pairs: sub-k docs pair only on identity; radius > 3 rejected") {
    // sub-k texts all hash to the zero signature — they must not emit
    // hamming-0 "near-dup" pairs between UNRELATED texts (or all-pairs
    // band-join at scale); identical sub-k texts still pair at hamming 0
    // through the exact companion
    val mixed = docs.unionByName(Seq(
      (10L, "ab"), (11L, "ab"), (12L, "xy")).toDF("doc_id", "text"))
    val pairs = Dedup.simhashPairs(mixed, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 4L)) // exact dup still found
    pairs should contain((10L, 11L)) // identical sub-k texts
    pairs.exists(p => p._1 == 12L || p._2 == 12L) shouldBe false
    pairs.exists(p => Set(10L, 11L)(p._1) && !Set(10L, 11L)(p._2)) shouldBe false
    pairs.exists(p => !Set(10L, 11L)(p._1) && Set(10L, 11L)(p._2)) shouldBe false
    // the 4-chunk pigeonhole cannot guarantee recall past hamming 3
    an[IllegalArgumentException] should be thrownBy
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4)
  }

  test("neardup screen: sub-k batch rows survive, sub-k corpus rows kill nothing") {
    val corpus = Seq((100L, "ab"), (101L, "xy")).toDF("doc_id", "text")
    val batch = Seq((1L, "ab"), (2L, "pq"),
      (3L, "a real document with plenty of shingles to hash")).toDF("doc_id", "text")
    // pre-fix, NaN >= threshold passed and the sub-k batch rows were
    // wrongly screened out against unrelated sub-k corpus rows
    Dedup.neardupAgainstCorpus(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
  }

  test("jaccard verify: exact dup = 1.0, unrelated well below") {
    val j = Dedup.jaccardVerify(
        Seq((1L, 4L), (1L, 3L)).toDF("id_a", "id_b"), docs, "doc_id", "text", 3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    j((1L, 4L)) shouldBe 1.0
    j((1L, 3L)) should be < 0.3
  }

  test("brute-force ANN top-k is exact and deterministic") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(
        vecs.filter(col("vec_id") === 0), vecs.filter(col("vec_id") > 0),
        "vec_id", "embedding", k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    top shouldBe Set((1L, 1), (3L, 2))
  }

  test("LSH ANN returns a subset ranked by exact cosine") {
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 17 + d).toFloat))).toDF("vec_id", "embedding")
    val res = Ann.lshTopK(vecs.filter(col("vec_id") < 3), vecs.filter(col("vec_id") >= 3),
      "vec_id", "embedding", k = 3, bits = 4, tables = 2, dims = 8)
    val rows = res.select("query_id", "rank").as[(Long, Int)].collect()
    rows.groupBy(_._1).values.foreach { g =>
      g.map(_._2).sorted shouldBe (1 to g.length) // contiguous ranks per query
    }
  }

  test("fingerprint is deterministic and shift-tolerant (winnow overlap)") {
    val t1 = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val t2 = "PREFIX then " + t1 // shifted content
    val fp = Seq((1L, t1), (1L, t1), (2L, t2)).toDF("id", "text")
      .select(col("id"), Fingerprint.winnow(col("text"), 8, 16).as("w"))
      .as[(Long, Seq[Long])].collect()
    fp(0)._2 shouldBe fp(1)._2 // deterministic
    fp(0)._2.toSet.intersect(fp(2)._2.toSet) should not be empty // shared windows survive shift
    // sub-k texts: empty winnow set, NULL fingerprint — element_at(…, 1)
    // would throw INVALID_ARRAY_INDEX under ANSI and kill the scan
    Seq((1L, "short"), (2L, t1)).toDF("id", "text")
      .select(Fingerprint.fingerprint64(col("text")).as("f"))
      .collect().map(_.isNullAt(0)).toSeq shouldBe Seq(true, false)
  }

  test("language-id heuristic picks the language with most stopword hits") {
    val df = Seq(
      (1L, "der Hund und die Katze sind nicht zu Hause"),
      (2L, "the cat and the dog that was in the house"),
      (3L, "el perro y el gato que no se fue de la casa"),
      (4L, "这是 中文 文本")
    ).toDF("id", "text")
    df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap shouldBe
      Map(1L -> "de", 2L -> "en", 3L -> "es", 4L -> "zh")
  }

  test("multimodal decode is partition-batched and deterministic") {
    val media = Multimodal.asMediaFrame(docs, "doc_id", "text", "txt")
    val feats = Multimodal.decodeFeatures(media, batchSize = 2)
      .collect().map(f => f.id -> f).toMap
    feats should have size 4
    val n = docs.filter(col("doc_id") === 1).head().getString(1).getBytes("UTF-8").length
    feats(1L).nBytes shouldBe n
    feats(1L).width shouldBe n % 64
    feats(1L).height shouldBe (n / 64) % 64
  }

  test("real audio decode: WAV round-trip recovers PCM geometry and signal stats") {
    val sr = 8000
    val freq = 440
    val samples = Array.tabulate(sr)(i =>
      (math.sin(2 * math.Pi * freq * i / sr) * 16384).toShort)
    val wav = Multimodal.wavBytes(samples, sr)
    val f = Multimodal.readAudioFeatures(7L, wav).get
    f.sampleRate shouldBe sr
    f.channels shouldBe 1
    f.nFrames shouldBe sr.toLong
    f.durationMs shouldBe 1000L
    f.rms shouldBe (0.5 / math.sqrt(2.0)) +- 0.005
    f.zeroCrossings.toDouble shouldBe freq.toDouble +- 2.0 // 1 rising/cycle
    // non-audio bytes fall back to the zeroed stub through the Dataset op
    val ds = Seq(
      Multimodal.MediaRecord(1L, wav, "wav"),
      Multimodal.MediaRecord(2L, "not audio at all".getBytes, "txt")).toDS()
    val out = Multimodal.audioFeatures(ds).collect().map(a => a.id -> a).toMap
    out(1L).nFrames shouldBe sr.toLong
    out(2L).sampleRate shouldBe 0
    out(2L).nFrames shouldBe 0L
  }

  test("real multi-frame decode: animated GIF frames, geometry, and pixels round-trip") {
    val frames = (0 until 3).map { i =>
      val img = new java.awt.image.BufferedImage(10, 7,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(20 * i + 5, 99, 50))
      g.fillRect(0, 0, 10, 7)
      g.dispose()
      img
    }
    val gif = Multimodal.gifBytes(frames)
    val decoded = Multimodal.readVideoFrames(gif).get
    decoded.length shouldBe 3
    decoded.zipWithIndex.foreach { case (f, i) =>
      f.getWidth shouldBe 10
      f.getHeight shouldBe 7
      (f.getRGB(0, 0) & 0xFFFFFF) shouldBe ((20 * i + 5) << 16 | 99 << 8 | 50)
    }
    // undecodable payloads surface as one zeroed row through the Dataset op
    val ds = Seq(
      Multimodal.MediaRecord(1L, gif, "gif"),
      Multimodal.MediaRecord(2L, "junk bytes".getBytes, "bin")).toDS()
    val rows = Multimodal.videoFrameFeatures(ds).collect()
      .groupBy(_.id).map { case (k, v) => k -> v.sortBy(_.frameIdx) }
    rows(1L).map(_.frameIdx) shouldBe Array(0, 1, 2)
    rows(2L).map(_.frameIdx) shouldBe Array(-1)
  }

  test("real image decode: PNG/JPEG dimensions from the bitstream, stub fallback for non-images") {
    import spark.implicits._
    // real fixture bytes: a 8x5 PNG and a 12x7 JPEG encoded by ImageIO
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((x * 37 + y * 91) << 8) | 0x204060)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = encode(8, 5, "png")
    val jpg = encode(12, 7, "jpg")
    val txt = "not an image at all".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRecord(1L, png, "png"),
      Multimodal.MediaRecord(2L, jpg, "jpeg"),
      Multimodal.MediaRecord(3L, txt, "txt")).toDS()
    val feats = Multimodal.decodeFeatures(media, batchSize = 2)
      .collect().map(f => f.id -> f).toMap
    feats(1L).width shouldBe 8
    feats(1L).height shouldBe 5
    feats(1L).nBytes shouldBe png.length
    feats(2L).width shouldBe 12
    feats(2L).height shouldBe 7
    // non-image payload: deterministic stub features, not a crash
    feats(3L).width shouldBe txt.length % 64
    feats(3L).height shouldBe (txt.length / 64) % 64
  }

  test("real image resize rescales the raster; non-images pass through") {
    import spark.implicits._
    // a solid-color image survives bilinear rescale with its color intact
    val img = new java.awt.image.BufferedImage(16, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val color = 0x336699
    for (x <- 0 until 16; y <- 0 until 10) img.setRGB(x, y, color)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val txt = "still not an image".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRecord(1L, bos.toByteArray, "png"),
      Multimodal.MediaRecord(2L, txt, "txt")).toDS()
    val out = Multimodal.resizeImages(media, width = 4, height = 3)
      .collect().map(r => r.id -> r).toMap
    val back = Multimodal.readImage(out(1L).media).get
    back.getWidth shouldBe 4
    back.getHeight shouldBe 3
    (back.getRGB(2, 1) & 0xFFFFFF) shouldBe color // PNG is lossless
    out(1L).format shouldBe "png"
    out(2L).media shouldBe txt // untouched passthrough
  }

  test("frame sampling fans out strided windows; resize decimates; embed is stable") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, Array.tabulate(1300)(_.toByte), "vid"),
      Multimodal.MediaRecord(2L, Array.tabulate(40)(_.toByte), "vid"))
      .toDS()
    val frames = Multimodal.sampleFrames(media, frameSize = 256, stride = 512,
      maxFrames = 8).collect()
    // id=1: offsets 0/512/1024 fit (1024+256 = 1280 <= 1300, a 4th would
    // need 1536+256); id=2 (40 bytes): no frame fits
    frames.map(f => (f.id, f.frameIdx, f.offset)).toSet shouldBe
      Set((1L, 0, 0L), (1L, 1, 512L), (1L, 2, 1024L))
    frames.foreach(_.frameBytes.length shouldBe 256)
    frames.find(f => f.frameIdx == 1).get.frameBytes.head shouldBe 512.toByte

    val resized = Multimodal.resizeStub(media, targetBytes = 64).collect()
    resized.find(_.id == 1L).get.media.length shouldBe 64
    resized.find(_.id == 2L).get.media.length shouldBe 40 // never upsamples

    val e1 = Multimodal.embedStub(media, dims = 16).collect()
    val e2 = Multimodal.embedStub(media, dims = 16).collect()
    e1.map(_.toString).sorted shouldBe e2.map(_.toString).sorted // deterministic
    e1.foreach(_.getSeq[Float](1).length shouldBe 16)
  }

  test("LSH and partial-probe IVF hit measured recall floors vs brute force") {
    val dir = "/root/testdata/sf0.01"
    val all = graft.sources.Tables.embeddings(spark, dir)
    val q = all.filter(col("vec_id") < 20)
    val c = all.filter(col("vec_id") >= 20)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.bruteForceTopK(q, c, "vec_id", "embedding", k = 5))
    val lsh = pairs(Ann.lshTopK(q, c, "vec_id", "embedding", k = 5,
      bits = 4, tables = 8))
    val ivf = pairs(Ann.ivfTopK(q, c, "vec_id", "embedding", k = 5,
      nCentroids = 16, nProbe = 4))
    val ivfTrained = pairs(Ann.ivfTopK(q, c, "vec_id", "embedding", k = 5,
      nCentroids = 16, nProbe = 4, trainIters = 3))
    val pq = pairs(Ann.pqTopK(q, c, "vec_id", "embedding", k = 5,
      m = 8, nCodes = 64, trainIters = 3, rerankFactor = 8))
    val ivfPq = pairs(Ann.ivfPqTopK(q, c, "vec_id", "embedding", k = 5,
      nCentroids = 16, nProbe = 4, m = 8, nCodes = 64, trainIters = 3,
      rerankFactor = 8))
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    val ivfTrainedRecall = (exact & ivfTrained).size.toDouble / exact.size
    val pqRecall = (exact & pq).size.toDouble / exact.size
    val ivfPqRecall = (exact & ivfPq).size.toDouble / exact.size
    info(f"recall@5: lsh=$lshRecall%.2f ivf(4/16 probes)=$ivfRecall%.2f " +
      f"ivf+3 Lloyd iters=$ivfTrainedRecall%.2f pq(8x64,rr8)=$pqRecall%.2f " +
      f"ivf-pq(4/16,8x64,rr8)=$ivfPqRecall%.2f")
    // floors pinned ~0.15 under measured values — catch parameter/algorithm
    // regressions, not statistical noise
    lshRecall should be >= 0.5
    ivfRecall should be >= 0.5
    ivfTrainedRecall should be >= ivfRecall - 0.1 // training must not tank recall
    // these near-random embeddings (true cosines ~0.25) are PQ's worst
    // case: 8 dims/code must separate a sliver of signal from noise —
    // measured 0.85 at this operating point, floor pinned ~0.2 under
    pqRecall should be >= 0.65
    // the combined index multiplies both misses (cell pruning AND code
    // ranking) — it can only lose recall vs either half alone
    ivfPqRecall should be >= 0.35
    ivfPqRecall should be <= pqRecall + 0.05
  }

  test("cosine fold matches direct computation") {
    val r = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
      .select(VectorMath.cosine(col("a"), col("b"))).head().getDouble(0)
    r shouldBe (10.0 / (math.sqrt(14.0) * math.sqrt(14.0))) +- 1e-12
  }

  test("zero-norm embeddings: cosine is NULL, never a rank-1 neighbor or near-dup") {
    // 0/0 = NaN would rank ABOVE every real neighbor (Spark orders NaN
    // greatest) and pass >= threshold near-dup filters
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    z.select(VectorMath.cosine(col("a"), col("b"))).head().isNullAt(0) shouldBe true
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)), // zero-norm: directionless
      (4L, Array(0.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(vecs.filter(col("vec_id") === 1L), vecs,
      "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    top shouldBe Array((1L, 2L)) // not the zero vector
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding",
      threshold = 0.5, bucketBits = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L)) // no zero-vector pairs, no (3,4) NaN pair
  }

  test("text_repetition survives 1-word and empty docs under ANSI mode") {
    // sequence(0, -1) is DESCENDING in Spark, so an unguarded bigram
    // transform evaluates element_at(w, 0) and throws under ANSI — this
    // spec pins the guard with the degenerate docs the corpus lacks
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq(
      (1L, "single"),
      (2L, ""),
      (3L, "a b a b a b"),
      (4L, "x y"),
    ).toDF("doc_id", "text")
      // fixture carries the full loader contract (Tables.apply asserts it)
      .selectExpr("doc_id", "text", "'en' AS lang", "'spec' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.queries.LlmQueries.textRepetition(TestSpark.spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    rows shouldBe Array(
      (1L, 1L, 1L, 0L, 0L), // one word: no bigrams, still present
      (2L, 1L, 1L, 0L, 0L), // split("") = [""] — one empty token
      (3L, 6L, 2L, 3L, 2L), // "a b" x3, "b a" x2
      (4L, 2L, 2L, 1L, 1L))
  }

  test("percentile_approx drop-in agrees with the exact adaptive filter") {
    val dir = "/root/testdata/sf0.001"
    val approx = graft.queries.LlmQueries
      .textAdaptiveFilterApprox(TestSpark.spark, dir).collect()
    // the <=2%-flips accuracy clause holds on the real corpus
    all(approx.map(_.getAs[Boolean]("approx_ok"))) shouldBe true
    // and the per-doc exact decisions are the exact twin's, verbatim
    val exact = graft.queries.LlmQueries
      .textAdaptiveFilter(TestSpark.spark, dir)
      .select("doc_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    approx.foreach { r =>
      r.getAs[Boolean]("kept") shouldBe exact(r.getAs[Long]("doc_id"))
    }
  }
}
