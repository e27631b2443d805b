package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class DedupClusterSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connected components: chains merge transitively, components stay apart") {
    // chain 1-2-3-4 (no shortcut edges) + separate pair 10-11
    val m = cc((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    m shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
  }

  test("connected components: min label wins regardless of edge direction/order") {
    val m = cc((9L, 5L), (5L, 7L), (7L, 2L))
    m.values.toSet shouldBe Set(2L)
  }

  test("connected components: refuses to under-merge on iteration exhaustion") {
    val longChain = (1L to 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    an[IllegalStateException] should be thrownBy
      Dedup.connectedComponents(longChain.toDF("id_a", "id_b"), maxIters = 2)
  }

  test("keepCanonical keeps min id per cluster and every unpaired doc") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "a''"), (5L, "b"), (9L, "c"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonical(docs, "doc_id", pairs)
      .select(col("doc_id")).as[Long].collect().toSet
    kept shouldBe Set(1L, 5L, 9L)
  }

  test("keepCanonical preserves corpus columns literally named id/label") {
    // drop-by-name after a join removes every column with that name — the
    // cluster-map columns use internal names so these survive
    val docs = Seq((1L, "x", 7), (2L, "y", 8), (5L, "z", 9))
      .toDF("doc_id", "id", "label")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonical(docs, "doc_id", pairs)
    kept.columns.toSeq shouldBe Seq("doc_id", "id", "label")
    kept.select(col("doc_id"), col("id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSet shouldBe Set((1L, "x", 7), (5L, "z", 9))
  }

  test("hash split is deterministic, disjoint-complete, and near the fractions") {
    val df = spark.range(0, 4000).toDF("id")
      .select(col("id"),
        Sampling.splitLabel(col("id"), "salt1",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))).as("split"),
        Sampling.sampledBy(col("id"), "salt1", 0.5).as("half"))
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe 4000L // every row gets exactly one label
    counts("train").toDouble shouldBe 3200.0 +- 150.0
    counts("val").toDouble shouldBe 400.0 +- 80.0
    counts("test").toDouble shouldBe 400.0 +- 80.0
    // determinism: identical assignment on re-materialization
    val a = df.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = df.orderBy(rand(7)).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    a shouldBe b
    // a different salt re-draws
    val other = spark.range(0, 4000).toDF("id")
      .select(Sampling.splitLabel(col("id"), "salt2",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))).as("s2"))
      .collect().map(_.getString(0))
    other.zip((0L until 4000L).map(a)).count { case (x, y) => x != y } should be > 0
  }

  test("stratified sampling applies per-stratum rates (1.0 keeps everything)") {
    val df = spark.range(0, 3000).toDF("id")
      .withColumn("src", when(col("id") % 3 === 0, "curated")
        .when(col("id") % 3 === 1, "crawl").otherwise("other"))
    val kept = df.filter(Sampling.stratifiedSampleBy(col("id"), col("src"), "m",
      Map("curated" -> 1.0, "crawl" -> 0.2), defaultFrac = 0.5))
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept("curated") shouldBe 1000L // frac 1.0 must not lose the 'ffff' sliver
    kept("crawl").toDouble shouldBe 200.0 +- 60.0
    kept("other").toDouble shouldBe 500.0 +- 90.0
  }

  test("budget fill is a greedy hash-ordered prefix per stratum") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 50L), (2L, "a", 50L), (3L, "a", 50L), (4L, "a", 50L),
      (5L, "b", 500L), (6L, "b", 10L), // first-by-hash may overflow
      (7L, "c", 10L)
    ).toDF("id", "src", "wt")
    val kept = Sampling.budgetFill(df, "id", "src", col("wt"), "s",
      budgets = Map("b" -> 100L, "c" -> 0L), defaultBudget = 120L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq

    // src a (budget 120, four 50s): exactly the first 2 in hash order
    // survive — cum 50, 100; the third (150) and the rest drop
    val a = kept.filter(_._2 == "a")
    a.map(_._3).sorted shouldBe Seq(50L, 100L)
    // src c: zero budget keeps nothing
    kept.filter(_._2 == "c") shouldBe empty
    // src b: greedy prefix, not knapsack — whether anything survives
    // depends only on which row hashes first; cum_weight must never
    // exceed the budget and must stay a prefix (each kept row's cum =
    // previous + its weight)
    kept.filter(_._2 == "b").foreach(_._3 should be <= 100L)
    // determinism: identical result on re-materialization
    val again = Sampling.budgetFill(df, "id", "src", col("wt"), "s",
      budgets = Map("b" -> 100L, "c" -> 0L), defaultBudget = 120L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    again.toSet shouldBe kept.toSet
    // the kept set matches an explicit driver-side replay of the greedy
    // hash-ordered prefix — the selection is a pure function of the data
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(("s" + s).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Seq(
      (1L, "a", 50L), (2L, "a", 50L), (3L, "a", 50L), (4L, "a", 50L),
      (5L, "b", 500L), (6L, "b", 10L), (7L, "c", 10L))
    val budgetOf = Map("b" -> 100L, "c" -> 0L).withDefaultValue(120L)
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
      var cum = 0L
      rs.sortBy(r => md5hex(r._1.toString)).iterator.map { r =>
        cum += r._3; (r._1, r._2, cum)
      }.takeWhile(_._3 <= budgetOf(src))
    }
    kept.toSet shouldBe expected.toSet
  }

  test("sequence packing: bins fill to capacity with at most one-row overflow") {
    import spark.implicits._
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("wt", (col("id") % 37 + 5).cast("long")) // 5..41 tokens
    val packed = Sampling.packSequences(df, "id", col("wt"), "p", maxPerBin = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("wt"),
        r.getAs[String]("bucket"), r.getAs[Long]("cum_weight"), r.getAs[Long]("bin")))

    packed should have size 2000 // packing never drops a row
    packed.map(_._3).distinct.size should be > 8 // lanes really spread
    packed.groupBy(p => (p._3, p._5)).foreach { case ((_, bin), rows) =>
      val total = rows.map(_._2).sum
      val maxRow = rows.map(_._2).max
      // a bin holds the rows whose FIRST token lands in its window: its
      // total can pass 100 only via the one straddling row
      if (total > 100L + maxRow)
        fail(s"bin $bin overfilled: $total with max row $maxRow")
      ()
    }
    // bins are contiguous from 0 within every lane
    packed.groupBy(_._3).foreach { case (_, rows) =>
      val bins = rows.map(_._5).distinct.sorted
      bins shouldBe (0L until bins.size).toSeq
    }
    // deterministic: a re-run bins identically
    val again = Sampling.packSequences(df, "id", col("wt"), "p", maxPerBin = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("bin"))).toMap
    packed.foreach(p => again(p._1) shouldBe p._5)
  }

  test("sampledBy fraction tracks the requested rate") {
    val n = spark.range(0, 8000).toDF("id")
      .filter(Sampling.sampledBy(col("id"), "s", 0.25)).count()
    n.toDouble shouldBe 2000.0 +- 200.0
  }

  test("keepBest keeps the highest-score member, min id on ties, unpaired docs") {
    val docs = Seq((1L, "aa", 5L), (2L, "bb", 9L), (3L, "cc", 9L),
      (10L, "dd", 1L)).toDF("id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBest(docs, "id", pairs, col("score"))
    kept.columns.toSeq shouldBe Seq("id", "text", "score") // corpus shape intact
    kept.select("id").as[Long].collect().sorted shouldBe
      Array(2L, 10L) // 9-score tie between 2 and 3 -> min id 2; 10 unpaired
  }

  test("dedupAgainstCorpus kills corpus-known and batch-repeat rows") {
    val batch = Seq((1L, "fresh one"), (2L, "known text"), (3L, "fresh two"),
      (4L, "fresh one"), (5L, "fresh three")).toDF("id", "text")
    val corpus = Seq((100L, "known text"), (101L, "other corpus junk")).toDF("id", "text")
    val kept = Dedup.dedupAgainstCorpus(batch, corpus, "id", "text")
      .select("id").as[Long].collect().sorted
    // 2 dies (in corpus); 4 dies (repeat of 1 within batch, keep-first)
    kept shouldBe Array(1L, 3L, 5L)
    // normalization folds whitespace/case variants onto corpus entries
    val keptNorm = Dedup.dedupAgainstCorpus(
      Seq((1L, "  KNOWN   text ")).toDF("id", "text"), corpus, "id", "text",
      normalize = true).count()
    keptNorm shouldBe 0L
  }

  test("weighted sampling: exact k per stratum, weight-proportional, deterministic") {
    val docs = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", if (i == 42L || i == 43L) 100000L else 1L))
      .toDF("id", "src", "w")
    val picked = Sampling.weightedSamplePerStratum(docs, "id", col("src"),
      col("w"), "s1", 10)
    val bySrc = picked.select("src", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    bySrc("a").size shouldBe 10
    bySrc("b").size shouldBe 10
    // the overwhelming weights win their stratum essentially surely
    bySrc("a") should contain(42L)
    bySrc("b") should contain(43L)
    // replays identically regardless of partitioning
    val again = Sampling.weightedSamplePerStratum(docs.repartition(11), "id",
      col("src"), col("w"), "s1", 10)
      .select("id").as[Long].collect().toSet
    again shouldBe (bySrc("a") ++ bySrc("b"))
  }

  test("rendered packed sequences cover every doc and digest deterministically") {
    val docs = (0L until 60L).map(i => (i, s"doc$i word" * 3, 6L))
      .toDF("id", "text", "wt")
    val rendered = Sampling.renderPackedSequences(docs, "id", "text",
      col("wt"), "p", maxPerBin = 30L, sep = "<eos>")
      .collect().map(r => ((r.getAs[String]("bucket"), r.getAs[Long]("bin")),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[String]("seq_md5"))))
      .toMap
    rendered.values.map(_._1).sum shouldBe 60L      // every doc in exactly one bin
    rendered.values.map(_._2).sum shouldBe 360L     // token totals add up
    // bins agree with the packer's assignment
    val bins = Sampling.packSequences(docs, "id", col("wt"), "p", maxPerBin = 30L)
      .groupBy(col("bucket"), col("bin")).count()
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    bins.foreach { case (k, n) => rendered(k)._1 shouldBe n }
    // digest is stable across partitionings
    val again = Sampling.renderPackedSequences(docs.repartition(7), "id", "text",
      col("wt"), "p", maxPerBin = 30L, sep = "<eos>")
      .collect().map(r => ((r.getAs[String]("bucket"), r.getAs[Long]("bin")),
        r.getAs[String]("seq_md5"))).toMap
    rendered.foreach { case (k, v) => again(k) shouldBe v._3 }
  }

  test("shard manifest partitions the corpus completely and verifiably") {
    val docs = spark.range(0, 500)
      .selectExpr("id AS doc_id", "'w ' || CAST(id % 7 AS STRING) AS text")
    val m = Sampling.shardManifest(docs, "doc_id", lit(2L), "sh", nShards = 8)
      .collect().map(r => (r.getAs[Int]("shard_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("content_sig")))
    m.map(_._1).toSet.subsetOf((0 until 8).toSet) shouldBe true
    m.map(_._2).sum shouldBe 500L            // every doc in exactly one shard
    m.map(_._3).sum shouldBe 1000L           // token totals add up
    m.map(_._2).max should be < 150L         // roughly balanced, not skewed
    // signature is recomputable: shard 0's sig = md5 of its sorted ids
    val ids0 = docs
      .filter(Sampling.shardId(col("doc_id"), "sh", 8) === 0)
      .select("doc_id").as[Long].collect().sorted
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(ids0.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    m.find(_._1 == 0).get._4 shouldBe expect
    // deterministic across runs
    Sampling.shardManifest(docs, "doc_id", lit(2L), "sh", nShards = 8)
      .collect().map(r => (r.getInt(0), r.getString(3))).toMap
      .foreach { case (sid, sig) => m.find(_._1 == sid).get._4 shouldBe sig }
  }

  test("neardupAgainstCorpus: exact copies die, sub-threshold lookalikes survive") {
    val prose = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq((100L, prose),
      (101L, "completely different corpus text about shipping priorities"))
      .toDF("id", "text")
    val batch = Seq(
      (1L, prose),                       // exact copy: every band collides, J=1
      (2L, "unrelated fresh document with no shingles in common whatsoever"),
      (3L, prose)                        // second exact copy: multi-collision
    ).toDF("id", "text")
    val kept = Dedup.neardupAgainstCorpus(batch, corpus, "id", "text")
    kept.columns.toSeq shouldBe Seq("id", "text") // batch shape intact
    kept.select("id").as[Long].collect().sorted shouldBe Array(2L)

    // Jaccard verify gate: a doc whose true shingle overlap sits BELOW the
    // threshold survives no matter how its bands land — collision only
    // nominates candidates, the exact Jaccard decides. One changed word
    // out of 13 keeps J well under 0.999.
    val edited = prose.replace("fox", "cat")
    val keptHi = Dedup.neardupAgainstCorpus(
      Seq((7L, edited)).toDF("id", "text"), corpus, "id", "text",
      threshold = 0.999)
    keptHi.select("id").as[Long].collect() shouldBe Array(7L)

    // same edited doc at the default 0.7 threshold: a 1-word edit of a
    // 13-word doc shares the overwhelming majority of its 5-shingles —
    // band collision is how it gets nominated; pin the screened outcome
    // (deterministic at the fixed hash constants)
    val keptLo = Dedup.neardupAgainstCorpus(
      Seq((8L, edited)).toDF("id", "text"), corpus, "id", "text")
    keptLo.count() shouldBe 0L
  }
}
