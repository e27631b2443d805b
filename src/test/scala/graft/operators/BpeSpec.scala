package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class BpeSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("charSeg frames code points with double-space joins and sentinels") {
    val out = Seq("low", "a", "né").toDF("w")
      .select(Bpe.charSeg($"w")).as[String].collect()
    out(0) shouldBe " l  o  w "
    out(1) shouldBe " a "
    out(2) shouldBe " n  é "
  }

  test("trainMerges reproduces the classic low/lower hand trace") {
    // words: low x2, lower x1 (single tokens under length-2 are excluded)
    val docs = Seq("low low lower", "x").toDF("text")
    val m = Bpe.trainMerges(docs, "text", rounds = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // r1: "l o"=3 ties "o w"=3 -> pair-asc picks (l,o)
    // r2: "lo w"=3
    // r3: "e r"=1 ties "low e"=1 -> "e r" < "low e"
    // r4: "low er"=1; then the vocab is fully merged -> early stop
    m shouldBe Seq(
      (1, "l", "o", "lo", 3L),
      (2, "lo", "w", "low", 3L),
      (3, "e", "r", "er", 1L),
      (4, "low", "er", "lower", 1L))
  }

  test("encode applies trained merges: fully-merged words count one subtoken") {
    val train = Seq("low low lower", "x").toDF("text")
    val merges = Bpe.trainMerges(train, "text", rounds = 6)
      .select($"pair_left", $"pair_right").as[(String, String)].collect().toSeq
    val docs = Seq((1L, "low low lower"), (2L, "slow x")).toDF("doc_id", "text")
    val out = Bpe.encodeTokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: low/low/lower each collapse to a single trained symbol
    out(1L) shouldBe ((3L, 3L))
    // doc 2: "slow" partially merges to [s, low]; "x" stays one char
    out(2L) shouldBe ((2L, 3L))
  }

  test("adjacent repeats merge greedily left-to-right, not overlapping") {
    // "aaaa" x1: r1 pair (a,a) freq 3 (three adjacent positions); the
    // merge must yield [aa, aa] — greedy non-overlapping — so r2 sees
    // ONE (aa,aa) pair, not an aaa hybrid
    val docs = Seq("aaaa").toDF("text")
    val m = Bpe.trainMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    m shouldBe Seq(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "aa", "aaaa", 1L))
  }

  test("55 merge rounds stay correct and bounded (lineage checkpoints)") {
    // A corpus rich enough to sustain >50 distinct merges: 60 distinct
    // 6-letter words built from overlapping 2-letter syllables, with
    // varied counts so frequency ordering is exercised. Every round is
    // cross-checked against an in-memory reference trainer with the same
    // semantics (position-counted adjacent pairs, freq-desc / pair-asc
    // tie-break, greedy left-to-right non-overlapping merge), so the
    // checkpointed distributed loop is verified merge-by-merge deep past
    // the CheckpointEvery=16 lineage cuts.
    def syl(k: Int): String =
      "" + ('a' + k % 26).toChar + ('a' + (k * 3 + 1) % 26).toChar
    val words = (0 until 60).map(i => syl(i) + syl((i * 7 + 3) % 60) + syl((i * 13 + 5) % 60))
    val rows = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(i % 3 + 1)(w) }
    val wc = collection.mutable.Map.empty[String, Long]
    rows.foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1)

    // reference trainer over symbol lists
    var segs: Map[String, List[String]] =
      wc.keys.map(w => w -> w.map(_.toString).toList).toMap
    def mergeSyms(s: List[String], l: String, r: String): List[String] = {
      val out = collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.toList
    }
    val expected = collection.mutable.ListBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to 55) {
      val freq = collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (w, s) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          freq((p(0), p(1))) = freq.getOrElse((p(0), p(1)), 0L) + wc(w)
        }
      }
      if (freq.nonEmpty) {
        val ((l, rt), f) = freq.minBy { case ((a, b), n) => (-n, s"$a $b") }
        expected += ((r, l, rt, l + rt, f))
        segs = segs.map { case (w, s) => w -> mergeSyms(s, l, rt) }
      }
    }
    expected.size shouldBe 55 // the corpus really sustains all 55 rounds

    val t0 = System.nanoTime()
    val m = Bpe.trainMerges(rows.toDF("text"), "text", rounds = 55)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val wallSec = (System.nanoTime() - t0) / 1e9
    m shouldBe expected.toSeq
    // generous ceiling: 55 vocab-sized jobs are seconds of work; a
    // quadratic analysis blow-up or a lost checkpoint shows up here
    wallSec should be < 180.0
  }

  test("batched training: K=1 is exactly the sequential trainer") {
    val docs = Seq("low low lower", "wider wide", "x").toDF("text")
    val exact = Bpe.trainMerges(docs, "text", rounds = 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val batched = Bpe.trainMergesBatched(docs, "text",
        totalMerges = 8, batchK = 1)
      .as[(Int, Int, String, String, String, Long)].collect().toSeq
    batched.map(m => (m._1, m._3, m._4, m._5, m._6)) shouldBe
      exact.map(m => (m._1, m._2, m._3, m._4, m._5))
    batched.foreach(_._2 shouldBe 1) // every round ranks exactly one merge
  }

  test("batched training: disjoint symbols per batch, full vocab reached, encode composes") {
    // enough distinct structure for 30 merges in a handful of rounds
    def syl(k: Int): String =
      "" + ('a' + k % 26).toChar + ('a' + (k * 5 + 2) % 26).toChar
    val words = (0 until 40).map(i => syl(i) + syl((i * 11 + 7) % 40) + syl((i * 3 + 1) % 40))
    val docs = words.toDF("text")
    val m = Bpe.trainMergesBatched(docs, "text", totalMerges = 30, batchK = 8)
      .as[(Int, Int, String, String, String, Long)].collect().toSeq
    m should have size 30
    // far fewer driver round-trips than merges — the scale property
    m.map(_._1).max should be <= 8
    // within every round's batch, DIFFERENT pairs touch disjoint symbols
    // (a self-pair like (b,b) legitimately uses its one symbol twice)
    m.groupBy(_._1).values.foreach { batch =>
      val sets = batch.map(b => Set(b._3, b._4))
      for (i <- sets.indices; j <- i + 1 until sets.size)
        (sets(i) intersect sets(j)) shouldBe empty
    }
    // within a batch, rank order follows freq desc / pair asc as selected
    m.groupBy(_._1).values.foreach { batch =>
      val ordered = batch.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._6 > b._6 ||
            (a._6 == b._6 && s"${a._3} ${a._4}" < s"${b._3} ${b._4}"))
        case _ => ()
      }
    }
    // the trained merges compose into encode: fewer subtokens than chars
    val ids = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val enc = Bpe.encodeTokenCounts(ids.toDF("doc_id", "text"), "doc_id", "text",
        m.sortBy(x => (x._1, x._2)).map(x => (x._3, x._4)))
      .agg(org.apache.spark.sql.functions.sum("n_subtokens")).head().getLong(0)
    enc should be < words.map(_.length.toLong).sum
  }

  test("merge replacement respects symbol boundaries") {
    // after merging (a,b)->ab, the word "xab" segments [x,a,b]: its (a,b)
    // also merges to [x, ab]; the pattern must NOT touch the 'a' inside a
    // previously-merged "ab" symbol elsewhere. End state of "abxab ab":
    // both words fully merged through distinct rounds without corruption.
    val docs = Seq("ab ab xab").toDF("text")
    val m = Bpe.trainMerges(docs, "text", rounds = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    m.head shouldBe ((1, "a", "b", "ab", 3L))
    // r2: remaining pairs come only from "xab" -> [x, ab]: (x,ab)=1
    m(1) shouldBe ((2, "x", "ab", "xab", 1L))
    m should have size 2 // fully merged after round 2
  }
}
