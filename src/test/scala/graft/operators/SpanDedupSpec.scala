package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class SpanDedupSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def stats(k: Int, rows: (Long, String)*): Map[Long, (Long, Long)] =
    SpanDedup.duplicatedSpanStats(rows.toDF("id", "text"), "id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("cross-document repeated span is found at every site, unique text is not") {
    // "a b c" appears in docs 1 and 2 (one site each); doc 3 is unique
    val m = stats(3,
      1L -> "a b c x y z",
      2L -> "q r a b c w",
      3L -> "u v w1 x1 y1 z1")
    m(1L)._1 shouldBe 1L // one duplicated span site
    m(1L)._2 shouldBe 3L // covering its 3 tokens
    m(2L) shouldBe (1L, 3L)
    m.contains(3L) shouldBe false
  }

  test("overlapping duplicated spans merge into islands: tokens counted once") {
    // the 4-token phrase repeats, so both docs carry two overlapping
    // 3-token duplicated spans ([0,3) and [1,4)) -> union covers 4 tokens
    val m = stats(3,
      1L -> "a b c d p q",
      2L -> "a b c d r s")
    m(1L)._1 shouldBe 2L
    m(1L)._2 shouldBe 4L
    m(2L) shouldBe (2L, 4L)
  }

  test("within-document repetition counts as duplication") {
    val m = stats(2, 1L -> "x y z x y w")
    // "x y" occurs at pos 0 and 3 of the same doc
    m(1L)._1 shouldBe 2L
    m(1L)._2 shouldBe 4L
  }

  test("disjoint duplicated spans in one doc sum their coverage") {
    val m = stats(2,
      1L -> "a b mm nn c d",
      2L -> "a b oo pp c d")
    // "a b" at pos 0, "c d" at pos 4: two islands of 2 tokens each
    m(1L) shouldBe (2L, 4L)
    m(2L) shouldBe (2L, 4L)
  }

  test("dropMostlyDuplicated keeps clean docs and drops heavy repeats") {
    val docs = Seq(
      1L -> "a b c d e f g h",        // fully duplicated by doc 2
      2L -> "a b c d e f g h",
      3L -> "totally unique words here nothing repeats at all ok").toDF("id", "text")
    val kept = SpanDedup.dropMostlyDuplicated(docs, "id", "text", k = 3,
      maxDupFrac = 0.5).select("id").as[Long].collect().sorted
    kept shouldBe Array(3L)
    val keptAll = SpanDedup.dropMostlyDuplicated(docs, "id", "text", k = 3,
      maxDupFrac = 1.0).select("id").as[Long].collect().sorted
    keptAll shouldBe Array(1L, 2L, 3L)
  }

  test("stats are partition-count independent") {
    val rows = (0L until 40L).map(i => (i, s"tok${i % 5} a b c d tok${i % 7} e f"))
    val a = SpanDedup.duplicatedSpanStats(rows.toDF("id", "text"), "id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = SpanDedup.duplicatedSpanStats(rows.toDF("id", "text").repartition(13),
        "id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    a shouldBe b
  }
}
