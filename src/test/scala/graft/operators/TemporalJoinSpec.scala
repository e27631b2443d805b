package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class TemporalJoinSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("asof join picks latest right row at or before each left ts") {
    val quotes = Seq( // (sym, ts, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "ts", "px")
    val trades = Seq( // (sym, ts, qty)
      ("A", 5L, 100L),  // before any quote → NULL
      ("A", 20L, 200L), // exactly at a quote → that quote (>= semantics)
      ("A", 25L, 300L), // between quotes → earlier one
      ("A", 99L, 400L), // after all → latest
      ("B", 16L, 500L),
      ("C", 50L, 600L)  // key with no quotes → NULL
    ).toDF("sym", "ts", "qty")

    val out = AsofJoin(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .select("sym", "ts", "qty", "px").as[(String, Long, Long, Option[Double])]
      .collect().toSet
    out shouldBe Set(
      ("A", 5L, 100L, None),
      ("A", 20L, 200L, Some(2.0)),
      ("A", 25L, 300L, Some(2.0)),
      ("A", 99L, 400L, Some(3.0)),
      ("B", 16L, 500L, Some(9.0)),
      ("C", 50L, 600L, None))
  }

  test("asof join tolerance nulls out matches older than the bound") {
    val quotes = Seq(("A", 10L, 1.0)).toDF("sym", "ts", "px")
    val trades = Seq(("A", 12L, 1L), ("A", 50L, 2L)).toDF("sym", "ts", "qty")
    val out = AsofJoin(trades, quotes, Seq("sym"), "ts", Seq("px"),
        tolerance = Some(lit(5L)))
      .select("ts", "px").as[(Long, Option[Double])].collect().toSet
    out shouldBe Set((12L, Some(1.0)), (50L, None))
  }

  test("asof join rejects column collisions") {
    val r = Seq(("A", 1L, 1.0)).toDF("sym", "ts", "qty")
    val l = Seq(("A", 1L, 2L)).toDF("sym", "ts", "qty")
    an[IllegalArgumentException] should be thrownBy
      AsofJoin(l, r, Seq("sym"), "ts", Seq("qty"))
  }

  test("range join matches BETWEEN semantics incl. boundaries and overlaps") {
    val intervals = Seq( // (name, lo, hi) — overlapping + boundary cases
      ("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 5.0, 15.0),
      ("wide", 0.0, 100.0)).toDF("name", "lo", "hi")
    val points = Seq(0.0, 10.0, 14.9, 20.0, 99.9, 150.0).toDF("p")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
        bucketWidth = 7.0)
      .select("p", "name").as[(Double, String)].collect().toSet
    val expected = (for {
      p <- Seq(0.0, 10.0, 14.9, 20.0, 99.9, 150.0)
      (n, lo, hi) <- Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 5.0, 15.0),
        ("wide", 0.0, 100.0))
      if p >= lo && p <= hi
    } yield (p, n)).toSet
    got shouldBe expected
  }

  test("asof join matches an in-memory reference on pseudo-random inputs") {
    // deterministic pseudo-random streams (no Random: seeds via hashing)
    def h(i: Int, salt: Int): Long = {
      var x = i.toLong * 0x9E3779B97F4A7C15L + salt
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      math.abs(x % 100)
    }
    for (seed <- 0 until 4) {
      val rights = (0 until 60).map(i =>
        ("K" + h(i, seed), h(i, seed + 10), i.toDouble))
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (key,ts)
      val lefts = (0 until 120).map(i =>
        ("K" + h(i, seed + 20), h(i, seed + 30), i.toLong))
      val got = AsofJoin(lefts.toDF("k", "ts", "qty"), rights.toDF("k", "ts", "px"),
          Seq("k"), "ts", Seq("px"))
        .select("k", "ts", "qty", "px").as[(String, Long, Long, Option[Double])]
        .collect().toSet
      val expected = lefts.map { case (k, ts, qty) =>
        val m = rights.filter(r => r._1 == k && r._2 <= ts)
        (k, ts, qty, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toSet
      got shouldBe expected
    }
  }

  test("range join result is bucket-width invariant") {
    val intervals = Seq((1, 3.0, 40.0), (2, 0.5, 1.5), (3, 39.0, 41.0))
      .toDF("iid", "lo", "hi")
    val points = (0 until 50).map(_.toDouble).toDF("p")
    def run(w: Double) =
      RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", w)
        .select("p", "iid").as[(Double, Int)].collect().toSet
    run(1.0) shouldBe run(25.0)
    run(0.3) shouldBe run(1000.0)
  }
}
