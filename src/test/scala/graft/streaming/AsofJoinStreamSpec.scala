package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark

class AsofJoinStreamSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  // left: trades (sym, ts, qty); right: quotes (sym, ts, px)
  private def run(
      batches: Seq[(Seq[(String, Long, Long)], Seq[(String, Long, Double)])],
      watermark: String = "0 seconds",
      tol: Option[Long] = None): Set[(String, Long, Long, Option[Double])] = {
    val lMem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val rMem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val out = AsofJoinStream(
      lMem.toDF().toDF("sym", "ts", "qty"),
      rMem.toDF().toDF("sym", "ts", "px"),
      keys = Seq("sym"), tsCol = "ts", valueCols = Seq("px"),
      watermark = watermark, toleranceMs = tol)
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      batches.foreach { case (ls, rs) =>
        if (ls.nonEmpty) lMem.addData(ls.map { case (s, t, v) => (s, ts(t), v) })
        if (rs.nonEmpty) rMem.addData(rs.map { case (s, t, v) => (s, ts(t), v) })
        q.processAllAvailable()
      }
      // final watermark push so every pending left flushes: a far-future
      // event on a throwaway key
      lMem.addData(Seq(("__flush", ts(1000000L), 0L)))
      q.processAllAvailable()
      q.processAllAvailable()
      spark.table("asof_out")
        .filter(col("sym") =!= "__flush")
        .select(col("sym"), unix_millis(col("ts")), col("qty"), col("px"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    } finally q.stop()
  }

  test("streaming asof equals the batch asof join across micro-batches") {
    // watermark 1 minute: nothing here is late (the watermark is GLOBAL,
    // so another key's fresher events would otherwise expire these)
    val got = run(Seq(
      (Seq(("A", 5L, 100L)), Seq(("A", 10L, 1.0))),
      (Seq(("A", 20L, 200L), ("A", 25L, 300L)), Seq(("A", 20L, 2.0))),
      (Seq(("A", 99L, 400L), ("B", 16L, 500L)), Seq(("A", 30L, 3.0), ("B", 15L, 9.0)))),
      watermark = "1 minute")
    got shouldBe Set(
      ("A", 5L, 100L, None),       // before any quote
      ("A", 20L, 200L, Some(2.0)), // exact-ts match (>= semantics)
      ("A", 25L, 300L, Some(2.0)),
      ("A", 99L, 400L, Some(3.0)),
      ("B", 16L, 500L, Some(9.0)))
  }

  test("input behind the global watermark is dropped (engine contract)") {
    // wm delay 0: after batch 1 the global watermark is 20; batch 2's
    // ts=15/16 rows are LATE beyond the declared disorder bound and the
    // engine drops them before the stateful operator
    val got = run(Seq(
      (Seq(("A", 20L, 200L)), Seq(("A", 10L, 1.0))),
      (Seq(("B", 16L, 500L)), Seq(("B", 15L, 9.0)))))
    got shouldBe Set(("A", 20L, 200L, Some(1.0)))
  }

  test("late right row within the watermark still wins") {
    // left(12) arrives first; the matching right(10) comes LATER but before
    // the watermark passes ts=12 → must match
    val got = run(Seq(
      (Seq(("A", 12L, 1L)), Nil),
      (Nil, Seq(("A", 10L, 7.0)))),
      watermark = "1 seconds") // 1s disorder: wm stays below 12 until flush
    got shouldBe Set(("A", 12L, 1L, Some(7.0)))
  }

  test("tolerance nulls out stale matches") {
    val got = run(Seq(
      (Seq(("A", 12L, 1L), ("A", 500L, 2L)), Seq(("A", 10L, 7.0)))),
      tol = Some(5L))
    got shouldBe Set(("A", 12L, 1L, Some(7.0)), ("A", 500L, 2L, None))
  }

  test("runs on the RocksDB state store (scale-path state backend)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    graft.GraftSession.useRocksDbState(spark)
    try {
      val got = run(Seq(
        (Seq(("A", 12L, 1L)), Seq(("A", 10L, 7.0))),
        (Seq(("A", 40L, 2L)), Nil)),
        watermark = "1 minute")
      got shouldBe Set(("A", 12L, 1L, Some(7.0)), ("A", 40L, 2L, Some(7.0)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("multi-column keys: adversarial tuples never share state") {
    // ("ab","c") and ("a","bc") concatenate identically — a forgeable
    // state key would let ("a","bc")'s fresher quote (px=9.0, ts=15)
    // shadow ("ab","c")'s own quote (px=1.0, ts=10)
    val lMem = MemoryStream[(String, String, java.sql.Timestamp, Long)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp, Double)]
    val out = AsofJoinStream(
      lMem.toDF().toDF("k1", "k2", "ts", "qty"),
      rMem.toDF().toDF("k1", "k2", "ts", "px"),
      keys = Seq("k1", "k2"), tsCol = "ts", valueCols = Seq("px"),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("asof_multikey")
      .outputMode("append").start()
    try {
      rMem.addData(Seq(("ab", "c", ts(10L), 1.0), ("a", "bc", ts(15L), 9.0)))
      q.processAllAvailable()
      lMem.addData(Seq(("ab", "c", ts(20L), 1L), ("a", "bc", ts(20L), 2L)))
      q.processAllAvailable()
      lMem.addData(Seq(("__flush", "x", ts(1000000L), 0L)))
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("asof_multikey")
        .filter(col("k1") =!= "__flush")
        .select(col("k1"), col("k2"), col("qty"), col("px"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      got shouldBe Set(
        ("ab", "c", 1L, Some(1.0)),
        ("a", "bc", 2L, Some(9.0)))
    } finally q.stop()
  }

  test("stateKey encoding is injective on adversarial tuples") {
    AsofJoinStream.stateKey(Seq("ab", "c")) should not be
      AsofJoinStream.stateKey(Seq("a", "bc"))
    AsofJoinStream.stateKey(Seq("ab")) should not be
      AsofJoinStream.stateKey(Seq("a", "b"))
    AsofJoinStream.stateKey(Seq(null, "x")) should not be
      AsofJoinStream.stateKey(Seq("null", "x"))
    AsofJoinStream.stateKey(Seq("3:a", "b")) should not be
      AsofJoinStream.stateKey(Seq("3:a-b"))
  }

  test("agrees with the batch operator on a random-ish interleaving") {
    val lefts = (1 to 40).map(i => ("K" + (i % 3), (i * 7 % 50).toLong + 1, i.toLong))
    val rights = (1 to 15).map(i => ("K" + (i % 3), (i * 11 % 50).toLong + 1, i * 1.0))
    // right side must be unique per (key, ts) — dedupe keeping max value
    val rightsU = rights.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val leftsU = lefts.groupBy(l => (l._1, l._2)).map(_._2.head).toSeq

    val streamed = run(Seq(
      (leftsU.take(10), rightsU.take(5)),
      (leftsU.slice(10, 25), rightsU.slice(5, 12)),
      (leftsU.drop(25), rightsU.drop(12))),
      watermark = "10 seconds")

    val batchGot = graft.operators.AsofJoin(
      leftsU.map { case (s, t, v) => (s, ts(t), v) }.toDF("sym", "ts", "qty"),
      rightsU.map { case (s, t, v) => (s, ts(t), v) }.toDF("sym", "ts", "px"),
      Seq("sym"), "ts", Seq("px"))
      .select(col("sym"), unix_millis(col("ts")), col("qty"), col("px"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    streamed shouldBe batchGot
  }
}
