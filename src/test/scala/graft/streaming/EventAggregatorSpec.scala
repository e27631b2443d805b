package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

import graft.TestSpark
import graft.cdc.Lsn

class EventAggregatorSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("windowed stats over a stream accumulate across micro-batches") {
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = EventAggregator.windowedStats(
      mem.toDS().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    try {
      mem.addData((ts(5), "click", 1.0), (ts(7), "view", 3.0))
      q.processAllAvailable()
      mem.addData((ts(10), "click", 2.0)) // second micro-batch, same window for click@10:0x? no: 10:10 → next window
      mem.addData((ts(9), "click", 2.5))  // updates the 10:00 window incrementally
      q.processAllAvailable()
      val rows = spark.table("win")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      rows should contain(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.5))
      rows should contain(
        (Timestamp.valueOf("2024-01-01 10:10:00"), "click", 1L, 2.0))
      rows should contain(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1L, 3.0))
    } finally q.stop()
  }

  test("same code over a batch frame ignores the watermark") {
    val batch = Seq((ts(5), "click", 1.0), (ts(25), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val out = EventAggregator
      .windowedStats(batch, "ts", "event_type", "value", "10 minutes")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    out shouldBe Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1L, 1.0),
      (Timestamp.valueOf("2024-01-01 10:20:00"), "click", 1L, 2.0))
  }

  test("LSN text format round-trips (lsn.go semantics)") {
    Lsn.parse("16/B374D848") shouldBe ((0x16L << 32) | 0xB374D848L)
    Lsn.format(Lsn.parse("16/B374D848")) shouldBe "16/B374D848"
    Lsn.parse("0/0") shouldBe 0L
    Lsn.format(0L) shouldBe "0/0"
    an[IllegalArgumentException] should be thrownBy Lsn.parse("nope")
    an[IllegalArgumentException] should be thrownBy Lsn.parse("123456789AB/0")
  }
}
