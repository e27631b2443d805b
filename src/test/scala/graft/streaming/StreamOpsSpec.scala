package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

import graft.TestSpark

class StreamOpsSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("stream-stream interval join pairs events within the window") {
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamOps.intervalJoin(
      clicks.toDS().toDF("user_id", "ts"),
      buys.toDS().toDF("user_id", "ts", "amount"),
      "user_id", "ts", within = "30 minutes")
      .select($"l.user_id", $"l.ts".as("click_ts"), $"r.ts".as("buy_ts"), $"amount")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(5)))
      buys.addData((1L, ts(20), 9.99), (1L, ts(45), 5.0), (2L, ts(4), 1.0))
      q.processAllAvailable()
      val rows = spark.table("ij")
        .select("user_id", "amount").as[(Long, Double)].collect().toSet
      // user 1: buy@10:20 within [10:00, 10:30] ✓; buy@10:45 outside ✗
      // user 2: buy@10:04 before the click ✗
      rows shouldBe Set((1L, 9.99))
    } finally q.stop()
  }

  test("watermarked dedup keeps the first arrival per key") {
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.dedupWithinWatermark(
      mem.toDS().toDF("id", "ts", "v"), Seq("id"), "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "first"), (1L, ts(1), "dup"), (2L, ts(2), "b"))
      q.processAllAvailable()
      mem.addData((1L, ts(3), "dup-again"), (3L, ts(4), "c"))
      q.processAllAvailable()
      val rows = spark.table("dd").select("id", "v").as[(Long, String)].collect().toSet
      rows shouldBe Set((1L, "first"), (2L, "b"), (3L, "c"))
    } finally q.stop()
  }

  test("corpus ingest filters low-quality docs and dedups content continuously") {
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.corpusIngest(
      mem.toDS().toDF("id", "ts", "text"), "text", "ts",
      minTokens = 5, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("ci")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts(0), "a good long document with plenty of tokens"),
        (2L, ts(1), "too short"),
        (3L, ts(2), "a good long document with plenty of tokens"))
      q.processAllAvailable()
      mem.addData(
        (4L, ts(3), "a good long document with plenty of tokens"), // still dup
        (5L, ts(4), "another unique document that clears the bar"))
      q.processAllAvailable()
      val ids = spark.table("ci").select("id").as[Long].collect().toSet
      ids shouldBe Set(1L, 5L) // 2 under-quality; 3 and 4 content dups
      // batch frames take the same path (watermark no-op)
      val batch = Seq(
        (10L, ts(0), "a good long document with plenty of tokens"),
        (11L, ts(1), "a good long document with plenty of tokens"),
        (12L, ts(2), "tiny")).toDF("id", "ts", "text")
      StreamOps.corpusIngest(batch, "text", "ts", 5, "1 hour")
        .count() shouldBe 1L
    } finally q.stop()
  }
}
