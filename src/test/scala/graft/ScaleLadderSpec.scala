package graft

import org.apache.spark.sql.{functions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.Tables

/** The bench harness's scaled-corpus synthesis crosses the same
  * testdata-encoding seam that broke round 10 (events.ts regenerated from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)): materialize reads the driver
  * tables raw, key-shifts them, and the ladder re-reads the copies through
  * `Tables`. This pins that round trip on the driver's CURRENT encoding —
  * whatever it is this generation — so a future regeneration fails here,
  * not twenty minutes into a driver bench run. */
class ScaleLadderSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  test("materialize doubles the corpus and events round-trips through Tables") {
    val src = "/root/testdata/sf0.001"
    val out = ScaleLadder.materialize(spark, src, 2)

    val ev0 = Tables.events(spark, src)
    val ev2 = Tables.events(spark, out)
    ev2.count() shouldBe 2 * ev0.count()
    // key-shift produced disjoint copies, not duplicate rows
    ev2.select(countDistinct(col("event_id"))).head().getLong(0) shouldBe
      2 * ev0.select(countDistinct(col("event_id"))).head().getLong(0)
    // copy 0 is the original: identical instants survive the round trip
    ev2.filter(col("event_id") < 1000000000L)
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head() shouldBe
      ev0.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()

    // the remixed documents: 2x rows, disjoint ids, copy 0 text unchanged
    val d0 = Tables.documents(spark, src)
    val d2 = Tables.documents(spark, out)
    d2.count() shouldBe 2 * d0.count()
    d2.select(countDistinct(col("doc_id"))).head().getLong(0) shouldBe 2 * d0.count()
    val origSum = d0.agg(sum(functions.length(col("text")))).head().getLong(0)
    d2.filter(col("doc_id") < 1000000000L)
      .agg(sum(functions.length(col("text")))).head().getLong(0) shouldBe origSum

    // lineitem/orders/customer/embeddings shifted copies load through the
    // column contracts too
    Tables.lineitem(spark, out).count() shouldBe 2 * Tables.lineitem(spark, src).count()
    Tables.embeddings(spark, out).count() shouldBe 2 * Tables.embeddings(spark, src).count()
  }
}
