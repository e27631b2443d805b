package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class Scd2Spec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // key 1: I@10 -> U@20 -> U@30 (current); key 2: I@15 -> D@25 (gone);
  // key 3: single I@40 (current)
  private val changes = Seq(
    (1L, 10L, "a", "I"), (1L, 20L, "b", "U"), (1L, 30L, "c", "U"),
    (2L, 15L, "x", "I"), (2L, 25L, "x", "D"),
    (3L, 40L, "z", "I")).toDF("id", "lsn", "v", "op")

  private val hist = Scd2.history(changes, Seq("id"), "lsn", "op")

  test("every I/U opens a version; D closes without opening; intervals chain") {
    val rows = hist.select("id", "v", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .sortBy(r => (r._1, r._3)).toList
    rows shouldBe List(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false),
      (1L, "c", 30L, None, true),
      (2L, "x", 15L, Some(25L), false), // closed by the delete, not current
      (3L, "z", 40L, None, true))
  }

  test("asOf reads the state the dimension had at the cutoff") {
    def at(lsn: Long): Map[Long, String] =
      Scd2.asOf(hist, lit(lsn)).select("id", "v")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    at(12L) shouldBe Map(1L -> "a")                 // 2 not born, 3 not born
    at(22L) shouldBe Map(1L -> "b", 2L -> "x")      // mid-life versions
    at(26L) shouldBe Map(1L -> "b")                 // 2 deleted at 25
    at(50L) shouldBe Map(1L -> "c", 3L -> "z")      // current state
  }
}
