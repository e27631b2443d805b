package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.TestSpark

class IncrementalAggSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rel = Relation("public", "t", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("grp", PgTypes.TextOid),
    RelColumn("v", PgTypes.Float8Oid)))

  private def action(lsn: Long, op: String, key: Long,
      values: Map[String, String] = Map.empty,
      nulls: Seq[String] = Nil, unchanged: Seq[String] = Nil,
      rekey: Boolean = false) =
    ChangeAction("t", lsn, 0, op, Map("id" -> key.toString),
      values, nulls, unchanged, rekey)

  private def aggOf(df: DataFrame): DataFrame =
    IncrementalAgg.initialAgg(df, "grp", "v")

  private def asMap(df: DataFrame): Map[Option[String], (Option[BigDecimal], Long)] =
    df.collect().map { r =>
      Option(r.getAs[String]("grp")) ->
        ((Option(r.getAs[java.math.BigDecimal]("sum_v")).map(BigDecimal(_)),
          r.getAs[Long]("n_rows")))
    }.toMap

  test("delta maintenance equals full re-aggregation (insert/update/delete/TOAST/null/rekey)") {
    val snapshot = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0),
      (5L, "c", 50.0)).toDF("id", "grp", "v")
    val changelog = Seq(
      // plain value update within a group
      action(1, "U", 1, Map("id" -> "1", "v" -> "11.5"), unchanged = Seq("grp")),
      // group move: b -> a
      action(2, "U", 3, Map("id" -> "3", "grp" -> "a", "v" -> "33.0")),
      // delete
      action(3, "D", 4),
      // value explicitly NULLed (count keeps the row, sum drops it)
      action(4, "U", 5, Map("id" -> "5"), nulls = Seq("v"), unchanged = Seq("grp")),
      // insert into a brand-new group
      action(5, "I", 9, Map("id" -> "9", "grp" -> "d", "v" -> "9.0")),
      // rekey: row 2 becomes row 200 (group/value TOAST-unchanged)
      action(6, "U", 2, Map("id" -> "200"),
        unchanged = Seq("grp", "v"), rekey = true)).toDS()

    val maintained = IncrementalAgg.maintainSum(
      aggOf(snapshot), snapshot, changelog, rel, "grp", "v")
    val expected = aggOf(MergeInto(snapshot, changelog, rel))
    asMap(maintained) shouldBe asMap(expected)
  }

  test("maintenance chains across batches and drops emptied groups") {
    val snap0 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "v")
    val batch1 = Seq(action(1, "I", 3, Map("id" -> "3", "grp" -> "b", "v" -> "3.0"))).toDS()
    val snap1 = MergeInto(snap0, batch1, rel).localCheckpoint(true)
    val agg1 = IncrementalAgg.maintainSum(aggOf(snap0), snap0, batch1, rel, "grp", "v")
    // second batch maintained FROM THE MAINTAINED AGG, never re-aggregating
    val batch2 = Seq(action(2, "D", 1)).toDS()
    val agg2 = IncrementalAgg.maintainSum(agg1, snap1, batch2, rel, "grp", "v")
    val expected = aggOf(MergeInto(snap1, batch2, rel))
    asMap(agg2) shouldBe asMap(expected)
    agg2.filter($"grp" === "a").count() shouldBe 0 // group emptied by the delete
  }

  test("the snapshot is never shuffled: its only join is a broadcast semi-join") {
    val snapshot = spark.range(10000)
      .selectExpr("id", "cast(id % 7 as string) as grp", "cast(id as double) as v")
    val changelog = Seq(action(1, "U", 5,
      Map("id" -> "5", "v" -> "99.0"), unchanged = Seq("grp"))).toDS()
    val p = IncrementalAgg.maintainSum(aggOf(snapshot), snapshot, changelog, rel, "grp", "v")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p should not include "SortMergeJoin"
    p should include("BroadcastHashJoin")
  }
}
