package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class ProfileSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("profile counts rows/nulls/distincts and formats typed min/max") {
    val df = Seq((1L, Option(2.5), "a"), (2L, Option.empty[Double], "b"),
      (2L, Option(10.0), "a")).toDF("k", "v", "s")
    val p = Profile.profile(df, Seq("k", "v", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    p("k") shouldBe (3L, 0L, 2L, "1", "2")
    p("v") shouldBe (3L, 1L, 2L, "2.50", "10.00") // decimal-rendered doubles
    p("s") shouldBe (3L, 0L, 2L, "a", "b")
  }

  test("approximate mode stays near the exact distinct counts") {
    val df = spark.range(0, 1000).selectExpr("id % 97 AS m")
    val nd = Profile.profile(df, Seq("m"), exact = false)
      .collect()(0).getLong(3)
    nd.toDouble shouldBe 97.0 +- 10.0
  }

  test("HLL drop-in (q_profile_approx) agrees with its exact twin on every column") {
    val out = graft.queries.Analytics
      .qProfileApprox(spark, "/root/testdata/sf0.001").collect()
    out.length shouldBe 5
    all(out.map(_.getAs[Boolean]("approx_ok"))) shouldBe true
    // the deterministic columns are the exact twin's, verbatim
    val exact = graft.queries.Analytics
      .qProfile(spark, "/root/testdata/sf0.001")
      .select("col_name", "n_rows", "n_null", "n_distinct").collect().toSeq
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq shouldBe
      exact.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("partition probe skips frames that contain a shuffle (no hidden re-execution)") {
    // an aggregated (exchange-bearing) frame must pass through unprobed
    // and unrepartitioned: the exchange already distributed it, and under
    // AQE a probe would materialize the upstream stages twice
    val shuffled = spark.range(0, 1000, 1, 1).selectExpr("id % 7 AS m")
      .groupBy("m").count()
    val plan = Profile.profile(shuffled, Seq("m", "count"))
      .queryExecution.executedPlan.toString
    plan should not include "REPARTITION_BY_NUM"
    Profile.profile(shuffled, Seq("m")).collect().head.getLong(3) shouldBe 7L
  }

  test("unknown columns are rejected up front") {
    an[IllegalArgumentException] should be thrownBy
      Profile.profile(Seq((1, 2)).toDF("a", "b"), Seq("a", "nope"))
  }

  test("scan-starvation guard: redistributes a 1-partition source, no-op on a fed one") {
    // local[4] session, defaultParallelism = 4: 1 scan partition is
    // starved (1*2 < 4), 4 partitions are not
    def hasRoundRobin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM")
    val starved = spark.range(0, 1000, 1, 1).selectExpr("id", "id % 7 AS m")
    val fed = spark.range(0, 1000, 1, 4).selectExpr("id", "id % 7 AS m")
    hasRoundRobin(Profile.profile(starved, Seq("m"))) shouldBe true
    hasRoundRobin(Profile.profile(fed, Seq("m"))) shouldBe false
    // and both routes agree on the statistics
    Profile.profile(starved, Seq("m")).collect().head.getLong(3) shouldBe 7L
    Profile.profile(fed, Seq("m")).collect().head.getLong(3) shouldBe 7L
  }
}
