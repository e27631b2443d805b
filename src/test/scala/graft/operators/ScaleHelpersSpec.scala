package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class ScaleHelpersSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("salted join produces the same rows as a plain join") {
    val big = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v") // heavy skew on 3 keys
    val small = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
      .as[(Int, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", saltBy = col("v"), factor = 8)
      .select("k", "v", "name").as[(Int, Int, String)].collect().toSet
    salted shouldBe plain
  }

  test("salted join spreads a hot key across salt values") {
    val big = (1 to 1000).map(i => (0, i)).toDF("k", "v") // one key only
    val spread = big
      .withColumn("__salt", pmod(xxhash64(col("v")), lit(8)).cast("int"))
      .groupBy("__salt").count().count()
    spread shouldBe 8 // all 8 salt partitions used
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = (1 to 500).map(i => (i % 5, i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(Int, Long, Long)].collect().toSet
    val salted = Skew.saltedTwoPhase(df, "k", saltBy = col("v"), factor = 4,
        partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
        finals = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .as[(Int, Long, Long)].collect().toSet
    salted shouldBe direct
  }

  test("IVF ANN: probing all cells recovers the exact top-k") {
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 13 + d * 7).toFloat)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
    val c = vecs.filter(col("vec_id") >= 3)
    val exact = Ann.bruteForceTopK(q, c, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivfAll = Ann.ivfTopK(q, c, "vec_id", "embedding", 3,
        nCentroids = 4, nProbe = 4) // probe everything → exact
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    ivfAll shouldBe exact
  }

  test("IVF ANN with partial probing returns valid ranked subsets") {
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(i * 11 + d * 5).toFloat)))
      .toDF("vec_id", "embedding")
    val res = Ann.ivfTopK(vecs.filter(col("vec_id") < 3), vecs.filter(col("vec_id") >= 3),
        "vec_id", "embedding", 3, nCentroids = 8, nProbe = 2)
      .select("query_id", "rank").as[(Long, Int)].collect()
    res.groupBy(_._1).values.foreach { g =>
      g.map(_._2).sorted shouldBe (1 to g.length)
    }
  }

  test("feedCluster repartitions a starved narrow frame, no-ops otherwise") {
    def parts(df: org.apache.spark.sql.DataFrame): Int = df.rdd.getNumPartitions
    // local[4]: 1 scan partition is starved (1*2 < 4), 4 are not
    parts(Skew.feedCluster(spark.range(0, 100, 1, 1).toDF())) shouldBe 4
    parts(Skew.feedCluster(spark.range(0, 100, 1, 4).toDF())) shouldBe 4
    // shuffle-bearing frames pass through unprobed (no REPARTITION hint)
    val agg = spark.range(0, 100, 1, 1).selectExpr("id % 3 AS k").groupBy("k").count()
    Skew.feedCluster(agg).queryExecution.executedPlan.toString should
      not include "REPARTITION_BY_NUM"
    // streaming frames have no RDD to probe: untouched, and no throw
    val stream = spark.readStream.format("rate").load()
    Skew.feedCluster(stream).isStreaming shouldBe true
  }
}
