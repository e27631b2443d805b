package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class VecAggSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("scaled vector sum equals the posexplode formulation across partitions") {
    val dims = 8
    val rows = (0 until 500).map { i =>
      (i % 7, Array.tabulate(dims)(d => ((i * 31 + d * 17) % 1000) / 997.0f - 0.5f))
    }
    // many partitions → partial buffers actually merge
    val df = spark.createDataset(rows).toDF("grp", "vec").repartition(13)
    val agg = df.groupBy($"grp")
      .agg(VecAgg.sumScaled($"vec", dims).as("vsum"))
      .select($"grp", posexplode($"vsum").as(Seq("dim", "s")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exploded = df.select($"grp", posexplode($"vec").as(Seq("dim", "v")))
      .groupBy($"grp", $"dim")
      .agg(sum(round($"v".cast("double") * 1000000).cast("long")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    agg should have size (7 * dims)
    agg shouldBe exploded
  }

  test("null vectors are skipped; short vectors pad with zero contribution") {
    val df = Seq(
      (1, Array(1.0f, 2.0f)),
      (1, null.asInstanceOf[Array[Float]]),
      (1, Array(0.5f))).toDF("grp", "vec")
    val out = df.groupBy($"grp").agg(VecAgg.sumScaled($"vec", 2).as("v"))
      .collect()(0).getSeq[Long](1)
    out shouldBe Seq(1500000L, 2000000L)
  }

  test("rounding is half away from zero on both signs (SQL round semantics)") {
    val df = Seq((1, Array(0.0000005f, -0.0000005f))).toDF("grp", "vec")
    // 5e-7f widens to a double slightly above/below the tie, but the long
    // sum must match what Spark SQL's round() computes on the same doubles
    val viaAgg = df.groupBy($"grp").agg(VecAgg.sumScaled($"vec", 2).as("v"))
      .collect()(0).getSeq[Long](1)
    val viaSql = df.select(posexplode($"vec").as(Seq("d", "v")))
      .select(round($"v".cast("double") * 1000000).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    viaAgg shouldBe viaSql
  }

  test("redactPii scrubs emails, IPs, and phones; plain text untouched") {
    val df = Seq(
      "mail me at a.b-c%d@sub.example.co or x@y.io",
      "node 10.0.0.7 and 192.168.001.042 up",
      "call 555-123-4567 now",
      "nothing sensitive here 1234").toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("r"))
    df.collect().map(_.getString(0)).toSeq shouldBe Seq(
      "mail me at <EMAIL> or <EMAIL>",
      "node <IP> and <IP> up",
      "call <PHONE> now",
      "nothing sensitive here 1234")
  }
}
