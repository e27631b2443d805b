package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class PcaSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // variance overwhelmingly along (1, 1)/√2: x ≈ t·(1,1) + tiny noise
  private def anisotropic = (0 until 200).map { i =>
    val t = (i - 100).toDouble
    val eps = (i % 5 - 2) * 0.01
    (i.toLong, Seq(t + eps, t - eps))
  }.toDF("id", "vec")

  test("power iteration recovers the dominant direction") {
    val (v, lambda) = Pca.powerIteration(anisotropic, "vec", iters = 8)
    math.abs(v(0)) shouldBe 0.7071 +- 0.01
    math.abs(v(1)) shouldBe 0.7071 +- 0.01
    v(0) * v(1) should be > 0.0 // same sign: the (1,1) axis, not (1,-1)
    lambda should be > 100.0    // ~Σt² · cos², far above the noise axis
    // projections order by t
    val proj = Pca.project(anisotropic, "vec", v)
      .select(col("id"), col("proj")).as[(Long, Double)].collect().toMap
    (proj(199L) > proj(100L)) ^ (proj(0L) > proj(100L)) shouldBe true
  }

  test("deflated second component is orthogonal and subordinate") {
    // 3-D: dominant axis (1,1,0), secondary (0,0,1), tiny noise on the rest
    val df = (0 until 300).map { i =>
      val t = (i - 150).toDouble
      val u = ((i * 7) % 30 - 15).toDouble
      (i.toLong, Seq(t, t, u * 3))
    }.toDF("id", "vec")
    val ((v1, l1), (v2, l2)) = Pca.top2(df, "vec", iters = 10)
    l1 should be > l2
    val dot12 = v1.zip(v2).map { case (a, b) => a * b }.sum
    math.abs(dot12) should be < 1e-6
    math.abs(v2(2)) shouldBe 1.0 +- 0.01 // the z axis is the runner-up
  }

  test("iteration is partition-independent (decimal-summed contributions)") {
    val a = Pca.powerIteration(anisotropic.repartition(13), "vec", iters = 4)
    val b = Pca.powerIteration(anisotropic.repartition(2), "vec", iters = 4)
    a._1.toSeq shouldBe b._1.toSeq
    a._2 shouldBe b._2
  }
}
