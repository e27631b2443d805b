package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.TestSpark

class AnnSq8Spec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random corpus: splitmix-ish hash → [-1, 1] doubles
  private def vec(id: Long, dims: Int): Seq[Float] =
    (0 until dims).map { d =>
      val x = (id * 1000003L + d * 7919L) * 0x9E3779B97F4A7C15L
      ((x >>> 11).toDouble / (1L << 53).toDouble * 2 - 1).toFloat
    }

  private def corpus(n: Int, dims: Int): DataFrame =
    (0L until n.toLong).map(i => (i, vec(i, dims))).toDF("vec_id", "embedding")

  private def topkMap(df: DataFrame): Map[(Long, Int), Long] =
    df.select(col("query_id").cast("long"), col("rank"), col("neighbor_id").cast("long"))
      .as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("sq8 with exact re-rank matches brute force on a random corpus") {
    val all = corpus(120, 16)
    val q = all.filter(col("vec_id") < 8)
    val c = all.filter(col("vec_id") >= 8)
    val exact = topkMap(Ann.bruteForceTopK(q, c, "vec_id", "embedding", k = 5))
    val sq8 = topkMap(Ann.sq8TopK(q, c, "vec_id", "embedding", k = 5, rerankFactor = 4))
    // exact-recall identity: every (query, rank) slot agrees
    sq8 shouldBe exact
  }

  test("quantization round-trip error is bounded by half a code step per dimension") {
    import graft.functions.VectorMath
    val c = corpus(50, 8)
    val stats = c.select(posexplode(VectorMath.toDouble(col("embedding"))))
      .toDF("dim", "x")
      .groupBy(col("dim")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("dim")).collect()
    val mins = stats.map(_.getDouble(1)).toSeq
    val scales = stats.map(r => 255.0 / (r.getDouble(2) - r.getDouble(1))).toSeq
    val rows = c.select(col("vec_id"),
        VectorMath.toDouble(col("embedding")).as("v"),
        VectorMath.sq8Quantize(col("embedding"), typedLit(mins), typedLit(scales))
          .as("code"))
      .as[(Long, Seq[Double], Array[Byte])].collect()
    rows should have length 50
    rows.foreach { case (_, v, code) =>
      code should have length 8
      v.indices.foreach { d =>
        val deq = mins(d) + (code(d) & 0xff).toDouble / scales(d)
        math.abs(deq - v(d)) should be <= (0.5 / scales(d) + 1e-12)
      }
    }
  }

  test("constant dimensions quantize safely (zero scale, no NaN)") {
    val docs = Seq(
      (1L, Seq(1.0f, 0.5f)), (2L, Seq(1.0f, -0.5f)), (3L, Seq(1.0f, 0.1f)),
      (4L, Seq(1.0f, 0.9f)), (5L, Seq(1.0f, -0.9f)), (6L, Seq(1.0f, 0.3f)))
      .toDF("vec_id", "embedding")
    val out = Ann.sq8TopK(docs.filter(col("vec_id") <= 2), docs.filter(col("vec_id") > 2),
      "vec_id", "embedding", k = 2)
    val exact = Ann.bruteForceTopK(docs.filter(col("vec_id") <= 2),
      docs.filter(col("vec_id") > 2), "vec_id", "embedding", k = 2)
    topkMap(out) shouldBe topkMap(exact)
  }
}
