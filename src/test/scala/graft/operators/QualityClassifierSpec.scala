package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class QualityClassifierSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // linearly separable by x1: positives cluster high, negatives low
  private def separable = (0 until 200).map { i =>
    val y = i % 2
    val x1 = if (y == 1) 0.8 + (i % 10) * 0.01 else 0.2 + (i % 10) * 0.01
    (i.toLong, y, x1, (i % 7) * 0.1)
  }.toDF("id", "y", "x1", "x2")

  test("GD learns a separating direction and scores accordingly") {
    val w = QualityClassifier.train(separable, "y", Seq("x1", "x2"),
      lr = 1.0, iters = 20)
    w(1) should be > 0.0 // x1 is the discriminative feature
    val scored = QualityClassifier.score(separable, w, Seq("x1", "x2"))
      .select(col("y"), col("pred").cast("int")).as[(Int, Int)].collect()
    val acc = scored.count(r => r._1 == r._2).toDouble / scored.length
    acc should be > 0.95
  }

  test("training is deterministic and partition-independent") {
    val a = QualityClassifier.train(separable.repartition(17), "y",
      Seq("x1", "x2"), lr = 0.5, iters = 5).toSeq
    val b = QualityClassifier.train(separable.repartition(3), "y",
      Seq("x1", "x2"), lr = 0.5, iters = 5).toSeq
    a shouldBe b // decimal-summed gradients: no float-order dependence
  }

  test("iteration 1 gradient matches the closed form at w = 0") {
    // at w=0 the sigmoid is exactly 0.5, so the bias gradient is
    // sum(y - 0.5) = (n_pos - n_neg)/2
    val df = Seq((1L, 1, 0.0), (2L, 1, 0.0), (3L, 0, 0.0))
      .toDF("id", "y", "x1")
    val w = QualityClassifier.train(df, "y", Seq("x1"), lr = 1.0, iters = 1)
    w(0) shouldBe (0.5 / 3) * 1.0 +- 1e-12 // lr * ((2-1)/2) / 3
  }
}
