package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable quality classifier for training-data pipelines (the
  * fastText/CCNet-style quality-filter step, distilled to its scalable
  * core): full-batch logistic regression over cheap per-document text
  * features, trained with deterministic gradient descent — the gradient
  * is a per-row decimal-rounded sum, so training is EXACT, partition-
  * order-independent, and replayable in another engine (the same
  * cross-engine verification regime as the BPE trainer).
  *
  * Scale shape: each iteration is ONE aggregation over the (persisted)
  * feature frame — map-side partial sums, a scalar gradient vector to
  * the driver, a literal-sized weight update. Scoring is a pure
  * projection. Features and weights are tiny; the corpus streams.
  *
  * Float discipline (what makes the gate exact): the sigmoid is rounded
  * to 6 dp BEFORE entering the gradient (washing out last-ulp `exp`
  * differences between engines), each row's gradient contribution is
  * rounded to 9 dp and summed through DECIMAL, and weight updates use
  * one fixed association `w + lr * g / n`. */
object QualityClassifier {

  /** Rounded sigmoid of the linear term — fixed left-assoc order
    * `w0 + w1·x1 + … + wk·xk`. */
  private def prob(w: Array[Double], featureCols: Seq[String]): Column = {
    val z = featureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Train: returns `bias +: featureWeights`. `feats` must hold numeric
    * `featureCols` and a 0/1 `labelCol`; callers persist it (train runs
    * `iters + 1` jobs over it). */
  def train(feats: DataFrame, labelCol: String, featureCols: Seq[String],
      lr: Double, iters: Int): Array[Double] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val n = feats.count()
    require(n > 0, "empty training frame")
    var w = Array.fill(featureCols.size + 1)(0.0)
    for (_ <- 0 until iters) {
      val g = col(labelCol).cast("double") - prob(w, featureCols)
      val gradCols = (round(g, 9) +: featureCols.map(c => round(g * col(c), 9)))
        .zipWithIndex.map { case (e, j) =>
          sum(e.cast("decimal(28,9)")).cast("double").as(s"__g$j")
        }
      val grads = feats.agg(gradCols.head, gradCols.tail: _*).head()
      w = w.indices.map(j => w(j) + lr * grads.getDouble(j) / n).toArray
    }
    w
  }

  /** Score: adds `p` (rounded probability) and `pred` (p ≥ 0.5). */
  def score(feats: DataFrame, w: Array[Double],
      featureCols: Seq[String]): DataFrame = {
    val p = prob(w, featureCols)
    feats.withColumn("p", p).withColumn("pred", col("p") >= 0.5)
  }
}
