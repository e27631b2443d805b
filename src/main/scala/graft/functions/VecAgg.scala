package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector aggregation as a typed [[Aggregator]] — the
  * embedding-centroid primitive of a training-data pipeline (cluster
  * means, per-source average embeddings, IVF centroid refinement).
  *
  * Why an Aggregator and not `posexplode` + groupBy: exploding multiplies
  * the shuffle by `dims` (64× row fan-out BEFORE the exchange). The
  * Aggregator folds vectors into one fixed-size buffer per group inside
  * the map stage (partial aggregation), so only |groups| × dims longs
  * cross the wire — at 100 TB that is the difference between shuffling
  * 6.4 TB and shuffling kilobytes.
  *
  * Determinism: float addition does not associate, so a distributed sum
  * of raw floats is partition-order-dependent. Each element is first
  * scaled to a long (`round(v · 10^scaleDigits)`, half away from zero —
  * the rounding both Spark's and DuckDB's SQL `round` use), and the
  * LONGS are summed: exact integer arithmetic, any fold order, same
  * result. Callers divide by the group count downstream if they need the
  * mean (kept out of the aggregate so the output stays exactly
  * hash-comparable across engines).
  */
object VecAgg {

  /** Rounds half away from zero — matches SQL `round` semantics on both
    * Spark and DuckDB (Java's `Math.round` rounds half UP, which differs
    * on negative ties). */
  @inline private def roundHalfAway(d: Double): Long =
    (if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)).toLong

  final class ScaledVecSum(dims: Int, scale: Long)
      extends Aggregator[Array[Float], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](dims)
    def reduce(b: Array[Long], a: Array[Float]): Array[Long] = {
      if (a != null) {
        val n = math.min(dims, a.length)
        var i = 0
        while (i < n) { b(i) += roundHalfAway(a(i).toDouble * scale); i += 1 }
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < dims) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** `sum(round(v · 10^scaleDigits))` per dimension over a group of
    * `array<float>` columns, as one fixed-size buffer per group. */
  def sumScaled(c: Column, dims: Int, scaleDigits: Int = 6): Column = {
    require(scaleDigits >= 0 && scaleDigits <= 12, "scaleDigits out of range")
    val scale = math.pow(10, scaleDigits).toLong
    udaf(new ScaledVecSum(dims, scale)).apply(c)
  }
}
