package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — pair each left "point" row with every right
  * interval containing it: `point BETWEEN lo AND hi`.
  *
  * Spark-first shape: a raw theta-join plans as BroadcastNestedLoopJoin
  * (quadratic work, broadcast-bound). Instead both sides are BINNED into
  * fixed-width buckets — an interval spanning n buckets is replicated n
  * times, a point lands in exactly one — and the join becomes a plain
  * equi-join on the bucket id with the exact predicate as a post-filter.
  * One shuffle, hash join, AQE-skew-splittable: the standard scale
  * re-expression of interval joins (cf. interval-join binning in stream
  * processors).
  *
  * `bucketWidth` trades replication (intervals copied per spanned bucket)
  * against selectivity (candidates per bucket); set it near the typical
  * interval length.
  */
object RangeJoin {

  /** @param points    left side, probe points in `pointCol` (numeric)
    * @param intervals right side with numeric `loCol`/`hiCol` (inclusive)
    * @param bucketWidth bin width, > 0 */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val binnedIntervals = intervals
      .withColumn("__b", explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val binnedPoints = points.withColumn("__b", bucketOf(col(pointCol)))
    binnedPoints.join(binnedIntervals, Seq("__b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }
}
