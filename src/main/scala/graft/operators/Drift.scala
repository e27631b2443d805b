package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitor (SURVEY.md §2.2 #30t): per-bucket
  * population-stability-index terms between two snapshots of the same
  * population — the check a pipeline runs between corpus versions
  * before retraining on the new drop (PSI ≳ 0.2 on a feature is the
  * conventional "distribution moved, investigate" alarm).
  *
  * Determinism contract: the only transcendental (`ln`) is rounded to 9
  * places per bucket, so the report is engine-exact and a SQL engine
  * replays it bit-for-bit (the same regime as the decay/NLL gates).
  *
  * Scale shape: one map-side-combined count aggregate per snapshot
  * (shuffle is bucket-cardinality-sized, not row-sized), a full-outer
  * join of the two tiny bucket tables, and a broadcast 1-row totals
  * frame — the snapshots themselves are scanned exactly once each and
  * never co-shuffled.
  */
object Drift {

  /** PSI report between snapshots `a` and `b`, bucketed by `bucket`
    * (any expression over the rows: an equi-width bin id, a category
    * column, a quantile id). Output one row per bucket present in
    * either side: `(bucket, n_a, n_b, psi_term)` where
    * `psi_term = round((p_a - p_b) * ln(p_a / p_b), 9)` and the
    * proportions are Laplace-smoothed (`+0.5` per bucket, `+0.5*k` per
    * total over the k observed buckets) so a bucket empty on one side
    * contributes a finite term instead of ±∞. The rounded terms are
    * engine-exact; cast them DECIMAL before summing when an
    * order-independent total is needed. */
  def psiReport(a: DataFrame, b: DataFrame, bucket: Column): DataFrame = {
    val ca = a.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_b"))
    val grid = ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = grid.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"),
      count(lit(1)).as("__k"))
    val pa = (col("n_a") + lit(0.5)) / (col("__ta") + lit(0.5) * col("__k"))
    val pb = (col("n_b") + lit(0.5)) / (col("__tb") + lit(0.5) * col("__k"))
    grid.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round((pa - pb) * log(pa / pb), 9).as("psi_term"))
  }
}
