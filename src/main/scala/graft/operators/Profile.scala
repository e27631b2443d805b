package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler (SURVEY.md §2.2 #30o): per-column row count,
  * null count, exact distinct count, and formatted min/max — the data-
  * quality summary every ingestion pipeline runs before trusting a new
  * drop of parquet.
  *
  * Scale shape: ONE aggregate over the table produces every statistic
  * (the per-column rows are exploded from the single 1-row aggregate
  * result, not re-scanned per column). Exact `countDistinct` over c
  * columns makes Catalyst plan an Expand (c× the scan rows into the
  * partial aggregate — still map-side combined, never a per-column
  * pass); at 100 TB swap `exact = false` to HyperLogLog
  * `approx_count_distinct`, which collapses the Expand back to a single
  * pass. min/max are computed on the NATIVE type and formatted after the
  * aggregate (formatting first would compare "10" < "9" lexically).
  */
object Profile {

  /** Profile `cols` of `df` in one aggregate pass. Output one row per
    * column: `(col_name, n_rows, n_null, n_distinct, min_s, max_s)`,
    * min/max rendered as strings (doubles through DECIMAL(18,2) so the
    * rendering is scale-stable cross-engine, timestamps through DATE).
    *
    * NOTE (measured, do not "optimize"): computing the exact and HLL
    * distincts in ONE mixed aggregate is a pessimization, not a fusion.
    * With distinct + sketch aggregates combined, Spark keys the partial
    * aggregate by the distinct-SPREAD values, so every (col, value)
    * group carries partial HLL buffers for every sketch agg — at 6M rows
    * that was +9 MB shuffle and 57 vs ~36 task-CPU-s against running the
    * exact pass and the sketch pass as two aggregates and joining the
    * 5-row results (the accuracy-audit query's shape). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    require(cols.nonEmpty && cols.forall(types.contains),
      s"profile columns must exist in the frame: ${cols.filterNot(types.contains)}")
    def fmt(c: String, v: Column): Column = types(c) match {
      case DoubleType | FloatType => v.cast("decimal(18,2)").cast("string")
      case TimestampType | TimestampNTZType => v.cast("date").cast("string")
      case _ => v.cast("string")
    }
    val nd: Column => Column =
      if (exact) countDistinct(_) else approx_count_distinct(_)
    val aggCols = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      nd(col(c)).as(s"__nd_$c"),
      min(col(c)).as(s"__min_$c"),
      max(col(c)).as(s"__max_$c")))
    // Scan-parallelism guard ([[Skew.feedCluster]]): countDistinct's
    // Expand multiplies the scan rows c× INSIDE the scan stage, so a
    // source whose partition count can't feed the cluster (single-file
    // single-row-group parquet — the local testdata shape) executes the
    // whole profile serially (measured: 7.8s wall ≈ 7.5s cpu on 32
    // cores). Redistributing once costs nothing the scan didn't already
    // read — the profiler touches every column.
    val src = Skew.feedCluster(df)
    val structs = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__rows").as("n_rows"),
      (col("__rows") - col(s"__nn_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      fmt(c, col(s"__min_$c")).as("min_s"),
      fmt(c, col(s"__max_$c")).as("max_s")))
    src.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(structs: _*)).as("__p"))
      .select(col("__p.*"))
  }
}
