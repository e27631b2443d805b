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
    * rendering is scale-stable cross-engine, timestamps through DATE). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val nd: Column => Column =
      if (exact) countDistinct(_) else approx_count_distinct(_)
    run(df, cols, c => Seq(nd(col(c)).as(s"__nd_$c")),
      c => Seq(col(s"__nd_$c").as("n_distinct")))
  }

  /** Exact AND HLL distinct counts from the SAME single aggregate pass —
    * the accuracy-audit shape (`q_profile_approx`): one scan, one Expand
    * (driven by the exact distincts; the HLL aggregates ride in the
    * non-distinct group), both estimates per column. Output adds
    * `n_distinct_approx` after `n_distinct`. Running [[profile]] twice
    * would double the scan and the Expand for no information gain. */
  def profileBoth(df: DataFrame, cols: Seq[String]): DataFrame =
    run(df, cols,
      c => Seq(countDistinct(col(c)).as(s"__nd_$c"),
        approx_count_distinct(col(c)).as(s"__nda_$c")),
      c => Seq(col(s"__nd_$c").as("n_distinct"),
        col(s"__nda_$c").as("n_distinct_approx")))

  /** Shared one-pass plan: `distinctAggs` emits the per-column distinct
    * aggregate(s), `distinctOut` the matching output struct fields. */
  private def run(df: DataFrame, cols: Seq[String],
      distinctAggs: String => Seq[Column],
      distinctOut: String => Seq[Column]): DataFrame = {
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    require(cols.nonEmpty && cols.forall(types.contains),
      s"profile columns must exist in the frame: ${cols.filterNot(types.contains)}")
    def fmt(c: String, v: Column): Column = types(c) match {
      case DoubleType | FloatType => v.cast("decimal(18,2)").cast("string")
      case TimestampType | TimestampNTZType => v.cast("date").cast("string")
      case _ => v.cast("string")
    }
    val aggCols = count(lit(1)).as("__rows") +: cols.flatMap(c =>
      Seq(count(col(c)).as(s"__nn_$c")) ++ distinctAggs(c) ++ Seq(
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c")))
    // Scan-parallelism guard: countDistinct's Expand multiplies the scan
    // rows c× INSIDE the scan stage, so a source whose partition count
    // can't feed the cluster (single-file single-row-group parquet — the
    // local testdata shape) executes the whole profile serially (measured:
    // 7.8s wall ≈ 7.5s cpu on 32 cores). When the scan is starved,
    // redistribute once before the aggregate — the profiler reads every
    // column anyway, so the exchange carries nothing the scan didn't —
    // and the expand+partial-distinct run on all cores. On any
    // well-partitioned input (every real multi-file table at scale,
    // where parts >> cores) this branch never fires and the plan is the
    // untouched single-pass aggregate.
    //
    // The probe itself must be free: `df.rdd.getNumPartitions` on a frame
    // containing an exchange finalizes the adaptive plan, which
    // MATERIALIZES every upstream query stage — the upstream work would
    // run once for the probe and again for the real aggregate. So the
    // probe only fires on shuffle-free frames (scan + narrow ops), where
    // building the RDD plans zero jobs: there the partition count IS the
    // scan split count. Any frame that already contains a shuffle was
    // distributed by that exchange and needs no guard.
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val narrow = df.queryExecution.optimizedPlan.collect { case p => p }.forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.Project => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Filter => true
      case _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
      case _ => false
    }
    val src =
      if (narrow && df.rdd.getNumPartitions * 2 < cores) df.repartition(cores)
      else df
    val structs = cols.map(c => struct(
      Seq(lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_null")) ++
      distinctOut(c) ++ Seq(
        fmt(c, col(s"__min_$c")).as("min_s"),
        fmt(c, col(s"__max_$c")).as("max_s")): _*))
    src.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(structs: _*)).as("__p"))
      .select(col("__p.*"))
  }
}
