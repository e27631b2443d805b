package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler (SURVEY.md §2.2 #30o): per-column row count,
  * null count, exact distinct count, and formatted min/max — the data-
  * quality summary every ingestion pipeline runs before trusting a new
  * drop of parquet.
  *
  * Scale shape: ONE base aggregate over the table produces every
  * statistic except the exact distincts (the per-column rows are exploded
  * from the single 1-row result, not re-scanned per column); exact
  * distinct counts run as one tiny two-stage dedup-then-count aggregate
  * per column, crossJoined onto the 1-row base — deliberately NOT as
  * countDistinct inside the base aggregate, whose Expand multiplied every
  * scan row (c+1)-fold through a struct-keyed partial aggregate (see the
  * note in [[profile]]; measured 6.6× the task-CPU of the split). At
  * 100 TB swap `exact = false` to HyperLogLog `approx_count_distinct`,
  * which folds the distincts back into the single base pass. min/max are
  * computed on the NATIVE type and formatted after the aggregate
  * (formatting first would compare "10" < "9" lexically).
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
    val aggCols = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      min(col(c)).as(s"__min_$c"),
      max(col(c)).as(s"__max_$c")) ++
      (if (exact) Nil
       else Seq(approx_count_distinct(col(c)).as(s"__nd_$c"))))
    // Scan-parallelism guard ([[Skew.feedCluster]]): a source whose
    // partition count can't feed the cluster (single-file single-row-group
    // parquet — the local testdata shape) executes the whole base
    // aggregate serially. Redistributing once costs nothing the scan
    // didn't already read — the profiler touches every column. The
    // EXPLICIT projection ahead of the guard is guide-§2.3 insurance: the
    // exchange (when it fires) carries exactly the profiled columns, never
    // the table's full width, and every consumer below (base aggregate and
    // exact arms alike) shares the one projected subtree.
    val src = Skew.feedCluster(df.select(cols.map(col): _*))
    val base = src.agg(aggCols.head, aggCols.tail: _*)
    // Exact distinct counts run as ONE TINY TWO-STAGE AGGREGATE PER
    // COLUMN (partition-local dedup on the value, exchange of distinct
    // values only, count) crossJoined onto the 1-row base — NOT as
    // countDistinct inside the base aggregate. Mixed with the other aggs,
    // Catalyst plans c× countDistinct as an Expand that multiplies every
    // scan row (c+1)-fold into a partial aggregate keyed by the
    // distinct-spread (gid, value) structs, with every min/max/count agg
    // branch-evaluated per expanded row — measured at sf0.1 (5 columns,
    // 600k rows): 21.9 task-CPU-s / 2.7 s wall for the Expand form vs
    // 3.3 CPU-s / 1.5 s for this split, same results. The arms are
    // independent leaf stages inside the one job (they run concurrently),
    // each scans only its own column (columnar pruning), and each
    // crossJoin side is one row, so the join tree is free. At 100 TB the
    // profiled columns are read twice (base + arm) instead of once — the
    // documented `exact = false` HLL drop-in (single pass, no arms, no
    // Expand) remains the scale configuration. A DERIVED input frame is
    // re-evaluated per arm (identical exchanges dedup via ReusedExchange;
    // pre-exchange stages don't): persist an expensive lineage first, or
    // profile it with `exact = false`.
    //
    // The arms deliberately read `df`, NOT the guarded `src` (r22,
    // measured): routing them through the guard's round-robin exchange
    // was a 10x CPU pessimization (same-window 7-rep A/B: q_profile
    // task-CPU 2.0 → 24.7 s, shuffle read 12.7 → 20.6 MB) — column
    // pruning splits the guard into one keyless exchange PER ARM, each
    // paying the serial SPARK-23207 pre-sort and shuffling 600k RAW
    // values where the serial partial dedup collapses them first
    // (l_returnflag: 600k → 3 rows before any exchange). The per-arm
    // serial dedups are independent LEAF stages of one job and run
    // concurrently, so the cluster is fed without any arm exchange.
    val withNd =
      if (!exact) base
      else cols.foldLeft(base) { (acc, c) =>
        acc.crossJoin(
          df.select(col(c)).distinct().agg(count(col(c)).as(s"__nd_$c")))
      }
    val structs = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__rows").as("n_rows"),
      (col("__rows") - col(s"__nn_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      fmt(c, col(s"__min_$c")).as("min_s"),
      fmt(c, col(s"__max_$c")).as("max_s")))
    withNd
      .select(explode(array(structs: _*)).as("__p"))
      .select(col("__p.*"))
  }
}
