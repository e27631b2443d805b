package graft

import org.apache.spark.sql.{Column, DataFrame}

package object queries {

  /** Total order for a SMALL result of an EXPENSIVE pipeline.
    *
    * A plain `orderBy` plans as a range-partitioned sort whose partitioner
    * SAMPLES the child — executing the entire upstream pipeline twice.
    * That's right for big outputs (parallel sort) but pure waste when the
    * result is orders of magnitude smaller than the input (compaction,
    * dedup groups, per-key rollups): there, shuffle the result to one
    * partition and sort it once, no sampling pass. Big-output queries keep
    * `orderBy`, placed BELOW the expensive projection (sort-first pattern,
    * see cdcTextCast).
    *
    * This sort exists ONLY for the oracle gate (DuckDB hash-comparison
    * needs order-stable output); it is NOT part of the operator. A bench
    * session sets `spark.graft.bench.noDeterminismSort=true` and gets the
    * raw operator output — otherwise the single-task sort of the full
    * result is charged to the operator in every measurement (at the 10x
    * ladder, ~1.5M wide rows through one task). Verify never sets the
    * flag, so gated correctness always runs the sorted form. */
  private[queries] def orderedSmall(df: DataFrame, cols: Column*): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.bench.noDeterminismSort", "false") == "true") df
    else df.repartition(1).sortWithinPartitions(cols: _*)
}
