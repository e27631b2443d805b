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
    * see cdcTextCast). */
  private[queries] def orderedSmall(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
