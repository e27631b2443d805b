package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic snapshot publication — the engine's re-expression of the
  * reference's scratch-table backfill
  * (target/snowflake/snowflake_target.go:139-217 `InitializeRelation`):
  * load into `<name>_SCRATCH`, then atomically swap/rename live so an
  * interrupted backfill never leaves a half-written table.
  *
  * Spark-side: write partitioned parquet to `<table>.__scratch`, then
  * publish by filesystem rename (atomic on HDFS/posix; on object stores
  * configure a committer-backed path or a metastore pointer swap instead —
  * the publish step is isolated here so that swap is one method).
  *
  * Chunked CSV loading (reference: target/common/csvsplit, 20 000
  * rows/chunk) maps to Spark's native partitioned read/write — each task
  * is a chunk; `repartition(key)` keeps downstream merges co-partitioned.
  */
object SnapshotWriter {

  def scratchPath(base: String, table: String): String = s"$base/$table.__scratch"
  def livePath(base: String, table: String): String = s"$base/$table"
  def trashPath(base: String, table: String): String = s"$base/$table.__old"

  /** Write `df` as the new content of `table` under `base`, atomically:
    * scratch write → (live → trash) → (scratch → live) → drop trash.
    * Mirrors the reference's create-scratch / swap-or-rename / drop
    * sequence. Optionally repartitions by the identity key so later
    * [[MergeInto]] scans are co-partitioned. */
  def publish(df: DataFrame, base: String, table: String,
      repartitionKeys: Seq[String] = Nil, numPartitions: Option[Int] = None): String = {
    val spark = df.sparkSession
    val scratch = scratchPath(base, table)
    val live = livePath(base, table)
    val trash = trashPath(base, table)

    val out =
      if (repartitionKeys.nonEmpty) {
        val cols = repartitionKeys.map(df(_))
        val rep = numPartitions.map(n => df.repartition(n, cols: _*))
          .getOrElse(df.repartition(cols: _*))
        // cluster rows inside each file so parquet row-group min/max
        // statistics prune key-range scans (data skipping)
        rep.sortWithinPartitions(cols: _*)
      } else df
    out.write.mode("overwrite").parquet(scratch)

    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val livePathH = new Path(live)
    val trashPathH = new Path(trash)
    if (fs.exists(trashPathH)) fs.delete(trashPathH, true)
    val existed = fs.exists(livePathH)
    if (existed) {
      if (!fs.rename(livePathH, trashPathH))
        throw new java.io.IOException(s"could not stage out old $live")
    }
    if (!fs.rename(new Path(scratch), livePathH)) {
      // roll back so the previous live version stays queryable
      if (existed) fs.rename(trashPathH, livePathH)
      throw new java.io.IOException(s"could not publish $scratch -> $live")
    }
    if (existed) fs.delete(trashPathH, true)
    live
  }

  /** Publish the snapshot as a *bucketed* catalog table: co-located by the
    * identity key so repeated [[MergeInto]] runs (broadcastChangelog=false)
    * and key-equi-joins read bucket-local with no snapshot exchange. The
    * bucketed layout is the parquet analogue of the co-partitioning a
    * warehouse gets from clustering keys. */
  def publishBucketed(df: DataFrame, tableName: String,
      bucketKeys: Seq[String], nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
