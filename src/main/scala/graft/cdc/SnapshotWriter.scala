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

    swapLive(spark, base, table)
    live
  }

  /** Promote a fully-written scratch dir to live: (live → trash) →
    * (scratch → live) → drop trash. The two renames are individually atomic
    * but not jointly — a crash between them leaves no live dir, which is
    * why every reader runs [[recover]] first: the scratch dir still holds
    * the complete new version (parquet `_SUCCESS` proves it), so the swap
    * can always be rolled forward. */
  def swapLive(spark: SparkSession, base: String, table: String): Unit = {
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val livePathH = new Path(livePath(base, table))
    val trashPathH = new Path(trashPath(base, table))
    val scratchH = new Path(scratchPath(base, table))
    require(fs.exists(new Path(scratchH, "_SUCCESS")),
      s"refusing to publish incomplete scratch $scratchH (no _SUCCESS)")
    if (fs.exists(trashPathH)) fs.delete(trashPathH, true)
    val existed = fs.exists(livePathH)
    if (existed) {
      if (!fs.rename(livePathH, trashPathH))
        throw new java.io.IOException(s"could not stage out old $livePathH")
    }
    if (!fs.rename(scratchH, livePathH)) {
      // roll back so the previous live version stays queryable
      if (existed) fs.rename(trashPathH, livePathH)
      throw new java.io.IOException(s"could not publish $scratchH -> $livePathH")
    }
    if (existed) fs.delete(trashPathH, true)
  }

  /** Per-table APPLIED-LSN marker, published atomically WITH the data it
    * describes: written into the scratch dir after the parquet job, so
    * the swap renames data + watermark as one unit. This closes the
    * torn window between a multi-table publish and the (separate,
    * global) commit-log write: a crash in between leaves tables whose
    * own marker already records the batch — the per-table replay cut
    * then drops the batch's actions for exactly those tables, while a
    * table whose publish never completed replays them. Key-addressed
    * re-merge idempotence cannot give this guarantee alone: a replayed
    * batch containing dead-identity REUSE (delete k2 + rekey into k2,
    * or rekey away from k1 + fresh insert at k1) re-applies against the
    * post-batch state and duplicates or loses the reused identity. */
  private def appliedMarker(dir: String) = new Path(dir, "_graft_applied")

  def writeAppliedMarker(spark: SparkSession, scratchDir: String, lsn: Long): Unit = {
    val p = appliedMarker(scratchDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(lsn.toString.getBytes("UTF-8")) finally out.close()
  }

  def readAppliedMarker(spark: SparkSession, base: String, table: String): Option[Long] = {
    val p = appliedMarker(livePath(base, table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      scala.util.Try(s.toLong).toOption
    }
  }

  /** Crash recovery for an interrupted [[swapLive]]. Idempotent; call
    * before reading or merging into a table (single-writer assumed).
    *
    * A publish can die in three observable states:
    *  1. live missing, scratch COMPLETE (`_SUCCESS`)  → the old live was
    *     already staged out: roll FORWARD (finish scratch → live). Safe
    *     even though the batch was never commit-logged — the batch replays
    *     and [[MergeInto]] is idempotent.
    *  2. live missing, scratch absent/incomplete, trash present → the
    *     forward rename never started or scratch is unusable: roll BACK
    *     (trash → live).
    *  3. live present → publish either never started or fully completed:
    *     drop stale trash/scratch leftovers.
    * Without this, a crash inside the window makes the next merge read an
    * EMPTY snapshot and silently republish only that batch's rows. */
  def recover(spark: SparkSession, base: String, table: String): Unit = {
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(livePath(base, table))
    val trash = new Path(trashPath(base, table))
    val scratch = new Path(scratchPath(base, table))
    val scratchComplete = fs.exists(new Path(scratch, "_SUCCESS"))
    if (!fs.exists(live)) {
      if (scratchComplete) {
        if (!fs.rename(scratch, live))
          throw new java.io.IOException(s"recovery: could not roll forward $scratch -> $live")
        if (fs.exists(trash)) fs.delete(trash, true)
      } else if (fs.exists(trash)) {
        if (fs.exists(scratch)) fs.delete(scratch, true)
        if (!fs.rename(trash, live))
          throw new java.io.IOException(s"recovery: could not roll back $trash -> $live")
      }
      // neither scratch nor trash: table never existed — nothing to do
    } else {
      if (fs.exists(trash)) fs.delete(trash, true)
      if (fs.exists(scratch)) fs.delete(scratch, true) // stale stage: its batch will replay
    }
  }

  /** Publish the snapshot as a *bucketed* catalog table: co-located by the
    * identity key so repeated [[MergeInto]] runs (broadcastChangelog=false)
    * and key-equi-joins read bucket-local with no snapshot exchange. The
    * bucketed layout is the parquet analogue of the co-partitioning a
    * warehouse gets from clustering keys. */
  def publishBucketed(df: DataFrame, tableName: String,
      bucketKeys: Seq[String], nBuckets: Int): Unit = {
    val spark = df.sparkSession
    // A managed table's files can outlive the (in-memory) catalog entry —
    // a previous JVM's publish leaves the warehouse directory populated
    // while the fresh session's catalog has never heard of the table, and
    // CTAS then refuses the non-empty location. Drop both halves first:
    // the overwrite is the atomicity story here (the caller republishes
    // whole), so a torn state is re-created, never read.
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    // the CATALOG's own placement rule (current database, qualified names,
    // case folding), not a hand-built warehouse-dir guess
    val loc = new Path(
      org.apache.spark.sql.GraftBridge.defaultTablePath(spark, tableName))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }
}
