package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.cdc.{ChangeAction, Relation}
import graft.sources.JdbcTarget

/** Continuous sync INTO a JDBC warehouse — the reference's actual
  * topology (replication stream → accumulate → one Snowflake transaction
  * per batch → acknowledge, sync/stream/stream.go +
  * target/snowflake/snowflake_target.go), with the warehouse side played
  * by [[JdbcTarget]]'s staged server-side MERGE.
  *
  * Exactly-once contract: delivery is at-least-once (foreachBatch replays
  * after a crash), and [[JdbcTarget.applyBatchTransactional]] makes the
  * apply idempotent — every MERGE plus the applied-LSN update commit in
  * ONE database transaction, and a replayed batch is skipped by the
  * in-database LSN record. All progress state lives in the source
  * (replication slot) and the target (applied LSN), exactly the
  * reference's "no state of our own" rule — the streaming checkpoint is
  * only an optimization, never the source of truth, so wiping it cannot
  * double-apply.
  *
  * Scale shape: per batch, only the micro-batch travels — compacted once
  * (persisted across the per-table stage loop), staged via partitioned
  * JDBC inserts, merged server-side. The Spark-side snapshot never
  * exists; the warehouse owns the table.
  */
final class JdbcStreamingMerge(
    targetUrl: String,
    properties: Map[String, String],
    relations: Seq[Relation]) extends Serializable {

  // same-named tables across schemas are indistinguishable in the stream
  // (see StreamingMerge): refuse at construction, never conflate
  require(relations.map(_.table).distinct.size == relations.size,
    "relations with the same table name in different schemas cannot be " +
      "distinguished in the change stream: " +
      relations.groupBy(_.table).collect { case (t, rs) if rs.size > 1 =>
        rs.map(_.qualifiedName).mkString(" vs ") }.mkString("; "))
  private val known = relations.map(_.table).toSet
  private val colsByTable = relations.map(r => r.table -> r.columnNames.toSet).toMap
  @transient lazy val target = new JdbcTarget(targetUrl, properties)

  /** Apply one micro-batch. Public so tests and backfills drive the exact
    * code `foreachBatch` runs. */
  def applyBatch(batch: Dataset[ChangeAction], batchId: Long): Unit = {
    import batch.sparkSession.implicits._
    // at-least-once replay protection before any fold, mirroring
    // StreamingMerge.applyBatch: LSN-truncate at the in-database applied
    // watermark (a replayed super-batch must not fold an already-applied
    // prefix), then dedupe redelivered transactions by exact WAL position
    val watermark = target.appliedLsn()
    val rows = batch.filter(batch("lsn") > watermark)
      .dropDuplicates("table", "lsn", "seq").persist()
    try {
      // one job yields the touched tables AND the relation-drift guard
      // (the contract shared with StreamingMerge.applyBatch: a column the
      // configured relation doesn't know means the source schema moved
      // without a resync — the generated MERGE would silently drop it)
      val touched =
        SchemaChangedException.touchedTablesCheckingDrift(rows, colsByTable).toSet
      if (touched.isEmpty) return
      val unknown = touched -- known
      if (unknown.nonEmpty) // supervisor reacts with resync, as the
        // reference drops the slot on ErrRelationChanged
        throw new SchemaChangedException(
          s"unknown relation(s) in stream: ${unknown.toSeq.sorted.mkString(", ")}")
      val maxLsn = rows.map(_.lsn).reduce(math.max(_, _))
      target.applyBatchTransactional(
        relations.filter(r => touched(r.table)), rows, maxLsn)
    } finally rows.unpersist()
  }

  def writer(stream: Dataset[ChangeAction], trigger: Trigger,
      checkpoint: String): DataStreamWriter[ChangeAction] =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[ChangeAction], batchId: Long) =>
        applyBatch(batch, batchId)
      }

  def start(stream: Dataset[ChangeAction], checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    writer(stream, trigger, checkpoint).start()
}
