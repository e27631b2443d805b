package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc._
import graft.sources.JdbcTarget
import graft.streaming.{JdbcStreamingMerge, StreamingMerge, Supervisor}

/** High-level synchronization facade — the engine's equivalent of running
  * the reference binary (cmd/mammoth/main.go + sync/service/sync_service.go
  * `Run`): configure the relations to sync, backfill snapshots, then apply
  * change batches continuously, with schema verification up front and
  * supervised restart.
  *
  * A mammoth `config.yml`
  * {{{
  * sync:
  *   tables: [public.table1]
  *   batchmaxitems: 25000
  *   batchtimeout: 1m0s
  * }}}
  * maps to [[SyncConfig]] 1:1; the Snowflake target becomes a partitioned
  * parquet table store (or any Spark sink), and the Postgres source becomes
  * a JDBC snapshot read plus a change-event stream.
  */
final case class SyncConfig(
    relations: Seq[Relation],
    tablesBase: String,
    checkpointBase: String,
    batchTimeout: String = "60 seconds", // sync.batchtimeout
    batchMaxItems: Long = 25000,         // sync.batchmaxitems → source admission
    // set when the source emits full row images with no TOAST-unchanged
    // columns and no identity-changing updates (REPLICA IDENTITY FULL /
    // Debezium-style feeds): per-batch compaction then uses the columnar
    // fast path (ChangelogCompactor.compactSimple)
    simpleStreams: Boolean = false,
    // JDBC connection properties for a jdbc: tablesBase (credentials, TLS,
    // fetch size, …) — the reference carries these inside its warehouse
    // DSN; here they ride the java.sql DriverManager properties map
    targetProperties: Map[String, String] = Map.empty,
    // postgres.slotname — names both the replication slot and the
    // publication, like the reference
    slotName: String = "mammoth",
    // sync.prohibitdropslot — publication/schema drift then errors out
    // instead of resyncing
    prohibitDropSlot: Boolean = false,
    // write-optimized parquet store (graft.cdc.DeltaStore): per-batch
    // delta append + threshold-triggered fold, raising the apply ceiling
    // the full-rewrite path hits on large tables
    deltaStore: Boolean = false,
    deltaCompactRows: Long = 100000L,
    deltaCompactFiles: Int = 64,
    // per-batch multi-table staging concurrency (1 ⇒ serial staging);
    // see StreamingMerge.eachTableConcurrently
    stagingThreads: Int = 8) {

  /** Fail-fast validation, mirroring the reference's config.Validate
    * (config/config.go:86, required-field checks before anything runs). */
  def validate(): SyncConfig = {
    require(relations.nonEmpty, "sync.tables must list at least one relation")
    val dup = relations.groupBy(_.table).collect { case (t, rs) if rs.size > 1 => t }
    require(dup.isEmpty, s"duplicate relations configured: ${dup.mkString(",")}")
    relations.foreach { r =>
      require(r.identityColumns.nonEmpty,
        s"${r.qualifiedName}: a replica identity (key) column is required")
    }
    require(tablesBase.nonEmpty, "tablesBase is required")
    require(checkpointBase.nonEmpty, "checkpointBase is required")
    require(batchMaxItems > 0, "batchmaxitems must be positive")
    // trigger string must parse — fail at config time, not stream start
    require(scala.util.Try(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(batchTimeout)).isSuccess,
      s"unparseable batchtimeout: '$batchTimeout'")
    // the delta store is a parquet-target regime; a jdbc: warehouse pays
    // its rewrite server-side and would silently ignore the flag
    require(!deltaStore || !tablesBase.startsWith("jdbc:"),
      "deltastore=true applies to a parquet tablesBase, not a jdbc: target")
    require(stagingThreads > 0,
      s"stagingthreads must be positive (1 = serial staging), got $stagingThreads")
    this
  }
}

final class GraftSync(spark: SparkSession, cfg0: SyncConfig) {

  private val cfg = cfg0.validate()

  /** `tablesBase` selects the target: a `jdbc:` URI routes every apply
    * through [[JdbcStreamingMerge]] (server-side staged MERGE, applied-LSN
    * in the database — the reference's warehouse topology); anything else
    * is a parquet table-store base directory. */
  private val jdbcMode = cfg.tablesBase.startsWith("jdbc:")
  private lazy val jdbcTarget = new JdbcTarget(cfg.tablesBase, cfg.targetProperties)
  private lazy val jdbcMerge =
    new JdbcStreamingMerge(cfg.tablesBase, cfg.targetProperties, cfg.relations)

  // The applied-LSN commit log lives WITH the target tables, not the
  // streaming checkpoint — "all state is in the source and target"
  // (reference README), so a stream restarted from a fresh checkpoint
  // still dedupes against what the table store has already absorbed.
  private lazy val merge = new StreamingMerge(
    spark, cfg.tablesBase, cfg.relations, s"${cfg.tablesBase}/_commitlog",
    simpleStreams = cfg.simpleStreams,
    deltaStore = cfg.deltaStore,
    deltaCompactRows = cfg.deltaCompactRows,
    deltaCompactFiles = cfg.deltaCompactFiles,
    stagingThreads = cfg.stagingThreads)

  /** Reconcile publication + replication slot against the source catalog
    * BEFORE anything moves — the reference `Run` prologue
    * (sync_service.go:60-93). Returns either the fresh slot's exported
    * snapshot (backfill from it, then stream from its consistent point)
    * or the existing slot's restart LSN to resume from. */
  def prepareReplication(catalog: SlotLifecycle.Catalog): SlotLifecycle.Decision =
    SlotLifecycle.run(catalog, cfg.slotName, cfg.relations, cfg.prohibitDropSlot)

  /** Schema drift after the slot exists: drop it so the next supervised
    * run recreates slot + snapshot (sync_service.go:95-110). */
  def resyncReplication(catalog: SlotLifecycle.Catalog): Unit =
    SlotLifecycle.resync(catalog, cfg.slotName, cfg.prohibitDropSlot)

  /** Initial backfill of one relation from any source frame (JDBC
    * partitioned read, parquet, …): typed check + atomic scratch→live
    * publish, repartitioned by the identity key so later merges are
    * co-partitioned (reference: InitializeRelation + snapshotToTarget). */
  def backfill(rel: Relation, source: DataFrame): String = {
    require(cfg.relations.exists(_.table == rel.table), s"${rel.table} not configured")
    if (jdbcMode) { jdbcTarget.initialize(rel, source); rel.table }
    else SnapshotWriter.publish(source, cfg.tablesBase, rel.table,
      repartitionKeys = rel.identityColumnNames)
  }

  /** Schema verification before streaming starts (reference:
    * verifyRelations): source relation vs live table schema. */
  def verifyRelation(rel: Relation): Boolean =
    if (jdbcMode) {
      // JDBC engines fold identifier case and widen types through their
      // own dialect, so verification is name-based (case-insensitive),
      // like the reference's column-list check against the warehouse
      // (snowflake_target.go:219-273)
      scala.util.Try(jdbcTarget.read(spark, rel.table).schema).toOption.exists { s =>
        s.fields.map(_.name.toLowerCase).sorted.sameElements(
          rel.columns.map(_.name.toLowerCase).sorted)
      }
    } else {
      SnapshotWriter.recover(spark, cfg.tablesBase, rel.table)
      val live = SnapshotWriter.livePath(cfg.tablesBase, rel.table)
      val fs = new org.apache.hadoop.fs.Path(cfg.tablesBase)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(new org.apache.hadoop.fs.Path(live)) &&
        SchemaVerify.matches(rel.toStructType, spark.read.parquet(live).schema)
    }

  /** Apply one batch of already-assembled change actions (batch mode /
    * tests — the exact code the stream runs). */
  def applyBatch(actions: Dataset[ChangeAction], batchId: Long): Unit =
    if (jdbcMode) jdbcMerge.applyBatch(actions, batchId)
    else merge.applyBatch(actions, batchId)

  /** Continuous sync from a change-action stream. */
  def start(changes: Dataset[ChangeAction]): StreamingQuery =
    if (jdbcMode) jdbcMerge.start(changes, s"${cfg.checkpointBase}/changes",
      Trigger.ProcessingTime(cfg.batchTimeout))
    else merge.start(changes, Trigger.ProcessingTime(cfg.batchTimeout))

  /** Continuous sync from raw WAL-style messages. Assembly is STATEFUL
    * (`StatefulAssembler.assembleStream`): a transaction whose messages
    * straddle a micro-batch boundary parks in keyed state until its COMMIT
    * arrives, then is released whole — the reference's accumulator buffers
    * open transactions across reads identically (message_accumulator.go
    * `wta.tx`). The per-batch `ChangelogAssembler.assemble` would silently
    * lose the pre-boundary messages of such a transaction and apply a
    * partial transaction to the target.
    *
    * @param openTxnTimeout optional eviction for transactions that never
    *        commit (rolled back); see [[graft.streaming.StatefulAssembler]].
    */
  def startFromMessages(messages: Dataset[WalMessage],
      streamName: String = "messages",
      openTxnTimeout: Option[String] = None): StreamingQuery =
    graft.streaming.StatefulAssembler.assembleStream(messages, openTxnTimeout)
      .writeStream
      .outputMode("append") // required by flatMapGroupsWithState(Append)
      .option("checkpointLocation", s"${cfg.checkpointBase}/$streamName")
      .trigger(Trigger.ProcessingTime(cfg.batchTimeout))
      .foreachBatch { (batch: Dataset[ChangeAction], batchId: Long) =>
        applyBatch(batch, batchId)
      }
      .start()

  /** Supervised run: restart on transient failure, full resync via
    * `resnapshot` on schema change (reference: supervisor/supervisor.go). */
  def runSupervised(body: () => Unit, resnapshot: () => Unit,
      maxRestarts: Int = 10): Supervisor.Result =
    Supervisor.runForever(body, resnapshot, maxRestarts)

  /** Seed the applied position at a backfill's consistent point: WAL at
    * or below it is already IN the snapshot the backfill read, so the
    * stream must both START there and FILTER anything older an
    * at-least-once source might deliver. Monotonic (never rewinds). */
  def seedAppliedLsn(lsn: Long): Unit =
    if (jdbcMode) jdbcTarget.seedAppliedLsn(lsn)
    else if (lsn > merge.commitLog.lastLsn.getOrElse(Long.MinValue))
      merge.commitLog.commit(-1L, lsn)

  /** The target-side applied position the replication acknowledge must
    * follow — regime-aware: the in-DATABASE record for a jdbc: target
    * (JdbcStreamingMerge never writes the file commit log, so reading
    * that for a warehouse target would pin the ack at 0 forever: the
    * slot would retain WAL unboundedly and every pump restart would
    * re-spool the whole history), the file commit log otherwise. */
  def appliedLsn(): Long =
    if (jdbcMode) math.max(0L, jdbcTarget.appliedLsn())
    else merge.commitLog.lastLsn.getOrElse(0L)

  /** Read the current live state of a synced table (layout-aware: folds
    * pending deltas of the delta-store regime into the base; without
    * deltas this is the plain recovered parquet read). */
  def table(name: String): DataFrame =
    if (jdbcMode) jdbcTarget.read(spark, name)
    else cfg.relations.find(_.table == name) match {
      case Some(rel) =>
        graft.cdc.DeltaStore.read(spark, cfg.tablesBase, rel, cfg.simpleStreams)
      case None =>
        SnapshotWriter.recover(spark, cfg.tablesBase, name)
        spark.read.parquet(SnapshotWriter.livePath(cfg.tablesBase, name))
    }
}
