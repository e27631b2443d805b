package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.cdc._

/** Raised when the incoming relation schema deviates from the cached one —
  * the analogue of the reference's `ErrRelationChanged`
  * (sync/stream/stream.go:13, message_accumulator.go:118-122). The
  * supervisor reacts with a full resync, as the reference drops the
  * replication slot and re-snapshots (sync/service/sync_service.go:95-110).
  */
final class SchemaChangedException(msg: String) extends RuntimeException(msg)

object SchemaChangedException {
  /** One pass over a changelog that yields BOTH the touched-table set and
    * the relation-DRIFT guard shared by the parquet and jdbc merge paths:
    * an action carrying a column (values/keyBefore/nulls/unchanged) the
    * configured relation does not know means the source schema moved
    * under us without a resync — e.g. the pump's schema-change signal was
    * lost to a crash at exactly the DDL boundary and the reconnect's
    * fresh decoder accepted the new schema silently. Merging would
    * silently DROP the unknown column's values, so raise the resync
    * signal instead. The "" sentinel keeps tables whose actions carry no
    * columns (bare deletes) in the touched set; distinct (table, column)
    * pairs are relation-schema-sized, so the collect is tiny.
    *
    * @param colsByTable configured table → known column names
    * @return touched table names, sorted
    * @throws SchemaChangedException on drift */
  def touchedTablesCheckingDrift(actions: org.apache.spark.sql.Dataset[graft.cdc.ChangeAction],
      colsByTable: Map[String, Set[String]]): Seq[String] = {
    import actions.sparkSession.implicits._
    val streamCols = actions
      .flatMap(a => Iterator.single((a.table, "")) ++
        (a.values.keysIterator ++ a.keyBefore.keysIterator ++
          a.nulls.iterator ++ a.unchanged.iterator).map((a.table, _)))
      .distinct().collect()
    val unknownCols = streamCols.filter { case (t, c) =>
      c.nonEmpty && colsByTable.get(t).exists(!_.contains(c))
    }
    if (unknownCols.nonEmpty)
      throw new SchemaChangedException(
        "stream carries columns unknown to the configured relation " +
          s"(schema changed at the source?): ${unknownCols.sorted.take(8).mkString(", ")}")
    streamCols.map(_._1).distinct.sorted.toSeq
  }
}

/** Micro-batched continuous synchronization — the engine's re-expression of
  * the reference's streaming loop (sync/stream/stream.go): accumulate
  * transactions, flush a batch every `batchtimeout`/`batchmaxitems`, write
  * the batch transactionally to the target, acknowledge the applied LSN.
  *
  * Structured-Streaming mapping:
  *   - batch timeout        → `Trigger.ProcessingTime`
  *   - batch max items      → source admission control
  *     (`maxFilesPerTrigger` / `maxOffsetsPerTrigger` on the source)
  *   - apply + acknowledge  → `foreachBatch` { compact → merge → publish }
  *     + the streaming checkpoint; a [[CommitLog]] records the last applied
  *     (batchId, maxLsn) so replayed batches after a crash are skipped —
  *     at-least-once delivery + idempotent apply ≡ effectively exactly-once,
  *     the same contract the reference gets from MERGE + LSN acknowledge.
  *   - one-Snowflake-transaction-per-batch (snowflake_target.go:283-340)
  *     → all tables' new snapshots are staged as scratch dirs first, then
  *     published (renamed) together after every merge succeeded.
  */
/** @param simpleStreams set true when the source emits full-row images
  *        with no TOAST-unchanged columns and no identity-changing updates
  *        (REPLICA IDENTITY FULL / Debezium-style feeds): per-batch
  *        compaction then uses the columnar fast path
  *        ([[ChangelogCompactor.compactSimple]]) — one codegen'd
  *        aggregation instead of a typed fold. */
/** @param deltaStore write-optimized regime ([[graft.cdc.DeltaStore]]):
  *        append each batch's RAW watermark-cut actions as a delta inside
  *        the table dir — never per-batch-compacted ones: compaction is
  *        not closed under composition (see DeltaStore.scala's invariant
  *        note) — O(batch) apply, independent of table size — and
  *        fold into the base only past `deltaCompactRows` accumulated
  *        rows / `deltaCompactFiles` deltas. Raises the single-process
  *        apply ceiling the rate ladder pinned on the full-rewrite path
  *        (whose per-batch cost scales with TABLE size). Plain parquet
  *        readers of the live dir see the base alone; read current state
  *        through [[graft.cdc.DeltaStore.read]] (the GraftSync facade
  *        does). */
final class StreamingMerge(
    spark: SparkSession,
    tablesBase: String,
    relations: Seq[Relation],
    commitLogPath: String,
    simpleStreams: Boolean = false,
    deltaStore: Boolean = false,
    deltaCompactRows: Long = 100000L,
    deltaCompactFiles: Int = 64,
    // per-batch staging concurrency (1 ⇒ serial, the pre-r15 behavior);
    // bounded: each staged table is itself a multi-core Spark job, so the
    // pool caps DRIVER-side concurrency, not task parallelism
    stagingThreads: Int = 8) extends Serializable {

  // WalMessage/ChangeAction carry the UNQUALIFIED table name (the wire
  // decoder drops the namespace), so two same-named tables in different
  // schemas are indistinguishable in the stream — keying them silently
  // (toMap keeps the last) would merge one schema's changes into the
  // other's snapshot. Refuse loudly at construction instead.
  require(relations.map(_.table).distinct.size == relations.size,
    "relations with the same table name in different schemas cannot be " +
      "distinguished in the change stream: " +
      relations.groupBy(_.table).collect { case (t, rs) if rs.size > 1 =>
        rs.map(_.qualifiedName).mkString(" vs ") }.mkString("; ") +
      " — sync them as separate services or rename")
  private val relByTable = relations.map(r => r.table -> r).toMap
  private val colsByTable = relations.map(r => r.table -> r.columnNames.toSet).toMap
  @transient lazy val commitLog = new CommitLog(spark, commitLogPath)

  /** Per-table work inside one batch runs CONCURRENTLY (bounded pool):
    * each table's staged merge (or delta append) touches only its own
    * scratch/live/marker paths and Spark's driver accepts jobs from many
    * threads, so an N-table batch costs ≈ the slowest table instead of
    * the sum — the multi-table soak measured the serial form at 8 tables
    * applying 2.7× slower than 1 table on the same stream
    * (multitable_soak_receipt.json). The PUBLISH stays serial and
    * ordered after every stage succeeded, preserving the one-batch-one-
    * visibility-unit contract.
    *
    * Failure discipline: every table's work runs under ONE fresh job
    * group (thread-local, so set inside each worker), and the FIRST
    * failure cancels the group — `interruptOnCancel = true` reaches jobs
    * already running, `cancelJobGroupAndFutureJobs` covers siblings that
    * have not submitted yet. Crucially the call then AWAITS every future
    * (lifted to Try) before rethrowing: a fail-fast that merely
    * interrupted awaiting pool threads would leave the interrupted
    * thread's already-submitted Spark job running in the background —
    * an orphaned writer still committing task files into
    * `$table/__scratch` while the supervisor's replay deletes and
    * rewrites that same path, a mixed-parts scratch that could gain
    * _SUCCESS and be published. On the table-failure path no thread
    * outlives the method, so no scratch writer outlives the batch; when
    * the BARRIER itself is aborted from outside (query stop, supervisor
    * restart, checkpoint rotation — the await thread is interrupted and
    * cannot keep waiting), the whole job group is cancelled before
    * propagating, so staging jobs die even though q.stop()'s own
    * runId-group cancel cannot reach them (the workers re-grouped). The
    * rethrow is the chronologically FIRST failure (the root cause), not
    * a sibling's cancellation artifact. Serial-order pool size is a
    * config knob via `stagingThreads` (1 ⇒ serial staging, the pre-r15
    * behavior). */
  private[streaming] def eachTableConcurrently[A](tables: Seq[String])(f: String => A): Seq[A] =
    if (tables.size <= 1 || stagingThreads <= 1) tables.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(tables.size, stagingThreads))
      val sc = spark.sparkContext
      val groupId = s"graft-batch-${java.util.UUID.randomUUID()}"
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.util.{Failure, Success, Try}
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val firstFailure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
        // Each future's value is a Try computed by catching ALL
        // throwables in the worker itself: a plain Future(f(t)) completes
        // its promise only for NonFatal, so a fatal error (OOM,
        // StackOverflow) in one table would leave its promise forever
        // incomplete and hang the barrier below with an error already in
        // hand. The first-failure CAS also runs in the failing worker —
        // at failure time, not on a later callback — so the rethrown
        // error is the chronologically first one the pool observed.
        val futures = tables.map { t =>
          Future {
            sc.setJobGroup(groupId, s"graft batch: stage $t", interruptOnCancel = true)
            val r = try Success(f(t))
              catch { case e: Throwable => Failure(e) }
              finally sc.clearJobGroup()
            r.failed.foreach { e =>
              if (firstFailure.compareAndSet(null, e))
                sc.cancelJobGroupAndFutureJobs(groupId)
            }
            r
          }
        }
        // barrier: completes only when EVERY sibling has finished
        // (successfully, failed, or cancelled)
        val results: Seq[Try[A]] =
          try Await.result(Future.sequence(futures),
            scala.concurrent.duration.Duration.Inf)
          catch {
            case e: Throwable =>
              // the BARRIER itself was aborted — an external interrupt
              // (query stop, supervisor restart, checkpoint rotation
              // stopping the stream mid-batch), not a table failure.
              // Workers run in the batch's own job group, DETACHED from
              // the stream's runId group, so q.stop()'s cancel does not
              // reach them and we cannot await them here (the interrupt
              // demands prompt return): cancel the whole group so no
              // staging job outlives the batch, then propagate. The
              // group cancel kills Spark JOBS but not the pool threads
              // driving them — driver-side IO in a worker (applied-marker
              // write, delta tmp rename) could otherwise outlive the
              // batch and race the replay over the same paths, so
              // interrupt the workers too (shutdownNow); the awaited
              // paths below keep plain shutdown() since their workers
              // are already done.
              sc.cancelJobGroupAndFutureJobs(groupId)
              pool.shutdownNow()
              throw e
          }
        Option(firstFailure.get()).foreach(e => throw e)
        results.map { case Success(a) => a; case Failure(e) => throw e }
      } finally { pool.shutdown(); () }
    }

  /** Apply one batch of change actions to the table store. Public so tests
    * and batch backfills drive the exact code `foreachBatch` runs.
    *
    * Replay protection is LSN-based, as in the reference (the applied LSN
    * is acknowledged, not a batch counter): a batch whose max LSN is at or
    * below the committed watermark was already applied — batch ids restart
    * from zero when a stream is restarted from a fresh checkpoint, so they
    * cannot carry idempotence across restarts. */
  def applyBatch(batch0: Dataset[ChangeAction], batchId: Long): Unit = {
    // the batch is scanned several times below (table set, watermark cut,
    // ack max, compaction input) — pin it so a file-source batch isn't
    // re-read from JSON per pass
    val batch = batch0.persist()
    try applyBatchPinned(batch, batchId) finally { batch.unpersist(); () }
  }

  private def applyBatchPinned(batch: Dataset[ChangeAction], batchId: Long): Unit = {
    import batch.sparkSession.implicits._
    // ---- at-least-once replay protection, BEFORE compaction ----
    // The compactor's folds (insert-then-delete elision, rekey chains
    // keyed at their ORIGIN identity) are valid only for all-or-nothing
    // application. A batch REPLAYED after a lost checkpoint can span
    // several originally-applied batches: folding an already-applied
    // prefix into the same compaction then loses work — an I..D pair
    // whose I was applied elides, leaving the row resurrected; a rekey
    // chain whose first hop was applied compacts to the origin key and
    // misses the row at its intermediate identity (the soak harness
    // caught both). The reference never faces this because resumption is
    // LSN-truncated at the source (WAL re-reads from the acknowledged
    // position); we restore the same invariant here: drop everything at
    // or below the applied watermark BEFORE folding. Commit LSNs are
    // per-transaction, so the cut never splits a transaction.
    // PER-TABLE watermark: the global commit log, raised by any table
    // whose published snapshot carries a NEWER applied marker (a crash
    // between the multi-table publish and the commit-log write leaves
    // exactly that state — the marker travels inside the atomic swap, so
    // data and watermark advance together and the replayed batch is cut
    // per table: dropped for tables that published, applied for tables
    // that did not).
    val logLsn = commitLog.lastLsn.getOrElse(Long.MinValue)
    // only relations actually PRESENT in this batch pay the
    // recover + marker-read filesystem round-trips — on an object-store
    // tablesBase with many configured relations, running them for every
    // relation on every micro-batch is pure fixed latency (tables the
    // batch never touches can't need their watermark, and their
    // half-swapped publishes, if any, are recovered when they next appear
    // in a batch or at read time)
    val batchTables = batch.select("table").distinct().as[String].collect().toSet
    val tableWm: Map[String, Long] = relations.filter(r => batchTables(r.table)).map { r =>
      // recover FIRST: the marker of a half-swapped publish lives in
      // whichever dir recovery promotes
      SnapshotWriter.recover(spark, tablesBase, r.table)
      r.table -> math.max(logLsn,
        SnapshotWriter.readAppliedMarker(spark, tablesBase, r.table)
          .getOrElse(Long.MinValue))
    }.toMap
    val wmExpr = tableWm.foldLeft(org.apache.spark.sql.functions.lit(logLsn)) {
      case (acc, (t, wm)) =>
        org.apache.spark.sql.functions.when(batch("table") === t, wm).otherwise(acc)
    }
    // Exact-duplicate dedup by WAL position for redelivered transactions
    // ABOVE the watermark (a cross-process pump restart can re-spool the
    // applied..spooled window): two actions sharing (table, lsn, seq) ARE
    // the same action, and two copies in one fold are an impossible
    // (I,I)/(D,D) per-key sequence the compactor correctly refuses.
    // Columnar predicates, not typed lambdas: the replayed super-batch is
    // spool-sized and should prune in the scan.
    val fresh = batch.filter(batch("lsn") > wmExpr)
      .dropDuplicates("table", "lsn", "seq")
    // The ACK position must cover every fresh action, not just compaction
    // SURVIVORS: a queue-style batch whose rows insert-and-delete within
    // the batch compacts to NOTHING, and acknowledging only surviving
    // lsns would freeze the watermark — and with it the replication
    // slot's WAL retention — forever.
    val freshMaxRow = fresh.agg(org.apache.spark.sql.functions.max("lsn")).head()
    if (freshMaxRow.isNullAt(0)) return // nothing new in this batch
    val ackLsn = math.max(logLsn, freshMaxRow.getLong(0))
    // Delta mode works on the RAW cut batch, not the compacted one:
    // compaction is NOT closed under composition — a folded rekey action
    // carries the LSN of its LAST component, so re-folding two batches'
    // compacted outputs can interleave rekey chains of DIFFERENT rows
    // (raw `29: k1→k2, 30: k4→k1` folds batch-locally to actions whose
    // LSN order puts k4→k1 FIRST, and the re-fold then chains k4 through
    // a k1 that belonged to another row — DeltaStoreSpec's property gate
    // caught exactly this). Raw actions across batches are precisely the
    // replayed-super-batch shape whose single fold is already proven, so
    // deltas store raw and the fold happens once, at read/compaction.
    val working = (if (deltaStore) fresh
                   else if (simpleStreams) ChangelogCompactor.compactSimple(fresh)
                   else ChangelogCompactor.compact(fresh)).cache()
    try {
      val touched =
        SchemaChangedException.touchedTablesCheckingDrift(working, colsByTable)
      if (touched.isEmpty) {
        // everything elided in-batch: still acknowledge the consumed WAL
        commitLog.commit(batchId, ackLsn)
        return
      }
      if (deltaStore) {
        // O(batch) apply: append, fold only past the threshold. Same
        // per-table marker contract as the staged path (a crash between
        // tables replays per table under the watermark cut above).
        eachTableConcurrently(touched) { table =>
          val rel = relByTable.getOrElse(table,
            throw new SchemaChangedException(s"unknown relation in stream: $table"))
          val acts = working.filter(working("table") === table)
          val fs = new Path(tablesBase).getFileSystem(spark.sparkContext.hadoopConfiguration)
          val live = SnapshotWriter.livePath(tablesBase, table)
          if (!fs.exists(new Path(live, "_SUCCESS"))) {
            // no base yet (direct streaming starts without a backfill):
            // publish this batch as the base so the live dir is a valid
            // parquet dir for plain readers and schema checks
            val empty = spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rel.toStructType)
            val folded = if (simpleStreams) ChangelogCompactor.compactSimple(acts)
                         else ChangelogCompactor.compact(acts)
            val scratch = SnapshotWriter.scratchPath(tablesBase, table)
            MergeInto(empty, folded, rel).write.mode("overwrite").parquet(scratch)
            SnapshotWriter.writeAppliedMarker(spark, scratch, ackLsn)
            SnapshotWriter.swapLive(spark, tablesBase, table)
          } else {
            DeltaStore.append(acts, tablesBase, table, ackLsn)
            val deltas = DeltaStore.listDeltas(spark, tablesBase, table)
            if (deltas.map(_._3).sum > deltaCompactRows ||
                deltas.size > deltaCompactFiles)
              DeltaStore.compact(spark, tablesBase, rel, simpleStreams)
          }
        }
        commitLog.commit(batchId, ackLsn)
        return
      }
      val compacted = working
      // stage every table first (concurrently — see eachTableConcurrently) …
      val staged = eachTableConcurrently(touched) { table =>
        val rel = relByTable.getOrElse(table,
          throw new SchemaChangedException(s"unknown relation in stream: $table"))
        // (recover already ran in the watermark pass above)
        // Snapshot side goes through DeltaStore.read, NOT a plain parquet
        // read of the live dir: a prior deltaStore=true run may have left
        // pending `_delta` dirs (underscore paths are invisible to plain
        // parquet readers), and swapLive below removes the WHOLE old live
        // dir — reading the base alone would silently drop those already-
        // acknowledged deltas forever on a deltaStore=false config flip.
        // Folding them here makes the swap's removal legitimate: their
        // effect rides the staged snapshot. (With no deltas present this
        // is exactly the old base-only read.)
        val snapshot: DataFrame =
          DeltaStore.read(spark, tablesBase, rel, simpleStreams)
        val merged = MergeInto(snapshot, compacted, rel)
        val scratch = SnapshotWriter.scratchPath(tablesBase, table)
        merged.write.mode("overwrite").parquet(scratch)
        // the applied marker rides the atomic swap with the data
        SnapshotWriter.writeAppliedMarker(spark, scratch, ackLsn)
        table
      }
      // … then publish together: the multi-table batch becomes visible as a
      // unit, mirroring the reference's one-transaction-per-batch.
      staged.foreach { table =>
        SnapshotWriter.swapLive(spark, tablesBase, table)
      }
      commitLog.commit(batchId, ackLsn) // ≙ StandbyStatusUpdate acknowledge
    } finally working.unpersist()
  }

  /** Wire a change-action stream into the merge pipeline. */
  def writer(stream: Dataset[ChangeAction], trigger: Trigger): DataStreamWriter[ChangeAction] =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$commitLogPath/checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[ChangeAction], batchId: Long) =>
        applyBatch(batch, batchId)
      }

  def start(stream: Dataset[ChangeAction],
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    writer(stream, trigger).start()
}

/** Durable record of the last applied batch and LSN — the analogue of the
  * reference acknowledging the flushed LSN back to the replication slot
  * (stream.go `SendStandbyStatusUpdate`), giving restart-resume and replay
  * idempotence. One tiny JSON file, rewritten atomically per batch. */
final class CommitLog(spark: SparkSession, path: String) extends Serializable {
  private val file = new Path(path, "applied.json")
  private def fs = file.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def lastBatchId: Option[Long] = read.map(_._1)
  def lastLsn: Option[Long] = read.map(_._2)

  private def read: Option[(Long, Long)] = {
    // concurrent-overwrite hazards of the HADOOP rename path (non-file
    // schemes; the local path writes via java.nio ATOMIC_MOVE and has
    // neither): OVERWRITE rename is delete-then-rename, so a reader can
    // catch the file MISSING (FileNotFound after a true exists()); and
    // ChecksumFs renames data THEN the .crc sidecar, so a reader between
    // the two verifies fresh data against the stale sidecar. Both windows
    // are microseconds — retry briefly; a failure that PERSISTS is real
    // corruption/deletion and must still surface.
    var attempts = 0
    while (true) {
      try return readOnce
      catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.FileNotFoundException) =>
          attempts += 1
          if (attempts >= 5) throw e
          Thread.sleep(20L * attempts)
      }
    }
    None // unreachable
  }

  private def readOnce: Option[(Long, Long)] =
    if (!fs.exists(file)) None
    else {
      val in = fs.open(file)
      val s = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      // batchId -1 is the backfill SEED (GraftSync.seedAppliedLsn: the
      // applied position starts at the snapshot's consistent point)
      val m = """\{"batchId":(-?\d+),"maxLsn":(-?\d+)\}""".r
      s.trim match {
        case m(b, l) => Some((b.toLong, l.toLong))
        case _       => None
      }
    }

  def commit(batchId: Long, maxLsn: Long): Unit = {
    val record = s"""{"batchId":$batchId,"maxLsn":$maxLsn}"""
    val scheme = file.toUri.getScheme
    if (scheme == null || scheme == "file") {
      // LOCAL fs: bypass Hadoop entirely. Its OVERWRITE rename is
      // delete-then-rename (a concurrent reader can catch the watermark
      // file MISSING — which reads as "no commits yet", a silently
      // collapsed watermark) and its ChecksumFs renames the .crc sidecar
      // in a SECOND step (the reader between the two dies with
      // ChecksumException — a chaos soak caught exactly this killing the
      // run). java.nio ATOMIC_MOVE has neither window, and writing the
      // tmp outside Hadoop leaves no sidecar at all.
      val dir = java.nio.file.Paths.get(
        if (scheme == null) new Path(path).toString else new Path(path).toUri.getPath)
      java.nio.file.Files.createDirectories(dir)
      // clear a sidecar left by a pre-nio writer generation of this log —
      // it would fail every checksummed read of the new (nio-written) data
      java.nio.file.Files.deleteIfExists(dir.resolve(".applied.json.crc"))
      val tmp = dir.resolve("applied.json.tmp")
      java.nio.file.Files.write(tmp, record.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, dir.resolve("applied.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new Path(path, s"applied.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(record.getBytes("UTF-8")) finally out.close()
      // atomic overwrite-rename: the delete-then-rename form has a crash
      // window where the watermark is GONE (every batch since stream start
      // would replay), and FileSystem.rename returns false instead of
      // throwing on failure — FileContext does both correctly (readers
      // absorb its transient visibility windows, see `read`)
      org.apache.hadoop.fs.FileContext.getFileContext(
          file.toUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, file, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      ()
    }
  }
}
