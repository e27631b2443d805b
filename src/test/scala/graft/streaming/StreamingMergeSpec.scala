package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.TestSpark
import graft.cdc._

class StreamingMergeSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rel = Relation("public", "items", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("name", PgTypes.TextOid)))
  private val rel2 = Relation("public", "tags", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("tag", PgTypes.TextOid)))

  private def action(table: String, lsn: Long, op: String, id: Long, v: String = null) =
    ChangeAction(table, lsn, 0, op, Map("id" -> id.toString),
      if (op == "D") Map.empty
      else Map("id" -> id.toString,
        (if (table == "items") "name" else "tag") -> v),
      Nil, Nil, rekey = false)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-stream").toString

  private def tableRows(base: String, table: String): Set[(Long, String)] =
    spark.read.parquet(SnapshotWriter.livePath(base, table))
      .as[(Long, String)].collect().toSet

  test("micro-batches merge into the table store via MemoryStream") {
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel, rel2), s"$base/_log")
    val mem = MemoryStream[ChangeAction]
    mem.addData(
      action("items", 1, "I", 1, "a"),
      action("items", 2, "I", 2, "b"),
      action("tags", 3, "I", 10, "t1"))
    val q = sm.start(mem.toDS(), Trigger.AvailableNow())
    q.awaitTermination(60000)
    tableRows(base, "items") shouldBe Set((1L, "a"), (2L, "b"))
    tableRows(base, "tags") shouldBe Set((10L, "t1"))

    // second run: updates, deletes, cross-table, compaction inside batch
    mem.addData(
      action("items", 4, "U", 1, "a2"),
      action("items", 5, "D", 2),
      action("items", 6, "I", 3, "c-stale"),
      action("items", 7, "U", 3, "c"),
      action("tags", 8, "U", 10, "t2"))
    val q2 = sm.start(mem.toDS(), Trigger.AvailableNow())
    q2.awaitTermination(60000)
    tableRows(base, "items") shouldBe Set((1L, "a2"), (3L, "c"))
    tableRows(base, "tags") shouldBe Set((10L, "t2"))
  }

  test("merge after a crash inside the publish window loses no rows") {
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log")
    sm.applyBatch(Seq(
      action("items", 1, "I", 1, "a"),
      action("items", 2, "I", 2, "b"),
      action("items", 3, "I", 3, "c")).toDS(), 0L)
    // simulate the crash: batch 1 staged its scratch, renamed live → trash,
    // then died before scratch → live (live dir MISSING at restart)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(SnapshotWriter.livePath(base, "items"))
      .write.parquet(SnapshotWriter.scratchPath(base, "items"))
    fs.rename(new org.apache.hadoop.fs.Path(SnapshotWriter.livePath(base, "items")),
      new org.apache.hadoop.fs.Path(SnapshotWriter.trashPath(base, "items")))

    // restart: the replayed batch must see the full recovered snapshot,
    // not an empty table
    sm.applyBatch(Seq(action("items", 4, "U", 1, "a2")).toDS(), 1L)
    tableRows(base, "items") shouldBe Set((1L, "a2"), (2L, "b"), (3L, "c"))
  }

  test("replayed batch ids are skipped (idempotent apply + LSN commit log)") {
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log")
    sm.applyBatch(Seq(action("items", 5, "I", 1, "a")).toDS(), batchId = 0)
    sm.commitLog.lastLsn shouldBe Some(5L)
    // crash-replay of batch 0 with the same data must not double-apply
    sm.applyBatch(Seq(action("items", 5, "I", 1, "a")).toDS(), batchId = 0)
    tableRows(base, "items") shouldBe Set((1L, "a"))
    // next batch applies
    sm.applyBatch(Seq(action("items", 9, "U", 1, "b")).toDS(), batchId = 1)
    tableRows(base, "items") shouldBe Set((1L, "b"))
    sm.commitLog.lastBatchId shouldBe Some(1L)
    sm.commitLog.lastLsn shouldBe Some(9L)
  }

  test("replayed super-batch spanning the watermark converges (no resurrection)") {
    // After a lost streaming checkpoint the whole spool re-reads as one
    // big batch that SPANS several originally-applied batches. Folding the
    // already-applied prefix into the same compaction loses work: an I..D
    // pair whose I was applied elides (row resurrected), and a rekey chain
    // whose first hop was applied compacts to its ORIGIN key and strands
    // the row at its intermediate identity. The watermark LSN-truncates
    // the batch BEFORE the fold, restoring the reference's
    // resume-from-acknowledged-position invariant.
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log")
    val rekeyHop = ChangeAction("items", 20, 0, "U", Map("id" -> "1"),
      Map("id" -> "2", "name" -> "a2"), Nil, Nil, rekey = true)
    // batch 0: insert 1, insert 5, rekey 1 -> 2 (applied, watermark 20)
    sm.applyBatch(Seq(
      action("items", 10, "I", 1, "a"),
      action("items", 15, "I", 5, "e"),
      rekeyHop).toDS(), batchId = 0)
    tableRows(base, "items") shouldBe Set((2L, "a2"), (5L, "e"))
    // replayed super-batch: the FULL history again, now also carrying the
    // delete of 2 and the delete of 5 (lsns past the watermark)
    sm.applyBatch(Seq(
      action("items", 10, "I", 1, "a"),
      action("items", 15, "I", 5, "e"),
      rekeyHop,
      action("items", 30, "D", 2),
      action("items", 35, "D", 5)).toDS(), batchId = 0)
    // pre-fix, the I(5)+D(5) pair elided (5 resurrected) and the chain
    // I(1)+rekey+D(2) folded to an unmatched D(1) (2 survived)
    tableRows(base, "items") shouldBe Set.empty
  }

  test("queue-style batch that compacts to nothing still advances the watermark") {
    // every row inserted AND deleted within the batch: compaction elides
    // everything, but the consumed WAL must still be acknowledged — a
    // frozen watermark freezes the replication slot's WAL retention and
    // (pre-fix) replayed the whole spool on every restart
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log")
    sm.applyBatch(Seq(action("items", 5, "I", 1, "a")).toDS(), batchId = 0)
    sm.commitLog.lastLsn shouldBe Some(5L)
    sm.applyBatch(Seq(
      action("items", 10, "I", 9, "q"),
      action("items", 20, "D", 9)).toDS(), batchId = 1)
    sm.commitLog.lastLsn shouldBe Some(20L) // pre-fix: stuck at 5
    tableRows(base, "items") shouldBe Set((1L, "a"))
  }

  test("torn publish window: replay after the commit-log write was lost converges") {
    // The worst crash point: every table PUBLISHED but the commit-log
    // write never happened. Key-addressed re-merge alone cannot make the
    // replay safe when the batch contains dead-identity REUSE — the
    // per-table applied marker (published atomically WITH the data)
    // supplies the watermark the log lost.
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log")
    sm.applyBatch(Seq(action("items", 5, "I", 1, "a")).toDS(), batchId = 0)
    // batch 1: rekey 1 -> 2 AND a fresh insert reusing identity 1, plus a
    // delete-then-rekey-in pair on 5/6 — the two reuse shapes that
    // double-apply or lose rows under naive replay
    val reuse = Seq(
      ChangeAction("items", 10, 0, "U", Map("id" -> "1"),
        Map("id" -> "2", "name" -> "moved"), Nil, Nil, rekey = true),
      action("items", 11, "I", 1, "fresh"))
    sm.applyBatch(reuse.toDS(), batchId = 1)
    tableRows(base, "items") shouldBe Set((2L, "moved"), (1L, "fresh"))
    // simulate the torn window: the publish survived (markers inside the
    // table dirs), the commit-log write was lost
    sm.commitLog.commit(0, 5L)
    // replay batch 1 wholesale (fresh checkpoint re-reads everything)
    sm.applyBatch(reuse.toDS(), batchId = 0)
    // pre-fix: the replayed rekey matched the re-inserted id=1 row and
    // moved it to 2 again — duplicate identity 2, and id=1 lost
    tableRows(base, "items") shouldBe Set((2L, "moved"), (1L, "fresh"))
  }

  test("simpleStreams fast path produces the same merged state") {
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log", simpleStreams = true)
    sm.applyBatch(Seq(
      action("items", 1, "I", 1, "a"),
      action("items", 2, "U", 1, "a2"),
      action("items", 3, "I", 2, "b"),
      action("items", 4, "D", 2)).toDS(), batchId = 0)
    tableRows(base, "items") shouldBe Set((1L, "a2"))
  }

  test("unknown relation in the stream raises SchemaChangedException") {
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log")
    a[SchemaChangedException] should be thrownBy
      sm.applyBatch(Seq(action("tags", 1, "I", 1, "x")).toDS(), batchId = 0)
  }

  test("relation drift in the stream raises SchemaChangedException (unknown column)") {
    // the source schema moved without a resync (the pump's signal can be
    // lost to a crash at exactly the DDL boundary): an action carrying a
    // column the configured relation doesn't know must raise, not merge —
    // merging would silently drop the new column's values forever
    val base = tmp()
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log")
    val drifted = ChangeAction("items", 1, 0, "I", Map("id" -> "1"),
      Map("id" -> "1", "name" -> "a", "note" -> "added-by-ddl"),
      Nil, Nil, rekey = false)
    val ex = intercept[SchemaChangedException] {
      sm.applyBatch(Seq(drifted).toDS(), batchId = 0)
    }
    ex.getMessage should include("note")
    // an explicitly-NULLed unknown column is the same drift signal
    val driftedNull = ChangeAction("items", 2, 0, "U", Map("id" -> "1"),
      Map("id" -> "1", "name" -> "a"), Seq("note"), Nil, rekey = false)
    intercept[SchemaChangedException] {
      sm.applyBatch(Seq(driftedNull).toDS(), batchId = 1)
    }
  }

  test("supervisor restarts on failure and resyncs on schema change") {
    var runs = 0
    var resyncs = 0
    val r = Supervisor.runForever(
      body = () => {
        runs += 1
        if (runs == 1) throw new RuntimeException("transient")
        if (runs == 2) throw new SchemaChangedException("relation changed")
        // third run succeeds
      },
      resync = () => resyncs += 1,
      backoffMs = 1L)
    runs shouldBe 3
    r.restarts shouldBe 2
    r.resyncs shouldBe 1
    resyncs shouldBe 1
  }

  test("supervisor gives up after maxRestarts consecutive failures") {
    val ex = intercept[IllegalStateException] {
      Supervisor.runForever(
        body = () => throw new RuntimeException("always"),
        maxRestarts = 2, backoffMs = 1L)
    }
    // the give-up carries the last underlying failure as its cause: that
    // exception is what an operator actually needs to see
    ex.getCause should not be null
    ex.getCause.getMessage shouldBe "always"
  }

  test("supervisor retries a transiently-failing resync with backoff") {
    // a resync can race the dying stream's task flush (checkpoint delete
    // fails) — the supervisor must retry the resync, not run the body
    // against half-torn-down state or abort supervision
    var runs = 0
    var resyncAttempts = 0
    val r = Supervisor.runForever(
      body = () => {
        runs += 1
        if (runs == 1) throw new SchemaChangedException("relation changed")
      },
      resync = () => {
        resyncAttempts += 1
        if (resyncAttempts < 3) throw new IllegalStateException("checkpoint still exists")
      },
      backoffMs = 1L)
    resyncAttempts shouldBe 3 // two transient failures, then success
    runs shouldBe 2
    r.resyncs shouldBe 1 // one logical resync, retried internally
  }

  test("supervisor gives up on a permanently-failing resync") {
    val ex = intercept[IllegalStateException] {
      Supervisor.runForever(
        body = () => throw new SchemaChangedException("relation changed"),
        resync = () => throw new IllegalStateException("checkpoint still exists"),
        maxRestarts = 2, backoffMs = 1L)
    }
    ex.getMessage should include("resync failed")
    ex.getCause.getMessage should include("checkpoint still exists")
  }

  test("supervisor bounds a non-converging resync loop") {
    var resyncs = 0
    val ex = intercept[IllegalStateException] {
      Supervisor.runForever(
        body = () => throw new SchemaChangedException("keeps flapping"),
        resync = () => resyncs += 1,
        maxResyncs = 2, backoffMs = 1L)
    }
    ex.getMessage should include("did not converge")
    resyncs shouldBe 2 // third schema change trips the bound before resyncing
  }

  test("supervisor treats StopRequested as a clean exit, not a failure") {
    // cooperative shutdown (operator signal, deployment drain): the body
    // finishes its close handshake then throws StopRequested — the loop
    // must end NORMALLY with no restart, no backoff, no resync, mirroring
    // the reference's Stop being a clean exit rather than a crash
    var runs = 0
    var resyncs = 0
    val r = Supervisor.runForever(
      body = () => { runs += 1; throw new Supervisor.StopRequested },
      resync = () => resyncs += 1,
      backoffMs = 1L)
    runs shouldBe 1
    resyncs shouldBe 0
    r.restarts shouldBe 0
    r.resyncs shouldBe 0
  }

  test("supervisor progress resets the consecutive-failure budget") {
    // restart-INTENSITY semantics: only rapid crash loops trip
    // maxRestarts — a body that ran long enough before failing counts as
    // progress and resets the consecutive counter, so a service that
    // fails once an hour for a week restarts forever instead of dying on
    // the (maxRestarts+1)th lifetime failure. progressMs=0 makes every
    // run count as progress; 5 failures in a row then exceed a
    // maxRestarts=2 budget that would have tripped on the 3rd without
    // the reset.
    var runs = 0
    val r = Supervisor.runForever(
      body = () => { runs += 1; if (runs <= 5) throw new RuntimeException(s"fail $runs") },
      maxRestarts = 2, backoffMs = 1L, progressMs = 0L)
    runs shouldBe 6
    r.restarts shouldBe 5
  }

  test("same-named tables across schemas are refused at construction") {
    // WalMessage carries the unqualified name: keying public.users and
    // audit.users silently would merge one schema's changes into the
    // other's snapshot — the constructor must refuse instead
    val a = Relation("public", "users", Seq(RelColumn("id", PgTypes.Int8Oid, isIdentity = true)))
    val b = Relation("audit", "users", Seq(RelColumn("id", PgTypes.Int8Oid, isIdentity = true)))
    val e = intercept[IllegalArgumentException] {
      new StreamingMerge(spark, tmp(), Seq(a, b), tmp())
    }
    e.getMessage should include("public.users")
    e.getMessage should include("audit.users")
  }

  test("commit log survives an overwrite-rename cycle and rejects malformed LSNs upstream") {
    val log = new CommitLog(spark, tmp())
    log.lastLsn shouldBe None
    log.commit(1, 100L)
    (log.lastBatchId, log.lastLsn) shouldBe ((Some(1L), Some(100L)))
    log.commit(2, 200L) // second commit exercises the OVERWRITE rename path
    (log.lastBatchId, log.lastLsn) shouldBe ((Some(2L), Some(200L)))
  }

  test("commit log read is safe against a concurrent overwrite-rename (crc race)") {
    // the local ChecksumFs renames the data file THEN its .crc sidecar —
    // a reader between the two verifies new data against the stale
    // sidecar and (pre-fix) threw ChecksumException. The production
    // shape: the pump's appliedLsn() polls lastLsn while the merge
    // commits every batch. A chaos soak caught this killing the run.
    val log = new CommitLog(spark, tmp())
    log.commit(0, 0L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val reader = new Thread(() => {
      try while (!stop.get()) { log.lastLsn; () }
      catch { case t: Throwable => failure.set(t) }
    })
    reader.start()
    val deadline = System.nanoTime() + 2L * 1000000000L
    var i = 1L
    while (System.nanoTime() < deadline && failure.get() == null) {
      log.commit(i, i * 10); i += 1
    }
    stop.set(true)
    reader.join(5000)
    failure.get() shouldBe null
    log.lastLsn shouldBe Some((i - 1) * 10)
  }
}
