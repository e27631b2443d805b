package graft.streaming

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.cdc._

/** Spool retention (`cleanSource=delete`, the production default wired by
  * Main.run from `sync.spoolretention`): the file source must retire each
  * spool file once its batch is COMMITTED — keeping the spool directory
  * (and with it the source's per-trigger listing) bounded on a weeks-long
  * run — while NEVER losing a row: a file is deleted only after its whole
  * batch was applied and checkpoint-committed, and nothing unread is ever
  * touched. Both halves pinned here against the real streaming pipeline
  * (WalSpool plain-IO writer → file source → StatefulAssembler →
  * StreamingMerge), the exact production read path. */
final class SpoolRetentionSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  private val rel = Relation("public", "items", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("name", PgTypes.TextOid)))

  private def insertTxn(xid: Long, commitLsn: Long, ids: Seq[Long]): Seq[WalMessage] =
    ids.zipWithIndex.map { case (id, i) =>
      WalMessage(xid, i, "INSERT", 0L, "items",
        Map("id" -> id.toString),
        Map("id" -> id.toString, "name" -> s"n$id"), Nil, Nil, rekey = false)
    } :+ WalMessage(xid, Int.MaxValue, "COMMIT", commitLsn, "",
      Map.empty, Map.empty, Nil, Nil, rekey = false)

  private def spoolFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).list()).map(_.toSeq.filter(!_.startsWith(".")))
      .getOrElse(Nil)

  test("processed spool files are retired; no row is ever lost") {
    val base = java.nio.file.Files.createTempDirectory("graft-spoolret").toString
    val spool = s"$base/messages"
    val tablesBase = s"$base/tables"
    new java.io.File(spool).mkdirs()

    // 24 spool files (one committed txn of 3 inserts each), exactly the
    // pump's flush shape
    var nextId = 0L
    def appendFiles(n: Int, startXid: Long): Unit =
      (0 until n).foreach { i =>
        val ids = Seq(nextId, nextId + 1, nextId + 2); nextId += 3
        WalSpool.append(spool,
          insertTxn(startXid + i, commitLsn = (startXid + i) * 10, ids))
      }
    appendFiles(24, startXid = 1)
    spoolFiles(spool).size shouldBe 24

    val cfg = graft.SyncConfig(Seq(rel), tablesBase, s"$base/ckpt",
      batchTimeout = "1 second")
    val sync = new graft.GraftSync(spark, cfg)
    def stream() = spark.readStream
      .schema(Encoders.product[WalMessage].schema)
      .option("maxFilesPerTrigger", 3) // several batches → several commits
      .option("cleanSource", "delete") // Main.run's production default
      .json(spool)
      .as(Encoders.product[WalMessage])

    val q = sync.startFromMessages(stream(), streamName = "ret")
    try {
      q.processAllAvailable()
      // mid-run growth: the source must pick up and later retire these too
      appendFiles(8, startXid = 100)
      q.processAllAvailable()
    } finally q.stop()

    // completeness FIRST — retention must never have deleted unread work
    val got = sync.table("items").select("id").collect().map(_.getLong(0)).toSet
    got shouldBe (0L until nextId).toSet

    // a second run over the same checkpoint commits the final batch of the
    // first, so its files clean too; files of the LAST overall batch may
    // legitimately survive until a later run
    val q2 = sync.startFromMessages(stream(), streamName = "ret")
    try q2.processAllAvailable() finally q2.stop()

    // the cleaner is a small async pool — poll briefly rather than assume
    // synchronous deletion
    val deadline = System.nanoTime() + 30L * 1000000000L
    var remaining = spoolFiles(spool).size
    while (remaining > 3 && System.nanoTime() < deadline) {
      Thread.sleep(250)
      remaining = spoolFiles(spool).size
    }
    // 32 files written; all but (at most) the final uncommitted batch's
    // maxFilesPerTrigger=3 must be retired
    remaining should be <= 3
    // and retirement lost nothing (table unchanged after the extra run)
    sync.table("items").count() shouldBe nextId
  }

  test("checkpoint rotation over a retention-managed spool loses nothing") {
    // the rotation invariant Main.run relies on (sync.checkpointrotation,
    // the bound on Spark's ever-growing file-source metadata log): the
    // streaming checkpoint is DISPOSABLE — a fresh checkpoint re-reads
    // whatever the retention-bounded spool still holds, and the commit
    // log's LSN watermark (which lives with the TABLES, not the
    // checkpoint) dedups every re-read action. Simulated here exactly as
    // the body does it: stop, delete the checkpoint dir, rebuild the
    // stream on the same spool.
    val base = java.nio.file.Files.createTempDirectory("graft-spoolrot").toString
    val spool = s"$base/messages"
    val ckpt = s"$base/ckpt"
    new java.io.File(spool).mkdirs()

    var nextId = 0L
    def appendFiles(n: Int, startXid: Long): Unit =
      (0 until n).foreach { i =>
        val ids = Seq(nextId, nextId + 1); nextId += 2
        WalSpool.append(spool,
          insertTxn(startXid + i, commitLsn = (startXid + i) * 10, ids))
      }
    val cfg = graft.SyncConfig(Seq(rel), s"$base/tables", ckpt,
      batchTimeout = "1 second")
    val sync = new graft.GraftSync(spark, cfg)
    def stream() = spark.readStream
      .schema(Encoders.product[WalMessage].schema)
      .option("maxFilesPerTrigger", 3)
      .option("cleanSource", "delete")
      .json(spool)
      .as(Encoders.product[WalMessage])

    appendFiles(12, startXid = 1)
    val q = sync.startFromMessages(stream(), streamName = "rot")
    try q.processAllAvailable() finally q.stop()

    // ROTATE: checkpoint gone; retained spool tail (the not-yet-cleaned
    // final batch) will be RE-READ by the fresh stream as batch 0
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    appendFiles(8, startXid = 100)
    val q2 = sync.startFromMessages(stream(), streamName = "rot")
    try q2.processAllAvailable() finally q2.stop()

    // every row exactly once: re-read files deduped by the watermark,
    // new files applied, nothing lost to the deleted checkpoint
    val got = sync.table("items").select("id").collect().map(_.getLong(0)).toSeq
    got.sorted shouldBe (0L until nextId)
    got.size shouldBe got.distinct.size
  }

  test("archive mode moves committed files aside instead of deleting") {
    val base = java.nio.file.Files.createTempDirectory("graft-spoolarc").toString
    val spool = s"$base/messages"
    val archive = s"$base/archive" // outside the source dir, as Spark requires
    new java.io.File(spool).mkdirs()

    (0 until 12).foreach { i =>
      WalSpool.append(spool, insertTxn(xid = i + 1, commitLsn = (i + 1) * 10L,
        ids = Seq(i * 2L, i * 2L + 1)))
    }
    val cfg = graft.SyncConfig(Seq(rel), s"$base/tables", s"$base/ckpt",
      batchTimeout = "1 second")
    val sync = new graft.GraftSync(spark, cfg)
    def stream() = spark.readStream
      .schema(Encoders.product[WalMessage].schema)
      .option("maxFilesPerTrigger", 3)
      .option("cleanSource", "archive") // Main.run's archive shape
      .option("sourceArchiveDir", archive)
      .json(spool)
      .as(Encoders.product[WalMessage])
    val q = sync.startFromMessages(stream(), streamName = "arc")
    try q.processAllAvailable() finally q.stop()
    val q2 = sync.startFromMessages(stream(), streamName = "arc")
    try q2.processAllAvailable() finally q2.stop()

    // every row arrived …
    sync.table("items").select("id").collect().map(_.getLong(0)).toSet shouldBe
      (0L until 24L).toSet
    // … and committed files were MOVED (archive preserves the source-path
    // layout under the archive root), not deleted
    val deadline = System.nanoTime() + 30L * 1000000000L
    def archived(): Int = {
      val root = new java.io.File(archive)
      if (!root.exists()) 0
      else java.nio.file.Files.walk(root.toPath)
        .filter(p => p.getFileName.toString.startsWith("spool-")).count().toInt
    }
    var n = archived()
    while (n < 9 && System.nanoTime() < deadline) { Thread.sleep(250); n = archived() }
    n should be >= 9 // all but (at most) the final batch
    spoolFiles(spool).size should be <= 3
  }
}
