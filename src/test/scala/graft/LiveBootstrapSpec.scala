package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.cdc._
import graft.cdc.PgWireTestKit._

/** The live-mode `Run` prologue end to end against a SCRIPTED wire
  * "postgres" (sync_service.go:60-131): publication reconcile → slot
  * create with exported snapshot → pinned COPY backfill → applied-LSN
  * seed at the consistent point — proving snapshot and stream start are
  * exactly aligned, the gap an uncoordinated wall-clock backfill +
  * `START_REPLICATION 0/0` leaves open. Also the resync path: an
  * existing slot whose table store is GONE is dropped and the prologue
  * re-runs (never a silent partial resume). */
class LiveBootstrapSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  private val users = Relation("public", "users", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("name", PgTypes.TextOid)))
  private val usersCsv = "id,name\n1,alice\n2,bob\n"
  private val SnapName = "00000003-0000001A-1"

  /** Stateful scripted server: first connection = pool (catalog queries,
    * DDL, COPY backfill), any replication-mode connection answers
    * CREATE_REPLICATION_SLOT. Responds by SQL pattern, records DDL. */
  private final class FakePg(var pubMatches: Boolean, var slotLsn: Option[String]) {
    val server = new ServerSocket(0)
    val ddl = new ConcurrentLinkedQueue[String]()
    def port: Int = server.getLocalPort

    private def emptyResult(out: DataOutputStream, cols: String*): Unit = {
      sendMsg(out, 'T', rowDesc(cols: _*))
      sendMsg(out, 'C', cstr("SELECT 0"))
      sendMsg(out, 'Z', Array('I'.toByte))
    }
    private def ok(out: DataOutputStream, tag: String): Unit = {
      sendMsg(out, 'C', cstr(tag))
      sendMsg(out, 'Z', Array('I'.toByte))
    }
    private def copyOutResponse(out: DataOutputStream, nCols: Int): Unit =
      sendMsg(out, 'H',
        Array[Byte](0, ((nCols >> 8) & 0xFF).toByte, (nCols & 0xFF).toByte) ++
          Array.fill[Byte](2 * nCols)(0))

    private def handle(s: java.net.Socket): Unit = {
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      readStartup(in)
      sendTrustReady(out)
      try while (true) {
        val (t, q) = readMsg(in)
        if (t == 'X') return
        require(t == 'Q', s"unexpected '$t'")
        val sql = new String(q, 0, q.length - 1, UTF_8)
        sql match {
          case _ if sql.startsWith("SELECT schemaname, tablename") =>
            if (pubMatches) {
              sendMsg(out, 'T', rowDesc("schemaname", "tablename"))
              sendMsg(out, 'D', dataRow("public", "users"))
              sendMsg(out, 'C', cstr("SELECT 1"))
              sendMsg(out, 'Z', Array('I'.toByte))
            } else emptyResult(out, "schemaname", "tablename")
          case _ if sql.startsWith("SELECT restart_lsn") =>
            slotLsn match {
              case Some(lsn) =>
                sendMsg(out, 'T', rowDesc("restart_lsn"))
                sendMsg(out, 'D', dataRow(lsn))
                sendMsg(out, 'C', cstr("SELECT 1"))
                sendMsg(out, 'Z', Array('I'.toByte))
              case None => emptyResult(out, "restart_lsn")
            }
          case _ if sql.startsWith("SELECT pg_drop_replication_slot") =>
            ddl.add(sql); slotLsn = None; ok(out, "SELECT 1")
          case _ if sql.startsWith("DROP PUBLICATION") =>
            ddl.add(sql); ok(out, "DROP PUBLICATION")
          case _ if sql.startsWith("CREATE PUBLICATION") =>
            ddl.add(sql); pubMatches = true; ok(out, "CREATE PUBLICATION")
          case _ if sql.startsWith("CREATE_REPLICATION_SLOT") =>
            ddl.add(sql); slotLsn = Some("0/500")
            sendMsg(out, 'T',
              rowDesc("slot_name", "consistent_point", "snapshot_name", "output_plugin"))
            sendMsg(out, 'D', dataRow("s1", "0/500", SnapName, "pgoutput"))
            sendMsg(out, 'C', cstr("CREATE_REPLICATION_SLOT"))
            sendMsg(out, 'Z', Array('I'.toByte))
          case _ if sql == SnapshotCopy.beginSql => ok(out, "BEGIN")
          case _ if sql.startsWith("SET TRANSACTION SNAPSHOT") =>
            sql should include(SnapName) // backfill pinned to the EXPORTED snapshot
            ok(out, "SET")
          case _ if sql.startsWith("copy ") =>
            copyOutResponse(out, 2)
            sendCopyData(out, usersCsv.getBytes(UTF_8))
            sendCopyDone(out)
            ok(out, "COPY 2")
          case _ if sql == SnapshotCopy.commitSql => ok(out, "COMMIT")
          case other => sys.error(s"unscripted sql: $other")
        }
      } catch { case _: Throwable => () }
      finally { try s.close() catch { case _: Throwable => () } }
    }

    val acceptThread = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () }
    })
    acceptThread.setDaemon(true)
    acceptThread.start()
    def close(): Unit = try server.close() catch { case _: Throwable => () }
  }

  private def newSync(tablesBase: String): GraftSync =
    new GraftSync(spark, SyncConfig(Seq(users), tablesBase,
      s"$tablesBase/_ckpt", slotName = "s1"))

  test("fresh source: publication + slot created, backfill pinned to exported snapshot, LSN seeded") {
    val pg = new FakePg(pubMatches = false, slotLsn = None)
    val catalog = new PgCatalog(PgConnect.Endpoint("127.0.0.1", pg.port,
      PgConnect.Config(user = "graft", database = "appdb")))
    val base = Files.createTempDirectory("graft-liveboot").toString
    val sync = newSync(base)
    try {
      val decision = Main.liveBootstrap(spark, sync, catalog, Seq(users),
        Files.createTempDirectory("graft-liveboot-spool"))
      decision shouldBe SlotLifecycle.BackfillFromSnapshot(SnapName, Lsn.parse("0/500"))
      // publication rebuilt from config, slot created with snapshot export
      pg.ddl.toArray.map(_.toString).toSeq shouldBe Seq(
        "DROP PUBLICATION IF EXISTS \"s1\"",
        "CREATE PUBLICATION \"s1\" FOR TABLE ONLY \"public\".\"users\"",
        "CREATE_REPLICATION_SLOT \"s1\" LOGICAL pgoutput (SNAPSHOT 'export')")
      // the backfilled table reads back typed
      sync.table("users").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
        Set((1L, "alice"), (2L, "bob"))
      // the stream starts AND filters at the consistent point
      sync.appliedLsn() shouldBe Lsn.parse("0/500")
    } finally { catalog.close(); pg.close() }
  }

  test("existing slot with a missing table store: drop-slot resync, then fresh bootstrap") {
    val pg = new FakePg(pubMatches = true, slotLsn = Some("0/600"))
    val catalog = new PgCatalog(PgConnect.Endpoint("127.0.0.1", pg.port,
      PgConnect.Config(user = "graft", database = "appdb")))
    val base = Files.createTempDirectory("graft-liveboot2").toString // empty store
    val sync = newSync(base)
    try {
      val decision = Main.liveBootstrap(spark, sync, catalog, Seq(users),
        Files.createTempDirectory("graft-liveboot2-spool"))
      // a silent ResumeFrom would stream into a table that does not exist;
      // the bootstrap must drop the slot and re-snapshot instead
      decision shouldBe SlotLifecycle.BackfillFromSnapshot(SnapName, Lsn.parse("0/500"))
      pg.ddl.toArray.map(_.toString).head should startWith("SELECT pg_drop_replication_slot")
      sync.table("users").count() shouldBe 2L
      sync.appliedLsn() shouldBe Lsn.parse("0/500")
    } finally { catalog.close(); pg.close() }
  }

  test("closed catalog refuses instead of silently reopening outside the snapshot") {
    val pg = new FakePg(pubMatches = false, slotLsn = None)
    val catalog = new PgCatalog(PgConnect.Endpoint("127.0.0.1", pg.port,
      PgConnect.Config(user = "graft", database = "appdb")))
    catalog.close()
    // a lazily-recreated pool connection after close() would NOT be in the
    // slot's exported snapshot — use-after-close must throw, not reconnect
    an[IllegalStateException] should be thrownBy catalog.poolConn
    an[IllegalStateException] should be thrownBy catalog.createSlot("s1")
    catalog.close() // idempotent
    pg.close()
  }

  test("prohibitDropSlot blocks the resync loudly") {
    val pg = new FakePg(pubMatches = true, slotLsn = Some("0/600"))
    val catalog = new PgCatalog(PgConnect.Endpoint("127.0.0.1", pg.port,
      PgConnect.Config(user = "graft", database = "appdb")))
    val base = Files.createTempDirectory("graft-liveboot3").toString
    val sync = new GraftSync(spark, SyncConfig(Seq(users), base,
      s"$base/_ckpt", slotName = "s1", prohibitDropSlot = true))
    try {
      a[SlotLifecycle.DropSlotProhibited] should be thrownBy
        Main.liveBootstrap(spark, sync, catalog, Seq(users),
          Files.createTempDirectory("graft-liveboot3-spool"))
    } finally { catalog.close(); pg.close() }
  }
}
