package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.scalatest.concurrent.Eventually
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.time.{Seconds, Span}

import graft.cdc.{PgOutput, PgReplication, PgTypes, RelColumn, Relation}
import graft.cdc.PgWireTestKit._

/** The single-process live mode end-to-end over a scripted loopback
  * "postgres": `Main.livePump` performs the full bootstrap
  * (startup→auth→IDENTIFY_SYSTEM→START_REPLICATION), spools the decoded
  * stream as the `run` command's message files, acknowledges with the
  * applied LSN, survives the server ending the stream (reconnect loop),
  * and stops cleanly on request. */
class LivePumpSpec extends AnyFunSuite with Matchers with Eventually {
  private val spark = TestSpark.spark

  test("livePump: bootstrap -> spool -> ack -> reconnect loop -> clean stop") {
    val rel = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid)))
    val txn = Seq(
      PgOutput.encodeBegin(700L, 0L, 11),
      PgOutput.encodeRelation(9, rel),
      PgOutput.encodeInsert(9, Seq(PgOutput.CellText("5"), PgOutput.CellText("y"))),
      PgOutput.encodeCommit(700L, 700L, 0L))

    val server = new ServerSocket(0)
    val ackApply = new AtomicLong(-1L)
    val serverThread = new Thread(() => {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      val params = readStartup(in)
      require(params("user") == "graft" && params("replication") == "database")
      sendTrustReady(out)
      answerQuery(in, out, "IDENTIFY_SYSTEM",
        Seq("systemid", "timeline", "xlogpos", "dbname"),
        Seq("42", "1", "0/500", "appdb"))
      val (t, q) = readMsg(in)
      require(t == 'Q')
      require(new String(q, 0, q.length - 1, UTF_8) ==
        "START_REPLICATION SLOT \"s1\" LOGICAL 0/0 " +
          "(proto_version '1', publication_names 's1')")
      sendMsg(out, 'W', Array[Byte](0, 0, 0))
      txn.zipWithIndex.foreach { case (p, i) =>
        sendCopyData(out, PgReplication.encodeXLogData(700L + i, 900L, 0L, p))
      }
      sendCopyData(out, PgReplication.encodePrimaryKeepalive(900L, 0L, replyRequested = true))
      out.flush()
      val (rt, rb) = readMsg(in) // the requested standby status
      if (rt == 'd') ackApply.set(PgReplication.decodeStandbyStatus(rb).walApply)
      sendCopyDone(out) // end the stream: pump should fall into its retry loop
      try { var open = true; while (open) open = readMsg(in)._1 == 'd' }
      catch { case _: Throwable => () }
      s.close(); server.close()
    })
    serverThread.start()

    val dir = java.nio.file.Files.createTempDirectory("graft_livepump").toString
    val messagesDir = s"$dir/messages"
    val stop = new AtomicBoolean(false)
    val total = new AtomicLong(0L)
    val applied = new AtomicLong(0L)
    val pump = new Thread(() => total.set(Main.livePump(
      s"postgres://graft@127.0.0.1:${server.getLocalPort}/appdb",
      slot = "s1", messagesDir = messagesDir,
      appliedLsn = () => applied.get(), stop = stop, retryBackoffMs = 100L)))
    pump.setDaemon(true)
    pump.start()

    // the spool fills with the decoded transaction
    eventually(timeout(Span(20, Seconds))) {
      val msgs = scala.util.Try(
        spark.read.json(messagesDir).select("msgType")
          .collect().map(_.getString(0)).toSeq).getOrElse(Nil)
      msgs.sorted shouldBe Seq("BEGIN", "COMMIT", "INSERT")
    }
    // the ack carried the APPLIED position (nothing applied yet -> 0,
    // never the merely-spooled 700) — the slot must not run ahead of the
    // table store
    eventually(timeout(Span(10, Seconds))) { ackApply.get() shouldBe 0L }

    // server is gone: the pump is in its reconnect-backoff loop; stopping
    // ends it cleanly without needing a live peer
    stop.set(true)
    pump.join(15000)
    pump.isAlive shouldBe false
    total.get() shouldBe 3L
    serverThread.join(5000)
  }

  test("livePump: a mid-stream schema change RETHROWS instead of reconnecting") {
    // the resync contract: a reconnect would hand the re-announced relation
    // to a FRESH decoder, which caches the new schema silently — the merge
    // (still configured with the old relations) would desync. livePump must
    // surface SchemaChangedException to its supervisor.
    val relA = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid)))
    val relB = relA.copy(columns = relA.columns :+ RelColumn("extra", PgTypes.Int4Oid))

    val server = new ServerSocket(0)
    val serverThread = new Thread(() => {
      try while (true) { // accept loop: a (buggy) reconnect would land here
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val out = new DataOutputStream(s.getOutputStream)
        readStartup(in)
        sendTrustReady(out)
        answerQuery(in, out, "IDENTIFY_SYSTEM",
          Seq("systemid", "timeline", "xlogpos", "dbname"),
          Seq("42", "1", "0/500", "appdb"))
        readMsg(in) // START_REPLICATION
        sendMsg(out, 'W', Array[Byte](0, 0, 0))
        // txn 1 with schema A, then txn 2 re-announcing a CHANGED schema
        Seq(
          PgOutput.encodeBegin(700L, 0L, 11),
          PgOutput.encodeRelation(9, relA),
          PgOutput.encodeInsert(9, Seq(PgOutput.CellText("5"), PgOutput.CellText("y"))),
          PgOutput.encodeCommit(700L, 700L, 0L),
          PgOutput.encodeBegin(800L, 0L, 12),
          PgOutput.encodeRelation(9, relB) // the decoder raises HERE
        ).zipWithIndex.foreach { case (p, i) =>
          sendCopyData(out, PgReplication.encodeXLogData(700L + i, 900L, 0L, p))
        }
        out.flush()
        try { var open = true; while (open) open = readMsg(in)._1 == 'd' }
        catch { case _: Throwable => () }
        try s.close() catch { case _: Throwable => () }
      } catch { case _: Throwable => () }
    })
    serverThread.setDaemon(true)
    serverThread.start()

    val dir = java.nio.file.Files.createTempDirectory("graft_livepump2").toString
    val stop = new AtomicBoolean(false)
    val caught = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val pump = new Thread(() => {
      try Main.livePump(
        s"postgres://graft@127.0.0.1:${server.getLocalPort}/appdb",
        slot = "s1", messagesDir = s"$dir/messages",
        appliedLsn = () => 0L, stop = stop, retryBackoffMs = 100L)
      catch { case e: Throwable => caught.set(e) }
      ()
    })
    pump.setDaemon(true)
    pump.start()

    // the pump must DIE with the schema change, not sit in a reconnect loop
    eventually(timeout(Span(20, Seconds))) {
      pump.isAlive shouldBe false
      caught.get() shouldBe a[graft.streaming.SchemaChangedException]
      caught.get().getMessage should include("t1")
    }
    stop.set(true)
    server.close()
  }
}
