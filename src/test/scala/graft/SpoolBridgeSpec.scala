package graft

import java.net.ServerSocket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.cdc._
import graft.cdc.PgReplication._

/** The live-socket → message-spool bridge: a scripted loopback "postgres"
  * streams transactions; the bridge must land them as JSON files the
  * streaming source reads back typed, and must acknowledge ONLY what the
  * target has applied. */
class SpoolBridgeSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  private val rel = Relation("public", "t1", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("v", PgTypes.TextOid)))

  test("socket stream spools typed WalMessages; ack tracks the applied position") {
    val dir = Files.createTempDirectory("graft_spool").toFile.getAbsolutePath
    val server = new ServerSocket(0)
    val gotStatuses = new java.util.concurrent.ConcurrentLinkedQueue[StandbyStatus]()

    val serverThread = new Thread(() => {
      val s = server.accept()
      val in = new java.io.DataInputStream(s.getInputStream)
      val out = new java.io.DataOutputStream(s.getOutputStream)
      def sendCopyData(p: Array[Byte]): Unit = {
        out.writeByte('d'); out.writeInt(p.length + 4); out.write(p)
      }
      (1 to 3).foreach { i =>
        val lsn = i * 100L
        Seq(
          PgOutput.encodeBegin(lsn, 0L, i.toLong),
          PgOutput.encodeRelation(9, rel),
          PgOutput.encodeInsert(9,
            Seq(PgOutput.CellText(i.toString), PgOutput.CellText(s"v$i"))),
          PgOutput.encodeCommit(lsn, lsn, 0L)
        ).foreach(p => sendCopyData(encodeXLogData(lsn, lsn, 0L, p)))
      }
      // reply-requested keepalive, then CopyDone: the client processes
      // every buffered frame in order before it sees the stream end
      sendCopyData(encodePrimaryKeepalive(1000L, 0L, replyRequested = true))
      out.writeByte('c'); out.writeInt(4)
      out.flush()
      try {
        var open = true
        while (open) {
          val t = in.read()
          if (t < 0) open = false
          else {
            val len = in.readInt(); val b = new Array[Byte](len - 4); in.readFully(b)
            t.toChar match {
              case 'd' => gotStatuses.add(decodeStandbyStatus(b))
              case 'c' => open = false
              case _   => ()
            }
          }
        }
      } catch { case _: Throwable => () }
      s.close()
    })
    serverThread.start()

    // the reply-requested keepalive arrives before anything is applied
    // downstream (appliedLsn stays 0), so the first ack must NOT claim the
    // keepalive's 1000 — nothing spooled has been applied yet
    val socket = new java.net.Socket("127.0.0.1", server.getLocalPort)
    val session = new PgReplication.Session(startLsn = 0L)
    val n = Main.spoolFromSocket(socket, dir, session,
      appliedLsn = () => 0L, spoolBatch = 5)
    socket.close()
    serverThread.join(5000)
    server.close()

    n shouldBe 9L // 3 txns x (BEGIN, INSERT, COMMIT); RELATION only feeds the cache
    // the spool reads back typed through the same schema run() streams with
    val spooled = spark.read
      .schema(org.apache.spark.sql.Encoders.product[WalMessage].schema)
      .json(dir)
      .as(org.apache.spark.sql.Encoders.product[WalMessage])
      .collect()
    spooled should have size 9
    spooled.count(_.msgType == "INSERT") shouldBe 3
    spooled.filter(_.msgType == "COMMIT").map(_.lsn).sorted shouldBe Seq(100L, 200L, 300L)
    // acks never ran ahead of the (never-advancing) applied position
    gotStatuses.forEach(st => st.walApply shouldBe 0L)
  }
}
