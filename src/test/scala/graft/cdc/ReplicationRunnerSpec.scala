package graft.cdc

import java.io.EOFException
import java.net.{ServerSocket, Socket}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The live-loop layer over the pure session: a scripted transport drives
  * keepalive/ack/heartbeat timing deterministically; a loopback-socket
  * test proves the COPY BOTH framing against real socket I/O. */
class ReplicationRunnerSpec extends AnyFunSuite with Matchers {
  import PgReplication._

  private val rel = Relation("public", "t1", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("v", PgTypes.TextOid)))

  private def txnFrames(xid: Long, lsn: Long): Seq[Array[Byte]] = Seq(
    PgOutput.encodeBegin(lsn, 0L, xid),
    PgOutput.encodeRelation(9, rel),
    PgOutput.encodeInsert(9, Seq(PgOutput.CellText("1"), PgOutput.CellText("x"))),
    PgOutput.encodeCommit(lsn, lsn, 0L))

  /** Scripted transport: a queue of inbound events (Some(frame) = frame,
    * None = poll timeout, Eof = server closed); outbound bytes recorded. */
  private final class FakeTransport(script: Seq[Option[Array[Byte]]])
      extends ReplicationRunner.Transport {
    private val it = script.iterator
    val written = mutable.Buffer.empty[Array[Byte]]
    var doneSent = false
    def readFrame(): Option[Array[Byte]] =
      if (it.hasNext) it.next() else throw new EOFException("script exhausted")
    def writeFrame(payload: Array[Byte]): Unit = written += payload
    def writeDone(): Unit = doneSent = true
    def flush(): Unit = ()
    def close(): Unit = ()
  }

  test("loop: feed->sink, keepalive ack carries the committed LSN, drain on stop") {
    val script: Seq[Option[Array[Byte]]] =
      txnFrames(7, 1000).zipWithIndex.map { case (p, i) =>
        Some(encodeXLogData(1000L + i, 2000L, 0L, p))
      } :+ Some(encodePrimaryKeepalive(5000L, 0L, replyRequested = true))
    val transport = new FakeTransport(script)
    val session = new Session(startLsn = 100L)
    val got = mutable.Buffer.empty[WalMessage]
    val progress = mutable.Buffer.empty[Long]
    var now = 0L
    val runner = new ReplicationRunner(session, transport,
      sink = got += _, onProgress = progress += _, clock = () => now)

    // four XLogData steps deliver the decoded transaction to the sink
    (1 to 4).foreach { _ => runner.step() shouldBe true }
    got.map(_.msgType) shouldBe Seq("BEGIN", "INSERT", "COMMIT")

    // the target applies the batch; the keepalive's requested reply must
    // carry the APPLIED position, and its WAL-advance reaches onProgress
    session.commit(1000L)
    runner.step() shouldBe true
    progress shouldBe Seq(5000L)
    val ack = decodeStandbyStatus(transport.written.last)
    ack.walApply shouldBe 1000L

    // stop: run() drains — final status + top-level CopyDone
    runner.requestStop()
    runner.run()
    transport.doneSent shouldBe true
    decodeStandbyStatus(transport.written.last).walApply shouldBe 1000L
    session.isClosed shouldBe true
  }

  test("loop: idle polls heartbeat on the standby interval, not on every timeout") {
    val session = new Session(standbyIntervalMicros = 100L)
    val transport = new FakeTransport(
      // first frame arms the clock, then three idle polls
      Some(encodeXLogData(0, 0, 0, PgOutput.encodeBegin(10, 0, 1))) +:
        Seq.fill(3)(Option.empty[Array[Byte]]))
    var now = 0L
    val runner = new ReplicationRunner(session, transport,
      sink = _ => (), clock = () => now)

    runner.step() // arms at now=0
    now = 50L; runner.step() // not due
    transport.written shouldBe empty
    now = 150L; runner.step() // due -> unsolicited heartbeat
    transport.written should have size 1
    decodeStandbyStatus(transport.written.head).replyRequested shouldBe false
    now = 160L; runner.step() // clock reset by the heartbeat: not due again
    transport.written should have size 1
  }

  test("loop: a FULLY QUIET stream still heartbeats (timer arms on first poll)") {
    // wal_sender_timeout=0 scenario: no frames ever arrive, only poll
    // timeouts — the slot's confirmed LSN must still advance server-side,
    // so unsolicited statuses go out one interval after pumping starts
    val session = new Session(startLsn = 42L, standbyIntervalMicros = 100L)
    val transport = new FakeTransport(Seq.fill(4)(Option.empty[Array[Byte]]))
    var now = 0L
    val runner = new ReplicationRunner(session, transport,
      sink = _ => (), clock = () => now)

    runner.step() // arms the timer at now=0 — no frame ever seen
    transport.written shouldBe empty
    now = 99L; runner.step() // interval not yet elapsed
    transport.written shouldBe empty
    now = 101L; runner.step() // due: unsolicited status on a silent stream
    transport.written should have size 1
    val st = decodeStandbyStatus(transport.written.head)
    st.walApply shouldBe 42L
    st.replyRequested shouldBe false
    now = 150L; runner.step() // timer reset by the status: not due again
    transport.written should have size 1
  }

  test("loop: server EOF ends the pump and still sends the drain frames") {
    val transport = new FakeTransport(Seq(
      Some(encodeXLogData(0, 0, 0, PgOutput.encodeBegin(10, 0, 1)))))
    val session = new Session()
    val runner = new ReplicationRunner(session, transport, sink = _ => ())
    runner.run() // script exhaustion = EOF
    transport.doneSent shouldBe true
    session.isClosed shouldBe true
  }

  test("loop: a hard peer close cannot turn the finished pump into an error") {
    val transport = new ReplicationRunner.Transport {
      def readFrame(): Option[Array[Byte]] = throw new EOFException("peer gone")
      def writeFrame(payload: Array[Byte]): Unit =
        throw new java.io.IOException("broken pipe")
      def writeDone(): Unit = throw new java.io.IOException("broken pipe")
      def flush(): Unit = ()
      def close(): Unit = ()
    }
    val session = new Session()
    noException should be thrownBy
      new ReplicationRunner(session, transport, sink = _ => ()).run()
    session.isClosed shouldBe true
  }

  test("an EOF mid-frame is a desync (IOException), not a graceful stream end") {
    val server = new ServerSocket(0)
    val serverThread = new Thread(() => {
      val s = server.accept()
      val out = new java.io.DataOutputStream(s.getOutputStream)
      out.writeByte('d'); out.writeInt(100); out.write(Array[Byte](1, 2, 3))
      out.flush()
      s.close() // 93 promised bytes never arrive
    })
    serverThread.start()
    val socket = new Socket("127.0.0.1", server.getLocalPort)
    val transport = new SocketCopyTransport(socket, pollMillis = 1000)
    val e = intercept[java.io.IOException] {
      // poll until the truncation surfaces (None = timeout is fine)
      var n = 0
      while (n < 50) { transport.readFrame(); n += 1 }
    }
    e shouldNot be(an[EOFException]) // desync, not clean EOF
    e.getMessage should include("mid-frame")
    serverThread.join(5000)
    transport.close(); server.close()
  }

  test("socket integration: COPY BOTH framing round-trips over a loopback socket") {
    val server = new ServerSocket(0)
    val serverGotStatus = new ConcurrentLinkedQueue[StandbyStatus]()
    val serverSawDone = new CountDownLatch(1)

    // scripted "postgres": one txn as CopyData, a reply-requested
    // keepalive, read the client's status, then CopyDone to end the
    // stream; finally read the client's drain (status + CopyDone).
    val serverThread = new Thread(() => {
      val s = server.accept()
      val in = new java.io.DataInputStream(s.getInputStream)
      val out = new java.io.DataOutputStream(s.getOutputStream)
      def sendCopyData(payload: Array[Byte]): Unit = {
        out.writeByte('d'); out.writeInt(payload.length + 4); out.write(payload)
      }
      txnFrames(3, 500).zipWithIndex.foreach { case (p, i) =>
        sendCopyData(encodeXLogData(500L + i, 900L, 0L, p))
      }
      sendCopyData(encodePrimaryKeepalive(900L, 0L, replyRequested = true))
      out.flush()
      def readMsg(): (Char, Array[Byte]) = {
        val t = in.read().toChar
        val len = in.readInt()
        val body = new Array[Byte](len - 4)
        in.readFully(body)
        (t, body)
      }
      // the requested ack
      val (t1, b1) = readMsg()
      if (t1 == 'd') serverGotStatus.add(decodeStandbyStatus(b1))
      // end the stream; then collect the client's drain
      out.writeByte('c'); out.writeInt(4); out.flush()
      try {
        var open = true
        while (open) readMsg() match {
          case ('d', b) => serverGotStatus.add(decodeStandbyStatus(b))
          case ('c', _) => serverSawDone.countDown(); open = false
          case _        => open = false
        }
      } catch { case _: Throwable => () }
      s.close()
    })
    serverThread.start()

    val socket = new Socket("127.0.0.1", server.getLocalPort)
    val transport = new SocketCopyTransport(socket, pollMillis = 100)
    val session = new Session(startLsn = 7L)
    val got = new ConcurrentLinkedQueue[String]()
    val runner = new ReplicationRunner(session, transport,
      sink = m => got.add(m.msgType))
    session.commit(500L)
    runner.run() // returns on the server's CopyDone
    transport.close()

    got.asScala.toSeq shouldBe Seq("BEGIN", "INSERT", "COMMIT")
    serverSawDone.await(5, TimeUnit.SECONDS) shouldBe true
    val statuses = serverGotStatus.asScala.toSeq
    statuses should not be empty
    statuses.foreach(_.walApply shouldBe 500L)
    serverThread.join(5000)
    server.close()
  }
}
