package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PgReplicationSpec extends AnyFunSuite with Matchers {
  import PgReplication._

  private val rel = Relation("public", "t1", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("v", PgTypes.TextOid)))

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("golden CopyData frames decode per the documented wire format") {
    // XLogData: 'w', walStart=0x10, serverWalEnd=0x20, time=0, payload "AB"
    val w = bytes(0x77,
      0, 0, 0, 0, 0, 0, 0, 0x10,
      0, 0, 0, 0, 0, 0, 0, 0x20,
      0, 0, 0, 0, 0, 0, 0, 0,
      0x41, 0x42)
    decodeCopyData(w) match {
      case XLogData(start, end, ts, payload) =>
        start shouldBe 0x10L; end shouldBe 0x20L; ts shouldBe 0L
        payload shouldBe Array[Byte](0x41, 0x42)
      case other => fail(s"wrong decode: $other")
    }
    encodeXLogData(0x10L, 0x20L, 0L, Array[Byte](0x41, 0x42)) shouldBe w

    // keepalive: 'k', serverWalEnd=0x30, time=0, replyRequested=1
    val k = bytes(0x6b, 0, 0, 0, 0, 0, 0, 0, 0x30,
      0, 0, 0, 0, 0, 0, 0, 0, 1)
    decodeCopyData(k) shouldBe PrimaryKeepalive(0x30L, 0L, replyRequested = true)
    encodePrimaryKeepalive(0x30L, 0L, replyRequested = true) shouldBe k

    // standby status: 'r', three positions, client time, no reply
    val r = encodeStandbyStatus(StandbyStatus(7L, 7L, 7L, 99L, replyRequested = false))
    r.head shouldBe 'r'.toByte
    decodeStandbyStatus(r) shouldBe StandbyStatus(7L, 7L, 7L, 99L, false)
    an[IllegalArgumentException] should be thrownBy decodeCopyData(bytes(0x5a))
  }

  private def txnFrames(xid: Long, lsn: Long): Seq[Array[Byte]] = Seq(
    PgOutput.encodeBegin(lsn, 0L, xid),
    PgOutput.encodeRelation(9, rel),
    PgOutput.encodeInsert(9, Seq(PgOutput.CellText("1"), PgOutput.CellText("x"))),
    PgOutput.encodeCommit(lsn, lsn, 0L))

  test("session: XLogData decodes through pgoutput; keepalive acks with committed LSN") {
    val s = new Session(startLsn = 100L)
    val msgs = txnFrames(7, 1000).zipWithIndex.flatMap { case (p, i) =>
      s.feed(encodeXLogData(1000L + i, 2000L, 0L, p), nowMicros = 0L).messages
    }
    msgs.map(_.msgType) shouldBe Seq("BEGIN", "INSERT", "COMMIT")

    // keepalive requesting a reply, before the target acked anything new
    val r1 = s.feed(encodePrimaryKeepalive(5000L, 0L, replyRequested = true), 1L)
    r1.progressLsn shouldBe Some(5000L)
    decodeStandbyStatus(r1.reply.get).walWrite shouldBe 100L

    // the target applies the batch and acknowledges
    s.commit(1000L)
    val r2 = s.feed(encodePrimaryKeepalive(5001L, 0L, replyRequested = true), 2L)
    decodeStandbyStatus(r2.reply.get).walWrite shouldBe 1000L
    s.committedLsn shouldBe 1000L
  }

  test("session: heartbeat fires on the standby interval, not on every frame") {
    val s = new Session(standbyIntervalMicros = 100L)
    // first frame arms the clock, no reply
    s.feed(encodeXLogData(0, 0, 0, PgOutput.encodeBegin(10, 0, 1)), 0L).reply shouldBe None
    // 50µs later: not due
    s.feed(encodeXLogData(0, 0, 0, PgOutput.encodeCommit(10, 10, 0)), 50L).reply shouldBe None
    // 150µs: due → heartbeat even though the keepalive didn't ask
    val r = s.feed(encodePrimaryKeepalive(20, 0, replyRequested = false), 150L)
    r.reply should not be empty
    // clock reset: immediately after, nothing due
    s.feed(encodePrimaryKeepalive(21, 0, replyRequested = false), 151L).reply shouldBe None
  }

  test("skipAcknowledge: commit is a no-op and replies never advance") {
    val s = new Session(startLsn = 5L, skipAcknowledge = true)
    s.commit(9999L)
    s.committedLsn shouldBe 5L
    val r = s.feed(encodePrimaryKeepalive(50L, 0L, replyRequested = true), 0L)
    decodeStandbyStatus(r.reply.get).walWrite shouldBe 5L
  }

  test("graceful close: final standby status at applied LSN, then CopyDone") {
    val s = new Session(startLsn = 100L)
    txnFrames(7, 1000).zipWithIndex.foreach { case (p, i) =>
      s.feed(encodeXLogData(1000L + i, 2000L, 0L, p), nowMicros = 0L)
    }
    s.commit(1000L)
    s.isClosed shouldBe false

    val frames = s.close(nowMicros = 42L)
    frames should have size 2
    // golden frame 1: standby status acknowledging everything applied
    val st = decodeStandbyStatus(frames.head)
    st.walWrite shouldBe 1000L
    st.walFlush shouldBe 1000L
    st.walApply shouldBe 1000L
    st.replyRequested shouldBe false
    // golden frame 2: frontend CopyDone — 'c' + Int32 length 4, no body
    frames(1).toSeq shouldBe Seq[Byte]('c'.toByte, 0, 0, 0, 4)

    s.isClosed shouldBe true
    s.close(43L) shouldBe empty // idempotent
    an[IllegalStateException] should be thrownBy
      s.feed(encodePrimaryKeepalive(5000L, 0L, replyRequested = true), 44L)
  }

  test("a drain stop ends supervision cleanly: close handshake, no restart") {
    val sent = collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var bodies = 0
    val res = graft.streaming.Supervisor.runForever(body = () => {
      bodies += 1
      val s = new Session(startLsn = 5L)
      s.commit(77L)
      sent ++= s.close(nowMicros = 0L) // drain: handshake THEN stop
      throw new graft.streaming.Supervisor.StopRequested
    }, backoffMs = 1L)
    bodies shouldBe 1 // not restarted
    res shouldBe graft.streaming.Supervisor.Result(restarts = 0, resyncs = 0)
    decodeStandbyStatus(sent.head).walApply shouldBe 77L
    sent(1).toSeq shouldBe CopyDoneFrame.toSeq
  }

  test("capture files round-trip length-prefixed frames in order") {
    val path = java.nio.file.Files.createTempFile("graft-capture", ".bin").toString
    val frames = txnFrames(3, 300).map(p => encodeXLogData(1, 2, 0, p)) :+
      encodePrimaryKeepalive(400, 0, replyRequested = false)
    writeFrameFile(path, frames)
    val back = readFrameFile(path).toSeq
    back.map(_.toSeq) shouldBe frames.map(_.toSeq)
  }

  test("streamtofile: capture → decoded JSONL, re-readable as WalMessages") {
    val spark = graft.TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-stf").toString
    val capture = s"$dir/seg0.bin"
    writeFrameFile(capture,
      txnFrames(11, 1100).map(p => encodeXLogData(1, 2, 0, p)))
    val out = s"$dir/out.jsonl"
    val n = graft.Main.streamToFile(spark, capture, out)
    n shouldBe 3
    val back = spark.read
      .schema(org.apache.spark.sql.Encoders.product[WalMessage].schema)
      .json(out)
      .as(org.apache.spark.sql.Encoders.product[WalMessage])
      .collect()
    back.map(_.msgType).toSet shouldBe Set("BEGIN", "INSERT", "COMMIT")
    back.find(_.msgType == "INSERT").get.values shouldBe Map("id" -> "1", "v" -> "x")
  }
}
