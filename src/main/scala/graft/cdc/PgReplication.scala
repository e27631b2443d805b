package graft.cdc

import java.nio.{ByteBuffer, ByteOrder}

/** The outer replication-session protocol around [[PgOutput]] — the
  * engine's analogue of the reference's stream loop
  * (sync/stream/stream.go:104-230 over pglogrepl): the server wraps every
  * payload in CopyData messages —
  *
  *   - XLogData ('w'): Int64 walStart, Int64 serverWalEnd, Int64
  *     serverTime (µs since 2000-01-01), then the pgoutput frame;
  *   - Primary keepalive ('k'): Int64 serverWalEnd, Int64 serverTime,
  *     Byte1 reply-requested;
  *
  * and the client acknowledges progress with Standby status update
  * ('r'): Int64 write / flush / apply positions, Int64 clientTime, Byte1
  * reply-requested. All formats are from the public PostgreSQL
  * streaming-replication protocol documentation.
  *
  * [[PgReplication.Session]] is the pure, offline-testable client state
  * machine: feed it CopyData frames, get decoded [[WalMessage]]s plus the
  * standby-status replies to send; `commit(lsn)` is the target's
  * apply-acknowledge (the reference's `committed.Set` after a successful
  * batch write — here called by the [[graft.streaming.CommitLog]] owner).
  * Network I/O stays outside: a live deployment pumps socket bytes
  * through `feed` and writes the returned replies back; this sandbox
  * drives the same machine from byte fixtures and capture files. */
object PgReplication {

  sealed trait CopyDataMsg
  final case class XLogData(walStart: Long, serverWalEnd: Long,
      serverTimeMicros: Long, payload: Array[Byte]) extends CopyDataMsg
  final case class PrimaryKeepalive(serverWalEnd: Long,
      serverTimeMicros: Long, replyRequested: Boolean) extends CopyDataMsg
  final case class StandbyStatus(walWrite: Long, walFlush: Long,
      walApply: Long, clientTimeMicros: Long, replyRequested: Boolean)

  def decodeCopyData(frame: Array[Byte]): CopyDataMsg = {
    val buf = ByteBuffer.wrap(frame).order(ByteOrder.BIG_ENDIAN)
    buf.get().toChar match {
      case 'w' =>
        val walStart = buf.getLong()
        val walEnd = buf.getLong()
        val ts = buf.getLong()
        val payload = new Array[Byte](buf.remaining())
        buf.get(payload)
        XLogData(walStart, walEnd, ts, payload)
      case 'k' =>
        PrimaryKeepalive(buf.getLong(), buf.getLong(), buf.get() != 0)
      case other =>
        throw new IllegalArgumentException(s"unknown CopyData message '$other'")
    }
  }

  def encodeXLogData(walStart: Long, serverWalEnd: Long,
      serverTimeMicros: Long, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 24 + payload.length).order(ByteOrder.BIG_ENDIAN)
    b.put('w'.toByte).putLong(walStart).putLong(serverWalEnd)
      .putLong(serverTimeMicros).put(payload)
    b.array()
  }

  def encodePrimaryKeepalive(serverWalEnd: Long, serverTimeMicros: Long,
      replyRequested: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 17).order(ByteOrder.BIG_ENDIAN)
    b.put('k'.toByte).putLong(serverWalEnd).putLong(serverTimeMicros)
      .put((if (replyRequested) 1 else 0).toByte)
    b.array()
  }

  def encodeStandbyStatus(s: StandbyStatus): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 33).order(ByteOrder.BIG_ENDIAN)
    b.put('r'.toByte).putLong(s.walWrite).putLong(s.walFlush).putLong(s.walApply)
      .putLong(s.clientTimeMicros).put((if (s.replyRequested) 1 else 0).toByte)
    b.array()
  }

  def decodeStandbyStatus(frame: Array[Byte]): StandbyStatus = {
    val buf = ByteBuffer.wrap(frame).order(ByteOrder.BIG_ENDIAN)
    require(buf.get().toChar == 'r', "not a standby status update")
    StandbyStatus(buf.getLong(), buf.getLong(), buf.getLong(), buf.getLong(),
      buf.get() != 0)
  }

  /** Frontend CopyDone message ('c', Int32 length 4, no body): ends COPY
    * BOTH mode, returning the connection to the normal command cycle so
    * e.g. `pg_drop_replication_slot` can run on it (the resync path needs
    * the replication connection closed/quiesced first —
    * sync_service.go:95-103). */
  val CopyDoneFrame: Array[Byte] = Array('c'.toByte, 0, 0, 0, 4)

  /** What one fed frame produced.
    *
    * @param messages    decoded logical messages (empty for keepalives)
    * @param reply       standby-status bytes to send NOW (keepalive asked,
    *                    or the heartbeat interval elapsed)
    * @param progressLsn server WAL end of a keepalive: WAL advanced with
    *                    no publishable events (changes on unsynced
    *                    tables). The caller commits it when nothing is in
    *                    flight, so the slot never falls behind — the
    *                    reference forwards an EMPTY transaction for
    *                    exactly this (stream.go:193-202). */
  final case class FeedResult(messages: Seq[WalMessage],
      reply: Option[Array[Byte]], progressLsn: Option[Long])

  /** @param startLsn        resume point (the slot's confirmed LSN)
    * @param typeIsArray     PG type OID → is-array, for the inner decoder
    * @param skipAcknowledge never advance the acknowledged position
    *        (reference `sync.skipacknowledge`, used by stream-to-file
    *        runs so the slot retains WAL); replies are still sent, with
    *        the unadvanced position
    * @param standbyIntervalMicros heartbeat interval
    *        (`postgres.standbymessageinterval`, default 10s) */
  final class Session(
      startLsn: Long = 0L,
      typeIsArray: Map[Int, Boolean] = Map.empty,
      skipAcknowledge: Boolean = false,
      standbyIntervalMicros: Long = 10000000L,
      notNullIdentity: Map[String, Set[String]] = Map.empty,
      expectedColumns: Map[String, Seq[(String, org.apache.spark.sql.types.DataType)]] = Map.empty) {

    val decoder = new PgOutput.Decoder(typeIsArray, notNullIdentity, expectedColumns)
    private var committed: Long = startLsn
    private var lastStatusMicros: Long = Long.MinValue
    private var closedFlag = false

    /** Last acknowledged (applied) position. */
    def committedLsn: Long = committed

    def isClosed: Boolean = closedFlag

    /** The target applied a batch up to `lsn` — the reference's
      * `committed.Set` after a successful write. No-op when
      * `skipAcknowledge` is set. */
    def commit(lsn: Long): Unit =
      if (!skipAcknowledge) committed = math.max(committed, lsn)

    private def status(nowMicros: Long, replyRequested: Boolean): Array[Byte] = {
      lastStatusMicros = nowMicros
      encodeStandbyStatus(StandbyStatus(committed, committed, committed,
        PgOutput.toPgMicros(nowMicros), replyRequested))
    }

    /** Graceful close handshake (the reference's stop path: a last
      * standby-status update carrying everything applied so far, then
      * CopyDone — stream.go:94-105 + the supervisor Stop at
      * sync_service.go:224-237). Returns the frames to write to the
      * socket, in order; after the server answers with its own CopyDone
      * the connection is back in command mode. Idempotent: a second
      * close emits nothing. Feeding a closed session throws — the owner
      * must not interleave a drain with new traffic. */
    def close(nowMicros: Long): Seq[Array[Byte]] =
      if (closedFlag) Nil
      else {
        closedFlag = true
        Seq(status(nowMicros, replyRequested = false), CopyDoneFrame)
      }

    /** Idle-period heartbeat poll (no inbound frame to `feed`): a standby
      * status if the interval has elapsed, else None. The live loop calls
      * this on read timeouts so a quiet server still sees the client's
      * position on schedule — the reference's loop sends its status on a
      * timer independent of inbound traffic (stream.go:117-131). The
      * FIRST poll arms the timer: on a fully quiet stream (e.g.
      * wal_sender_timeout=0, no server keepalives, no changes) unsolicited
      * statuses still go out one interval after the session starts
      * pumping, so the slot's confirmed LSN advances server-side and WAL
      * retention stays bounded — without the arming, a silent stream
      * would never send any status at all. */
    def maybeHeartbeat(nowMicros: Long): Option[Array[Byte]] =
      if (closedFlag) None
      else if (lastStatusMicros == Long.MinValue) { lastStatusMicros = nowMicros; None }
      else if (nowMicros - lastStatusMicros < standbyIntervalMicros) None
      else Some(status(nowMicros, replyRequested = false))

    /** Feed one CopyData frame. `nowMicros` is the wall clock (unix µs),
      * injected so the heartbeat schedule is deterministic in tests. */
    def feed(frame: Array[Byte], nowMicros: Long): FeedResult = {
      if (closedFlag)
        throw new IllegalStateException("session closed: CopyDone already sent")
      val due = lastStatusMicros != Long.MinValue &&
        nowMicros - lastStatusMicros >= standbyIntervalMicros
      // arm the heartbeat clock on ANY first traffic (keepalives included):
      // from here on, statuses go out at least every standby interval
      if (lastStatusMicros == Long.MinValue) lastStatusMicros = nowMicros
      decodeCopyData(frame) match {
        case PrimaryKeepalive(end, _, reply) =>
          FeedResult(Nil,
            if (reply || due) Some(status(nowMicros, replyRequested = false)) else None,
            Some(end))
        case XLogData(_, _, _, payload) =>
          val msgs = decoder.feed(payload)
          FeedResult(msgs,
            if (due) Some(status(nowMicros, replyRequested = false)) else None,
            None)
      }
    }
  }

  /** Capture-file format for offline replay: a sequence of Int32
    * length-prefixed CopyData frames (what a thin recorder writes
    * verbatim off the socket). */
  def writeFrameFile(path: String, frames: Seq[Array[Byte]]): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path)))
    try frames.foreach { f => out.writeInt(f.length); out.write(f) }
    finally out.close()
  }

  def readFrameFile(path: String): Iterator[Array[Byte]] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    new Iterator[Array[Byte]] {
      private var nextFrame: Array[Byte] = advance()
      private def advance(): Array[Byte] =
        try {
          val len = in.readInt()
          val buf = new Array[Byte](len)
          in.readFully(buf)
          buf
        } catch { case _: java.io.EOFException => in.close(); null }
      def hasNext: Boolean = nextFrame != null
      def next(): Array[Byte] = {
        val f = nextFrame; nextFrame = advance(); f
      }
    }
  }
}
