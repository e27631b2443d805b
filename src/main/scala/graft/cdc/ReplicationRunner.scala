package graft.cdc

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{Socket, SocketTimeoutException}

/** The live I/O loop around the pure [[PgReplication.Session]] state
  * machine — the engine's analogue of the reference's socket-driven
  * stream loop (sync/stream/stream.go:104-230 against a live replication
  * connection): read CopyData frames off the wire, `Session.feed` them,
  * write the session's standby-status replies back, and on stop run the
  * graceful drain (final status + CopyDone).
  *
  * The split is deliberate: every protocol decision (what to ack, when a
  * heartbeat is due, how to close) lives in the SESSION, golden-tested
  * offline; the runner only moves bytes, so the whole live path is
  * testable over a scripted transport or a loopback socket — no Postgres
  * needed, and nothing here changes when one is present.
  */
object ReplicationRunner {

  /** Byte transport for an established replication stream.
    * [[readFrame]] returns the next CopyData PAYLOAD (framing stripped),
    * None when nothing arrived within the poll interval (the runner's cue
    * to heartbeat), and throws [[EOFException]] when the peer ended the
    * stream. */
  trait Transport {
    def readFrame(): Option[Array[Byte]]
    /** Send one CopyData payload (the transport adds framing). */
    def writeFrame(payload: Array[Byte]): Unit
    /** Send the raw frontend CopyDone message (already framed — it is a
      * top-level protocol message, NOT CopyData content). */
    def writeDone(): Unit
    def flush(): Unit
    def close(): Unit
  }
}

/** @param sink       decoded logical messages, in stream order (the
  *                    streaming source's enqueue)
  * @param onProgress keepalive-only WAL advance (no publishable events);
  *                    the owner commits it when nothing is in flight so
  *                    the slot never falls behind (stream.go:193-202)
  * @param clock      unix µs; injected for deterministic specs */
final class ReplicationRunner(
    session: PgReplication.Session,
    transport: ReplicationRunner.Transport,
    sink: WalMessage => Unit,
    onProgress: Long => Unit = _ => (),
    clock: () => Long = () => System.currentTimeMillis() * 1000L) {

  @volatile private var stopRequested = false

  /** Ask the loop to stop after the current iteration (the supervisor's
    * Stop path); [[run]] then performs the graceful drain. */
  def requestStop(): Unit = stopRequested = true

  /** One poll iteration: read (or time out), feed/heartbeat, write any
    * due reply. Returns false when the server ended the stream. Public so
    * specs can single-step the loop with a scripted clock. */
  def step(): Boolean =
    try {
      transport.readFrame() match {
        case Some(frame) =>
          val r = session.feed(frame, clock())
          r.messages.foreach(sink)
          r.progressLsn.foreach(onProgress)
          r.reply.foreach { b => transport.writeFrame(b); transport.flush() }
        case None =>
          session.maybeHeartbeat(clock())
            .foreach { b => transport.writeFrame(b); transport.flush() }
      }
      true
    } catch { case _: EOFException => false }

  /** Pump until [[requestStop]] or server EOF, then drain: the session's
    * close handshake (final standby status with everything applied, then
    * CopyDone) goes out best-effort — on a clean stop the server needs
    * it; after a hard peer close the writes fail and that's fine (the
    * supervisor's restart-from-confirmed-LSN path is the recovery), so a
    * dead socket must not turn a finished pump into an error. */
  def run(): Unit = {
    var live = true
    while (live && !stopRequested) live = step()
    try {
      session.close(clock()).foreach { f =>
        // close() emits two LAYERS: the status payload (CopyData content)
        // and the already-framed top-level CopyDone message
        if (f.length == 5 && f(0) == 'c'.toByte) transport.writeDone()
        else transport.writeFrame(f)
      }
      transport.flush()
    } catch { case _: java.io.IOException => () }
  }
}

/** COPY BOTH framing over an established connection: START_REPLICATION
  * has been issued and the server answered CopyBothResponse — connection
  * setup and auth stay with the connection's owner, exactly as the
  * reference delegates them to its driver (pglogrepl). PostgreSQL message
  * framing (public protocol docs): one type byte + Int32 length (length
  * covers itself, not the type byte). Inbound 'd' (CopyData) frames carry
  * replication payloads; 'c' (CopyDone) ends the stream; replies are
  * wrapped back into CopyData.
  *
  * Read timeouts between frames surface as None (the runner's heartbeat
  * cue). A timeout MID-frame aborts the connection instead of resyncing —
  * after a partial header the byte stream has no safe resync point, and
  * the supervisor's restart loop (resume from the slot's confirmed LSN)
  * is the recovery path, as in the reference. */
final class SocketCopyTransport(socket: Socket, pollMillis: Int = 200)
    extends ReplicationRunner.Transport {
  socket.setSoTimeout(pollMillis)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)

  def readFrame(): Option[Array[Byte]] = {
    val t =
      try in.read()
      catch { case _: SocketTimeoutException => return None }
    if (t < 0) throw new EOFException("server closed the stream")
    val body =
      try {
        val len = in.readInt()
        require(len >= 4, s"bad frame length $len")
        val b = new Array[Byte](len - 4)
        in.readFully(b)
        b
      } catch {
        case e: SocketTimeoutException =>
          throw new java.io.IOException("timeout mid-frame: stream desynced", e)
        case e: EOFException =>
          // an EOF after the type byte but before the body completes is a
          // TRUNCATED frame, not a clean stream end: escalate like the
          // mid-frame timeout so the runner doesn't mistake it for a
          // graceful server EOF and "drain" into a desynced peer
          throw new java.io.IOException("EOF mid-frame: stream truncated", e)
      }
    t.toChar match {
      case 'd' => Some(body)
      case 'c' => throw new EOFException("server CopyDone")
      case 'E' =>
        // an in-stream ErrorResponse is how the server terminates
        // replication (slot dropped/invalidated, recovery conflict,
        // wal_level change): surface its severity/SQLSTATE/message
        // instead of an undiagnosable "unexpected message 'E'"
        throw PgConnect.parseServerError(body)
      case other =>
        throw new IllegalStateException(s"unexpected message '$other' in COPY BOTH")
    }
  }

  def writeFrame(payload: Array[Byte]): Unit = {
    out.writeByte('d')
    out.writeInt(payload.length + 4)
    out.write(payload)
  }

  def writeDone(): Unit = out.write(PgReplication.CopyDoneFrame)

  def flush(): Unit = out.flush()
  def close(): Unit = socket.close()
}
