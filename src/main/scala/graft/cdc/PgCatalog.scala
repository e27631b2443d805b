package graft.cdc

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket

/** Wire-backed [[SlotLifecycle.Catalog]] — the production port the
  * reference's `Run` prologue drives (sync_service.go:60-131), built on
  * the same no-JDBC text-protocol stack as [[SnapshotCopy]]:
  *
  *  - catalog reads and DDL run on a POOL connection (plain startup,
  *    simple-query protocol);
  *  - `CREATE_REPLICATION_SLOT` runs on a REPLICATION connection
  *    (walsender command), which is then HELD OPEN: the slot's exported
  *    snapshot is only valid while the creating connection lives
  *    (stream.go:53-68), which is exactly the backfill window — `close()`
  *    ends it.
  *
  * The pool connection doubles as the backfill connection: the caller
  * introspects relations and `SnapshotCopy.spoolTables` through
  * [[poolConn]], pinned to the exported snapshot. */
final class PgCatalog(ep: PgConnect.Endpoint) extends SlotLifecycle.Catalog
    with AutoCloseable {

  private var poolSocket: Socket = _
  private var pool: PgConnect.Conn = _
  private var slotSocket: Socket = _
  private var closed = false

  /** Plain-SQL connection (lazy): catalog queries, DDL, and the
    * snapshot-pinned COPY backfill all share it. Throws after [[close]] —
    * silently reopening would hand back a connection OUTSIDE the slot's
    * exported snapshot, breaking the pinning this class exists to hold. */
  def poolConn: PgConnect.Conn = {
    if (closed) throw new IllegalStateException(
      "PgCatalog is closed: the exported-snapshot window has ended")
    if (pool == null) {
      poolSocket = new Socket(ep.host, ep.port)
      pool = new PgConnect.Conn(
        new DataInputStream(poolSocket.getInputStream),
        new DataOutputStream(poolSocket.getOutputStream))
      pool.startup(ep.config.copy(replication = false))
    }
    pool
  }

  override def publicationTables(pubName: String): Seq[(String, String)] =
    poolConn.simpleQuery(SlotLifecycle.publicationTablesSql(pubName))
      .rows.map(r => (r(0).getOrElse(""), r(1).getOrElse("")))

  override def slotRestartLsn(slotName: String): Option[Long] =
    poolConn.simpleQuery(SlotLifecycle.slotStatusSql(slotName))
      .rows.headOption.flatMap(_.headOption.flatten).map(Lsn.parse)

  override def exec(sql: String): Unit = { poolConn.simpleQuery(sql); () }

  override def createSlot(slotName: String): SlotLifecycle.CreatedSlot = {
    if (closed) throw new IllegalStateException(
      "PgCatalog is closed: the exported-snapshot window has ended")
    require(slotSocket == null, "slot already created on this catalog")
    slotSocket = new Socket(ep.host, ep.port)
    val conn = new PgConnect.Conn(
      new DataInputStream(slotSocket.getInputStream),
      new DataOutputStream(slotSocket.getOutputStream))
    conn.startup(ep.config.copy(replication = true))
    val res = conn.simpleQuery(SlotLifecycle.createSlotCommand(slotName))
    // (slot_name, consistent_point, snapshot_name, output_plugin)
    val point = res.first("consistent_point")
      .getOrElse(sys.error("CREATE_REPLICATION_SLOT returned no consistent_point"))
    val snap = res.first("snapshot_name")
      .getOrElse(sys.error("CREATE_REPLICATION_SLOT returned no snapshot_name"))
    SlotLifecycle.CreatedSlot(snap, Lsn.parse(point))
  }

  /** Ends the exported-snapshot window (the slot itself persists).
    * Idempotent; after this every connection accessor throws. */
  override def close(): Unit = {
    closed = true
    Seq(slotSocket, poolSocket).foreach { s =>
      if (s != null) { try s.close() catch { case scala.util.control.NonFatal(_) => () } }
    }
    slotSocket = null; poolSocket = null; pool = null
  }
}
