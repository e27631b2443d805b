package graft.sources

/** Consistent-snapshot backfill coordination — the engine's analogue of
  * the reference's `snapshotToTarget` (sync/service/sync_service.go:159-222):
  * the initial table copy runs inside a REPEATABLE READ transaction pinned
  * to the replication slot's exported snapshot (`SET TRANSACTION SNAPSHOT
  * '<name>'`), so the copied state and the stream's consistent-point LSN
  * are EXACTLY aligned — no row between snapshot and stream start is lost
  * or double-applied.
  *
  * The reference copies each table over a single connection inside one
  * transaction. A Spark partitioned JDBC read opens one connection PER
  * PARTITION, so the pin must happen on every connection: Spark's
  * `sessionInitStatement` option runs after each connection opens, and an
  * exported snapshot may be attached by any number of concurrent
  * transactions while the exporting (replication) connection holds it
  * open. Every partition then reads the same frozen state — the
  * distributed form of the reference's single-transaction COPY.
  *
  * For sources that cannot pin a snapshot, [[convergesUnpinned]] states
  * the fallback contract GraftSyncConvergenceSpec proves: an unpinned
  * (even torn) backfill converges once the stream from the consistent
  * point is applied, because the MERGE is keyed and idempotent.
  */
object SnapshotBackfill {

  /** Exported snapshot names are `XXXXXXXX-XXXXXXXX-N` (pg_export_snapshot
    * format); reject anything that could escape the SQL literal. */
  private val SnapshotName = "[0-9A-Fa-f]{8}-[0-9A-Fa-f]{8}-[0-9]+".r

  def requireValidSnapshotName(name: String): String = name match {
    case SnapshotName() => name
    case other => throw new IllegalArgumentException(
      s"not a pg_export_snapshot name: '$other'")
  }

  /** The per-connection pin. REPEATABLE READ is required: a snapshot can
    * only be attached to a transaction at that isolation level or above,
    * and it must be the transaction's first statement — which is exactly
    * when Spark runs `sessionInitStatement`. */
  def pinnedInitStatement(snapshotName: String): String =
    s"BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; " +
      s"SET TRANSACTION SNAPSHOT '${requireValidSnapshotName(snapshotName)}'"

  /** Partitioned backfill read of one table, every partition pinned to the
    * slot's exported snapshot. Bounds partition the key range exactly like
    * [[Jdbc.partitionedTable]]; the snapshot makes the partitions mutually
    * consistent. */
  def pinnedRead(url: String, table: String, keyColumn: String,
      snapshotName: String, lower: Long, upper: Long,
      numPartitions: Int = 32,
      properties: Map[String, String] = Map.empty): Jdbc.ReadConf =
    Jdbc.ReadConf(url, table, Some(keyColumn), Some(lower), Some(upper),
      numPartitions,
      properties = properties +
        ("sessionInitStatement" -> pinnedInitStatement(snapshotName)))

  /** The unpinned-fallback convergence contract, stated as code so the
    * spec can quote it: with backfill state B read at ANY time at-or-after
    * the consistent point C, and the change stream replayed from C,
    *
    *   apply(B, changes_&gt;C)  ==  apply(S0, changes_&gt;C)  ==  final source state
    *
    * for keyed last-writer-wins MERGE semantics, because every divergence
    * of B from the consistent-point state S0 is itself the image of some
    * change with LSN &gt; C, which the replay re-applies (idempotently —
    * same key, same values) on top. Requires: inserts upsert on conflict,
    * deletes tolerate missing rows — both already MergeInto semantics. */
  def convergesUnpinned: Boolean = true
}
