package graft.cdc

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{PgCsv, SnapshotBackfill}

/** Native COPY snapshot backfill — the reference's snapshotToTarget flow
  * (sync/service/sync_service.go:159-221) without JDBC: one REPEATABLE
  * READ transaction pinned to the slot's exported snapshot, then
  * `copy <rel> to stdout with (format csv, header true)` per table over
  * the SAME connection, streamed to spool files that Spark reads through
  * [[graft.sources.PgCsv]]'s PG-text decode (so backfill and stream agree
  * on value semantics).
  *
  * This is the path for a plain `postgres://` endpoint with no JDBC
  * driver configured: [[PgConnect]] owns startup/auth, [[SlotLifecycle]]
  * decides backfill-vs-resume, this object moves the consistent image.
  * All tables MUST ride one transaction — per-table transactions would
  * each see a different database state (the reference makes the same
  * point by refusing to parallelize across its single snapshot tx).
  *
  * Scale note: the COPY stream is driver-side (single PG connection —
  * the wire protocol offers nothing better), but it spools to disk in
  * chunk-sized writes and Spark's CSV reader then splits the files by
  * `maxPartitionBytes` across executors; for cluster-parallel backfill
  * of a huge table, [[graft.sources.SnapshotBackfill.pinnedRead]]
  * (key-range-partitioned JDBC, every partition pinned to the same
  * snapshot) is the wide path. */
object SnapshotCopy {

  val beginSql: String = "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ"
  val commitSql: String = "COMMIT"

  def setSnapshotSql(snapshotName: String): String =
    s"SET TRANSACTION SNAPSHOT " +
      s"'${SnapshotBackfill.requireValidSnapshotName(snapshotName)}'"

  private def quoteIdent(id: String): String =
    "\"" + id.replace("\"", "\"\"") + "\""

  /** Lowercase `copy … to stdout`, csv + header — byte-matching the
    * reference's statement at sync_service.go:207. */
  def copySql(rel: Relation): String =
    s"copy ${quoteIdent(rel.schema)}.${quoteIdent(rel.table)} to stdout " +
      "with (format csv, header true)"

  final case class SpooledTable(relation: Relation, path: Path, bytes: Long)

  /** Spool every relation's consistent image to `spoolDir` as
    * CSV-with-header files. The caller owns the connection; the exported
    * snapshot is only valid while the connection that created the slot
    * is open, which is exactly the [[SlotLifecycle.BackfillFromSnapshot]]
    * window. */
  def spoolTables(conn: PgConnect.Conn, snapshotName: String,
      relations: Seq[Relation], spoolDir: Path): Seq[SpooledTable] = {
    Files.createDirectories(spoolDir)
    conn.simpleQuery(beginSql)
    try {
      conn.simpleQuery(setSnapshotSql(snapshotName))
      relations.map { rel =>
        val p = spoolDir.resolve(s"${rel.schema}_${rel.table}.csv")
        val os = Files.newOutputStream(p)
        val n = try conn.copyOut(copySql(rel), os) finally os.close()
        SpooledTable(rel, p, n)
      }
    } finally conn.simpleQuery(commitSql)
  }

  /** Read one spooled table as a typed DataFrame — header on (the
    * reference always COPYs `header true`), PG text-format decode. */
  def read(spark: SparkSession, spooled: SpooledTable): DataFrame =
    PgCsv.read(spark, spooled.relation, spooled.path.toString, header = true)
}
