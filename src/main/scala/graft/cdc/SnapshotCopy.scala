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

  private def quoteIdent(id: String): String = PgSql.quoteIdent(id)

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

  // ------------------------------------------------- wire introspection --

  private def quoteLit(s: String): String = PgSql.quoteLit(s)

  /** Column catalog for one table over the text protocol — the essential
    * columns of the reference's introspection CTE (sync_service.go:
    * 323-381: attname, indisprimary, atttypid, typcategory='A'),
    * parameter-inlined because the simple-query protocol has no binds,
    * plus attnotnull + relreplident so [[introspectRelation]] can decide
    * [[Relation.nullableIdentity]] precisely (the wire's Relation message
    * carries the replica-identity setting but not nullability).
    * For array columns the recorded OID is the ELEMENT type's (typelem),
    * matching what pgoutput tuple data carries. */
  def introspectSql(schema: String, table: String): String =
    s"""select a.attname,
       |  coalesce(i.indisprimary, false) as pk,
       |  case when pgt.typcategory = 'A' then pgt.typelem else a.atttypid end as oid,
       |  pgt.typcategory = 'A' as is_array,
       |  a.attnotnull as not_null,
       |  c.relreplident as replident
       |from pg_attribute a
       |  join pg_class c on c.oid = a.attrelid
       |  join pg_namespace n on n.oid = c.relnamespace
       |  left join pg_type pgt on a.atttypid = pgt.oid
       |  left join pg_index i on a.attrelid = i.indrelid
       |    and a.attnum = any (i.indkey) and i.indisprimary
       |where a.attnum > 0 and not a.attisdropped
       |  and c.relkind in ('r', 'p')
       |  and n.nspname = ${quoteLit(schema)} and c.relname = ${quoteLit(table)}
       |order by a.attnum""".stripMargin

  /** Introspect over an open wire connection (no JDBC): text-protocol
    * booleans arrive as `t`/`f`, OIDs as decimal text. `relreplident` is a
    * catalog "char" — `f` (FULL) is the only setting whose identity
    * columns can be nullable, and then only the ones without a NOT NULL
    * constraint; PK/index identities are NOT NULL by Postgres's rules. */
  def introspectRelation(conn: PgConnect.Conn, schema: String,
      table: String): Relation = {
    val res = conn.simpleQuery(introspectSql(schema, table))
    val cols = res.rows.map { r =>
      RelColumn(
        name = r(0).getOrElse(sys.error("null attname")),
        pgOid = r(2).getOrElse(sys.error("null oid")).toInt,
        isIdentity = r(1).contains("t"),
        isArray = r(3).contains("t"),
        notNull = r.lift(4).flatten.contains("t"))
    }
    require(cols.nonEmpty, s"table not found (or has no columns): $schema.$table")
    val replident = res.rows.head.lift(5).flatten.getOrElse("d")
    Relation(schema, table, cols,
      nullableIdentity = replident == "f" &&
        cols.exists(c => c.isIdentity && !c.notNull))
  }

  /** Wire-protocol twin of [[graft.sources.Jdbc.introspectArrayTypes]]
    * (same pg_type scan, text-protocol booleans) for the live path, where
    * no JDBC driver exists. Feeds [[PgOutput.Decoder]]'s typeIsArray map
    * so the configured-shape guard can verify array-typed columns: the
    * wire announces the ARRAY type's OID while introspection records the
    * element's, and only this map bridges the two. Array-ness of a pg_type
    * OID is immutable, so one scan per process is enough. */
  def introspectArrayTypes(conn: PgConnect.Conn): Map[Int, Boolean] =
    conn.simpleQuery(graft.sources.Jdbc.PgArrayTypesSql).rows.flatMap { r =>
      for (oid <- r.headOption.flatten; arr <- r.lift(1).flatten)
        yield oid.toInt -> (arr == "t")
    }.toMap
}
