package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{ChangeAction, ChangelogCompactor, PgTypes, PgValues, RelColumn, Relation}

/** Push-down MERGE apply against a JDBC warehouse — the engine's analogue
  * of the reference's Snowflake target (target/snowflake/snowflake_target.go):
  * stage the compacted batch into a `<table>__STAGE` table (the reference
  * PUTs CSV chunks into a temp stage, :283-340), then execute ONE SQL
  * `MERGE INTO` per table (:536-602):
  *
  *   matched ∧ delete-flag → DELETE
  *   matched               → per-column CASE: TOAST-unchanged → keep target
  *                           value; explicit NULL → NULL; unspecified →
  *                           keep; else new value
  *   not matched ∧ ¬delete → INSERT
  *
  * Unlike [[graft.cdc.MergeInto]] (which computes the merged snapshot in
  * Spark), only the micro-batch travels to the database and the MERGE runs
  * server-side — the snapshot never moves at all. Identity columns are
  * updated from the after-image values, so identity-changing updates
  * re-key server-side exactly as the reference's template does.
  *
  * Exercised end-to-end against embedded Derby (in `JdbcTargetSpec`) —
  * Derby implements ANSI MERGE, so the generated SQL is plain ANSI with
  * no engine-specific syntax. Identifiers are emitted UNQUOTED and
  * uppercase-normalized: quoted lowercase identifiers would make the
  * Spark-staged table unreferenceable from generated SQL.
  */
final class JdbcTarget(url: String, properties: Map[String, String] = Map.empty,
    schema: Option[String] = None) {

  JdbcTarget.ensureDialect(url)

  def withConnection[A](f: Connection => A): A = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def exec(sql: String): Unit = withConnection { c =>
    val st = c.createStatement(); try st.execute(sql) finally st.close()
  }

  private def tryExec(sql: String): Unit =
    try exec(sql) catch { case _: java.sql.SQLException => () }

  /** Target-side bootstrap (reference `setupSchema`,
    * snowflake_target.go:106-134): a first run against a fresh warehouse
    * must create its namespace, not fail on the first CREATE TABLE. With
    * `schema = None` every object lands in the connection's current/default
    * schema, mirroring the reference's use-the-session-schema branch. */
  schema.foreach { s =>
    val name = up(s)
    val exists = withConnection { c =>
      val rs = c.getMetaData.getSchemas
      try {
        var found = false
        while (!found && rs.next())
          found = name.equalsIgnoreCase(rs.getString("TABLE_SCHEM"))
        found
      } finally rs.close()
    }
    if (!exists) exec(s"CREATE SCHEMA $name")
  }

  /** Schema-qualified identifier for generated DDL/MERGE/staging SQL. */
  private def qual(name: String): String =
    schema.map(s => up(s) + ".").getOrElse("") + up(name)

  /** PG type OID → portable SQL DDL type — the reference's `getSfType`
    * (snowflake_target.go:675-714) re-targeted from Snowflake types to
    * ANSI ones. Arrays travel as their PG text literal (the reference
    * converts to JSON for VARIANT; a JDBC engine without VARIANT keeps
    * the text form). */
  def sqlType(c: RelColumn): String =
    if (c.isArray) "VARCHAR(32000)"
    else c.pgOid match {
      case PgTypes.BoolOid                          => "BOOLEAN"
      case PgTypes.Int2Oid                          => "SMALLINT"
      case PgTypes.Int4Oid                          => "INTEGER"
      case PgTypes.Int8Oid                          => "BIGINT"
      case PgTypes.Float4Oid                        => "REAL"
      case PgTypes.Float8Oid                        => "DOUBLE"
      case PgTypes.NumericOid                       => "DECIMAL(31,6)"
      case PgTypes.DateOid                          => "DATE"
      case PgTypes.TimestampOid | PgTypes.TimestamptzOid => "TIMESTAMP"
      case PgTypes.ByteaOid                         => "BLOB"
      case _                                        => "VARCHAR(32000)"
    }

  /** Uppercase-normalize an identifier for generated DDL/MERGE SQL, after
    * validating it against a safe pattern. Identifiers come from
    * source-database metadata and are emitted unquoted (see class doc), so
    * anything outside [A-Za-z0-9_] would break the statement — or worse, be
    * an injection surface into the target warehouse. The reference quotes
    * identifiers in its templates (snowflake_target.go); here quoting would
    * make the Spark-staged table unreferenceable, so unsafe names fail fast
    * instead. */
  private def up(name: String): String = {
    require(JdbcTarget.SafeIdentifier.pattern.matcher(name).matches(),
      s"unsafe SQL identifier '$name': only [A-Za-z_][A-Za-z0-9_]* can be " +
        "emitted into generated MERGE/DDL statements")
    name.toUpperCase(java.util.Locale.ROOT)
  }

  /** Typed staging value for one column: PG text → the column's type
    * (arrays keep their text literal, see [[sqlType]]). */
  private def typedValue(c: RelColumn) =
    if (c.isArray) element_at(col("values"), c.name)
    else PgValues.castText(element_at(col("values"), c.name), c.pgOid)

  /** Create the target table (reference InitializeRelation,
    * snowflake_target.go:139-217) and load the snapshot through the JDBC
    * writer (partitioned inserts = the reference's CSV chunk loop). */
  def initialize(rel: Relation, snapshot: DataFrame): Unit = {
    val t = qual(rel.table)
    tryExec(s"DROP TABLE $t")
    val cols = rel.columns.map(c => s"${up(c.name)} ${sqlType(c)}").mkString(", ")
    exec(s"CREATE TABLE $t ($cols)")
    val renamed = rel.columns.map(c => col(c.name).as(up(c.name)))
    Jdbc.WriteConf(url, t, properties = properties)
      .save(snapshot.select(renamed: _*), mode = "append")
  }

  /** Stage one table's compacted actions: DEL flag + before-image key
    * (K_*) + per-column value/null/has/unchanged (V_/N_/H_/U_) — the
    * reference's `_IDENTITY_*`, `_DELETE_ROW`, `_IS_NULL_*`,
    * `_IS_UNCHANGED_*` staging columns (snowflake_target.go:342-420). */
  def stage(rel: Relation, compacted: Dataset[ChangeAction]): String = {
    val stageTable = qual(rel.table) + "__STAGE"
    val keyCols = rel.columns.filter(_.isIdentity)
    tryExec(s"DROP TABLE $stageTable")
    val ddl = (Seq("DEL BOOLEAN") ++
      keyCols.map(c => s"K_${up(c.name)} ${sqlType(c)}") ++
      rel.columns.flatMap(c => Seq(
        s"V_${up(c.name)} ${sqlType(c)}",
        s"N_${up(c.name)} BOOLEAN",
        s"H_${up(c.name)} BOOLEAN",
        s"U_${up(c.name)} BOOLEAN"))).mkString(", ")
    exec(s"CREATE TABLE $stageTable ($ddl)")
    val projected = compacted.filter(col("table") === rel.table).select(
      (col("op") === "D").as("DEL") +:
      keyCols.map(c => PgValues.castText(element_at(col("keyBefore"), c.name), c.pgOid)
        .as(s"K_${up(c.name)}")) ++:
      rel.columns.flatMap { c =>
        Seq(
          typedValue(c).as(s"V_${up(c.name)}"),
          array_contains(col("nulls"), c.name).as(s"N_${up(c.name)}"),
          map_contains_key(col("values"), c.name).as(s"H_${up(c.name)}"),
          array_contains(col("unchanged"), c.name).as(s"U_${up(c.name)}"))
      }: _*)
    Jdbc.WriteConf(url, stageTable, properties = properties)
      .save(projected, mode = "append")
    stageTable
  }

  /** The per-table MERGE statement — the reference's template at
    * snowflake_target.go:536-602, ANSI-fied. */
  def mergeSql(rel: Relation): String = {
    val t = qual(rel.table)
    val s = t + "__STAGE"
    val on = rel.columns.filter(_.isIdentity)
      .map(c => s"T.${up(c.name)} = S.K_${up(c.name)}").mkString(" AND ")
    val updates = rel.columns.map { c =>
      val n = up(c.name)
      s"$n = CASE WHEN S.U_$n THEN T.$n WHEN S.N_$n THEN NULL " +
        s"WHEN S.H_$n THEN S.V_$n ELSE T.$n END"
    }.mkString(", ")
    val insertCols = rel.columns.map(c => up(c.name)).mkString(", ")
    val insertVals = rel.columns.map { c =>
      val n = up(c.name)
      s"CASE WHEN S.H_$n THEN S.V_$n ELSE NULL END"
    }.mkString(", ")
    s"""MERGE INTO $t T USING $s S ON $on
       |WHEN MATCHED AND S.DEL THEN DELETE
       |WHEN MATCHED THEN UPDATE SET $updates
       |WHEN NOT MATCHED AND NOT S.DEL THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
  }

  /** Compact and apply one batch of actions for `rel`: stage, MERGE,
    * drop the stage. Idempotent for a replayed batch (same stage +
    * MERGE → same final state), the property the reference's LSN
    * acknowledge + MERGE pair relies on. */
  def applyBatch(rel: Relation, actions: Dataset[ChangeAction]): Unit = {
    val compacted = ChangelogCompactor.compact(actions)
    val stageTable = stage(rel, compacted)
    exec(mergeSql(rel))
    tryExec(s"DROP TABLE $stageTable")
  }

  private def lsnTable: String = qual("GRAFT_APPLIED_LSN")

  /** Last batch LSN this target acknowledged (reads the in-database
    * record, so "all state is in the source and target"). */
  def appliedLsn(): Long = {
    ensureLsnTable()
    withConnection { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT LSN FROM $lsnTable")
        // empty table (create succeeded but the seed insert once failed)
        // reads as "nothing applied" rather than a cursor exception
        try { if (rs.next()) rs.getLong(1) else Long.MinValue } finally rs.close()
      } finally st.close()
    }
  }

  /** Seed the applied record at a backfill's consistent point (monotonic:
    * never rewinds an already-applied position). */
  def seedAppliedLsn(lsn: Long): Unit =
    if (lsn > appliedLsn()) exec(s"UPDATE $lsnTable SET LSN = $lsn")

  /** CREATE and seed are handled separately: a CREATE failure just means
    * the table exists, but the seed INSERT is re-attempted whenever the
    * table is empty, so one transient insert failure can't leave
    * GRAFT_APPLIED_LSN permanently unseeded. */
  private def ensureLsnTable(): Unit = {
    tryExec(s"CREATE TABLE $lsnTable (LSN BIGINT)")
    withConnection { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $lsnTable")
        val empty = try { rs.next(); rs.getLong(1) == 0L } finally rs.close()
        if (empty)
          st.execute(s"INSERT INTO $lsnTable VALUES (${Long.MinValue})")
      } finally st.close()
    }
  }

  /** Apply one MULTI-TABLE batch in ONE database transaction — the
    * reference's one-warehouse-transaction-per-batch
    * (snowflake_target.go:283-340: a single Postgres transaction can
    * touch several tables, so their merges must become visible
    * together). Staging happens outside the transaction (the reference's
    * temp-stage uploads are too — Snowflake ends transactions on DDL);
    * the transaction covers every MERGE plus the applied-LSN update, so
    * a crash mid-batch rolls the target back to the previous consistent
    * state and a replayed batch is skipped by the LSN check.
    *
    * @return false when the batch was already applied (replay). */
  def applyBatchTransactional(rels: Seq[Relation], actions: Dataset[ChangeAction],
      maxLsn: Long): Boolean = {
    if (maxLsn <= appliedLsn()) return false
    // materialize the compaction ONCE: each stage() call executes its input,
    // so a multi-table batch would otherwise re-run the whole compaction
    // (probe + shuffle + fold) per relation
    val compactedPlan = ChangelogCompactor.compact(actions)
    val compacted =
      if (rels.sizeIs > 1) compactedPlan.persist() else compactedPlan
    val staged =
      try rels.map(r => r -> stage(r, compacted))
      finally if (rels.sizeIs > 1) compacted.unpersist(blocking = false)
    withConnection { c =>
      c.setAutoCommit(false)
      try {
        val st = c.createStatement()
        try {
          staged.foreach { case (r, _) => st.execute(mergeSql(r)) }
          st.execute(s"UPDATE $lsnTable SET LSN = $maxLsn")
        } finally st.close()
        c.commit()
      } catch {
        case e: Throwable =>
          try c.rollback() catch { case _: java.sql.SQLException => () }
          throw e
      }
    }
    staged.foreach { case (_, s) => tryExec(s"DROP TABLE $s") }
    true
  }

  /** Read a table back (key-ordered read is the caller's concern). */
  def read(spark: SparkSession, table: String): DataFrame =
    Jdbc.ReadConf(url, qual(table), properties = properties).load(spark)
}

object JdbcTarget {

  /** Identifiers safe to emit unquoted into generated SQL (see [[JdbcTarget.up]]). */
  val SafeIdentifier: scala.util.matching.Regex = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Spark's built-in Derby dialect maps StringType → CLOB, and Derby
    * refuses CLOB-typed null parameters against VARCHAR columns (and CLOB
    * columns can't be compared at all, which would break MERGE keys).
    * This dialect keeps strings as VARCHAR and booleans as BOOLEAN;
    * everything else falls through to Spark's common JDBC mappings,
    * which Derby accepts. Registered once, only for jdbc:derby URLs. */
  private object DerbyCompatDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.jdbc.JdbcType
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType  => Some(JdbcType("VARCHAR(32000)", java.sql.Types.VARCHAR))
      case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
      case ByteType | ShortType => Some(JdbcType("SMALLINT", java.sql.Types.SMALLINT))
      case t: DecimalType => // Derby caps precision at 31
        Some(JdbcType(s"DECIMAL(${math.min(t.precision, 31)},${math.min(t.scale, 6)})",
          java.sql.Types.DECIMAL))
      case _ => None
    }
  }

  @volatile private var dialectRegistered = false

  private def ensureDialect(url: String): Unit =
    if (url.startsWith("jdbc:derby") && !dialectRegistered) synchronized {
      if (!dialectRegistered) {
        org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyCompatDialect)
        dialectRegistered = true
      }
    }
}
