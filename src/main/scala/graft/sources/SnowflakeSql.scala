package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.cdc.{ChangeAction, PgTypes, PgValues, RelColumn, Relation}

/** Snowflake-dialect SQL generation — the engine's re-expression of the
  * reference target's warehouse-specific surface
  * (target/snowflake/snowflake_target.go), which [[JdbcTarget]]'s ANSI
  * path deliberately leaves out:
  *
  *   - `getSfType` (:675-714): PG OID → Snowflake types, with json/jsonb
  *     → VARIANT and every array type → ARRAY;
  *   - quoted, upper-cased three-part names `"DB"."SCHEMA"."TBL"` and the
  *     `_SCRATCH` convention (:615-646), table stages `@"DB"."SCH"."%TBL"`;
  *   - backfill (:139-217): create scratch → chunked `PUT` into the table
  *     stage → one `COPY INTO … pattern=…` → `SWAP WITH`/`RENAME TO`
  *     publish → drop scratch (Snowflake ends transactions on DDL, hence
  *     scratch-and-swap instead of a transaction);
  *   - micro-batch staging (:346-366, :430-520): temporary table of
  *     `_IDENTITY_*` / `_DELETE_ROW` / value / `_IS_UNCHANGED_*` /
  *     `_IS_NULL_*` columns, `PUT` + `COPY INTO`, then the MERGE template
  *     (:510-577) with per-column CASE semantics;
  *   - the array→JSON CSV transform feeding VARIANT/ARRAY columns
  *     (arrayToJsonXformer :652-673 over target/common/arraytojson).
  *
  * Everything here is PURE text/DataFrame generation, golden-tested —
  * execution is the trivial part (`JdbcTarget.withConnection`-style exec
  * with a Snowflake JDBC driver on the classpath; this sandbox has none),
  * and nothing else in the engine changes when one is present: the
  * staging frame is written as headered CSV by any Spark writer, and the
  * statement order is exactly the reference's.
  */
final class SnowflakeSql(database: String, schema: String) {

  private def up(s: String): String = s.toUpperCase(java.util.Locale.ROOT)
  private def q(s: String): String = "\"" + s + "\""

  /** (database, schema, TBL[_SCRATCH]) — snowflake_target.go:615-623. */
  def tableParts(rel: Relation, scratch: Boolean): (String, String, String) = {
    val t = up(rel.table) + (if (scratch) "_SCRATCH" else "")
    (database, schema, t)
  }

  /** Fully-qualified quoted name — :626-629. */
  def tableFq(rel: Relation, scratch: Boolean): String = {
    val (d, s, t) = tableParts(rel, scratch)
    s"${q(d)}.${q(s)}.${q(t)}"
  }

  /** Quoted table name only — :632-635 (the MERGE template's alias). */
  def tableOnly(rel: Relation, scratch: Boolean): String =
    q(tableParts(rel, scratch)._3)

  /** The implicit TABLE stage — :637-640. */
  def tableStage(rel: Relation, scratch: Boolean): String = {
    val (d, s, t) = tableParts(rel, scratch)
    s"@${q(d)}.${q(s)}.${q("%" + t)}"
  }

  /** Unquoted identifier unique per source table, safe in file names — :644-646. */
  def safeTableIdentifier(rel: Relation): String =
    s"${up(rel.schema)}_${up(rel.table)}"

  /** PG OID → Snowflake type (getSfType :675-714): arrays → ARRAY,
    * json/jsonb → VARIANT, ints collapse to INT, timestamps split
    * NTZ/TZ, unknown → STRING. */
  def sfType(c: RelColumn): String =
    if (c.isArray) "ARRAY"
    else c.pgOid match {
      case PgTypes.BoolOid                   => "BOOLEAN"
      case PgTypes.Int2Oid | PgTypes.Int4Oid | PgTypes.Int8Oid => "INT"
      case PgTypes.Float4Oid                 => "FLOAT4"
      case PgTypes.Float8Oid                 => "FLOAT8"
      case PgTypes.JsonOid | PgTypes.JsonbOid => "VARIANT"
      case PgTypes.DateOid                   => "DATE"
      case PgTypes.TimestampOid              => "TIMESTAMP_NTZ"
      case PgTypes.TimestamptzOid            => "TIMESTAMP_TZ"
      case _                                 => "STRING"
    }

  /** CSV file-format clause shared by every COPY — :29. */
  val copyFileFormat: String =
    """file_format = (type = 'CSV' field_delimiter = ',' field_optionally_enclosed_by='"' skip_header = 1)"""

  /** Namespace bootstrap — :79-134. */
  def setupStatements: Seq[String] = Seq(
    s"create database if not exists ${q(database)};",
    s"create schema if not exists ${q(database)}.${q(schema)};")

  /** `create or replace [temporary] table` with per-column sfTypes —
    * createTableStmt :368-384. */
  def createTable(rel: Relation, scratch: Boolean, temporary: Boolean = false): String = {
    val cols = rel.columns.map(c => s"${q(up(c.name))} ${sfType(c)}").mkString(", ")
    val tt = if (temporary) "temporary table" else "table"
    s"create or replace $tt ${tableFq(rel, scratch)} ($cols);"
  }

  // ---- backfill: scratch → chunked PUT → COPY → swap/rename (:139-217) ----

  /** PUT one local CSV chunk into the scratch table's stage. */
  def backfillPut(rel: Relation, opId: String, fileNum: Int): String =
    s"put 'file://${safeTableIdentifier(rel)}-$opId-$fileNum.csv' " +
      s"${tableStage(rel, scratch = true)} auto_compress=true parallel=30 overwrite=true;"

  /** One COPY INTO over every chunk of this operation. */
  def backfillCopy(rel: Relation, opId: String): String =
    s"copy into ${tableFq(rel, scratch = true)} from ${tableStage(rel, scratch = true)} " +
      s"pattern='.*/${safeTableIdentifier(rel)}-$opId-.*[.]csv.*' $copyFileFormat;"

  /** Atomic publish: SWAP when the live table exists, RENAME otherwise;
    * the scratch is dropped only after a swap (:193-214). */
  def publish(rel: Relation, targetExists: Boolean): Seq[String] =
    if (targetExists) Seq(
      s"alter table ${tableFq(rel, scratch = true)} swap with ${tableFq(rel, scratch = false)};",
      s"drop table ${tableFq(rel, scratch = true)};")
    else Seq(
      s"alter table ${tableFq(rel, scratch = true)} rename to ${tableFq(rel, scratch = false)};")

  // ---- micro-batch staging + MERGE (:346-366, :430-577) ----

  /** The staging-table column plan (columnDefForLoading :430-520), in the
    * reference's exact order: `_IDENTITY_*` (identity sfTypes),
    * `_DELETE_ROW`, the value columns, `_IS_UNCHANGED_*`, `_IS_NULL_*`. */
  def stagingColumns(rel: Relation): Seq[(String, String)] =
    rel.columns.filter(_.isIdentity).map(c => s"_IDENTITY_${up(c.name)}" -> sfType(c)) ++
      Seq("_DELETE_ROW" -> "BOOLEAN") ++
      rel.columns.map(c => up(c.name) -> sfType(c)) ++
      rel.columns.map(c => s"_IS_UNCHANGED_${up(c.name)}" -> "BOOLEAN") ++
      rel.columns.map(c => s"_IS_NULL_${up(c.name)}" -> "BOOLEAN")

  /** The full statement order for one table's batch, mirroring
    * `statements` (:346-366): temp staging table, PUT (the CSV stream
    * rides along), COPY INTO, MERGE. */
  def batchStatements(rel: Relation, fileName: String): Seq[String] = {
    val cols = stagingColumns(rel).map { case (n, t) => s"${q(n)} $t" }.mkString(", ")
    Seq(
      s"create or replace temporary table ${tableFq(rel, scratch = true)} ($cols);",
      s"put 'file://$fileName' ${tableStage(rel, scratch = true)} " +
        "auto_compress=true parallel=30 overwrite=true;",
      s"copy into ${tableFq(rel, scratch = true)} from " +
        s"${tableStage(rel, scratch = true)}/$fileName $copyFileFormat;",
      mergeStatement(rel))
  }

  /** The MERGE template (:510-577): match on `_IDENTITY_*`, matched+
    * `_DELETE_ROW` deletes, matched updates each column with
    * CASE(unchanged → keep target, null → NULL, else staged), not-matched
    * inserts with the NULL CASE. */
  def mergeStatement(rel: Relation): String = {
    val t = tableOnly(rel, scratch = false)
    val s = tableOnly(rel, scratch = true)
    val on = rel.columns.filter(_.isIdentity)
      .map(c => s"$t.${q(up(c.name))} = $s.${q(s"_IDENTITY_${up(c.name)}")}")
      .mkString(" and ")
    val updates = rel.columns.map { c =>
      val n = up(c.name)
      s"$t.${q(n)} = (case when $s.${q(s"_IS_UNCHANGED_$n")} then $t.${q(n)} " +
        s"when $s.${q(s"_IS_NULL_$n")} then null else $s.${q(n)} end)"
    }.mkString(", ")
    val insertCols = rel.columns.map(c => q(up(c.name))).mkString(", ")
    val insertVals = rel.columns.map { c =>
      val n = up(c.name)
      s"case when $s.${q(s"_IS_NULL_$n")} then null else $s.${q(n)} end"
    }.mkString(", ")
    s"merge into ${tableFq(rel, scratch = false)} using ${tableFq(rel, scratch = true)} on $on " +
      s"when matched and $s.${q("_DELETE_ROW")} then delete " +
      s"when matched then update set $updates " +
      s"when not matched then insert ($insertCols) values ($insertVals);"
  }

  /** The staged batch as a DataFrame in [[stagingColumns]] order — what a
    * Spark CSV writer (header=true) PUTs. Array values go through the
    * PG-literal → JSON transform (arrayToJsonXformer :652-673), so
    * Snowflake's COPY parses them into ARRAY/VARIANT columns; everything
    * else stays PG text exactly as the reference's CSV does. */
  def stagingFrame(rel: Relation, compacted: Dataset[ChangeAction]): DataFrame = {
    def valueOf(c: RelColumn) = {
      val raw = element_at(col("values"), c.name)
      if (c.isArray) to_json(PgValues.castArrayText(raw, c.pgOid)) else raw
    }
    compacted.toDF().filter(col("table") === rel.table).select(
      rel.columns.filter(_.isIdentity)
        .map(c => element_at(col("keyBefore"), c.name).as(s"_IDENTITY_${up(c.name)}")) ++
        Seq((col("op") === "D").as("_DELETE_ROW")) ++
        rel.columns.map(c => valueOf(c).as(up(c.name))) ++
        // delete rows carry NO flag values: the reference's CSV leaves
        // these fields empty on deletes (columnDefForLoading's delete
        // branches), and the MERGE's delete arm wins before either flag is
        // read — so emit SQL NULL, not a fabricated false, for byte parity
        rel.columns.map(c => when(col("op") =!= "D",
          array_contains(col("unchanged"), c.name))
          .as(s"_IS_UNCHANGED_${up(c.name)}")) ++
        rel.columns.map(c => when(col("op") =!= "D",
          array_contains(col("nulls"), c.name))
          .as(s"_IS_NULL_${up(c.name)}")): _*)
  }
}
