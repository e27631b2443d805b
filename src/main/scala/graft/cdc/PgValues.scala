package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Postgres text-format value decoding.
  *
  * The reference receives every value as Postgres *text format* (CSV from
  * COPY for backfill, tuple text from logical replication) and leaves it to
  * the target to type it (reference: target/interface.go:10-14). Here the
  * typing is done with native, codegen-friendly column expressions so the
  * cast sits inside WholeStageCodegen next to the scan.
  */
object PgValues {

  /** Typed column from a PG text-format value of the given type OID.
    * `numericMode` decides what an out-of-`decimal(38,18)`-range numeric
    * does: fail the cast (ANSI, default), TRY-cast to NULL, or stay text —
    * see [[PgTypes.NumericMode]]. */
  def castText(c: Column, oid: Int, isArray: Boolean = false,
      numericMode: PgTypes.NumericMode = PgTypes.NumericAnsi): Column =
    if (isArray) castArrayText(c, oid)
    else oid match {
      case PgTypes.BoolOid =>
        // PG text bools are 't'/'f' (bool_out); accept true/false too.
        when(c === "t", lit(true)).when(c === "f", lit(false))
          .otherwise(c.cast(BooleanType))
      case PgTypes.ByteaOid =>
        // PG hex bytea text format: "\x0a0b…" (byteaout)
        unhex(regexp_replace(c, "^\\\\x", ""))
      case PgTypes.NumericOid => numericMode match {
        case PgTypes.NumericText       => c.cast(StringType)
        case PgTypes.NumericAnsi       => c.cast(PgTypes.toSpark(oid))
        case PgTypes.NumericPermissive => tryCast(c, PgTypes.toSpark(oid))
      }
      case _ => c.cast(PgTypes.toSpark(oid))
    }

  /** PG json/jsonb → Spark VARIANT — the engine's analogue of the
    * reference's json→Snowflake-VARIANT mapping (getSfType:690): parse
    * once, then path-extract with [[jsonGet]] /
    * `functions.variant_get`. The storage column stays the PG text
    * (schema-on-read, like VARIANT). */
  def jsonVariant(c: Column): Column = parse_json(c)

  /** Typed path extraction from a VARIANT json column:
    * `jsonGet(v, "$.a.b", "long")`. */
  def jsonGet(v: Column, path: String, targetType: String): Column =
    variant_get(v, path, targetType)

  /** Schema-on-read with a KNOWN schema: PG json text → typed struct. */
  def jsonTyped(c: Column, schema: DataType): Column =
    from_json(c, schema)

  /** TRY-semantics cast (overflow/malformed → NULL) regardless of the
    * session's ANSI setting. */
  private def tryCast(c: Column, to: DataType): Column =
    GraftBridge.column(org.apache.spark.sql.catalyst.expressions.Cast(
      GraftBridge.expression(c), to, None,
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))

  /** PG array literal (`{a,"b,c",NULL}`) → typed Spark array. The literal
    * parse is a codegen'd static call (StaticInvoke → PgArrayParser.parse),
    * the element typing stays native (`transform` + cast).
    * Reference behavior: target/common/arraytojson/arraytojson.go. */
  def castArrayText(c: Column, elemOid: Int): Column = {
    val parsed = GraftBridge.column(StaticInvoke(
      PgArrayParser.getClass,
      ArrayType(StringType, containsNull = true),
      "parse",
      Seq(GraftBridge.expression(c)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))
    transform(parsed, e => castText(e, elemOid))
  }

  /** Project a map<string,string> of PG text values to typed columns for a
    * relation (used when decoding generic changelogs to per-table frames). */
  def typedColumns(valueMap: Column, rel: Relation): Seq[Column] =
    rel.columns.map { col =>
      castText(element_at(valueMap, col.name), col.pgOid, col.isArray).as(col.name)
    }
}

/** Parser for the Postgres array text representation (array_out format):
  * `{elem,elem,…}` with `NULL` for nulls and double-quoted elements when
  * they contain the delimiter, braces, quotes, whitespace, or backslashes
  * (backslash-escaped inside quotes). One-dimensional arrays (the same
  * surface the reference's PGArrayToJSON covers).
  *
  * Kept as a static method so Catalyst's StaticInvoke can call it from
  * generated code without breaking WholeStageCodegen.
  */
object PgArrayParser {
  def parse(in: UTF8String): ArrayData = {
    if (in == null) return null
    val s = in.toString.trim
    if (s.length < 2 || s.charAt(0) != '{' || s.charAt(s.length - 1) != '}') return null
    val body = s.substring(1, s.length - 1)
    if (body.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val cur = new java.lang.StringBuilder
    var i = 0
    var inQuotes = false
    var wasQuoted = false
    def flush(): Unit = {
      val v = cur.toString
      out += (if (!wasQuoted && v == "NULL") null else UTF8String.fromString(v))
      cur.setLength(0)
      wasQuoted = false
    }
    while (i < body.length) {
      val ch = body.charAt(i)
      if (inQuotes) {
        if (ch == '\\' && i + 1 < body.length) { cur.append(body.charAt(i + 1)); i += 1 }
        else if (ch == '"') inQuotes = false
        else cur.append(ch)
      } else ch match {
        case '"' => inQuotes = true; wasQuoted = true
        case ',' => flush()
        case '\\' if i + 1 < body.length => cur.append(body.charAt(i + 1)); i += 1
        case c => cur.append(c)
      }
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }
}
