package graft.cdc

import org.apache.spark.sql.types._

/** Relation/column metadata, mirroring the reference's replication-protocol
  * schema cache (reference: sync/db/db.go:11-22 `Relation`/`Column`).
  *
  * `pgOid` is the Postgres catalog type OID delivered by logical
  * replication's Relation messages; `isIdentity` marks replica-identity
  * (key) columns; `isArray` marks array-typed columns (the reference
  * resolves this via pg_type introspection, sync/stream/stream.go).
  */
final case class RelColumn(
    name: String,
    pgOid: Int,
    isIdentity: Boolean = false,
    isArray: Boolean = false,
    notNull: Boolean = false)

/** @param nullableIdentity set true ONLY for REPLICA IDENTITY FULL
  *        sources whose identity columns can legally hold NULL (Postgres
  *        PK- and unique-index replica identities are NOT NULL by the
  *        database's own rules). MergeInto then joins identities
  *        null-safely (`<=>`) so NULL-keyed rows match — at the cost of
  *        the bucketed snapshot's exchange-free co-location, which
  *        null-safe join keys cannot use. */
final case class Relation(schema: String, table: String, columns: Seq[RelColumn],
    nullableIdentity: Boolean = false) {
  def qualifiedName: String = s"$schema.$table"
  def identityColumns: Seq[RelColumn] = columns.filter(_.isIdentity)
  def identityColumnNames: Seq[String] = identityColumns.map(_.name)
  def columnNames: Seq[String] = columns.map(_.name)

  /** Schema equality as the reference defines it (db.go:53-67): same
    * schema/table and column-wise same (name, identity, type). Used for
    * schema-change detection → full resync (stream.go ErrRelationChanged). */
  def equalsSchema(other: Relation): Boolean =
    schema == other.schema && table == other.table &&
      columns.size == other.columns.size &&
      columns.zip(other.columns).forall { case (a, b) =>
        a.name == b.name && a.isIdentity == b.isIdentity && a.pgOid == b.pgOid
      }

  def toStructType: StructType = toStructType(PgTypes.NumericAnsi)
  def toStructType(numericMode: PgTypes.NumericMode): StructType =
    StructType(columns.map(c =>
      StructField(c.name, PgTypes.toSpark(c.pgOid, c.isArray, numericMode))))
}

object Relation {
  /** qualified name → ALL columns introspection knows are NOT NULL.
    * Fed to [[PgOutput.Decoder]] so a REPLICA IDENTITY FULL relation whose
    * wire identity columns are all constrained NOT NULL keeps the `===`
    * join (and the bucketed snapshot's exchange-free co-location) instead
    * of the conservative `<=>` the wire alone would force. ALL NOT NULL
    * columns, not just introspected-identity (PK) ones: under FULL the
    * wire flags EVERY column as identity, so a PK-only map could never
    * prove a multi-column table non-nullable. (The authoritative flag for
    * the MERGE path is the introspected relation's own `nullableIdentity`,
    * decided from relreplident/attnotnull — this map serves the decoder's
    * wire-side relation cache.) */
  def notNullIdentityMap(rels: Seq[Relation]): Map[String, Set[String]] =
    rels.map(r => r.qualifiedName ->
      r.columns.filter(_.notNull).map(_.name).toSet).toMap

  /** qualified name → ordered (column name, Spark-mapped type), fed to
    * [[PgOutput.Decoder]]'s configured-shape guard so the FIRST relation
    * announcement of a fresh decoder generation is checked against what
    * the sync layer is configured with. Types are compared through
    * [[PgTypes.toSpark]] rather than raw OIDs because the wire and
    * introspection legitimately differ in representation (identity flags:
    * FULL marks every column; arrays: the wire carries the array type's
    * OID, introspection records the element's) — the Spark mapping is the
    * common denominator both sides decode INTO, so equality there is
    * exactly "the decode would produce the configured shape". The mode is
    * pinned to [[PgTypes.NumericAnsi]] on both sides (the guard compares
    * representations, so the pipeline's numeric policy must not skew one
    * side). */
  def expectedColumnsMap(rels: Seq[Relation]): Map[String, Seq[(String, DataType)]] =
    rels.map(r => r.qualifiedName -> r.columns.map(c =>
      c.name -> PgTypes.toSpark(c.pgOid, c.isArray, PgTypes.NumericAnsi))).toMap
}

/** Postgres OID → Spark type mapping, the analogue of the reference's
  * Snowflake type mapping (target/snowflake/snowflake_target.go:675-714
  * `getSfType`). OID values are the public pg_catalog constants.
  */
object PgTypes {

  /** Policy for PG `numeric` — PG numeric is UNBOUNDED precision while
    * Spark decimals cap at 38 digits, so values with more than 20 integer
    * digits (38-18) or more than 18 fractional digits cannot be represented
    * by the default mapping. The reference sidesteps this by keeping the
    * text and letting Snowflake NUMBER(38) handle it; Spark needs an
    * explicit decision:
    *
    *  - [[NumericAnsi]] (default): `decimal(38,18)`; an out-of-range value
    *    FAILS the cast loudly under ANSI mode (Spark 4's default) — no
    *    silent corruption, matches "error the batch" semantics.
    *  - [[NumericPermissive]]: `decimal(38,18)` via TRY cast; out-of-range
    *    becomes NULL (lossy, never throws mid-merge).
    *  - [[NumericText]]: keep the column as text, exactly as the reference
    *    ships it; consumers cast where they know the bound. */
  sealed trait NumericMode
  case object NumericAnsi extends NumericMode
  case object NumericPermissive extends NumericMode
  case object NumericText extends NumericMode
  // pg_catalog.pg_type OIDs (public constants, see postgres
  // src/include/catalog/pg_type.dat)
  val BoolOid = 16
  val ByteaOid = 17
  val Int8Oid = 20
  val Int2Oid = 21
  val Int4Oid = 23
  val TextOid = 25
  val JsonOid = 114
  val Float4Oid = 700
  val Float8Oid = 701
  val BpcharOid = 1042
  val VarcharOid = 1043
  val DateOid = 1082
  val TimestampOid = 1114
  val TimestamptzOid = 1184
  val NumericOid = 1700
  val JsonbOid = 3802
  val UuidOid = 2950

  /** Scalar mapping; reference maps json/jsonb → VARIANT and arrays →
    * ARRAY — Spark-side we keep json as a string column (query with
    * `from_json`/`get_json_object`) and arrays as ArrayType(StringType)
    * of element text (typed per-element downstream). Unknown OIDs fall
    * back to string, as the reference falls back to Snowflake STRING. */
  def toSpark(oid: Int, isArray: Boolean = false,
      numericMode: NumericMode = NumericAnsi): DataType =
    if (isArray) ArrayType(StringType)
    else if (oid == NumericOid && numericMode == NumericText) StringType
    else oid match {
      case BoolOid                     => BooleanType
      case Int2Oid                     => ShortType
      case Int4Oid                     => IntegerType
      case Int8Oid                     => LongType
      case Float4Oid                   => FloatType
      case Float8Oid                   => DoubleType
      case NumericOid                  => DecimalType(38, 18)
      case DateOid                     => DateType
      case TimestampOid                => TimestampNTZType
      case TimestamptzOid              => TimestampType
      case ByteaOid                    => BinaryType
      case JsonOid | JsonbOid          => StringType // VARIANT-equivalent
      case _                           => StringType
    }

  /** All OIDs with an explicit (non-fallback) mapping — the typed surface
    * the engine guarantees, mirroring the reference's typeMapping table. */
  val mappedOids: Seq[Int] = Seq(
    BoolOid, ByteaOid, Int8Oid, Int2Oid, Int4Oid, TextOid, JsonOid,
    Float4Oid, Float8Oid, BpcharOid, VarcharOid, DateOid, TimestampOid,
    TimestamptzOid, NumericOid, JsonbOid, UuidOid)
}
