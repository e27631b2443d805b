package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC source/sink configuration — the engine's analogue of the
  * reference's Postgres/warehouse connections (cmd/mammoth/main.go,
  * config/config.go `postgres.connection` / `snowflake.connection`).
  *
  * Reads are partitioned on a numeric column so a backfill of a huge table
  * fans out across executors (the reference streams one COPY per table —
  * here each partition issues its own bounded range query). No database is
  * reachable in the test environment, so these builders are exercised at
  * the plan/option level only (JdbcConfSpec).
  */
object Jdbc {

  final case class ReadConf(
      url: String,
      table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 32,
      fetchSize: Int = 10000,
      properties: Map[String, String] = Map.empty) {

    def options: Map[String, String] = {
      val base = Map(
        "url" -> url,
        "dbtable" -> table,
        "fetchsize" -> fetchSize.toString) ++ properties
      partitionColumn match {
        case Some(c) => base ++ Map(
          "partitionColumn" -> c,
          "lowerBound" -> lowerBound.getOrElse(0L).toString,
          "upperBound" -> upperBound.getOrElse(Long.MaxValue).toString,
          "numPartitions" -> numPartitions.toString)
        case None => base
      }
    }

    def reader(spark: SparkSession): DataFrameReader =
      spark.read.format("jdbc").options(options)

    def load(spark: SparkSession): DataFrame = reader(spark).load()
  }

  final case class WriteConf(
      url: String,
      table: String,
      batchSize: Int = 10000,
      isolationLevel: String = "READ_COMMITTED",
      properties: Map[String, String] = Map.empty) {

    def options: Map[String, String] = Map(
      "url" -> url,
      "dbtable" -> table,
      "batchsize" -> batchSize.toString,
      "isolationLevel" -> isolationLevel) ++ properties

    def save(df: DataFrame, mode: String = "append"): Unit =
      df.write.format("jdbc").options(options).mode(mode).save()
  }

  /** Snapshot read of one table, partitioned on its key column — the
    * backfill source (reference: snapshotToTarget,
    * sync/service/sync_service.go). */
  def partitionedTable(url: String, table: String, keyColumn: String,
      lower: Long, upper: Long, numPartitions: Int = 32): ReadConf =
    ReadConf(url, table, Some(keyColumn), Some(lower), Some(upper), numPartitions)

  /** Introspect one table over JDBC metadata → [[Relation]] — the
    * reference reads the Postgres catalog at startup to learn column
    * types and replica identity; `DatabaseMetaData` is the
    * engine-portable form (exercised against embedded Derby). Primary-key
    * columns become the replica identity; JDBC types map into the
    * engine's PG-OID vocabulary. */
  def introspect(url: String, schema: Option[String], table: String,
      properties: Map[String, String] = Map.empty): graft.cdc.Relation = {
    import graft.cdc.{RelColumn, Relation}
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      val pks = {
        val rs = md.getPrimaryKeys(null, schema.orNull, table)
        val b = Seq.newBuilder[String]
        try while (rs.next()) b += rs.getString("COLUMN_NAME") finally rs.close()
        b.result().toSet
      }
      val cols = {
        val rs = md.getColumns(null, schema.orNull, table, null)
        val b = Seq.newBuilder[RelColumn]
        try while (rs.next()) {
          val name = rs.getString("COLUMN_NAME")
          val jdbcType = rs.getInt("DATA_TYPE")
          val notNull =
            rs.getInt("NULLABLE") == java.sql.DatabaseMetaData.columnNoNulls
          // Array columns: JDBC reports Types.ARRAY with the PG element
          // type recoverable from TYPE_NAME ("_int4" → int4[]). The OID
          // recorded is the ELEMENT type's, as the pgoutput tuple data
          // carries element-typed array literals (PgValues.pgArrayParse).
          if (jdbcType == java.sql.Types.ARRAY)
            b += RelColumn(name, oidOfTypeName(rs.getString("TYPE_NAME")),
              pks.contains(name), isArray = true, notNull = notNull)
          else
            b += RelColumn(name,
              oidOfColumn(jdbcType, rs.getString("TYPE_NAME")),
              pks.contains(name), notNull = notNull)
        } finally rs.close()
        b.result()
      }
      require(cols.nonEmpty, s"table not found (or has no columns): $table")
      Relation(schema.getOrElse(""), table, cols)
    } finally conn.close()
  }

  /** Catalog scan → PG type OID → is-array, the map [[graft.cdc.PgOutput.Decoder]]
    * needs to route wire values through the array-literal parser (reference:
    * sync/stream/stream.go:435-460 `introspectArrayTypes`, `pgt.typcategory
    * = 'A'`). Runs against a live Postgres; any source whose catalog can
    * answer `(oid int, is_array bool)` rows works (the spec drives it
    * through an embedded-Derby mock of the same shape). */
  def introspectArrayTypes(url: String,
      properties: Map[String, String] = Map.empty,
      catalogSql: String = PgArrayTypesSql): Map[Int, Boolean] = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(catalogSql)
        val b = Map.newBuilder[Int, Boolean]
        try while (rs.next()) b += rs.getInt(1) -> rs.getBoolean(2)
        finally rs.close()
        b.result()
      } finally st.close()
    } finally conn.close()
  }

  /** The reference's catalog query, minus its unused enum column. */
  val PgArrayTypesSql: String =
    "select pgt.oid as data_type_oid, pgt.typcategory = 'A' as is_array " +
      "from pg_type as pgt order by data_type_oid"

  /** Scalar-column OID from (DATA_TYPE, TYPE_NAME). pgjdbc reports
    * java.sql.Types.TIMESTAMP for BOTH timestamp and timestamptz (it
    * predates TIMESTAMP_WITH_TIMEZONE), but the wire Relation message
    * announces OID 1184 for timestamptz — mapping on DATA_TYPE alone
    * would seed the configured-shape type guard (PgOutput expectedColumns)
    * with TimestampOid and make every relation announcement raise
    * SchemaChangedException: a non-converging resync loop for any
    * timestamptz column introspected over JDBC. TYPE_NAME disambiguates
    * the timestamp family. */
  private[sources] def oidOfColumn(jdbcType: Int, typeName: String): Int = {
    val tn = Option(typeName).getOrElse("").toLowerCase
    if (jdbcType == java.sql.Types.TIMESTAMP &&
        (tn == "timestamptz" || tn == "timestamp with time zone"))
      graft.cdc.PgTypes.TimestamptzOid
    else oidOf(jdbcType)
  }

  /** java.sql.Types → the engine's PG OID vocabulary (inverse direction
    * of PgTypes.toSpark / the reference's getSfType). */
  private def oidOf(jdbcType: Int): Int = {
    import java.sql.{Types => T}
    import graft.cdc.PgTypes._
    jdbcType match {
      case T.BOOLEAN | T.BIT                 => BoolOid
      case T.TINYINT | T.SMALLINT            => Int2Oid
      case T.INTEGER                         => Int4Oid
      case T.BIGINT                          => Int8Oid
      case T.REAL                            => Float4Oid
      case T.FLOAT | T.DOUBLE                => Float8Oid
      case T.NUMERIC | T.DECIMAL             => NumericOid
      case T.DATE                            => DateOid
      case T.TIMESTAMP                       => TimestampOid
      case T.TIMESTAMP_WITH_TIMEZONE         => TimestamptzOid
      case T.BINARY | T.VARBINARY | T.LONGVARBINARY | T.BLOB => ByteaOid
      case _                                 => TextOid
    }
  }

  /** PG type NAME → element OID, for array columns where JDBC only exposes
    * the internal array type name (`_int4`, `_text`, ...). Unknown names
    * degrade to text, matching the reference's text-passthrough default. */
  private[sources] def oidOfTypeName(typeName: String): Int = {
    import graft.cdc.PgTypes._
    val elem = Option(typeName).getOrElse("").stripPrefix("_").toLowerCase
    elem match {
      case "bool" | "boolean"                   => BoolOid
      case "int2" | "smallint"                  => Int2Oid
      case "int4" | "int" | "integer" | "serial" => Int4Oid
      case "int8" | "bigint" | "bigserial"      => Int8Oid
      case "float4" | "real"                    => Float4Oid
      case "float8" | "double precision"        => Float8Oid
      case "numeric" | "decimal"                => NumericOid
      case "date"                               => DateOid
      case "timestamp"                          => TimestampOid
      case "timestamptz"                        => TimestamptzOid
      case "bytea"                              => ByteaOid
      case _                                    => TextOid
    }
  }
}
