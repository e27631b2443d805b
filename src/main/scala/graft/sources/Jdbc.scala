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
          b += RelColumn(name, oidOf(rs.getInt("DATA_TYPE")), pks.contains(name))
        } finally rs.close()
        b.result()
      }
      require(cols.nonEmpty, s"table not found (or has no columns): $table")
      Relation(schema.getOrElse(""), table, cols)
    } finally conn.close()
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
}
