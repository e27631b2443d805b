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
}
