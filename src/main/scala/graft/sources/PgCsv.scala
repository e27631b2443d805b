package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.cdc.{PgValues, Relation}

/** CSV backfill source: the reference receives `COPY ... TO STDOUT (FORMAT
  * csv)` text and splits it into bounded chunks for loading
  * (target/interface.go:10-14, target/common/csvsplit). Spark-side, the
  * chunking is native (one task per `maxPartitionBytes` split — no
  * driver-side splitting), and typing goes through the same PG text-format
  * decode the streaming path uses, so backfill and stream agree on value
  * semantics. */
object PgCsv {

  /** Read a PG-text-format CSV for `relation`: every column lands as text,
    * then [[PgValues]] types it. `header=false` matches COPY's default. */
  def read(spark: SparkSession, relation: Relation, path: String,
      header: Boolean = false): DataFrame = {
    val raw = spark.read
      .schema(StructType(relation.columns.map(c => StructField(c.name, StringType))))
      .option("header", header.toString)
      // COPY csv emits empty-unquoted for NULL by default
      .option("nullValue", "")
      .csv(path)
    raw.select(relation.columns.map(c =>
      PgValues.castText(col(c.name), c.pgOid, c.isArray).as(c.name)): _*)
  }
}
