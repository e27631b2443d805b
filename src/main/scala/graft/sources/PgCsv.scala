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

  /** PG `COPY (FORMAT csv)` emission options — defaults mirror PG's:
    * comma delimiter, `"` quote doubled as escape, empty-unquoted NULL,
    * no header (postgres COPY docs, "CSV Format"). */
  final case class CopyOptions(
      delimiter: String = ",",
      quote: String = "\"",
      escape: String = "\"",
      nullString: String = "",
      header: Boolean = false)

  /** Read a PG-text-format CSV for `relation`: every column lands as text,
    * then [[PgValues]] types it — the same decode path the stream uses. */
  def read(spark: SparkSession, relation: Relation, path: String,
      header: Boolean = false, options: CopyOptions = CopyOptions()): DataFrame = {
    val opts = if (header) options.copy(header = true) else options
    val raw = spark.read
      .schema(StructType(relation.columns.map(c => StructField(c.name, StringType))))
      .option("header", opts.header.toString)
      .option("sep", opts.delimiter)
      .option("quote", opts.quote)
      .option("escape", opts.escape)
      .option("nullValue", opts.nullString)
      .csv(path)
    // KNOWN DIVERGENCE from COPY: PG distinguishes quoted-empty ('') from
    // unquoted-empty (NULL); Spark's CSV reader normalizes both before the
    // nullValue check, so with the default nullString both land as NULL.
    // Exports that must preserve '' should COPY with NULL '\N'
    // (CopyOptions(nullString = "\\N")), which round-trips exactly.
    raw.select(relation.columns.map(c =>
      PgValues.castText(col(c.name), c.pgOid, c.isArray).as(c.name)): _*)
  }
}
