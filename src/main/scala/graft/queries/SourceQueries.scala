package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Source/sink format coverage beyond parquet and the CDC-specific CSV
  * path ([[graft.sources.PgCsv]]): write a table out through a format's
  * sink, read it back through its source, and aggregate — so schema
  * fidelity, type round-tripping, and the read path itself are what the
  * oracle checks (the oracle aggregates the original parquet directly;
  * any loss in the round trip breaks the hash).
  *
  * Scale shape: the write is partitioned (one file per task, no
  * coalesce), the read-back is a normal distributed scan, and the final
  * aggregation is the only shuffle. ORC scans support the same pushdown/
  * pruning as parquet; JSON is schema-on-read with an EXPLICIT schema —
  * inference would be a second full pass over the data at 100 TB.
  */
object SourceQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Deterministic scratch dir per (format, sf-dir) so reruns overwrite
    * rather than accumulate. */
  private def scratch(fmt: String, dir: String): String =
    s"/tmp/graft_roundtrip_${fmt}_${Integer.toHexString(dir.hashCode)}"

  /** ORC sink → ORC source → aggregate (ORC is the other first-class
    * columnar format next to parquet; predicate pushdown and column
    * pruning apply on the read-back scan). */
  def srcOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("orc", dir)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** JSON-lines sink → JSON source with an explicit schema → aggregate.
    * Doubles survive JSON as decimal text; the explicit read schema casts
    * them back without an inference pass. */
  def srcJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("json", dir)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_mktsegment", StringType),
      StructField("c_acctbal", DoubleType)))
    s.read.schema(schema).json(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(dec(col("c_acctbal"))).cast("double").as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_orc_roundtrip" -> (srcOrcRoundtrip _),
    "src_json_roundtrip" -> (srcJsonRoundtrip _),
  )

  /** Oracles aggregate the ORIGINAL parquet: a lossy round trip (schema,
    * types, values) shows up as a hash mismatch. */
  val oracle: Map[String, String] = Map(
    "src_orc_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "src_json_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
  )
}
