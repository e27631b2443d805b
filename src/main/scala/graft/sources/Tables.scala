package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's notion of a configured set of relations to sync
  * (/root/reference/config/config.go `Sync.Tables`), re-expressed as
  * column-pruned, filter-pushable parquet scans.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Minimum column contract per table. The round-10 events regression
    * showed driver testdata can change encodings between generations; a
    * missing/renamed column should fail HERE with the table name, not
    * deep inside some query's analysis. Extra columns are always fine. */
  private val contract: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                        "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    contract.get(name).foreach { cols =>
      val missing = cols.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"$name.parquet at $dir is missing contract columns ${missing.mkString(", ")} " +
          s"(found: ${df.columns.mkString(", ")})")
    }
    df
  }

  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTsNtz(apply(s, d, "lineitem"), "l_shipdate")
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeTsNtz(apply(s, d, "orders"), "o_orderdate")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  /** `events.ts` has shipped in two encodings across driver testdata
    * generations: parquet TIMESTAMP(NANOS) (surfacing as a nanos LongType
    * under `spark.sql.legacy.parquet.nanosAsLong`, which GraftSession sets
    * as a static tolerance — Spark's vectorized reader rejects NANOS
    * otherwise) and plain TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ).
    * Branch on the LOADED schema rather than assuming a generation:
    * both paths land on TimestampType with microsecond-floor values, so
    * every downstream query and its DuckDB oracle see identical instants
    * (session timezone is UTC, making the NTZ cast value-identity). */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(apply(s, d, "events"))

  /** Same encoding tolerance as [[normalizeEventTs]] for the order/ship
    * date columns, normalized to TIMESTAMP_NTZ — the type this
    * generation's parquet loads as and every dependent query and oracle
    * was validated against. A NANOS regeneration (the round-10 events
    * path) lands on identical instants instead of breaking 37 query
    * references; UTC session makes the TimestampType arm value-identity. */
  private[graft] def normalizeTsNtz(raw: DataFrame, c: String): DataFrame =
    raw.schema(c).dataType match {
      case TimestampNTZType => raw
      case LongType =>
        raw.withColumn(c, expr(s"timestamp_micros($c div 1000)").cast(TimestampNTZType))
      case TimestampType => raw.withColumn(c, col(c).cast(TimestampNTZType))
      // plain parquet DATE (the most natural re-encoding for a date-grain
      // column): midnight-NTZ is value-identity for date-grain data
      case DateType => raw.withColumn(c, col(c).cast(TimestampNTZType))
      case other => throw new IllegalStateException(
        s"$c: unsupported encoding $other (expected nanos-long, TIMESTAMP_NTZ, TIMESTAMP, or DATE)")
    }

  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame = {
    val conv: Column = raw.schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts: unsupported encoding $other (expected nanos-long, " +
          "TIMESTAMP_NTZ, or TIMESTAMP; for raw TIMESTAMP(NANOS) parquet " +
          "set spark.sql.legacy.parquet.nanosAsLong=true at session build)")
    }
    raw.withColumn("ts", conv)
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")

  /** The engine's vector surface (Ann, VecAgg, Pca, Dedup.embeddingPairs)
    * is typed on Array[Float]; a regenerated list<double> corpus would
    * break every encoder. Adapt by downcast, same contract-tolerance
    * rationale as [[normalizeEventTs]]. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case ArrayType(DoubleType, _) =>
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other => throw new IllegalStateException(
        s"embeddings.embedding: unsupported type $other (expected array<float|double>)")
    }
  }

  /** Register every table as a temp view so `spark.sql(...)` works over
    * the corpus — the SQL entry path of the library (events goes through
    * the nanos-safe loader). Views are session-scoped and lazy: Catalyst
    * still prunes/pushes into the underlying parquet scans. */
  def registerAll(s: SparkSession, dir: String): Unit =
    all.foreach { name =>
      val df = name match {
        case "events"     => events(s, dir)
        case "lineitem"   => lineitem(s, dir)
        case "orders"     => orders(s, dir)
        case "embeddings" => embeddings(s, dir)
        case _            => apply(s, dir, name)
      }
      df.createOrReplaceTempView(name)
    }
}
