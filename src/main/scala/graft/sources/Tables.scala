package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long and floor-convert to microsecond
    * timestamps (the generator writes whole-microsecond values, and the
    * DuckDB oracle's epoch_us() truncates identically). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql(...)` works over
    * the corpus — the SQL entry path of the library (events goes through
    * the nanos-safe loader). Views are session-scoped and lazy: Catalyst
    * still prunes/pushes into the underlying parquet scans. */
  def registerAll(s: SparkSession, dir: String): Unit =
    all.foreach { name =>
      val df = if (name == "events") events(s, dir) else apply(s, dir, name)
      df.createOrReplaceTempView(name)
    }
}
