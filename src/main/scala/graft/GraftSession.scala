package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession builder with the settings the engine is
  * designed around. Local defaults mirror the driver contract
  * (local[32], 32 shuffle partitions); on a cluster the same knobs scale
  * with `spark.sql.shuffle.partitions` ≈ 2-3× total cores and AQE coalesce
  * trimming the rest. */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the graft_* SQL function surface, injected the user-facing way
      // (static conf, applied when the context is created). The conf accepts
      // a comma-separated list and Builder.config is last-write-wins, so any
      // extensions the caller already passed via spark-submit --conf (which
      // arrive as system properties) are APPENDED to, not replaced.
      .config("spark.sql.extensions", mergedExtensions())
      // runtime re-planning: partition coalescing, skew-join splitting,
      // broadcast-join demotion/promotion from real sizes
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // scans: one task per ~128 MB of parquet, independent of file layout
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // data-contract tolerance: legacy TIMESTAMP(NANOS) parquet (one
      // generation of the driver testdata used it for events.ts) surfaces
      // as a plain long instead of failing the scan; Tables.normalizeEventTs
      // branches on the loaded type. No effect on MICROS/NTZ columns.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // ANSI stays ON (Spark 4 default), stated here as an explicit
      // decision: an out-of-range cast mid-merge FAILS the batch loudly
      // (the reference errors the batch on bad data the same way) instead
      // of silently nulling; per-column opt-outs go through
      // PgTypes.NumericMode / PgValues.castText permissive modes
      .config("spark.sql.ansi.enabled", "true")

  private val GraftExt = "graft.functions.GraftExtensions"

  /** GraftExtensions plus whatever spark.sql.extensions the launch
    * environment already carries (spark-submit --conf values surface as
    * system properties). Visible for the injection spec. */
  private[graft] def mergedExtensions(
      existing: Option[String] = sys.props.get("spark.sql.extensions")): String =
    existing.map(_.trim).filter(_.nonEmpty) match {
      case Some(e) if e.split(",").map(_.trim).contains(GraftExt) => e
      case Some(e) => s"$e,$GraftExt"
      case None    => GraftExt
    }

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Streaming-state scale knob: RocksDB-backed state store instead of the
    * default in-heap HDFSBackedStateStore. At 100 TB the keyed state of
    * compaction/as-of/dedup operators (bounded by the watermark window ×
    * key cardinality) outgrows executor heaps — RocksDB spills it to local
    * disk with changelog checkpointing. Apply per session:
    * `GraftSession.useRocksDbState(spark)` before starting streams. */
  def useRocksDbState(s: SparkSession): Unit =
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
