package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // conf-string extension injection, as a user's spark-submit would —
      // GraftFunctionsSpec asserts the graft_* surface resolves from THIS,
      // with no manual register() call
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // legacy-encoding tolerance, mirrored from GraftSession
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
