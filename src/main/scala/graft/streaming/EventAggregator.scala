package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation, written once for both batch frames and
  * streams (the Structured Streaming model: the same declarative plan,
  * incrementalized when the input is a stream — SIGMOD'18 "Structured
  * Streaming" paper). With a stream input, the watermark bounds state and
  * late data; with a batch input the watermark is a no-op. */
object EventAggregator {

  /** Tumbling-window aggregate: (window_start, key) → count + sum. */
  def windowedStats(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLength: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))
}
