package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.3 #42): media payloads travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition so a real decoder amortizes setup
  * (codec init, GPU handle) across a batch — the Scala analogue of a
  * batched pandas-UDF pipeline.
  *
  * The decoder itself is a clearly-marked STUB (no image/audio codecs ship
  * in this environment): [[Multimodal.stubDecode]] derives deterministic
  * fake features from the bytes. The Spark-side contract — schema, batch
  * iteration, partition-local execution, metadata passthrough — is the real
  * deliverable and is exercised by tests and the `multimodal_meta` query.
  */
object Multimodal {

  /** One media row: opaque payload + source metadata. */
  final case class MediaRecord(id: Long, media: Array[Byte], format: String)

  /** Extracted features; for images width/height, for audio duration etc. */
  final case class MediaFeatures(id: Long, nBytes: Int, width: Int, height: Int,
      format: String)

  /** ==== STUB ====
    * Stands in for a real batched decoder (libjpeg/ffmpeg/…): pure,
    * deterministic function of the payload so tests and oracles can pin the
    * pipeline. Replace the body with the real codec call; the batching
    * contract stays identical. */
  def stubDecode(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val n = r.media.length
      MediaFeatures(r.id, n, n % 64, (n / 64) % 64, r.format)
    }

  /** Partition-local batched decode: groups the partition iterator into
    * `batchSize` chunks (the unit a vectorized decoder would receive) —
    * never materializes the partition. */
  def decodeFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(stubDecode))
  }

  /** Lift a text/blob column into the standard media frame:
    * (id, media binary, format). */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
      format: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("media"),
        lit(format).as("format"))
      .as[MediaRecord]
  }
}
