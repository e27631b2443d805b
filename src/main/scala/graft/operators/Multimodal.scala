package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.3 #42): media payloads travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition so a real decoder amortizes setup
  * (codec init, GPU handle) across a batch — the Scala analogue of a
  * batched pandas-UDF pipeline.
  *
  * IMAGE decode and resize are REAL: the JDK's `javax.imageio` handles
  * PNG/JPEG/GIF/BMP with no external codecs, so width/height come from the
  * actual bitstream and resize is a bilinear raster rescale. Payloads
  * ImageIO cannot parse (audio/video/corrupt/non-image) fall back to
  * [[Multimodal.stubDecode]] — deterministic fake features — so the
  * pipeline stays total over arbitrary corpora and the oracle-gated
  * queries (which feed text bytes) stay pinned.
  *
  * AUDIO decode is REAL for the formats the JDK parses (WAV/AIFF/AU via
  * `javax.sound.sampled`, headless-safe): stream geometry and PCM signal
  * stats come from the actual container; compressed codecs (MP3/OGG) and
  * video remain declared stubs — no codec libraries in the JDK.
  */
object Multimodal {

  // ImageIO wraps every stream it probes in a DISK-backed cache by default
  // (`getUseCache` = true): one temp-file create+delete PER RECORD on the
  // decode path, even for payloads no reader claims. Over an in-memory
  // binary column that file is pure filesystem tax — measured as
  // multimodal_meta's 8.6→91 task-CPU-s swing across bench windows at
  // bit-identical shuffle bytes (the temp-file path is I/O-weather-
  // sensitive; decode output is identical either way). Memory-cached
  // streams decode the same bytes to the same rasters; payloads here are
  // KB-sized, so the memory cache is strictly cheaper. JVM-global, set
  // once when the object loads on each executor.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL image decode: `ImageIO.read` over the payload bytes. None when
    * no installed reader claims the bitstream (or it is corrupt) — the
    * caller's cue to fall back to the stub. Total: never throws. */
  def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

  /** One batch through the real decoder, stub fallback per record (see
    * class doc). A real deployment swaps [[stubDecode]] for the
    * audio/video codec; the image path needs no swap. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      readImage(r.media) match {
        case Some(img) =>
          MediaFeatures(r.id, r.media.length, img.getWidth, img.getHeight, r.format)
        case None => stubDecode(Seq(r)).head
      }
    }

  /** Partition-local batched decode: groups the partition iterator into
    * `batchSize` chunks (the unit a vectorized decoder would receive) —
    * never materializes the partition. Decode is per-row CPU work, so a
    * starved scan (one parquet file → one partition) would run it
    * serially regardless of cluster size; [[Skew.feedCluster]]
    * redistributes once in that case (decode cost dwarfs one payload
    * shuffle) and is a no-op on any well-partitioned media table. */
  def decodeFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    Skew.feedCluster(ds).mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
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

  /** Decoded audio features: PCM stream geometry plus first-channel
    * signal statistics (RMS in [-1,1] units, positive-going zero
    * crossings — the cheap voice/music/silence discriminators). */
  final case class AudioFeatures(id: Long, nBytes: Int, sampleRate: Int,
      channels: Int, nFrames: Long, durationMs: Long, rms: Double,
      zeroCrossings: Long)

  /** REAL audio decode: `javax.sound.sampled` parses WAV/AIFF/AU headers
    * and hands back the PCM stream — pure JDK, headless-safe (no mixer
    * is ever opened). Handles 16-bit signed PCM, either endianness, any
    * channel count (stats walk the first channel). None for anything the
    * JDK cannot parse (MP3/OGG/corrupt/non-audio) — the stub-fallback
    * cue. Total: never throws. */
  def readAudioFeatures(id: Long, bytes: Array[Byte]): Option[AudioFeatures] =
    if (bytes == null || bytes.length == 0) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              || fmt.getSampleSizeInBits != 16) None
          else {
            val data = in.readAllBytes()
            val frameSize = fmt.getFrameSize
            val nFrames = data.length / frameSize
            var sumSq = 0.0
            var zc = 0L
            var prev = 0.0
            var f = 0
            while (f < nFrames) {
              val off = f * frameSize
              val raw =
                if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
                else (data(off + 1) << 8) | (data(off) & 0xff)
              val s = raw.toShort / 32768.0
              sumSq += s * s
              if (f > 0 && prev <= 0.0 && s > 0.0) zc += 1
              prev = s
              f += 1
            }
            val sr = fmt.getSampleRate.toInt
            Some(AudioFeatures(id, bytes.length, sr, fmt.getChannels, nFrames,
              if (sr > 0) nFrames * 1000L / sr else 0L,
              math.sqrt(sumSq / math.max(nFrames, 1)), zc))
          }
        } finally in.close()
      } catch { case _: Exception => None }

  /** ==== STUB ==== audio fallback for payloads the JDK cannot parse:
    * zeroed geometry, so undecodable rows are visible, not fabricated. */
  def stubAudioFeatures(r: MediaRecord): AudioFeatures =
    AudioFeatures(r.id, r.media.length, 0, 0, 0L, 0L, 0.0, 0L)

  /** Partition-local batched audio decode; same batching contract as
    * [[decodeFeatures]]. */
  def audioFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map(r =>
      readAudioFeatures(r.id, r.media).getOrElse(stubAudioFeatures(r)))))
  }

  /** PCM-16 mono samples → a complete WAV container (RIFF header + data),
    * via the same JDK audio stack the decoder uses. Deterministic — the
    * synthesis half of the audio gate and specs. */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One decoded video frame's geometry + top-left pixel (the cheap
    * per-frame integrity probe). */
  final case class VideoFrameInfo(id: Long, frameIdx: Int, width: Int,
      height: Int, rgb0: Int)

  /** REAL multi-frame decode for the one video-shaped container the JDK
    * parses natively: animated GIF (ImageIO's GIF reader exposes every
    * frame via `getNumImages(true)`/`read(i)`). None when no installed
    * reader claims the bytes or it holds no frames — the stub-fallback
    * cue. MP4/MKV/AVI need codec libraries the JDK lacks and remain
    * declared stubs. Total: never throws. */
  def readVideoFrames(bytes: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] =
    if (bytes == null || bytes.length == 0) None
    else
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            if (n <= 0) None else Some((0 until n).map(r.read(_)))
          } finally { r.dispose(); iis.close() }
        }
      } catch { case _: Exception => None }

  /** Per-frame geometry/probe rows for every decodable multi-frame
    * payload (1 → n fan-out, partition-local, no shuffle); undecodable
    * payloads emit a single zeroed stub row so they stay visible. */
  def videoFrameFeatures(ds: Dataset[MediaRecord]): Dataset[VideoFrameInfo] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      readVideoFrames(r.media) match {
        case Some(frames) => frames.iterator.zipWithIndex.map { case (f, i) =>
          VideoFrameInfo(r.id, i, f.getWidth, f.getHeight,
            f.getRGB(0, 0) & 0xFFFFFF)
        }
        case None => Iterator.single(VideoFrameInfo(r.id, -1, 0, 0, 0))
      }
    }
  }

  /** Solid-color frames → a complete animated GIF, via the JDK's own GIF
    * writer — the synthesis half of the video gate and specs. Solid
    * frames survive GIF palettization exactly, so decoded pixels are
    * bit-comparable. */
  def gifBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** One sampled frame of a media payload (video frame / audio window). */
  final case class MediaFrame(id: Long, frameIdx: Int, offset: Long,
      frameBytes: Array[Byte])

  /** Strided frame sampling — the video/audio fan-out shape: each payload
    * yields up to `maxFrames` windows of `frameSize` bytes at `stride`
    * spacing. A real implementation seeks keyframes via the codec; the
    * byte-window version keeps the exact same row-explosion contract
    * (1 → n rows, partition-local, no shuffle) and is oracle-checkable. */
  def sampleFrames(ds: Dataset[MediaRecord], frameSize: Int, stride: Int,
      maxFrames: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      Iterator.range(0, maxFrames)
        .map(i => (i, i.toLong * stride))
        .takeWhile { case (_, off) => off + frameSize <= r.media.length }
        .map { case (i, off) =>
          MediaFrame(r.id, i, off,
            java.util.Arrays.copyOfRange(r.media, off.toInt, off.toInt + frameSize))
        }
    }
  }

  /** REAL image resize: bilinear raster rescale to `width`x`height`,
    * re-encoded as PNG (lossless, so specs can pin pixels). Payloads that
    * are not decodable images pass through unchanged — resize composes
    * with mixed-media corpora without a pre-filter. Partition-local, no
    * shuffle; one decoder/encoder per record is the JDK shape (ImageIO
    * readers are not shareable across threads). */
  def resizeImages(ds: Dataset[MediaRecord], width: Int,
      height: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      readImage(r.media) match {
        case Some(img) =>
          val scaled = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          r.copy(media = bos.toByteArray, format = "png")
        case None => r
      }
    })
  }

  /** ==== STUB ==== resize/transcode: deterministic byte-decimation to
    * `targetBytes` standing in for a real resampler; preserves the
    * batched-transform contract (binary in → binary out, same row). */
  def resizeStub(ds: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val n = r.media.length
      val out =
        if (n <= targetBytes) r.media
        else Array.tabulate(targetBytes)(i => r.media((i.toLong * n / targetBytes).toInt))
      r.copy(media = out)
    })
  }

  /** ==== STUB ==== media → embedding: a deterministic `dims`-float vector
    * from the payload bytes (splitmix-mixed rolling state), standing in for
    * a vision/audio encoder. Output feeds [[Ann]]/[[Dedup]] directly — the
    * media → embedding → similarity pipeline with real partition shape. */
  def embedStub(ds: Dataset[MediaRecord], dims: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      val acc = new Array[Float](dims)
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < r.media.length) {
        h = (h ^ r.media(i)) * 0xBF58476D1CE4E5B9L
        acc((i % dims + dims) % dims) += ((h >>> 40).toInt % 256) / 256.0f
        i += 1
      }
      (r.id, acc.toSeq)
    }.toDF("id", "embedding")
  }
}
