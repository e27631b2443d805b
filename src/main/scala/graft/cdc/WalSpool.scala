package graft.cdc

import java.nio.charset.StandardCharsets.UTF_8

/** Plain-IO writer for the message spool the streaming layer reads with
  * `spark.readStream.schema(WalMessage).json(dir)`.
  *
  * The pump used to spool through `spark.createDataset(..).coalesce(1)
  * .write.json(dir)` — a single-task Spark JOB per flush (≈10/s per
  * pipeline at production rates), every one of them queued through the
  * driver's one DAGScheduler event loop. The sharded-soak receipt showed
  * that loop IS the single-driver ceiling (per-shard rate collapses past
  * ~2 concurrent pipelines), and none of that machinery buys anything
  * here: the flush is one in-memory buffer becoming one local file. This
  * writer needs no SparkSession at all — which is also the deployment
  * shape: a pump is a plain process beside the source (the reference's
  * stream loop, stream.go, is likewise storage-API-free), free to run on
  * a box that has never seen a Spark driver.
  *
  * Compatibility contract with the Spark JSON reader (schema-driven, so
  * field ORDER is free; these must hold):
  *   - one JSON object per line (JSONL), UTF-8;
  *   - every string escaped per JSON (quote, backslash, control chars);
  *   - maps as objects, seqs as arrays, longs/ints as bare numbers;
  *   - a file APPEARS atomically: written as a dot-prefixed temp (hidden
  *     from the file-stream source, same directory = same filesystem)
  *     and ATOMIC_MOVEd into place — the source must never list a file
  *     whose tail is still being written, because it reads each file
  *     exactly once (a truncated read would be silent data loss).
  *     Spark's own writer gave the same guarantee via its commit
  *     protocol's rename; this preserves it without the job.
  *   - files must READ BACK in append order: the source sorts pending
  *     files by mtime alone and the merge's LSN watermark assumes
  *     nondecreasing batch order, so every file is stamped with a
  *     strictly-increasing mtime (same-ms flushes would otherwise
  *     tie-break arbitrarily — an out-of-order lower-LSN file lands
  *     under the watermark and is silently dropped).
  *
  * Round-trip pinned by WalSpoolSpec against the real streaming reader.
  */
object WalSpool {

  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)
  // sweep throttle is PER SPOOL DIRECTORY: a single JVM can drive several
  // spool dirs at once (multi-stream soaks, tools), and a JVM-global
  // throttle would let a busy dir's appends consume the once-a-minute
  // budget while a quiet dir's orphaned tmps linger unbounded. Entries
  // are one Long per distinct dir ever written this JVM — bounded by
  // configuration, not by traffic.
  private val lastSweepMs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val SweepEveryMs = 60000L
  // last mtime stamped onto a spool file — strictly increasing per JVM
  // (see the ordering note in append)
  private val lastStampMs = new java.util.concurrent.atomic.AtomicLong(0L)

  private def escape(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20) sb.append(f"\\u${c.toInt}%04x") else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    ()
  }

  private def obj(sb: java.lang.StringBuilder, m: Map[String, String]): Unit = {
    sb.append('{')
    var first = true
    m.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      escape(sb, k)
      sb.append(':')
      if (v == null) { sb.append("null"); () } else escape(sb, v)
    }
    sb.append('}')
    ()
  }

  private def arr(sb: java.lang.StringBuilder, xs: Seq[String]): Unit = {
    sb.append('[')
    var first = true
    xs.foreach { x =>
      if (!first) sb.append(',')
      first = false
      escape(sb, x)
    }
    sb.append(']')
    ()
  }

  /** One [[WalMessage]] as a single JSON line (no trailing newline). */
  def encode(m: WalMessage): String = {
    val sb = new java.lang.StringBuilder(96)
    sb.append("{\"xid\":").append(m.xid)
      .append(",\"seq\":").append(m.seq)
      .append(",\"msgType\":")
    escape(sb, m.msgType)
    sb.append(",\"lsn\":").append(m.lsn)
      .append(",\"table\":")
    escape(sb, m.table)
    sb.append(",\"keyBefore\":")
    obj(sb, m.keyBefore)
    sb.append(",\"values\":")
    obj(sb, m.values)
    sb.append(",\"nulls\":")
    arr(sb, m.nulls)
    sb.append(",\"unchanged\":")
    arr(sb, m.unchanged)
    sb.append(",\"rekey\":").append(m.rekey).append('}')
    sb.toString
  }

  /** Append one flush's messages as a new spool file, atomically. */
  def append(dir: String, msgs: Seq[WalMessage]): Unit = {
    if (msgs.isEmpty) return
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    // a pump killed mid-write leaves a dot-tmp the source never sees —
    // harmless to correctness (its transactions were never acked past the
    // spool floor, so the next generation redelivers them) but a disk
    // leak; sweep stale ones. One writer per spool dir by design, and a
    // write is milliseconds, so anything older than a minute is dead.
    // The sweep is TIME-throttled (once a minute, not per append): a
    // per-append Files.list over a directory that grows at ~10 files/s
    // would re-tax exactly the hot loop this writer de-taxed — and only
    // crash leftovers are ever swept, so a periodic pass loses nothing.
    // Failures during list ITERATION surface as unchecked
    // RuntimeExceptions (UncheckedIOException, DirectoryIteratorException),
    // so best-effort means NonFatal, not just IOException.
    val nowMs = System.currentTimeMillis()
    val dirKey = d.toAbsolutePath.normalize.toString
    val prev = lastSweepMs.get(dirKey)
    val sweepDue = (prev == null || nowMs - prev >= SweepEveryMs) && {
      // CAS-style claim so concurrent appenders to the SAME dir elect one
      // sweeper; distinct dirs never contend for each other's budget
      if (prev == null) lastSweepMs.putIfAbsent(dirKey, nowMs) == null
      else lastSweepMs.replace(dirKey, prev, nowMs)
    }
    if (sweepDue) {
      try {
        val cutoff = nowMs - 60000L
        val stale = java.nio.file.Files.list(d)
        try stale.filter(p => p.getFileName.toString.startsWith(".spool-") &&
            p.toFile.lastModified() < cutoff)
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally stale.close()
      } catch { case scala.util.control.NonFatal(_) => () } // best-effort
    }
    // The file source orders pending files by MODIFICATION TIME ONLY
    // (FileStreamSource sorts entries by timestamp; ties break
    // arbitrarily), and the merge's replay-protection watermark assumes
    // batches arrive in nondecreasing LSN order — so two flushes landing
    // in the same millisecond can straddle a batch boundary REVERSED, and
    // the lower-LSN file's transactions arrive below the already-advanced
    // watermark and are silently dropped (SpoolRetentionSpec reproduced
    // exactly this with fast appends). Stamp every spool file with a
    // strictly-INCREASING mtime instead of whatever the tmp write left:
    // one sequential writer per dir ⇒ mtime order ≡ append order ≡ LSN
    // order, deterministic under any tie-break. Across a pump restart the
    // stamp restarts from the wall clock; if the clock stepped backwards
    // the new generation's files may sort before the old generation's
    // unread ones — harmless: a restarted pump re-spools from the
    // APPLIED floor, so every old unread file is a full duplicate of what
    // the new generation redelivers and the watermark cut dropping it is
    // the correct dedup, not loss.
    val stamp = lastStampMs.updateAndGet(prev =>
      math.max(prev + 1, System.currentTimeMillis()))
    // unique across concurrent pumps and restarts: time + pid + counter
    val name = s"spool-$stamp-" +
      s"${ProcessHandle.current().pid()}-${counter.incrementAndGet()}.json"
    val tmp = d.resolve(s".$name.tmp")
    val out = java.nio.file.Files.newBufferedWriter(tmp, UTF_8)
    try msgs.foreach { m => out.write(encode(m)); out.write("\n") }
    finally out.close()
    java.nio.file.Files.setLastModifiedTime(tmp,
      java.nio.file.attribute.FileTime.fromMillis(stamp))
    java.nio.file.Files.move(tmp, d.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }
}
