package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line `{"metric":"total",...}`.
  *
  * Methodology (the measurement, not the code, is the artifact here):
  *   - median-of-N (N>=5) per query, with min/median/max dispersion
  *     reported — this VM shows up-to-20x noisy-neighbor CPU-steal
  *     spikes, so a min-of-2 cannot separate plan regressions from
  *     neighbor noise (two rounds of phantom-regression triage proved it);
  *   - query order is rotated across repetitions so a neighbor spike
  *     lands on different queries each pass instead of clustering;
  *   - a [[SparkListener]] accumulates per-query total task CPU time and
  *     shuffle read/write bytes: those are noise-IMMUNE plan signals — a
  *     plan change moves shuffle bytes, a noisy neighbor cannot;
  *   - the determinism sort the ORACLE gate needs (`orderedSmall`'s
  *     `repartition(1)`) is disabled in bench sessions via
  *     `spark.graft.bench.noDeterminismSort`: it serializes the full
  *     result onto one task purely so DuckDB hash-comparison is
  *     order-stable, charging a single-threaded sort to the operator.
  *     Verify never sets the flag, so the gates are untouched;
  *   - a scale ladder re-times the heavy families on a key-shifted 10x
  *     copy of the input (sf0.1 -> "sf1"): the concrete does-it-survive-
  *     100x evidence a single-SF run can't give. Families run in a fresh
  *     SparkContext per small group and measure BOTH the sf-side baseline
  *     and the 10x side there, because a long-lived bench session is
  *     itself a contaminant: after ~400 suite executions the round-8
  *     ladder measured decontam_overlap at 204s / 3,800 task-CPU-s where
  *     a clean context runs the identical plan (same shuffle bytes) in
  *     1.8s / 21 CPU-s — heap/state accumulation, amplified 10x at ladder
  *     volume, read as phantom super-linearity. Ratios are min-of-3
  *     steady-state over warmed SUCCESSFUL runs on both sides;
  *   - output is INCREMENTAL and budgeted: the full suite record prints
  *     before the ladder starts and again after every finished ladder
  *     family (each line is a complete record), and families past
  *     `SPARK_GRAFT_BENCH_BUDGET_SEC` are skipped by name — a harness
  *     timeout can truncate the ladder but can no longer erase the run
  *     (round 9 ended rc=124 with zero parseable output; this is the fix);
  *   - the budget is LADDER-FIRST: one suite pass runs up front (headline
  *     insurance + pass-cost calibration), then BOTH scale ladders, then
  *     the remaining suite passes top the median up toward N — each gated
  *     on fitting inside the budget. Round 16 ran the 5-pass suite first
  *     on a 1.3x-slow host day and the budget died mid-ladder (6 of 15
  *     10x families skipped, 30x not run): the ladders are the artifact a
  *     slow day must not erase, extra median passes are the cheap part —
  *     so a slow day now degrades the `runs` count, never the ladder.
  */
object Bench {

  /** Wall-clock-free plan metrics, accumulated across all tasks. */
  private final class TaskMetricsListener extends SparkListener {
    val cpuNs       = new AtomicLong
    val shufReadB   = new AtomicLong
    val shufWriteB  = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snapshot: (Long, Long, Long) = (cpuNs.get, shufReadB.get, shufWriteB.get)
  }

  /** Flush the async listener bus so per-query metric deltas are exact.
    * `listenerBus`/`waitUntilEmpty` are private[spark] (public in
    * bytecode); a short sleep is the fallback if the internals move. */
  private def drainListeners(sc: SparkContext): Unit =
    try {
      val bus = sc.getClass.getMethods.find(_.getName == "listenerBus").get.invoke(sc)
      val ms  = bus.getClass.getMethods.filter(_.getName == "waitUntilEmpty")
      ms.find(_.getParameterCount == 0) match {
        case Some(m) => m.invoke(bus)
        case None => ms.find(_.getParameterCount == 1)
          .foreach(_.invoke(bus, java.lang.Long.valueOf(5000L)))
      }
    } catch { case _: Throwable => Thread.sleep(300) }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def r4(v: Double): Double = math.rint(v * 1e4) / 1e4

  /** One bench session. Status-store retention is capped hard: with the
    * defaults (1000 retained SQL executions, each holding a plan graph)
    * a multi-hundred-query bench session accumulates driver heap that
    * taxes every later measurement. */
  private def mkSession(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    // match Verify/GraftSession: the NTZ<->TimestampType casts in the
    // schema-adaptive loaders are session-TZ-dependent, so a non-UTC host
    // would bench ts/date predicates on instants shifted vs the gates
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ui.retainedExecutions", "10")
    .config("spark.ui.retainedJobs", "100")
    .config("spark.ui.retainedStages", "200")
    .config("spark.graft.bench.noDeterminismSort", "true")
    // legacy-encoding tolerance, mirrored from GraftSession
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // N>=5: the median survives two simultaneous neighbor spikes
    val runs  = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE", "10").toInt
    // Second, higher scale point for the worst-ratio families: two points
    // bound the growth curve (a single 10x ratio can't distinguish a
    // gentle super-linearity from an N^2 cliff that 30x would expose).
    val scale2N = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE2", "30").toInt
    // Hard wall-clock budget for the WHOLE bench: once exceeded, remaining
    // ladder families are skipped (and named as skipped in the output)
    // instead of letting the harness's timeout kill the process with zero
    // output, as happened to the round-9 run (rc 124, parsed null).
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1380").toDouble
    val tMain0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - tMain0) / 1e9
    var spark = mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    var listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)

    // untimed warmup: JVM/codegen/classloader startup otherwise lands on
    // whichever query happens to run first
    def warmup(): Unit =
      try {
        spark.range(1000).selectExpr("sum(id)").collect()
        spark.read.parquet(s"$sfDir/region.parquet").count()
      } catch { case _: Throwable => () }
    warmup()

    var failed = List.empty[String]
    // comma-separated allowlist for iterating on one query's plan without
    // paying for the whole suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = (only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None        => SparkEntry.queries
    }).toVector

    /** One timed execution; returns (wallSec, cpuSec, shufReadB, shufWriteB,
      * ok). The noop sink forces full materialization of every output column
      * (a bare count() would let Catalyst prune the projection and
      * under-report the real query cost). A failed run is flagged, not
      * swallowed: the ladder excludes failed samples from its min, so a
      * fast-because-it-crashed attempt can never masquerade as a fast run. */
    def timed(name: String, fn: (SparkSession, String) => DataFrame,
              dir: String): (Double, Double, Long, Long, Boolean) = {
      drainListeners(spark.sparkContext)
      val (c0, r0, w0) = listener.snapshot
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            // a failing query must be loud: a swallowed exception reads as
            // a suspiciously fast query in the benchmark output
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            if (!failed.contains(name)) failed ::= name
            false
        }
      val wall = (System.nanoTime() - t0) / 1e9
      drainListeners(spark.sparkContext)
      val (c1, r1, w1) = listener.snapshot
      (wall, (c1 - c0) / 1e9, r1 - r0, w1 - w0, ok)
    }

    // Suite passes are INCREMENTAL: pass 1 runs before the ladders (so a
    // kill always leaves a headline record and its wall cost calibrates
    // the budget math), the ladders run next — they are the artifact a
    // budget overrun must not erase (BENCH_r16 lost 6 of 15 10x families
    // and the whole 30x ladder to a 1.3x-slow host day because the 5-run
    // suite ran first) — and the remaining passes top the sample count up
    // toward `runs` afterwards, each gated on fitting inside the budget.
    // Medians/aggregates are recomputed from the samples at every emit.
    val samples = collection.mutable.Map.empty[String,
      collection.mutable.ArrayBuffer[(Double, Double, Long, Long, Boolean)]]
    var passesDone = 0
    def runSuitePass(): Unit = {
      // rotate by a stride coprime-ish with the suite size: each query
      // gets different neighbors each pass, so a sustained host spike
      // spreads across the suite instead of burying one family
      val rot = (passesDone * 13) % math.max(selected.size, 1)
      val order = selected.drop(rot) ++ selected.take(rot)
      order.foreach { case (name, fn) =>
        samples.getOrElseUpdate(name, collection.mutable.ArrayBuffer.empty) +=
          timed(name, fn, sfDir)
      }
      passesDone += 1
    }

    def medianSec(name: String): Double =
      samples.get(name).map(v => median(v.map(_._1).toSeq)).getOrElse(0.0)
    def suiteJsons: (String, String, String, String, String, Double) = {
      val have = selected.filter { case (n, _) => samples.contains(n) }
      val qs = have.map { case (name, _) =>
        s"\"$name\":${r4(medianSec(name))}" }.mkString("{", ",", "}")
      val disp = have.map { case (name, _) =>
        val t = samples(name).map(_._1)
        s"\"$name\":[${r4(t.min)},${r4(median(t.toSeq))},${r4(t.max)}]"
      }.mkString("{", ",", "}")
      val cpu = have.map { case (name, _) =>
        s"\"$name\":${r4(median(samples(name).map(_._2).toSeq))}" }.mkString("{", ",", "}")
      // shuffle bytes are a deterministic property of the plan: identical
      // across reps up to AQE rounding, so the median is exact
      val srd = have.map { case (name, _) =>
        s"\"$name\":${median(samples(name).map(_._3.toDouble).toSeq).toLong}" }
        .mkString("{", ",", "}")
      val swr = have.map { case (name, _) =>
        s"\"$name\":${median(samples(name).map(_._4.toDouble).toSeq).toLong}" }
        .mkString("{", ",", "}")
      val total = r4(have.map { case (n, _) => medianSec(n) }.sum)
      (qs, disp, cpu, srd, swr, total)
    }

    // Ladder summary state for the compact line: name -> ratio_vs_sf
    // (−1 = failed), plus any per-family receipts (minhash candidates).
    val ladderRatios = collection.mutable.LinkedHashMap.empty[String, Double]
    val ladderSkipped = collection.mutable.ArrayBuffer.empty[String]
    var ladderStatus = "none"
    var minhashReceipt = ""
    // Second scale point (default 30x) for the heaviest families: two
    // points make a scaling CURVE where one ratio is only a slope guess.
    val ladder2Ratios = collection.mutable.LinkedHashMap.empty[String, Double]
    val ladder2Skipped = collection.mutable.ArrayBuffer.empty[String]
    var ladder2Status = "none"
    var minhashReceipt2 = ""
    var lastLadderJson = "{}"
    var lastLadder2Json = "{}"

    /** Emit ONE complete self-contained result line with whatever ladder
      * data exists so far, FOLLOWED by one compact summary line. Called
      * after the suite and again after every ladder family: whichever
      * lines are last on stdout when the process ends (normally or by the
      * harness's timeout) are full, parseable records. The compact line
      * exists because the driver's capture keeps only a ~2,000-char tail
      * of stdout: the full record (124 queries x 5 metric maps) blows
      * that window, so for three straight rounds the ladder receipts at
      * the FRONT of the record were truncated away (`parsed: null` in
      * BENCH_r08..r10). The compact line is < ~1,500 chars by
      * construction — total, per-family ladder ratios, receipts, errors —
      * so the tail window always ends with a complete parseable record. */
    def emit(ladderJson: String): Unit = { lastLadderJson = ladderJson; emitNow() }
    def emit2(ladder2: String): Unit = { lastLadder2Json = ladder2; emitNow() }
    def emitNow(): Unit = {
      val (qs, disp, cpu, srd, swr, total) = suiteJsons
      val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
      val full = s"""{"metric":"total","value":$total,"unit":"sec","runs":$passesDone,"queries":$qs,"dispersion":$disp,"task_cpu_sec":$cpu,"shuffle_read_bytes":$srd,"shuffle_write_bytes":$swr,"scale_ladder":$lastLadderJson,"scale_ladder2":$lastLadder2Json,"errors":$errs,"sf":"$sfDir"}"""
      println(full)
      val lad = ladderRatios.map { case (n, r) => s"\"$n\":$r" }.mkString("{", ",", "}")
      val sk = ladderSkipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val receipt = if (minhashReceipt.isEmpty) "" else s""","minhash_receipt":$minhashReceipt"""
      val lad2 = ladder2Ratios.map { case (n, r) => s"\"$n\":$r" }.mkString("{", ",", "}")
      val sk2 = ladder2Skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val receipt2 = if (minhashReceipt2.isEmpty) "" else s""","minhash_receipt2":$minhashReceipt2"""
      val compact = s"""{"metric":"graft_bench_compact","value":$total,"unit":"sec","runs":$passesDone,"sf":"$sfDir","ladder_factor":$scaleN,"ladder_status":"$ladderStatus","ladder_ratio_vs_sf":$lad,"ladder_skipped":$sk$receipt,"ladder2_factor":$scale2N,"ladder2_status":"$ladder2Status","ladder2_ratio_vs_sf":$lad2,"ladder2_skipped":$sk2$receipt2,"errors":$errs}"""
      println(compact)
      Console.out.flush()
      // BARE machine-readable artifacts: the driver's stdout capture keeps
      // a prefixed tail (`[info] ...`) its JSON parse chokes on — four
      // rounds of `parsed: null` with a humanly-complete record. A file is
      // immune to log prefixes and truncation. Each write is the complete
      // current record, so a harness kill leaves the last finished state.
      // ONLY-filtered debug runs skip the write (a partial record must
      // never clobber the committed full-suite artifact), and a failed
      // write warns instead of killing the run — but says so, because a
      // silently-stale artifact is worse than none.
      if (only.isEmpty) {
        try {
          java.nio.file.Files.write(java.nio.file.Paths.get("bench_summary.json"),
            (compact + "\n").getBytes("UTF-8"))
          java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
            (full + "\n").getBytes("UTF-8"))
          // sidecar for build.sbt's record-reprint hook: the sbt JVM that
          // FORKED this bench is our parent — the hook reprints only when
          // its own pid matches, so a concurrent sbt session (tests,
          // verify) never tail-prints another session's bench record
          java.nio.file.Files.write(java.nio.file.Paths.get("bench_owner.pid"),
            (ProcessHandle.current().parent()
              .map[String](p => p.pid().toString).orElse("-1") + "\n")
              .getBytes("UTF-8"))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] WARN artifact write failed (cwd=${
              System.getProperty("user.dir")}): $e")
        }
      }
    }

    // ---- scale ladder: heavy families on a key-shifted scaleN x input ----
    // Budgeted and incremental: the suite result is already on stdout
    // before the first ladder job runs, each finished family re-emits the
    // full record, and families that would overrun SPARK_GRAFT_BENCH_BUDGET_SEC
    // are skipped BY NAME rather than letting the harness kill the process.
    val ladderNote = s"key-shifted copies of $sfDir; fresh context per " +
      "family group; warm + min-of-3 successful runs on both ratio sides"
    def ladderJson(entries: Seq[String], skipped: Seq[String],
                   status: String): String = {
      val sk = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"factor":$scaleN,"status":"$status","note":"$ladderNote","skipped":$sk,"queries":${entries.mkString("{", ",", "}")}}"""
    }

    /** Fresh context: a long-lived bench session contaminates timings
      * (see class scaladoc — heap/state accumulation read as phantom
      * super-linearity at ladder volume). */
    def restartContext(): Unit = {
      spark.stop()
      spark = mkSession(cpus)
      spark.sparkContext.setLogLevel("WARN")
      listener = new TaskMetricsListener
      spark.sparkContext.addSparkListener(listener)
      warmup()
    }

    /** One ladder pass: time `familyNames` on `sfDir` vs `dir`, fresh
      * context every `restartEvery` families (INCLUDING i = 0, so the
      * first family never shares a context with whatever ran before —
      * the suite, or the scaled-corpus materialization), warm +
      * min-of-successful-3 on both sides (a failed attempt's bogus-fast
      * wall can never be selected; min-of-3 because this host shows 2x
      * CPU-steal windows on identical plans — probe-verified, same
      * shuffle bytes, 6.7s vs 14.9s wall). The dedup_minhash family adds
      * a candidate/pair receipt counted once per side OUTSIDE the timed
      * runs, so a super-linear wall ratio is attributable
      * (output-proportional growth vs quadratic bucket degeneration).
      * Families past the budget are skipped BY NAME. Appends per-family
      * ratios to `ratios`, emits an incremental record after every
      * family via `emitFn`, and returns the final status. */
    def runLadder(familyNames: Seq[String], dir: String, restartEvery: Int,
        labelPrefix: String,
        ratios: collection.mutable.LinkedHashMap[String, Double],
        skippedAcc: collection.mutable.ArrayBuffer[String],
        setReceipt: String => Unit,
        emitFn: (Seq[String], Seq[String], String) => Unit): String = {
      val entries = collection.mutable.ArrayBuffer.empty[String]
      val skipped = collection.mutable.ArrayBuffer.empty[String]
      val families = familyNames.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
      families.zipWithIndex.foreach { case ((name, fn), i) =>
        if (elapsedSec > budgetSec) { skipped += name; skippedAcc += name }
        else {
          if (i % restartEvery == 0) restartContext()
          def minOf3(d: String): Option[(Double, Double, Long, Long)] = {
            timed(s"$labelPrefix:$name(warm)", fn, d)
            val ok = Seq.fill(3)(timed(s"$labelPrefix:$name", fn, d)).filter(_._5)
            if (ok.isEmpty) None
            else Some(ok.minBy(_._1)).map(t => (t._1, t._2, t._3, t._4))
          }
          val timedSides = (minOf3(sfDir), minOf3(dir))
          val receipt: String =
            if (name != "dedup_minhash") ""
            else try {
              def stats(d: String): (Long, Long) =
                operators.Dedup.minhashLadderStats(
                  queries.LlmQueries.withNearCopies(spark, d), "doc_id", "text")
              val (sc, sp) = stats(sfDir)
              val (lc, lp) = stats(dir)
              setReceipt(
                s"""{"sf_candidates":$sc,"sf_pairs":$sp,"candidates":$lc,"pairs":$lp}""")
              s""","sf_candidates":$sc,"sf_pairs":$sp,"candidates":$lc,"pairs":$lp"""
            } catch { case _: Throwable => "" }
          val entry = timedSides match {
            case (Some(sf), Some((wall, cpuS, rdB, wrB))) =>
              val ratio = if (sf._1 > 0) r4(wall / sf._1) else -1.0
              ratios(name) = ratio
              s"""\"$name\":{\"sec\":${r4(wall)},\"sf_sec\":${r4(sf._1)},\"ratio_vs_sf\":$ratio,\"cpu_sec\":${r4(cpuS)},\"sf_cpu_sec\":${r4(sf._2)},\"shuffle_read\":$rdB,\"shuffle_write\":$wrB$receipt}"""
            case _ =>
              ratios(name) = -1.0
              s"""\"$name\":{\"sec\":-1,\"sf_sec\":-1,\"ratio_vs_sf\":-1,\"failed\":true}"""
          }
          entries += entry
          emitFn(entries.toSeq, skipped.toSeq, "in_progress")
        }
      }
      val status = if (skipped.isEmpty) "complete" else "budget_exhausted"
      emitFn(entries.toSeq, skipped.toSeq, status)
      status
    }

    // ---- suite pass 1: headline insurance + per-pass cost calibration ----
    // One pass before the ladders so (a) a harness kill at ANY later point
    // still leaves a complete headline record on stdout and in the
    // artifacts, and (b) the measured pass cost prices the top-up passes
    // against the remaining budget after the ladders.
    val tPass1 = elapsedSec
    runSuitePass()
    var passCostSec = elapsedSec - tPass1

    if (scaleN <= 1 || only.isDefined) emit("{}")
    else if (elapsedSec > budgetSec) {
      ladderStatus = "skipped_budget"
      ladderSkipped ++= ScaleLadder.queries
      emit(ladderJson(Nil, ScaleLadder.queries, "skipped_budget"))
    } else {
      ladderStatus = "in_progress"
      emit(ladderJson(Nil, Nil, "in_progress"))
      val dir = ScaleLadder.materialize(spark, sfDir, scaleN)
      // ~6 heavy executions per context (restart every 3 families) is far
      // below the ~400-execution contamination horizon; a context per
      // family blew the round-9 budget.
      ladderStatus = runLadder(ScaleLadder.queries, dir, restartEvery = 3,
        labelPrefix = "scale", ladderRatios, ladderSkipped,
        (v: String) => minhashReceipt = v, (e, s, st) => { ladderStatus = st; emit(ladderJson(e, s, st)) })

      // ---- second scale point: the worst-ratio families at scale2N x ----
      // Runs only when the first ladder completed whole and budget remains:
      // the 10x ladder is the contract, the 30x curve is the stretch goal.
      // 30x executions are ~3x a phase-1 family: restart every 2 families.
      if (ladderStatus == "complete" && scale2N > scaleN && elapsedSec < budgetSec) {
        def ladder2Json(entries: Seq[String], skipped: Seq[String],
                        status: String): String = {
          val sk = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
          s"""{"factor":$scale2N,"status":"$status","note":"$ladderNote","skipped":$sk,"queries":${entries.mkString("{", ",", "}")}}"""
        }
        ladder2Status = "in_progress"
        emit2(ladder2Json(Nil, Nil, "in_progress"))
        val dir2 = ScaleLadder.materialize(spark, sfDir, scale2N,
          Some(ScaleLadder.tables2))
        ladder2Status = runLadder(ScaleLadder.queries2, dir2, restartEvery = 2,
          labelPrefix = "scale2", ladder2Ratios, ladder2Skipped,
          (v: String) => minhashReceipt2 = v, (e, s, st) => { ladder2Status = st; emit2(ladder2Json(e, s, st)) })
      }
    }

    // ---- top-up suite passes: median robustness with the ladders safe ----
    // Each extra pass runs only if its (conservatively priced) cost fits
    // the budget: on a slow host the run degrades to fewer passes — the
    // `runs` field reports what actually ran — instead of eating the
    // ladder from the other side next round. The last ladder context is
    // fresh enough (a handful of heavy executions, restart-every-2/3) that
    // a dedicated restart here would only spend budget.
    while (passesDone < runs && elapsedSec + passCostSec * 1.1 < budgetSec) {
      val t0 = elapsedSec
      runSuitePass()
      passCostSec = math.max(passCostSec, elapsedSec - t0)
      emitNow()
    }
    if (passesDone < runs)
      System.err.println(s"[bench] budget: stopped at $passesDone of " +
        s"$runs suite passes (elapsed ${r4(elapsedSec)}s of ${budgetSec}s)")
    emitNow()
    spark.stop()
  }
}

/** Synthesizes a `factor`x copy of the bench input by unioning key-shifted
  * copies of the big tables (entity keys shifted by a copy-index stride so
  * copy k of `orders` still joins copy k of `customer`), writes it to a
  * temp dir laid out like a testdata SF dir, and names the queries heavy
  * enough to be worth re-timing there. Bench-harness-only data: the
  * correctness oracle never sees it. */
object ScaleLadder {
  /** The families whose cost is dominated by the scaled tables: per-key
    * compaction fold, snapshot MERGE, incremental agg, dedup sketches,
    * ANN. Near-linear `ratio_vs_sf` here is the survives-100x evidence.
    * ORDER IS PRIORITY ORDER: when the wall-clock budget runs short the
    * tail is skipped, so the families whose scale receipts past rounds
    * demanded (compact_lineitem, compact_fast, decontam, dedup_exact)
    * run first. */
  val queries: Seq[String] = Seq(
    "cdc_compact_lineitem", "cdc_compact_fast", "decontam_overlap",
    "dedup_exact", "cdc_compact", "cdc_merge_into", "cdc_merge_big",
    "cdc_incremental_agg", "dedup_minhash", "dedup_simhash",
    "ann_topk", "ann_ivf", "text_tfidf", "text_dup_spans", "q_pagerank")

  /** Second-scale-point families: the compact trio whose scale receipts
    * rounds 7-8 demanded, plus the worst 10x ratio (dedup_minhash 9.34x in
    * round 11 — output-structure-attributed, which a second point either
    * confirms or refutes) and the big-batch bucketed MERGE regime
    * (cdc_merge_big: >1M compacted actions into a bucketed snapshot at
    * this point — the round-13 regime-coverage ask). */
  val queries2: Seq[String] = Seq(
    "cdc_compact_lineitem", "cdc_compact_fast", "decontam_overlap",
    "dedup_minhash", "cdc_merge_big")

  /** Every table a [[queries2]] family reads: compact_lineitem scans
    * lineitem, compact_fast synthesizes from events, decontam/minhash scan
    * documents, merge_big merges lineitem-derived actions into orders.
    * Materializing just these keeps the 30x build inside the bench
    * budget. */
  val tables2: Set[String] = Set("lineitem", "events", "documents", "orders")

  private val Stride = 1_000_000_000L

  private def shifted(df: DataFrame, n: Int, idCols: Seq[String]): DataFrame = {
    val withK = df.withColumn("__k", explode(expr(s"sequence(0L, ${n - 1}L)")))
    idCols.foldLeft(withK) { (d, c) =>
      d.withColumn(c, col(c) + col("__k") * Stride)
    }.drop("__k")
  }

  /** Key-shifted copies would make every document near-identical to its 9
    * siblings and plant a quadratic 45-candidate-pairs-per-doc structure
    * the real corpus doesn't have (measured: 22.8x time at 10x data).
    * Instead, copy k>0 of doc i splices the first half of doc i onto the
    * second half of doc (i + k*131 mod N): cross-copy Jaccard lands
    * around 1/3 — below the near-dup threshold — so the scaled corpus is
    * 10x MORE text, not 10x copies of the same text. */
  private def remixedDocuments(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ids = docs.agg(min("doc_id"), count(lit(1))).head()
    val (minId, total) = (ids.getLong(0), ids.getLong(1))
    val halves = docs.select(col("doc_id").as("__pid"),
      expr("substring(text, length(text) div 2 + 1)").as("__hb"))
    docs.withColumn("__k", explode(expr(s"sequence(0L, ${n - 1}L)")))
      .withColumn("__pid",
        (col("doc_id") - minId + col("__k") * 131L) % total + minId)
      .join(halves, Seq("__pid"))
      .select(
        (col("doc_id") + col("__k") * Stride).as("doc_id"),
        when(col("__k") === 0, col("text"))
          .otherwise(concat(
            expr("substring(text, 1, length(text) div 2)"), col("__hb")))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def materialize(spark: SparkSession, sfDir: String, n: Int,
      tables: Option[Set[String]] = None): String = {
    val out = s"/tmp/graft_bench_scale_x$n"
    def wanted(name: String): Boolean = tables.forall(_.contains(name))
    // events.ts round-trips in whatever encoding the source carries
    // (nanos-long under the session's nanosAsLong tolerance, or NTZ):
    // Tables.normalizeEventTs adapts on re-read either way
    val plans: Seq[(String, Seq[String])] = Seq(
      // l_suppkey/l_partkey shift too so the q_pagerank ladder graph is
      // 10 DISJOINT copies (10x nodes and edges), not 10x duplicate rows
      // of one graph that the pipeline's distinct() collapses — that
      // would make its ratio an artifact, not a scaling receipt
      "lineitem"   -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
      "events"     -> Seq("event_id", "user_id"),
      "customer"   -> Seq("c_custkey"),
      "orders"     -> Seq("o_orderkey", "o_custkey"),
      "embeddings" -> Seq("vec_id"))
    // Write the scaled corpus as MANY files: the narrow explode (and AQE
    // coalescing on the join) would otherwise emit one part-file per table,
    // and a single file under files.maxPartitionBytes scans as ONE task —
    // the round-5/8 ladder's "<1 core at 10×" symptom was this harness
    // artifact, not an operator property. A real 10× corpus is many files.
    val parts = spark.sparkContext.defaultParallelism
    plans.foreach { case (name, ids) =>
      if (wanted(name)) {
        val src = spark.read.parquet(s"$sfDir/$name.parquet")
        shifted(src, n, ids).repartition(parts).write.mode("overwrite")
          .parquet(s"$out/$name.parquet")
      }
    }
    if (wanted("documents"))
      remixedDocuments(spark, sfDir, n).repartition(parts).write.mode("overwrite")
        .parquet(s"$out/documents.parquet")
    out
  }
}
