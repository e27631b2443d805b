package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line `{"metric":"total",...}`.
  *
  * Methodology (the measurement, not the code, is the artifact here):
  *   - N samples per query (N>=5), with min/median/max dispersion
  *     reported — this VM shows up-to-20x noisy-neighbor CPU-steal
  *     spikes, so a min-of-2 cannot separate plan regressions from
  *     neighbor noise (two rounds of phantom-regression triage proved it).
  *     The per-query HEADLINE value is the min of the SUCCESSFUL samples
  *     (the ladder already argued this at its min-of-3: a stall can only
  *     ADD wall time to an identical plan, so the min is the honest
  *     plan-cost signal) — the round-18 driver day reported q_rollup as
  *     73.87 s where its samples were [2.90, 144.85], a mean-of-2
  *     dominated by one ~100x CPU-steal sample that read as a phantom
  *     regression; the full spread still lands in `dispersion`;
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
  *     so a slow day now degrades the `runs` count, never the ladder;
  *   - within the ladder budget the 30x point is RESERVED: its cost is
  *     priced from pass-1 walls (refined by the 10x measurements, the
  *     measured materialization, and the measured context-restart cost as
  *     they arrive) and 10x families start only while they leave that
  *     reserve intact — round 17's ~3.3x-slow driver day completed 15/15
  *     at 10x and then had nothing left for 30x two rounds running; now
  *     the 10x TAIL sheds by name instead (priority order keeps the
  *     must-have families first), and the 30x ladder runs even after an
  *     incomplete 10x;
  *   - the reserve RELEASES when it becomes unfulfillable: once even the
  *     30x ENTRY cost (its materialization + its first family) exceeds
  *     the whole remaining budget, no 10x family can start (the reserve
  *     exceeds the entry cost by construction), so no measurement can
  *     ever shrink the estimates and the deadlock is permanent — the
  *     round-18 driver day (host_factor 6.31) priced the reserve at
  *     2,333 s against ~541 s remaining and shed ALL 15 10x families AND
  *     all 5 30x families, the reserve protecting nothing. On release
  *     the 30x ladder is recorded skipped (per-name reason
  *     `reserve_unfulfillable`, the priced reserve kept in
  *     `reserve2_est_sec`) and the 10x priority order spends the
  *     remainder gated on raw budget: some 10x ratios are strictly
  *     better evidence than none. The 10x materialization itself is
  *     guarded the same way the 30x one is (skipped with
  *     `ladder_status: "skipped_budget"` when not even the first family
  *     could follow it) — on the 6.31x day the build was paid for zero
  *     families;
  *   - every record stamps `host_factor` (measured pass-1 cost over the
  *     committed-baseline pass cost) so a reader normalizes slow-day
  *     walls instead of misreading host weather as a regression, and the
  *     post-ladder top-up passes run EXPENSIVE-FIRST with per-query
  *     budget gates, so even a badly slow day leaves the headline
  *     families with >=2 samples (`partial_passes` counts the cut ones);
  *   - per-query `failed_tasks` and `shuffle_read_spread` sidecars make
  *     byte-level anomalies attributable: the byte counters sum every
  *     task attempt (retries inflate them), and a handful of operators
  *     deliberately retain session-lifetime caches (BPE trained merges,
  *     decontam eval-ngram set, minhash collapse frame) whose fill cost
  *     lands on their FIRST execution only — a runs=1 record reports that
  *     first-execution cost where a multi-run median reports the steady
  *     state, which is exactly the round-17 "load-dependent inflation"
  *     finding (it was sample-count, not load).
  */
object Bench {

  /** Wall-clock-free plan metrics, accumulated across all tasks. The
    * failed-task counter makes byte inflation ATTRIBUTABLE: the byte
    * counters sum every task attempt, so a stage retry under host
    * pressure double-counts its map outputs — a record showing inflated
    * bytes WITH failed_tasks = 0 is a real plan difference, one with
    * failures > 0 is retry accounting (round-17 finding #2 triage).
    * Only genuinely FAILED tasks count: an intentionally KILLED task
    * (job-group cancellation in ANN's overlapped trainers, speculative
    * or stage-cancel kills) is not a retry and must not trip the
    * sidecar's "failed_tasks>0 means retry byte accounting" read. */
  private final class TaskMetricsListener extends SparkListener {
    val cpuNs       = new AtomicLong
    val shufReadB   = new AtomicLong
    val shufWriteB  = new AtomicLong
    val failedTasks = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
      if (e.taskInfo != null && e.taskInfo.failed)
        failedTasks.incrementAndGet()
    }
    def snapshot: (Long, Long, Long, Long) =
      (cpuNs.get, shufReadB.get, shufWriteB.get, failedTasks.get)
  }

  /** Flush the async listener bus so per-query metric deltas are exact.
    * `listenerBus`/`waitUntilEmpty` are private[spark] (public in
    * bytecode); a short sleep is the fallback if the internals move.
    * Shared with the diagnostic probes (graft.tools.ProfileProbe): a
    * fixed sleep is exactly the unreliable drain this helper replaces. */
  private[graft] def drainListeners(sc: SparkContext): Unit =
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
              dir: String): (Double, Double, Long, Long, Boolean, Long) = {
      drainListeners(spark.sparkContext)
      val (c0, r0, w0, f0) = listener.snapshot
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
      val (c1, r1, w1, f1) = listener.snapshot
      (wall, (c1 - c0) / 1e9, r1 - r0, w1 - w0, ok, f1 - f0)
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
      collection.mutable.ArrayBuffer[(Double, Double, Long, Long, Boolean, Long)]]
    var passesDone = 0
    var partialPasses = 0
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

    // Per-query HEADLINE value: min of the SUCCESSFUL samples. On a
    // CPU-steal day a mean/median at runs=2 is dominated by one 100x
    // stall sample (r18 driver record: q_rollup 73.87 s from samples
    // [2.90, 144.85] at identical shuffle bytes, zero failed tasks);
    // `dispersion` keeps the spread. The math is pure and spec-pinned
    // (SampleStats + SampleStatsSpec, including a replay of that r18
    // day); these wrappers only bind the run's sample map into it.
    def headlineSec(name: String): Double =
      samples.get(name).map(v => SampleStats.headlineSec(v.toSeq)).getOrElse(-1.0)
    // Budget-gate price of re-running `name`: worst SUCCESSFUL wall, or
    // the worst crash wall when nothing succeeded (retrying a slow
    // crasher costs its time-to-crash, not the 1 s default) — a failed
    // sample's bogus-fast wall must never underprice the gate.
    def maxWall(name: String): Double =
      samples.get(name).map(v => SampleStats.maxWall(v.toSeq)).getOrElse(1.0)
    def suiteJsons: (String, String, String, String, String, Double, String) = {
      val have = selected.filter { case (n, _) => samples.contains(n) }
      val qs = have.map { case (name, _) =>
        s"\"$name\":${r4(headlineSec(name))}" }.mkString("{", ",", "}")
      // dispersion/cpu/byte metrics come from the ATTRIBUTABLE samples
      // (successful, falling back to all when nothing succeeded): a pass
      // that died mid-flight leaves partial wall/CPU/byte deltas that
      // would shift a median away from the plan's true signature — the
      // same distortion the spread sidecar below already filters
      val attrib0 = have.map { case (name, _) =>
        name -> SampleStats.attributable(samples(name).toSeq) }
      val disp = attrib0.map { case (name, v) =>
        val t = v.map(_._1)
        s"\"$name\":[${r4(t.min)},${r4(median(t))},${r4(t.max)}]"
      }.mkString("{", ",", "}")
      val cpu = attrib0.map { case (name, v) =>
        s"\"$name\":${r4(median(v.map(_._2)))}" }.mkString("{", ",", "}")
      // shuffle bytes are a deterministic property of the plan: identical
      // across reps up to AQE rounding, so the median is exact
      val srd = attrib0.map { case (name, v) =>
        s"\"$name\":${median(v.map(_._3.toDouble)).toLong}" }
        .mkString("{", ",", "}")
      val swr = attrib0.map { case (name, v) =>
        s"\"$name\":${median(v.map(_._4.toDouble)).toLong}" }
        .mkString("{", ",", "}")
      // the -1 sentinel of an all-failed query stays out of the total
      val total = r4(SampleStats.totalSec(have.map { case (n, _) => samples(n).toSeq }))
      // Attribution sidecar, emitted only where it carries signal: the
      // [min,max] shuffle-read spread for queries whose byte samples
      // DIFFER across passes (a first-execution cache-fill — BPE's
      // trained-merges map, decontam's retained eval-ngram set, minhash's
      // collapse frame — shows as a high pass-1 sample the median hides;
      // a runs=1 record reports exactly that high sample, cf. round-17
      // finding #2), and per-query failed-task counts when nonzero (the
      // byte counters sum every attempt, so retries inflate them).
      // successful samples only: a query that dies mid-flight leaves a
      // partial byte delta that would fabricate a spread entry the
      // sidecar's own documentation says to read as cache-fill signal
      val spread = have.flatMap { case (name, _) =>
        SampleStats.readSpread(samples(name).toSeq).map {
          case (lo, hi) => s"\"$name\":[$lo,$hi]" }
      }.mkString("{", ",", "}")
      val ftasks = have.flatMap { case (name, _) =>
        val f = samples(name).map(_._6).sum
        if (f == 0L) None else Some(s"\"$name\":$f")
      }.mkString("{", ",", "}")
      val attrib = s""""shuffle_read_spread":$spread,"failed_tasks":$ftasks"""
      (qs, disp, cpu, srd, swr, total, attrib)
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
    // Host-speed calibration stamped into every record: measured pass-1
    // cost over the committed close-state pass cost (round-17 builder
    // record: 132.7s/pass at these conditions). A reader normalizes a
    // slow-day record's walls by this factor instead of misreading host
    // weather as a regression — the round-17 driver day would have
    // stamped ~3.3.
    val RefPassSec = 133.0
    var hostFactor = 0.0
    // last-evaluated 30x reserve estimate, surfaced in the full record so
    // a skipped 10x family is attributable to the reservation policy
    var curReserve2 = 0.0

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
      val (qs, disp, cpu, srd, swr, total, attrib) = suiteJsons
      val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
      val full = s"""{"metric":"total","value":$total,"unit":"sec","runs":$passesDone,"partial_passes":$partialPasses,"host_factor":${r4(hostFactor)},"reserve2_est_sec":${r4(curReserve2)},"queries":$qs,"dispersion":$disp,"task_cpu_sec":$cpu,"shuffle_read_bytes":$srd,"shuffle_write_bytes":$swr,$attrib,"scale_ladder":$lastLadderJson,"scale_ladder2":$lastLadder2Json,"errors":$errs,"sf":"$sfDir"}"""
      println(full)
      val lad = ladderRatios.map { case (n, r) => s"\"$n\":$r" }.mkString("{", ",", "}")
      val sk = ladderSkipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val receipt = if (minhashReceipt.isEmpty) "" else s""","minhash_receipt":$minhashReceipt"""
      val lad2 = ladder2Ratios.map { case (n, r) => s"\"$n\":$r" }.mkString("{", ",", "}")
      val sk2 = ladder2Skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val receipt2 = if (minhashReceipt2.isEmpty) "" else s""","minhash_receipt2":$minhashReceipt2"""
      // Per-query walls (and, space permitting, task-CPU medians) ride the
      // compact line so the driver's round-over-round per_query comparison
      // has data (PERF_r20/r21 had per_query:{} — the full record's maps
      // never survive the 2,000-char stdout-tail capture). ADDITIONS ONLY:
      // every pre-existing compact field is byte-identical; the tail packs
      // most-expensive-first into whatever the hard line budget leaves, so
      // the headline families always make the cut and the sub-floor tail
      // is counted in queries_omitted instead of silently dropped.
      val perQ = selected.flatMap { case (name, _) =>
        samples.get(name).map { v =>
          val att = SampleStats.attributable(v.toSeq)
          (name, SampleStats.headlineSec(v.toSeq), median(att.map(_._2)))
        }
      }
      val compactBase = s"""{"metric":"graft_bench_compact","value":$total,"unit":"sec","runs":$passesDone,"partial_passes":$partialPasses,"host_factor":${r4(hostFactor)},"sf":"$sfDir","ladder_factor":$scaleN,"ladder_status":"$ladderStatus","ladder_ratio_vs_sf":$lad,"ladder_skipped":$sk$receipt,"ladder2_factor":$scale2N,"ladder2_status":"$ladder2Status","ladder2_ratio_vs_sf":$lad2,"ladder2_skipped":$sk2$receipt2,"errors":$errs"""
      val compact =
        compactBase + CompactTail.render(perQ, CompactTail.MaxLine - compactBase.length - 1) + "}"
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

    // ---- 30x-ladder budget reservation (round-17 #1) ----
    // The 30x ladder is the rarest evidence in the record (two slow driver
    // days in a row erased it), so its budget is PRICED and RESERVED
    // before the 10x ladder starts: a 10x family runs only if starting it
    // leaves the reserve intact, so a slow host sheds the 10x TAIL
    // (priority order puts the must-have families first) instead of the
    // whole second scale point. The price is refined as real measurements
    // arrive — each 10x family's own timings replace its pass-1 prior,
    // the measured 10x materialization prices the 30x one, the measured
    // context-restart cost replaces its guess — so early conservatism
    // decays into measurement as the ladder advances.
    var passCostSec = 0.0
    val sec10Meas = collection.mutable.Map.empty[String, (Double, Double)]
    var restartCostSec = 15.0
    var restartMeasured = false
    var matCostSec = -1.0
    var ladder2Pending = scaleN > 1 && scale2N > scaleN && only.isEmpty
    // pass-1 wall of `name` — the reserve's only pre-ladder signal. It
    // runs in the suite's shared (contaminated) session, so it OVERSTATES
    // the ladder's fresh-context sf-side cost ~2-6x; the prior multiplier
    // below is calibrated against that overstatement. SUCCESSFUL samples
    // only: a query that crashes fast in pass 1 records a near-zero wall
    // that would underprice exactly the work the reserve must bound.
    def w1(name: String): Double =
      samples.get(name).map(v => SampleStats.w1(v.toSeq)).getOrElse(2.0)
    // The pricing math itself is pure and spec-pinned (ReservePricing +
    // ReservePricingSpec): these thin wrappers only bind the run's
    // mutable measurement state into it.
    def pricing = ReservePricing(
      budgetSec = budgetSec, scaleN = scaleN, scale2N = scale2N,
      passCostSec = passCostSec, refPassSec = RefPassSec,
      restartCostSec = restartCostSec, matCostSec = matCostSec,
      pending = ladder2Pending, sec10 = sec10Meas.toMap, w1 = w1,
      queries2 = ScaleLadder.queries2)
    def est30Family(name: String): Double = pricing.est30Family(name)
    def mat2Est: Double = pricing.mat2Est
    // curReserve2 updates only while the reserve is PENDING: after a
    // release (spent or unfulfillable) the record keeps the last PRICED
    // value, so a reader of `reserve2_est_sec` sees the reserve that the
    // skip decision was made against, not the zero it released to.
    def reserve2Sec: Double = {
      val r = pricing.reserve2
      if (ladder2Pending) curReserve2 = r
      r
    }

    // ---- scale ladder: heavy families on a key-shifted scaleN x input ----
    // Budgeted and incremental: the suite result is already on stdout
    // before the first ladder job runs, each finished family re-emits the
    // full record, and families that would overrun SPARK_GRAFT_BENCH_BUDGET_SEC
    // are skipped BY NAME rather than letting the harness kill the process.
    val ladderNote = s"key-shifted copies of $sfDir; fresh context per " +
      "family group; warm + min-of-3 successful runs on both ratio sides"
    // skipped families carry a per-name reason ("budget" = raw budget
    // exhausted, "reserve" = shed to keep the 30x reserve intact,
    // "reserve_unfulfillable" = 30x families released by the deadlock
    // rule): a record must distinguish reserve-shed 10x families from
    // budget-shed ones or the shed is unattributable.
    def skJson(skipped: Seq[(String, String)]): String = {
      val names = skipped.map("\"" + _._1 + "\"").mkString("[", ",", "]")
      val why = skipped.map { case (n, r) => s"\"$n\":\"$r\"" }
        .mkString("{", ",", "}")
      s""""skipped":$names,"skip_reason":$why"""
    }
    def ladderJson(entries: Seq[String], skipped: Seq[(String, String)],
                   status: String): String =
      s"""{"factor":$scaleN,"status":"$status","note":"$ladderNote",${skJson(skipped)},"queries":${entries.mkString("{", ",", "}")}}"""

    /** Fresh context: a long-lived bench session contaminates timings
      * (see class scaladoc — heap/state accumulation read as phantom
      * super-linearity at ladder volume). */
    def restartContext(): Unit = {
      val t0 = elapsedSec
      spark.stop()
      spark = mkSession(cpus)
      spark.sparkContext.setLogLevel("WARN")
      listener = new TaskMetricsListener
      spark.sparkContext.addSparkListener(listener)
      warmup()
      // feed the measured cost back into the 30x reserve price: the
      // FIRST measurement REPLACES the (hostFactor-scaled) prior — a max
      // against the prior could never come down and would over-shed 10x
      // families on slow days — and later measurements only ratchet
      // against other measurements (one GC-stalled restart staying
      // priced-in is the conservative direction for a reserve)
      val c = elapsedSec - t0
      restartCostSec = if (restartMeasured) math.max(restartCostSec, c) else c
      restartMeasured = true
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
      * Every family also records its successful walls per side
      * (`sf_walls`/`walls`) so band questions self-answer from the
      * record instead of needing head re-runs.
      * Families past the budget are skipped BY NAME, each with a reason
      * (`canStart` returns None to admit, or the skip reason). Appends
      * per-family ratios to `ratios`, emits an incremental record after
      * every family via `emitFn`, and returns the final status. */
    def runLadder(familyNames: Seq[String], dir: String, restartEvery: Int,
        labelPrefix: String,
        ratios: collection.mutable.LinkedHashMap[String, Double],
        skippedAcc: collection.mutable.ArrayBuffer[String],
        setReceipt: String => Unit,
        emitFn: (Seq[String], Seq[(String, String)], String) => Unit,
        canStart: String => Option[String] = _ => None,
        onMeasured: (String, Double, Double) => Unit = (_, _, _) => ()): String = {
      val entries = collection.mutable.ArrayBuffer.empty[String]
      val skipped = collection.mutable.ArrayBuffer.empty[(String, String)]
      val families = familyNames.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
      families.zipWithIndex.foreach { case ((name, fn), i) =>
        val skipReason =
          if (elapsedSec > budgetSec) Some("budget") else canStart(name)
        if (skipReason.isDefined) {
          skipped += ((name, skipReason.get)); skippedAcc += name
        }
        else {
          if (i % restartEvery == 0) restartContext()
          // min + walls selection is pure and spec-pinned
          // (SampleStats.ladderSide): a failed attempt's bogus-fast wall
          // can neither headline the side nor enter the walls sidecar
          def minOf3(d: String): Option[(Double, Double, Long, Long, Seq[Double])] = {
            timed(s"$labelPrefix:$name(warm)", fn, d)
            SampleStats.ladderSide(Seq.fill(3)(timed(s"$labelPrefix:$name", fn, d)))
          }
          val timedSides = (minOf3(sfDir), minOf3(dir))
          timedSides match {
            case (Some(sf), Some(sc)) => onMeasured(name, sf._1, sc._1)
            case _ => ()
          }
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
            case (Some(sf), Some((wall, cpuS, rdB, wrB, walls))) =>
              val ratio = if (sf._1 > 0) r4(wall / sf._1) else -1.0
              ratios(name) = ratio
              val sfWalls = sf._5.map(r4).mkString("[", ",", "]")
              val scWalls = walls.map(r4).mkString("[", ",", "]")
              s"""\"$name\":{\"sec\":${r4(wall)},\"sf_sec\":${r4(sf._1)},\"ratio_vs_sf\":$ratio,\"cpu_sec\":${r4(cpuS)},\"sf_cpu_sec\":${r4(sf._2)},\"shuffle_read\":$rdB,\"shuffle_write\":$wrB,\"sf_walls\":$sfWalls,\"walls\":$scWalls$receipt}"""
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
    passCostSec = elapsedSec - tPass1
    // host_factor calibrates ONLY when the run matches the baseline's
    // conditions (full suite, the sf0.1 input the 133 s constant was
    // measured on): an ONLY-filtered or different-SF run would stamp a
    // wildly-off factor (a 1.5 s single-query pass reads as 0.011) that
    // the documented normalize-by-it rule would amplify into nonsense.
    // 0.0 means "not calibrated".
    if (only.isEmpty && sfDir.replaceAll("/+$", "").endsWith("sf0.1"))
      hostFactor = passCostSec / RefPassSec
    // a slow host restarts contexts slowly too: scale the restart prior
    // until the first measured restart replaces it
    restartCostSec *= math.max(hostFactor, 1.0)

    def ladder2Json(entries: Seq[String], skipped: Seq[(String, String)],
                    status: String): String =
      s"""{"factor":$scale2N,"status":"$status","note":"$ladderNote",${skJson(skipped)},"queries":${entries.mkString("{", ",", "}")}}"""

    if (scaleN <= 1 || only.isDefined) { ladder2Pending = false; emit("{}") }
    else if (elapsedSec > budgetSec) {
      ladder2Pending = false
      ladderStatus = "skipped_budget"
      ladderSkipped ++= ScaleLadder.queries
      ladder2Status = "skipped_budget"
      ladder2Skipped ++= ScaleLadder.queries2
      emit(ladderJson(Nil, ScaleLadder.queries.map(_ -> "budget"), "skipped_budget"))
      emit2(ladder2Json(Nil, ScaleLadder.queries2.map(_ -> "budget"), "skipped_budget"))
    } else {
      // ---- unfulfillable-reserve release (the round-18 driver-day fix) --
      // Evaluated before ANY ladder spend and again before every 10x
      // admission: once the 30x ENTRY cost (materialization + first
      // family) no longer fits the remaining budget the deadlock is
      // permanent (ReservePricing.unfulfillable — the reserve blocks
      // every 10x family, so no measurement can ever shrink it), and the
      // reserve protects nothing. Release it: record the 30x ladder
      // skipped with per-name reason `reserve_unfulfillable` (the priced
      // reserve stays in `reserve2_est_sec`), and let the 10x priority
      // order spend the remainder gated on raw budget — some 10x ratios
      // are strictly better evidence than none (the r18 day shed all 20
      // families).
      def releaseIfUnfulfillable(): Unit =
        if (ladder2Pending && pricing.unfulfillable(elapsedSec)) {
          curReserve2 = pricing.reserve2
          ladder2Pending = false
          ladder2Status = "skipped_budget"
          ladder2Skipped ++= ScaleLadder.queries2
          System.err.println(s"[bench] 30x reserve unfulfillable (entry " +
            s"${r4(pricing.entry2)}s vs ${r4(budgetSec - elapsedSec)}s " +
            s"remaining): released, 10x ladder gates on raw budget")
          emit2(ladder2Json(Nil,
            ScaleLadder.queries2.map(_ -> "reserve_unfulfillable"),
            "skipped_budget"))
        }
      releaseIfUnfulfillable()
      // The 10x materialization is guarded like the 30x one (which only
      // runs "when the reserve math says at least one family can
      // follow"): do not pay the build unless the first family fits
      // behind it — on the r18 6.31x day the unguarded build was paid
      // for zero families, budget the top-up passes needed.
      val mat10Gate = elapsedSec + pricing.mat10Est +
        pricing.est10Family(ScaleLadder.queries.head)
      if (mat10Gate > budgetSec - reserve2Sec) {
        val reason = if (mat10Gate > budgetSec) "budget" else "reserve"
        ladderStatus = "skipped_budget"
        ladderSkipped ++= ScaleLadder.queries
        emit(ladderJson(Nil, ScaleLadder.queries.map(_ -> reason),
          "skipped_budget"))
      } else {
        ladderStatus = "in_progress"
        emit(ladderJson(Nil, Nil, "in_progress"))
        val tMat = elapsedSec
        val dir = ScaleLadder.materialize(spark, sfDir, scaleN)
        matCostSec = elapsedSec - tMat
        // ~6 heavy executions per context (restart every 3 families) is
        // far below the ~400-execution contamination horizon; a context
        // per family blew the round-9 budget.
        // A 10x family starts only if it leaves the 30x reserve intact
        // (full-family lookahead — ReservePricing.est10Family — so a
        // family can't start just under the line and then eat deep into
        // the reserve): on a slow host the 10x TAIL sheds by name, never
        // the second scale point; on a DEADLOCKED host the reserve
        // releases first (above) and the gate degrades to raw budget.
        ladderStatus = runLadder(ScaleLadder.queries, dir, restartEvery = 3,
          labelPrefix = "scale", ladderRatios, ladderSkipped,
          (v: String) => minhashReceipt = v,
          (e, s, st) => { ladderStatus = st; emit(ladderJson(e, s, st)) },
          canStart = name => {
            releaseIfUnfulfillable()
            val r = reserve2Sec
            val est10 = pricing.est10Family(name)
            if (elapsedSec + est10 <= budgetSec - r) None
            else if (elapsedSec + est10 <= budgetSec) Some("reserve")
            else Some("budget")
          },
          onMeasured = (n, sf, sc) => sec10Meas(n) = (sf, sc))
      }

      // ---- second scale point: the worst-ratio families at scale2N x ----
      // 30x executions are ~3x a phase-1 family: restart every 2 families.
      // Entry does NOT require a complete 10x ladder (the reservation may
      // have shed 10x tail families precisely so this can run) — only
      // enough remaining budget that the materialization plus at least
      // the first family fits: round 17 paid the 30x build and then
      // skipped every family, the worst of both. Runs whether or not the
      // 10x ladder was skipped (a reserve-shed 10x exists to fund this).
      if (scale2N > scaleN &&
          elapsedSec + mat2Est + est30Family(ScaleLadder.queries2.head) <= budgetSec) {
        // a mid-ladder release may have pre-marked the families skipped;
        // actually entering supersedes that record
        ladder2Skipped.clear()
        ladder2Status = "in_progress"
        emit2(ladder2Json(Nil, Nil, "in_progress"))
        val dir2 = ScaleLadder.materialize(spark, sfDir, scale2N,
          Some(ScaleLadder.tables2))
        // the reserve is spent from here on: families gate on the raw
        // budget (skipping their own tail by name if it runs short)
        ladder2Pending = false
        ladder2Status = runLadder(ScaleLadder.queries2, dir2, restartEvery = 2,
          labelPrefix = "scale2", ladder2Ratios, ladder2Skipped,
          (v: String) => minhashReceipt2 = v, (e, s, st) => { ladder2Status = st; emit2(ladder2Json(e, s, st)) })
      } else if (scale2N > scaleN && ladder2Pending) {
        ladder2Pending = false
        ladder2Status = "skipped_budget"
        ladder2Skipped ++= ScaleLadder.queries2
        emit2(ladder2Json(Nil, ScaleLadder.queries2.map(_ -> "budget"),
          "skipped_budget"))
      }
    }

    // ---- top-up suite passes: expensive-first, per-query budgeted ----
    // At runs=1 every wall is single-sample noise (round 17: q_funnel
    // 0.96 -> 20.9s at identical shuffle bytes), so whatever budget
    // remains after the ladders buys robustness for the HEADLINE families
    // first: each pass runs the suite in descending observed-cost order
    // (cheap tail rotated as before so neighbor spikes spread), and each
    // query starts only if its own worst observed wall (+20%) still fits.
    // A slow day then leaves every expensive family with >=2 samples and
    // an honest partial_passes count; a good day still reaches `runs`
    // full passes. The last ladder context is fresh enough (a handful of
    // heavy executions, restart-every-2/3) that a dedicated restart here
    // would only spend budget.
    val TopHead = 16
    def anyFits: Boolean =
      selected.exists { case (n, _) => elapsedSec + 1.2 * maxWall(n) < budgetSec }
    while (passesDone < runs && anyFits) {
      val t0 = elapsedSec
      val byCost = selected.sortBy { case (n, _) => -maxWall(n) }
      val (head, rest) = byCost.splitAt(TopHead)
      val rot = (passesDone * 13) % math.max(rest.size, 1)
      val order = head ++ rest.drop(rot) ++ rest.take(rot)
      var skippedAny = false
      order.foreach { case (name, fn) =>
        if (elapsedSec + 1.2 * maxWall(name) < budgetSec)
          samples.getOrElseUpdate(name, collection.mutable.ArrayBuffer.empty) +=
            timed(name, fn, sfDir)
        else skippedAny = true
      }
      passesDone += 1
      if (skippedAny) partialPasses += 1
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

/** Pure per-query statistics over timed suite samples — extracted (like
  * [[ReservePricing]]) so the semantics the HEADLINE record depends on
  * are spec-pinned (SampleStatsSpec) instead of closure-buried in
  * [[Bench.run]]. A sample is one `timed` execution:
  * `(wallSec, cpuSec, shufReadBytes, shufWriteBytes, ok, failedTasks)`.
  *
  * The ok flag is load-bearing in every function here: a failed run's
  * bogus-fast wall must never become the headline or underprice a budget
  * gate, and its partial byte delta must never fabricate a cache-fill
  * spread entry (the r18 driver day and its triage are cited at each
  * call site in [[Bench]]). */
private[graft] object SampleStats {
  type Sample = (Double, Double, Long, Long, Boolean, Long)

  /** Per-query HEADLINE: min of the SUCCESSFUL walls — a stall can only
    * ADD wall to an identical plan, so the min is the honest plan-cost
    * signal (r18 driver record: q_rollup reported 73.87 s as a mean of
    * [2.90, 144.85]). −1 when no sample succeeded: the query is already
    * loud in `errors`, and its crash walls would read suspiciously fast. */
  def headlineSec(v: Seq[Sample]): Double = {
    val ok = v.filter(_._5)
    if (ok.isEmpty) -1.0 else ok.map(_._1).min
  }

  /** Budget-gate price of re-running a query: worst SUCCESSFUL wall, or
    * the worst crash wall when nothing succeeded (retrying a slow crasher
    * costs its time-to-crash), or 1.0 with no samples at all. */
  def maxWall(v: Seq[Sample]): Double =
    if (v.isEmpty) 1.0
    else {
      val ok = v.filter(_._5)
      (if (ok.nonEmpty) ok else v).map(_._1).max
    }

  /** Reserve prior: the FIRST successful wall (pass-1 ordering), 2.0
    * when none — a query that crashes fast in pass 1 must not underprice
    * exactly the work the reserve bounds. */
  def w1(v: Seq[Sample]): Double = v.find(_._5).map(_._1).getOrElse(2.0)

  /** The samples whose metric values are attributable to the plan: the
    * successful ones — a run that died mid-flight leaves PARTIAL wall /
    * CPU / byte deltas that would shift a median away from the plan's
    * true signature — or all of them when nothing succeeded, so an
    * all-failed query still reports its observed crash walls instead of
    * an empty row (it is named in `errors` either way). */
  def attributable(v: Seq[Sample]): Seq[Sample] = {
    val ok = v.filter(_._5)
    if (ok.nonEmpty) ok else v
  }

  /** Shuffle-read [min,max] over SUCCESSFUL samples when they differ
    * (the cache-fill attribution sidecar); None when constant, or when
    * only failed samples exist — a query that dies mid-flight leaves a
    * partial byte delta that would fabricate a spread entry. */
  def readSpread(v: Seq[Sample]): Option[(Long, Long)] = {
    val b = v.filter(_._5).map(_._3)
    if (b.isEmpty || b.min == b.max) None else Some((b.min, b.max))
  }

  /** Suite total: sum of per-query headlines, all-failed sentinels (−1)
    * excluded — a crashed query contributes its absence, not a negative. */
  def totalSec(perQuery: Seq[Seq[Sample]]): Double =
    perQuery.map(headlineSec).filter(_ >= 0).sum

  /** One ladder side's record: the best (min-wall) SUCCESSFUL sample's
    * wall/CPU/read/write plus ALL successful walls — the per-family
    * dispersion sidecar that lets an out-of-band ratio be attributed
    * from the record alone (wide walls at constant bytes = host weather,
    * tight walls = a real cost change; the r19 cdc_merge_big 11.66
    * question needed head re-runs because this data was discarded). A
    * failed attempt's bogus-fast wall can neither become the side's
    * headline nor appear in `walls`; None when nothing succeeded (the
    * family reports `failed:true` instead of a fabricated timing). */
  def ladderSide(v: Seq[Sample]): Option[(Double, Double, Long, Long, Seq[Double])] = {
    val ok = v.filter(_._5)
    if (ok.isEmpty) None
    else {
      val best = ok.minBy(_._1)
      Some((best._1, best._2, best._3, best._4, ok.map(_._1)))
    }
  }
}

/** Per-query tail of the compact bench line (r22): the driver's stdout
  * capture keeps only the LAST ~2,000 chars and parses the LAST line as
  * JSON, so the full record's 127-entry metric maps can never reach it —
  * two rounds of `PERF per_query: {}` — while the compact line had ~900
  * spare chars. This packs `"queries":{name:wallSec}` entries
  * MOST-EXPENSIVE-FIRST (the headline families are where a regression
  * matters; the omitted tail sits at the ~0.1–0.35 s suite floor) into a
  * hard per-LINE budget, counts what didn't fit in `queries_omitted`,
  * and spends any remainder on `task_cpu_sec` medians (the noise-immune
  * plan signal) the same way. Pure so the budget discipline is
  * spec-pinned (CompactTailSpec) — an oversized final line would
  * truncate at the FRONT of the capture window and cost the round its
  * entire bench parse, totals included. */
private[graft] object CompactTail {
  /** Hard budget for the whole compact line (chars, excluding the
    * newline): the capture window is ~2,000 chars and the line must fit
    * INSIDE it in full, so 1,900 leaves slack for the trailing newline
    * and any off-by-a-few in the window itself. */
  val MaxLine = 1900

  private def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  /** Greedy-pack `"name":value` pairs (in the caller's order) into a JSON
    * object of at most `budget` chars including braces; a pair that does
    * not fit is skipped (a shorter later name may still fit — the result
    * stays deterministic). Returns (json, omittedCount). */
  private def pack(entries: Seq[(String, String)], budget: Int): (String, Int) = {
    val sb = new StringBuilder("{")
    var omitted = 0
    entries.foreach { case (n, v) =>
      val e = (if (sb.length > 1) "," else "") + "\"" + n + "\":" + v
      if (sb.length + e.length + 1 <= budget) sb.append(e) else omitted += 1
    }
    (sb.append("}").toString, omitted)
  }

  /** Render the tail (`,"queries":{...},"queries_omitted":N[,...]`) for
    * `perQ = (name, headlineWallSec, medianCpuSec)` within `budget`
    * chars; empty string when nothing fits. All-failed queries
    * (headline −1) are excluded — they are already loud in `errors`. */
  def render(perQ: Seq[(String, Double, Double)], budget: Int): String = {
    val ok = perQ.filter(_._2 >= 0)
    val wallsFixed = ""","queries":,"queries_omitted":""".length + 4
    if (ok.isEmpty || budget < wallsFixed + 20) return ""
    val wallEntries = ok.sortBy { case (n, w, _) => (-w, n) }
      .map { case (n, w, _) => n -> f2(w) }
    val (wj, wOmit) = pack(wallEntries, budget - wallsFixed)
    val wallsPart = s""","queries":$wj,"queries_omitted":$wOmit"""
    val cpuFixed = ""","task_cpu_sec":,"cpu_omitted":""".length + 4
    val rem = budget - wallsPart.length - cpuFixed
    if (rem < 20) return wallsPart
    val cpuEntries = ok.sortBy { case (n, _, c) => (-c, n) }
      .map { case (n, _, c) => n -> f2(c) }
    val (cj, cOmit) = pack(cpuEntries, rem)
    if (cj == "{}") wallsPart
    else wallsPart + s""","task_cpu_sec":$cj,"cpu_omitted":$cOmit"""
  }
}

/** Pure pricing for the 30x-ladder budget reservation (round-17 review
  * item #1): everything the reserve charges, as a function of the run's
  * measurement state, so the policy is unit-testable (ReservePricingSpec)
  * independent of a live bench run.
  *
  * Cost to run one family at the second scale point: warm + 3 timed on
  * both sides. Measured form: the sf side re-measures (~4 sf runs) and
  * the scaled side is bounded by linear-in-data growth from the 10x
  * point (sec30 <= (scale2N/scaleN) x sec10, +10% slack). Prior form
  * (before the family's 10x run): 18x its pass-1 wall — pass-1 walls run
  * ~2x the fresh-context sf side, and historical 30x/sf ratios center ~6
  * (r15-r17 bands: 2.3-10.0), so 4*(w1/2)*(1 + ~7) ~= 18*w1. The prior
  * is capped at a fifth of the whole budget: a freak pass-1 wall
  * (neighbor spikes of 20x at identical shuffle bytes are in the record)
  * must not balloon one family's reserve into shedding the entire 10x
  * ladder; the measured form replaces the prior as soon as the family's
  * own 10x timings exist.
  *
  * @param matCostSec measured 10x materialization cost, or negative if
  *   not yet measured (the prior is half a suite pass)
  * @param pending false once the 30x ladder has started (or will never
  *   run): the reserve releases to zero
  * @param sec10 per-family measured (sfSideSec, scaledSideSec) at 10x
  * @param w1 pass-1 wall lookup (contaminated-session suite walls) */
private[graft] final case class ReservePricing(
    budgetSec: Double, scaleN: Int, scale2N: Int,
    passCostSec: Double, refPassSec: Double,
    restartCostSec: Double, matCostSec: Double,
    pending: Boolean, sec10: Map[String, (Double, Double)],
    w1: String => Double, queries2: Seq[String]) {

  def est30Family(name: String): Double = sec10.get(name) match {
    case Some((sf, s10)) => 4 * (sf + (scale2N.toDouble / scaleN) * 1.1 * s10)
    case None            => math.min(18.0 * w1(name), 0.2 * budgetSec)
  }

  /** Cost to run one family at the first scale point: ~4 sf-side runs
    * (2x w1 — pass-1 walls run ~2x the fresh-context sf side) plus 4
    * scaled-side runs at a typical 10x/sf ratio of ~3 (observed
    * 0.9-8.9) ~= 8x w1, capped so one contaminated pass-1 spike can't
    * shed every family below it. */
  def est10Family(name: String): Double =
    math.min(8.0 * w1(name), 0.15 * budgetSec)

  /** A 10x family starts only while it leaves the 30x reserve intact
    * (full-family lookahead, not just the sf side: an sf-only lookahead
    * let the last-admitted family eat several times its estimate out of
    * the reserve it was supposed to protect). */
  def canStart10(name: String, elapsedSec: Double): Boolean =
    elapsedSec + est10Family(name) <= budgetSec - reserve2

  /** 10x materialization prior (it is paid BEFORE any measurement can
    * exist): historical builds cost ~0.3 of a suite pass, scaled by the
    * day's measured pass cost so a slow host prices a slow build. */
  def mat10Est: Double = 0.3 * math.max(passCostSec, refPassSec)

  /** What the 30x ladder needs to START at all: its materialization plus
    * its first (priority-head) family. */
  def entry2: Double = mat2Est + est30Family(queries2.head)

  /** The reserve is UNFULFILLABLE when even the 30x entry cost no longer
    * fits the remaining budget. At that point the deadlock is permanent:
    * `reserve2 >= entry2` by construction (the reserve prices the entry
    * plus four more families, restarts and slack), so every 10x family's
    * `canStart10` gate is unsatisfiable too, no measurement can ever
    * land, and the estimates are frozen — the reserve blocks the whole
    * 10x ladder while protecting a 30x ladder that can never run (the
    * r18 driver day at host_factor 6.31: reserve 2,333 s vs ~541 s
    * remaining, ALL 20 ladder families skipped). The caller must then
    * release it and spend the remainder down the 10x priority order. */
  def unfulfillable(elapsedSec: Double): Boolean =
    pending && elapsedSec + entry2 > budgetSec

  /** 30x materialization estimate: scale2N/scaleN the rows of the
    * measured 10x build, over the queries2-only table subset (~3/4 of
    * the rows); half a suite pass until the 10x build is measured. */
  def mat2Est: Double =
    if (matCostSec > 0) matCostSec * (scale2N.toDouble / scaleN) * 0.75
    else 0.5 * math.max(passCostSec, refPassSec)

  /** The full reserve: materialization + context restarts + every
    * queries2 family (+15% slack) + the minhash candidate receipt,
    * which runs the full pipeline once per side OUTSIDE the timed runs
    * and is priced as one more family. Zero once no longer pending. */
  def reserve2: Double =
    if (!pending) 0.0
    else mat2Est + 3 * restartCostSec +
      queries2.map(est30Family).sum * 1.15 +
      est30Family("dedup_minhash")
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
