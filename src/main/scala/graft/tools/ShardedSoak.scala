package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the SCALE-OUT lever of the live pipeline: the rate ladder
  * pinned the single-pipeline apply ceiling at ≈5k actions/s and
  * attributed it to micro-batch cadence (IntakeProbe: parse alone runs at
  * 676k msgs/s; ApplyProbe: delta-mode apply is flat in table size), which
  * predicts the ceiling multiplies with PIPELINES, not cores. This tool is
  * that claim's receipt: N complete, independent soak pipelines (scripted
  * wire server → livePump → file-source micro-batches → supervised
  * StreamingMerge, each on its own spool/checkpoint/table store —
  * [[StreamingSoak.run]] verbatim) at a per-shard offered rate past the
  * single-pipeline knee, aggregate applied rate per shard count.
  * Near-linear growth with every shard converging byte-exact
  * (missing=extra=wrong=0) is the scale-out story.
  *
  * Two modes, because they answer different questions:
  *
  *  - `procs` (the production shape): one JVM per shard — its own Spark
  *    driver, scheduler, and heap, with the host's cores SPLIT across
  *    shards (local[32/N] each) so the aggregate line is cores-constant.
  *    This is what "the spool shards for free" means in deployment: a
  *    table shard per sync process (or per executor group on a cluster);
  *    nothing is shared but the hardware.
  *  - `threads` (the single-driver ceiling): all shards as concurrent
  *    streaming queries in ONE session, each in its own FAIR-scheduler
  *    pool. This measures where the shared driver itself saturates —
  *    every micro-batch of every shard passes through one DAGScheduler
  *    event loop and one scheduler lock, so past ~2 pipelines the
  *    per-shard rate collapses (measured: 2.6k/2.6k/1.0k actions/s per
  *    shard at 1/2/4). The knee is the DRIVER, not the cores — which is
  *    exactly why the production answer is one driver per shard.
  *
  * Usage: runMain graft.tools.ShardedSoak [durationSec] [ratePerShard]
  * [mode: procs|threads] [shardCounts...] (defaults 60 / 8000 / procs /
  * 1 2 4). Prints one JSON line and writes `sharded_soak_receipt.json`
  * (procs) / `sharded_soak_threads.json` (threads).
  */
object ShardedSoak {

  private def field(json: String, key: String): Double =
    ("\"" + key + "\":(-?[0-9.]+)").r.findFirstMatchIn(json)
      .map(_.group(1).toDouble)
      .getOrElse(sys.error(s"receipt missing $key: $json"))

  /** (aggRate, nonconvergedShards, perShardJson, totalActions, maxWall) */
  private type Point = (Double, Int, String, Long, Double)

  private def summarize(receipts: Seq[String]): Point = {
    val actions = receipts.map(field(_, "actions")).sum
    val maxWall = receipts.map(field(_, "wall_to_quiesce_sec")).max
    val bad = receipts.count(r =>
      field(r, "missing") != 0 || field(r, "extra") != 0 ||
        field(r, "wrong") != 0 || !r.contains("\"converged\":true"))
    val perShard = receipts.zipWithIndex.map { case (r, i) =>
      s"""{"shard":$i,"applied_actions_per_sec":${field(r, "applied_actions_per_sec")},""" +
      s""""actions":${field(r, "actions").toLong},""" +
      s""""wall_to_quiesce_sec":${field(r, "wall_to_quiesce_sec")},""" +
      s""""missing":${field(r, "missing").toLong},"extra":${field(r, "extra").toLong},""" +
      s""""wrong":${field(r, "wrong").toLong},""" +
      s""""final_rows":${field(r, "final_rows").toLong}}"""
    }.mkString("[", ",", "]")
    (math.rint(actions / maxWall * 10) / 10, bad, perShard, actions.toLong, maxWall)
  }

  // ---- threads mode: concurrent pipelines in one session ----
  private def threadPoint(spark: SparkSession, n: Int, durationSec: Int,
      rate: Int): Point = {
    val receipts = new Array[String](n)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until n).map { i =>
      val t = new Thread(() => {
        try {
          // pool assignment rides the thread-local into the shard's
          // streaming query and its supervision restarts
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"shard$i")
          receipts(i) = StreamingSoak.run(spark, durationSec, rate,
            txnSize = 10,
            killAtFraction = 2.0, // pure-throughput leg: chaos legs are
            writeReceiptFile = false, // receipted separately (soak_receipt,
            schemaChangeAtFraction = 0.0, // soak_chaos_receipts)
            streamName = s"soak_x${n}_s$i",
            quiesceDeadlineSec = 900)
        } catch { case e: Throwable => errors.add(e) }
      }, s"soak-shard-$n-$i")
      t.start()
      t
    }
    threads.foreach(_.join())
    if (!errors.isEmpty)
      throw new RuntimeException(s"shard failed at n=$n", errors.peek())
    summarize(receipts.toSeq)
  }

  // Per-shard JVM heap (procs mode). The 8-shard curve point regressed
  // vs 4 shards with the historical 6g heap; this knob exists to separate
  // heap/GC pressure from a genuine CPU knee — rerun the same point with
  // a right-sized heap and compare (the receipt records the heap used).
  private val shardXmx: String = sys.env.getOrElse("GRAFT_SHARD_XMX", "6g")

  // ---- procs mode: one JVM per shard, cores split across shards ----
  private def procPoint(n: Int, durationSec: Int, rate: Int,
      hostCores: Int): Point = {
    import scala.jdk.CollectionConverters._
    val jvm = ProcessHandle.current().info().command()
      .orElse("java")
    // the forked runner's own JVM flags (add-opens, -Dspark.* props) are
    // exactly what a child Spark driver needs; heap is re-sized per shard.
    // Strip ALL inherited heap sizing, not just -Xmx: an inherited -Xms
    // (or -XX:InitialHeapSize) above the forced per-shard -Xmx makes every
    // child die at launch with "Initial heap size larger than maximum" —
    // environment-dependent (sbt runners are often given a big fixed heap)
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filterNot(a =>
        a.startsWith("-Xmx") || a.startsWith("-Xms") ||
        a.startsWith("-XX:InitialHeapSize") || a.startsWith("-XX:MaxHeapSize")).toSeq
    val cp = System.getProperty("java.class.path")
    val cpusPerShard = math.max(4, hostCores / n)
    val procs = (0 until n).map { i =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_shardproc_${n}_$i").toFile
      val cmd = (Seq(jvm) ++ inherited ++ Seq(s"-Xmx$shardXmx", "-cp", cp,
        "graft.tools.StreamingSoak",
        durationSec.toString, rate.toString,
        "2.0", // no kill leg: pure-throughput point
        "0.0", // no schema leg
        "50", "2 seconds", "full", "100000",
        "900" // drain budget for the saturation backlog
      )).asJava
      val pb = new ProcessBuilder(cmd)
      pb.directory(dir) // each child writes soak_receipt.json in its cwd
      pb.environment().put("GRAFT_SOAK_CPUS", cpusPerShard.toString)
      pb.redirectOutput(new java.io.File(dir, "stdout.log"))
      pb.redirectError(new java.io.File(dir, "stderr.log"))
      (pb.start(), dir)
    }
    val receipts = procs.map { case (p, dir) =>
      val done = p.waitFor((durationSec + 960).toLong, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { p.destroyForcibly(); sys.error(s"shard JVM in $dir hung") }
      val f = new java.io.File(dir, "soak_receipt.json")
      if (p.exitValue() != 0 || !f.isFile)
        sys.error(s"shard JVM in $dir failed rc=${p.exitValue()} " +
          s"(see ${dir}/stderr.log)")
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    }
    summarize(receipts)
  }

  def main(args: Array[String]): Unit = {
    val durationSec = args.headOption.map(_.toInt).getOrElse(60)
    val ratePerShard = args.lift(1).map(_.toInt).getOrElse(8000)
    val mode = args.lift(2).getOrElse("procs")
    val shardCounts =
      if (args.length > 3) args.drop(3).toSeq.map(_.toInt) else Seq(1, 2, 4)
    val hostCores = Runtime.getRuntime.availableProcessors

    // threads mode shares one session; procs mode needs none (children
    // build their own) — but building it up front keeps the warmup
    // uniform and gives procs mode a place to read defaults from
    val spark: SparkSession =
      if (mode == "threads")
        graft.GraftSession.builder().config("spark.scheduler.mode", "FAIR").getOrCreate()
      else null
    if (spark != null) {
      spark.sparkContext.setLogLevel("WARN")
      // untimed warmup pipeline: JVM/codegen/state-store startup otherwise
      // lands entirely on the first measured point and inflates the
      // speedup-vs-1 of every later one (children in procs mode each pay
      // their startup OUTSIDE the measured window instead: the applied
      // clock starts at first action, and every shard pays it equally)
      System.err.println("[sharded] warmup pipeline (untimed)")
      StreamingSoak.run(spark, durationSec = 10, rate = 2000, txnSize = 10,
        killAtFraction = 2.0, writeReceiptFile = false,
        streamName = "soak_warmup", quiesceDeadlineSec = 120)
    }

    val points = shardCounts.map { n =>
      System.err.println(
        s"[sharded] === $n shard(s) @ $ratePerShard actions/s each ($mode) ===")
      val (rate, bad, perShard, acts, wall) =
        if (mode == "threads") threadPoint(spark, n, durationSec, ratePerShard)
        else procPoint(n, durationSec, ratePerShard, hostCores)
      System.err.println(s"[sharded] n=$n aggregate=$rate actions/s " +
        s"(wall=$wall, nonconverged=$bad)")
      (n, rate, bad, perShard, acts, wall)
    }

    val base = points.head._2
    val pts = points.map { case (n, rate, bad, per, acts, wall) =>
      val speedup = math.rint(rate / base * 100) / 100
      s"""{"shards":$n,"aggregate_applied_actions_per_sec":$rate,""" +
      s""""speedup_vs_1":$speedup,"total_actions":$acts,""" +
      s""""wall_to_quiesce_sec":$wall,"nonconverged_shards":$bad,""" +
      s""""per_shard":$per}"""
    }.mkString("[", ",", "]")
    val converged = points.forall(_._3 == 0)
    val modeDesc =
      if (mode == "threads") "one session, FAIR, one pool per shard"
      else s"one JVM per shard, local[${math.max(4, hostCores / shardCounts.max)}..$hostCores] cores-constant split"
    val receipt =
      s"""{"metric":"graft_sharded_soak","mode":"$mode","duration_sec":$durationSec,""" +
      s""""shard_xmx":"$shardXmx",""" +
      s""""offered_rate_per_shard":$ratePerShard,"all_converged":$converged,""" +
      s""""scheduler":"$modeDesc","points":$pts}"""
    println(receipt)
    val out = if (mode == "threads") "sharded_soak_threads.json"
              else "sharded_soak_receipt.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (receipt + "\n").getBytes("UTF-8"))
    if (spark != null) spark.stop()
  }
}
