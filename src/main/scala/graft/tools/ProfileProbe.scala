package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Attribution probe for the profile pair's first-vs-warm shuffle-byte
  * delta (SURVEY §7q item 146): runs q_profile N times in one session —
  * matching the bench suite's shared-session regime — and prints, per
  * execution, the task-metric shuffle bytes plus the EXECUTED plan's
  * exchange/partition structure, so the plan-state difference between a
  * session's first execution and its warm re-executions is read directly
  * off the plans instead of inferred from byte deltas.
  *
  * The plan is captured through a [[QueryExecutionListener]] on the noop
  * WRITE's own QueryExecution: `df.queryExecution` is a separate,
  * never-executed execution whose adaptive plan stays at its static
  * initial state — printing it would show an identical pre-AQE skeleton
  * every rep and wrongly conclude "no plan difference". Listener-bus
  * drains reuse [[graft.Bench.drainListeners]] (a fixed sleep smears one
  * execution's tail task events into the next window on a loaded host —
  * the exact regime this probe targets).
  *
  * Usage: runMain graft.tools.ProfileProbe [sfDir] [reps] [contaminate]
  * `contaminate` = run the first N suite queries once before the profile
  * reps, replicating the bench suite's session state at q_profile's
  * pass-1 position (the +13-20% first-in-suite byte level appears only
  * with that context, not in isolation).
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val contaminate = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.bench.noDeterminismSort", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new org.apache.spark.scheduler.SparkListener {
      val rd = new java.util.concurrent.atomic.AtomicLong
      val wr = new java.util.concurrent.atomic.AtomicLong
      val tasks = new java.util.concurrent.atomic.AtomicLong
      val spill = new java.util.concurrent.atomic.AtomicLong
      val recs = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          rd.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          wr.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          tasks.incrementAndGet()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // captures the WRITE's executed QueryExecution — after execution its
    // AdaptiveSparkPlanExec renders the final (isFinalPlan=true) plan.
    // ALL completions in the measurement window are collected and the
    // probe picks the `save` one: a last-writer AtomicReference would
    // print whatever execution completed last on the async listener bus
    // (an auxiliary action of the query, or a straggler from the
    // previous window), attributing the wrong plan to the write.
    val qes = new java.util.concurrent.ConcurrentLinkedQueue[(String, QueryExecution)]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = qes.add((funcName, qe))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = qes.add((funcName, qe))
    })
    if (contaminate > 0) {
      val prefix = graft.SparkEntry.queries.toVector
        .takeWhile(_._1 != "q_profile").take(contaminate)
      println(s"=== contaminating with ${prefix.size} suite queries before q_profile")
      prefix.foreach { case (_, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[probe] contaminator failed: ${e.getMessage}") }
      }
    }
    (1 to reps).foreach { i =>
      graft.Bench.drainListeners(spark.sparkContext)
      val (r0, w0, t0) = (listener.rd.get, listener.wr.get, listener.tasks.get)
      val (s0, c0) = (listener.spill.get, listener.recs.get)
      qes.clear()
      val df = graft.queries.Analytics.qProfile(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      graft.Bench.drainListeners(spark.sparkContext)
      val (r1, w1, t1) = (listener.rd.get, listener.wr.get, listener.tasks.get)
      val (s1, c1) = (listener.spill.get, listener.recs.get)
      // records vs bytes separates "more rows emitted" (a plan/agg
      // difference) from "same rows, worse compression" (spill-segment
      // fragmentation under memory pressure)
      println(s"=== exec $i: srd=${r1 - r0} swr=${w1 - w0} tasks=${t1 - t0} " +
        s"spill=${s1 - s0} shuffle_records=${c1 - c0}")
      // the write above is the window's only DataFrameWriter action; its
      // QE reports the writer's funcName ("overwrite" for mode-overwrite
      // V2 writes, "save" on the V1 path). Auxiliary executions in the
      // window (e.g. "rdd" from an internal action) are listed but not
      // matched; if several writes somehow land, the LAST is ours (the
      // probe's writes are sequential).
      val captured = qes.toArray(Array.empty[(String, QueryExecution)])
      val writes = captured.filter(q => Set("save", "overwrite", "append")
        .contains(q._1))
      if (writes.size != captured.size)
        println(s"  (window saw ${captured.size} executions: " +
          s"${captured.map(_._1).mkString(",")} — matched the write)")
      writes.lastOption.map(_._2) match {
        case None => println("  (no write QueryExecution captured)")
        case Some(qe) =>
          val full = sys.env.get("GRAFT_PROBE_FULL").contains("1")
          qe.executedPlan.toString.linesIterator
            .filter(l => full || l.contains("Exchange") || l.contains("FileScan") ||
              l.contains("AQEShuffleRead") || l.contains("HashAggregate") ||
              l.contains("Expand") || l.contains("isFinalPlan"))
            .foreach(l => println("  " + (if (full) l else l.trim).take(200)))
      }
    }
    spark.stop()
  }
}
