package graft.tools

import java.util.concurrent.atomic.AtomicReference

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
  * Usage: runMain graft.tools.ProfileProbe [sfDir] [reps]
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          rd.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          wr.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          tasks.incrementAndGet()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // captures the WRITE's executed QueryExecution — after execution its
    // AdaptiveSparkPlanExec renders the final (isFinalPlan=true) plan
    val lastQe = new AtomicReference[QueryExecution]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = lastQe.set(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = lastQe.set(qe)
    })
    (1 to reps).foreach { i =>
      graft.Bench.drainListeners(spark.sparkContext)
      val (r0, w0, t0) = (listener.rd.get, listener.wr.get, listener.tasks.get)
      lastQe.set(null)
      val df = graft.queries.Analytics.qProfile(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      graft.Bench.drainListeners(spark.sparkContext)
      val (r1, w1, t1) = (listener.rd.get, listener.wr.get, listener.tasks.get)
      println(s"=== exec $i: srd=${r1 - r0} swr=${w1 - w0} tasks=${t1 - t0}")
      Option(lastQe.get) match {
        case None => println("  (no QueryExecution captured)")
        case Some(qe) =>
          qe.executedPlan.toString.linesIterator
            .filter(l => l.contains("Exchange") || l.contains("FileScan") ||
              l.contains("AQEShuffleRead") || l.contains("HashAggregate") ||
              l.contains("Expand") || l.contains("isFinalPlan"))
            .foreach(l => println("  " + l.trim.take(180)))
      }
    }
    spark.stop()
  }
}
