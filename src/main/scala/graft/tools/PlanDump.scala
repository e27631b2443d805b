package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FormattedMode, QueryExecution}
import org.apache.spark.sql.util.QueryExecutionListener

/** Optimization-round helper (not part of the driver contract): dumps
  * `.explain("formatted")` for named declared queries to files, so plan
  * claims in OPTIMIZATION_r*.md are checkable against committed artifacts.
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [query...]`
  * — writes `<outDir>/<query>_<suffix>.txt` per query (all queries when no
  * names are given). The session mirrors Bench.mkSession (same shuffle
  * partitions, same determinism-sort flag) so the dumped plan is the plan
  * the bench actually times.
  *
  * The dump is the EXECUTED plan: each query runs through the bench's
  * noop sink and the write's own QueryExecution is captured via a
  * [[QueryExecutionListener]] (the ProfileProbe technique) — a bare
  * `df.queryExecution` never executes, so under AQE it would print the
  * static `isFinalPlan=false` skeleton, which hides exactly the things
  * plan claims are about (ReusedExchange, AQEShuffleRead coalescing,
  * runtime join-strategy changes). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Set[String] = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.bench.noDeterminismSort", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qes = new java.util.concurrent.ConcurrentLinkedQueue[(String, QueryExecution)]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = qes.add((funcName, qe))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    SparkEntryAccess.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          qes.clear()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          graft.Bench.drainListeners(spark.sparkContext)
          // the window's last write QE is ours (sequential execution);
          // iterative operators run auxiliary actions first
          val all = qes.toArray(Array.empty[(String, QueryExecution)])
          val plan = all
            .filter(q => Set("save", "overwrite", "append").contains(q._1))
            .lastOption.map(_._2.explainString(FormattedMode))
            .getOrElse(fn(spark, sfDir).queryExecution.explainString(FormattedMode))
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          // Iterative operators cut lineage with Dataset.localCheckpoint,
          // so the final write QE is only the post-checkpoint TAIL (the
          // r21 verdict's q_pagerank plan-dump gap): also dump the LAST
          // checkpoint materialization's QE — under the r22 fused-chain
          // policy that is the whole iteration loop in one plan.
          all.filter(q => Set("checkpoint", "localCheckpoint").contains(q._1))
            .lastOption.foreach { case (_, qe) =>
              Files.writeString(Paths.get(s"$outDir/${name}_loop_$suffix.txt"),
                qe.explainString(FormattedMode))
              println(s"[plandump] wrote ${name}_loop")
            }
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

private object SparkEntryAccess {
  def queries = graft.SparkEntry.queries
}
