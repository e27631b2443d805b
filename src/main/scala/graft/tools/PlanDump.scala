package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round helper (not part of the driver contract): dumps
  * `.explain("formatted")` for named declared queries to files, so plan
  * claims in OPTIMIZATION_r*.md are checkable against committed artifacts.
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [query...]`
  * — writes `<outDir>/<query>_<suffix>.txt` per query (all queries when no
  * names are given). The session mirrors Bench.mkSession (same shuffle
  * partitions, same determinism-sort flag) so the dumped plan is the plan
  * the bench actually times.
  */
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
    SparkEntryAccess.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
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
