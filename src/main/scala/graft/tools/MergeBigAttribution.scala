package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.{Bench, ScaleLadder, SparkEntry}

/** Head re-run receipt for `cdc_merge_big`'s 30x ladder ratio (not part of
  * the driver contract; run by hand). The round-19 official record landed
  * the family at ratio 11.66 vs a 3.78-7.30 historical band with
  * plan-constant shuffle bytes and ~24 cores busy for the whole wall —
  * the same shape `cdc_compact_lineitem`'s above-band rounds had, which
  * three head re-runs at bit-identical bytes attributed to host CPU
  * weather. This probe is that treatment, focused: per rep it opens a
  * FRESH context (the ladder gives merge_big a fresh context too:
  * queries2 index 4, restartEvery 2), runs warm + 3 timed on the sf side
  * and on the 30x side exactly like `runLadder`'s minOf3, and records
  * every wall with its shuffle-byte and task-CPU deltas. Verdict logic:
  * bit-identical scaled-side read bytes across all reps + walls tracking
  * CPU load = weather; byte or partition-count drift = a real mechanism
  * (AQE lottery on the changelog side was the judge's first suspect).
  * Writes `merge_big_attribution.json` in the cwd.
  *
  * Usage: `runMain graft.tools.MergeBigAttribution [sfDir] [reps]`
  * (defaults /root/testdata/sf0.1, 3). Reuses an existing
  * /tmp/graft_bench_scale_x30 corpus; materializes one if absent.
  */
object MergeBigAttribution {

  private final class L extends SparkListener {
    val cpuNs = new AtomicLong; val rdB = new AtomicLong; val wrB = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        rdB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        wrB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  // mirrors Bench.mkSession: the receipt must measure the same session
  // the ladder measures (UTC loaders, nanos tolerance, no-sort bench mode)
  private def mkSession(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.graft.bench.noDeterminismSort", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val fn = SparkEntry.queries("cdc_merge_big")
    def r4(d: Double): Double = math.rint(d * 10000) / 10000

    var spark = mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    var l = new L
    spark.sparkContext.addSparkListener(l)

    val x30 = Paths.get("/tmp/graft_bench_scale_x30")
    val dir30 =
      if (Files.isDirectory(x30.resolve("orders.parquet"))) x30.toString
      else ScaleLadder.materialize(spark, sfDir, 30, Some(ScaleLadder.tables2))
    println(s"[attrib] 30x corpus: $dir30")

    def restart(): Unit = {
      spark.stop()
      spark = mkSession(cpus)
      spark.sparkContext.setLogLevel("WARN")
      l = new L
      spark.sparkContext.addSparkListener(l)
    }

    def timed(dir: String): (Double, Double, Long, Long) = {
      Bench.drainListeners(spark.sparkContext)
      val (c0, r0, w0) = (l.cpuNs.get, l.rdB.get, l.wrB.get)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Bench.drainListeners(spark.sparkContext)
      ((wall, (l.cpuNs.get - c0) / 1e9, l.rdB.get - r0, l.wrB.get - w0))
    }

    val repJsons = (1 to reps).map { rep =>
      restart()
      timed(sfDir) // warm: codegen/classloader startup, like the ladder
      val sf = Seq.fill(3)(timed(sfDir))
      timed(dir30)
      val sc = Seq.fill(3)(timed(dir30))
      val (sfMin, scMin) = (sf.map(_._1).min, sc.map(_._1).min)
      val ratio = r4(scMin / sfMin)
      println(f"[attrib] rep $rep: sf walls ${sf.map(t => f"${t._1}%.2f").mkString("/")} s, " +
        f"30x walls ${sc.map(t => f"${t._1}%.2f").mkString("/")} s, " +
        f"ratio $ratio%.2f, 30x read bytes ${sc.map(_._3).mkString("/")}")
      s"""{"rep":$rep,"sf_walls":[${sf.map(t => r4(t._1)).mkString(",")}],""" +
        s""""walls":[${sc.map(t => r4(t._1)).mkString(",")}],""" +
        s""""sf_sec":${r4(sfMin)},"sec":${r4(scMin)},"ratio_vs_sf":$ratio,""" +
        s""""cpu_sec":[${sc.map(t => r4(t._2)).mkString(",")}],""" +
        s""""shuffle_read":[${sc.map(_._3).mkString(",")}],""" +
        s""""shuffle_write":[${sc.map(_._4).mkString(",")}],""" +
        s""""sf_shuffle_read":[${sf.map(_._3).mkString(",")}]}"""
    }
    spark.stop()

    val json =
      s"""{"family":"cdc_merge_big","factor":30,"sf":"$sfDir","reps":${repJsons.mkString("[", ",", "]")}}"""
    Files.write(Paths.get("merge_big_attribution.json"),
      json.getBytes(StandardCharsets.UTF_8))
    println(s"[attrib] wrote merge_big_attribution.json")
  }
}
