package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-run dispersion check for a single scale-ladder family — the
  * discipline that separated host noise from plan regressions for
  * dedup_minhash at 100× (minhash100_tworun.json): repeat the EXACT
  * ladder measurement (fresh SparkContext per repetition, untimed warm
  * run, then min-of-3 successful runs on BOTH the sf side and the scaled
  * side) twice, independently. Two repetitions agreeing pin the real
  * ratio; two repetitions dispersing by >2× on identical plans are the
  * known noisy-neighbor CPU-steal class on this host (probe-verified:
  * same shuffle bytes, 6.7 s vs 14.9 s wall). Round-14 flagged
  * `cdc_compact`'s 10× ratio moving 1.98× → 6.44× on a ~1 s base — this
  * is that watch item's receipt.
  *
  * Usage: runMain graft.tools.CompactTwoRun [family] [factor] [sfDir]
  * (defaults cdc_compact / 10 / $SPARK_GRAFT_SF_DIR or sf0.1). Prints one
  * JSON line and writes `compact_tworun.json`.
  */
object CompactTwoRun {

  /** Bench.mkSession's exact configuration (it is private there): the
    * two-run numbers must be comparable with the driver ladder's, which
    * means the same shuffle width, UTC session, nanos tolerance, and the
    * bench-only determinism-sort bypass (orderedSmall's repartition(1)
    * exists for the DuckDB oracle, not the operator). */
  private def mkSession(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ui.retainedExecutions", "10")
    .config("spark.ui.retainedJobs", "100")
    .config("spark.ui.retainedStages", "200")
    .config("spark.graft.bench.noDeterminismSort", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  /** Tables each ladder family reads, so `materialize` builds only those
    * (cdc_compact synthesizes its changelog from events; the lineitem
    * variants scan lineitem; the dedup/decontam families scan documents). */
  private val familyTables: Map[String, Set[String]] = Map(
    "cdc_compact" -> Set("events"),
    "cdc_compact_fast" -> Set("events"),
    "cdc_incremental_agg" -> Set("events"),
    "cdc_compact_lineitem" -> Set("lineitem"),
    "cdc_merge_into" -> Set("lineitem", "orders"),
    "cdc_merge_big" -> Set("lineitem", "orders"),
    "dedup_exact" -> Set("documents"),
    "decontam_overlap" -> Set("documents"))

  def main(args: Array[String]): Unit = {
    val family = args.headOption.getOrElse("cdc_compact")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val fn = graft.SparkEntry.queries.getOrElse(family,
      sys.error(s"unknown query: $family"))

    // materialize once, in its own context (the ladder also materializes
    // outside the timed contexts)
    val s0 = mkSession(cpus)
    s0.sparkContext.setLogLevel("WARN")
    val scaledDir = graft.ScaleLadder.materialize(s0, sfDir, factor,
      familyTables.get(family))
    s0.stop()

    def minOf3(spark: SparkSession, dir: String): Double = {
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[tworun] $family FAILED on $dir: ${e.getMessage}")
            None
        }
      }
      once() // warm, untimed for selection
      val ok = Seq.fill(3)(once()).flatten
      require(ok.nonEmpty, s"$family failed all runs on $dir")
      ok.min
    }

    val reps = (1 to 2).map { rep =>
      val spark = mkSession(cpus)
      spark.sparkContext.setLogLevel("WARN")
      try {
        spark.range(1000).selectExpr("sum(id)").collect() // JVM warmup
        val sfSec = minOf3(spark, sfDir)
        val xSec = minOf3(spark, scaledDir)
        val ratio = math.rint(xSec / sfSec * 100) / 100
        System.err.println(
          f"[tworun] rep$rep: sf=$sfSec%.2f s ${factor}x=$xSec%.2f s ratio=$ratio")
        (rep, sfSec, xSec, ratio)
      } finally spark.stop()
    }
    val js = reps.map { case (r, sf, x, ratio) =>
      f"""{"rep":$r%d,"sf_sec":$sf%.3f,"x${factor}%d_sec":$x%.3f,"ratio_vs_sf":$ratio%.2f}"""
    }.mkString("[", ",", "]")
    val receipt =
      s"""{"metric":"graft_ladder_tworun","family":"$family","factor":$factor,""" +
      s""""sf":"$sfDir","protocol":"fresh context per rep; warm + min-of-3 successful per side",""" +
      s""""reps":$js}"""
    println(receipt)
    // legacy name for the committed cdc_compact@10 receipt; other
    // family/factor combinations get their own file
    val out = if (family == "cdc_compact" && factor == 10) "compact_tworun.json"
              else s"tworun_${family}_x$factor.json"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      (receipt + "\n").getBytes("UTF-8"))
  }
}
