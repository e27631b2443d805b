package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/classloader startup otherwise lands on
    // whichever query happens to run first (~4s of noise on one entry)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }
    var failed = List.empty[String]
    // best of two runs per query: the first run carries the one-time
    // codegen/JIT compile (irrelevant to steady-state throughput at
    // scale) and this VM shows ±2× noisy-neighbor spikes — min-of-2 is
    // the stable steady-state estimate
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // comma-separated allowlist for iterating on one query's plan without
    // paying for the whole suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None        => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      val times = (1 to runsPerQuery).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: forces full materialization of every output column
        // (a bare count() would let Catalyst prune the projection and
        // under-report the real query cost)
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() } catch {
          case e: Throwable =>
            // a failing query must be loud: a swallowed exception reads as
            // a suspiciously fast query in the benchmark output
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            if (!failed.contains(name)) failed ::= name
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
