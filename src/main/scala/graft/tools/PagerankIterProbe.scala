package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sub-iteration attribution for Graph.pageRank (r21 optimization round,
  * not part of the driver contract): one PageRank iteration at sf0.1
  * burns ~10 task-CPU-s for a ~1.2M-row join + aggregate whose
  * first-principles cost is well under 1 CPU-s. This probe times the
  * iteration's pieces separately — cached-edge scan, the shuffled-hash
  * join, the contribution aggregate, the rank-vector rebuild join, the
  * checkpoint — so the burn pins to one operator instead of being argued
  * about. Usage: `runMain graft.tools.PagerankIterProbe [sfDir]`. */
object PagerankIterProbe {

  private final class L extends SparkListener {
    val cpuNs = new AtomicLong; val rdB = new AtomicLong
    val tasks = new AtomicLong
    val stages = new AtomicLong; val jobs = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        rdB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        tasks.incrementAndGet()
      }
    }
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onJobEnd(
        e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      jobs.incrementAndGet()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new L
    spark.sparkContext.addSparkListener(l)

    def timed(name: String)(f: => Unit): Unit = (1 to 3).foreach { round =>
      Thread.sleep(300)
      val (c0, r0, t0n) = (l.cpuNs.get, l.rdB.get, l.tasks.get)
      val (s0, j0) = (l.stages.get, l.jobs.get)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val (c1, r1, t1n) = (l.cpuNs.get, l.rdB.get, l.tasks.get)
      println(f"[probe] $name (r$round): $wall%.2f s wall, ${(c1 - c0) / 1e9}%.2f cpu-s, " +
        f"shufrd ${(r1 - r0) / 1e6}%.1f MB, tasks ${t1n - t0n}, " +
        f"stages ${l.stages.get - s0}, jobs ${l.jobs.get - j0}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Full-query phase first (fresh-context numbers, the stage-count
    // receipt for the r22 fused-iteration-chain change): the declared
    // q_pagerank end to end, stages/jobs per execution.
    timed("F: full q_pagerank query")(
      noop(graft.queries.Analytics.qPagerank(spark, sfDir)))

    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = graft.queries.Analytics.pagerankEdges(spark, sfDir)
    val edeg = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")).dropDuplicates("src", "dst")
      .withColumn("__deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist(disk)
    val nodes = edeg.select(col("src").as("node")).dropDuplicates("node")
      .persist(disk)
    val n = nodes.count()
    println(s"[probe] n_nodes=$n")
    val ranks = nodes.withColumn("rank", round(lit(1.0) / n, 12))
      .localCheckpoint(true)

    timed("A: cached edeg scan only")(noop(edeg))
    timed("B: SHJ edeg*ranks, project __c") {
      noop(edeg
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"),
          expr("cast(round(rank * 1e12d) as long) div __deg").as("__c")))
    }
    timed("B2: SMJ (no hint) edeg*ranks, project __c") {
      noop(edeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("cast(round(rank * 1e12d) as long) div __c".replace("__c", "__deg")).as("__c")))
    }
    timed("C: B + groupBy(node).sum") {
      noop(edeg
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"),
          expr("cast(round(rank * 1e12d) as long) div __deg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s")))
    }
    timed("D: full iteration w/ rebuild join + ckpt") {
      val contrib = edeg
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"),
          expr("cast(round(rank * 1e12d) as long) div __deg").as("__c"))
      noop(nodes
        .join(contrib.groupBy(col("node")).agg(sum(col("__c")).as("__s")),
          Seq("node"), "left")
        .select(col("node"), round(lit(0.15 / n) +
          lit(0.85) * (coalesce(col("__s"), lit(0L)).cast("double") / lit(1e12)),
          12).as("rank"))
        .localCheckpoint(true))
    }
    edeg.unpersist(false); nodes.unpersist(false)

    // Setup variants: the loop-invariant out-degree attachment.
    timed("S1: window count over hash(src) [current]") {
      val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .repartition(col("src")).dropDuplicates("src", "dst")
        .withColumn("__deg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
        .persist(disk)
      noop(e)
      e.unpersist(true)
    }
    timed("S2: groupBy deg + broadcast join") {
      val ded = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .repartition(col("src")).dropDuplicates("src", "dst")
      val deg = ded.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      val e = ded.join(broadcast(deg), "src").persist(disk)
      noop(e)
      e.unpersist(true)
    }
    spark.stop()
  }
}
