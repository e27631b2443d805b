package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{ChangeAction, ChangelogCompactor}
import graft.sources.Tables

/** Stage-attribution probe for the scale-ladder families (not part of the
  * driver contract; run by hand while tuning): times each pipeline stage
  * separately — with task-CPU and shuffle-byte deltas from a listener — so
  * a super-linear ladder ratio can be pinned to a stage instead of argued
  * about. Usage: `runMain graft.BenchProbe <family> [sfDir]` with family in
  * {compact, fast, decontam, dedupexact, minhash, dupspans}; sfDir defaults to the
  * materialized 10x ladder dir. Every stage runs twice (cold, warm): the
  * driver's ladder reports steady state, so the warm number is the one
  * that must match. */
object BenchProbe {

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

  def main(args: Array[String]): Unit = {
    val family = args.headOption.getOrElse("compact")
    val sfDir = args.lift(1).getOrElse("/tmp/graft_bench_scale_x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // mirror Bench.mkSession: probe timings must attribute against the
      // same data the driver's UTC/nanos-tolerant sessions read, and the
      // `materialize` mode must accept every testdata encoding the
      // loaders do
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new L
    spark.sparkContext.addSparkListener(l)
    import spark.implicits._

    def timed(name: String)(f: => Unit): Unit = (1 to 2).foreach { round =>
      Thread.sleep(300) // let the async listener bus drain
      val (c0, r0, w0) = (l.cpuNs.get, l.rdB.get, l.wrB.get)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val (c1, r1, w1) = (l.cpuNs.get, l.rdB.get, l.wrB.get)
      println(f"[probe] $name (r$round): $wall%.2f s wall, ${(c1 - c0) / 1e9}%.1f cpu-s, " +
        f"shuf ${(r1 - r0) / 1e6}%.1f/${(w1 - w0) / 1e6}%.1f MB rd/wr")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    family match {
      case "compact" => // cdc_compact_lineitem stages
        def synth: DataFrame = {
          val w = Window.partitionBy(col("l_orderkey"))
            .orderBy(col("l_linenumber"), col("l_extendedprice"))
          Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_extendedprice"),
              row_number().over(w).as("rn"))
            .select(
              lit("li").as("table"),
              col("rn").cast("long").as("lsn"),
              lit(0).as("seq"),
              when(col("rn") === 1, "I").otherwise("U").as("op"),
              map(lit("id"), col("l_orderkey").cast("string")).as("keyBefore"),
              map(lit("id"), col("l_orderkey").cast("string"),
                lit("price"), col("l_extendedprice").cast("string")).as("values"),
              array().cast("array<string>").as("nulls"),
              array().cast("array<string>").as("unchanged"),
              lit(false).as("rekey"))
        }
        def clustered: DataFrame = synth
          .withColumn("__key", graft.cdc.CompactKeys.keyStrCol(col("keyBefore")))
          .repartition(col("table"), col("__key"))
          .sortWithinPartitions(col("table"), col("__key"), col("lsn"), col("seq"))
          .drop("__key")
        def compacted: DataFrame =
          ChangelogCompactor.compact(synth.as[ChangeAction], hasRekeys = Some(false)).toDF()
        def gatedCore: DataFrame = compacted
          .select(element_at(col("keyBefore"), "id").cast("long").as("order_id"),
            col("op"),
            element_at(col("values"), "price").cast("double").as("val"),
            col("lsn"))
        timed("synth only")(noop(synth))
        timed("synth + cluster shuffle/sort")(noop(clustered))
        timed("  + typed decode/re-encode")(
          noop(clustered.as[ChangeAction].mapPartitions(identity).toDF()))
        timed("full compact (fold)")(noop(compacted))
        timed("gated core (no orderedSmall)")(noop(gatedCore))
        timed("gated full (orderedSmall tail)")(
          noop(gatedCore.repartition(1).sortWithinPartitions(col("order_id"))))

      case "fast" => // cdc_compact_fast stages (events stream)
        def actions = {
          val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          val op = when(col("rn") === 1, "I")
            .when(col("rn") === col("n") && col("event_type") === "error", "D")
            .otherwise("U")
          Tables.events(spark, sfDir)
            .withColumn("rn", row_number().over(w))
            .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
            .select(
              lit("users").as("table"),
              col("event_id").as("lsn"),
              lit(0).as("seq"),
              op.as("op"),
              map(lit("id"), col("user_id").cast("string")).as("keyBefore"),
              when(op === "D", map().cast("map<string,string>"))
                .otherwise(map(lit("id"), col("user_id").cast("string"),
                  lit("val"), col("value").cast("string"))).as("values"),
              array().cast("array<string>").as("nulls"),
              array().cast("array<string>").as("unchanged"),
              lit(false).as("rekey"))
        }
        def clustered: DataFrame = actions
          .withColumn("__key", graft.cdc.CompactKeys.keyStrCol(col("keyBefore")))
          .repartition(col("table"), col("__key"))
          .sortWithinPartitions(col("table"), col("__key"), col("lsn"), col("seq"))
          .drop("__key")
        def fastCompacted: DataFrame =
          ChangelogCompactor.compactSimple(actions.as[ChangeAction]).toDF()
        def gatedCore: DataFrame = fastCompacted
          .select(element_at(col("keyBefore"), "id").cast("long").as("user_id"),
            col("op"),
            element_at(col("values"), "val").cast("double").as("val"),
            col("lsn"))
        timed("synth only")(noop(actions))
        timed("synth + cluster shuffle/sort")(noop(clustered))
        timed("  + typed decode/re-encode")(
          noop(clustered.as[ChangeAction].mapPartitions(identity).toDF()))
        timed("full compactSimple")(noop(fastCompacted))
        timed("gated core (no orderedSmall)")(noop(gatedCore))
        timed("gated full (orderedSmall tail)")(
          noop(gatedCore.repartition(1).sortWithinPartitions(col("user_id"))))
        timed("slow compact on same stream")(
          noop(ChangelogCompactor.compact(actions.as[ChangeAction],
            hasRekeys = Some(false)).toDF()))

      case "decontam" =>
        import graft.functions.TextAnalysis
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val evalDocs = docs.filter(col("doc_id") % 7 === 0)
        val trainDocs = docs.filter(col("doc_id") % 7 =!= 0)
          .unionByName(evalDocs.select((col("doc_id") + 20000).as("doc_id"), col("text")))
        def evalNg = evalDocs
          .select(explode(TextAnalysis.wordNgrams(col("text"), 5)).as("__ngram"))
          .distinct()
        def trainNg = trainDocs
          .select(col("doc_id"), explode(TextAnalysis.wordNgrams(col("text"), 5)).as("__ngram"))
        println(s"[probe] eval distinct ngrams: ${evalNg.count()}")
        println(s"[probe] train ngram rows: ${trainNg.count()}")
        timed("eval ngrams distinct")(noop(evalNg))
        timed("train ngrams explode only")(noop(trainNg))
        timed("probe: broadcast join + agg")(
          noop(trainNg.join(broadcast(evalNg.withColumn("__hit", lit(1L))),
              Seq("__ngram"), "left_outer")
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_ngrams"),
              sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))))
        timed("probe: shuffle join + agg")(
          noop(trainNg.join(evalNg.withColumn("__hit", lit(1L)),
              Seq("__ngram"), "left_outer")
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_ngrams"),
              sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))))
        timed("probe: hash64 shuffle join + agg") {
          val ev = evalNg.select(xxhash64(col("__ngram")).as("__nh"))
            .distinct().withColumn("__hit", lit(1L))
          noop(trainNg.select(col("doc_id"), xxhash64(col("__ngram")).as("__nh"))
            .join(ev, Seq("__nh"), "left_outer")
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_ngrams"),
              sum(coalesce(col("__hit"), lit(0L))).as("n_hits")))
        }
        timed("full gated (current, broadcast + orderedSmall)")(
          noop(graft.operators.Decontaminate.overlap(
              trainDocs, evalDocs, "doc_id", "text", n = 5, threshold = 0.5)
            .repartition(1).sortWithinPartitions(col("doc_id"))))

      case "report" => // decontam_report stage attribution (r21: 14
        // task-CPU-s at sf0.1 against ~0.35M train 5-grams)
        import graft.functions.TextAnalysis
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val evalDocs = docs.filter(col("doc_id") % 7 === 0)
        val trainDocs = docs.filter(col("doc_id") % 7 =!= 0)
          .unionByName(docs.filter(col("doc_id") % 14 === 0)
            .select((col("doc_id") + 20000).as("doc_id"), col("text")))
        def evalGrams = evalDocs
          .select(col("doc_id"), explode(TextAnalysis.wordNgrams(col("text"), 5)).as("__ngram"))
          .distinct()
        def evalSet = evalGrams.select(col("__ngram")).distinct()
        def trainG = trainDocs
          .select(explode(TextAnalysis.wordNgrams(col("text"), 5)).as("__ngram"))
        timed("eval grams distinct (id,ngram)")(noop(evalGrams))
        timed("eval set distinct (ngram)")(noop(evalSet))
        timed("train explode only")(noop(trainG))
        timed("train semi-join + distinct") {
          noop(trainG.join(broadcast(evalSet), Seq("__ngram"), "left_semi").distinct())
        }
        timed("full decontam_report query")(
          noop(SparkEntry.queries("decontam_report")(spark, sfDir)))

      case "dedupexact" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val corpus = docs.unionByName(
          docs.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 10000).as("doc_id"), col("text")))
        def groups = graft.operators.Dedup.exactGroups(corpus, "doc_id", "text")
          .filter(col("n_copies") > 1)
        timed("scan + md5 only")(
          noop(corpus.select(col("doc_id"), md5(col("text")).as("h"))))
        timed("exact groups (no orderedSmall)")(noop(groups))
        timed("gated full (orderedSmall tail)")(
          noop(groups.repartition(1).sortWithinPartitions(col("keep_id"))))

      case "minhash" =>
        import graft.operators.Dedup
        val docs = {
          val d = spark.read.parquet(s"$sfDir/documents.parquet")
            .select(col("doc_id"), col("text"))
          d.unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 10000).as("doc_id"),
              concat(col("text"), lit(" spark engine dedup suffix tail")).as("text")))
        }
        def sigs = Dedup.minhashSignature(docs, "doc_id", "text", 5, 64)
        timed("minhash sigs only")(noop(sigs))
        timed("minhash candidates") {
          val n = Dedup.minhashCandidates(sigs, "doc_id", 8, 8).count()
          println(s"[probe]   candidates: $n")
        }
        timed("minhash full pairs")(
          noop(Dedup.minhashPairs(docs, "doc_id", "text", 5, 64, 8, 0.7)))

      case "dupspans" => // text_dup_spans stages (r11 ladder rehearsals
        // ranged 3.13x/5.32x/3.13x — this attribution run pins whether the
        // outlier lives in one stage or was host noise across all of them)
        import graft.operators.SpanDedup
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        def sites = SpanDedup.spanSites(docs, "doc_id", "text", k = 8)
        timed("span sites (scan+tokenize+md5)")(noop(sites))
        timed("dup-span filter (hash shuffle + count>1)") {
          val n = sites.groupBy(col("span_md5"))
            .agg(count(lit(1)).as("s")).filter(col("s") > 1).count()
          println(s"[probe]   duplicated spans: $n")
        }
        timed("full stats (island windows)")(
          noop(SpanDedup.duplicatedSpanStats(docs, "doc_id", "text", k = 8)))

      case "cpuwatch" => // the r12 watch item: text_tfidf / text_dup_spans
        // task-CPU at the 10x point moved 31.7->45.0 / 17.3->35.6 s on
        // bit-identical shuffle bytes. This family re-times the EXACT
        // gated queries (bench determinism-sort flag mirrored) so a quiet
        // window either reproduces the growth (plan problem) or pins it
        // on host CPU-steal (receipt either way).
        spark.conf.set("spark.graft.bench.noDeterminismSort", "true")
        Seq("text_tfidf", "text_dup_spans").foreach { name =>
          val fn = SparkEntry.queries(name)
          timed(s"$name warm+1")(noop(fn(spark, sfDir)))
          timed(s"$name steady")(noop(fn(spark, sfDir)))
        }

      case "pagerank" => // q_pagerank stage attribution (r21 optimization
        // round: 59 task-CPU-s at sf0.1 is the suite's largest single CPU
        // sink; this family pins which stage owns it)
        val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        def edges = graft.queries.Analytics.pagerankEdges(spark, sfDir)
        timed("edges (distinct+sym union)")(noop(edges))
        timed("full q_pagerank")(
          noop(SparkEntry.queries("q_pagerank")(spark, sfDir)))
        timed("setup: edeg window cache + nodes") {
          val edeg = edges.select(col("src").cast("long"), col("dst").cast("long"))
            .repartition(col("src")).dropDuplicates("src", "dst")
            .withColumn("__deg", count(lit(1)).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
            .persist(disk)
          val nodes = edeg.select(col("src").as("node")).dropDuplicates("node")
            .persist(disk)
          val n = nodes.count()
          println(s"[probe]   n_nodes=$n")
          var ranks = nodes.withColumn("rank", round(lit(1.0) / n, 12))
            .localCheckpoint(true)
          timed("one iteration (join+agg+rebuild+ckpt)") {
            val contrib = edeg
              .join(ranks.withColumnRenamed("node", "src"), "src")
              .select(col("dst").as("node"),
                expr(s"cast(round(rank * 1e12d) as long) div __deg").as("__c"))
            ranks = nodes
              .join(contrib.groupBy(col("node")).agg(sum(col("__c")).as("__s")),
                Seq("node"), "left")
              .select(col("node"), round(lit(0.15 / n) +
                lit(0.85) * (coalesce(col("__s"), lit(0L)).cast("double") / lit(1e12)),
                12).as("rank"))
              .localCheckpoint(true)
          }
          edeg.unpersist(false); nodes.unpersist(false)
        }

      case "profilex" => // q_profile Expand vs split-arm alternative (r21)
        val li = Tables.lineitem(spark, sfDir)
        val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
          "l_returnflag", "l_shipdate")
        timed("current profile (Expand countDistinct)")(
          noop(graft.operators.Profile.profile(li, cols)))
        timed("split arms (base agg + per-col distinct aggs)") {
          val src = graft.operators.Skew.feedCluster(li)
          val baseAggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
            count(col(c)).as(s"__nn_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c")))
          val base = src.agg(baseAggs.head, baseAggs.tail: _*)
          val joined = cols.foldLeft(base) { (acc, c) =>
            acc.crossJoin(
              li.select(col(c)).distinct().agg(count(col(c)).as(s"__nd_$c")))
          }
          noop(joined)
        }
        timed("full q_profile (current)")(
          noop(SparkEntry.queries("q_profile")(spark, sfDir)))

      case "materialize" => // build the ladder dir by hand:
        // runMain graft.BenchProbe materialize <srcSfDir> [factor]
        val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
        val n = args.lift(2).map(_.toInt).getOrElse(10)
        println(s"[probe] materialized ${ScaleLadder.materialize(spark, src, n)}")

      case other => sys.error(s"unknown probe family: $other")
    }
    spark.stop()
  }
}
