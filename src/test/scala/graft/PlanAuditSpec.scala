package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audit: correctness tests prove the small-SF answer; these
  * prove the plan *shape* survives a 100×/1000× scale-up — filters reach
  * the parquet scan, projections prune columns, dimension joins broadcast,
  * and the MERGE path never shuffles the snapshot side. */
class PlanAuditSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("selective filter is pushed to the parquet scan with pruned columns") {
    val p = plan(queries.Analytics.qFilterPushdown(spark, dir))
    p should include("PushedFilters")
    // quantity filter is pushable; the projection reads 5 columns, not 11
    p should include("l_quantity")
    p.split("ReadSchema")(1).split("\n")(0) should not include "l_returnflag"
    p.split("ReadSchema")(1).split("\n")(0) should not include "l_shipdate"
  }

  test("dimension joins in q5 broadcast instead of shuffling the fact table") {
    val p = plan(queries.Analytics.q5LocalSupplier(spark, dir))
    p should include("BroadcastHashJoin")
  }

  test("date filters on orders/lineitem reach their scans in q3") {
    val p = plan(queries.Analytics.q3ShippingPriority(spark, dir))
    p should include("PushedFilters")
    p should include("IsNotNull(o_orderdate)")
  }

  test("MergeInto never shuffles the snapshot: changelog broadcasts, zero snapshot exchanges") {
    import spark.implicits._
    import graft.cdc._
    val rel = Relation("public", "items", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid)))
    val snap = spark.range(1000).selectExpr("id", "cast(id as string) as v")
    val cl = Seq(ChangeAction("items", 1, 0, "U", Map("id" -> "1"),
      Map("id" -> "1", "v" -> "x"), Nil, Nil, rekey = false)).toDS()
    val p = plan(MergeInto(snap, cl, rel))
    p should include("BroadcastHashJoin")
    // the only allowed exchanges are broadcast exchanges (changelog side)
    p.linesIterator.filter(_.contains("Exchange")).foreach { l =>
      l should include("Broadcast")
    }
  }

  test("q1 aggregation is whole-stage codegen'd with partial aggregation") {
    val p = plan(queries.Analytics.q1PricingSummary(spark, dir))
    p should include("HashAggregate")
    p should include("partial_sum") // map-side combine before the exchange
    p should include("partial_count")
  }

  test("asof join is one keyed shuffle: no range explosion, no nested loop") {
    import spark.implicits._
    val quotes = Seq(("A", 10L, 1.0)).toDF("sym", "ts", "px")
    val trades = Seq(("A", 12L, 5L)).toDF("sym", "ts", "qty")
    val p = plan(operators.AsofJoin(trades, quotes, Seq("sym"), "ts", Seq("px")))
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    p should include("Window")
    // exactly one exchange node: the union shuffles once on the key
    // (formatted explain prints each node in the tree AND a details
    // section, so count tree entries)
    p.linesIterator.count(l =>
      l.contains("- Exchange") || l.trim.startsWith("Exchange (")) shouldBe 1
    p should include("hashpartitioning(sym")
  }

  test("range join plans as an equi-join on buckets, not a nested loop") {
    import spark.implicits._
    val intervals = Seq((1, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val points = Seq(5.0).toDF("p")
    val p = plan(operators.RangeJoin.pointInInterval(
      points, intervals, "p", "lo", "hi", bucketWidth = 5.0))
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin")) shouldBe true
  }

  test("SQL-text Q6 pushes filters and prunes columns like the DataFrame API") {
    val p = plan(queries.Analytics.qSqlQ6(spark, dir))
    p should include("PushedFilters")
    p should include("l_shipdate")
    // scan reads only the 4 referenced columns of lineitem's 11
    val readSchema = p.split("ReadSchema")(1).split("\n")(0)
    readSchema should include("l_extendedprice")
    readSchema should not include "l_orderkey"
    readSchema should not include "l_returnflag"
  }

  test("embed_centroid partially aggregates vectors map-side before the exchange") {
    val p = plan(queries.LlmQueries.embedCentroid(spark, dir))
    // the typed Aggregator must fold into per-group buffers BEFORE the
    // shuffle — only |labels| fixed-size buffers cross the wire, never the
    // 64×-exploded corpus
    p should include("partial_scaledvecsum")
    // the posexplode fan-out happens strictly AFTER the final aggregate
    p.indexOf("posexplode") should be > p.indexOf("partial_scaledvecsum")
  }

  test("compaction exchange never ships the rendered __key (partition expression only)") {
    import spark.implicits._
    import graft.cdc._
    // >1 row: a single-row child has maxRows<=1 and the optimizer
    // (correctly) eliminates the in-partition sort outright
    val acts = (1 to 8).map(i => ChangeAction("t", i.toLong, 0, "I",
      Map("id" -> (i % 3).toString), Map("id" -> (i % 3).toString, "v" -> i.toString),
      Nil, Nil, rekey = false)).toDS()
    Seq(ChangelogCompactor.compact(acts, hasRekeys = Some(false)).toDF(),
        ChangelogCompactor.compactSimple(acts).toDF()).foreach { df =>
      val p = plan(df)
      // partitioning hashes the keyString RENDERING of the identity map...
      p should include("keyString")
      // ...but no exchange carries the rendered string as a column: it is
      // re-materialized AFTER the shuffle for the flat-key sort (round-8
      // ladder: shipping it doubled the compaction shuffle payload)
      val exchanges = p.split("\n\n").filter(s =>
        s.linesIterator.nextOption.exists(_.matches("\\(\\d+\\) Exchange.*")) &&
          s.contains("hashpartitioning"))
      exchanges should not be empty
      exchanges.foreach { s =>
        s.linesIterator.find(_.startsWith("Input")).get should not include "__key"
      }
      // the in-partition sort still orders by the materialized flat key
      val sorts = p.split("\n\n").filter(
        _.linesIterator.nextOption.exists(_.matches("\\(\\d+\\) Sort.*")))
      sorts.exists(_.contains("__key")) shouldBe true
    }
  }

  test("pre-partitioned localCheckpoint joins without re-exchanging (PageRank iteration shape)") {
    import org.apache.spark.sql.functions._
    // the mechanism Graph.pageRank relies on: repartition-then-persist
    // keeps HashPartitioning on the cached InMemoryRelation (a
    // localCheckpoint would NOT — under AQE its LogicalRDD reports
    // UnknownPartitioning), so each iteration's join moves only the
    // rank-vector side, never the corpus-sized edge list
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val e = spark.range(0, 1000)
      .select((col("id") % 97).as("src"), col("id").as("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      e.count()
      val ranks = spark.range(0, 97)
        .select(col("id").as("src"), lit(1.0).as("rank"))
      // the cached subtree is NOT part of the live plan tree (the
      // InMemoryTableScan is a leaf), so collecting Exchange nodes
      // counts exactly the shuffles this query would run
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.Exchange
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      val live = e.join(ranks, "src").queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      live.collect { case s: InMemoryTableScanExec => s }.nonEmpty shouldBe true
      live.collect { case x: Exchange => x }.size shouldBe 1 // rank side only
    } finally {
      e.unpersist(true)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("repartition-then-dropDuplicates dedups after ONE exchange (edge-prep fold)") {
    import org.apache.spark.sql.functions._
    // the mechanism Graph.pageRank and Dedup.connectedComponents rely on:
    // hash(src) satisfies the (src, dst) dedup's ClusteredDistribution
    // (equal rows share src → share a partition, Spark's subset rule), so
    // the aggregate needs no exchange of its own and passes hash(src)
    // through — distinct-then-repartition would shuffle the edges twice
    val edges = spark.range(0, 1000)
      .select((col("id") % 31).as("src"), (col("id") % 53).as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
    val p = plan(edges)
    p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*")) shouldBe 1
    // and the single exchange is the src repartition, not a (src, dst) one
    p should include("hashpartitioning(src")
    // belt: the exchange keys on src alone, never a composite (src, dst)
    p.linesIterator.filter(_.contains("hashpartitioning")).foreach { l =>
      l.contains("dst") shouldBe false
    }
    edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      (0L until 1000L).map(i => (i % 31, i % 53)).toSet
  }

  test("gap fill generates the day grid executor-side; windows partition by user") {
    val p = plan(queries.Analytics.qGapfill(spark, dir))
    // sequence+explode = partition-local generation, no driver materialization
    p should include("Generate")
    p should include("sequence(")
    p should include("hashpartitioning(user_id")
  }

  test("a selective dim filter injects a runtime bloom filter into the fact scan") {
    // runtime row-level filtering: at 100 TB the lineitem scan discards
    // non-matching rows BEFORE the join shuffle. Thresholds are lowered to
    // make the optimizer fire at test scale; on a cluster the defaults
    // (10 MB build side / 10 GB application side) gate the same rewrite.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "64MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join so the filter pays
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val ord = sources.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = sources.Tables.lineitem(spark, dir)
      val p = plan(li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count())
      p.toLowerCase should include("bloomfilter")
      p should include("might_contain")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("exact dedup shuffles 24-byte digests, not document text") {
    val p = plan(operators.Dedup.exactGroups(
      sources.Tables.documents(spark, dir), "doc_id", "text"))
    val shuffleLines = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    shuffleLines should not be empty
    shuffleLines.foreach { l =>
      l should include("__h")
      l should not include "text"
    }
  }

  test("decontamination broadcasts the eval set; the corpus side never sort-merges") {
    val docs = sources.Tables.documents(spark, dir)
    val p = plan(operators.Decontaminate.overlap(
      docs.filter("doc_id % 7 <> 0"), docs.filter("doc_id % 7 = 0"),
      "doc_id", "text", n = 5))
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should include("partial_count") // per-doc rollup combines map-side
  }

  test("unigram-NLL broadcasts the vocab-sized counts; token rows never sort-merge") {
    val p = plan(operators.CorpusStats.unigramNll(
      sources.Tables.documents(spark, dir), "doc_id", "text"))
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("top-ngrams plans a TakeOrdered cut, never a full global sort") {
    val p = plan(operators.CorpusStats.topNgrams(
      sources.Tables.documents(spark, dir), "text", n = 2, k = 20))
    p should include("TakeOrderedAndProject")
    p should include("partial_count")
  }

  test("tfidf broadcasts the 1-row corpus totals instead of shuffling term rows against them") {
    val p = plan(operators.CorpusStats.tfidfBm25(
      sources.Tables.documents(spark, dir), "doc_id", "text"))
    p should include("BroadcastNestedLoopJoin") // 1-row totals × term rows
    p should include("partial_count")
  }

  test("bigram NLL: model joins on the bigram key, head/unigram tables broadcast") {
    val p = plan(operators.CorpusStats.bigramNll(
      sources.Tables.documents(spark, dir), "doc_id", "text"))
    // the bigram model (the table that outgrows a broadcast at corpus
    // scale) must NOT be forced broadcast: its join keys on `bg`, which
    // both sides already hash on — shuffle join is the 100 TB shape
    p should include("BroadcastHashJoin")    // hist + unigram sides
    p should include("partial_count")        // map-side combine on counts
    // token rows collapse to per-doc distinct bigrams BEFORE any join
    p.indexOf("HashAggregate") should be >= 0
  }

  test("global line dedup: the window exchange carries (id,pos,hash), never line text") {
    val p = plan(operators.CorpusStats.dedupLinesGlobal(
      sources.Tables.documents(spark, dir), "doc_id", "text"))
    // the md5 projection must sit under the window's hashpartitioning —
    // the exchange ships the 32-char digest, not document lines
    p should include("hashpartitioning(__h")
    p should not include "hashpartitioning(__line"
  }

  test("span dedup: exchanges carry span fingerprints and positions, never text") {
    val p = plan(operators.SpanDedup.duplicatedSpanStats(
      sources.Tables.documents(spark, dir), "doc_id", "text", k = 8))
    // the dup-site aggregation and the join both hash on the md5 span
    // fingerprint; the raw text column must not survive past the scan's
    // posexplode projection into any exchange
    p should include("hashpartitioning(span_md5")
    p should not include "hashpartitioning(text"
    // the scan stage projects text once for the kernel, but no Exchange
    // row carries it: every hashpartitioning is on span_md5 or doc_id
    val parts = "hashpartitioning\\(([a-zA-Z_0-9#]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    parts.forall(c => c.startsWith("span_md5") || c.startsWith("doc_id")) shouldBe true
  }

  test("big-batch MERGE into a bucketed snapshot reads the snapshot bucket-local") {
    // the ladder family's exact plan: bucketed snapshot + pinned
    // non-broadcast regime → sort-merge stages where the snapshot side is
    // a bucketed scan (no exchange feeds it; only the changelog and the
    // orphan reconciliation shuffle). At sf0.001 the tiny changelog would
    // auto-broadcast and hide the regime, so SMJ is forced the same way
    // a 100 TB plan would arrive at it naturally.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(queries.CdcQueries.cdcMergeBig(spark, dir))
      p should include("SortMergeJoin")
      p should include("Bucketed: true")
      // the snapshot's own key attribute must never be re-hashed by an
      // exchange: its partitioning comes from the bucketed layout (stage
      // 1) and flows through the stage-1 join output (stage 2). The
      // shuffles that DO exist hash changelog-derived keys (l_orderkey /
      // __kb_* / __ka_*), which a bare-`o_orderkey#N` pattern excludes.
      val snapshotRehash = "Exchange hashpartitioning\\(o_orderkey#".r
      snapshotRehash.findFirstIn(p) shouldBe None
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
