package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph ranking (SURVEY.md §2.2 #30s): PageRank by power
  * iteration over an edge list — the canonical "importance over a
  * linked corpus" operator (host ranking for crawl prioritization,
  * citation weighting for document sampling).
  *
  * Determinism contract (the same regime as the trained classifier and
  * PCA): per-edge contributions are exact SCALED LONGS — the rank
  * (itself rounded to `scale` places, so `round(rank·10^scale)` is its
  * exact integer image) integer-divides by the out-degree, and the
  * aggregation sums longs: exact integer arithmetic, any fold order,
  * same result, and a SQL engine replays it bit-for-bit. Longs rather
  * than DECIMAL(28,18) because Spark backs decimals with compact longs
  * only up to precision 18 — the wide decimal put a BigDecimal
  * allocation + boxed arithmetic on EVERY edge contribution, and the
  * per-edge multiply-sum is the whole inner loop of the operator
  * (measured: the suite's largest single CPU sink). Each new rank is
  * rounded to `scale` places — every iteration is bit-reproducible.
  * The integer division truncates < 10^-scale per edge (the decimal
  * cast truncated the same way at 18 places); GraphSpec pins mass
  * conservation and partition-count independence.
  *
  * Scale shape: ranks are one row per node; each iteration is one join
  * (ranks ⋈ edges on src — both sides hash-partitioned on the join key,
  * reusable across iterations) plus one aggregation on dst with
  * map-side partials. Nothing edge-squared; lineage is cut every
  * [[CkptEvery]] iterations (and once at the end, so the returned frame
  * survives the cache release) rather than every iteration — each
  * iteration's rank vector is consumed exactly once by the next, so an
  * unbroken chain evaluates once in one job with no replay, and the
  * per-iteration eager checkpoint bought only a driver-blocking job plus
  * a partitioning-erasing plan cut per iteration (r22 finding below).
  */
object Graph {

  /** `iters` PageRank iterations over directed `edges(src, dst)`.
    * Assumes no dangling nodes (every node that appears has ≥1
    * out-edge) — symmetrize the edge list for undirected graphs, which
    * guarantees this. The node set is derived from the src column alone
    * (that identity is what deletes the node-prep exchanges), so for a
    * CONTRACT-VIOLATING input a dst-only node silently vanishes from
    * the output and shrinks `n` — it does not hold `teleport/n` as the
    * pre-fold shape did. GraphSpec pins the contract for the library's
    * own caller (dst ∖ src empty on the q_pagerank edge list); callers
    * with genuinely dangling sinks must symmetrize or self-loop them
    * first — or pass `assertNoDangling = true` to make the violation
    * loud instead of silent. Source-only nodes (out-edges but no in-edges —
    * ubiquitous in crawl graphs) are fine: each iteration rebuilds the
    * rank vector from the full node set, so they hold `teleport/n` and
    * keep contributing instead of dropping out after iteration 1.
    * Output: `(node, rank)` for every node, ranks rounded to `scale`
    * places each iteration.
    *
    * `teleport` is passed SEPARATELY from `damping` rather than derived
    * as `1 - damping`: `1.0 - 0.85` is not the double `0.15`, and the
    * replaying oracle writes both as literals (the bigram-NLL lambda
    * lesson).
    *
    * `assertNoDangling = true` turns a contract violation LOUD at the
    * cost of one extra dst-keyed anti-join over the (persisted) edge
    * list before iteration starts: an external caller whose graph has a
    * genuinely dangling sink gets an exception naming the violating node
    * count instead of silent node loss. Off by default — the library's
    * own caller (Analytics.pagerankEdges) satisfies the contract by
    * construction and is spec-pinned, so the per-run check would be a
    * pure tax there. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      teleport: Double = 0.15, scale: Int = 12,
      assertNoDangling: Boolean = false): DataFrame = {
    // Hash-partition the loop-invariant tables on their join keys and
    // PERSIST them (not localCheckpoint: under AQE a checkpoint's
    // LogicalRDD reports UnknownPartitioning, while a cached
    // InMemoryRelation keeps its output partitioning — plan-audited in
    // PlanAuditSpec). Every iteration's edeg⋈ranks join and the
    // nodes⋈contrib rebuild then reuse the partitioning instead of
    // re-exchanging the corpus-sized edge list: the only per-iteration
    // shuffles are rank-vector-sized plus the inherent dst contribution
    // aggregation. Released before returning — ranks is checkpointed,
    // so the result never re-reads them.
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // ONE edge-sized exchange, not two: hash(src) satisfies the (src,dst)
    // dedup's ClusteredDistribution (equal rows share src, so they share a
    // partition — Spark's subset rule), which makes dropDuplicates AFTER
    // the repartition partition-local and exchange-free. distinct-then-
    // repartition shuffled the edge list twice; at any edge scale the fold
    // halves the setup's shuffle bytes (a distinct's map-side partial
    // dedup only catches same-partition duplicates, so it shuffles ~|E|
    // regardless).
    //
    // The loop-invariant out-degree is attached IN THE SAME PASS as a
    // window count over the hash(src) partitioning: the former
    // groupBy-then-join shape materialized the deduped edges into one
    // cache, built a degree table from it, joined the two (a sort of the
    // whole edge list under sort-merge) and materialized a SECOND
    // edge-sized cache for the result — one full cache write+read cycle
    // and a join, all to attach one long the window computes in-stream on
    // the partitioning the dedup already established (measured at sf0.1:
    // setup wall ~2.4s → ~1.3s, same single exchange, same cached
    // (src, dst, __deg) rows).
    val edeg = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .withColumn("__deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist(disk)
    // ZERO node-prep exchanges: under the operator's own contract (no
    // dangling nodes — every node that appears has ≥1 out-edge) the dst
    // set is a subset of the src set, so the node set IS the distinct src
    // column. Deduping src over the hash(src) cache is partition-local
    // (subset rule, same mechanism PlanAuditSpec pins) and the aliased
    // aggregate reports hashpartitioning(node), which the cache inherits
    // for every iteration's nodes⋈contrib join. The old shape unioned
    // both endpoint columns and paid a node-keyed exchange to dedup them.
    val nodes = edeg.select(col("src").as("node"))
      .dropDuplicates("node")
      .persist(disk)
    val n = nodes.count() // materializes nodes (and edeg under it)
    if (assertNoDangling) {
      // dst-side dedup first so the anti-join probes distinct nodes, not
      // every edge; both inputs read the caches just materialized
      val dangling = edeg.select(col("dst").as("node")).dropDuplicates("node")
        .join(nodes, Seq("node"), "left_anti").count()
      require(dangling == 0L, s"pageRank contract violation: $dangling " +
        "dst node(s) have no out-edge (dangling sinks) — symmetrize the " +
        "edge list or add self-loops before ranking")
    }
    // Iteration 0's rank vector needs no checkpoint of its own: its
    // lineage IS the just-materialized nodes cache plus one literal
    // projection, so the eager checkpoint job bought nothing (iteration 1
    // cuts the lineage anyway).
    var ranks = nodes.withColumn("rank", round(lit(1.0) / n, scale))
    // 10^scale as an exact double (scale <= 15 keeps it, and every scaled
    // rank, inside the double-exact integer range)
    require(scale >= 1 && scale <= 15, s"scale must be in [1,15], got $scale")
    val factor = math.pow(10, scale)
    var i = 0
    while (i < iters) {
      // SHUFFLE_HASH on the rank side: it is the provably smaller side
      // (one row per node, nodes ⊆ edge endpoints), and a sort-merge
      // strategy would re-SORT the corpus-sized cached edge list every
      // iteration (the cache preserves hash(src) partitioning, not sort
      // order). Build side = rank rows per partition — node-partition-
      // sized, the same memory class as the iteration's own aggregation
      // state. In the UNBROKEN chain (no per-iteration checkpoint, r22)
      // the rank side arrives already hash(node)-partitioned from the
      // previous iteration's rebuild join, `node` aliases to `src`, and
      // the join consumes BOTH partitionings: zero exchanges of its own —
      // the hint then only pins the strategy against a local-only
      // broadcast conversion the 100 TB rank vector couldn't take.
      val contrib = edeg
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"),
          // rank is scale-rounded, so round(rank·10^scale) is its exact
          // long image in BOTH engines (an integral double casts exactly;
          // a bare cast would truncate in Spark but round in DuckDB);
          // `div` is integral division — pure long math per edge
          expr(s"cast(round(rank * ${factor}d) as long) div __deg").as("__c"))
      // SHUFFLE_HASH on the aggregate side of the rebuild join too (r22):
      // its groupBy exchange lands hash(node)-partitioned — the exact
      // partitioning the nodes cache already has — so the hinted join
      // needs NO exchange and NO broadcast build. AQE's local choice was
      // a per-iteration BroadcastExchange of the full contribution
      // aggregate (a driver collect + build + an extra stage per
      // iteration, measured below), which at 100 TB is a node-set-sized
      // relation no broadcast could hold anyway.
      ranks = nodes
        .join(contrib.groupBy(col("node")).agg(sum(col("__c")).as("__s"))
          .hint("shuffle_hash"),
          Seq("node"), "left")
        .select(col("node"), round(
          lit(teleport / n) +
            lit(damping) * (coalesce(col("__s"), lit(0L)).cast("double") /
              lit(factor)),
          scale).as("rank"))
      i += 1
      // Cut lineage every CkptEvery iterations, NOT every iteration (r22,
      // guide §1.2 step 1): each rank vector is consumed exactly once by
      // the next iteration, so the unbroken chain evaluates ONCE in ONE
      // job — the per-iteration eager checkpoint added a driver-blocking
      // job per iteration AND erased the rank side's partitioning (a
      // LogicalRDD reports UnknownPartitioning), forcing a rank-vector
      // re-exchange per iteration that the fused chain proves unnecessary
      // (measured at sf0.1: stages/exec 24 → 10, task-CPU 59–75 → ~25).
      // The periodic cut (LAZY — it materializes inside the next
      // consuming job) only bounds plan/lineage growth on long loops; it
      // costs one rank-sized re-exchange per CkptEvery iterations.
      if (i < iters && i % CkptEvery == 0) ranks = ranks.localCheckpoint(false)
    }
    // ONE eager checkpoint at the end: the returned frame must not depend
    // on the caches released below (an unpersisted reference would
    // re-evaluate the edge scan once per iteration when the caller runs
    // its action).
    ranks = ranks.localCheckpoint(true)
    edeg.unpersist(false); nodes.unpersist(false)
    ranks
  }

  /** Iterations between intra-loop lineage cuts. 8 keeps the fused plan
    * at most ~8 join+agg+join blocks deep (Catalyst planning stays
    * trivially cheap at that depth) while amortizing the checkpoint's
    * partitioning erasure — one rank-vector re-exchange per 8 iterations
    * instead of one per iteration. */
  private val CkptEvery = 8
}
