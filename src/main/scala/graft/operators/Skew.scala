package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §5). AQE's skew-join split handles
  * most cases at runtime; explicit salting remains the tool when one key
  * dominates a shuffle so badly that even split partitions won't balance
  * (the classic null-key / celebrity-key problem), or when the engine's
  * stats can't see the skew coming. */
object Skew {

  /** Scan-starvation guard: repartition a SHUFFLE-FREE frame whose scan
    * partition count can't feed the cluster (parts×2 < cores) — the
    * single-file single-row-group parquet shape, where a downstream
    * per-row CPU stage (Expand-heavy aggregate, media decode) would
    * otherwise execute serially no matter how many cores exist. On any
    * well-partitioned input the branch never fires and the plan is
    * untouched; frames already containing a shuffle pass through
    * unprobed, because under AQE `rdd.getNumPartitions` on an
    * exchange-bearing frame finalizes the adaptive plan and MATERIALIZES
    * every upstream stage — a hidden double execution (probing is only
    * free where building the RDD plans zero jobs). */
  def feedCluster[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] =
    if (starved(ds)) ds.repartition(ds.sparkSession.sparkContext.defaultParallelism)
    else ds

  /** [[feedCluster]] with a HASH repartition on `keys` instead of
    * round-robin. Two reasons to prefer it when a natural high-cardinality
    * key exists: a keyless `repartition(n)` first SORTS each input
    * partition (`spark.sql.execution.sortBeforeRepartition`, the
    * SPARK-23207 retry-determinism sort) — on the exact starved single-
    * partition scan this guard targets, that is a serial sort of the whole
    * input before anything spreads (measured: q17's probe side 1.33 →
    * 1.90 s WORSE under round-robin) — and a downstream aggregate or join
    * keyed on `keys` can consume the hash partitioning instead of
    * exchanging again. Same guard, same no-op at real scan widths. */
  def feedClusterBy[T](ds: org.apache.spark.sql.Dataset[T],
      keys: Column*): org.apache.spark.sql.Dataset[T] =
    if (starved(ds)) ds.repartition(keys: _*) else ds

  /** True when `ds` is a shuffle-free frame whose scan partition count
    * can't feed the cluster (parts×2 < cores). */
  private def starved[T](ds: org.apache.spark.sql.Dataset[T]): Boolean = {
    // a streaming frame has no RDD to probe (micro-batch partitioning is
    // the source's concern); pass it through untouched
    if (ds.isStreaming) return false
    val cores = ds.sparkSession.sparkContext.defaultParallelism
    // "narrow" = every node is shuffle-free AND carries no subquery
    // expressions: a scalar subquery hides a whole plan inside an
    // expression, and building the outer RDD runs it (waitForSubqueries)
    // — the exact hidden execution the whitelist exists to prevent.
    val narrow = ds.queryExecution.optimizedPlan.collect { case p => p }.forall { p =>
      p.subqueries.isEmpty && (p match {
        case _: org.apache.spark.sql.catalyst.plans.logical.Project => true
        case _: org.apache.spark.sql.catalyst.plans.logical.Filter => true
        case _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => true
        case _: org.apache.spark.sql.catalyst.plans.logical.Union => true
        case _: org.apache.spark.sql.catalyst.plans.logical.Generate => true
        case _: org.apache.spark.sql.catalyst.plans.logical.DeserializeToObject => true
        case _: org.apache.spark.sql.catalyst.plans.logical.SerializeFromObject => true
        case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
        case _ => false
      })
    }
    narrow && ds.rdd.getNumPartitions * 2 < cores
  }

  /** Salted equi-join of a skewed `big` side against a `small` side:
    * `big` rows get a deterministic salt in [0, factor) derived from a
    * differentiating column (NOT the join key — same-key rows must spread),
    * and `small` is exploded `factor`× so every salted key finds its match.
    * Shuffle partitions for a hot key then fan out `factor`-wide instead of
    * landing on one reducer. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: Column, factor: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(factor)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedBig
      .join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase aggregation with an explicit salted pre-combine: groupBy
    * (key, salt) first, then re-aggregate by key. Spark's partial
    * aggregation usually makes this unnecessary for algebraic aggregates —
    * use it for high-cardinality-state aggregations (collect_set /
    * approx sketches) where a hot key's state would otherwise assemble on
    * one reducer. `partials` builds the salted pre-aggregates; `finals`
    * folds partials per key. */
  def saltedTwoPhase(df: DataFrame, key: String, saltBy: Column, factor: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
}
