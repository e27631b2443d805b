package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}
import graft.sources.Tables

/** Analytics / operator-coverage queries (SURVEY.md §2.2) over the TPC-H-ish
  * testdata tables.
  *
  * Cross-engine determinism rules (the driver hash-compares against DuckDB):
  *   - money/quantity aggregates go through `decimal` so the arithmetic is
  *     exact and engine-order-independent, then cast to double for output;
  *   - every query ends with a total order on a unique key set;
  *   - every computed column is aliased identically here and in the oracle
  *     SQL (graft.SparkEntry.oracleSql).
  *
  * Scale notes: all scans are column-pruned + filter-pushed parquet; dims
  * (nation/region/customer at dim-scale) are broadcast explicitly; windows
  * partition by high-cardinality keys (custkey/user_id) so no single
  * partition explodes at 100 TB.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** §2.2 #17 — scan+filter+hash agg+sort (TPC-H Q1 flavor). */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    // hash-keyed feedCluster AFTER the pushed-down filter: the
    // single-file local scan otherwise runs the whole decimal partial
    // aggregate on one task (measured 0.65 serial CPU-s at sf0.1); the
    // hash guard (high-cardinality price column) avoids round-robin's
    // serial sort-before-repartition; at real scale the scan has enough
    // splits and the guard is a no-op
    graft.operators.Skew.feedClusterBy(
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")),
      col("l_extendedprice"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** §2.2 #18 — 3-way join + agg + deterministic top-k (TPC-H Q3 flavor). */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li   = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** §2.2 #19 — multi-join with broadcast dims (TPC-H Q5 flavor). */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val dims = broadcast(
      Tables.nation(s, dir).join(
        broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(
        col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
        col("o_orderdate") <  lit("1996-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(dims, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** §2.2 #20 — selective filter + narrow projection; the plan must show
    * PushedFilters on l_partkey and a 3-column ReadSchema. */
  def qFilterPushdown(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 1000 === 7 && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** §2.2 #21 — running sum per customer over order history. */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** §2.2 #22 — rank per group + top-n. */
  def qRankTopn(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** §2.2 #23 — distinct counts (map-side partial aggregation). */
  def qDistinctAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** §2.2 #24 — left-semi join (EXISTS): customers with a high-value order. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
    Tables.customer(s, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** §2.2 #25 — left-anti join (NOT EXISTS): customers with no orders. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  /** §2.2 #26 — rollup over two grouping columns. */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    // grouping sets expand the scan rows (#sets)× INSIDE the scan stage:
    // hash-keyed feedCluster so the single-file local scan doesn't run
    // the whole expanded partial aggregate serially (and doesn't pay
    // round-robin's serial pre-sort); ~300 distinct key combos spread 32
    // partitions evenly. No-op at real scan widths.
    graft.operators.Skew.feedClusterBy(
      Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity")),
      col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** §2.2 #26b — full cube over the same grouping columns: every grouping
    * set (both, each alone, grand total) in one pass — Spark expands the
    * sets map-side, so it's still a single shuffle. */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    // same Expand-feeds-serial-scan consideration as [[qRollup]]
    graft.operators.Skew.feedClusterBy(
      Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity")),
      col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** §2.2 #28b — time-series gap filling + forward fill (resample): build
    * each user's full day grid with `sequence`/`explode` (partition-local
    * fan-out, no shuffle beyond the daily aggregation), left-join the
    * observed daily totals, and carry the last observation forward with an
    * ignore-nulls window. The grid is |users| × days — generated, never
    * materialized driver-side — and every window partitions by user_id, so
    * the pattern holds at any user count. */
  def qGapfill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && col("user_id") < 50)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(dec(col("value"))).as("dv"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("user_id"),
        explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    grid.join(daily, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day"), col("dv").isNull.as("was_gap"),
        last(col("dv"), ignoreNulls = true)
          .over(Window.partitionBy(col("user_id")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("filled_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** §2.2 #27 — pivot as conditional aggregation over the events stream. */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    def cnt(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"),
        sum(when(col("event_type") === "purchase", dec(col("value"))))
          .cast("double").as("purchase_value"))
      .orderBy(col("user_id"))
  }

  /** §2.2 #28 — gap-based sessionization (30-min gap) via lag + running sum.
    * Same shape Structured Streaming's session windows produce; expressed
    * relationally so it is oracle-checkable. */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** §2.2 #28c — sequential conversion funnel (view → click → purchase,
    * strictly ordered by time): per-user stage reached plus the step
    * timestamps. Each step is a filtered aggregate joined on `user_id` —
    * every join co-keyed on the same column the aggregates hash on, no
    * window over the full event stream, no self-join explosion. All
    * time comparisons run in the MICROSECOND domain on both engines
    * (the parquet carries nanos; comparing raw nanos against Spark's
    * micros-truncated timestamps would disagree on sub-µs gaps). */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1_us"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(col("us") > col("t1_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2_us"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(col("us") > col("t2_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3_us"))
    ev.select(col("user_id")).distinct()
      .join(s1, Seq("user_id"), "left").join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3_us").isNotNull, 3).when(col("t2_us").isNotNull, 2)
          .when(col("t1_us").isNotNull, 1).otherwise(0).as("stage"),
        col("t1_us"), col("t2_us"), col("t3_us"))
      .orderBy(col("user_id"))
  }

  /** §2.2 #28d — cohort retention: users grouped by signup day, retained
    * = any activity exactly 1 day later (D1) / within days 1-7 (D7).
    * Activity dedups to (user, day) BEFORE the cohort join — the join
    * input is bounded by users×days, not raw events — and every join is
    * co-keyed on `user_id`. UTC day boundaries on both engines. */
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val activity = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    cohort.join(activity, Seq("user_id"))
      .withColumn("dd", datediff(col("day"), col("cohort_day")))
      .groupBy(col("cohort_day"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count_distinct(when(col("dd") === 1, col("user_id"))).as("d1_retained"),
        count_distinct(when(col("dd").between(1, 7), col("user_id"))).as("d7_retained"))
      .orderBy(col("cohort_day"))
  }

  /** §2.2 #29 — exact percentiles per group (interpolating, rounded for
    * cross-engine float stability). */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    // measured, left alone: feedCluster-ing the serial local scan moved
    // the raw value column through an extra exchange for no wall win
    // (1.00 -> 1.10 s at sf0.1) — the percentile partial buffers dominate
    // either way
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 3).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 3).as("p90"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderpriority"))
  }

  /** §2.2 #31 — correlated aggregate subquery re-expressed as a join
    * (TPC-H Q17 flavor: lineitems below 20% of their part's average
    * quantity). The threshold compare is cross-multiplied
    * (5·n·qty < sum) so no division touches the predicate — exact decimal
    * arithmetic on both engines, no float boundary. */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    // feedClusterBy(l_partkey) on BOTH branches: the single-file local
    // scan otherwise runs the per-part decimal partial aggregate AND the
    // probe-side decimal work serially on one task each (1.33 s ≈ cpu at
    // sf0.1); the HASH guard avoids round-robin's serial
    // sort-before-repartition and keys the spread on the column both the
    // aggregate and the join consume. At real scan widths both guards
    // are no-ops and the plan is the r20 scale shape: partial-agg
    // exchange under perPart + the planner's join. (A single shared
    // unconditional repartition was tried and REVERTED: per-branch
    // column pruning makes the two subtrees differ — 2-col vs 3-col — so
    // AQE cannot reuse the exchange and the fact table shuffles
    // row-level TWICE at any scale, the wrong 100 TB shape.)
    val perPart = graft.operators.Skew.feedClusterBy(
      Tables.lineitem(s, dir).select(col("l_partkey"), col("l_quantity")),
      col("l_partkey"))
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
    graft.operators.Skew.feedClusterBy(
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice")),
      col("l_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(dec(col("l_quantity")) * 5 * col("n") < col("sum_qty"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("total_price"),
        count(lit(1)).as("n_rows"))
  }

  /** §2.2 #32 — full outer join: per-nation customer vs supplier counts. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(p, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).cast("int").as("nationkey"),
        coalesce(col("n_cust"), lit(0)).as("n_cust"),
        coalesce(col("n_supp"), lit(0)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** §2.2 #30 — union of two sources + dedup. */
  def qUnionDedup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nationkey"))
    val p = Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nationkey"))
    c.union(p).distinct().orderBy(col("nationkey"))
  }

  /** §2.2 #33 — string function surface: LIKE/regexp filters, case,
    * substring, padding, concatenation. */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir)
      .filter(col("p_type").like("%BRASS%") || col("p_name").rlike("^[aeiou]"))
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey"))
  }

  /** §2.2 #34 — date/time function surface: extract, truncation, day
    * difference, month arithmetic. */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1998-12-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_cutoff"),
        add_months(col("o_orderdate").cast("date"), 3).cast("timestamp").as("plus3m"))
      .orderBy(col("o_orderkey"))
  }

  /** Oracle SQL (DuckDB) for each query above — column names and ordering
    * must match the Spark output exactly. */
  val oracle: Map[String, String] = Map(
    "q_transitions" ->
      """WITH steps AS (
        |  SELECT user_id, event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS from_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM steps
        |  WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  n::DOUBLE / sum(n) OVER (PARTITION BY from_type) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    // 2^(-age/halflife) rounded to 9 places then decimal-multiplied by
    // the lossless 2-decimal value: the sum is order-independent and any
    // libm ulp wobble dies in the rounding (bigram-NLL regime)
    "q_decay_agg" ->
      """WITH m AS (SELECT max(epoch_us(ts)) AS tmax FROM events)
        |SELECT event_type, count(*)::BIGINT AS n,
        |  round(CAST(sum(
        |    round(pow(2.0, -(m.tmax - epoch_us(ts))::DOUBLE / 604800000000.0), 9)
        |      ::DECIMAL(18,9) * value::DECIMAL(18,2)) AS DOUBLE), 4)
        |    AS decayed_sum
        |FROM events, m
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // exact-decimal moments (2-decimal values cast losslessly), identical
    // double expression order on both sides, 3-sigma outlier count
    "q_anomaly" ->
      """WITH st AS (
        |  SELECT event_type, count(*)::BIGINT AS n,
        |    sum(value::DECIMAL(18,2)) AS s,
        |    sum(value::DECIMAL(18,2) * value::DECIMAL(18,2)) AS ss
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT event_type, n, s::DOUBLE / n AS mean,
        |    sqrt((ss::DOUBLE - n * (s::DOUBLE / n) * (s::DOUBLE / n))
        |      / nullif(n - 1, 0)) AS std
        |  FROM st)
        |SELECT e.event_type, m.n, round(m.mean, 4) AS mean_r,
        |  round(m.std, 4) AS std_r,
        |  sum(CASE WHEN abs(e.value - m.mean) > 3 * m.std THEN 1 ELSE 0 END)::BIGINT
        |    AS n_outliers
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type, m.n, m.mean, m.std
        |ORDER BY e.event_type""".stripMargin,
    // every power iteration replayed: decimal-summed contributions (order-
    // independent), teleport/damping as separate literals (1-0.85 != 0.15
    // in IEEE), MATERIALIZED to stop DuckDB re-inlining the chain
    "q_pagerank" -> {
      // replays Graph.pageRank's scaled-long contributions: rank is
      // 12-dp rounded, so round(rank*1e12) is its exact BIGINT image;
      // `//` is DuckDB's integral division (= Spark's `div` on
      // non-negatives); the long sum is exact, cast DOUBLE before the
      // 1e12 descale (sums stay under 2^52 — exact in double)
      def iter(prev: String, out: String) =
        s"""$out AS MATERIALIZED (
           |  SELECT e.dst AS node,
           |    round(0.15::DOUBLE / nn.n + 0.85::DOUBLE *
           |      (CAST(sum(CAST(round(r.rank * 1e12) AS BIGINT) // deg.d) AS DOUBLE)
           |        / 1e12), 12)
           |      AS rank
           |  FROM e JOIN deg USING (src) JOIN $prev r ON r.node = e.src, nn
           |  GROUP BY e.dst, nn.n)""".stripMargin
      s"""WITH sp AS MATERIALIZED (
         |  SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
         |  FROM lineitem),
         |e AS MATERIALIZED (
         |  SELECT src, dst FROM sp UNION SELECT dst, src FROM sp),
         |deg AS MATERIALIZED (SELECT src, count(*) AS d FROM e GROUP BY src),
         |nn AS MATERIALIZED (
         |  SELECT count(*)::BIGINT AS n FROM (SELECT DISTINCT src FROM e)),
         |r0 AS MATERIALIZED (
         |  SELECT src AS node, round(1.0::DOUBLE / nn.n, 12) AS rank
         |  FROM (SELECT DISTINCT src FROM e), nn),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, round(rank, 6) AS rank_r FROM r3 ORDER BY node""".stripMargin
    },
    "q_fk_check" ->
      """WITH lp AS (
        |  SELECT l_orderkey FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey + 2000000000 FROM lineitem WHERE l_orderkey % 997 = 0),
        |f1 AS (
        |  SELECT 'lineitem->orders' AS fk, count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphans
        |  FROM lp LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON lp.l_orderkey = o.o_orderkey),
        |f2 AS (
        |  SELECT 'orders->customer' AS fk, count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphans
        |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o_custkey = c.c_custkey)
        |SELECT * FROM f1 UNION ALL SELECT * FROM f2 ORDER BY fk""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  min(l_extendedprice)::DECIMAL(18,2)::VARCHAR AS lo,
        |  max(l_extendedprice)::DECIMAL(18,2)::VARCHAR AS hi
        |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin,
    // smoothed proportions in DOUBLE, ln term rounded then DECIMAL —
    // the replayable-transcendental regime (cf. q_decay_agg)
    "q_drift" ->
      """WITH a AS (
        |  SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
        |    count(*) AS n_a
        |  FROM lineitem WHERE year(l_shipdate) < 1995 GROUP BY 1),
        |b AS (
        |  SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
        |    count(*) AS n_b
        |  FROM lineitem WHERE year(l_shipdate) >= 1995 GROUP BY 1),
        |g AS (
        |  SELECT coalesce(a.bucket, b.bucket) AS bucket,
        |    coalesce(n_a, 0)::BIGINT AS n_a, coalesce(n_b, 0)::BIGINT AS n_b
        |  FROM a FULL OUTER JOIN b ON a.bucket = b.bucket),
        |t AS (
        |  SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb,
        |    count(*)::BIGINT AS k FROM g),
        |p AS (
        |  SELECT bucket, n_a, n_b,
        |    (n_a + 0.5::DOUBLE) / (ta + 0.5::DOUBLE * k) AS pa,
        |    (n_b + 0.5::DOUBLE) / (tb + 0.5::DOUBLE * k) AS pb
        |  FROM g, t)
        |SELECT bucket, n_a, n_b,
        |  round((pa - pb) * ln(pa / pb), 9) AS psi_term
        |FROM p ORDER BY bucket""".stripMargin,
    // the Morton interleave rebuilt term by term in SQL bit arithmetic
    "q_zorder" -> {
      val z = (0 until 8).flatMap(i => Seq(
        s"((((l_partkey % 256) >> $i) & 1) << ${2 * i})",
        s"((((l_suppkey % 256) >> $i) & 1) << ${2 * i + 1})"))
        .mkString("(", " | ", ")")
      s"""SELECT ($z >> 10) AS z_bucket, count(*) AS n,
         |  min(l_partkey % 256) AS min_x, max(l_partkey % 256) AS max_x,
         |  min(l_suppkey % 256) AS min_y, max(l_suppkey % 256) AS max_y
         |FROM lineitem GROUP BY 1 ORDER BY z_bucket""".stripMargin
    },
    // one UNION arm per profiled column; min/max formatted exactly as the
    // operator does (doubles via DECIMAL(18,2), timestamps via DATE)
    "q_profile" -> {
      def arm(c: String, minmax: String => String) =
        s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
           |  (count(*) - count($c))::BIGINT AS n_null,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  ${minmax(s"min($c)")} AS min_s, ${minmax(s"max($c)")} AS max_s
           |FROM lineitem""".stripMargin
      val plain = (e: String) => s"$e::VARCHAR"
      val dbl = (e: String) => s"$e::DECIMAL(18,2)::VARCHAR"
      val ts = (e: String) => s"$e::DATE::VARCHAR"
      Seq(arm("l_orderkey", plain), arm("l_linenumber", plain),
        arm("l_quantity", dbl), arm("l_returnflag", plain),
        arm("l_shipdate", ts)).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    // the deterministic columns recomputed exactly; approx_ok asserted
    // true — DuckDB cannot replay Spark's HLL++, so the sketch-accuracy
    // clause is the in-engine half of the gate
    "q_profile_approx" -> {
      def arm(c: String) =
        s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
           |  (count(*) - count($c))::BIGINT AS n_null,
           |  count(DISTINCT $c)::BIGINT AS n_distinct, true AS approx_ok
           |FROM lineitem""".stripMargin
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_shipdate").map(arm).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1994-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_partkey % 1000 = 7 AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_window_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rank_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(CAST(value AS DECIMAL(18,2))) AS dv
        |  FROM events WHERE event_type = 'purchase' AND user_id < 50
        |  GROUP BY user_id, date_trunc('day', ts)),
        |bounds AS (SELECT user_id, min(day) AS mn, max(day) AS mx
        |  FROM daily GROUP BY user_id),
        |grid AS (SELECT user_id,
        |    unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        |  FROM bounds)
        |SELECT g.user_id, g.day, d.dv IS NULL AS was_gap,
        |  CAST(last_value(d.dv IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day) AS DOUBLE) AS filled_value
        |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'view') AS n_view,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'error') AS n_error,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'purchase') AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // UTC day boundaries; datediff(day, cohort) in days on both engines
    "q_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, min(date_trunc('day', ts)::DATE) AS cohort_day
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS day FROM events),
        |j AS (
        |  SELECT c.cohort_day, a.user_id, (a.day - c.cohort_day) AS dd
        |  FROM cohort c JOIN activity a USING (user_id))
        |SELECT cohort_day, count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT CASE WHEN dd = 1 THEN user_id END) AS d1_retained,
        |  count(DISTINCT CASE WHEN dd BETWEEN 1 AND 7 THEN user_id END) AS d7_retained
        |FROM j GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,
    // all comparisons in the microsecond domain (epoch_us) — the parquet
    // carries nanos, Spark's loader truncates to micros
    "q_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1_us FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2_us
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1_us
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3_us
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2_us
        |  GROUP BY e.user_id)
        |SELECT u.user_id,
        |  CASE WHEN t3_us IS NOT NULL THEN 3 WHEN t2_us IS NOT NULL THEN 2
        |       WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END AS stage,
        |  t1_us, t2_us, t3_us
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, event_id,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 3) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 3) AS p90,
        |  count(*) AS n_rows
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q17_small_quantity" ->
      """WITH per_part AS (
        |  SELECT l_partkey AS pk,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    count(*) AS n
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  count(*) AS n_rows
        |FROM lineitem JOIN per_part ON l_partkey = pk
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n < sum_qty""".stripMargin,
    "q_full_outer" ->
      """SELECT CAST(coalesce(c.ck, p.sk) AS INT) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust,
        |  coalesce(p.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1) p
        |ON c.ck = p.sk
        |ORDER BY nationkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substr(p_name, 1, 8) AS name8,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  length(p_name) AS name_len
        |FROM part
        |WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^[aeiou]')
        |ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS days_to_cutoff,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m
        |FROM orders WHERE o_orderkey % 7 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_union_dedup" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q_asof_join" ->
      """SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us,
        |  coalesce(r.event_id, -1) AS purchase_event,
        |  coalesce(r.value, -1.0) AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.user_id, l.event_id""".stripMargin,
    "q_range_join" ->
      """WITH bands AS (
        |  SELECT CAST(i AS INT) AS band_id,
        |    i * 20000.0 * 0.9 AS lo,
        |    (i + 1) * 20000.0 * 1.1 AS hi
        |  FROM range(0, 25) t(i))
        |SELECT band_id, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_approx_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_exact,
        |  true AS approx_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_explode_agg" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(p_name), ' ')) AS word FROM part)
        |GROUP BY word ORDER BY word""".stripMargin,
    "q6_sql_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  lead(o_orderkey, 1, -1) OVER w AS next_order,
        |  first_value(o_orderkey) OVER w AS first_order
        |FROM orders WHERE o_custkey % 17 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_set_ops" ->
      """WITH cust AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer),
        |supp AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        |SELECT nationkey, 'both' AS src FROM (SELECT nationkey FROM cust INTERSECT SELECT nationkey FROM supp)
        |UNION ALL
        |SELECT nationkey, 'cust_only' FROM (SELECT nationkey FROM cust EXCEPT SELECT nationkey FROM supp)
        |UNION ALL
        |SELECT nationkey, 'supp_only' FROM (SELECT nationkey FROM supp EXCEPT SELECT nationkey FROM cust)
        |ORDER BY src, nationkey""".stripMargin,
  )

  /** §2.2 #30f — as-of (point-in-time) join: each click event picks up the
    * user's most recent purchase at or before it. Union + keyed running
    * window — one shuffle, no range explosion (operators.AsofJoin); the
    * oracle is DuckDB's native ASOF LEFT JOIN. NULL-free output (misses
    * coalesced to -1) keeps the cross-engine hash stable. */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event"), col("value").as("purchase_value"))
    AsofJoin(clicks, purchases, Seq("user_id"), "ts",
        Seq("purchase_event", "purchase_value"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        coalesce(col("purchase_event"), lit(-1L)).as("purchase_event"),
        coalesce(col("purchase_value"), lit(-1.0)).as("purchase_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** §2.2 #30g — range (interval) join: orders priced into overlapping
    * price bands via bucketed equi-join (operators.RangeJoin), then a
    * per-band rollup. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0, 25).select(col("id").cast("int").as("band_id"),
      (col("id") * 20000.0 * 0.9).as("lo"),
      ((col("id") + 1) * 20000.0 * 1.1).as("hi"))
    val orders = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
    RangeJoin.pointInInterval(orders, bands, "o_totalprice", "lo", "hi",
        bucketWidth = 20000.0)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("band_id"))
  }

  /** §2.2 #30h — sketch aggregate: HyperLogLog++ approximate distinct
    * count per group, self-checked against the exact count (the sketch is
    * deterministic for fixed data, so `approx_ok` is a stable gate; the
    * oracle asserts the exact counts and that the 5%-rsd sketch lands
    * within 10%). At 100 TB the sketch is mergeable partial state — no
    * distinct shuffle of the raw column. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count_distinct(col("o_custkey")).as("n_exact"),
        approx_count_distinct(col("o_custkey"), rsd = 0.05).as("n_approx"))
      .select(col("o_orderpriority"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact"))
          <= col("n_exact") * 0.1).as("approx_ok"))
      .orderBy(col("o_orderpriority"))
  }

  /** §2.2 #30i — lateral explode/unnest + re-aggregation: one row per
    * word of every part name, rolled back up to corpus word frequencies.
    * Generate stays adjacent to the scan (no pre-explode shuffle); the
    * aggregation shuffles words, not part rows. */
  def qExplodeAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir)
      .select(explode(split(lower(col("p_name")), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"))
  }

  /** §2.2 #30o — one-pass column profiler ([[graft.operators.Profile]]):
    * row/null/exact-distinct counts and native-typed min/max per column
    * in a single aggregate over the scan (the ingestion-time data-quality
    * summary; `exact = false` swaps the distinct counts to HLL sketches
    * at 100 TB). Doubles render through DECIMAL(18,2), timestamps
    * through DATE, so the strings are engine-stable. */
  def qProfile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(Tables.lineitem(s, dir),
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"))
      .orderBy(col("col_name"))

  /** §2.2 #30o (approx path) — the documented 100 TB drop-in GATED: the
    * HLL profile (`exact = false`, which collapses the exact-distinct
    * Expand to a plain single-projection pass) runs as its own aggregate
    * NEXT TO the exact twin and the two 5-row results join; each
    * column's row emits `approx_ok` = HLL estimate within 15% relative
    * error (3σ of HLL++'s default 5% rsd) of the exact count. Two
    * aggregates, deliberately: fusing distinct + sketch aggregates into
    * one pass drags partial HLL buffers through every distinct-spread
    * value group (measured +9 MB shuffle, 1.6× task-CPU — see the
    * [[graft.operators.Profile]] note). DuckDB recomputes rows/nulls/
    * exact-distinct and asserts `approx_ok` true, so the gate is
    * cross-engine on everything deterministic and in-engine on the
    * sketch's accuracy contract. */
  def qProfileApprox(s: SparkSession, dir: String): DataFrame = {
    val cols =
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    val li = Tables.lineitem(s, dir)
    val exact = graft.operators.Profile.profile(li, cols)
    val approx = graft.operators.Profile.profile(li, cols, exact = false)
      .select(col("col_name"), col("n_distinct").as("__nd_approx"))
    exact.join(approx, "col_name")
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"),
        (abs(col("__nd_approx") - col("n_distinct")) <=
          col("n_distinct").cast("double") * 0.15).as("approx_ok"))
      .orderBy(col("col_name"))
  }

  /** §2.2 #30p — z-order layout ([[graft.operators.Layout]]): Morton
    * codes over (partkey, suppkey) mod 256, aggregated per 1024-wide
    * z-bucket with each bucket's 2-D bounding box — the min/max tightness
    * that makes z-ordered files skippable on BOTH dimensions. The oracle
    * recomputes the bit interleave term by term. */
  def qZorder(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val x = col("l_partkey") % 256
    val y = col("l_suppkey") % 256
    Tables.lineitem(s, dir)
      .select(Layout.zValue2(x, y, 8).as("z"), x.as("x"), y.as("y"))
      .groupBy(shiftright(col("z"), 10).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("z_bucket"))
  }

  /** §2.2 #30q — referential-integrity audit: per foreign key, row and
    * orphan counts via a left join against the distinct parent keys
    * (sum-of-nulls, one pass per edge; the parent key set is
    * dim-distinct, so at 100 TB the join is broadcast or
    * shuffle-on-keys, never fact×fact). Orphans are planted
    * (`% 997`-keyed copies shifted past the key space) so the gate
    * exercises a nonzero count. */
  def qFkCheck(s: SparkSession, dir: String): DataFrame = {
    def audit(name: String, child: DataFrame, fkCol: String,
        parent: DataFrame, pkCol: String): DataFrame =
      child.select(col(fkCol))
        .join(parent.select(col(pkCol)).distinct(),
          col(fkCol) === col(pkCol), "left_outer")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(pkCol).isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_rows"), col("n_orphans"))
    val li = Tables.lineitem(s, dir)
    val liPlanted = li.select(col("l_orderkey"))
      .unionByName(li.filter(col("l_orderkey") % 997 === 0)
        .select((col("l_orderkey") + 2000000000L).as("l_orderkey")))
    audit("lineitem->orders", liPlanted, "l_orderkey",
        Tables.orders(s, dir), "o_orderkey")
      .unionByName(audit("orders->customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"))
      .orderBy(col("fk"))
  }

  /** §2.2 #30r — equi-width histogram profile of a numeric column (the
    * distribution half of [[qProfile]]): fixed-width bins, one
    * aggregate, bin bounds re-derivable from the bin id. */
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(floor(col("l_extendedprice") / 5000).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).cast("decimal(18,2)").cast("string").as("lo"),
        max(col("l_extendedprice")).cast("decimal(18,2)").cast("string").as("hi"))
      .orderBy(col("bin"))

  /** §2.2 #30t — distribution drift between corpus versions
    * ([[graft.operators.Drift.psiReport]]): PSI terms per price bin
    * between the pre-1995 and 1995+ shipment eras — the
    * "did the new drop's distribution move" alarm, with smoothed
    * proportions and the ln term under the round-then-decimal regime
    * so the oracle replays it exactly. */
  def qDrift(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    graft.operators.Drift.psiReport(
      li.filter(year(col("l_shipdate")) < 1995),
      li.filter(year(col("l_shipdate")) >= 1995),
      floor(col("l_extendedprice") / 10000).cast("long"))
      .orderBy(col("bucket"))
  }

  /** §2.2 #30s — PageRank over the symmetrized supplier↔part bipartite
    * graph ([[graft.operators.Graph.pageRank]], 3 iterations): node
    * importance by power iteration with decimal-summed (order-
    * independent) contributions — the oracle replays every iteration.
    * Node ids namespace the two key spaces (`2k` / `2k+1`). */
  /** q_pagerank's edge list, exposed so GraphSpec's no-dangling contract
    * pin exercises THIS construction (a spec that rebuilt the edges
    * locally would symmetrize by its own hand and could never fail): the
    * symmetrizing union is what guarantees dst ⊆ src for
    * [[graft.operators.Graph.pageRank]]'s src-derived node set, so a
    * change here that drops it breaks the spec instead of silently
    * dropping nodes. */
  def pagerankEdges(s: SparkSession, dir: String): DataFrame = {
    // NO distinct() here: [[graft.operators.Graph.pageRank]] dedups its
    // input after ONE hash(src) exchange (repartition-then-dropDuplicates,
    // the PlanAuditSpec-pinned fold), so a distinct here paid a whole
    // extra edge-sized exchange — read twice through the union's
    // ReusedExchange — to dedup rows the operator dedups anyway (measured
    // at sf0.1: 11.7 MB shuffle read and ~1 s wall for a 600k→591k
    // reduction the downstream dedup replays). The multiset union is
    // set-identical after that dedup, so the oracle's DISTINCT-then-UNION
    // replay is unchanged.
    val sp = Tables.lineitem(s, dir)
      .select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
    sp.unionByName(sp.select(col("dst").as("src"), col("src").as("dst")))
  }

  def qPagerank(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.pageRank(pagerankEdges(s, dir), iters = 3)
      .select(col("node"), round(col("rank"), 6).as("rank_r"))
      .orderBy(col("node"))

  /** §2.2 #28e — z-score anomaly detection over the event stream: per
    * event type, mean/σ from EXACT decimal sums (values carry 2
    * decimals, so the cast loses nothing and the moments are
    * order-independent), then count the events beyond 3σ. Two tiny
    * aggregations + a broadcast join back — the corpus never shuffles
    * on the (5-value, maximally skewed) type key. */
  def qAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
    val vdec = col("value").cast("decimal(18,2)")
    def meanE = col("s").cast("double") / col("n")
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(vdec).as("s"), sum(vdec * vdec).as("ss"))
      .select(col("event_type"), col("n"), meanE.as("mean"),
        // nullif: a singleton group has no sample variance, and /(n-1)
        // with n=1 THROWS under ANSI — NULL std flags no outliers
        sqrt((col("ss").cast("double") - col("n") * meanE * meanE) /
          nullif(col("n") - 1, lit(0L))).as("std"))
    ev.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        round(max(col("mean")), 4).as("mean_r"),
        round(max(col("std")), 4).as("std_r"),
        sum(when(abs(col("value") - col("mean")) > lit(3) * col("std"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** §2.2 #28f — behavioral transition matrix (first-order Markov view
    * of the event stream): per user, each consecutive event-type pair
    * counts one transition; probabilities are exact int/int divisions.
    * One window shuffle on user_id (the natural event partitioning),
    * then a tiny (types²) aggregation. */
  def qTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
    steps
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** §2.2 #28g — time-decay weighted aggregate (recency-weighted value
    * per event type, half-life 7 days against the stream's max
    * timestamp): weights are `2^(-age/halflife)` rounded then
    * decimal-summed, so the aggregation is order-independent and
    * SQL-replayable despite the transcendental (the bigram-NLL
    * round-then-sum regime). Timestamps compare in the micros domain —
    * the engines' common integer currency. */
  def qDecayAgg(s: SparkSession, dir: String): DataFrame = {
    val halflifeUs = 7.0 * 24 * 3600 * 1000000L
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("value"), unix_micros(col("ts")).as("__us"))
    val tmax = ev.agg(max(col("__us")).as("__tmax"))
    ev.crossJoin(broadcast(tmax))
      .select(col("event_type"),
        (round(pow(lit(2.0), -(col("__tmax") - col("__us")) / halflifeUs), 9)
          .cast("decimal(18,9)") * col("value").cast("decimal(18,2)")).as("__wv"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__wv")).cast("double"), 4).as("decayed_sum"))
      .orderBy(col("event_type"))
  }

  /** §2.2 #30j — the `spark.sql` entry path: TPC-H Q6 (forecasting
    * revenue change) run as SQL text over [[Tables.registerAll]] temp
    * views. Same Catalyst plan as the DataFrame API — scans stay pruned
    * and filter-pushed — proving the library's SQL surface end-to-end. */
  def qSqlQ6(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""")
  }

  /** §2.2 #21b — wider window-function surface: ntile buckets, lead,
    * first_value over per-customer order history. All three agree across
    * engines under a total order within each partition. */
  def qWindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_custkey") % 17 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        lead(col("o_orderkey"), 1, -1L).over(w).as("next_order"),
        first_value(col("o_orderkey")).over(w).as("first_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** §2.2 #43b — salted two-phase aggregation as a gated query: events'
    * five event_type keys are EXACTLY the celebrity-key shape (3k rows/key
    * at sf0.01 on 5 reducers); the salt spreads each key's partials
    * `factor`-wide before the final per-key fold. The oracle is the plain
    * GROUP BY — salting must be result-invariant. */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    graft.operators.Skew.saltedTwoPhase(
        Tables.events(s, dir), "event_type", saltBy = col("event_id"), factor = 8,
        partials = Seq(
          sum(dec(col("value"))).as("__psum"),
          count(lit(1)).as("__pcnt")),
        finals = Seq(
          sum(col("__psum")).cast("double").as("total_value"),
          sum(col("__pcnt")).as("n_events")))
      .orderBy(col("event_type"))
  }

  /** §2.2 #30k — set operations: INTERSECT / EXCEPT (distinct set
    * semantics) between the customer and supplier nation sets, tagged and
    * unioned into one frame. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nationkey"))
    val supp = Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nationkey"))
    val both = cust.intersect(supp).withColumn("src", lit("both"))
    val custOnly = cust.except(supp).withColumn("src", lit("cust_only"))
    val suppOnly = supp.except(cust).withColumn("src", lit("supp_only"))
    both.unionByName(custOnly).unionByName(suppOnly)
      .orderBy(col("src"), col("nationkey"))
  }

  /** queries-map fragment for SparkEntry. */
  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q_filter_pushdown" -> (qFilterPushdown _),
    "q_window_running" -> (qWindowRunning _),
    "q_rank_topn" -> (qRankTopn _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_gapfill" -> (qGapfill _),
    "q_pivot" -> (qPivot _),
    "q_sessionize" -> (qSessionize _),
    "q_funnel" -> (qFunnel _),
    "q_retention" -> (qRetention _),
    "q_percentiles" -> (qPercentiles _),
    "q_union_dedup" -> (qUnionDedup _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q_full_outer" -> (qFullOuter _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_explode_agg" -> (qExplodeAgg _),
    "q_profile" -> (qProfile _),
    "q_profile_approx" -> (qProfileApprox _),
    "q_zorder" -> (qZorder _),
    "q_fk_check" -> (qFkCheck _),
    "q_histogram" -> (qHistogram _),
    "q_pagerank" -> (qPagerank _),
    "q_drift" -> (qDrift _),
    "q_anomaly" -> (qAnomaly _),
    "q_transitions" -> (qTransitions _),
    "q_decay_agg" -> (qDecayAgg _),
    "q6_sql_revenue" -> (qSqlQ6 _),
    "q_window_funcs" -> (qWindowFuncs _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_set_ops" -> (qSetOps _),
  )
}
