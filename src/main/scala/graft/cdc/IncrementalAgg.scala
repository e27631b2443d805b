package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance from a CDC changelog — keep a
  * grouped SUM/COUNT current as batches apply, without re-aggregating
  * the snapshot.
  *
  * The reference keeps the *table* current (MERGE per batch,
  * target/snowflake/snowflake_target.go:536-602) and leaves derived
  * aggregates to full re-queries; at warehouse scale the natural
  * companion is delta maintenance: for each affected key, retract the
  * old row's contribution and add the new row's.
  *
  * Contributions come from one small joined set:
  *   - `affectedOld` = snapshot ⋈ broadcast(changelog keys) — the only
  *     touch of the snapshot: a broadcast semi-join, so the snapshot is
  *     scanned (prunable by partition/bloom at scale) but NEVER shuffled;
  *   - `merged` = [[MergeInto]] applied to `affectedOld` only — full
  *     reference semantics (TOAST-unchanged, explicit NULL, rekey,
  *     insert-vs-update) on a micro-batch-sized input.
  *
  * The aggregate update is then `old agg ∪ (−old contributions) ∪
  * (+new contributions)` re-grouped — |groups| + 2·|changelog| rows
  * through the only shuffle. Works for any algebraic aggregate
  * maintained as (sum, count); averages divide downstream.
  *
  * Sums go through decimal so retract-then-add is exact — floating-point
  * retraction would drift over many batches.
  *
  * SQL `SUM` over zero non-null values is NULL, which `current − old +
  * new` arithmetic alone cannot reproduce (retractions leave an exact
  * 0, not NULL) — so the aggregate also carries `nnName`, the count of
  * non-null values, and the sum reads NULL whenever it reaches zero.
  * Build the initial aggregate with [[initialAgg]] so the column exists.
  */
object IncrementalAgg {

  /** The maintained aggregate's initial state over a snapshot:
    * (`groupCol`, `sumName`, `cntName`, `nnName`). */
  def initialAgg(
      snapshot: DataFrame,
      groupCol: String,
      valueCol: String,
      sumName: String = "sum_v",
      cntName: String = "n_rows",
      nnName: String = "nn_v",
      sumType: String = "decimal(18,2)"): DataFrame =
    snapshot.groupBy(col(groupCol)).agg(
      sum(col(valueCol).cast(sumType)).cast(sumType).as(sumName),
      count(lit(1)).as(cntName),
      count(col(valueCol)).as(nnName))

  /** @param agg      current aggregate, shaped by [[initialAgg]] (or a
    *                  previous `maintainSum` output)
    * @param snapshot  current table state the aggregate was computed over
    *                  (BEFORE this changelog applies)
    * @param changelog compacted actions ([[ChangelogCompactor.compact]])
    * @param sumType   exact decimal type the value column sums through */
  def maintainSum(
      agg: DataFrame,
      snapshot: DataFrame,
      changelog: Dataset[ChangeAction],
      relation: Relation,
      groupCol: String,
      valueCol: String,
      sumName: String = "sum_v",
      cntName: String = "n_rows",
      nnName: String = "nn_v",
      sumType: String = "decimal(18,2)"): DataFrame = {
    val keyCols = relation.identityColumnNames
    require(keyCols.nonEmpty, s"relation ${relation.qualifiedName} has no identity columns")

    val cl = changelog.filter(col("table") === relation.table)
    // affected keys, typed like the snapshot's key columns
    val keys = cl.select(keyCols.map { k =>
      PgValues.castText(element_at(col("keyBefore"), k),
        relation.columns.find(_.name == k).get.pgOid).as(k)
    }: _*).distinct()

    // the snapshot's only involvement: rows at the affected keys
    // (micro-batch-sized), harvested without shuffling the snapshot
    // feeds both MergeInto and the retract side. LAZY checkpoint: it
    // still cuts the lineage and persists on first computation, but the
    // eager form paid a driver-blocking job barrier before the real query
    // started (measured at sf0.1: ~0.4 s of pure serialization in a
    // 1.9 s query); the two consumers read the persisted partitions
    // within the same final job.
    val affectedOld = snapshot.join(broadcast(keys), keyCols, "left_semi")
      .localCheckpoint(false)

    val merged = MergeInto(affectedOld, changelog, relation)

    def contrib(df: DataFrame, sign: Int) = df.select(
      col(groupCol).as("__g"),
      (col(valueCol).cast(sumType) * sign).as("__dv"),
      lit(sign.toLong).as("__dn"),
      when(col(valueCol).isNotNull, sign.toLong).otherwise(0L).as("__dnn"))

    val current = agg.select(col(groupCol).as("__g"),
      col(sumName).cast(sumType).as("__dv"), col(cntName).cast("long").as("__dn"),
      col(nnName).cast("long").as("__dnn"))

    current
      .unionByName(contrib(affectedOld, -1))
      .unionByName(contrib(merged, 1))
      .groupBy(col("__g"))
      .agg(sum(col("__dv")).cast(sumType).as(sumName), sum(col("__dn")).as(cntName),
        sum(col("__dnn")).as(nnName))
      .filter(col(cntName) > 0)
      // SUM over zero non-null values is NULL, not the exact 0 the
      // retractions leave behind
      .withColumn(sumName, when(col(nnName) === 0, lit(null)).otherwise(col(sumName)))
      .withColumnRenamed("__g", groupCol)
  }
}
