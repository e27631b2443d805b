package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the values of the
  * latest right row with `right.ts <= left.ts` on the same key (the
  * feature-store / market-data lookup primitive; DuckDB spells it
  * `ASOF JOIN`, which is the oracle used by the driver gate).
  *
  * Spark-first shape: NOT a range/theta join (which would explode or
  * broadcast-nested-loop). Both sides are unioned, shuffled ONCE on the
  * key, and a single running `last(value, ignoreNulls)` window carries the
  * most recent right-side values forward into each left row — O(n log n)
  * per key partition, no candidate blow-up, scales to any key cardinality.
  * Left-join semantics: a left row with no prior right row gets NULLs.
  *
  * Requirements: the right side must be unique per (keys, ts) — pre-aggregate
  * if not (ambiguous ties have no deterministic winner in any engine). All
  * value columns come from the SINGLE matched right row (carried as one
  * struct through the running `last`): a NULL value on the matched row
  * stays NULL rather than falling back to an older row — matched-row
  * semantics, exactly DuckDB's `ASOF JOIN`.
  */
object AsofJoin {

  /** @param left       probe side; keeps ALL its columns
    * @param right      build side; contributes `valueCols`
    * @param keys       equi-join key columns (present on both sides)
    * @param tsCol      ordering column name (present on both sides)
    * @param valueCols  right-side columns carried onto each left row
    * @param tolerance  optional max `left.ts - right.ts` (same units as a
    *                   numeric tsCol, or an interval-compatible expression
    *                   for timestamps): matches older than this yield NULL */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      valueCols: Seq[String], tolerance: Option[Column] = None): DataFrame = {
    val clash = valueCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right value columns collide with left: $clash")
    val leftOther = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)

    val rightProj = right.select(
      (keys :+ tsCol).map(col) ++
        valueCols.map(col) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side"): _*)
    val leftProj = left.select(
      (keys :+ tsCol).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftOther.map(col) :+
        lit(1).as("__side"): _*)

    // right rows sort BEFORE left rows at equal ts → `>=` match semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ONE running last over a struct of the whole right row: every value
    // column (and the tolerance timestamp) is projected from the same
    // matched row — per-column last(ignoreNulls) would let an older row's
    // value leak in wherever the matched row is NULL
    val matched = last(
      when(col("__side") === 0, struct((tsCol +: valueCols).map(col): _*)),
      ignoreNulls = true).over(w)
    val withinTol: Column = tolerance match {
      case None      => lit(true)
      case Some(tol) => col(tsCol) - col("__match").getField(tsCol) <= tol
    }
    rightProj.unionByName(leftProj)
      .withColumn("__match", matched)
      .filter(col("__side") === 1)
      .select(
        (keys :+ tsCol).map(col) ++
          leftOther.map(col) ++
          valueCols.map(c =>
            when(withinTol, col("__match").getField(c))
              .otherwise(lit(null).cast(right.schema(c).dataType)).as(c)): _*)
  }
}
