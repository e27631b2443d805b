package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (SURVEY.md §2.2 #30p): Z-ORDER
  * clustering, the lakehouse `OPTIMIZE ZORDER BY` primitive. Rows whose
  * (x, y) are close in BOTH dimensions land in the same range partition,
  * so per-file min/max statistics stay tight on BOTH columns and a scan
  * filtered on either dimension (or both) skips most files — the single
  * biggest lever for selective queries over 100 TB of parquet, where a
  * one-dimensional sort buys skipping on one column and destroys it on
  * the other.
  *
  * The z-value is the classic Morton code: the low `bits` bits of the
  * two dimensions interleaved (x in even positions, y in odd). All pure
  * codegen'd integer arithmetic — no UDF, no kernel.
  */
object Layout {

  /** Morton z-value of two non-negative int columns: interleaves the low
    * `bits` bits of each (x → even bit positions, y → odd). Values must
    * already be rank- or range-normalized into `[0, 2^bits)`; higher
    * bits are ignored. `2*bits ≤ 62` keeps the code in a long. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap(i => Seq(
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
      shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)))
    terms.reduce(_.bitwiseOR(_)) // bit positions are disjoint, OR composes
  }

  /** Re-layout `df` into `numPartitions` z-ordered range partitions,
    * sorted by z-value within each — write this frame out and every
    * partition (→ file) carries tight min/max on BOTH dimensions. The
    * range exchange samples z-values to pick balanced bounds (skew in
    * the raw columns becomes balanced output files, unlike a modulo
    * partitioning). */
  def zorderBy(df: DataFrame, x: Column, y: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue2(x, y, bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
