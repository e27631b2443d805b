package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance from a change stream
  * (SURVEY.md §2.1 #3c): instead of compacting each key to its LAST
  * state (ChangelogCompactor) or merging it into a mirror (MergeInto),
  * keep EVERY version as a row with its validity interval — the
  * warehouse-side history table that answers "what did this dimension
  * row look like when the fact row was written?".
  *
  * Semantics: each I/U change at LSN `l` opens a version valid over
  * `[l, next_change_lsn)`; a D closes the last version without opening
  * one; `valid_to` NULL marks the open (current) version. Reference
  * framing: the same per-key LSN ordering contract as the compactor
  * (mammoth sync/changelog.go compaction orders by LSN within key).
  *
  * Scale shape: ONE hash exchange on the key plus an in-partition sort
  * by LSN — the `lead` window and the version rows are computed where
  * the key's changes already live; nothing corpus-sized moves twice. At
  * 100 TB this is the same partitioning the compactor uses, so the two
  * can share one shuffle when pipelined.
  */
object Scd2 {

  /** Version history: one row per surviving I/U change with
    * `(valid_from, valid_to, is_current)` appended. `changes` must carry
    * one row per change with `keyCols`, the payload columns to keep,
    * `lsnCol` and `opCol` ('I'/'U'/'D'). `(lsnCol +: tieCols)` must
    * totally order changes within a key: UNCOMPACTED assembler output has
    * several same-key changes sharing one commit LSN (they differ by
    * `seq`), and ordering by LSN alone would make the version intervals
    * nondeterministic — pass `tieCols = Seq("seq")` there. Compacted
    * changelogs carry one change per key per LSN and need no tiebreak. */
  def history(changes: DataFrame, keyCols: Seq[String], lsnCol: String,
      opCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((lsnCol +: tieCols).map(col): _*)
    changes
      .withColumn("valid_to", lead(col(lsnCol), 1).over(w))
      .filter(col(opCol) =!= "D") // a delete closes its predecessor only
      .withColumn("valid_from", col(lsnCol))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(opCol +: lsnCol +: tieCols: _*)
  }

  /** Point-in-time (time-travel) read over a [[history]] frame: the
    * dimension state as of `lsn` — versions whose interval contains it.
    * A plain filter: partition pruning and pushdown apply when the
    * history table is stored partitioned/sorted by key. */
  def asOf(history: DataFrame, lsn: Column): DataFrame =
    history
      .filter(col("valid_from") <= lsn &&
        (col("valid_to").isNull || col("valid_to") > lsn))
      .drop("valid_to", "is_current")
}
