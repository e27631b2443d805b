package graft.cdc

import org.apache.spark.sql.Dataset

/** A raw logical-replication message, the engine's analogue of the pglogrepl
  * message stream the reference consumes
  * (sync/stream/message_accumulator.go:42-202): BEGIN / COMMIT frame a
  * transaction; INSERT/UPDATE/DELETE carry row images; RELATION re-announces
  * schema. `(xid, seq)` orders messages within a transaction, `lsn` is only
  * meaningful on COMMIT (the commit LSN the whole transaction adopts). */
final case class WalMessage(
    xid: Long,
    seq: Int,
    msgType: String, // BEGIN | COMMIT | INSERT | UPDATE | DELETE | RELATION
    lsn: Long,
    table: String,
    keyBefore: Map[String, String],
    values: Map[String, String],
    nulls: Seq[String],
    unchanged: Seq[String],
    rekey: Boolean)

/** Transaction assembly — the reference's `Accumulator.Add` fold
  * (message_accumulator.go:42-202) re-expressed as a grouped aggregation:
  * one shuffle on `xid`, then an in-order fold of each transaction's
  * messages. Incomplete transactions (COMMIT not yet seen in this batch)
  * are dropped, exactly as the reference's accumulator only releases a
  * `WalTransaction` on its commit message; every released action carries
  * the transaction's commit LSN.
  *
  * RELATION messages are schema metadata; schema-change detection happens
  * against the cached [[Relation]] (`Relation.equalsSchema`) in the
  * streaming layer, not here. */
object ChangelogAssembler extends Serializable {

  private val dml = Set("INSERT", "UPDATE", "DELETE")

  private def opOf(msgType: String): String = msgType match {
    case "INSERT" => "I"
    case "UPDATE" => "U"
    case "DELETE" => "D"
  }

  /** One complete transaction's messages → its actions, stamped with the
    * commit LSN. Shared by the batch and stateful-streaming assemblers.
    * TRUNCATE errors the batch, exactly as the reference
    * (message_accumulator.go:197-198 "truncate message not implemented"). */
  def assembleTxn(msgs: Seq[WalMessage], commit: WalMessage): Iterator[ChangeAction] = {
    if (msgs.exists(_.msgType == "TRUNCATE"))
      throw new UnsupportedOperationException("truncate message not implemented")
    msgs.sortBy(_.seq).iterator.filter(m => dml.contains(m.msgType)).map { m =>
      ChangeAction(m.table, commit.lsn, m.seq, opOf(m.msgType),
        m.keyBefore, m.values, m.nulls, m.unchanged, m.rekey)
    }
  }

  /** Per-batch assembly. Correct only when the batch contains whole
    * transactions; a transaction whose COMMIT lies beyond the batch
    * boundary cannot be assembled here (its earlier messages are not
    * retained anywhere). `strict=true` (the default) therefore fails
    * loudly when a batch carries DML for an uncommitted xid instead of
    * silently dropping it — callers that stream must use
    * [[graft.streaming.StatefulAssembler.assembleStream]], which parks
    * open transactions in keyed state across batches (the reference's
    * accumulator holds `wta.tx` across reads the same way). `strict=false`
    * reproduces drop-and-hold-back semantics for sources known to frame
    * whole transactions per batch. */
  def assemble(msgs: Dataset[WalMessage], strict: Boolean = true): Dataset[ChangeAction] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // columnar shuffle: messages travel the xid exchange as Tungsten
    // structs inside collect_list and deserialize once per transaction
    // (same trick as ChangelogCompactor.foldGroups — an object
    // groupByKey shuffle was ~2× the cost at 100k+ txns/batch)
    msgs.toDF()
      .groupBy(col("xid"))
      .agg(collect_list(struct(col("seq"), col("msgType"), col("lsn"),
        col("table"), col("keyBefore"), col("values"), col("nulls"),
        col("unchanged"), col("rekey"))).as("msgs"))
      .as[(Long, Seq[WalMsgRow])]
      .flatMap { case (xid, rows) =>
        val ms = rows.map(r => WalMessage(xid, r.seq, r.msgType, r.lsn,
          r.table, r.keyBefore, r.values, r.nulls, r.unchanged, r.rekey))
        ms.find(_.msgType == "COMMIT") match {
          case None if ms.exists(m => dml.contains(m.msgType)) && strict =>
            throw new IllegalStateException(
              s"xid=$xid has DML but no COMMIT in this batch: a transaction " +
                "straddles the batch boundary; use StatefulAssembler.assembleStream " +
                "for cross-batch assembly (or assemble(strict=false) if the source " +
                "frames whole transactions per batch)")
          case None => Iterator.empty // incomplete txn: held back
          case Some(commit) => assembleTxn(ms, commit)
        }
      }
  }
}

/** Row mirror of the collect_list struct in `ChangelogAssembler.assemble`
  * (top-level so encoder codegen can reach it). */
final case class WalMsgRow(seq: Int, msgType: String, lsn: Long,
    table: String, keyBefore: Map[String, String], values: Map[String, String],
    nulls: Seq[String], unchanged: Seq[String], rekey: Boolean)
