package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.{ChangeAction, ChangelogAssembler, WalMessage}

/** Streaming transaction assembly with cross-batch state — the full
  * analogue of the reference's accumulator, which buffers every message
  * of an open transaction until its commit arrives
  * (sync/stream/message_accumulator.go: `wta.tx` lives across messages).
  *
  * The per-batch [[ChangelogAssembler]] is correct only when a source
  * delivers whole transactions within one micro-batch; here open
  * transactions park in keyed state (`flatMapGroupsWithState`), release on
  * COMMIT with the commit LSN, and evict on a processing-time timeout
  * (abandoned/rolled-back transactions never commit — the reference simply
  * never sees a commit record for them either).
  *
  * Scale shape: state is per-xid and bounded by open-transaction size;
  * the shuffle is one exchange on xid, exactly the grouping the batch
  * assembler uses. */
object StatefulAssembler {

  final case class OpenTxn(msgs: Seq[WalMessage])

  /** @param openTxnTimeout eviction for transactions that never commit
    *        (rolled back / lost). None → state held indefinitely, which
    *        keeps test harnesses quiescent; set it in production — note
    *        that with processing-time timeouts Spark schedules batches
    *        continuously to fire timers even when no data arrives. */
  def assembleStream(messages: Dataset[WalMessage],
      openTxnTimeout: Option[String] = None): Dataset[ChangeAction] = {
    val spark = messages.sparkSession
    import spark.implicits._
    val timeoutConf = if (openTxnTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    messages
      .groupByKey(_.xid)
      .flatMapGroupsWithState[OpenTxn, ChangeAction](OutputMode.Append, timeoutConf) {
        (xid: Long, incoming: Iterator[WalMessage], state: GroupState[OpenTxn]) =>
          if (openTxnTimeout.isDefined && state.hasTimedOut) {
            // abandoned transaction (rollback): drop buffered messages
            state.remove()
            Iterator.empty
          } else {
            val buffered = state.getOption.map(_.msgs).getOrElse(Seq.empty) ++ incoming
            buffered.find(_.msgType == "COMMIT") match {
              case Some(commit) =>
                state.remove()
                ChangelogAssembler.assembleTxn(buffered, commit)
              case None =>
                state.update(OpenTxn(buffered))
                openTxnTimeout.foreach(state.setTimeoutDuration)
                Iterator.empty
            }
          }
      }
  }
}
