package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StructField, StructType}

/** Streaming point-in-time (as-of) join with EVENT-TIME correctness — the
  * streaming counterpart of [[graft.operators.AsofJoin]].
  *
  * For each left row: the values of the latest right row with
  * `right.ts <= left.ts` on the same key, where both sides arrive out of
  * order within a watermark bound. A left row is EMITTED only once the
  * watermark passes its timestamp — no earlier-timestamped right row can
  * arrive after that — so results equal the batch as-of join on the same
  * data (verified by spec).
  *
  * State per key (flatMapGroupsWithState, EventTimeTimeout):
  *  - pending left rows with ts above the watermark, awaiting finality;
  *  - right rows above the watermark, plus ONE latest right at-or-below it
  *    (any future left has ts > watermark, so older rights can never win) —
  *    state is bounded by the disorder window, not the stream length.
  * Scale shape: one shuffle on the key; state size ∝ per-key traffic
  * within the watermark delay.
  *
  * Late-input contract (standard Structured Streaming semantics): the
  * watermark is GLOBAL — rows arriving with event time at or below it are
  * dropped by the engine before this operator. Size `watermark` to the
  * worst cross-key disorder, not per-key. */
object AsofJoinStream {

  /** Keyed state: right rows and pending left rows as (tsMs, field
    * values); kryo-serialized (must be public for the encoder). */
  final case class St(
      rights: List[(Long, Seq[Any])],
      lefts: List[(Long, Seq[Any])])

  /** Injective state-key encoding for multi-column keys. A plain
    * separator-join is forgeable — ("ab","c") vs ("a","bc"), or values
    * containing the separator — and silently cross-contaminates two keys'
    * as-of state. Length-prefixing each rendered value ("3:abc", nulls as
    * "n:") parses back unambiguously, so distinct key tuples can never
    * produce the same state group. */
  private[streaming] def stateKey(vals: Seq[Any]): String =
    vals.map {
      case null => "n:"
      case v    => val s = String.valueOf(v); s.length.toString + ":" + s
    }.mkString

  /** @param left      streaming frame: key cols + `tsCol` + payload cols
    * @param right     streaming frame: key cols + `tsCol` + `valueCols`
    * @param keys      equi-join key column names (both sides)
    * @param tsCol     event-time column (TimestampType, both sides)
    * @param valueCols right columns carried onto each left row
    * @param watermark max disorder, e.g. "10 seconds" — also bounds state
    * @param toleranceMs optional max left.ts - right.ts in millis */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String], watermark: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    val leftOther = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    require(valueCols.toSet.intersect(left.columns.toSet).isEmpty,
      "right value columns collide with left")

    val leftCols = keys ++ Seq(tsCol) ++ leftOther
    // output field order = leftCols order (keys, ts, payload), then values
    val outSchema = StructType(
      leftCols.map(c => left.schema(left.schema.fieldIndex(c))) ++
        valueCols.map(c => right.schema(c).copy(nullable = true)))

    // normalized union: (key…, ts, side, leftPayload…, rightValues…)
    val l = left.select(
      leftCols.map(col) ++ valueCols.map(c =>
        lit(null).cast(right.schema(c).dataType).as(c)) :+ lit(0).as("__side"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol)) ++ leftOther.map(c =>
        lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col) :+ lit(1).as("__side"): _*)
    val unioned = l.unionByName(r).withWatermark(tsCol, watermark)

    val schema = unioned.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsCol)
    val sideIdx = schema.fieldIndex("__side")
    val leftIdx = leftCols.map(schema.fieldIndex)
    val valueIdx = valueCols.map(schema.fieldIndex)
    val nOut = outSchema.length

    implicit val stEnc = Encoders.kryo[St]
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING

    def tsMs(row: Row): Long = row.getTimestamp(tsIdx).getTime

    unioned
      .groupByKey(row => stateKey(keyIdx.map(row.get)))
      .flatMapGroupsWithState[St, Row](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, incoming: Iterator[Row], state: GroupState[St]) =>
          val st0 = state.getOption.getOrElse(St(Nil, Nil))
          var rights = st0.rights
          var lefts = st0.lefts
          incoming.foreach { row =>
            if (row.getInt(sideIdx) == 1)
              rights ::= (tsMs(row), valueIdx.map(row.get))
            else
              lefts ::= (tsMs(row), leftIdx.map(row.get))
          }
          val wm = state.getCurrentWatermarkMs()
          rights = rights.sortBy(_._1)
          // finalize lefts at or below the watermark: their match set is
          // complete
          val (ripe, pending) = lefts.partition(_._1 <= wm)
          val out = ripe.sortBy(_._1).map { case (lts, lvals) =>
            val m = rights.reverseIterator.find { case (rts, _) =>
              rts <= lts && toleranceMs.forall(t => lts - rts <= t)
            }
            val arr = new Array[Any](nOut)
            var i = 0
            lvals.foreach { v => arr(i) = v; i += 1 }
            m match {
              case Some((_, rvals)) => rvals.foreach { v => arr(i) = v; i += 1 }
              case None             => ()
            }
            new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(arr, outSchema)
          }
          // prune rights: everything above the watermark can still win for
          // future lefts; of those at-or-below, only the LATEST can
          val (aboveWm, belowWm) = rights.partition(_._1 > wm)
          val keptRights = belowWm.lastOption.toList ++ aboveWm
          if (pending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(St(keptRights, pending))
            // wake when the watermark passes the earliest pending left, so
            // it flushes even if this key sees no more traffic
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
          }
          out.iterator
      }
  }
}
