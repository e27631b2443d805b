package graft.tools

import org.apache.spark.sql.Encoders

/** Attributes the streaming pipeline's fixed per-batch consumer (the
  * ≈5.5-6.5k actions/s single-process ceiling both table-store regimes
  * hit — `delta_store_receipts.json`): measures the spool's raw JSON
  * parse rate and the stateless assembly rate over a recorded soak
  * spool, isolating intake from apply. If the batch-parallel parse rate
  * is far above the pipeline's end-to-end rate, the ceiling is not the
  * spool format; it is the micro-batch cadence itself (per-trigger job
  * scheduling + the stateful assembler's shuffle/state-store commit),
  * which a real deployment raises by partitioning intake across
  * executors, not by a faster single process.
  *
  * Usage: runMain graft.tools.IntakeProbe <spoolDir>
  */
object IntakeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IntakeProbe <spoolDir>")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val msgSchema = Encoders.product[graft.cdc.WalMessage].schema

    // raw parse: the whole spool in one batch-parallel read
    val t0 = System.nanoTime()
    val msgs = spark.read.schema(msgSchema).json(args(0))
    val n = msgs.count()
    val parseSec = (System.nanoTime() - t0) / 1e9

    // parse + per-transaction assembly shape (groupBy xid ≈ the stateful
    // assembler's shuffle, without the state store)
    val t1 = System.nanoTime()
    val txns = msgs.groupBy("xid").count().count()
    val asmSec = (System.nanoTime() - t1) / 1e9

    println(
      f"""{"metric":"graft_intake_probe","messages":$n%d,"parse_sec":$parseSec%.1f,""" +
      f""""parse_msgs_per_sec":${n / parseSec}%.0f,"txns":$txns%d,""" +
      f""""parse_plus_group_sec":$asmSec%.1f,"grouped_msgs_per_sec":${n / asmSec}%.0f}""")
    spark.stop()
  }
}
