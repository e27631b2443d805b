package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cdc._
import graft.streaming.StreamingMerge

/** The delta store's other side of the ledger: [[ApplyProbe]] showed
  * apply flat (≈0.95 s/batch) in table size, but every READER of a
  * delta-mode table ([[DeltaStore.read]] — the GraftSync facade, Verify,
  * the full-rewrite merge's snapshot side) pays the merge-on-read fold of
  * all PENDING deltas: dedup + compact of the accumulated raw actions +
  * MERGE against the base. This probe puts a number on that tax — read
  * latency vs pending-delta count at two base sizes — plus the
  * amortized fold (compact) cost at the deepest point, which is exactly
  * the pair of numbers a capacity planner trades off when setting
  * `deltaCompactRows`/`deltaCompactFiles`: deeper delta queues buy
  * cheaper writes (the fold runs rarer) at the price of slower reads and
  * a bigger one-shot fold.
  *
  * For each base size N: publish an N-row snapshot, then for each probe
  * depth D in {0, 16, 64}: top the pending-delta queue up to D batches of
  * B update actions through the REAL delta apply path
  * ([[StreamingMerge.applyBatch]] with thresholds parked at max, so no
  * fold fires mid-probe) and time `DeltaStore.read` materialized to a
  * noop sink, median of 3. At D=64 also time `DeltaStore.compact` — the
  * fold a threshold crossing would have triggered.
  *
  * Usage: runMain graft.tools.DeltaReadProbe [sizes...]
  * (default 6400000 102400000). Prints one JSON line and writes
  * `delta_read_probe.json`.
  */
object DeltaReadProbe {

  private val rel = Relation("public", "users", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true, notNull = true),
    RelColumn("name", PgTypes.TextOid),
    RelColumn("score", PgTypes.Float8Oid)))

  private val BatchActions = 5000
  private val Depths = Seq(0, 16, 64)

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(6400000L, 102400000L)
    val spark: SparkSession = graft.GraftSession.local()
    import spark.implicits._

    def timeRead(base: String): Double = {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        DeltaStore.read(spark, base, rel)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      walls.sorted.apply(1) // median of 3
    }

    val results = sizes.map { n =>
      val base = java.nio.file.Files.createTempDirectory("graft_readprobe").toString
      System.err.println(s"[readprobe] seeding $n-row base at $base")
      val snap = spark.range(n).select(
        $"id",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("name-"), $"id").as("name"),
        ($"id" % 1000 / 10.0).as("score"))
      SnapshotWriter.publish(snap, base, "users")
      val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log",
        deltaStore = true,
        deltaCompactRows = Long.MaxValue, deltaCompactFiles = Int.MaxValue)
      val rnd = new java.util.Random(11)
      var applied = 0
      val perDepth = Depths.map { d =>
        while (applied < d) {
          val b = applied + 1
          val acts = (1 to BatchActions).map { i =>
            val id = math.abs(rnd.nextLong()) % n
            ChangeAction("users", b.toLong * 1000000 + i, 0, "U",
              Map("id" -> id.toString),
              Map("id" -> id.toString, "name" -> s"upd-$b-$i"),
              Nil, Nil, rekey = false)
          }
          sm.applyBatch(acts.toDS(), b.toLong)
          applied += 1
        }
        val w = timeRead(base)
        System.err.println(f"[readprobe] rows=$n deltas=$d read=$w%.2f s")
        (d, w)
      }
      // the one-shot fold at the deepest queue: what a threshold crossing
      // at deltaCompactFiles=64 would pay, after which reads are base-cost
      val t0 = System.nanoTime()
      DeltaStore.compact(spark, base, rel)
      val foldWall = (System.nanoTime() - t0) / 1e9
      val postFoldRead = timeRead(base)
      System.err.println(
        f"[readprobe] rows=$n fold(64)=$foldWall%.2f s post-fold read=$postFoldRead%.2f s")
      val ds = perDepth.map { case (d, w) =>
        f"""{"pending_deltas":$d%d,"read_s":$w%.2f}""" }.mkString("[", ",", "]")
      f"""{"rows":$n%d,"reads":$ds,"fold_at_64_s":$foldWall%.2f,""" +
        f""""post_fold_read_s":$postFoldRead%.2f}"""
    }
    val receipt =
      s"""{"metric":"graft_delta_read_probe","batch_actions":$BatchActions,""" +
      s""""points":${results.mkString("[", ",", "]")}}"""
    println(receipt)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("delta_read_probe.json"),
      (receipt + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
