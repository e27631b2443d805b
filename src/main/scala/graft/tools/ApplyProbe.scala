package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cdc._
import graft.streaming.StreamingMerge

/** Isolates the APPLY step's cost curve vs table size, full-rewrite vs
  * delta store — the term the end-to-end soak cannot see while the
  * pipeline's fixed per-batch consumer (~5-6k actions/s: JSON spool read
  * + stateful assembly + job scheduling) dominates at soak-sized tables.
  * For each table size N: publish an N-row snapshot, then drive K
  * update-only batches of B actions each through
  * [[StreamingMerge.applyBatch]] in both regimes and report the median
  * per-batch wall. The full-rewrite path reads and rewrites all N rows
  * per batch (cost ∝ N); the delta path appends B rows (cost ∝ B) — at
  * production table sizes that difference IS the apply ceiling, whatever
  * the local pipeline overhead hides.
  *
  * Usage: runMain graft.tools.ApplyProbe [sizes...] (default
  * 100000 400000 1600000 6400000)
  */
object ApplyProbe {

  private val rel = Relation("public", "users", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true, notNull = true),
    RelColumn("name", PgTypes.TextOid),
    RelColumn("score", PgTypes.Float8Oid)))

  private val BatchActions = 5000
  private val BatchesPerPoint = 5

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(100000L, 400000L, 1600000L, 6400000L)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val results = sizes.map { n =>
      val perStore = Seq(false, true).map { delta =>
        val base = java.nio.file.Files.createTempDirectory("graft_probe").toString
        // seed snapshot: N rows, co-typed with the relation
        val snap = spark.range(n).select(
          $"id",
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("name-"), $"id").as("name"),
          ($"id" % 1000 / 10.0).as("score"))
        SnapshotWriter.publish(snap, base, "users")
        val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log",
          deltaStore = delta,
          // past-threshold folds are measured separately below; keep the
          // per-batch points fold-free so they time the append alone
          deltaCompactRows = Long.MaxValue, deltaCompactFiles = Int.MaxValue)
        val rnd = new java.util.Random(7)
        val walls = (1 to BatchesPerPoint).map { b =>
          val acts = (1 to BatchActions).map { i =>
            val id = math.abs(rnd.nextLong()) % n
            ChangeAction("users", b.toLong * 1000000 + i, 0, "U",
              Map("id" -> id.toString),
              Map("id" -> id.toString, "name" -> s"upd-$b-$i"),
              Nil, Nil, rekey = false)
          }
          val t0 = System.nanoTime()
          sm.applyBatch(acts.toDS(), b.toLong)
          (System.nanoTime() - t0) / 1e9
        }
        // the delta regime's amortized term: one fold over everything
        val foldWall = if (delta) {
          val t0 = System.nanoTime()
          DeltaStore.compact(spark, base, rel)
          Some((System.nanoTime() - t0) / 1e9)
        } else None
        val med = walls.sorted.apply(walls.size / 2)
        (delta, med, foldWall)
      }
      val full = perStore.find(!_._1).get._2
      val deltaMed = perStore.find(_._1).get._2
      val fold = perStore.find(_._1).get._3.get
      println(f"""{"rows":$n%d,"full_apply_s":$full%.2f,"delta_apply_s":$deltaMed%.2f,"delta_fold_s":$fold%.2f}""")
      (n, full, deltaMed, fold)
    }
    val js = results.map { case (n, f, d, c) =>
      f"""{"rows":$n%d,"full_apply_s":$f%.2f,"delta_apply_s":$d%.2f,"delta_fold_s":$c%.2f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"graft_apply_probe","batch_actions":$BatchActions,"batches":$BatchesPerPoint,"points":$js}""")
    spark.stop()
  }
}
