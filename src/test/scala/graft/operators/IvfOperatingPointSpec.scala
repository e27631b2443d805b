package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The recall/latency measurement behind [[Ann.RecommendedIvf]] — run at
  * the largest local scale (sf0.1: 2000×64-dim embeddings) so the pinned
  * decision tracks real numbers, not folklore.
  *
  * Decision rationale (asserted below, measurements info-logged):
  *  - at 4/16 probes, 3 Lloyd iterations lift recall@5 over hash-sampled
  *    seed centroids (r2/r3 measurements: ~0.51 → ~0.61) and never hurt
  *    by more than noise;
  *  - training cost is BUILD-time only (3 distributed assign+mean
  *    passes); per-query plans are literally identical — so for the
  *    static corpora of training-data pipelines the amortized cost is
  *    zero and trained centroids are strictly better;
  *  - probe-all is exact regardless of centroids, so the correctness
  *    gate (`ann_ivf`) stays full-probe/untrained. */
class IvfOperatingPointSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  test("trained 4/16-probe IVF is the measured recommendation at sf0.1") {
    val all = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val q = all.filter(col("vec_id") < 50)
    val c = all.filter(col("vec_id") >= 50)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val cfg = Ann.RecommendedIvf
    cfg shouldBe Ann.IvfConfig(16, 4, 3) // the pinned decision

    val (exact, tExact) = timed(pairs(
      Ann.bruteForceTopK(q, c, "vec_id", "embedding", k = 5)))
    val (untrained, tUntrained) = timed(pairs(Ann.ivfTopK(
      q, c, "vec_id", "embedding", k = 5,
      nCentroids = cfg.nCentroids, nProbe = cfg.nProbe, trainIters = 0)))
    val (trained, tTrained) = timed(pairs(Ann.ivfTopK(
      q, c, "vec_id", "embedding", k = 5,
      nCentroids = cfg.nCentroids, nProbe = cfg.nProbe, trainIters = cfg.trainIters)))

    val rU = (exact & untrained).size.toDouble / exact.size
    val rT = (exact & trained).size.toDouble / exact.size
    info(f"recall@5 untrained=$rU%.3f trained=$rT%.3f " +
      f"(wall: exact=$tExact%.1fs untrained=$tUntrained%.1fs trained=$tTrained%.1fs, " +
      f"training cost is build-only and amortizes on a static corpus)")

    // the decision's load-bearing facts, floors ~0.1 under measurement to
    // absorb statistical noise without letting a regression slip through
    rT should be >= 0.5
    rT should be >= rU - 0.05 // training never hurts beyond noise
    untrained.size shouldBe exact.size // both return full top-k row counts
    trained.size shouldBe exact.size
  }
}
