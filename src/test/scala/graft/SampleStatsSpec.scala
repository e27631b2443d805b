package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the per-query sample statistics the bench HEADLINE record depends
  * on (Bench.scala SampleStats): min-of-successful headlines, crash-wall
  * budget pricing, the pass-1 reserve prior, and the cache-fill spread
  * sidecar — each with the failure mode from the round-18 driver day that
  * motivated it. */
class SampleStatsSpec extends AnyFunSuite with Matchers {

  // (wallSec, cpuSec, shufReadBytes, shufWriteBytes, ok, failedTasks)
  private def s(wall: Double, ok: Boolean = true, rd: Long = 100L)
      : SampleStats.Sample = (wall, wall, rd, rd, ok, 0L)

  test("headline is the min successful wall, not the stall-dominated mean") {
    // the r18 driver day verbatim: q_rollup reported 73.87 s as the mean
    // of [2.90, 144.85] at identical shuffle bytes and zero failed tasks
    // — a phantom 50x regression (HEAD committed value was 1.47 s)
    SampleStats.headlineSec(Seq(s(2.90), s(144.85))) shouldBe 2.90
    // order-independent: the stall can land on either pass
    SampleStats.headlineSec(Seq(s(144.85), s(2.90))) shouldBe 2.90
  }

  test("a failed run's bogus-fast wall can never become the headline") {
    // a query that crashes in 0.05 s then succeeds in 3.2 s costs 3.2 s
    SampleStats.headlineSec(Seq(s(0.05, ok = false), s(3.2))) shouldBe 3.2
  }

  test("an all-failed query headlines the -1 sentinel and stays out of the total") {
    SampleStats.headlineSec(Seq(s(0.05, ok = false), s(0.04, ok = false))) shouldBe -1.0
    SampleStats.headlineSec(Nil) shouldBe -1.0
    // total = sum of non-sentinel headlines: the crashed query contributes
    // its absence (it is already loud in `errors`), never a negative
    SampleStats.totalSec(Seq(
      Seq(s(2.90), s(144.85)),
      Seq(s(0.05, ok = false)),
      Seq(s(1.10)))) shouldBe (2.90 + 1.10) +- 1e-9
  }

  test("maxWall prices a retry at the worst SUCCESSFUL wall") {
    // the budget gate asks what re-running costs; a crash sample's wall
    // must not inflate (or deflate) the price when successes exist
    SampleStats.maxWall(Seq(s(5.0), s(0.1, ok = false), s(7.5))) shouldBe 7.5
  }

  test("maxWall prices a never-successful query at its worst crash wall") {
    // retrying a slow crasher costs its time-to-crash, not the 1 s
    // default the pre-r19 gate assumed (ADVICE r18 #1)
    SampleStats.maxWall(Seq(s(0.2, ok = false), s(34.0, ok = false))) shouldBe 34.0
    SampleStats.maxWall(Nil) shouldBe 1.0
  }

  test("w1 is the first SUCCESSFUL wall: a fast pass-1 crash cannot underprice the reserve") {
    // the reserve priors are multiples of w1; a 0.01 s crash wall would
    // underprice exactly the work the reservation policy must bound
    SampleStats.w1(Seq(s(0.01, ok = false), s(3.2), s(2.8))) shouldBe 3.2
    SampleStats.w1(Seq(s(0.01, ok = false))) shouldBe 2.0 // prior default
    SampleStats.w1(Nil) shouldBe 2.0
  }

  test("attributable drops mid-flight deaths from the metric samples") {
    // a crashed pass leaves PARTIAL wall/cpu/byte deltas: per-query
    // dispersion and the cpu/byte medians must come from successful
    // samples only, or a 2-of-5-crash query reports a byte median that
    // is not any plan's signature
    val ok1 = s(2.0, rd = 500L); val ok2 = s(2.2, rd = 500L)
    val dead = s(0.3, ok = false, rd = 123L)
    SampleStats.attributable(Seq(ok1, dead, ok2)) shouldBe Seq(ok1, ok2)
    // all-failed: fall back to the raw samples so the query still
    // reports its observed crash walls instead of an empty row
    SampleStats.attributable(Seq(dead)) shouldBe Seq(dead)
    SampleStats.attributable(Nil) shouldBe Nil
  }

  test("readSpread reports [min,max] only when successful byte samples differ") {
    // the cache-fill attribution sidecar (BPE's trained-merges map,
    // decontam's retained ngram set): first execution reads more bytes
    SampleStats.readSpread(Seq(s(1.0, rd = 860274L), s(1.0, rd = 65381L))) shouldBe
      Some((65381L, 860274L))
    // constant bytes = a deterministic plan: no sidecar entry
    SampleStats.readSpread(Seq(s(1.0, rd = 500L), s(2.0, rd = 500L))) shouldBe None
  }

  test("a mid-flight death's partial byte delta cannot fabricate a spread entry") {
    // a query that dies halfway leaves a partial byte count that differs
    // from the successful runs — the sidecar's documentation says a
    // spread entry means cache-fill, so failed samples must not create one
    SampleStats.readSpread(Seq(s(1.0, rd = 500L), s(0.3, ok = false, rd = 123L),
      s(1.1, rd = 500L))) shouldBe None
    SampleStats.readSpread(Seq(s(0.3, ok = false, rd = 123L))) shouldBe None
  }

  test("a ladder side headlines its min successful wall and records only successful walls") {
    // the r20 dispersion sidecar: the min is the headline (metrics ride
    // with it), the walls array keeps the successful spread for weather
    // attribution, and a crashed attempt's bogus-fast 0.1 s wall appears
    // in neither
    val side = SampleStats.ladderSide(Seq(
      s(9.5), s(0.1, ok = false), s(7.6, rd = 887L), s(10.4)))
    side shouldBe Some((7.6, 7.6, 887L, 887L, Seq(9.5, 7.6, 10.4)))
  }

  test("an all-failed ladder side is None, never a fabricated timing") {
    // the family must report failed:true — selecting among crash walls
    // would print a ratio for a plan that never completed
    SampleStats.ladderSide(Seq(s(0.1, ok = false), s(0.2, ok = false))) shouldBe None
    SampleStats.ladderSide(Nil) shouldBe None
  }
}
