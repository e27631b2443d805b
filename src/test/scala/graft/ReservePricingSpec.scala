package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the 30x-reserve pricing policy (Bench.scala ReservePricing) with
  * the scenarios the round-17 failure and the round-18 review surfaced:
  * measurement replaces prior, the prior is spike-capped, the reserve
  * releases once spent, and a replayed 3.3x-slow driver day leaves room
  * for the 30x ladder inside the default budget. */
class ReservePricingSpec extends AnyFunSuite with Matchers {

  private val q2 = Seq("cdc_compact_lineitem", "cdc_compact_fast",
    "decontam_overlap", "dedup_minhash", "cdc_merge_big")

  private def base(
      w1: Map[String, Double],
      sec10: Map[String, (Double, Double)] = Map.empty,
      passCost: Double = 133.0,
      restart: Double = 15.0,
      mat: Double = -1.0,
      pending: Boolean = true) = ReservePricing(
    budgetSec = 1380.0, scaleN = 10, scale2N = 30,
    passCostSec = passCost, refPassSec = 133.0,
    restartCostSec = restart, matCostSec = mat,
    pending = pending, sec10 = sec10,
    w1 = n => w1.getOrElse(n, 2.0), queries2 = q2)

  test("a spent or never-pending reserve is exactly zero") {
    base(Map.empty, pending = false).reserve2 shouldBe 0.0
  }

  test("the pre-measurement prior is 18x the pass-1 wall, spike-capped") {
    val p = base(Map("cdc_compact_lineitem" -> 2.0))
    p.est30Family("cdc_compact_lineitem") shouldBe 36.0 +- 1e-9
    // a 20x neighbor-spiked pass-1 wall (40 s) must not reserve 720 s:
    // the cap is a fifth of the budget
    val spiked = base(Map("cdc_compact_lineitem" -> 40.0))
    spiked.est30Family("cdc_compact_lineitem") shouldBe (0.2 * 1380.0) +- 1e-9
  }

  test("a family's own 10x measurement replaces its prior") {
    // r17 close-state numbers: compact_lineitem sf-side 0.86 s, 10x side
    // 3.19 s -> measured estimate 4*(0.86 + 3*1.1*3.19) = 45.5 s, vs the
    // actual 30x family cost 41.4 s in the committed record: a tight
    // conservative bound where the 18x prior (2 s wall -> 36 s) was a
    // shape guess
    val p = base(Map("cdc_compact_lineitem" -> 2.3),
      sec10 = Map("cdc_compact_lineitem" -> (0.8581, 3.1904)))
    p.est30Family("cdc_compact_lineitem") shouldBe
      (4 * (0.8581 + 3.0 * 1.1 * 3.1904)) +- 1e-9
    p.est30Family("cdc_compact_lineitem") should be > 41.4 // covers actual
  }

  test("30x materialization prices off the measured 10x build once known") {
    val unmeasured = base(Map.empty)
    unmeasured.mat2Est shouldBe (0.5 * 133.0) +- 1e-9
    val measured = base(Map.empty, mat = 40.0)
    measured.mat2Est shouldBe (40.0 * 3.0 * 0.75) +- 1e-9
  }

  test("a replayed 3.3x-slow driver day still fits the 30x ladder") {
    // The r17 official-record failure: pass 1 took 437 s and the 30x
    // ladder got nothing. With the r17 driver day's own pass-1 walls and
    // measured 10x sides, the fully-measured reserve must fit inside
    // what remained after pass 1 + the 10x ladder (~500-600 s of the
    // 1380 s budget) - i.e. the policy would have saved the record.
    val slowW1 = Map("cdc_compact_lineitem" -> 5.89, "cdc_compact_fast" -> 1.87,
      "decontam_overlap" -> 3.16, "dedup_minhash" -> 1.68, "cdc_merge_big" -> 8.05)
    val slowSec10 = Map(
      "cdc_compact_lineitem" -> (0.9974, 5.5215),
      "cdc_compact_fast" -> (0.675, 1.1198),
      "decontam_overlap" -> (0.4794, 0.9327),
      "dedup_minhash" -> (0.7709, 6.8176),
      "cdc_merge_big" -> (2.3213, 5.7657))
    val p = base(slowW1, sec10 = slowSec10, passCost = 437.0,
      restart = 35.0, mat = 100.0)
    val r = p.reserve2
    r should be > 300.0   // it genuinely prices the whole second ladder
    r should be < 850.0   // and fits what a 3.3x day leaves after pass 1
  }

  test("the reserve shrinks monotonically as measurements land") {
    val w1 = q2.map(_ -> 3.0).toMap
    val prior = base(w1)
    val partial = base(w1, sec10 = Map("cdc_compact_lineitem" -> (0.9, 3.2)))
    // 18*3 = 54 prior vs 4*(0.9 + 3.3*3.2) = 45.8 measured: refinement
    // must never grow a family's reserve when its measurement is in-band
    partial.reserve2 should be < prior.reserve2
  }
}
