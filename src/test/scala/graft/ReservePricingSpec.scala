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

  // ---- the round-18 driver day (host_factor 6.31) replayed ----
  // Pass 1 cost 839 s of the 1,380 s budget; the official record shed
  // ALL 15 10x families ("budget_exhausted" with an empty ratio map) and
  // all 5 30x families because the reserve priced itself at 2,333 s
  // against ~541 s remaining — mathematically unfulfillable from the
  // moment pass 1 finished, yet it kept blocking the 10x gate. The walls
  // below are that record's own per-query values (bench_full.json at
  // host_factor 6.3087), the 10x ladder's full priority order.
  private val r18W1 = Map(
    "cdc_compact_lineitem" -> 8.7793, "cdc_compact_fast" -> 2.5569,
    "decontam_overlap" -> 7.3455, "dedup_exact" -> 0.4481,
    "cdc_compact" -> 6.6154, "cdc_merge_into" -> 6.2004,
    "cdc_merge_big" -> 9.7421, "cdc_incremental_agg" -> 5.5387,
    "dedup_minhash" -> 18.331, "dedup_simhash" -> 0.9531,
    "ann_topk" -> 1.426, "ann_ivf" -> 2.0116, "text_tfidf" -> 1.5387,
    "text_dup_spans" -> 2.0018, "q_pagerank" -> 6.2932)
  private val r18Queries10 = Seq("cdc_compact_lineitem", "cdc_compact_fast",
    "decontam_overlap", "dedup_exact", "cdc_compact", "cdc_merge_into",
    "cdc_merge_big", "cdc_incremental_agg", "dedup_minhash", "dedup_simhash",
    "ann_topk", "ann_ivf", "text_tfidf", "text_dup_spans", "q_pagerank")
  // state at 10x-ladder start under the NEW flow: nothing measured yet
  // (the materialization guard runs before the build), restart prior
  // scaled by the day's host factor
  private def r18Day(pending: Boolean) =
    base(r18W1, passCost = 839.0, restart = 15.0 * 6.31, pending = pending)

  test("r18 replay: the pending reserve is a provable deadlock") {
    val p = r18Day(pending = true)
    val elapsed = 839.0
    // the reserve cannot fit the remaining 541 s, so no 10x family can
    // ever start and no measurement can ever shrink the estimates
    p.reserve2 should be > (1380.0 - elapsed)
    r18Queries10.foreach { n =>
      withClue(n) { p.canStart10(n, elapsed) shouldBe false }
    }
    // ... and the 30x entry cost cannot fit either: unfulfillable
    p.unfulfillable(elapsed) shouldBe true
    p.unfulfillable(900.0) shouldBe true // elapsed only grows
  }

  test("r18 replay: releasing the reserve yields a nonzero 10x ladder") {
    val p = r18Day(pending = false)
    p.reserve2 shouldBe 0.0
    // the materialization guard passes post-release: the build plus the
    // head family fit the remaining budget on raw-budget gating
    val afterMat = 839.0 + p.mat10Est
    (afterMat + p.est10Family("cdc_compact_lineitem")) should be <= 1380.0
    // walk the priority order charging each ADMITTED family its full
    // estimate (pessimistic: real walls run at or under the lookahead):
    // the released policy must admit a meaningful 10x prefix where the
    // r18 record had zero
    val admitted = r18Queries10.foldLeft((afterMat, List.empty[String])) {
      case ((elapsed, acc), name) =>
        if (p.canStart10(name, elapsed))
          (elapsed + p.est10Family(name), name :: acc)
        else (elapsed, acc)
    }._2.reverse
    admitted should not be empty
    admitted.size should be >= 5
    admitted.head shouldBe "cdc_compact_lineitem" // priority head first
  }

  test("r17/r18 good-weather replays do NOT release the reserve") {
    // the 3.3x r17 driver day: pass 1 cost 437 s — the reserve must HOLD
    // there (the existing replay above shows it then fits the 30x ladder)
    val r17 = base(Map("cdc_compact_lineitem" -> 5.89), passCost = 437.0,
      restart = 35.0)
    r17.unfulfillable(437.0) shouldBe false
    // a 1.73x day (the r18 close-state validation weather): nowhere near
    val good = base(Map("cdc_compact_lineitem" -> 2.3), passCost = 230.0)
    good.unfulfillable(230.0) shouldBe false
  }

  test("the 10x lookahead is 8x the pass-1 wall, spike-capped") {
    val p = base(Map("cdc_compact_lineitem" -> 2.0, "dedup_minhash" -> 40.0))
    p.est10Family("cdc_compact_lineitem") shouldBe 16.0 +- 1e-9
    // a 20x neighbor-spiked wall must not shed every family below it
    p.est10Family("dedup_minhash") shouldBe (0.15 * 1380.0) +- 1e-9
  }

  test("a mid-ladder deadlock releases too (measured entry vs grown elapsed)") {
    // the deadlock can also ARISE mid-10x-ladder: the head family's own
    // 10x measurement fixes entry2 at its final (measured) value, and
    // elapsed keeps growing as later families run — once
    // elapsed + entry2 crosses the budget the 30x can never start and
    // the remaining 10x tail must spend what the reserve was hoarding
    val p = base(
      Map("cdc_compact_lineitem" -> 2.3),
      sec10 = Map("cdc_compact_lineitem" -> (0.86, 3.19)),
      mat = 40.0)
    // measured entry: mat2Est 40*3*0.75=90 + est30 4*(0.86+3.3*3.19)=45.5
    val entry = 90.0 + 4 * (0.86 + 3.0 * 1.1 * 3.19)
    p.entry2 shouldBe entry +- 1e-9
    p.unfulfillable(1380.0 - entry + 1.0) shouldBe true  // just past the line
    p.unfulfillable(1380.0 - entry - 1.0) shouldBe false // just inside it
  }

  test("the 10x materialization guard prices the build off the day's pass cost") {
    base(Map.empty).mat10Est shouldBe (0.3 * 133.0) +- 1e-9
    base(Map.empty, passCost = 839.0).mat10Est shouldBe (0.3 * 839.0) +- 1e-9
    // nearly-exhausted budget: the build must NOT be paid (r18 paid it
    // for zero families) — head family can no longer follow it
    val p = base(Map("cdc_compact_lineitem" -> 8.7793), passCost = 839.0,
      pending = false)
    (1330.0 + p.mat10Est + p.est10Family("cdc_compact_lineitem")) should
      be > 1380.0
  }
}
