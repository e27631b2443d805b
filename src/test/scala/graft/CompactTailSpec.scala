package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import com.fasterxml.jackson.databind.ObjectMapper

/** Pins [[CompactTail]]'s budget discipline: the compact bench line is
  * the driver's ONLY parse surface (last ~2,000 stdout chars, last line
  * parsed as JSON), so an oversized line would truncate at the FRONT of
  * the window and cost the round its entire bench parse. The tail must
  * therefore (a) never exceed its budget, (b) keep the expensive
  * families when space runs out, and (c) stay valid JSON. */
class CompactTailSpec extends AnyFunSuite with Matchers {

  private val mapper = new ObjectMapper

  private def parseLine(tail: String): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(s"""{"metric":"x"$tail}""")

  private def q(i: Int, wall: Double, cpu: Double) = (f"q_fam_$i%03d", wall, cpu)

  test("everything fits when the budget allows, in descending wall order") {
    val in = Seq(q(1, 0.5, 1.0), q(2, 2.5, 0.2), q(3, 1.0, 3.0))
    val tail = CompactTail.render(in, 10000)
    val j = parseLine(tail)
    j.get("queries_omitted").asInt shouldBe 0
    j.get("cpu_omitted").asInt shouldBe 0
    val walls = j.get("queries")
    walls.size shouldBe 3
    walls.get("q_fam_002").asDouble shouldBe 2.5
    // descending-wall ordering is observable in the raw string
    val s = tail
    s.indexOf("q_fam_002") should be < s.indexOf("q_fam_003")
    s.indexOf("q_fam_003") should be < s.indexOf("q_fam_001")
    // cpu map ordered by cpu: q3 (3.0) before q1 (1.0) before q2 (0.2)
    val cpuPart = s.substring(s.indexOf("task_cpu_sec"))
    cpuPart.indexOf("q_fam_003") should be < cpuPart.indexOf("q_fam_001")
    j.get("task_cpu_sec").get("q_fam_003").asDouble shouldBe 3.0
  }

  test("a tight budget keeps the expensive families and counts the omitted tail") {
    val in = (1 to 127).map(i => q(i, i / 10.0, i / 20.0))
    val budget = 900
    val tail = CompactTail.render(in, budget)
    tail.length should be <= budget
    val j = parseLine(tail)
    val walls = j.get("queries")
    (walls.size + j.get("queries_omitted").asInt) shouldBe 127
    walls.size should be > 20 // ~900 chars fits dozens of entries
    // the most expensive family always makes the cut; the cheapest never
    // does when anything was omitted
    walls.has("q_fam_127") shouldBe true
    if (j.get("queries_omitted").asInt > 0) walls.has("q_fam_001") shouldBe false
  }

  test("all-failed queries (headline -1) are excluded from both maps") {
    val in = Seq(q(1, 1.0, 1.0), ("q_dead", -1.0, 5.0))
    val j = parseLine(CompactTail.render(in, 10000))
    j.get("queries").has("q_dead") shouldBe false
    j.get("task_cpu_sec").has("q_dead") shouldBe false
    j.get("queries_omitted").asInt shouldBe 0
  }

  test("an unusable budget renders nothing rather than a broken fragment") {
    CompactTail.render(Seq(q(1, 1.0, 1.0)), 30) shouldBe ""
    CompactTail.render(Nil, 10000) shouldBe ""
    // walls-only when the cpu map can't fit: still valid JSON
    val in = (1 to 40).map(i => q(i, i.toDouble, i.toDouble))
    val wallsOnly = CompactTail.render(in, 120)
    wallsOnly should include(""""queries":""")
    noException should be thrownBy parseLine(wallsOnly)
  }

  test("values are fixed 2-decimal (locale-stable) numbers") {
    val tail = CompactTail.render(Seq(q(1, 1.23456, 0.999)), 10000)
    tail should include(""""q_fam_001":1.23""")
    tail should include(""""q_fam_001":1.00""")
  }
}
