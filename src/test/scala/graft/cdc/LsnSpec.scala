package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LsnSpec extends AnyFunSuite with Matchers {

  test("parse/format round-trip") {
    Lsn.parse("16/B374D848") shouldBe ((0x16L << 32) | 0xB374D848L)
    Lsn.format(Lsn.parse("16/B374D848")) shouldBe "16/B374D848"
    Lsn.parse("0/0") shouldBe 0L
    Lsn.parse("FFFFFFFF/FFFFFFFF") shouldBe -1L // the max LSN, all bits set
  }

  test("malformed text is rejected, including signed hex") {
    // Long.parseLong accepts signs, so "0/-1" would otherwise parse to
    // -1L — indistinguishable from the MAX LSN instead of an error
    an[IllegalArgumentException] should be thrownBy Lsn.parse("0/-1")
    an[IllegalArgumentException] should be thrownBy Lsn.parse("-1/0")
    an[IllegalArgumentException] should be thrownBy Lsn.parse("0/+1")
    an[IllegalArgumentException] should be thrownBy Lsn.parse("nope")
    an[IllegalArgumentException] should be thrownBy Lsn.parse("1/")
    an[IllegalArgumentException] should be thrownBy Lsn.parse("/1")
    an[IllegalArgumentException] should be thrownBy Lsn.parse("100000000/0")
  }
}
