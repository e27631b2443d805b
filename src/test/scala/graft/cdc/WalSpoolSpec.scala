package graft.cdc

import org.apache.spark.sql.Encoders
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The spool-format contract: [[WalSpool]]'s plain-IO JSONL must be
  * byte-compatible with the schema-driven Spark JSON reader the streaming
  * layer uses — the pump writes with no SparkSession, the merge reads
  * with one, and any divergence (escaping, null handling, field shape) is
  * silent data corruption in the hot path. Property-driven over the nasty
  * string space (quotes, backslashes, control chars, multi-byte UTF-8,
  * empties) plus a hand-picked worst-case round-trip. */
final class WalSpoolSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  /** Deterministic scalacheck sampling (scalatestplus bridge not on the
    * classpath — offline build). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def readBack(dir: String): Seq[WalMessage] =
    spark.read.schema(Encoders.product[WalMessage].schema)
      .json(dir)
      .as(Encoders.product[WalMessage])
      .collect().toSeq

  // strings the JSON layer must escape or pass through exactly
  private val nastyString: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const("plain"),
    Gen.const("\"quoted\""),
    Gen.const("back\\slash"),
    Gen.const("line1\nline2\r\ttab"),
    Gen.const("ctlchars"),
    Gen.const("unicode: grüß 中文 🦣"),
    Gen.const("{\"looks\":\"like json\"}"),
    Gen.asciiPrintableStr.map(_.take(24)))

  private val genMsg: Gen[WalMessage] = for {
    xid <- Gen.chooseNum(0L, Long.MaxValue)
    seq <- Gen.chooseNum(0, Int.MaxValue)
    typ <- Gen.oneOf("BEGIN", "COMMIT", "INSERT", "UPDATE", "DELETE")
    lsn <- Gen.chooseNum(0L, Long.MaxValue)
    tbl <- nastyString
    nk  <- Gen.chooseNum(0, 3)
    kb  <- Gen.mapOfN(nk, Gen.zip(nastyString, nastyString))
    nv  <- Gen.chooseNum(0, 3)
    vs  <- Gen.mapOfN(nv, Gen.zip(nastyString, nastyString))
    nl  <- Gen.listOfN(2, nastyString)
    un  <- Gen.listOfN(2, nastyString)
    rk  <- Gen.oneOf(true, false)
  } yield WalMessage(xid, seq, typ, lsn, tbl, kb, vs, nl, un, rk)

  test("property: plain-IO spool files round-trip through the streaming reader") {
    val msgs = samples(genMsg, 150)
    msgs.size should be >= 120 // sampling must not silently thin out
    val dir = java.nio.file.Files.createTempDirectory("walspool_prop").toString
    // several appends → several files, like several pump flushes
    msgs.grouped(37).foreach(WalSpool.append(dir, _))
    val back = readBack(dir)
    back.size shouldBe msgs.size
    // sets compare (file order is not part of the contract; WAL order is
    // carried by lsn/seq, which ARE fields)
    back.toSet shouldBe msgs.toSet
  }

  test("worst-case strings survive exactly") {
    val m = WalMessage(7, 1, "UPDATE", 42L, "we\"ird\\tbl",
      keyBefore = Map("i\nd" -> "va\"l\\ue", "k" -> null),
      values = Map("c1" -> "", "c2" -> " ok", "c3" -> "🦣\n"),
      nulls = Seq("a\tb"), unchanged = Seq("\\N"), rekey = true)
    val dir = java.nio.file.Files.createTempDirectory("walspool_worst").toString
    WalSpool.append(dir, Seq(m))
    readBack(dir) shouldBe Seq(m)
  }

  test("same-millisecond flushes get strictly increasing mtimes (read order " +
      "≡ append order ≡ LSN order)") {
    val dir = java.nio.file.Files.createTempDirectory("walspool_order").toString
    val m = WalMessage(1, 0, "COMMIT", 5, "", Map(), Map(), Nil, Nil, false)
    // burst far faster than the clock ticks — the hazard window
    (1 to 50).foreach(_ => WalSpool.append(dir, Seq(m)))
    val mtimes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("spool-"))
      .sortBy(_.getName.split('-').last.stripSuffix(".json").toLong) // append order
      .map(_.lastModified())
    mtimes.length shouldBe 50
    // STRICT: the file source breaks mtime ties arbitrarily, so any tie
    // is a potential silent drop under the merge's LSN watermark
    mtimes.sliding(2).foreach { case Array(a, b) => a should be < b }
  }

  test("empty flush writes nothing; files appear atomically (no tmp leftovers)") {
    val dir = java.nio.file.Files.createTempDirectory("walspool_empty").toString
    WalSpool.append(dir, Nil)
    WalSpool.append(dir, Seq(
      WalMessage(1, 0, "BEGIN", 5, "", Map(), Map(), Nil, Nil, rekey = false)))
    val names = new java.io.File(dir).list().toSeq
    names.count(_.startsWith("spool-")) shouldBe 1
    names.count(_.startsWith(".")) shouldBe 0
  }
}
