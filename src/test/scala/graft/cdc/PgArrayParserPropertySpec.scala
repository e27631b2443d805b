package graft.cdc

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-trip property for [[PgArrayParser]]: generate element lists,
  * format them with a MODEL of Postgres `array_out`'s documented quoting
  * rules (quote when empty, equal to NULL case-insensitively, or
  * containing delimiter/braces/quotes/backslash/whitespace; backslash-
  * escape `"` and `\` inside quotes), parse, and require the original
  * elements back. The examples in PgValuesSpec pin specific literals;
  * this pins the escaping rules under compositions they don't reach
  * (backslash-before-quote, quote-only strings, whitespace runs,
  * NULL-lookalikes). */
class PgArrayParserPropertySpec extends AnyFunSuite with Matchers {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Model of array_out (PostgreSQL docs, "Array Input and Output
    * Syntax") for the 1-D string case. */
  private def arrayOut(elems: Seq[Option[String]]): String =
    elems.map {
      case None => "NULL"
      case Some(v) =>
        val needsQuote = v.isEmpty || v.equalsIgnoreCase("null") ||
          v.exists(c => c == ',' || c == '{' || c == '}' || c == '"' ||
            c == '\\' || c.isWhitespace)
        if (needsQuote)
          "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        else v
    }.mkString("{", ",", "}")

  private val genElem: Gen[Option[String]] = Gen.frequency(
    1 -> Gen.const(None),
    1 -> Gen.const(Some("")),
    1 -> Gen.oneOf("NULL", "null", "Null").map(Some(_)),
    7 -> (for {
      n <- Gen.chooseNum(1, 10)
      cs <- Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumChar,
        Gen.oneOf(',', '"', '\\', '{', '}', ' ', '\t', '\n', 'é', '中', '✓')))
    } yield Some(cs.mkString)))

  private val genElems: Gen[Seq[Option[String]]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, genElem).map(_.toSeq))

  test("array_out → parse round-trips (400 generated arrays)") {
    samples(genElems, 400).foreach { elems =>
      val lit = arrayOut(elems)
      val parsed = PgArrayParser.parse(UTF8String.fromString(lit))
      withClue(s"literal <$lit>: ") {
        parsed should not be null
        val got = (0 until parsed.numElements()).map { i =>
          Option(parsed.getUTF8String(i)).map(_.toString)
        }
        got shouldBe elems
      }
    }
  }
}
