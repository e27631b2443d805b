package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.cdc.{PgTypes, RelColumn, Relation}

class PgCsvSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rel = Relation("public", "t", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("name", PgTypes.TextOid),
    RelColumn("bal", PgTypes.Float8Oid)))

  private def write(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pgcsv")
    java.nio.file.Files.write(dir.resolve("part.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("COPY csv defaults: doubled quotes, empty-unquoted NULL") {
    // PG: COPY (FORMAT csv) — `""` inside quotes is a literal quote;
    // unquoted empty = NULL. Quoted empty ('' in PG) also lands NULL:
    // Spark's CSV reader can't tell the two apart (documented divergence;
    // use NULL '\N' exports to preserve '')
    val path = write(Seq(
      """1,"says ""hi"", twice",10.5""",
      """2,,20.0""",
      """3,"",30.25"""))
    val rows = PgCsv.read(spark, rel, path)
      .as[(Long, Option[String], Double)].collect().toSet
    rows shouldBe Set(
      (1L, Some("""says "hi", twice"""), 10.5),
      (2L, None, 20.0),
      (3L, None, 30.25))
  }

  test("NULL-marker exports round-trip empty strings exactly") {
    val path = write(Seq(
      """1|""|1.5""",
      """2|\N|2.5"""))
    val rows = PgCsv.read(spark, rel, path,
        options = PgCsv.CopyOptions(delimiter = "|", nullString = "\\N"))
      .as[(Long, Option[String], Double)].collect().toSet
    rows shouldBe Set((1L, Some(""), 1.5), (2L, None, 2.5))
  }

  test("COPY options: custom delimiter and NULL string") {
    // COPY ... (FORMAT csv, DELIMITER '|', NULL '\N')
    val path = write(Seq(
      """1|alpha|1.5""",
      """2|\N|2.5"""))
    val rows = PgCsv.read(spark, rel, path,
        options = PgCsv.CopyOptions(delimiter = "|", nullString = "\\N"))
      .as[(Long, Option[String], Double)].collect().toSet
    rows shouldBe Set((1L, Some("alpha"), 1.5), (2L, None, 2.5))
  }
}
