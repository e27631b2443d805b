package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class PgValuesSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def parse1(s: String): Seq[String] = {
    val r = Seq(Tuple1(s)).toDF("s")
      .select(PgValues.castArrayText(col("s"), PgTypes.TextOid).as("a"))
      .collect()(0)
    if (r.isNullAt(0)) null else r.getSeq[String](0)
  }

  test("array literal: plain, empty, NULLs") {
    parse1("{1,2,3}") shouldBe Seq("1", "2", "3")
    parse1("{}") shouldBe Seq.empty
    parse1("{a,NULL,c}") shouldBe Seq("a", null, "c")
  }

  test("array literal: quoted elements with delimiters, escapes, literal NULL") {
    parse1("""{a,"b,c",d}""") shouldBe Seq("a", "b,c", "d")
    parse1("""{"he said \"hi\"","back\\slash"}""") shouldBe Seq("""he said "hi"""", """back\slash""")
    parse1("""{"NULL",NULL}""") shouldBe Seq("NULL", null)
  }

  test("array literal: malformed input → null, null in → null") {
    parse1("not an array") shouldBe null
    parse1(null) shouldBe null
  }

  test("typed array elements") {
    val r = Seq(Tuple1("{1,2,NULL}")).toDF("s")
      .select(PgValues.castArrayText(col("s"), PgTypes.Int8Oid).as("a"))
      .collect()(0).getSeq[Any](0)
    r shouldBe Seq(1L, 2L, null)
  }

  test("bool text format t/f") {
    val r = Seq(("t", "f")).toDF("a", "b").select(
      PgValues.castText(col("a"), PgTypes.BoolOid),
      PgValues.castText(col("b"), PgTypes.BoolOid)).collect()(0)
    (r.getBoolean(0), r.getBoolean(1)) shouldBe ((true, false))
  }

  test("bytea hex format") {
    val r = Seq(Tuple1("\\x0a0b")).toDF("a")
      .select(PgValues.castText(col("a"), PgTypes.ByteaOid)).collect()(0)
    r.getAs[Array[Byte]](0) shouldBe Array[Byte](0x0a, 0x0b)
  }

  test("timestamp / date / numeric text parse") {
    val r = Seq(("2024-03-01 12:34:56.789", "2024-03-01", "12.50")).toDF("ts", "d", "n")
      .select(
        PgValues.castText(col("ts"), PgTypes.TimestamptzOid).cast("string"),
        PgValues.castText(col("d"), PgTypes.DateOid).cast("string"),
        PgValues.castText(col("n"), PgTypes.NumericOid).cast("double"))
      .collect()(0)
    r.getString(0) shouldBe "2024-03-01 12:34:56.789"
    r.getString(1) shouldBe "2024-03-01"
    r.getDouble(2) shouldBe 12.5
  }

  test("numeric overflow policy: ANSI throws, permissive nulls, text keeps") {
    // 25 integer digits: outside decimal(38,18)'s 20-integer-digit range
    val big = "1234567890123456789012345.5"
    val df = Seq(big).toDF("n")
    an[Exception] should be thrownBy
      df.select(PgValues.castText(col("n"), PgTypes.NumericOid)).collect()
    df.select(PgValues.castText(col("n"), PgTypes.NumericOid,
        numericMode = PgTypes.NumericPermissive)).collect()(0).isNullAt(0) shouldBe true
    df.select(PgValues.castText(col("n"), PgTypes.NumericOid,
        numericMode = PgTypes.NumericText)).collect()(0).getString(0) shouldBe big
    // in-range values are identical across modes
    val small = Seq("12.50").toDF("n")
    small.select(PgValues.castText(col("n"), PgTypes.NumericOid,
      numericMode = PgTypes.NumericPermissive).cast("double"))
      .collect()(0).getDouble(0) shouldBe 12.5
    // NumericText flows through the schema mapping too
    Relation("s", "t", Seq(RelColumn("n", PgTypes.NumericOid)))
      .toStructType(PgTypes.NumericText).head.dataType shouldBe
      org.apache.spark.sql.types.StringType
  }

  test("relation → StructType via PgTypes") {
    val rel = Relation("public", "t", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("ok", PgTypes.BoolOid),
      RelColumn("tags", PgTypes.TextOid, isArray = true),
      RelColumn("doc", PgTypes.JsonbOid),
      RelColumn("mystery", 999999)))
    rel.toStructType.map(_.dataType.simpleString) shouldBe
      Seq("bigint", "boolean", "array<string>", "string", "string")
  }

  test("schema equality mirrors db.go Relation.Equal") {
    val a = Relation("public", "t", Seq(RelColumn("id", PgTypes.Int8Oid, isIdentity = true)))
    a.equalsSchema(a.copy()) shouldBe true
    a.equalsSchema(a.copy(columns = Seq(RelColumn("id", PgTypes.Int4Oid, isIdentity = true)))) shouldBe false
    a.equalsSchema(a.copy(columns = Seq(RelColumn("id", PgTypes.Int8Oid)))) shouldBe false
  }
}
