package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.cdc.{ChangeAction, PgTypes, RelColumn, Relation}

/** Golden assertions for the Snowflake dialect generator: names, types,
  * statement order, and the MERGE template's per-column CASE semantics —
  * the text a live Snowflake connection would execute verbatim. */
class SnowflakeSqlSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sf = new SnowflakeSql("WH", "PUB")
  private val rel = Relation("public", "accounts", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("name", PgTypes.TextOid),
    RelColumn("meta", PgTypes.JsonbOid),
    RelColumn("tags", PgTypes.TextOid, isArray = true),
    RelColumn("bal", PgTypes.Float8Oid),
    RelColumn("seen", PgTypes.TimestamptzOid)))

  test("names: quoted three-part identifiers, _SCRATCH, table stage, safe file id") {
    sf.tableFq(rel, scratch = false) shouldBe "\"WH\".\"PUB\".\"ACCOUNTS\""
    sf.tableFq(rel, scratch = true) shouldBe "\"WH\".\"PUB\".\"ACCOUNTS_SCRATCH\""
    sf.tableStage(rel, scratch = true) shouldBe "@\"WH\".\"PUB\".\"%ACCOUNTS_SCRATCH\""
    sf.safeTableIdentifier(rel) shouldBe "PUBLIC_ACCOUNTS"
  }

  test("types: json/jsonb -> VARIANT, arrays -> ARRAY, ints collapse, tz split") {
    sf.sfType(RelColumn("x", PgTypes.JsonbOid)) shouldBe "VARIANT"
    sf.sfType(RelColumn("x", PgTypes.JsonOid)) shouldBe "VARIANT"
    sf.sfType(RelColumn("x", PgTypes.Int2Oid)) shouldBe "INT"
    sf.sfType(RelColumn("x", PgTypes.Int8Oid)) shouldBe "INT"
    sf.sfType(RelColumn("x", PgTypes.TextOid, isArray = true)) shouldBe "ARRAY"
    sf.sfType(RelColumn("x", PgTypes.TimestampOid)) shouldBe "TIMESTAMP_NTZ"
    sf.sfType(RelColumn("x", PgTypes.TimestamptzOid)) shouldBe "TIMESTAMP_TZ"
    sf.sfType(RelColumn("x", PgTypes.UuidOid)) shouldBe "STRING"
  }

  test("create table emits sfTypes in column order; temporary variant for staging") {
    sf.createTable(rel, scratch = false) shouldBe
      "create or replace table \"WH\".\"PUB\".\"ACCOUNTS\" (\"ID\" INT, " +
        "\"NAME\" STRING, \"META\" VARIANT, \"TAGS\" ARRAY, \"BAL\" FLOAT8, " +
        "\"SEEN\" TIMESTAMP_TZ);"
    sf.createTable(rel, scratch = true, temporary = true) should startWith(
      "create or replace temporary table \"WH\".\"PUB\".\"ACCOUNTS_SCRATCH\"")
  }

  test("backfill: chunked puts share one op pattern; swap-or-rename publish") {
    sf.backfillPut(rel, "op1", 3) shouldBe
      "put 'file://PUBLIC_ACCOUNTS-op1-3.csv' @\"WH\".\"PUB\".\"%ACCOUNTS_SCRATCH\" " +
        "auto_compress=true parallel=30 overwrite=true;"
    sf.backfillCopy(rel, "op1") should include("pattern='.*/PUBLIC_ACCOUNTS-op1-.*[.]csv.*'")
    sf.backfillCopy(rel, "op1") should include("skip_header = 1")
    sf.publish(rel, targetExists = true) shouldBe Seq(
      "alter table \"WH\".\"PUB\".\"ACCOUNTS_SCRATCH\" swap with \"WH\".\"PUB\".\"ACCOUNTS\";",
      "drop table \"WH\".\"PUB\".\"ACCOUNTS_SCRATCH\";")
    sf.publish(rel, targetExists = false) shouldBe Seq(
      "alter table \"WH\".\"PUB\".\"ACCOUNTS_SCRATCH\" rename to \"WH\".\"PUB\".\"ACCOUNTS\";")
  }

  test("staging columns follow the reference order and flag conventions") {
    val cols = sf.stagingColumns(rel)
    cols.head shouldBe ("_IDENTITY_ID" -> "INT")
    cols(1) shouldBe ("_DELETE_ROW" -> "BOOLEAN")
    cols.map(_._1) should contain inOrder (
      "_IDENTITY_ID", "_DELETE_ROW", "ID", "SEEN",
      "_IS_UNCHANGED_ID", "_IS_UNCHANGED_SEEN", "_IS_NULL_ID", "_IS_NULL_SEEN")
    cols.count(_._1.startsWith("_IS_UNCHANGED_")) shouldBe rel.columns.size
    cols.count(_._1.startsWith("_IS_NULL_")) shouldBe rel.columns.size
  }

  test("batch statement order: temp table, put, copy into, merge") {
    val st = sf.batchStatements(rel, "PUBLIC_ACCOUNTS-u1.csv")
    st should have size 4
    st(0) should startWith("create or replace temporary table")
    st(1) should startWith("put 'file://PUBLIC_ACCOUNTS-u1.csv'")
    st(2) should startWith("copy into \"WH\".\"PUB\".\"ACCOUNTS_SCRATCH\"")
    st(3) should startWith("merge into")
  }

  test("merge template: identity match, delete flag, unchanged/null CASE per column") {
    val m = sf.mergeStatement(rel)
    m should include(
      "on \"ACCOUNTS\".\"ID\" = \"ACCOUNTS_SCRATCH\".\"_IDENTITY_ID\"")
    m should include("when matched and \"ACCOUNTS_SCRATCH\".\"_DELETE_ROW\" then delete")
    m should include(
      "\"ACCOUNTS\".\"NAME\" = (case when \"ACCOUNTS_SCRATCH\".\"_IS_UNCHANGED_NAME\" " +
        "then \"ACCOUNTS\".\"NAME\" when \"ACCOUNTS_SCRATCH\".\"_IS_NULL_NAME\" " +
        "then null else \"ACCOUNTS_SCRATCH\".\"NAME\" end)")
    m should include("when not matched then insert (\"ID\", \"NAME\", \"META\", " +
      "\"TAGS\", \"BAL\", \"SEEN\") values (")
  }

  test("staging frame matches the column plan; arrays render as JSON text") {
    val acts = Seq(
      ChangeAction("accounts", 10L, 0, "U", Map("id" -> "1"),
        Map("id" -> "1", "name" -> "ann", "tags" -> "{a,b,NULL}"),
        nulls = Seq("bal"), unchanged = Seq("meta"), rekey = false),
      ChangeAction("accounts", 11L, 0, "D", Map("id" -> "2"),
        Map.empty, Nil, Nil, rekey = false)).toDS()
    val df = sf.stagingFrame(rel, acts)
    df.columns.toSeq shouldBe sf.stagingColumns(rel).map(_._1)
    val rows = df.orderBy("_IDENTITY_ID").collect()
    rows(0).getAs[String]("_IDENTITY_ID") shouldBe "1"
    rows(0).getAs[Boolean]("_DELETE_ROW") shouldBe false
    rows(0).getAs[String]("TAGS") shouldBe "[\"a\",\"b\",null]"
    rows(0).getAs[Boolean]("_IS_UNCHANGED_META") shouldBe true
    rows(0).getAs[Boolean]("_IS_NULL_BAL") shouldBe true
    rows(1).getAs[Boolean]("_DELETE_ROW") shouldBe true
    // delete rows leave the flag fields EMPTY (SQL NULL -> empty CSV
    // field), matching the reference's staged-file bytes
    rows(1).isNullAt(rows(1).fieldIndex("_IS_UNCHANGED_META")) shouldBe true
    rows(1).isNullAt(rows(1).fieldIndex("_IS_NULL_BAL")) shouldBe true
  }
}
