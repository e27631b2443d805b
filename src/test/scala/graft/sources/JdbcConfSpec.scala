package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class JdbcConfSpec extends AnyFunSuite with Matchers {

  test("partitioned read exposes Spark's parallel-read options") {
    val conf = Jdbc.partitionedTable(
      "jdbc:postgresql://host/db", "public.orders", "o_orderkey", 0L, 1000000L, 64)
    val o = conf.options
    o("partitionColumn") shouldBe "o_orderkey"
    o("lowerBound") shouldBe "0"
    o("upperBound") shouldBe "1000000"
    o("numPartitions") shouldBe "64"
    o("dbtable") shouldBe "public.orders"
  }

  test("unpartitioned read omits partition options") {
    val o = Jdbc.ReadConf("jdbc:postgresql://h/db", "t").options
    o.keySet should not contain "partitionColumn"
    o("fetchsize") shouldBe "10000"
  }

  test("write conf carries batching and isolation") {
    val o = Jdbc.WriteConf("jdbc:postgresql://h/db", "t", batchSize = 5000).options
    o("batchsize") shouldBe "5000"
    o("isolationLevel") shouldBe "READ_COMMITTED"
  }

  test("introspectArrayTypes builds the OID → is-array map from a catalog scan") {
    // embedded-Derby mock of the pg_type scan's (oid int, is_array bool)
    // result shape — the PG-specific SQL itself needs a live Postgres
    val url = "jdbc:derby:memory:jdbcarr;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE pgt_mock(data_type_oid INT, is_array BOOLEAN)")
      st.execute("INSERT INTO pgt_mock VALUES (23, false), (25, false), " +
        "(1007, true), (1009, true)") // int4, text, _int4, _text
      st.close()
    } finally conn.close()
    val m = Jdbc.introspectArrayTypes(url,
      catalogSql = "SELECT data_type_oid, is_array FROM pgt_mock")
    m shouldBe Map(23 -> false, 25 -> false, 1007 -> true, 1009 -> true)
  }

  test("default catalog SQL is the reference's pg_type scan") {
    Jdbc.PgArrayTypesSql should include("pg_type")
    Jdbc.PgArrayTypesSql should include("typcategory = 'A'")
  }

  test("PG array type names map to element OIDs (unknown degrades to text)") {
    import graft.cdc.PgTypes._
    Jdbc.oidOfTypeName("_int4") shouldBe Int4Oid
    Jdbc.oidOfTypeName("_int8") shouldBe Int8Oid
    Jdbc.oidOfTypeName("_text") shouldBe TextOid
    Jdbc.oidOfTypeName("_numeric") shouldBe NumericOid
    Jdbc.oidOfTypeName("_timestamptz") shouldBe TimestamptzOid
    Jdbc.oidOfTypeName("_bytea") shouldBe ByteaOid
    Jdbc.oidOfTypeName("_hstore") shouldBe TextOid
    Jdbc.oidOfTypeName(null) shouldBe TextOid
  }

  test("timestamptz disambiguates via TYPE_NAME: pgjdbc reports " +
      "Types.TIMESTAMP for both timestamp flavors") {
    import graft.cdc.PgTypes._
    import java.sql.{Types => T}
    // mapping on DATA_TYPE alone would seed the configured-shape type
    // guard with TimestampOid while the wire announces 1184 — a
    // non-converging resync loop for any timestamptz column on the
    // JDBC-introspected path
    Jdbc.oidOfColumn(T.TIMESTAMP, "timestamptz") shouldBe TimestamptzOid
    Jdbc.oidOfColumn(T.TIMESTAMP, "timestamp with time zone") shouldBe TimestamptzOid
    Jdbc.oidOfColumn(T.TIMESTAMP, "timestamp") shouldBe TimestampOid
    Jdbc.oidOfColumn(T.TIMESTAMP, "TIMESTAMP") shouldBe TimestampOid
    Jdbc.oidOfColumn(T.TIMESTAMP, null) shouldBe TimestampOid
    // drivers that DO report the distinct JDBC type still map right
    Jdbc.oidOfColumn(T.TIMESTAMP_WITH_TIMEZONE, "timestamptz") shouldBe TimestamptzOid
    Jdbc.oidOfColumn(T.INTEGER, "int4") shouldBe Int4Oid
  }
}
