package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.cdc.{ChangeAction, PgTypes, RelColumn, Relation}

/** Full sync loop against a REAL database engine (embedded Derby, which
  * ships on the Spark classpath and implements ANSI MERGE) — the
  * warehouse-target role the reference exercises against Snowflake
  * (target/snowflake/snowflake_target.go): partitioned JDBC backfill
  * read → initialize → per-batch stage + server-side MERGE → read-back. */
class JdbcTargetSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val target = new JdbcTarget(url)

  private val rel = Relation("public", "customers", Seq(
    RelColumn("c_custkey", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("c_name", PgTypes.TextOid),
    RelColumn("c_acctbal", PgTypes.Float8Oid)))

  private def action(lsn: Long, op: String, key: Long,
      values: Map[String, String] = Map.empty,
      nulls: Seq[String] = Nil, unchanged: Seq[String] = Nil,
      rekey: Boolean = false) =
    ChangeAction("customers", lsn, 0, op, Map("c_custkey" -> key.toString),
      values, nulls, unchanged, rekey)

  private def stateByKey(): Map[Long, (String, Option[Double])] =
    target.read(spark, "customers").collect().map { r =>
      val k = r.getLong(r.fieldIndex("C_CUSTKEY"))
      val name = r.getString(r.fieldIndex("C_NAME"))
      val bal = if (r.isNullAt(r.fieldIndex("C_ACCTBAL"))) None
                else Some(r.getDouble(r.fieldIndex("C_ACCTBAL")))
      k -> (name, bal)
    }.toMap

  test("partitioned backfill read fans out over JDBC range queries") {
    target.withConnection { c =>
      val st = c.createStatement()
      try {
        try st.execute("DROP TABLE SRC") catch { case _: java.sql.SQLException => () }
        st.execute("CREATE TABLE SRC (ID BIGINT, V DOUBLE)")
        (1 to 100).foreach(i => st.execute(s"INSERT INTO SRC VALUES ($i, $i.5)"))
      } finally st.close()
    }
    val df = Jdbc.partitionedTable(url, "SRC", "ID", 0, 101, numPartitions = 4).load(spark)
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 100
    df.agg(sum("V")).collect()(0).getDouble(0) shouldBe (1 to 100).map(_ + 0.5).sum
  }

  test("initialize + staged MERGE applies update/TOAST/delete/insert server-side") {
    val snapshot = Seq(
      (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    target.initialize(rel, snapshot)
    stateByKey() should have size 3

    val batch = Seq(
      // update bal, name TOAST-unchanged → keeps "alice"
      action(10, "U", 1,
        values = Map("c_custkey" -> "1", "c_acctbal" -> "11.5"),
        unchanged = Seq("c_name")),
      // delete
      action(11, "D", 2),
      // insert a new row with an explicit NULL balance
      action(12, "I", 4,
        values = Map("c_custkey" -> "4", "c_name" -> "dave"),
        nulls = Seq("c_acctbal")))
    target.applyBatch(rel, batch.toDS())

    stateByKey() shouldBe Map(
      1L -> ("alice", Some(11.5)),
      3L -> ("carol", Some(30.0)),
      4L -> ("dave", None))
  }

  test("replaying the same batch is idempotent (at-least-once → exactly-once)") {
    val batch = Seq(
      action(20, "U", 3,
        values = Map("c_custkey" -> "3", "c_acctbal" -> "33.0"),
        unchanged = Seq("c_name")))
    target.applyBatch(rel, batch.toDS())
    val first = stateByKey()
    target.applyBatch(rel, batch.toDS())
    stateByKey() shouldBe first
    first(3L) shouldBe ("carol", Some(33.0))
  }

  test("identity-changing update re-keys server-side") {
    val batch = Seq(
      action(30, "U", 4,
        values = Map("c_custkey" -> "404", "c_name" -> "dave2", "c_acctbal" -> "44.0"),
        rekey = true))
    target.applyBatch(rel, batch.toDS())
    val st = stateByKey()
    st.get(4L) shouldBe None
    st(404L) shouldBe ("dave2", Some(44.0))
  }

  test("multi-table batch applies in one transaction; failure rolls back everything") {
    val rel2 = Relation("public", "orders_t", Seq(
      RelColumn("o_id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("o_total", PgTypes.Float8Oid)))
    target.initialize(rel2, Seq((100L, 5.0)).toDF("o_id", "o_total"))

    def batch(lsn: Long, bal: String, total: String) = Seq(
      action(lsn, "U", 1,
        values = Map("c_custkey" -> "1", "c_acctbal" -> bal),
        unchanged = Seq("c_name")),
      ChangeAction("orders_t", lsn, 1, "U", Map("o_id" -> "100"),
        Map("o_id" -> "100", "o_total" -> total), Nil, Nil, rekey = false))

    target.applyBatchTransactional(Seq(rel, rel2), batch(100, "77.0", "7.5").toDS(),
      maxLsn = 100) shouldBe true
    stateByKey()(1L) shouldBe ("alice", Some(77.0))
    target.read(spark, "orders_t").collect()(0).getDouble(1) shouldBe 7.5
    target.appliedLsn() shouldBe 100L

    // replay of an applied batch is skipped by the in-database LSN record
    target.applyBatchTransactional(Seq(rel, rel2), batch(100, "88.0", "8.5").toDS(),
      maxLsn = 100) shouldBe false
    stateByKey()(1L)._2 shouldBe Some(77.0)

    // a failure on the SECOND table (dropped out from under the batch)
    // must roll back the first table's merge and the LSN update
    target.withConnection { c =>
      val st = c.createStatement(); try st.execute("DROP TABLE ORDERS_T") finally st.close()
    }
    an[Exception] should be thrownBy
      target.applyBatchTransactional(Seq(rel, rel2), batch(200, "99.0", "9.5").toDS(),
        maxLsn = 200)
    stateByKey()(1L)._2 shouldBe Some(77.0) // customer merge rolled back
    target.appliedLsn() shouldBe 100L

    // restore the table; the same batch then applies cleanly
    target.initialize(rel2, Seq((100L, 7.5)).toDF("o_id", "o_total"))
    target.applyBatchTransactional(Seq(rel, rel2), batch(200, "99.0", "9.5").toDS(),
      maxLsn = 200) shouldBe true
    stateByKey()(1L)._2 shouldBe Some(99.0)
    target.read(spark, "orders_t").collect()(0).getDouble(1) shouldBe 9.5
  }

  test("unsafe identifiers are rejected before reaching generated SQL") {
    val evil = Relation("public", "cust; DROP TABLE CUSTOMERS--", Seq(
      RelColumn("c_custkey", PgTypes.Int8Oid, isIdentity = true)))
    an[IllegalArgumentException] should be thrownBy target.mergeSql(evil)
    val evilCol = Relation("public", "ok_table", Seq(
      RelColumn("""k" BIGINT); --""", PgTypes.Int8Oid, isIdentity = true)))
    an[IllegalArgumentException] should be thrownBy target.mergeSql(evilCol)
  }

  test("an emptied LSN record re-seeds instead of failing forever") {
    target.appliedLsn() // ensures the table exists
    target.withConnection { c =>
      val st = c.createStatement()
      try st.execute("DELETE FROM GRAFT_APPLIED_LSN") finally st.close()
    }
    // re-seeded on the next read: reads as "nothing applied", no exception
    target.appliedLsn() shouldBe Long.MinValue
  }

  test("fresh-warehouse bootstrap: a configured schema is created and used") {
    // a brand-new database with NO pre-existing schema objects — first run
    // must create the namespace (reference setupSchema,
    // snowflake_target.go:106-134), not fail on the first CREATE TABLE
    val freshUrl = "jdbc:derby:memory:graftboot;create=true"
    val t1 = new JdbcTarget(freshUrl, schema = Some("graft_tgt"))
    val snapshot = Seq((1L, "ann", 1.0), (2L, "ben", 2.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    t1.initialize(rel, snapshot)
    t1.applyBatch(rel, Seq(
      action(5, "I", 3, values = Map("c_custkey" -> "3", "c_name" -> "cyd",
        "c_acctbal" -> "3.0"))).toDS())
    // every object landed inside the schema, none in the default namespace
    t1.mergeSql(rel) should include("GRAFT_TGT.CUSTOMERS")
    t1.read(spark, "customers").count() shouldBe 3
    t1.appliedLsn() shouldBe Long.MinValue // per-batch applyBatch doesn't track LSN
    // re-construction against the now-existing schema is a no-op, not a failure
    val t2 = new JdbcTarget(freshUrl, schema = Some("graft_tgt"))
    t2.read(spark, "customers").count() shouldBe 3
  }

  test("the generated MERGE mirrors the reference template") {
    val sql = target.mergeSql(rel)
    sql should include("MERGE INTO CUSTOMERS T USING CUSTOMERS__STAGE S ON T.C_CUSTKEY = S.K_C_CUSTKEY")
    sql should include("WHEN MATCHED AND S.DEL THEN DELETE")
    sql should include(
      "C_NAME = CASE WHEN S.U_C_NAME THEN T.C_NAME WHEN S.N_C_NAME THEN NULL WHEN S.H_C_NAME THEN S.V_C_NAME ELSE T.C_NAME END")
    sql should include("WHEN NOT MATCHED AND NOT S.DEL THEN INSERT")
  }
}
