package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.cdc._

/** End-to-end facade test: backfill → verify → message stream →
  * assembled transactions → merged tables — the whole reference lifecycle
  * (sync_service.Run) in one run. */
class GraftSyncSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rel = Relation("public", "accounts", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("balance", PgTypes.Float8Oid)))

  test("backfill, verify, stream WAL messages, observe merged state") {
    val base = java.nio.file.Files.createTempDirectory("graft-sync").toString
    val cfg = SyncConfig(Seq(rel), s"$base/tables", s"$base/ckpt",
      batchTimeout = "1 seconds")
    val sync = new GraftSync(spark, cfg)

    // 1. backfill (reference: snapshotToTarget)
    sync.backfill(rel, Seq((1L, 100.0), (2L, 200.0)).toDF("id", "balance"))
    sync.verifyRelation(rel) shouldBe true

    // 2. stream raw messages: one committed txn (update + insert),
    //    one uncommitted txn that must be held back
    def dml(xid: Long, seq: Int, op: String, id: Long, bal: Double) =
      WalMessage(xid, seq, op, 0L, "accounts",
        Map("id" -> id.toString),
        if (op == "DELETE") Map.empty
        else Map("id" -> id.toString, "balance" -> bal.toString),
        Nil, Nil, rekey = false)
    def commit(xid: Long, lsn: Long) =
      WalMessage(xid, Int.MaxValue, "COMMIT", lsn, "", Map.empty, Map.empty, Nil, Nil, false)

    val mem = MemoryStream[WalMessage]
    mem.addData(
      dml(100, 0, "UPDATE", 1, 150.0),
      dml(100, 1, "INSERT", 3, 300.0),
      commit(100, 1000),
      dml(101, 0, "DELETE", 2, 0.0)) // no commit → held back
    val q = sync.startFromMessages(mem.toDS())
    try q.processAllAvailable() finally q.stop()

    sync.table("accounts").as[(Long, Double)].collect().toSet shouldBe
      Set((1L, 150.0), (2L, 200.0), (3L, 300.0)) // id=2 still present

    // 3. commit arrives later with the txn's DML again (redelivery) —
    //    now it applies
    val mem2 = MemoryStream[WalMessage]
    mem2.addData(dml(101, 0, "DELETE", 2, 0.0), commit(101, 1001))
    val q2 = sync.startFromMessages(mem2.toDS(), streamName = "restarted")
    try q2.processAllAvailable() finally q2.stop()
    sync.table("accounts").as[(Long, Double)].collect().toSet shouldBe
      Set((1L, 150.0), (3L, 300.0))
  }

  test("a jdbc: tablesBase routes the same lifecycle through the warehouse target") {
    val base = java.nio.file.Files.createTempDirectory("graft-sync-jdbc").toString
    val cfg = SyncConfig(Seq(rel), "jdbc:derby:memory:graftsyncjdbc;create=true",
      s"$base/ckpt", batchTimeout = "1 seconds")
    val sync = new GraftSync(spark, cfg)

    sync.backfill(rel, Seq((1L, 100.0), (2L, 200.0)).toDF("id", "balance"))
    sync.verifyRelation(rel) shouldBe true
    sync.verifyRelation(Relation("public", "accounts", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("other_col", PgTypes.Float8Oid)))) shouldBe false

    def action(lsn: Long, op: String, id: Long, bal: Option[Double]) =
      ChangeAction("accounts", lsn, 0, op, Map("id" -> id.toString),
        bal.map(b => Map("id" -> id.toString, "balance" -> b.toString))
          .getOrElse(Map("id" -> id.toString)), Nil, Nil, rekey = false)

    val mem = MemoryStream[ChangeAction]
    mem.addData(
      action(100, "U", 1, Some(150.0)),
      action(101, "I", 3, Some(300.0)),
      action(102, "D", 2, None))
    val q = sync.start(mem.toDS())
    try q.processAllAvailable() finally q.stop()

    sync.table("accounts").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSet shouldBe
      Set(1L -> 150.0, 3L -> 300.0)

    // replayed batch through the facade is skipped by the in-database LSN
    sync.applyBatch(Seq(action(100, "U", 1, Some(999.0))).toDS(), 99L)
    sync.table("accounts").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSet should contain(1L -> 150.0)
  }

  test("jdbc-mode connection properties from config reach the warehouse") {
    // Derby resolves unqualified names against the connecting user's
    // schema, so a `user=` property that actually reaches the driver
    // puts the synced table in GRAFTUSER, not the default APP schema —
    // a property silently dropped anywhere along
    // config → SyncConfig → JdbcTarget/Spark-JDBC would fail both asserts
    val cfg = SyncConfig(Seq(rel), "jdbc:derby:memory:graftsyncprops;create=true",
      java.nio.file.Files.createTempDirectory("graft-sync-props").toString,
      batchTimeout = "1 seconds",
      targetProperties = Map("user" -> "GRAFTUSER"))
    val sync = new GraftSync(spark, cfg)
    sync.backfill(rel, Seq((1L, 100.0)).toDF("id", "balance"))
    def action(lsn: Long, op: String, id: Long, bal: Double) =
      ChangeAction("accounts", lsn, 0, op, Map("id" -> id.toString),
        Map("id" -> id.toString, "balance" -> bal.toString), Nil, Nil, rekey = false)
    sync.applyBatch(Seq(action(10, "I", 2, 200.0)).toDS(), 1L)
    sync.table("accounts").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSet shouldBe
      Set(1L -> 100.0, 2L -> 200.0)

    val props = new java.util.Properties() // default user APP
    val c = java.sql.DriverManager.getConnection(
      "jdbc:derby:memory:graftsyncprops", props)
    try {
      val st = c.createStatement()
      intercept[java.sql.SQLException] { // not visible unqualified from APP
        st.executeQuery("SELECT * FROM ACCOUNTS")
      }
      val rs = st.executeQuery("SELECT COUNT(*) FROM GRAFTUSER.ACCOUNTS")
      rs.next() shouldBe true
      rs.getLong(1) shouldBe 2L
    } finally c.close()
  }

  test("transaction straddling a micro-batch boundary applies whole") {
    val base = java.nio.file.Files.createTempDirectory("graft-sync3").toString
    val cfg = SyncConfig(Seq(rel), s"$base/tables", s"$base/ckpt",
      batchTimeout = "1 seconds")
    val sync = new GraftSync(spark, cfg)
    sync.backfill(rel, Seq((1L, 100.0)).toDF("id", "balance"))

    def dml(xid: Long, seq: Int, op: String, id: Long, bal: Double) =
      WalMessage(xid, seq, op, 0L, "accounts",
        Map("id" -> id.toString),
        Map("id" -> id.toString, "balance" -> bal.toString),
        Nil, Nil, rekey = false)

    val mem = MemoryStream[WalMessage]
    val q = sync.startFromMessages(mem.toDS())
    try {
      // batch 1: first half of txn 200 — must NOT apply anything yet
      mem.addData(dml(200, 0, "UPDATE", 1, 111.0))
      q.processAllAvailable()
      sync.table("accounts").as[(Long, Double)].collect().toSet shouldBe
        Set((1L, 100.0))
      // batch 2: second half + COMMIT — the WHOLE txn applies (both rows),
      // not just the post-boundary tail
      mem.addData(
        dml(200, 1, "INSERT", 9, 900.0),
        WalMessage(200, Int.MaxValue, "COMMIT", 2000, "", Map.empty, Map.empty, Nil, Nil, false))
      q.processAllAvailable()
    } finally q.stop()
    sync.table("accounts").as[(Long, Double)].collect().toSet shouldBe
      Set((1L, 111.0), (9L, 900.0))
  }

  test("batch assembler strict mode rejects straddling transactions") {
    val msgs = Seq(
      WalMessage(7L, 0, "INSERT", 0L, "accounts", Map("id" -> "1"),
        Map("id" -> "1", "balance" -> "5"), Nil, Nil, rekey = false)).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      ChangelogAssembler.assemble(msgs).collect()
    }
    ex.getMessage should include regex "(?i)stateful|commit"
  }

  test("config validation fails fast, mirroring config.Validate") {
    val base = java.nio.file.Files.createTempDirectory("graft-sync-v").toString
    def cfg(rels: Seq[Relation] = Seq(rel), timeout: String = "1 seconds",
        maxItems: Long = 10) =
      SyncConfig(rels, s"$base/t", s"$base/c", timeout, maxItems)
    an[IllegalArgumentException] should be thrownBy
      new GraftSync(spark, cfg(rels = Nil))
    an[IllegalArgumentException] should be thrownBy
      new GraftSync(spark, cfg(rels = Seq(rel, rel)))
    an[IllegalArgumentException] should be thrownBy
      new GraftSync(spark, cfg(rels = Seq(Relation("public", "nokey",
        Seq(RelColumn("v", PgTypes.TextOid))))))
    an[IllegalArgumentException] should be thrownBy
      new GraftSync(spark, cfg(timeout = "not a duration"))
    an[IllegalArgumentException] should be thrownBy
      new GraftSync(spark, cfg(maxItems = 0))
    noException should be thrownBy new GraftSync(spark, cfg())
  }

  test("verifyRelation reports schema drift") {
    val base = java.nio.file.Files.createTempDirectory("graft-sync2").toString
    val cfg = SyncConfig(Seq(rel), s"$base/tables", s"$base/ckpt")
    val sync = new GraftSync(spark, cfg)
    sync.backfill(rel, Seq((1L, "oops")).toDF("id", "balance")) // wrong type
    sync.verifyRelation(rel) shouldBe false
  }
}
