package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.cdc.{PgOutput, PgTypes, WalMessage}

/** ONE continuous lifecycle scenario — the analogue of the reference's
  * supervisor/e2e_test.go: config text → validate → JDBC introspection
  * (embedded Derby source) → backfill → stream transactions through
  * `startFromMessages` → source schema evolves and the pgoutput decoder
  * raises the change → supervisor resyncs (re-introspect + re-backfill) →
  * stream against the new schema → final state + resync count asserted. */
class GraftE2ESpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val url = "jdbc:derby:memory:grafte2e;create=true"

  private def execSql(sqls: String*): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try sqls.foreach(st.execute) finally st.close()
    } finally c.close()
  }

  private def dml(xid: Long, seq: Int, op: String, id: Long,
      values: Map[String, String]) =
    WalMessage(xid, seq, op, 0L, "USERS", Map("ID" -> id.toString),
      values, Nil, Nil, rekey = false)

  private def commit(xid: Long, lsn: Long) =
    WalMessage(xid, Int.MaxValue, "COMMIT", lsn, "",
      Map.empty, Map.empty, Nil, Nil, rekey = false)

  test("config → backfill → stream → schema change → resync → converge") {
    val base = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    execSql(
      "CREATE TABLE USERS (ID BIGINT PRIMARY KEY, NAME VARCHAR(100), BAL DOUBLE)",
      "INSERT INTO USERS VALUES (1, 'a', 10.0), (2, 'b', 20.0)")

    val fc = GraftConfig.parse(
      s"""sync:
         |  batchmaxitems: 1000
         |  batchtimeout: 1s
         |  tables: [APP.USERS]
         |postgres:
         |  connection: "$url"
         |  slotname: graft
         |  standbymessageinterval: 10s
         |snowflake:
         |  connection: "$base/tables"
         |""".stripMargin, env = Map.empty).validate()

    val (sync0, rels0) = Main.buildSync(spark, fc)
    // introspection: primary key became the replica identity, JDBC types
    // landed in the PG-OID vocabulary
    rels0.head.identityColumnNames shouldBe Seq("ID")
    rels0.head.columns.map(_.pgOid) shouldBe
      Seq(PgTypes.Int8Oid, PgTypes.TextOid, PgTypes.Float8Oid)
    sync0.table("USERS").collect().toSet shouldBe
      Set(Row(1L, "a", 10.0), Row(2L, "b", 20.0))

    var sync = sync0
    var resyncs = 0
    var attempts = 0

    val result = sync.runSupervised(
      body = () => {
        attempts += 1
        if (attempts == 1) {
          // phase 1: a committed transaction streams through the stateful
          // assembler into the merge loop
          val mem = MemoryStream[WalMessage]
          mem.addData(
            dml(100, 0, "UPDATE", 1, Map("ID" -> "1", "BAL" -> "11.0")),
            dml(100, 1, "INSERT", 3, Map("ID" -> "3", "NAME" -> "c", "BAL" -> "30.0")),
            commit(100, 1000))
          val q = sync.startFromMessages(mem.toDS(), streamName = "phase1")
          try q.processAllAvailable() finally q.stop()
          sync.table("USERS").collect().toSet shouldBe
            Set(Row(1L, "a", 11.0), Row(2L, "b", 20.0), Row(3L, "c", 30.0))

          // the SOURCE evolves: new column + the rows the source itself
          // now holds (a live source would have applied its own writes)
          execSql(
            "ALTER TABLE USERS ADD COLUMN TAG VARCHAR(10) DEFAULT 'x'",
            "UPDATE USERS SET BAL = 11.0 WHERE ID = 1",
            "INSERT INTO USERS VALUES (3, 'c', 30.0, 'x')")

          // the replication stream re-announces the relation; the pgoutput
          // decoder detects the drift and raises — EXACTLY the signal the
          // supervisor's resync path consumes
          val relOld = rels0.head
          val relNew = relOld.copy(columns =
            relOld.columns :+ graft.cdc.RelColumn("TAG", PgTypes.TextOid))
          val dec = new PgOutput.Decoder
          dec.feed(PgOutput.encodeBegin(5000, 0L, 500))
          dec.feed(PgOutput.encodeRelation(77, relOld))
          dec.feed(PgOutput.encodeCommit(5000, 5000, 0L))
          dec.feed(PgOutput.encodeBegin(6000, 0L, 501))
          dec.feed(PgOutput.encodeRelation(77, relNew)) // throws SchemaChanged
          fail("schema change must raise")
        } else {
          // phase 2 (post-resync): the table was re-backfilled with the
          // new schema; stream one more transaction against it
          sync.table("USERS").collect().toSet shouldBe Set(
            Row(1L, "a", 11.0, "x"), Row(2L, "b", 20.0, "x"), Row(3L, "c", 30.0, "x"))
          val mem = MemoryStream[WalMessage]
          mem.addData(
            dml(200, 0, "UPDATE", 2, Map("ID" -> "2", "TAG" -> "y")),
            commit(200, 2000))
          val q = sync.startFromMessages(mem.toDS(), streamName = "phase2")
          try q.processAllAvailable() finally q.stop()
        }
      },
      resnapshot = () => {
        resyncs += 1
        val (fresh, _) = Main.buildSync(spark, fc) // re-introspect + re-backfill
        sync = fresh
      })

    // the supervisor saw exactly one schema change and one resync, and the
    // final state reflects backfill + both streamed phases
    result.resyncs shouldBe 1
    resyncs shouldBe 1
    attempts shouldBe 2
    sync.table("USERS").collect().toSet shouldBe Set(
      Row(1L, "a", 11.0, "x"), Row(2L, "b", 20.0, "y"), Row(3L, "c", 30.0, "x"))
  }
}
