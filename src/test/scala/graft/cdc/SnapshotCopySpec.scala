package graft.cdc

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Native COPY snapshot backfill over a byte-exact scripted loopback
  * server: BEGIN → SET TRANSACTION SNAPSHOT → per-table `copy … to
  * stdout` (chunked mid-line to prove stream reassembly) → COMMIT, then
  * the spooled CSV read back through PgCsv's typed decode. */
class SnapshotCopySpec extends AnyFunSuite with Matchers {
  import PgWireTestKit._

  private val users = Relation("public", "users", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("name", PgTypes.TextOid)))
  private val orders = Relation("public", "orders", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("amount", PgTypes.NumericOid)))

  private def expectQuery(in: DataInputStream, expected: String): Unit = {
    val (t, q) = readMsg(in)
    t shouldBe 'Q'
    new String(q, 0, q.length - 1, UTF_8) shouldBe expected
  }

  private def commandOk(out: DataOutputStream, tag: String): Unit = {
    sendMsg(out, 'C', cstr(tag))
    sendMsg(out, 'Z', Array('I'.toByte))
  }

  /** CopyOutResponse: overall format byte + per-column formats. */
  private def copyOutResponse(out: DataOutputStream, nCols: Int): Unit =
    sendMsg(out, 'H',
      Array[Byte](0, ((nCols >> 8) & 0xFF).toByte, (nCols & 0xFF).toByte) ++
        Array.fill[Byte](2 * nCols)(0))

  test("pinned-snapshot COPY spools tables and reads back typed") {
    val usersCsv = "id,name\n1,alice\n2,\"bo,b\"\n3,\n"
    val ordersCsv = "id,amount\n10,12.50\n11,0.99\n"
    val spool = Files.createTempDirectory("graft-snapcopy")

    val server = new ServerSocket(0)
    val serverThread = new Thread(() => {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      readStartup(in)("user") shouldBe "graft"
      sendTrustReady(out)

      expectQuery(in, SnapshotCopy.beginSql)
      commandOk(out, "BEGIN")
      expectQuery(in, "SET TRANSACTION SNAPSHOT '00000003-0000001A-1'")
      commandOk(out, "SET")

      expectQuery(in,
        "copy \"public\".\"users\" to stdout with (format csv, header true)")
      copyOutResponse(out, 2)
      // chunk boundaries land mid-line on purpose: the client must
      // reassemble CopyData payloads byte-for-byte, not line-by-line
      usersCsv.getBytes(UTF_8).grouped(7).foreach(c => sendCopyData(out, c))
      sendCopyDone(out)
      commandOk(out, "COPY 3")

      expectQuery(in,
        "copy \"public\".\"orders\" to stdout with (format csv, header true)")
      copyOutResponse(out, 2)
      sendCopyData(out, ordersCsv.getBytes(UTF_8))
      sendCopyDone(out)
      commandOk(out, "COPY 2")

      expectQuery(in, SnapshotCopy.commitSql)
      commandOk(out, "COMMIT")
      s.close()
    })
    serverThread.start()

    val socket = new Socket("127.0.0.1", server.getLocalPort)
    val conn = new PgConnect.Conn(
      new DataInputStream(socket.getInputStream),
      new DataOutputStream(socket.getOutputStream))
    conn.startup(PgConnect.Config(user = "graft", database = "appdb",
      replication = false))

    val spooled = SnapshotCopy.spoolTables(conn, "00000003-0000001A-1",
      Seq(users, orders), spool)
    serverThread.join(5000)
    server.close()
    socket.close()

    spooled.map(_.bytes) shouldBe Seq(usersCsv.length.toLong, ordersCsv.length.toLong)
    new String(Files.readAllBytes(spooled(0).path), UTF_8) shouldBe usersCsv
    new String(Files.readAllBytes(spooled(1).path), UTF_8) shouldBe ordersCsv

    val spark = TestSpark.spark
    val u = SnapshotCopy.read(spark, spooled(0))
    u.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq shouldBe
      Seq(("id", "long"), ("name", "string"))
    u.collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
      .toSeq shouldBe Seq((1L, Some("alice")), (2L, Some("bo,b")), (3L, None))
    val o = SnapshotCopy.read(spark, spooled(1))
    o.collect()
      .map(r => (r.getLong(0), r.getDecimal(1).stripTrailingZeros.toPlainString))
      .sortBy(_._1).toSeq shouldBe Seq((10L, "12.5"), (11L, "0.99"))
  }

  test("wire introspection parses text-protocol catalog rows into a Relation") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      readStartup(in)
      sendTrustReady(out)
      val (tq, q) = readMsg(in)
      tq shouldBe 'Q'
      new String(q, 0, q.length - 1, UTF_8) shouldBe
        SnapshotCopy.introspectSql("public", "users")
      sendMsg(out, 'T', rowDesc("attname", "pk", "oid", "is_array", "not_null", "replident"))
      sendMsg(out, 'D', dataRow("id", "t", "20", "f", "t", "d"))
      sendMsg(out, 'D', dataRow("name", "f", "25", "f", "f", "d"))
      sendMsg(out, 'D', dataRow("tags", "f", "25", "t", "f", "d")) // text[] → elem oid
      sendMsg(out, 'C', cstr("SELECT 3"))
      sendMsg(out, 'Z', Array('I'.toByte))
      s.close()
    })
    t.start()

    val socket = new Socket("127.0.0.1", server.getLocalPort)
    val conn = new PgConnect.Conn(
      new DataInputStream(socket.getInputStream),
      new DataOutputStream(socket.getOutputStream))
    conn.startup(PgConnect.Config(user = "graft", database = "appdb",
      replication = false))
    val rel = SnapshotCopy.introspectRelation(conn, "public", "users")
    t.join(5000)
    server.close()
    socket.close()

    rel shouldBe Relation("public", "users", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true, notNull = true),
      RelColumn("name", PgTypes.TextOid),
      RelColumn("tags", PgTypes.TextOid, isArray = true)))
    rel.nullableIdentity shouldBe false
  }

  test("REPLICA IDENTITY FULL with a nullable identity column sets nullableIdentity") {
    // catalog answers: replident 'f', identity columns (a NOT NULL, b nullable)
    def introspect(rows: Seq[Seq[String]]): Relation = {
      val server = new ServerSocket(0)
      val t = new Thread(() => {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val out = new DataOutputStream(s.getOutputStream)
        readStartup(in)
        sendTrustReady(out)
        readMsg(in)
        sendMsg(out, 'T', rowDesc("attname", "pk", "oid", "is_array", "not_null", "replident"))
        rows.foreach(r => sendMsg(out, 'D', dataRow(r: _*)))
        sendMsg(out, 'C', cstr(s"SELECT ${rows.size}"))
        sendMsg(out, 'Z', Array('I'.toByte))
        s.close()
      })
      t.start()
      val socket = new Socket("127.0.0.1", server.getLocalPort)
      val conn = new PgConnect.Conn(
        new DataInputStream(socket.getInputStream),
        new DataOutputStream(socket.getOutputStream))
      conn.startup(PgConnect.Config(user = "graft", database = "appdb",
        replication = false))
      val rel = SnapshotCopy.introspectRelation(conn, "public", "t")
      t.join(5000); server.close(); socket.close()
      rel
    }
    introspect(Seq(
      Seq("a", "t", "20", "f", "t", "f"),
      Seq("b", "t", "25", "f", "f", "f"))).nullableIdentity shouldBe true
    // all identity columns NOT NULL → FULL still joins with ===
    introspect(Seq(
      Seq("a", "t", "20", "f", "t", "f"),
      Seq("b", "f", "25", "f", "f", "f"))).nullableIdentity shouldBe false
  }

  test("wire introspectArrayTypes parses the pg_type scan (text booleans)") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      readStartup(in)
      sendTrustReady(out)
      val (tq, q) = readMsg(in)
      tq shouldBe 'Q'
      new String(q, 0, q.length - 1, UTF_8) shouldBe
        graft.sources.Jdbc.PgArrayTypesSql
      sendMsg(out, 'T', rowDesc("data_type_oid", "is_array"))
      sendMsg(out, 'D', dataRow("23", "f"))   // int4
      sendMsg(out, 'D', dataRow("1007", "t")) // _int4
      sendMsg(out, 'D', dataRow("1009", "t")) // _text
      sendMsg(out, 'C', cstr("SELECT 3"))
      sendMsg(out, 'Z', Array('I'.toByte))
      s.close()
    })
    t.start()
    val socket = new Socket("127.0.0.1", server.getLocalPort)
    val conn = new PgConnect.Conn(
      new DataInputStream(socket.getInputStream),
      new DataOutputStream(socket.getOutputStream))
    conn.startup(PgConnect.Config(user = "graft", database = "appdb",
      replication = false))
    val m = SnapshotCopy.introspectArrayTypes(conn)
    t.join(5000); server.close(); socket.close()
    m shouldBe Map(23 -> false, 1007 -> true, 1009 -> true)
  }

  test("ErrorResponse mid-COPY drains to ReadyForQuery and throws; conn survives") {
    val server2 = new ServerSocket(0)
    val t2 = new Thread(() => {
      val s = server2.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      readStartup(in)
      sendTrustReady(out)
      val (t, _) = readMsg(in)
      t shouldBe 'Q'
      copyOutResponse(out, 1)
      sendCopyData(out, "partial".getBytes(UTF_8))
      val err = ("S".getBytes(UTF_8) ++ cstr("ERROR")) ++
        ("C".getBytes(UTF_8) ++ cstr("57014")) ++
        ("M".getBytes(UTF_8) ++ cstr("canceling statement")) :+ 0.toByte
      sendMsg(out, 'E', err)
      sendMsg(out, 'Z', Array('I'.toByte))
      // the connection must still answer a follow-up query
      answerQuery(in, out, "SELECT 1", Seq("x"), Seq("1"))
      s.close()
    })
    t2.start()

    val socket = new Socket("127.0.0.1", server2.getLocalPort)
    val conn = new PgConnect.Conn(
      new DataInputStream(socket.getInputStream),
      new DataOutputStream(socket.getOutputStream))
    conn.startup(PgConnect.Config(user = "graft", database = "appdb",
      replication = false))

    val sink = new java.io.ByteArrayOutputStream()
    val ex = intercept[PgConnect.ServerError] {
      conn.copyOut("copy \"public\".\"users\" to stdout with (format csv, header true)", sink)
    }
    ex.code shouldBe "57014"
    new String(sink.toByteArray, UTF_8) shouldBe "partial" // bytes before the error kept
    conn.simpleQuery("SELECT 1").rows shouldBe Seq(Seq(Some("1")))
    t2.join(5000)
    server2.close()
    socket.close()
  }
}
