package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.SchemaChangedException

class PgOutputSpec extends AnyFunSuite with Matchers {
  import PgOutput._

  private val rel = Relation("public", "t1", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("v", PgTypes.TextOid)))

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---- golden fixtures: raw frames written BYTE BY BYTE from the
  // PostgreSQL protocol documentation, independent of the encoder ----

  private val goldenBegin = bytes(
    0x42, // 'B'
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x10, // final LSN 1/10
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, // commit ts
    0x00, 0x00, 0x03, 0x09) // xid 777

  private val goldenRelation = bytes(
    0x52, // 'R'
    0x00, 0x00, 0x00, 0x63, // relation oid 99
    0x70, 0x75, 0x62, 0x6c, 0x69, 0x63, 0x00, // "public\0"
    0x74, 0x31, 0x00, // "t1\0"
    0x64, // replica identity 'd'
    0x00, 0x02, // 2 columns
    0x01, 0x69, 0x64, 0x00, 0x00, 0x00, 0x00, 0x14, 0xff, 0xff, 0xff, 0xff, // id int8 key
    0x00, 0x76, 0x00, 0x00, 0x00, 0x00, 0x19, 0xff, 0xff, 0xff, 0xff) // v text

  private val goldenInsert = bytes(
    0x49, // 'I'
    0x00, 0x00, 0x00, 0x63, // relation oid 99
    0x4e, // 'N' new tuple
    0x00, 0x02, // 2 cells
    0x74, 0x00, 0x00, 0x00, 0x01, 0x37, // 't' len=1 "7"
    0x74, 0x00, 0x00, 0x00, 0x02, 0x68, 0x69) // 't' len=2 "hi"

  private val goldenCommit = bytes(
    0x43, // 'C'
    0x00, // flags
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x10, // commit LSN 1/10
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x18, // end LSN
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00) // commit ts

  test("golden byte frames decode to the documented messages") {
    val msgs = decode(Seq(goldenBegin, goldenRelation, goldenInsert, goldenCommit)).toSeq
    msgs should have length 3
    msgs(0) shouldBe WalMessage(777L, 0, "BEGIN", 0x0000000100000010L, "",
      Map.empty, Map.empty, Nil, Nil, rekey = false)
    msgs(1) shouldBe WalMessage(777L, 1, "INSERT", 0L, "t1",
      Map("id" -> "7"), Map("id" -> "7", "v" -> "hi"), Nil, Nil, rekey = false)
    msgs(2) shouldBe WalMessage(777L, Int.MaxValue, "COMMIT", 0x0000000100000010L, "",
      Map.empty, Map.empty, Nil, Nil, rekey = false)
  }

  test("golden frames equal the encoder's output (no wire-format drift)") {
    encodeBegin(0x0000000100000010L, 0L, 777L) shouldBe goldenBegin
    encodeRelation(99, rel) shouldBe goldenRelation
    encodeInsert(99, Seq(CellText("7"), CellText("hi"))) shouldBe goldenInsert
    encodeCommit(0x0000000100000010L, 0x0000000100000018L, 0L) shouldBe goldenCommit
  }

  private def txnFrames(xid: Long, lsn: Long, dml: Array[Byte]*): Seq[Array[Byte]] =
    encodeBegin(lsn, 0L, xid) +: encodeRelation(99, rel) +: dml :+
      encodeCommit(lsn, lsn, 0L)

  test("update: TOAST-unchanged cell, explicit NULL, identity from new tuple") {
    val msgs = decode(txnFrames(5, 1000,
      encodeUpdate(99, None, Seq(CellText("7"), CellUnchanged)),
      encodeUpdate(99, None, Seq(CellText("8"), CellNull)))).toSeq
    val u1 = msgs(1); val u2 = msgs(2)
    u1.msgType shouldBe "UPDATE"
    u1.keyBefore shouldBe Map("id" -> "7")
    u1.values shouldBe Map("id" -> "7")
    u1.unchanged shouldBe Seq("v")
    u1.rekey shouldBe false
    u2.nulls shouldBe Seq("v")
    u2.seq should be > u1.seq
  }

  test("update with 'K' old key re-keys; with 'O' full old row does not") {
    val msgs = decode(txnFrames(6, 2000,
      encodeUpdate(99, Some(('K', Seq(CellText("1"), CellNull))),
        Seq(CellText("2"), CellText("x"))),
      encodeUpdate(99, Some(('O', Seq(CellText("2"), CellText("x")))),
        Seq(CellText("2"), CellText("y"))))).toSeq
    val rekeyed = msgs(1)
    rekeyed.rekey shouldBe true
    rekeyed.keyBefore shouldBe Map("id" -> "1") // identity BEFORE, from old tuple
    rekeyed.values shouldBe Map("id" -> "2", "v" -> "x")
    val full = msgs(2)
    full.rekey shouldBe false
    full.keyBefore shouldBe Map("id" -> "2") // identity from new values
  }

  test("delete carries only the identity") {
    val msgs = decode(txnFrames(7, 3000,
      encodeDelete(99, 'K', Seq(CellText("9"), CellNull)))).toSeq
    val d = msgs(1)
    d.msgType shouldBe "DELETE"
    d.keyBefore shouldBe Map("id" -> "9")
    d.values shouldBe empty
  }

  test("decoded transaction assembles to actions with the commit LSN") {
    val msgs = decode(txnFrames(8, 0x0000000200000001L,
      encodeInsert(99, Seq(CellText("1"), CellText("a"))),
      encodeUpdate(99, None, Seq(CellText("1"), CellText("b"))))).toSeq
    val commit = msgs.find(_.msgType == "COMMIT").get
    val actions = ChangelogAssembler.assembleTxn(msgs, commit).toSeq
    actions.map(_.op) shouldBe Seq("I", "U")
    all(actions.map(_.lsn)) shouldBe 0x0000000200000001L
    actions.map(_.values("v")) shouldBe Seq("a", "b")
  }

  test("truncate surfaces as a TRUNCATE message and assembly rejects it") {
    val msgs = decode(txnFrames(9, 4000, encodeTruncate(Seq(99)))).toSeq
    msgs(1).msgType shouldBe "TRUNCATE"
    msgs(1).table shouldBe "t1"
    an[UnsupportedOperationException] should be thrownBy
      ChangelogAssembler.assembleTxn(msgs, msgs.last).toSeq
  }

  test("re-announced identical relation is fine; a changed one raises") {
    val d = new Decoder
    (txnFrames(10, 5000, encodeInsert(99, Seq(CellText("1"), CellText("a"))))
      :+ encodeBegin(6000, 0L, 11)
      :+ encodeRelation(99, rel)).foreach(d.feed) // identical re-announce: ok
    val changed = rel.copy(columns = rel.columns :+ RelColumn("extra", PgTypes.Int4Oid))
    a[SchemaChangedException] should be thrownBy d.feed(encodeRelation(99, changed))
  }

  test("configured-shape guard: a FRESH decoder raises on its first " +
      "announcement after a column drop/add/rename") {
    // the cache compare above needs a PREVIOUS announcement; a decoder
    // born at the exact DDL boundary has none, so only the seeded
    // expectation can catch a dropped column (the merge-side drift guard
    // sees absence as TOAST-unchanged)
    val expected = Relation.expectedColumnsMap(Seq(Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid),
      RelColumn("gone", PgTypes.Int4Oid)))))
    def fresh() = new Decoder(expectedColumns = expected)
    def announce(d: Decoder, r: Relation): Unit = {
      d.feed(encodeBegin(1000, 0L, 42)); d.feed(encodeRelation(99, r)); ()
    }
    // dropped column: wire announces fewer columns than configured
    a[SchemaChangedException] should be thrownBy announce(fresh(), rel)
    // renamed column
    val renamed = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid),
      RelColumn("gone2", PgTypes.Int4Oid)))
    a[SchemaChangedException] should be thrownBy announce(fresh(), renamed)
    // exact configured shape: fine, and identity flags are representation
    // details the guard must NOT compare (FULL marks every column)
    val exact = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid, isIdentity = true), // FULL-style flag
      RelColumn("gone", PgTypes.Int4Oid)))
    noException should be thrownBy announce(fresh(), exact)
    // relations absent from the map stay unguarded (strict name keying)
    noException should be thrownBy announce(new Decoder(expectedColumns =
      Map("public.other" -> Seq("x" -> org.apache.spark.sql.types.StringType))), rel)
  }

  test("configured-shape guard: a TYPE change with unchanged names raises " +
      "on a fresh decoder; representation differences must not") {
    import org.apache.spark.sql.types._
    def announce(d: Decoder, r: Relation): Unit = {
      d.feed(encodeBegin(1000, 0L, 42)); d.feed(encodeRelation(99, r)); ()
    }
    val configured = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.Int4Oid)))
    val seed = Relation.expectedColumnsMap(Seq(configured))
    // int4 → text at the exact DDL boundary: names alone cannot see it;
    // the Spark-mapped comparison does (IntegerType != StringType)
    val retyped = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid)))
    val e = the[SchemaChangedException] thrownBy
      announce(new Decoder(expectedColumns = seed), retyped)
    e.getMessage should include("type changed")
    // int4 → int8 (both verifiable scalars)
    val widened = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.Int8Oid)))
    a[SchemaChangedException] should be thrownBy
      announce(new Decoder(expectedColumns = seed), widened)
    // array representation: introspection records the ELEMENT oid with
    // isArray, the wire announces the ARRAY type's oid — both map to
    // ArrayType and the guard must accept the healthy stream
    val textArrayOid = 1009 // pg_catalog._text, public constant
    val configuredArr = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("tags", PgTypes.TextOid, isArray = true))) // element repr
    val seedArr = Relation.expectedColumnsMap(Seq(configuredArr))
    val wireArr = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("tags", textArrayOid))) // wire repr: array oid
    noException should be thrownBy announce(new Decoder(
      typeIsArray = Map(textArrayOid -> true), expectedColumns = seedArr), wireArr)
    // ...and array → scalar IS a type change when the oid is verifiable
    val wireScalarTags = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("tags", PgTypes.TextOid))) // text[] became text
    a[SchemaChangedException] should be thrownBy announce(new Decoder(
      typeIsArray = Map(textArrayOid -> true), expectedColumns = seedArr),
      wireScalarTags)
    // an OID outside typeIsArray ∪ mappedOids is UNVERIFIABLE: its Spark
    // fallback is the catch-all string, so a mismatch proves nothing —
    // skip, never a false positive (the decode still fails loudly on a
    // genuine change)
    val customOid = 99999
    val wireCustom = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", customOid)))
    noException should be thrownBy
      announce(new Decoder(expectedColumns = seed), wireCustom)
  }

  test("protocol violations fail loudly") {
    // DML before BEGIN
    an[IllegalStateException] should be thrownBy
      decode(Seq(encodeInsert(99, Seq(CellText("1"), CellText("a"))))).toSeq
    // unknown relation oid
    an[IllegalStateException] should be thrownBy
      decode(Seq(encodeBegin(1, 0, 1), encodeInsert(98, Seq(CellText("1"))))).toSeq
    // commit LSN mismatch = lost frames
    an[IllegalStateException] should be thrownBy
      decode(Seq(encodeBegin(100, 0, 1), encodeCommit(200, 200, 0))).toSeq
    // relation without identity columns
    val noKey = Relation("public", "nk", Seq(RelColumn("a", PgTypes.Int4Oid)))
    an[IllegalStateException] should be thrownBy
      decode(Seq(encodeBegin(1, 0, 1), encodeRelation(50, noKey))).toSeq
    // binary tuple cell (stream must be text-format)
    val binCell = bytes(0x49, 0x00, 0x00, 0x00, 0x63, 0x4e, 0x00, 0x01,
      0x62, 0x00, 0x00, 0x00, 0x01, 0x01) // 'b' len=1
    an[IllegalArgumentException] should be thrownBy
      decode(Seq(goldenBegin, goldenRelation, binCell)).toSeq
    // unknown top-level message type
    an[IllegalArgumentException] should be thrownBy decode(Seq(bytes(0x5a))).toSeq
  }

  test("replica identity byte drives nullableIdentity (with introspected refinement)") {
    val fullRel = Relation("public", "t1", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid, isIdentity = true))) // FULL: all cols key
    def announced(d: Decoder, replident: Char): Relation = {
      d.feed(encodeBegin(1000, 0L, 42))
      d.feed(encodeRelation(99, fullRel, replicaIdentity = replident))
      d.relationFor(99).get
    }
    // default 'd' (PK) identity: NOT NULL by the database's rules
    announced(new Decoder, 'd').nullableIdentity shouldBe false
    // FULL with no introspection: conservatively nullable
    announced(new Decoder, 'f').nullableIdentity shouldBe true
    // FULL, introspection proves every identity column NOT NULL: keep ===
    announced(new Decoder(notNullIdentity =
      Map("public.t1" -> Set("id", "v"))), 'f').nullableIdentity shouldBe false
    // FULL, one identity column unproven: nullable
    announced(new Decoder(notNullIdentity =
      Map("public.t1" -> Set("id"))), 'f').nullableIdentity shouldBe true
  }

  test("origin / type / logical-decoding messages are metadata (no output)") {
    val d = new Decoder
    d.feed(goldenBegin)
    d.feed(bytes(0x4f, 0, 0, 0, 0, 0, 0, 0, 1, 0x6f, 0x00)) shouldBe empty // 'O'
    d.feed(bytes(0x59, 0, 0, 0, 0x19, 0x70, 0x00, 0x74, 0x00)) shouldBe empty // 'Y'
  }
}
