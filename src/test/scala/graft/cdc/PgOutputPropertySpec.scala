package graft.cdc

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-trip property over the pgoutput wire layer: arbitrary
  * relations/transactions → encode frames → [[PgOutput.Decoder]] →
  * compare against a MODEL of the documented decode semantics computed
  * directly from the generated structures (never from the bytes). The
  * example-based goldens in PgOutputSpec pin the byte layout; this spec
  * pins the SEMANTICS under shapes the examples don't reach — multi-byte
  * UTF-8 values, empty strings, NULL/TOAST-unchanged identity cells,
  * all three update old-tuple variants, interleaved relations, and
  * multi-transaction seq/xid stamping. */
class PgOutputPropertySpec extends AnyFunSuite with Matchers {
  import PgOutput._

  /** Deterministic scalacheck sampling (scalatestplus bridge not on the
    * classpath — offline build). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- generators -------------------------------------------------------

  private val genText: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', '"', '\'', '\n', '\t', ' ', '\\',
        '{', '}', 'é', 'ß', '中', '✓')))
  } yield cs.mkString

  private def genCell(allowUnchanged: Boolean): Gen[Cell] =
    Gen.frequency(
      6 -> genText.map(CellText),
      2 -> Gen.const(CellNull),
      (if (allowUnchanged) 1 else 0) -> Gen.const(CellUnchanged))

  private val scalarOids =
    Seq(PgTypes.Int8Oid, PgTypes.Int4Oid, PgTypes.TextOid,
      PgTypes.NumericOid, PgTypes.BoolOid, PgTypes.TimestamptzOid)

  private def genRel(table: String): Gen[Relation] = for {
    n <- Gen.chooseNum(1, 5)
    oids <- Gen.listOfN(n, Gen.oneOf(scalarOids))
    idFlags0 <- Gen.listOfN(n, Gen.prob(0.4))
    // the decoder rejects relations with no identity column
    idFlags = if (idFlags0.contains(true)) idFlags0
              else true +: idFlags0.drop(1)
  } yield Relation("public", table, oids.zip(idFlags).zipWithIndex.map {
    case ((oid, id), i) => RelColumn(s"c$i", oid, isIdentity = id)
  })

  private sealed trait Dml
  private case class Ins(cells: Seq[Cell]) extends Dml
  private case class Upd(old: Option[(Char, Seq[Cell])], cells: Seq[Cell]) extends Dml
  private case class Del(keyType: Char, cells: Seq[Cell]) extends Dml

  private def genTuple(rel: Relation, allowUnchanged: Boolean): Gen[Seq[Cell]] =
    Gen.sequence[Seq[Cell], Cell](rel.columns.map(_ => genCell(allowUnchanged)))

  private def genDml(rel: Relation): Gen[Dml] = Gen.frequency(
    3 -> genTuple(rel, allowUnchanged = true).map(Ins),
    1 -> genTuple(rel, allowUnchanged = true).map(Upd(None, _)),
    2 -> (for {
      t <- Gen.oneOf('K', 'O')
      old <- genTuple(rel, allowUnchanged = false)
      nw <- genTuple(rel, allowUnchanged = true)
    } yield Upd(Some((t, old)), nw)),
    2 -> (for {
      t <- Gen.oneOf('K', 'O')
      old <- genTuple(rel, allowUnchanged = false)
    } yield Del(t, old)))

  private case class Txn(xid: Long, lsn: Long, dmls: Seq[(Int, Dml)])

  /** 1-3 relations interleaved across 1-3 transactions. */
  private val genStream: Gen[(Map[Int, Relation], Seq[Txn])] = for {
    nRels <- Gen.chooseNum(1, 3)
    rels <- Gen.sequence[Seq[Relation], Relation](
      (0 until nRels).map(i => genRel(s"t$i")))
    relById = rels.zipWithIndex.map { case (r, i) => (100 + i) -> r }.toMap
    nTxns <- Gen.chooseNum(1, 3)
    txns <- Gen.sequence[Seq[Txn], Txn]((1 to nTxns).map { k =>
      for {
        nDml <- Gen.chooseNum(1, 6)
        dmls <- Gen.sequence[Seq[(Int, Dml)], (Int, Dml)]((1 to nDml).map { _ =>
          for {
            relId <- Gen.oneOf(relById.keys.toSeq)
            dml <- genDml(relById(relId))
          } yield (relId, dml)
        })
      } yield Txn(xid = 40 + k, lsn = 1000L * k, dmls = dmls)
    })
  } yield (relById, txns)

  // ---- the model: documented semantics, computed from the structures ----

  private def textCells(rel: Relation, cells: Seq[Cell]): Map[String, String] =
    rel.columns.zip(cells).collect { case (c, CellText(v)) => c.name -> v }.toMap
  private def names(rel: Relation, cells: Seq[Cell], p: Cell => Boolean): Seq[String] =
    rel.columns.zip(cells).collect { case (c, cell) if p(cell) => c.name }
  private def keyOf(rel: Relation, cells: Seq[Cell]): Map[String, String] =
    rel.columns.zip(cells).collect {
      case (c, CellText(v)) if c.isIdentity => c.name -> v
    }.toMap

  private def model(relById: Map[Int, Relation], txns: Seq[Txn]): Seq[WalMessage] =
    txns.flatMap { t =>
      val begin = WalMessage(t.xid, 0, "BEGIN", t.lsn, "",
        Map.empty, Map.empty, Nil, Nil, rekey = false)
      val dmls = t.dmls.zipWithIndex.map { case ((relId, dml), i) =>
        val rel = relById(relId)
        val seq = i + 1
        dml match {
          case Ins(cells) =>
            WalMessage(t.xid, seq, "INSERT", 0L, rel.table,
              keyOf(rel, cells), textCells(rel, cells),
              names(rel, cells, _ == CellNull), names(rel, cells, _ == CellUnchanged),
              rekey = false)
          case Upd(old, cells) =>
            val rekey = old.exists(_._1 == 'K')
            val key = if (rekey) keyOf(rel, old.get._2) else keyOf(rel, cells)
            WalMessage(t.xid, seq, "UPDATE", 0L, rel.table,
              key, textCells(rel, cells),
              names(rel, cells, _ == CellNull), names(rel, cells, _ == CellUnchanged),
              rekey)
          case Del(_, old) =>
            // deletes carry ONLY the identity — no values, no null/unchanged
            WalMessage(t.xid, seq, "DELETE", 0L, rel.table,
              keyOf(rel, old), Map.empty, Nil, Nil, rekey = false)
        }
      }
      val commit = WalMessage(t.xid, Int.MaxValue, "COMMIT", t.lsn, "",
        Map.empty, Map.empty, Nil, Nil, rekey = false)
      (begin +: dmls) :+ commit
    }

  // ---- encode the same structures to frames ------------------------------

  private def frames(relById: Map[Int, Relation], txns: Seq[Txn]): Seq[Array[Byte]] =
    txns.flatMap { t =>
      val announced = t.dmls.map(_._1).distinct
      Seq(encodeBegin(t.lsn, 0L, t.xid)) ++
        // relations re-announced per txn: identical re-announce must be
        // accepted silently (the cache compare sees no change)
        announced.map(id => encodeRelation(id, relById(id))) ++
        t.dmls.map {
          case (id, Ins(cells))      => encodeInsert(id, cells)
          case (id, Upd(old, cells)) => encodeUpdate(id, old, cells)
          case (id, Del(kt, cells))  => encodeDelete(id, kt, cells)
        } ++
        Seq(encodeCommit(t.lsn, t.lsn, 0L))
    }

  // ---- the property ------------------------------------------------------

  test("encode → decode equals the documented-semantics model " +
      "(200 generated streams)") {
    samples(genStream, 200).foreach { case (relById, txns) =>
      val d = new Decoder()
      val got = frames(relById, txns).flatMap(d.feed)
      val want = model(relById, txns)
      withClue(s"stream: ${txns.map(t => (t.xid, t.dmls.size))}") {
        got shouldBe want
      }
    }
  }

  test("the configured-shape seed never false-positives on generated " +
      "healthy streams (seed derived from the same relations)") {
    samples(genStream, 80).foreach { case (relById, txns) =>
      val seed = Relation.expectedColumnsMap(relById.values.toSeq)
      val d = new Decoder(expectedColumns = seed)
      noException should be thrownBy frames(relById, txns).foreach(d.feed)
    }
  }
}
