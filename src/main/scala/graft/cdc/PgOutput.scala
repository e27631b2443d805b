package graft.cdc

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import graft.streaming.SchemaChangedException

/** Binary `pgoutput` logical-replication protocol: frame bytes →
  * [[WalMessage]] — the engine's analogue of the reference's input layer
  * (pglogrepl decode + sync/stream/message_accumulator.go:42-202), built
  * from the PUBLIC protocol spec (PostgreSQL docs, "Logical Replication
  * Message Formats", protocol version 1, text-format tuples — the same
  * options the reference requests).
  *
  * Message types: Begin 'B', Commit 'C', Origin 'O', Relation 'R',
  * Type 'Y', Insert 'I', Update 'U', Delete 'D', Truncate 'T',
  * logical-decoding Message 'M'. Tuple cells are 'n' (NULL), 'u'
  * (unchanged TOAST), 't' (text, length-prefixed); 'b' (binary) is
  * rejected exactly as the reference's `valuesFromTuple` does — the
  * stream is requested in text format.
  *
  * A [[PgOutput.Decoder]] is stateful over ONE ordered frame stream (a
  * replication slot is a single ordered connection — same shape as the
  * reference's accumulator): it caches Relation metadata by relation OID,
  * raises [[SchemaChangedException]] when a re-announced relation differs
  * (message_accumulator.go ErrRelationChanged), and stamps each DML
  * message with the open transaction's xid and a per-transaction sequence
  * number. Decoded messages feed the distributed assembly
  * ([[ChangelogAssembler]] / streaming StatefulAssembler) — decode is the
  * only sequential step, everything downstream shuffles on xid/key. */
object PgOutput {

  /** One tuple cell, text format. */
  sealed trait Cell
  case object CellNull extends Cell
  case object CellUnchanged extends Cell
  final case class CellText(v: String) extends Cell

  private final case class Tuple(cells: Seq[Cell])

  /** Stateful frame decoder for one ordered pgoutput stream.
    *
    * @param typeIsArray PG type OID → is-array, from source introspection
    *        (the reference builds this map the same way; OIDs absent from
    *        the map decode as non-array).
    * @param notNullIdentity qualified relation name → ALL columns
    *        introspection knows are NOT NULL ([[Relation.notNullIdentityMap]];
    *        all of them, not just PK columns — under FULL the wire flags
    *        EVERY column as identity, so a PK-only map could never prove a
    *        multi-column table non-nullable).
    *        The Relation message carries the replica-identity setting but
    *        NOT column nullability, so for a REPLICA IDENTITY FULL relation
    *        ('f') any identity column absent from this map is treated as
    *        possibly-NULL and the relation decodes with
    *        `nullableIdentity = true` (null-safe MERGE joins). With the
    *        default empty map every FULL relation is conservatively
    *        nullable — correct, at the cost of the bucketed snapshot's
    *        exchange-free join. Default ('d') and index ('i') identities
    *        are NOT NULL by Postgres's own rules and never set the flag. */
  /** @param expectedColumns qualified relation name → ordered
    *        (column name, Spark-mapped type) the SYNC LAYER is configured
    *        with (from introspection at bootstrap,
    *        [[Relation.expectedColumnsMap]]). Closes the last lost-signal
    *        window: a decoder that is FRESH at the exact DDL boundary
    *        (crash between the change and its announcement) has no cached
    *        relation to compare against, so a column DROP would be
    *        accepted silently and the merge would inherit stale values
    *        forever (adds are caught by the merge-side drift guard; drops
    *        are indistinguishable from TOAST-unchanged there). Seeding the
    *        EXPECTATION makes the very first 'R' of any decoder generation
    *        raise on drop, add, or rename — and on a TYPE change, compared
    *        through [[PgTypes.toSpark]] (the representation both sides
    *        decode into; raw OIDs legitimately differ: wire carries array
    *        OIDs, introspection element OIDs). A wire OID that is neither
    *        in `typeIsArray` nor in [[PgTypes.mappedOids]] is
    *        UNVERIFIABLE (its Spark fallback is the catch-all string, so
    *        a mismatch there proves nothing) and skips the type check for
    *        that column only — never a false positive, and a genuine
    *        change to an unmapped type still fails loudly at decode time.
    *        Relations absent from the map are unguarded (the map is
    *        strict-name-keyed; a schemaless-introspected relation has
    *        qualified name ".t" and simply never matches). */
  final class Decoder(typeIsArray: Map[Int, Boolean] = Map.empty,
      notNullIdentity: Map[String, Set[String]] = Map.empty,
      expectedColumns: Map[String, Seq[(String, org.apache.spark.sql.types.DataType)]] = Map.empty) {
    private val relations = mutable.Map.empty[Int, Relation]
    private var openXid: Option[Long] = None
    private var txnLsn: Long = 0L
    private var seq: Int = 0

    /** Relation cache view (relation OID → schema), for the sync layer. */
    def relationFor(relId: Int): Option[Relation] = relations.get(relId)

    /** Decode one frame; 0..n messages (metadata frames emit none). */
    def feed(frame: Array[Byte]): Seq[WalMessage] = {
      val buf = ByteBuffer.wrap(frame).order(ByteOrder.BIG_ENDIAN)
      val msgType = buf.get().toChar
      msgType match {
        case 'B' =>
          val finalLsn = buf.getLong()
          buf.getLong() // commit timestamp (µs since 2000-01-01), unused
          val xid = buf.getInt().toLong & 0xFFFFFFFFL
          openXid = Some(xid)
          txnLsn = finalLsn
          seq = 0
          Seq(WalMessage(xid, seq, "BEGIN", finalLsn, "",
            Map.empty, Map.empty, Nil, Nil, rekey = false))
        case 'C' =>
          val xid = requireTxn("commit")
          buf.get() // flags (unused, must be 0)
          val commitLsn = buf.getLong()
          buf.getLong() // end LSN
          buf.getLong() // commit timestamp
          // message_accumulator.go:70-72 — a commit whose LSN disagrees
          // with its begin means frames were lost in between
          if (txnLsn > 0 && txnLsn != commitLsn)
            throw new IllegalStateException(
              s"commit LSN $commitLsn != begin LSN $txnLsn: messages are lost")
          openXid = None
          Seq(WalMessage(xid, Int.MaxValue, "COMMIT", commitLsn, "",
            Map.empty, Map.empty, Nil, Nil, rekey = false))
        case 'R' =>
          requireTxn("relation")
          val relId = buf.getInt()
          val namespace = cString(buf)
          val relName = cString(buf)
          val replident = buf.get().toChar // 'd' default | 'n' nothing | 'f' full | 'i' index
          val nCols = buf.getShort().toInt
          val cols = (0 until nCols).map { _ =>
            val flags = buf.get()
            val name = cString(buf)
            val typeOid = buf.getInt()
            buf.getInt() // type modifier
            RelColumn(name, typeOid, isIdentity = flags == 1,
              isArray = typeIsArray.getOrElse(typeOid, false))
          }
          // REPLICA IDENTITY FULL is the only setting whose identity
          // columns can legally hold NULL (PK/unique-index identities are
          // NOT NULL by the database's rules); the wire doesn't carry
          // nullability, so only introspection can prove a FULL identity
          // column NOT NULL — unproven columns force the null-safe join
          val nullableId = replident == 'f' && {
            val known = notNullIdentity.getOrElse(s"$namespace.$relName", Set.empty)
            cols.exists(c => c.isIdentity && !known.contains(c.name))
          }
          val rel = Relation(namespace, relName, cols, nullableIdentity = nullableId)
          if (rel.identityColumns.isEmpty)
            throw new IllegalStateException(s"relation has no identity columns: $relName")
          // configured-shape guard: unlike the cache compare below, this
          // fires on the FIRST announcement of a fresh decoder generation
          // too — the only window where a column DROP could slip through
          expectedColumns.get(rel.qualifiedName).foreach { expected =>
            val announced = cols.map(_.name)
            if (announced != expected.map(_._1))
              throw new SchemaChangedException(
                s"relation ${rel.qualifiedName} announced columns " +
                  s"(${announced.mkString(", ")}) != configured " +
                  s"(${expected.map(_._1).mkString(", ")}): schema changed at the source")
            // same names, changed type: only verifiable wire OIDs compare
            // (an OID outside typeIsArray ∪ mappedOids maps to the
            // catch-all string fallback, which proves nothing)
            cols.zip(expected).foreach { case (c, (name, expType)) =>
              val verifiable = c.isArray || PgTypes.mappedOids.contains(c.pgOid)
              val wireType = PgTypes.toSpark(c.pgOid, c.isArray, PgTypes.NumericAnsi)
              if (verifiable && wireType != expType)
                throw new SchemaChangedException(
                  s"relation ${rel.qualifiedName} column $name announced as " +
                    s"$wireType (oid ${c.pgOid}) != configured $expType: " +
                    "type changed at the source")
            }
          }
          relations.get(relId) match {
            case Some(prev) if !prev.equalsSchema(rel) =>
              // the sync layer's supervisor reacts with drop + resync,
              // exactly as the reference treats ErrRelationChanged
              throw new SchemaChangedException(
                s"relation changed: ${rel.qualifiedName} (oid $relId)")
            case _ => relations.update(relId, rel)
          }
          Nil
        case 'I' =>
          val xid = requireTxn("insert")
          val rel = lookupRel(buf.getInt())
          require(buf.get().toChar == 'N', "insert frame missing new tuple")
          val tuple = readTuple(buf)
          seq += 1
          // identity from the new values (message_accumulator.go:228-235)
          Seq(dml(xid, "INSERT", rel, keyFromCells(rel, tuple), tuple, rekey = false))
        case 'U' =>
          val xid = requireTxn("update")
          val rel = lookupRel(buf.getInt())
          var oldType: Char = 0
          var oldTuple: Option[Tuple] = None
          var marker = buf.get().toChar
          if (marker == 'K' || marker == 'O') {
            oldType = marker
            oldTuple = Some(readTuple(buf))
            marker = buf.get().toChar
          }
          require(marker == 'N', "update frame missing new tuple")
          val newTuple = readTuple(buf)
          seq += 1
          // 'K' = the key changed → identity-before comes from the old
          // tuple and the action re-keys; 'O' (REPLICA IDENTITY FULL old
          // row) and absent both mean identity unchanged → identity from
          // the new values (message_accumulator.go:162-166, 244-272)
          val rekey = oldType == 'K'
          val key = if (rekey) keyFromCells(rel, oldTuple.get)
                    else keyFromCells(rel, newTuple)
          Seq(dml(xid, "UPDATE", rel, key, newTuple, rekey))
        case 'D' =>
          val xid = requireTxn("delete")
          val rel = lookupRel(buf.getInt())
          val marker = buf.get().toChar
          require(marker == 'K' || marker == 'O', "delete frame missing old tuple")
          val tuple = readTuple(buf)
          seq += 1
          // deletes carry only the identity; no new values
          // (message_accumulator.go:236-243)
          Seq(WalMessage(xid, seq, "DELETE", 0L, rel.table,
            keyFromCells(rel, tuple), Map.empty, Nil, Nil, rekey = false))
        case 'T' =>
          val xid = requireTxn("truncate")
          val nRels = buf.getInt()
          buf.get() // options (CASCADE/RESTART IDENTITY)
          (0 until nRels).map { _ =>
            val rel = lookupRel(buf.getInt())
            seq += 1
            // surfaced as a message so transaction assembly rejects the
            // batch (the reference errors: "truncate message not
            // implemented", message_accumulator.go:197-198)
            WalMessage(xid, seq, "TRUNCATE", 0L, rel.table,
              Map.empty, Map.empty, Nil, Nil, rekey = false)
          }
        case 'O' | 'Y' | 'M' => Nil // origin / type / decoding message: metadata
        case other =>
          throw new IllegalArgumentException(s"unknown message type '$other'")
      }
    }

    private def requireTxn(what: String): Long =
      openXid.getOrElse(throw new IllegalStateException(
        s"$what outside a transaction: messages are lost"))

    private def lookupRel(relId: Int): Relation =
      relations.getOrElse(relId, throw new IllegalStateException(
        s"relation not found: oid $relId (no Relation message seen)"))

    /** Identity columns → text values, from a tuple's cells. The reference
      * takes the Value pointers whatever they hold (db.go:150-158 TODO:s
      * NULL/unchanged identity values); here a NULL identity cell is
      * simply absent from the map. */
    private def keyFromCells(rel: Relation, t: Tuple): Map[String, String] =
      rel.columns.zip(t.cells).collect {
        case (c, CellText(v)) if c.isIdentity => c.name -> v
      }.toMap

    private def dml(xid: Long, msgType: String, rel: Relation,
        key: Map[String, String], t: Tuple, rekey: Boolean): WalMessage = {
      val named = rel.columns.zip(t.cells)
      WalMessage(xid, seq, msgType, 0L, rel.table,
        key,
        named.collect { case (c, CellText(v)) => c.name -> v }.toMap,
        named.collect { case (c, CellNull) => c.name },
        named.collect { case (c, CellUnchanged) => c.name },
        rekey)
    }

    private def readTuple(buf: ByteBuffer): Tuple = {
      val n = buf.getShort().toInt
      Tuple((0 until n).map { _ =>
        buf.get().toChar match {
          case 'n' => CellNull
          case 'u' => CellUnchanged
          case 't' =>
            val len = buf.getInt()
            val bytes = new Array[Byte](len)
            buf.get(bytes)
            CellText(new String(bytes, UTF_8))
          case 'b' =>
            throw new IllegalArgumentException(
              "binary-format tuple cell: stream must be requested in text format")
          case other =>
            throw new IllegalArgumentException(s"unknown tuple cell type '$other'")
        }
      })
    }

    private def cString(buf: ByteBuffer): String = {
      val sb = new java.io.ByteArrayOutputStream()
      var b = buf.get()
      while (b != 0) { sb.write(b.toInt); b = buf.get() }
      new String(sb.toByteArray, UTF_8)
    }
  }

  /** Decode an ordered, self-contained frame stream with a fresh decoder. */
  def decode(frames: IterableOnce[Array[Byte]],
      typeIsArray: Map[Int, Boolean] = Map.empty,
      notNullIdentity: Map[String, Set[String]] = Map.empty): Iterator[WalMessage] = {
    val d = new Decoder(typeIsArray, notNullIdentity)
    frames.iterator.flatMap(d.feed)
  }

  // ---------------------------------------------------------------------
  // Frame ENCODER — the inverse wire format, for offline golden fixtures
  // and deterministic replay (no live Postgres ships in this environment;
  // the protocol is symmetric enough that encoding is ~60 lines). The
  // decoder spec ALSO checks hand-written raw byte frames so the pair
  // can't drift from the spec together unnoticed.
  // ---------------------------------------------------------------------

  private val Pg2000EpochMicros = 946684800000000L // 2000-01-01 vs unix, µs

  /** Unix micros → pgoutput timestamp (µs since 2000-01-01). */
  def toPgMicros(unixMicros: Long): Long = unixMicros - Pg2000EpochMicros

  def encodeBegin(finalLsn: Long, commitTimePgMicros: Long, xid: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 8 + 8 + 4).order(ByteOrder.BIG_ENDIAN)
    b.put('B'.toByte).putLong(finalLsn).putLong(commitTimePgMicros).putInt(xid.toInt)
    b.array()
  }

  def encodeCommit(commitLsn: Long, endLsn: Long, commitTimePgMicros: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 1 + 8 + 8 + 8).order(ByteOrder.BIG_ENDIAN)
    b.put('C'.toByte).put(0.toByte).putLong(commitLsn).putLong(endLsn)
      .putLong(commitTimePgMicros)
    b.array()
  }

  def encodeRelation(relId: Int, rel: Relation, replicaIdentity: Char = 'd'): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('R'.toInt)
    writeInt(out, relId)
    writeCString(out, rel.schema)
    writeCString(out, rel.table)
    out.write(replicaIdentity.toInt)
    writeShort(out, rel.columns.size)
    rel.columns.foreach { c =>
      out.write(if (c.isIdentity) 1 else 0)
      writeCString(out, c.name)
      writeInt(out, c.pgOid)
      writeInt(out, -1) // type modifier
    }
    out.toByteArray
  }

  def encodeInsert(relId: Int, cells: Seq[Cell]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'.toInt)
    writeInt(out, relId)
    out.write('N'.toInt)
    writeTuple(out, cells)
    out.toByteArray
  }

  /** @param old optional (submessage type 'K'|'O', old tuple) */
  def encodeUpdate(relId: Int, old: Option[(Char, Seq[Cell])],
      newCells: Seq[Cell]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('U'.toInt)
    writeInt(out, relId)
    old.foreach { case (t, cells) =>
      out.write(t.toInt)
      writeTuple(out, cells)
    }
    out.write('N'.toInt)
    writeTuple(out, newCells)
    out.toByteArray
  }

  def encodeDelete(relId: Int, keyType: Char, cells: Seq[Cell]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('D'.toInt)
    writeInt(out, relId)
    out.write(keyType.toInt)
    writeTuple(out, cells)
    out.toByteArray
  }

  def encodeTruncate(relIds: Seq[Int], options: Byte = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('T'.toInt)
    writeInt(out, relIds.size)
    out.write(options.toInt)
    relIds.foreach(writeInt(out, _))
    out.toByteArray
  }

  private def writeTuple(out: java.io.ByteArrayOutputStream, cells: Seq[Cell]): Unit = {
    writeShort(out, cells.size)
    cells.foreach {
      case CellNull      => out.write('n'.toInt)
      case CellUnchanged => out.write('u'.toInt)
      case CellText(v) =>
        out.write('t'.toInt)
        val bytes = v.getBytes(UTF_8)
        writeInt(out, bytes.length)
        out.write(bytes, 0, bytes.length)
    }
  }

  private def writeCString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val bytes = s.getBytes(UTF_8)
    out.write(bytes, 0, bytes.length)
    out.write(0)
  }

  private def writeShort(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }
}
