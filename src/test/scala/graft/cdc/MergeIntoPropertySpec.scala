package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark

/** Property test: MergeInto over random snapshots and random compacted
  * action sets equals an in-memory reference model of the MERGE template
  * (snowflake_target.go:536-566): matched+delete → remove; matched →
  * per-column unchanged/null/new CASE; not-matched (non-delete) → insert.
  */
class MergeIntoPropertySpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rel = Relation("public", "t", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("a", PgTypes.TextOid),
    RelColumn("b", PgTypes.Int4Oid)))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  private case class SnapRow(id: Long, a: Option[String], b: Option[Int])

  private val genSnap: Gen[Seq[SnapRow]] = for {
    n <- Gen.choose(0, 12)
    ids <- Gen.pick(n, 1L to 20L)
    rows <- Gen.sequence[Seq[SnapRow], SnapRow](ids.toSeq.map(id => for {
      a <- Gen.option(Gen.alphaStr.map(_.take(4)))
      b <- Gen.option(Gen.choose(0, 99))
    } yield SnapRow(id, a, b)))
  } yield rows

  /** Compacted action set: at most one action per key (post-compaction
    * invariant), no rekeys (covered by CompactorSpec). */
  private val genActions: Gen[Seq[ChangeAction]] = for {
    n <- Gen.choose(0, 12)
    ids <- Gen.pick(n, 1L to 25L)
    acts <- Gen.sequence[Seq[ChangeAction], ChangeAction](ids.toSeq.map(id => for {
      op <- Gen.oneOf("I", "U", "D")
      aState <- Gen.oneOf("value", "null", "unchanged", "absent")
      aVal <- Gen.alphaStr.map(_.take(4))
      bState <- Gen.oneOf("value", "null")
      bVal <- Gen.choose(0, 99)
    } yield {
      if (op == "D")
        ChangeAction("t", id, 0, "D", Map("id" -> id.toString), Map.empty, Nil, Nil, false)
      else {
        val values = Map("id" -> id.toString) ++
          (if (aState == "value") Map("a" -> aVal) else Map.empty) ++
          (if (bState == "value") Map("b" -> bVal.toString) else Map.empty)
        ChangeAction("t", id, 0, op, Map("id" -> id.toString), values,
          nulls = (if (aState == "null") Seq("a") else Nil) ++
            (if (bState == "null") Seq("b") else Nil),
          unchanged = if (aState == "unchanged") Seq("a") else Nil,
          rekey = false)
      }
    }))
  } yield acts

  /** The reference MERGE, row-at-a-time. */
  private def referenceMerge(snap: Seq[SnapRow], acts: Seq[ChangeAction]): Set[SnapRow] = {
    val byKey = acts.map(a => a.keyBefore("id").toLong -> a).toMap
    val kept = snap.flatMap { row =>
      byKey.get(row.id) match {
        case Some(a) if a.op == "D" => None
        case Some(a) =>
          def colVal[T](name: String, cur: Option[T], parse: String => T): Option[T] =
            if (a.unchanged.contains(name)) cur
            else if (a.nulls.contains(name)) None
            else a.values.get(name).map(parse).orElse(cur)
          Some(SnapRow(row.id,
            colVal("a", row.a, identity),
            colVal("b", row.b, _.toInt)))
        case None => Some(row)
      }
    }
    val inserts = byKey.collect {
      case (id, a) if a.op != "D" && !snap.exists(_.id == id) =>
        SnapRow(id,
          if (a.nulls.contains("a") || a.unchanged.contains("a")) None else a.values.get("a"),
          if (a.nulls.contains("b") || a.unchanged.contains("b")) None else a.values.get("b").map(_.toInt))
    }
    (kept ++ inserts).toSet
  }

  test("MergeInto ≡ reference MERGE template on random snapshots and batches") {
    samples(Gen.zip(genSnap, genActions), 25).foreach { case (snap, acts) =>
      val snapDf = snap.map(r => (r.id, r.a.orNull, r.b.map(Integer.valueOf).orNull))
        .toDF("id", "a", "b")
      val got = MergeInto(snapDf, acts.toDS(), rel)
        .collect()
        .map(r => SnapRow(r.getLong(0), Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getInt(2))))
        .toSet
      got shouldBe referenceMerge(snap, acts)
    }
  }

  test("big-batch full-outer regime ≡ broadcast regime ≡ reference, row-for-row") {
    samples(Gen.zip(genSnap, genActions), 25).foreach { case (snap, acts) =>
      val snapDf = snap.map(r => (r.id, r.a.orNull, r.b.map(Integer.valueOf).orNull))
        .toDF("id", "a", "b")
      def run(pin: Boolean) = MergeInto(snapDf, acts.toDS(), rel, broadcastChangelog = pin)
        .collect()
        .map(r => SnapRow(r.getLong(0), Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getInt(2))))
        .toSet
      val expected = referenceMerge(snap, acts)
      run(false) shouldBe expected
      run(true) shouldBe expected
    }
  }
}
