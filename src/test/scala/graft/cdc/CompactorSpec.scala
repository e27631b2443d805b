package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark

class CompactorSpec extends AnyFunSuite with Matchers {

  /** Deterministic scalacheck sampling (scalatestplus bridge not on the
    * classpath — offline build). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def act(lsn: Long, op: String, key: String, v: String = null,
      nulls: Seq[String] = Nil, unchanged: Seq[String] = Nil,
      newKey: String = null, table: String = "t"): ChangeAction = {
    val rekey = newKey != null && newKey != key
    val values = Option(v).map(x => Map("val" -> x)).getOrElse(Map.empty[String, String]) ++
      (if (rekey) Map("id" -> newKey) else if (op != "D") Map("id" -> key) else Map.empty)
    ChangeAction(table, lsn, 0, op, Map("id" -> key), values, nulls, unchanged, rekey)
  }

  // ---- mergeActions pair table (multi_row_action.go:103-180) ----

  test("insert then update → insert with update's values") {
    val m = ChangelogCompactor.mergeActions(
      act(1, "I", "k", "a"), act(2, "U", "k", "b")).get
    m.op shouldBe "I"
    m.values("val") shouldBe "b"
  }

  test("insert then delete → elided") {
    ChangelogCompactor.mergeActions(act(1, "I", "k", "a"), act(2, "D", "k")) shouldBe None
  }

  test("update then update → update, TOAST-unchanged inherits prior value") {
    val m = ChangelogCompactor.mergeActions(
      act(1, "U", "k", "a"), act(2, "U", "k", unchanged = Seq("val"))).get
    m.op shouldBe "U"
    m.values("val") shouldBe "a" // flowed through the unchanged mask
    m.unchanged should not contain "val"
  }

  test("update then delete → delete") {
    val m = ChangelogCompactor.mergeActions(act(1, "U", "k", "a"), act(2, "D", "k")).get
    m.op shouldBe "D"
  }

  test("rekeying update then delete → delete targets the original identity") {
    val m = ChangelogCompactor.mergeActions(
      act(1, "U", "k1", "a", newKey = "k2"), act(2, "D", "k2")).get
    m.op shouldBe "D"
    m.keyBefore shouldBe Map("id" -> "k1")
  }

  test("delete then insert → update") {
    val m = ChangelogCompactor.mergeActions(act(1, "D", "k"), act(2, "I", "k", "z")).get
    m.op shouldBe "U"
    m.values("val") shouldBe "z"
  }

  test("invalid pairs throw (insert,insert / delete,delete / delete,update)") {
    an[IllegalStateException] should be thrownBy
      ChangelogCompactor.mergeActions(act(1, "I", "k", "a"), act(2, "I", "k", "b"))
    an[IllegalStateException] should be thrownBy
      ChangelogCompactor.mergeActions(act(1, "D", "k"), act(2, "D", "k"))
    an[IllegalStateException] should be thrownBy
      ChangelogCompactor.mergeActions(act(1, "D", "k"), act(2, "U", "k", "b"))
  }

  // ---- sequential algorithm: chains ----

  test("rekey chain k1→k2→k3 resolves to one action") {
    val out = ChangelogCompactor.sequentialDedup(Seq(
      act(1, "U", "k1", "a", newKey = "k2"),
      act(2, "U", "k2", "b", newKey = "k3")))
    out should have size 1
    out.head.keyBefore shouldBe Map("id" -> "k1")
    out.head.keyAfter shouldBe Map("id" -> "k3")
    out.head.values("val") shouldBe "b"
  }

  test("rekey frees the old identity for a fresh insert") {
    val out = ChangelogCompactor.sequentialDedup(Seq(
      act(1, "U", "k1", "a", newKey = "k2"),
      act(2, "I", "k1", "fresh")))
    out.map(a => ChangelogCompactor.keyStr(a.keyAfter)).toSet should have size 2
  }

  test("a rekey setting an identity column to explicit NULL lands at the NULL identity") {
    // REPLICA IDENTITY FULL: a nullable identity column set to NULL puts
    // the column in `nulls`, not `values` — keyAfter must follow it there
    // (the key model admits null values; keeping the OLD value would
    // address the row at an identity it no longer has)
    val a = ChangeAction("t", 1, 0, "U", Map("id" -> "k1"),
      Map.empty, nulls = Seq("id"), unchanged = Nil, rekey = true)
    a.keyAfter shouldBe Map("id" -> null)
    // and the chain logic keys on it correctly
    val out = ChangelogCompactor.sequentialDedup(Seq(
      a,
      ChangeAction("t", 2, 0, "U", Map("id" -> null),
        Map("val" -> "x"), Nil, Nil, rekey = false)))
    out should have size 1
    out.head.keyBefore shouldBe Map("id" -> "k1")
    out.head.values("val") shouldBe "x"
  }

  test("rekey into a deleted identity keeps the displaced delete") {
    // D(k2) then U(k1→k2): the rekey's entry lands on the dead identity's
    // map slot — silently overwriting would drop the delete and the
    // target would keep BOTH the old k2 row and the moved one
    val out = ChangelogCompactor.sequentialDedup(Seq(
      act(1, "D", "k2"),
      act(2, "U", "k1", "a", newKey = "k2")))
    out should have size 2
    val d = out.find(_.op == "D").get
    d.keyBefore shouldBe Map("id" -> "k2")
    val u = out.find(_.op == "U").get
    u.keyBefore shouldBe Map("id" -> "k1")
    u.keyAfter shouldBe Map("id" -> "k2")
  }

  // ---- distributed ≡ sequential (property) ----

  /** Generate a valid interleaved WAL stream over `nKeys` logical rows,
    * tracking liveness so op sequences are valid, with occasional rekeys
    * and TOAST-unchanged columns. */
  private def genStream(nKeys: Int, len: Int, withRekey: Boolean): Gen[List[ChangeAction]] = {
    def step(live: Set[String], vacant: Set[String], lsn: Long,
        acc: List[ChangeAction]): Gen[List[ChangeAction]] =
      if (lsn > len) Gen.const(acc.reverse)
      else {
        val choices: Seq[Gen[(ChangeAction, Set[String], Set[String])]] =
          (if (vacant.nonEmpty)
            Seq(Gen.oneOf(vacant.toSeq).map(k =>
              (act(lsn, "I", k, s"v$lsn"), live + k, vacant - k))) else Nil) ++
          (if (live.nonEmpty) Seq(
            Gen.oneOf(live.toSeq).flatMap(k =>
              // value state of "val": plain / TOAST-unchanged / explicit NULL
              Gen.oneOf[(Seq[String], Seq[String], String)](
                (Nil, Nil, s"v$lsn"), (Seq("val"), Nil, null), (Nil, Seq("val"), null))
                .map { case (unch, nul, v) =>
                  (act(lsn, "U", k, v, nulls = nul, unchanged = unch), live, vacant)
                }),
            Gen.oneOf(live.toSeq).map(k =>
              (act(lsn, "D", k), live - k, vacant + k))) else Nil) ++
          (if (withRekey && live.nonEmpty && vacant.nonEmpty)
            Seq(for { k <- Gen.oneOf(live.toSeq); nk <- Gen.oneOf(vacant.toSeq) } yield
              (act(lsn, "U", k, s"v$lsn", newKey = nk), live - k + nk, vacant - nk + k))
          else Nil)
        Gen.oneOf(choices(0), choices(choices.size - 1), choices: _*).flatMap {
          case (a, l2, v2) => step(l2, v2, lsn + 1, a :: acc)
        }
      }
    step(Set.empty, (1 to nKeys).map(i => s"k$i").toSet, 1, Nil)
  }

  private def norm(a: ChangeAction): (String, String, Map[String, String], Set[String], Set[String], String) =
    (a.op, ChangelogCompactor.keyStr(a.keyBefore), a.values, a.nulls.toSet,
      a.unchanged.toSet, ChangelogCompactor.keyStr(a.keyAfter))

  test("distributed compact ≡ reference sequential dedup (no rekeys)") {
    val spark = TestSpark.spark
    import spark.implicits._
    samples(genStream(6, 40, withRekey = false), 12).foreach { stream =>
      val expected = ChangelogCompactor.sequentialDedup(stream).map(norm).toSet
      val got = ChangelogCompactor.compact(stream.toDS()).collect().map(norm).toSet
      got shouldBe expected
    }
  }

  test("distributed compact ≡ reference sequential dedup (with rekey chains)") {
    val spark = TestSpark.spark
    import spark.implicits._
    samples(genStream(5, 30, withRekey = true), 8).foreach { stream =>
      val expected = ChangelogCompactor.sequentialDedup(stream).map(norm).toSet
      val got = ChangelogCompactor.compact(stream.toDS()).collect().map(norm).toSet
      got shouldBe expected
    }
  }

  test("hot-key overflow degrades to per-table sequential, never truncates") {
    val spark = TestSpark.spark
    import spark.implicits._
    // maxHotKeys=1 forces the overflow branch on any stream with ≥1 rekey
    // (each rekey contributes 2 endpoints); mix in a rekey-free table that
    // must still take the distributed cold path.
    samples(genStream(5, 30, withRekey = true), 5).foreach { stream =>
      // a valid per-key I/U stream for a second, rekey-free table: first
      // touch of each id is an insert, later touches are updates
      val seen = scala.collection.mutable.Set.empty[String]
      val otherValid = stream.zipWithIndex.map { case (a, i) =>
        val id = (i % 3).toString
        val op = if (seen.add(id)) "I" else "U"
        ChangeAction("other", a.lsn, a.seq, op, Map("id" -> id),
          Map("id" -> id, "val" -> s"x$i"), Nil, Nil, rekey = false)
      }
      val all = stream ++ otherValid
      val expected = (ChangelogCompactor.sequentialDedup(stream) ++
        ChangelogCompactor.sequentialDedup(otherValid)).map(norm).toSet
      val got = ChangelogCompactor.compact(all.toDS(), maxHotKeys = 1)
        .collect().map(norm).toSet
      got shouldBe expected
    }
  }

  test("compacted actions touch independent rows (non-delete after-keys unique)") {
    val spark = TestSpark.spark
    import spark.implicits._
    samples(genStream(5, 30, withRekey = true), 5).foreach { stream =>
      val got = ChangelogCompactor.compact(stream.toDS()).collect()
      // a dead-identity-reuse pair (displaced D + rekey-in) legitimately
      // shares an after-key; at most one NON-DELETE action may claim it
      val nonDel = got.filterNot(_.op == "D").map(a => ChangelogCompactor.keyStr(a.keyAfter))
      nonDel.toSet.size shouldBe nonDel.length
    }
  }

  // ---- END-TO-END semantics: compact + MERGE ≡ sequential row model ----

  /** Sequential truth: fold the raw stream row-by-row into (id → val). */
  private def rowModel(stream: Seq[ChangeAction]): Map[String, Option[String]] = {
    val st = scala.collection.mutable.LinkedHashMap.empty[String, Option[String]]
    stream.sortBy(a => (a.lsn, a.seq)).foreach { a =>
      val k = a.keyBefore("id")
      def newVal(old: Option[String]): Option[String] =
        if (a.unchanged.contains("val")) old
        else if (a.nulls.contains("val")) None
        else a.values.get("val").orElse(old)
      a.op match {
        case "I" => st(k) = newVal(None)
        case "U" =>
          val old: Option[String] = st.remove(k).getOrElse(None)
          st(a.keyAfter("id")) = newVal(old)
        case "D" => st.remove(k)
      }
    }
    st.toMap
  }

  private val relT = Relation("public", "t", Seq(
    RelColumn("id", PgTypes.TextOid, isIdentity = true),
    RelColumn("val", PgTypes.TextOid)))

  private def mergedRows(batches: Seq[Seq[ChangeAction]],
      regime: Option[Boolean] = None): Map[String, Option[String]] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val schema = relT.toStructType
    var snap = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    batches.foreach { b =>
      val compacted = ChangelogCompactor.compact(b.toDS())
      snap = (regime match {
        case Some(r) => MergeInto(snap, compacted, relT, broadcastChangelog = r)
        case None    => MergeInto(snap, compacted, relT)
      }).localCheckpoint(true)
    }
    snap.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
  }

  test("compact + MERGE over a full valid stream ≡ sequential row model (incl. rekeys)") {
    // THE semantic gate for the whole compaction+merge pipeline: whatever
    // the fold emits, applying it must land the same final table as
    // playing the raw stream row-by-row — including rekey chains and
    // dead-identity reuse (a displaced delete plus a rekey-in sharing an
    // after-key must net exactly one surviving row)
    samples(genStream(5, 30, withRekey = true), 6).foreach { stream =>
      mergedRows(Seq(stream)) shouldBe rowModel(stream)
    }
  }

  test("compact + MERGE applied in split batches ≡ sequential row model") {
    // the production incremental shape: the same stream cut into two
    // micro-batches at an arbitrary boundary must converge identically
    // (chains and reuse pairs SPLIT across the cut)
    samples(genStream(5, 30, withRekey = true), 4).foreach { stream =>
      val sorted = stream.sortBy(a => (a.lsn, a.seq))
      val cut = sorted.size / 2
      mergedRows(Seq(sorted.take(cut), sorted.drop(cut))) shouldBe rowModel(stream)
    }
  }

  test("big-batch regime ≡ row model on reuse-heavy compacted streams") {
    // the sort-merge regime must apply a (displaced-D, rekey-in) pair
    // sharing an after-key exactly like the broadcast regime does
    samples(genStream(5, 30, withRekey = true), 3).foreach { stream =>
      mergedRows(Seq(stream), regime = Some(false)) shouldBe rowModel(stream)
    }
  }

  test("columnar shuffle key renders identically to the Scala keyStr") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // adversarial identities: framing chars in keys/values, null values,
    // escape char itself, multi-entry maps in shuffled entry order
    val maps: Seq[Map[String, String]] = Seq(
      Map("a" -> "x"),
      Map("a" -> "x\u0002b\u0001y"), // the forgery shape
      Map("a" -> "x", "b" -> "y"),
      Map("b" -> "y", "a" -> "x"),
      Map("k" -> null),
      Map("k" -> "\u0000n"), // collides with the null marker pre-escape
      Map("z" -> "1", "a" -> "\u0000", "m" -> "\u0001\u0002"),
      Map.empty[String, String])
    val fromKernel = maps.map(m => Tuple1(m)).toDF("m")
      .select(CompactKeys.keyStrCol(col("m"))).as[String].collect()
    val fromScala = maps.map(ChangelogCompactor.keyStr)
    fromKernel.toSeq shouldBe fromScala
    // and injectivity holds across the adversarial set
    fromScala.distinct.size shouldBe maps.map(_.toSeq.sortBy(_._1)).distinct.size
  }
}
