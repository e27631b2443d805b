package graft.cdc

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.StreamingMerge

/** The delta-store regime's semantic gate: per-batch delta append +
  * threshold-triggered fold must land EXACTLY the table the full-rewrite
  * path lands, which in turn equals playing the raw stream row-by-row —
  * across rekeys, TOAST-unchanged, dead-identity reuse, and the regime's
  * own crash shapes (orphan replayed deltas, interrupted compaction). */
class DeltaStoreSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val relT = Relation("public", "t", Seq(
    RelColumn("id", PgTypes.TextOid, isIdentity = true),
    RelColumn("val", PgTypes.TextOid)))

  private def act(lsn: Long, op: String, key: String, v: String = null,
      nulls: Seq[String] = Nil, unchanged: Seq[String] = Nil,
      newKey: String = null): ChangeAction = {
    val rekey = newKey != null && newKey != key
    val values = Option(v).map(x => Map("val" -> x)).getOrElse(Map.empty[String, String]) ++
      (if (rekey) Map("id" -> newKey) else if (op != "D") Map("id" -> key) else Map.empty)
    ChangeAction("t", lsn, 0, op, Map("id" -> key), values, nulls, unchanged, rekey)
  }

  /** Sequential truth (the CompactorSpec row model). */
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

  /** Valid interleaved stream with rekeys and TOAST-unchanged (ported
    * from CompactorSpec's generator; liveness-tracked so op sequences
    * stay legal across batch splits). */
  private def genStream(nKeys: Int, len: Int): Gen[List[ChangeAction]] = {
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
              Gen.oneOf[(Seq[String], Seq[String], String)](
                (Nil, Nil, s"v$lsn"), (Seq("val"), Nil, null), (Nil, Seq("val"), null))
                .map { case (unch, nul, v) =>
                  (act(lsn, "U", k, v, nulls = nul, unchanged = unch), live, vacant)
                }),
            Gen.oneOf(live.toSeq).map(k =>
              (act(lsn, "D", k), live - k, vacant + k))) else Nil) ++
          (if (live.nonEmpty && vacant.nonEmpty)
            Seq(for { k <- Gen.oneOf(live.toSeq); nk <- Gen.oneOf(vacant.toSeq) } yield
              (act(lsn, "U", k, s"v$lsn", newKey = nk), live - k + nk, vacant - nk + k))
          else Nil)
        Gen.oneOf(choices(0), choices(choices.size - 1), choices: _*).flatMap {
          case (a, l2, v2) => step(l2, v2, lsn + 1, a :: acc)
        }
      }
    step(Set.empty, (1 to nKeys).map(i => s"k$i").toSet, 1, Nil)
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(100L + i)))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-delta").toString

  private def readRows(base: String): Map[String, Option[String]] =
    DeltaStore.read(spark, base, relT).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap

  /** Drive batches through a StreamingMerge in the given store regime. */
  private def runBatches(batches: Seq[Seq[ChangeAction]], base: String,
      delta: Boolean, compactRows: Long = Long.MaxValue,
      compactFiles: Int = Int.MaxValue): Unit = {
    val sm = new StreamingMerge(spark, base, Seq(relT), s"$base/_log",
      deltaStore = delta, deltaCompactRows = compactRows,
      deltaCompactFiles = compactFiles)
    batches.zipWithIndex.foreach { case (b, i) => sm.applyBatch(b.toDS(), i.toLong) }
  }

  test("delta regime ≡ full-rewrite regime ≡ sequential model " +
      "(rekeys, TOAST-unchanged, dead-identity reuse; fold pending and folded)") {
    samples(genStream(nKeys = 6, len = 36), 4).foreach { stream =>
      val batches = stream.grouped(9).toSeq
      val expected = rowModel(stream)

      val full = tmp(); runBatches(batches, full, delta = false)
      readRows(full) shouldBe expected

      // deltas left PENDING at read time (no fold ever triggers)
      val pending = tmp(); runBatches(batches, pending, delta = true)
      // first batch publishes the base; the rest must be actual deltas
      DeltaStore.listDeltas(spark, pending, "t").size shouldBe batches.size - 1
      readRows(pending) shouldBe expected

      // fold after every batch (threshold 0): deltas drained into the base
      val folded = tmp(); runBatches(batches, folded, delta = true, compactRows = 0L)
      DeltaStore.listDeltas(spark, folded, "t") shouldBe empty
      readRows(folded) shouldBe expected
      // and the BASE alone carries the state (plain readers see it)
      spark.read.parquet(SnapshotWriter.livePath(folded, "t"))
        .collect().map(r => r.getString(0) -> Option(r.getString(1)))
        .toMap shouldBe expected
    }
  }

  test("plain parquet readers see the base alone; DeltaStore.read folds " +
      "pending deltas on top") {
    val base = tmp()
    runBatches(Seq(
      Seq(act(1, "I", "k1", "a"), act(2, "I", "k2", "b")),
      Seq(act(3, "U", "k1", "a2"), act(4, "D", "k2"))), base, delta = true)
    spark.read.parquet(SnapshotWriter.livePath(base, "t"))
      .as[(String, String)].collect().toSet shouldBe Set("k1" -> "a", "k2" -> "b")
    readRows(base) shouldBe Map("k1" -> Some("a2"))
  }

  test("an orphan delta (crash before the marker write) dedups by WAL " +
      "position when a replayed super-batch re-appends it") {
    val base = tmp()
    // base published by the first batch
    runBatches(Seq(Seq(act(1, "I", "k1", "a"))), base, delta = true)
    val b2 = Seq(act(2, "U", "k1", "a2"), act(3, "I", "k2", "b"))
    // the orphan: delta landed, marker write never happened
    DeltaStore.append(b2.toDS(), base, "t", ackLsn = 3L) shouldBe true
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      SnapshotWriter.livePath(base, "t"), "_graft_applied"), false)
    // the replayed super-batch spans the orphan plus newer WAL
    val b3 = b2 ++ Seq(act(4, "U", "k2", "b2"))
    DeltaStore.append(b3.toDS(), base, "t", ackLsn = 4L) shouldBe true
    readRows(base) shouldBe Map("k1" -> Some("a2"), "k2" -> Some("b2"))
    // same-ack replay (identical batch) is a no-op
    DeltaStore.append(b3.toDS(), base, "t", ackLsn = 4L) shouldBe false
  }

  test("an interrupted compaction (stale incomplete scratch) is recovered " +
      "and a re-run converges") {
    val base = tmp()
    runBatches(Seq(
      Seq(act(1, "I", "k1", "a")),
      Seq(act(2, "U", "k1", "a2"))), base, delta = true)
    // crash mid-compaction: a scratch exists but never completed
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      SnapshotWriter.scratchPath(base, "t")))
    readRows(base) shouldBe Map("k1" -> Some("a2")) // recover drops the scratch
    DeltaStore.compact(spark, base, relT)
    DeltaStore.listDeltas(spark, base, "t") shouldBe empty
    readRows(base) shouldBe Map("k1" -> Some("a2"))
    // marker survived the fold at the max folded LSN
    SnapshotWriter.readAppliedMarker(spark, base, "t") shouldBe Some(2L)
  }

  test("deltastore with a jdbc: target is refused at config time") {
    intercept[IllegalArgumentException] {
      graft.SyncConfig(Seq(relT), "jdbc:derby:memory:x", "/tmp/ck",
        deltaStore = true).validate()
    }
    ()
  }

  test("a deltaStore=false run over a store with pending deltas folds " +
      "them, not loses them (config-flip data loss)") {
    // The full-rewrite path stages base⊕batch into scratch and swapLive
    // REMOVES the whole old live dir — including `_delta` dirs a prior
    // deltaStore=true run left pending. Their changes are already
    // acknowledged (commit log and marker at/above the delta LSNs) so
    // they never replay: before the DeltaStore.read fix the flip run
    // read the base alone and the deltas' effect vanished permanently.
    val base = tmp()
    runBatches(Seq(
      Seq(act(1, "I", "k1", "a"), act(2, "I", "k2", "b")), // publishes the base
      Seq(act(3, "U", "k1", "a2"), act(4, "I", "k3", "c")), // pending delta 1
      Seq(act(5, "D", "k2"))), base, delta = true)          // pending delta 2
    DeltaStore.listDeltas(spark, base, "t").size shouldBe 2
    // ops lowers deltastore=false and restarts: same store, same commit log
    runBatches(Seq(Seq(act(6, "U", "k3", "c2"))), base, delta = false)
    // batch ids restart at 0 after a restart — the LSN watermark, not the
    // batch counter, is what cut the replay; lsn=6 is fresh and applies
    val expected = Map("k1" -> Some("a2"), "k3" -> Some("c2"))
    readRows(base) shouldBe expected
    // the swap legitimately removed the folded deltas with the old live dir
    DeltaStore.listDeltas(spark, base, "t") shouldBe empty
    // and the BASE alone carries the full state for plain readers
    spark.read.parquet(SnapshotWriter.livePath(base, "t"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap shouldBe expected
  }

  test("the file-count threshold triggers a fold too") {
    val base = tmp()
    runBatches((1 to 5).map(i => Seq(act(i.toLong, if (i == 1) "I" else "U", "k1", s"v$i"))),
      base, delta = true, compactFiles = 2)
    DeltaStore.listDeltas(spark, base, "t").size should be <= 2
    readRows(base) shouldBe Map("k1" -> Some("v5"))
  }
}
