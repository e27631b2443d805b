package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{GraftSync, SyncConfig, TestSpark}
import graft.cdc._

/** Consistent-snapshot backfill coordination (sync_service.go:159-222).
  *
  * The pinned path is pure option-plumbing (no Postgres here), so its spec
  * is golden: every partition connection must carry the REPEATABLE READ +
  * SET TRANSACTION SNAPSHOT pin. The unpinned fallback is proven by
  * injection: writes land DURING the backfill so the copied frame is torn
  * (some rows pre-write, some post-write, an insert missed, a delete still
  * visible), and replaying the stream from the consistent point must
  * converge to exactly the oracle — no lost rows, no visible double-apply. */
class SnapshotBackfillSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rel = Relation("public", "accounts", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("balance", PgTypes.Float8Oid)))

  test("pinnedRead: every partition connection is pinned to the exported snapshot") {
    val conf = SnapshotBackfill.pinnedRead(
      "jdbc:postgresql://db/x", "accounts", "id",
      snapshotName = "00000003-0000002A-1", lower = 0L, upper = 1000000L,
      numPartitions = 8, properties = Map("user" -> "app"))
    val o = conf.options
    o("sessionInitStatement") shouldBe
      "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; " +
        "SET TRANSACTION SNAPSHOT '00000003-0000002A-1'"
    // the pin composes with partitioning and credentials, replacing neither
    o("partitionColumn") shouldBe "id"
    o("numPartitions") shouldBe "8"
    o("user") shouldBe "app"
  }

  test("snapshot names that could escape the SQL literal are rejected") {
    SnapshotBackfill.requireValidSnapshotName("00000003-00000002-1") shouldBe
      "00000003-00000002-1"
    an[IllegalArgumentException] should be thrownBy
      SnapshotBackfill.requireValidSnapshotName("x'; DROP TABLE t; --")
    an[IllegalArgumentException] should be thrownBy
      SnapshotBackfill.requireValidSnapshotName("")
  }

  /** The stream since the consistent point C=100: an update, an insert, a
    * delete, and a double-update — everything that can tear a backfill. */
  private def changesAfterC = Seq(
    ChangeAction("accounts", 101, 0, "U", Map("id" -> "1"),
      Map("id" -> "1", "balance" -> "150.0"), Nil, Nil, rekey = false),
    ChangeAction("accounts", 102, 0, "I", Map("id" -> "4"),
      Map("id" -> "4", "balance" -> "400.0"), Nil, Nil, rekey = false),
    ChangeAction("accounts", 103, 0, "D", Map("id" -> "2"),
      Map("id" -> "2"), Nil, Nil, rekey = false),
    ChangeAction("accounts", 104, 0, "U", Map("id" -> "3"),
      Map("id" -> "3", "balance" -> "310.0"), Nil, Nil, rekey = false),
    ChangeAction("accounts", 105, 0, "U", Map("id" -> "3"),
      Map("id" -> "3", "balance" -> "320.0"), Nil, Nil, rekey = false))

  /** What the source actually contains after all writes — the oracle. */
  private val oracle = Set(1L -> 150.0, 3L -> 320.0, 4L -> 400.0)

  /** A torn, unpinned read taken mid-write-burst: id=1 already updated,
    * id=2 not yet deleted, id=3 mid-way through its two updates, id=4 not
    * yet inserted. (A pinned read would have returned S0 = the state at C.) */
  private val tornBackfill = Seq(
    (1L, 150.0), // post-write (its LSN-101 update will re-apply, same value)
    (2L, 200.0), // pre-delete (stream D must remove it)
    (3L, 310.0), // between the two updates
  ) // (4L missing: pre-insert — stream I must add it)

  private def convergenceRun(tablesBase: String, ckpt: String): Unit = {
    val sync = new GraftSync(spark,
      SyncConfig(Seq(rel), tablesBase, ckpt, batchTimeout = "1 seconds"))
    sync.backfill(rel, tornBackfill.toDF("id", "balance"))
    sync.applyBatch(changesAfterC.toDS(), batchId = 0L)
    sync.table("accounts").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSet shouldBe oracle
    // replay the same post-C changes (fresh batch id, as a restarted
    // stream would): converged state must not move — the double-apply is
    // invisible because the merge is keyed and value-idempotent
    sync.applyBatch(changesAfterC.toDS(), batchId = 1L)
    sync.table("accounts").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSet shouldBe oracle
  }

  test("unpinned torn backfill + stream from C converges to the oracle (parquet)") {
    val base = java.nio.file.Files.createTempDirectory("graft-conv").toString
    convergenceRun(s"$base/tables", s"$base/ckpt")
  }

  test("unpinned torn backfill + stream from C converges to the oracle (jdbc)") {
    val base = java.nio.file.Files.createTempDirectory("graft-conv-jdbc").toString
    convergenceRun("jdbc:derby:memory:graftconv;create=true", s"$base/ckpt")
  }

  test("pinned backfill (state at C) + the same stream reaches the same oracle") {
    // the aligned case the exported snapshot gives for real: backfill sees
    // EXACTLY S0, every post-C change applies exactly once
    val base = java.nio.file.Files.createTempDirectory("graft-conv-pin").toString
    val sync = new GraftSync(spark,
      SyncConfig(Seq(rel), s"$base/tables", s"$base/ckpt", batchTimeout = "1 seconds"))
    sync.backfill(rel,
      Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("id", "balance"))
    sync.applyBatch(changesAfterC.toDS(), batchId = 0L)
    sync.table("accounts").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSet shouldBe oracle
  }
}
