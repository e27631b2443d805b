package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{GraftSync, SyncConfig, TestSpark}

/** Replays the reference `Run()` decision tree (sync_service.go:60-131)
  * against a scripted catalog: publication drift → drop slot + recreate
  * publication; missing slot → create + exported snapshot; existing slot →
  * resume from restart LSN; prohibitdropslot → loud failure. */
class SlotLifecycleSpec extends AnyFunSuite with Matchers {
  import SlotLifecycle._

  private def rel(schema: String, name: String) = Relation(schema, name, Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("v", PgTypes.TextOid)))

  private val accounts = rel("public", "accounts")
  private val orders = rel("public", "orders")

  /** Mutable catalog fake: interprets the generated SQL exactly as a
    * Postgres catalog would, and journals every statement for golden
    * asserts. */
  private final class FakeCatalog(
      var pub: Seq[(String, String)],
      var slot: Option[Long],
      nextSnapshot: String = "00000003-00000002-1") extends Catalog {
    val journal = collection.mutable.ArrayBuffer.empty[String]
    var slotCreates = 0
    def publicationTables(pubName: String): Seq[(String, String)] = pub
    def slotRestartLsn(slotName: String): Option[Long] = slot
    def exec(sql: String): Unit = {
      journal += sql
      if (sql.startsWith("SELECT pg_drop_replication_slot")) slot = None
      else if (sql.startsWith("DROP PUBLICATION")) pub = Nil
      else if (sql.startsWith("CREATE PUBLICATION"))
        // the fake trusts the statement it was handed; membership is
        // asserted separately via createPublicationSql goldens
        pub = Seq(("public", "accounts"), ("public", "orders"))
    }
    def createSlot(slotName: String): CreatedSlot = {
      slotCreates += 1
      slot = Some(500L)
      CreatedSlot(nextSnapshot, 500L)
    }
  }

  test("publication drift: drop slot, recreate publication, new slot + snapshot") {
    val cat = new FakeCatalog(pub = Seq(("public", "accounts")), slot = Some(42L))
    val d = SlotLifecycle.run(cat, "mammoth", Seq(accounts, orders))
    d shouldBe BackfillFromSnapshot("00000003-00000002-1", 500L)
    cat.journal.toList shouldBe List(
      "SELECT pg_drop_replication_slot('mammoth')",
      "DROP PUBLICATION IF EXISTS \"mammoth\"",
      "CREATE PUBLICATION \"mammoth\" FOR TABLE ONLY " +
        "\"public\".\"accounts\", \"public\".\"orders\"")
    cat.slotCreates shouldBe 1
  }

  test("empty publication counts as drift (must be recreated)") {
    val cat = new FakeCatalog(pub = Nil, slot = None)
    SlotLifecycle.run(cat, "mammoth", Seq(accounts, orders))
    cat.journal.exists(_.startsWith("CREATE PUBLICATION")) shouldBe true
    // no slot existed: the drop is a catalog no-op and emits no SQL
    cat.journal.exists(_.startsWith("SELECT pg_drop_replication_slot")) shouldBe false
  }

  test("missing slot with matching publication: create slot, backfill from snapshot") {
    val cat = new FakeCatalog(
      pub = Seq(("public", "accounts"), ("public", "orders")), slot = None)
    val d = SlotLifecycle.run(cat, "mammoth", Seq(accounts, orders))
    d shouldBe BackfillFromSnapshot("00000003-00000002-1", 500L)
    d.startLsn shouldBe 500L
    cat.journal shouldBe empty // nothing dropped or recreated
  }

  test("existing slot with matching publication: resume from restart_lsn") {
    val cat = new FakeCatalog(
      pub = Seq(("public", "orders"), ("public", "accounts")), // order-insensitive
      slot = Some(8675309L))
    val d = SlotLifecycle.run(cat, "mammoth", Seq(accounts, orders))
    d shouldBe ResumeFrom(8675309L)
    cat.journal shouldBe empty
    cat.slotCreates shouldBe 0
  }

  test("a publication with extra tables is drift even when configured ones are present") {
    publicationMatches(Seq(accounts),
      Seq(("public", "accounts"), ("public", "orders"))) shouldBe false
    publicationMatches(Seq(accounts, orders),
      Seq(("public", "accounts"), ("public", "orders"))) shouldBe true
    publicationMatches(Seq(accounts, orders),
      Seq(("public", "accounts"), ("other", "orders"))) shouldBe false
  }

  test("prohibitdropslot fails the drift path before touching the catalog") {
    val cat = new FakeCatalog(pub = Seq(("public", "accounts")), slot = Some(42L))
    intercept[DropSlotProhibited] {
      SlotLifecycle.run(cat, "mammoth", Seq(accounts, orders), prohibitDropSlot = true)
    }
    cat.journal shouldBe empty
    cat.slot shouldBe Some(42L)
  }

  test("resync (schema drift mid-run) drops the slot so the next run re-snapshots") {
    val cat = new FakeCatalog(
      pub = Seq(("public", "accounts"), ("public", "orders")), slot = Some(42L))
    SlotLifecycle.resync(cat, "mammoth")
    cat.slot shouldBe None
    // and the next supervised run then backfills fresh
    SlotLifecycle.run(cat, "mammoth", Seq(accounts, orders)) shouldBe a[BackfillFromSnapshot]
  }

  test("generated SQL quotes identifiers and literals") {
    createPublicationSql("my\"slot", Seq(rel("we ird", "ta\"ble"))) shouldBe
      "CREATE PUBLICATION \"my\"\"slot\" FOR TABLE ONLY \"we ird\".\"ta\"\"ble\""
    dropSlotSql("o'brien") shouldBe "SELECT pg_drop_replication_slot('o''brien')"
    slotStatusSql("s") shouldBe
      "SELECT restart_lsn FROM pg_replication_slots WHERE slot_name = 's'"
    publicationTablesSql("s") shouldBe
      "SELECT schemaname, tablename FROM pg_publication_tables WHERE pubname = 's'"
    createSlotCommand("s") shouldBe
      "CREATE_REPLICATION_SLOT \"s\" LOGICAL pgoutput (SNAPSHOT 'export')"
  }

  test("GraftSync wires slotname/prohibitdropslot from config into the lifecycle") {
    val base = java.nio.file.Files.createTempDirectory("graft-slot").toString
    val cfg = SyncConfig(Seq(accounts, orders), s"$base/tables", s"$base/ckpt",
      slotName = "graft_slot", prohibitDropSlot = true)
    val sync = new GraftSync(TestSpark.spark, cfg)
    val cat = new FakeCatalog(pub = Seq(("public", "accounts")), slot = Some(7L))
    intercept[DropSlotProhibited] { sync.prepareReplication(cat) }
    val cat2 = new FakeCatalog(
      pub = Seq(("public", "accounts"), ("public", "orders")), slot = Some(7L))
    sync.prepareReplication(cat2) shouldBe ResumeFrom(7L)
  }
}
