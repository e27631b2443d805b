package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.cdc.{PgTypes, RelColumn, Relation}

class GraftConfigSpec extends AnyFunSuite with Matchers {

  // the reference's default-config.yml, verbatim (what its `initconfig`
  // command emits from config.go DefaultConfig)
  private val referenceDefaultYaml =
    """sync:
      |  batchmaxitems: 25000
      |  batchtimeout: 1m0s
      |  skipacknowledge: false
      |  prohibitdropslot: false
      |  tables: []
      |postgres:
      |  connection: ""
      |  slotname: mammoth
      |  standbymessageinterval: 10s
      |snowflake:
      |  connection: ""
      |  database: ""
      |  schema: ""
      |logger:
      |  level: info
      |  json: false
      |""".stripMargin

  test("parses the reference default-config.yml field-for-field") {
    val fc = GraftConfig.parse(referenceDefaultYaml, env = Map.empty)
    fc.sync.batchMaxItems shouldBe 25000
    fc.sync.batchTimeout shouldBe "1m0s"
    GraftConfig.parseDuration(fc.sync.batchTimeout) shouldBe Some(60000L)
    fc.sync.skipAcknowledge shouldBe false
    fc.sync.prohibitDropSlot shouldBe false
    fc.sync.tables shouldBe empty
    fc.postgres.connection shouldBe ""
    fc.postgres.slotName shouldBe "mammoth"
    GraftConfig.parseDuration(fc.postgres.standbyMessageInterval) shouldBe Some(10000L)
    fc.target.connection shouldBe ""
    fc.target.database shouldBe ""
    fc.target.schema shouldBe ""
    fc.logger.level shouldBe "info"
    fc.logger.json shouldBe false
    // our example emitter reproduces it byte-for-byte
    GraftConfig.exampleYaml shouldBe referenceDefaultYaml
  }

  test("defaults require filling before they validate (reference required tags)") {
    val fc = GraftConfig.parse(referenceDefaultYaml, env = Map.empty)
    val ex = intercept[IllegalArgumentException](fc.validate())
    ex.getMessage should include("sync.tables")
  }

  private val filledYaml =
    """sync:
      |  batchmaxitems: 5000
      |  batchtimeout: 1m30s   # comment survives
      |  tables:
      |    - public.users
      |    - public.orders
      |postgres:
      |  connection: "jdbc:derby:memory:cfg;create=true"
      |  slotname: graft
      |  standbymessageinterval: 10s
      |snowflake:
      |  connection: "/tmp/graft_cfg_tables"
      |""".stripMargin

  test("a filled config validates and maps onto SyncConfig") {
    val fc = GraftConfig.parse(filledYaml, env = Map.empty).validate()
    fc.sync.tables shouldBe Seq("public.users", "public.orders")
    val rels = Seq(
      Relation("public", "users", Seq(RelColumn("id", PgTypes.Int8Oid, isIdentity = true))),
      Relation("public", "orders", Seq(RelColumn("id", PgTypes.Int8Oid, isIdentity = true))))
    val sc = fc.toSyncConfig(rels)
    sc.relations.map(_.table) shouldBe Seq("users", "orders")
    sc.tablesBase shouldBe "/tmp/graft_cfg_tables"
    sc.checkpointBase shouldBe "/tmp/graft_cfg_tables/_checkpoints"
    sc.batchTimeout shouldBe "90000 milliseconds"
    sc.batchMaxItems shouldBe 5000L
  }

  test("a configured table without an introspected relation fails loudly") {
    val fc = GraftConfig.parse(filledYaml, env = Map.empty).validate()
    an[IllegalArgumentException] should be thrownBy fc.toSyncConfig(Seq(
      Relation("public", "users", Seq(RelColumn("id", PgTypes.Int8Oid, isIdentity = true)))))
  }

  test("environment variables override file values (viper convention)") {
    val fc = GraftConfig.parse(filledYaml, env = Map(
      "SYNC_BATCHMAXITEMS" -> "123",
      "POSTGRES_SLOTNAME" -> "other",
      "SYNC_TABLES" -> "public.events",
      "LOGGER_JSON" -> "true"))
    fc.sync.batchMaxItems shouldBe 123
    fc.postgres.slotName shouldBe "other"
    fc.sync.tables shouldBe Seq("public.events")
    fc.logger.json shouldBe true
  }

  test("go durations parse; garbage does not") {
    GraftConfig.parseDuration("1h2m3s") shouldBe Some(3723000L)
    GraftConfig.parseDuration("500ms") shouldBe Some(500L)
    GraftConfig.parseDuration("2m") shouldBe Some(120000L)
    GraftConfig.parseDuration("") shouldBe None
    GraftConfig.parseDuration("soon") shouldBe None
  }

  test("yaml subset: inline lists, quotes and comments") {
    val m = GraftConfig.parseYaml(
      """a:
        |  xs: [1, "two", three]  # inline
        |  s: "a # not-comment"
        |top: plain
        |""".stripMargin)
    m("a").asInstanceOf[Map[String, Any]]("xs") shouldBe Seq("1", "two", "three")
    m("a").asInstanceOf[Map[String, Any]]("s") shouldBe "a # not-comment"
    m("top") shouldBe "plain"
  }

  test("initconfig round-trips through the parser") {
    val fc = GraftConfig.parse(GraftConfig.exampleYaml, env = Map.empty)
    fc shouldBe GraftConfig.parse(referenceDefaultYaml, env = Map.empty)
  }

  test("target credentials and properties reach SyncConfig.targetProperties") {
    val fc = GraftConfig.parse(
      """sync:
        |  tables: [accounts]
        |postgres:
        |  connection: "host=db"
        |snowflake:
        |  connection: "jdbc:derby:memory:x"
        |  user: app
        |  properties: [ssl=true, fetchsize=1000]
        |""".stripMargin,
      env = Map("SNOWFLAKE_PASSWORD" -> "s3cret")) // env override convention
    fc.target.properties shouldBe Map(
      "user" -> "app", "password" -> "s3cret",
      "ssl" -> "true", "fetchsize" -> "1000")
    val rel = graft.cdc.Relation("public", "accounts", Seq(
      graft.cdc.RelColumn("id", graft.cdc.PgTypes.Int8Oid, isIdentity = true)))
    fc.validate().toSyncConfig(Seq(rel)).targetProperties("password") shouldBe "s3cret"
    intercept[IllegalArgumentException] {
      GraftConfig.parse(
        "snowflake:\n  properties: [no-equals-here]\n", env = Map.empty)
    }
  }

  test("deltastore properties opt into the delta regime and are stripped " +
      "from the JDBC pass-through") {
    val fc = GraftConfig.parse(
      """sync:
        |  tables: [accounts]
        |postgres:
        |  connection: "host=db"
        |snowflake:
        |  connection: "/tmp/tables"
        |  properties: [deltastore=true, deltacompactrows=500000, deltacompactfiles=16, ssl=true]
        |""".stripMargin, env = Map.empty)
    val rel = graft.cdc.Relation("public", "accounts", Seq(
      graft.cdc.RelColumn("id", graft.cdc.PgTypes.Int8Oid, isIdentity = true)))
    val sc = fc.validate().toSyncConfig(Seq(rel))
    sc.deltaStore shouldBe true
    sc.deltaCompactRows shouldBe 500000L
    sc.deltaCompactFiles shouldBe 16
    // engine-extension keys must not leak into JDBC connection properties
    sc.targetProperties shouldBe Map("ssl" -> "true")
    // absent → defaults off
    val fc2 = GraftConfig.parse(
      """sync:
        |  tables: [accounts]
        |postgres:
        |  connection: "host=db"
        |snowflake:
        |  connection: "/tmp/tables"
        |""".stripMargin, env = Map.empty)
    fc2.validate().toSyncConfig(Seq(rel)).deltaStore shouldBe false
    // case variants: the strip filter is case-insensitive, so the read
    // back must be too — `deltaStore=true` silently ignored (stripped
    // from the passthrough AND not read) was a real footgun
    val fc3 = GraftConfig.parse(
      """sync:
        |  tables: [accounts]
        |postgres:
        |  connection: "host=db"
        |snowflake:
        |  connection: "/tmp/tables"
        |  properties: [deltaStore=true, deltaCompactRows=250000, DeltaCompactFiles=8]
        |""".stripMargin, env = Map.empty)
    val sc3 = fc3.validate().toSyncConfig(Seq(rel))
    sc3.deltaStore shouldBe true
    sc3.deltaCompactRows shouldBe 250000L
    sc3.deltaCompactFiles shouldBe 8
    sc3.targetProperties shouldBe Map.empty
  }

  test("spool retention keys: default delete, archive needs a dir, env override") {
    // defaulted ON — retention is the long-run scale guard, opting OUT is
    // the explicit act
    val fc = GraftConfig.parse(referenceDefaultYaml, env = Map.empty)
    fc.sync.spoolRetention shouldBe "delete"
    fc.sync.spoolArchiveDir shouldBe ""

    val filled =
      """sync:
        |  tables: [accounts]
        |  spoolretention: ARCHIVE
        |  spoolarchivedir: /var/spool/done
        |postgres:
        |  connection: "host=db"
        |snowflake:
        |  connection: "/tmp/tables"
        |""".stripMargin
    val fa = GraftConfig.parse(filled, env = Map.empty)
    fa.sync.spoolRetention shouldBe "archive" // case-normalized
    fa.sync.spoolArchiveDir shouldBe "/var/spool/done"
    fa.validate() // archive + dir is a valid pair

    // archive without a dir refuses at validate, not at stream start
    an[IllegalArgumentException] should be thrownBy GraftConfig.parse(
      filled.replace("  spoolarchivedir: /var/spool/done\n", ""),
      env = Map.empty).validate()
    // unknown policy refuses too
    an[IllegalArgumentException] should be thrownBy GraftConfig.parse(
      filled.replace("ARCHIVE", "compress"), env = Map.empty).validate()

    // viper env-override convention reaches the new keys (rotation must
    // be disabled alongside — see the rotation-needs-retention guard)
    val fo = GraftConfig.parse(filled,
      env = Map("SYNC_SPOOLRETENTION" -> "off",
        "SYNC_CHECKPOINTROTATION" -> "off"))
    fo.sync.spoolRetention shouldBe "off"
    fo.validate()
  }

  test("checkpointrotation: defaults on at 24h, Go-duration only, off opts out") {
    val fc = GraftConfig.parse(referenceDefaultYaml, env = Map.empty)
    fc.sync.checkpointRotation shouldBe "24h"
    GraftConfig.parseDuration(fc.sync.checkpointRotation) shouldBe Some(86400000L)

    val filled =
      """sync:
        |  tables: [accounts]
        |  checkpointrotation: 6h
        |postgres:
        |  connection: "host=db"
        |snowflake:
        |  connection: "/tmp/tables"
        |""".stripMargin
    GraftConfig.parse(filled, env = Map.empty).validate()
      .sync.checkpointRotation shouldBe "6h"
    // off disables; env override reaches the key
    GraftConfig.parse(filled, env = Map("SYNC_CHECKPOINTROTATION" -> "OFF"))
      .validate().sync.checkpointRotation shouldBe "off"
    // the Spark-interval spelling parses only as a validation sentinel,
    // not millis — refuse it rather than rotating constantly
    an[IllegalArgumentException] should be thrownBy GraftConfig.parse(
      filled.replace("6h", "\"24 hours\""), env = Map.empty).validate()
    // zero and garbage refuse too
    an[IllegalArgumentException] should be thrownBy GraftConfig.parse(
      filled.replace("6h", "0s"), env = Map.empty).validate()
    an[IllegalArgumentException] should be thrownBy GraftConfig.parse(
      filled.replace("6h", "sometimes"), env = Map.empty).validate()
    // rotation over an UNBOUNDED spool re-reads its whole history every
    // period — the combination must be an explicit refusal, not a grind
    an[IllegalArgumentException] should be thrownBy GraftConfig.parse(
      filled, env = Map("SYNC_SPOOLRETENTION" -> "off")).validate()
    GraftConfig.parse(filled, env = Map("SYNC_SPOOLRETENTION" -> "off",
      "SYNC_CHECKPOINTROTATION" -> "off")).validate() // explicit pair is fine
  }

  test("an archive dir inside the message spool is refused") {
    // Spark's archive cleaner MOVES committed files; a destination under
    // <target>/_messages would be re-listed as new input forever
    def cfg(arc: String) = GraftConfig.parse(
      s"""sync:
         |  tables: [accounts]
         |  spoolretention: archive
         |  spoolarchivedir: $arc
         |postgres:
         |  connection: "host=db"
         |snowflake:
         |  connection: "/data/tables"
         |""".stripMargin, env = Map.empty)
    an[IllegalArgumentException] should be thrownBy
      cfg("/data/tables/_messages/archive").validate()
    an[IllegalArgumentException] should be thrownBy
      cfg("/data/tables/_messages").validate()
    cfg("/data/tables/_archive").validate() // sibling of the spool is fine
    cfg("/elsewhere/archive").validate()
  }

  test("the archive-dir guard survives path-spelling evasions") {
    // the guard compares NORMALIZED absolute paths, so a doubled
    // separator from a trailing-slash connection, a `..` segment, or a
    // dot segment cannot smuggle the archive inside the spool
    def cfg(conn: String, arc: String) = GraftConfig.parse(
      s"""sync:
         |  tables: [accounts]
         |  spoolretention: archive
         |  spoolarchivedir: $arc
         |postgres:
         |  connection: "host=db"
         |snowflake:
         |  connection: "$conn"
         |""".stripMargin, env = Map.empty)
    // trailing slash on the connection → spool '/t//_messages/' under a
    // naive prefix test; the real inside path must still be refused
    an[IllegalArgumentException] should be thrownBy
      cfg("/data/tables/", "/data/tables/_messages/archive").validate()
    // `..` routing back into the spool
    an[IllegalArgumentException] should be thrownBy
      cfg("/data/tables", "/data/tables/_archive/../_messages/arc").validate()
    // `.` segments
    an[IllegalArgumentException] should be thrownBy
      cfg("/data/tables", "/data/tables/./_messages/./arc").validate()
    // `..` that lands OUTSIDE stays allowed
    cfg("/data/tables", "/data/tables/_messages/../_archive").validate()
  }

  test("the runtime archive guard resolves symlinks the lexical guard " +
      "cannot see") {
    // validate() runs before any directory exists, so its check is
    // lexical; a symlink pointing the archive dir into the spool evades
    // it. The runtime twin runs from Main.run once both dirs exist and
    // compares REAL paths.
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_cfg_symlink")
    try {
      val target = root.resolve("tables")
      Files.createDirectories(target.resolve("_messages"))
      // looks like a sibling, is really <spool>/arc
      val link = root.resolve("looks_outside")
      Files.createSymbolicLink(link, target.resolve("_messages"))
      def cfg(arc: String) = GraftConfig.parse(
        s"""sync:
           |  tables: [accounts]
           |  spoolretention: archive
           |  spoolarchivedir: $arc
           |postgres:
           |  connection: "host=db"
           |snowflake:
           |  connection: "$target"
           |""".stripMargin, env = Map.empty)
      val evading = cfg(s"$link/arc")
      evading.validate() // the lexical guard cannot see through the link
      an[IllegalArgumentException] should be thrownBy
        evading.verifyArchiveOutsideSpoolAtRuntime()
      // the refusal must not have followed the link and deposited a
      // directory inside the live spool on its way to the check
      Files.exists(target.resolve("_messages").resolve("arc")) shouldBe false
      // a genuinely-outside dir passes the runtime guard and both dirs
      // exist afterwards (it creates them, as Main.run relies on)
      val fine = cfg(s"$root/real_archive")
      fine.validate()
      fine.verifyArchiveOutsideSpoolAtRuntime()
      Files.isDirectory(Paths.get(s"$root/real_archive")) shouldBe true
      // non-archive modes are a no-op even with a bogus archive dir
      GraftConfig.parse(
        s"""sync:
           |  tables: [accounts]
           |postgres:
           |  connection: "host=db"
           |snowflake:
           |  connection: "$target"
           |""".stripMargin, env = Map.empty)
        .validate().verifyArchiveOutsideSpoolAtRuntime()
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          val s = Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        Files.deleteIfExists(p)
      }
      rm(root)
    }
  }

  test("stagingthreads property reaches SyncConfig and stays out of the " +
      "JDBC pass-through") {
    val rel = graft.cdc.Relation("public", "accounts", Seq(
      graft.cdc.RelColumn("id", graft.cdc.PgTypes.Int8Oid, isIdentity = true)))
    val fc = GraftConfig.parse(
      """sync:
        |  tables: [accounts]
        |postgres:
        |  connection: "host=db"
        |snowflake:
        |  connection: "/tmp/tables"
        |  properties: [stagingThreads=1, ssl=true]
        |""".stripMargin, env = Map.empty)
    val sc = fc.validate().toSyncConfig(Seq(rel))
    sc.stagingThreads shouldBe 1 // case-insensitive read, like deltastore
    sc.targetProperties shouldBe Map("ssl" -> "true")
    // absent → the concurrent default
    val fc2 = GraftConfig.parse(
      """sync:
        |  tables: [accounts]
        |postgres:
        |  connection: "host=db"
        |snowflake:
        |  connection: "/tmp/tables"
        |""".stripMargin, env = Map.empty)
    fc2.validate().toSyncConfig(Seq(rel)).stagingThreads shouldBe 8
    // zero/negative staging threads refuse loudly
    an[IllegalArgumentException] should be thrownBy
      graft.SyncConfig(Seq(rel), "/tmp/t", "/tmp/c", stagingThreads = 0).validate()
  }
}
