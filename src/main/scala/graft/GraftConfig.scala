package graft

import scala.collection.mutable

import graft.cdc.Relation

/** `config.yml` → [[SyncConfig]] — the engine's analogue of the
  * reference's configuration layer (config/config.go:1-140 +
  * `default-config.yml`): the same section/field shape, the same defaults,
  * the same required-field validation, and viper's environment-variable
  * override convention (`sync.batchmaxitems` ← `SYNC_BATCHMAXITEMS`).
  *
  * The file format is the reference's own YAML subset (two-level
  * sections, scalars, inline `[a, b]` and block `- item` lists, quotes,
  * comments) parsed with a ~50-line reader — the full YAML spec buys
  * nothing here and this sandbox has no YAML dependency to resolve.
  *
  * Reference `snowflake.connection` (the warehouse DSN) maps to the graft
  * target-store URI: a `jdbc:` URL routes applies through the server-side
  * staged MERGE target ([[graft.streaming.JdbcStreamingMerge]] — the
  * reference's warehouse topology), anything else is a parquet
  * table-store base directory. Go durations (`1m0s`) are accepted
  * anywhere a Spark trigger interval is expected. */
object GraftConfig {

  final case class SyncSection(
      batchMaxItems: Int = 25000,
      batchTimeout: String = "60 seconds",
      skipAcknowledge: Boolean = false,
      prohibitDropSlot: Boolean = false,
      tables: Seq[String] = Nil,
      // retention policy for the message-spool directory the live pump
      // writes and the file-stream source reads. Without retention the
      // spool grows forever (~10 files/s at the measured knee) and the
      // source's per-trigger directory listing grows with it —
      // O(all-files-ever) on a weeks-long run. `delete` (the default)
      // retires each spool file once its batch is COMMITTED to the
      // streaming checkpoint — safe here because every spool file is
      // redelivery-proof: the pump re-spools from the applied-LSN floor
      // after any crash, so no deleted file is ever the only copy of
      // unapplied work. `archive` moves committed files to
      // spoolArchiveDir instead; `off` disables retention (the pre-r16
      // behavior).
      spoolRetention: String = "delete",
      spoolArchiveDir: String = "",
      // periodic streaming-checkpoint rotation for LIVE mode (Go duration
      // like `24h`; "off" disables). Spark's file-source metadata
      // log retains EVERY file entry ever seen (FileStreamSourceLog never
      // overrides shouldRetain), so each 10-batch compaction rewrites a
      // list that grows forever — the checkpoint-side twin of the
      // spool-listing flaw, ~432k new entries/day at the measured knee.
      // All durable sync state lives in the source and target (commit
      // log, applied markers, replication slot/LSN floor — the
      // reference's "all state is in the source and target"), so the
      // checkpoint is disposable: rotation stops the stream, deletes the
      // checkpoint, and restarts the body; the fresh stream re-reads the
      // retention-bounded spool tail and the LSN watermark dedups it.
      // Live-mode only: the internal pump flushes only WHOLE committed
      // transactions per spool file, so no open transaction can be
      // stranded in discarded assembler state.
      checkpointRotation: String = "24h")

  final case class PostgresSection(
      connection: String = "",
      slotName: String = "mammoth",
      standbyMessageInterval: String = "10 seconds")

  /** YAML section name stays `snowflake` for file-compatibility with the
    * reference; semantically it is the sync target.
    *
    * The reference embeds warehouse credentials inside its DSN
    * (`Snowflake.Connection`); a JDBC target instead takes them as driver
    * properties. `user`/`password` keys and a free-form `properties`
    * list of `k=v` entries all land in [[SyncConfig.targetProperties]],
    * with the same `SNOWFLAKE_USER`-style env overrides as every other
    * field. */
  final case class TargetSection(
      connection: String = "",
      database: String = "",
      schema: String = "",
      properties: Map[String, String] = Map.empty)

  final case class LoggerSection(level: String = "info", json: Boolean = false)

  final case class FileConfig(
      sync: SyncSection = SyncSection(),
      postgres: PostgresSection = PostgresSection(),
      target: TargetSection = TargetSection(),
      logger: LoggerSection = LoggerSection()) {

    /** Required-field checks, mirroring config.Validate (config.go:86 via
      * govalidator `valid:"required"` tags). */
    def validate(): FileConfig = {
      require(sync.batchMaxItems > 0, "sync.batchmaxitems is required")
      require(sync.batchTimeout.nonEmpty && parseDuration(sync.batchTimeout).isDefined,
        s"sync.batchtimeout is required (got '${sync.batchTimeout}')")
      require(sync.tables.nonEmpty, "sync.tables is required")
      require(Set("delete", "archive", "off")(sync.spoolRetention),
        s"sync.spoolretention must be delete|archive|off (got '${sync.spoolRetention}')")
      require(sync.spoolRetention != "archive" || sync.spoolArchiveDir.nonEmpty,
        "sync.spoolretention=archive requires sync.spoolarchivedir")
      // Go-duration form only (the Spark-interval spelling parses to a
      // validation sentinel, not millis) and strictly positive
      require(sync.checkpointRotation == "off" ||
        parseDuration(sync.checkpointRotation).exists(_ > 0),
        s"sync.checkpointrotation must be a positive Go duration (e.g. 24h) " +
          s"or 'off' (got '${sync.checkpointRotation}')")
      // rotation's safety-and-cost argument assumes a retention-BOUNDED
      // spool: with retention off, every rotation would re-read the
      // entire unbounded spool history from batch 0 — refuse the
      // combination instead of silently grinding
      require(sync.spoolRetention != "off" || sync.checkpointRotation == "off",
        "sync.spoolretention=off requires sync.checkpointrotation=off " +
          "(a rotation over an unbounded spool re-reads its whole history)")
      // Spark's archive cleaner moves files; an archive dir INSIDE the
      // spool dir would be re-listed as new input forever (read → archive
      // → re-read), defeating retention with no error anywhere. The spool
      // lives at <target>/_messages (Main.run's convention).
      locally {
        // Resolve BOTH sides to normalized absolute paths before the
        // prefix test: a naive string compare is evaded by doubled
        // separators (`/t//_messages/` from a trailing-slash connection),
        // `.`/`..` segments, or a relative archive path that resolves
        // inside the spool — each re-enabling the read→archive→re-read
        // loop this guard exists to refuse. Symlinks can still evade a
        // lexical normalize (toRealPath needs the dirs to exist, which
        // they don't at validate time); the runtime twin
        // verifyArchiveOutsideSpoolAtRuntime closes that once Main.run
        // has created both directories.
        def norm(p: String) = java.nio.file.Paths.get(
          p.replace('\\', '/')).toAbsolutePath.normalize.toString
            .stripSuffix("/") + "/"
        val spoolDir = norm(s"${target.connection}/_messages")
        require(sync.spoolRetention != "archive" ||
          !norm(sync.spoolArchiveDir).startsWith(spoolDir),
          s"sync.spoolarchivedir must lie OUTSIDE the message spool " +
            s"($spoolDir): archived files inside it are re-ingested forever")
      }
      require(postgres.connection.nonEmpty, "postgres.connection is required")
      require(postgres.slotName.nonEmpty, "postgres.slotname is required")
      require(parseDuration(postgres.standbyMessageInterval).isDefined,
        "postgres.standbymessageinterval is required")
      require(target.connection.nonEmpty, "snowflake.connection is required")
      this
    }

    /** Runtime twin of the validate-time archive guard above. Validate
      * runs before any directory exists, so its check is lexical and a
      * SYMLINK that points the archive dir into the spool evades it (the
      * documented residual). By the time the service loop starts, both
      * directories exist (Main.run creates them), so the real —
      * symlink-resolved — paths are available: refuse an archive dir
      * whose real path sits inside the spool's real path before the
      * first trigger can enter the read→archive→re-read loop. No-op in
      * non-archive modes. */
    def verifyArchiveOutsideSpoolAtRuntime(): Unit =
      if (sync.spoolRetention == "archive") {
        import java.nio.file.{Files, Path, Paths}
        val spool = Paths.get(s"${target.connection}/_messages")
        Files.createDirectories(spool)
        // Resolve the archive path WITHOUT creating it first: creating
        // then checking would follow an evading symlink and deposit a
        // directory chain inside the live spool on the very refusal
        // path this guard exists for. Resolve the nearest EXISTING
        // ancestor's real path (that's where any symlink redirection
        // lives) and re-append the not-yet-created tail lexically.
        def realView(p: Path): Path = {
          var cur = p.toAbsolutePath.normalize
          var tail = List.empty[Path]
          while (cur != null && !Files.exists(cur)) {
            tail = cur.getFileName :: tail
            cur = cur.getParent
          }
          val base = if (cur == null) p.toAbsolutePath.normalize.getRoot
            else cur.toRealPath()
          tail.foldLeft(base)(_.resolve(_))
        }
        val spoolReal = spool.toRealPath()
        val archReal = realView(Paths.get(sync.spoolArchiveDir))
        // Path.startsWith is element-wise (no /a/bc vs /a/b false match)
        // and true on equality, which is equally self-harming
        require(!archReal.startsWith(spoolReal),
          s"sync.spoolarchivedir resolves INSIDE the message spool " +
            s"($archReal is under $spoolReal after resolving symlinks): " +
            s"archived files inside the spool are re-ingested forever")
        Files.createDirectories(Paths.get(sync.spoolArchiveDir))
      }

    /** Bind to introspected relations → a validated [[SyncConfig]]. The
      * file lists table NAMES only; column schemas come from source
      * introspection exactly as the reference queries the Postgres
      * catalog at startup. */
    def toSyncConfig(relations: Seq[Relation]): SyncConfig = {
      val byName = relations.flatMap(r => Seq(r.table -> r, r.qualifiedName -> r)).toMap
      val resolved = sync.tables.map { t =>
        byName.getOrElse(t, throw new IllegalArgumentException(
          s"configured table '$t' has no introspected relation"))
      }
      val trigger =
        if (sync.batchTimeout.contains(" ")) sync.batchTimeout // Spark interval
        else s"${parseDuration(sync.batchTimeout).get} milliseconds"
      // engine extensions ride the free-form properties map so the file
      // keeps the reference's shape: deltastore=true opts the parquet
      // target into the write-optimized delta regime (graft.cdc.DeltaStore)
      val graftKeys = Set("deltastore", "deltacompactrows", "deltacompactfiles",
        "stagingthreads")
      // read the graft keys from the SAME case-normalized view the
      // passthrough filter uses: stripping `deltaStore=true` from the
      // properties case-insensitively but reading it back case-SENSITIVELY
      // would silently drop the setting (feature off, no error)
      val normProps = target.properties.map { case (k, v) => k.toLowerCase -> v }
      SyncConfig(
        relations = resolved,
        tablesBase = target.connection,
        checkpointBase = s"${target.connection}/_checkpoints",
        batchTimeout = trigger,
        batchMaxItems = sync.batchMaxItems.toLong,
        targetProperties = target.properties.view
          .filterKeys(k => !graftKeys(k.toLowerCase)).toMap,
        slotName = postgres.slotName,
        prohibitDropSlot = sync.prohibitDropSlot,
        deltaStore = normProps.getOrElse("deltastore", "false").toBoolean,
        deltaCompactRows = normProps.getOrElse("deltacompactrows", "100000").toLong,
        deltaCompactFiles = normProps.getOrElse("deltacompactfiles", "64").toInt,
        stagingThreads = normProps.getOrElse("stagingthreads", "8").toInt)
        .validate()
    }
  }

  /** Go `time.Duration` text (`1m0s`, `10s`, `1h2m`, `500ms`) → millis;
    * Spark-style interval strings (`60 seconds`) pass through unchanged. */
  def parseDuration(s: String): Option[Long] = {
    val t = s.trim
    if (t.isEmpty) return None
    if (t.contains(" ")) // Spark interval string: let Trigger parse it
      return scala.util.Try(
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(t)).toOption.map(_ => -1L)
    val re = """^(?:(\d+)h)?(?:(\d+)m)?(?:(\d+)s)?(?:(\d+)ms)?$""".r
    t match {
      case re(h, m, sec, ms) if Seq(h, m, sec, ms).exists(_ != null) =>
        def v(x: String) = if (x == null) 0L else x.toLong
        Some(v(h) * 3600000L + v(m) * 60000L + v(sec) * 1000L + v(ms))
      case _ => None
    }
  }

  /** Parse config text with viper-style env overrides: key path
    * `section.field` ← env `SECTION_FIELD` (config.go bindEnvs). */
  def parse(text: String, env: Map[String, String] = sys.env): FileConfig = {
    val root = parseYaml(text)
    def sec(name: String): Map[String, Any] =
      root.getOrElse(name, Map.empty[String, Any]) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _            => Map.empty
      }
    def get(section: String, key: String): Option[String] =
      env.get(s"${section.toUpperCase}_${key.toUpperCase}")
        .orElse(sec(section).get(key).collect { case s: String => s })
    def getList(section: String, key: String): Option[Seq[String]] =
      env.get(s"${section.toUpperCase}_${key.toUpperCase}")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .orElse(sec(section).get(key).collect { case l: Seq[_] => l.map(_.toString) })
    def bool(section: String, key: String, dflt: Boolean) =
      get(section, key).map(_.trim.equalsIgnoreCase("true")).getOrElse(dflt)

    val d = FileConfig()
    FileConfig(
      sync = SyncSection(
        batchMaxItems = get("sync", "batchmaxitems").map(_.trim.toInt)
          .getOrElse(d.sync.batchMaxItems),
        batchTimeout = get("sync", "batchtimeout").getOrElse(d.sync.batchTimeout),
        skipAcknowledge = bool("sync", "skipacknowledge", d.sync.skipAcknowledge),
        prohibitDropSlot = bool("sync", "prohibitdropslot", d.sync.prohibitDropSlot),
        tables = getList("sync", "tables").getOrElse(Nil),
        spoolRetention = get("sync", "spoolretention").map(_.trim.toLowerCase)
          .getOrElse(d.sync.spoolRetention),
        spoolArchiveDir = get("sync", "spoolarchivedir").map(_.trim)
          .getOrElse(d.sync.spoolArchiveDir),
        checkpointRotation = get("sync", "checkpointrotation")
          .map(_.trim.toLowerCase).getOrElse(d.sync.checkpointRotation)),
      postgres = PostgresSection(
        connection = get("postgres", "connection").getOrElse(""),
        slotName = get("postgres", "slotname").getOrElse(d.postgres.slotName),
        standbyMessageInterval = get("postgres", "standbymessageinterval")
          .getOrElse(d.postgres.standbyMessageInterval)),
      target = TargetSection(
        connection = get("snowflake", "connection").getOrElse(""),
        database = get("snowflake", "database").getOrElse(""),
        schema = get("snowflake", "schema").getOrElse(""),
        properties = {
          val kv = getList("snowflake", "properties").getOrElse(Nil).flatMap { e =>
            e.split("=", 2) match {
              case Array(k, v) if k.trim.nonEmpty => Some(k.trim -> v.trim)
              case _ => throw new IllegalArgumentException(
                s"snowflake.properties entries must be key=value (got '$e')")
            }
          }
          val named = Seq("user", "password")
            .flatMap(k => get("snowflake", k).map(k -> _))
          (kv ++ named).toMap
        }),
      logger = LoggerSection(
        level = get("logger", "level").getOrElse(d.logger.level),
        json = bool("logger", "json", d.logger.json)))
  }

  def load(path: String, env: Map[String, String] = sys.env): FileConfig = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val text = try src.mkString finally src.close()
    parse(text, env)
  }

  /** The reference's `initconfig` (config.go WriteExampleConfig): dump the
    * defaults in the exact default-config.yml shape. */
  def exampleYaml: String =
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

  // ------------------------------------------------------------------
  // Minimal YAML subset reader: two-level maps, scalars, inline lists,
  // block lists, quotes, comments. Exactly the shape config.go emits.
  // ------------------------------------------------------------------
  private[graft] def parseYaml(text: String): Map[String, Any] = {
    val root = mutable.LinkedHashMap.empty[String, Any]
    var section: Option[mutable.LinkedHashMap[String, Any]] = None
    var listKey: Option[String] = None
    text.linesIterator.foreach { raw =>
      val noComment = stripComment(raw)
      val line = noComment.trim
      if (line.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        if (line.startsWith("- ") || line == "-") {
          val item = scalar(line.drop(1).trim)
          (section, listKey) match {
            case (Some(s), Some(k)) =>
              s(k) = s.getOrElse(k, Seq.empty[Any]).asInstanceOf[Seq[Any]] :+ item
            case _ => throw new IllegalArgumentException(s"stray list item: $raw")
          }
        } else {
          val idx = line.indexOf(':')
          require(idx > 0, s"unparseable config line: $raw")
          val key = line.substring(0, idx).trim
          val value = line.substring(idx + 1).trim
          if (!indented) {
            if (value.isEmpty) { // section header
              val m = mutable.LinkedHashMap.empty[String, Any]
              root(key) = m
              section = Some(m)
              listKey = None
            } else {
              root(key) = scalar(value)
              section = None
              listKey = None
            }
          } else {
            val s = section.getOrElse(throw new IllegalArgumentException(
              s"indented key outside a section: $raw"))
            if (value.isEmpty) { // block list follows
              s(key) = Seq.empty[Any]
              listKey = Some(key)
            } else {
              s(key) = scalar(value)
              listKey = None
            }
          }
        }
      }
    }
    root.map { case (k, v) =>
      k -> (v match {
        case m: mutable.LinkedHashMap[_, _] => m.toMap
        case other                          => other
      })
    }.toMap
  }

  private def stripComment(line: String): String = {
    var inQuote = false
    val sb = new StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQuote = !inQuote
      if (c == '#' && !inQuote) return sb.toString
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def scalar(v: String): Any =
    if (v.startsWith("[") && v.endsWith("]")) {
      val inner = v.substring(1, v.length - 1).trim
      if (inner.isEmpty) Seq.empty[Any]
      else inner.split(",").map(x => unquote(x.trim)).toSeq
    } else unquote(v)

  private def unquote(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v
}
