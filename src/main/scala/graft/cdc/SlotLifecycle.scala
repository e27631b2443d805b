package graft.cdc

/** Publication / replication-slot lifecycle — the decision machine the
  * reference runs before any row moves (sync/service/sync_service.go:60-131
  * `Run`, :239-321 `publicationMatchesConfig` / `createPublication` /
  * `replicationSlotStatus` / `dropReplicationSlot`, and
  * sync/stream/stream.go:53-68 `CreateSlot`):
  *
  *   1. the publication must list EXACTLY the configured tables — on any
  *      drift the slot is dropped and the publication recreated (a slot
  *      created under the old publication would stream the wrong tables);
  *   2. a missing slot is created through the replication connection,
  *      capturing the exported consistent snapshot name + consistent-point
  *      LSN → the caller backfills FROM THAT SNAPSHOT so snapshot and
  *      stream start are exactly aligned;
  *   3. an existing slot resumes from its `restart_lsn` — no backfill.
  *
  * The decisions and the generated SQL are pure and offline-testable; all
  * I/O goes through the [[Catalog]] port (a scripted fake in specs, a JDBC
  * implementation against a live Postgres in production). Everything here
  * is the public Postgres logical-replication surface: `pg_publication_tables`,
  * `pg_replication_slots`, `pg_drop_replication_slot`, `CREATE PUBLICATION`,
  * and the `CREATE_REPLICATION_SLOT` walsender command.
  */
object SlotLifecycle {

  /** Result of `CREATE_REPLICATION_SLOT`: the slot's exported snapshot
    * (valid while the creating replication connection stays open) and the
    * consistent-point LSN at which the stream will begin. */
  final case class CreatedSlot(snapshotName: String, consistentPoint: Long)

  /** Port to the source database. `exec` runs generated SQL on the pool
    * connection; `createSlot` runs on the replication connection (the
    * walsender command is not plain SQL). */
  trait Catalog {
    /** (schema, table) rows of `pg_publication_tables` for the publication. */
    def publicationTables(pubName: String): Seq[(String, String)]
    /** `restart_lsn` of the slot, when it exists. */
    def slotRestartLsn(slotName: String): Option[Long]
    def exec(sql: String): Unit
    def createSlot(slotName: String): CreatedSlot
  }

  /** What `Run` decided: either a fresh slot whose exported snapshot must
    * be backfilled before streaming, or an existing slot to resume. */
  sealed trait Decision { def startLsn: Long }
  final case class BackfillFromSnapshot(snapshotName: String,
      consistentPoint: Long) extends Decision { def startLsn: Long = consistentPoint }
  final case class ResumeFrom(restartLsn: Long) extends Decision {
    def startLsn: Long = restartLsn
  }

  /** Raised when publication drift (or schema change) requires dropping
    * the slot but `sync.prohibitdropslot` forbids it — the reference
    * errors out rather than silently resyncing (sync_service.go:303). */
  final class DropSlotProhibited extends RuntimeException(
    "would drop replication slot but prevented by config")

  // ---------------------------------------------------------------- SQL --

  private def quoteIdent(id: String): String = PgSql.quoteIdent(id)
  private def quoteLit(s: String): String = PgSql.quoteLit(s)

  /** The reference names the publication after the slot (pubname = slotname
    * in both its queries), so one config key drives both. */
  def publicationTablesSql(pubName: String): String =
    s"SELECT schemaname, tablename FROM pg_publication_tables WHERE pubname = ${quoteLit(pubName)}"

  def slotStatusSql(slotName: String): String =
    s"SELECT restart_lsn FROM pg_replication_slots WHERE slot_name = ${quoteLit(slotName)}"

  def dropPublicationSql(pubName: String): String =
    s"DROP PUBLICATION IF EXISTS ${quoteIdent(pubName)}"

  /** `FOR TABLE ONLY`: child partitions do not ride along implicitly,
    * matching the reference's `create publication … for table only`. */
  def createPublicationSql(pubName: String, relations: Seq[Relation]): String =
    s"CREATE PUBLICATION ${quoteIdent(pubName)} FOR TABLE ONLY " +
      relations.map(r => s"${quoteIdent(r.schema)}.${quoteIdent(r.table)}")
        .mkString(", ")

  def dropSlotSql(slotName: String): String =
    s"SELECT pg_drop_replication_slot(${quoteLit(slotName)})"

  /** Walsender command; `EXPORT_SNAPSHOT` makes the snapshot name the
    * reference relies on available to other sessions. */
  def createSlotCommand(slotName: String): String =
    s"CREATE_REPLICATION_SLOT ${quoteIdent(slotName)} LOGICAL pgoutput (SNAPSHOT 'export')"

  // ----------------------------------------------------------- decisions --

  /** Exact-set publication check (sync_service.go:255-291): same count,
    * every configured (schema, table) present; an empty publication never
    * matches (it must be recreated to pick up the table list). */
  def publicationMatches(configured: Seq[Relation],
      actual: Seq[(String, String)]): Boolean = {
    val want = configured.map(r => (r.schema, r.table)).toSet
    actual.nonEmpty && actual.size == configured.size && want.subsetOf(actual.toSet)
  }

  /** Drop the slot if it exists (sync_service.go:300-315): the prohibit
    * check comes FIRST — configured protection fails the attempt even
    * before looking at the catalog, exactly like the reference. */
  def dropSlot(catalog: Catalog, slotName: String,
      prohibitDropSlot: Boolean): Unit = {
    if (prohibitDropSlot) throw new DropSlotProhibited
    if (catalog.slotRestartLsn(slotName).isDefined)
      catalog.exec(dropSlotSql(slotName))
  }

  /** The reference `Run` prologue: reconcile publication, then slot.
    * Returns what streaming should do next; all catalog mutations have
    * been executed through `catalog` by the time it returns. */
  def run(catalog: Catalog, slotName: String, relations: Seq[Relation],
      prohibitDropSlot: Boolean = false): Decision = {
    require(relations.nonEmpty, "must configure at least one table to sync")
    if (!publicationMatches(relations, catalog.publicationTables(slotName))) {
      // drift: the slot streams the OLD publication's table set, so it
      // goes first, then the publication is rebuilt from config
      dropSlot(catalog, slotName, prohibitDropSlot)
      catalog.exec(dropPublicationSql(slotName))
      catalog.exec(createPublicationSql(slotName, relations))
    }
    catalog.slotRestartLsn(slotName) match {
      case Some(restartLsn) => ResumeFrom(restartLsn)
      case None =>
        val created = catalog.createSlot(slotName)
        BackfillFromSnapshot(created.snapshotName, created.consistentPoint)
    }
  }

  /** Schema drift discovered after the slot exists (verifyRelations false,
    * or mid-stream relation change): drop the slot so the next supervised
    * run recreates it and re-snapshots (sync_service.go:95-110). */
  def resync(catalog: Catalog, slotName: String,
      prohibitDropSlot: Boolean = false): Unit =
    dropSlot(catalog, slotName, prohibitDropSlot)
}
