package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** MERGE a compacted changelog into a snapshot table — the engine's
  * re-expression of the reference's staged `MERGE INTO` per table
  * (target/snowflake/snowflake_target.go:536-602):
  *
  *   matched ∧ delete-flag            → delete
  *   matched                          → per-column CASE: TOAST-unchanged →
  *                                      keep target value; explicit NULL →
  *                                      NULL; else new value
  *   not matched (and not a delete)   → insert
  *
  * Scale shape — two declared regimes, selected by changelog size unless
  * the caller pins one:
  *
  *   - **micro-batch** (the streaming steady state): the changelog is
  *     orders of magnitude smaller than the snapshot, so the snapshot is
  *     NEVER shuffled — a broadcast left-outer join applies updates/deletes
  *     in place, and inserts are found by anti-joining the (small)
  *     changelog against the set of matched keys (itself ≤ |changelog|,
  *     harvested with a broadcast semi-join). Two snapshot scans, zero
  *     snapshot shuffles.
  *   - **big batch** (backfill-sized changelogs): broadcasting would
  *     serialize on the driver (collect + hash-relation build per
  *     broadcast), so the merge becomes ONE full-outer sort-merge join —
  *     a single snapshot scan, everything distributed, nothing
  *     driver-sized. With the snapshot bucketed on the key
  *     (SnapshotWriter.publishBucketed) the snapshot side reads
  *     bucket-local and only the changelog is exchanged.
  *
  *   The full-outer form and the two-branch broadcast form are the same
  *   function row-for-row: for a right-only row the snapshot-side `keep`
  *   column is NULL, which is exactly the insert semantics for
  *   TOAST-unchanged / explicit-NULL / unspecified columns.
  *
  * Deviation from the reference, documented: an *insert* arising from an
  * action with TOAST-unchanged columns leaves those columns NULL. (The
  * reference stages an empty string and inserts it —
  * snowflake_target.go:554-566 consults `_IS_UNCHANGED_*` only in the
  * update branch — which types like INT silently corrupt. NULL is the
  * defensible reading; the reference itself flags this area with TODOs,
  * db.go:153.)
  */
object MergeInto {

  /** Above this many compacted actions the broadcast regime's driver-side
    * builds stop paying for themselves (round-5 ladder: 1M-action merge ran
    * at 0.85 cores, all serialization) and the full-outer shuffle regime
    * takes over. */
  private val BroadcastMaxRows = 400_000L

  /** Size-adaptive entry: measures the compacted changelog (materialized
    * once via localCheckpoint, which the broadcast build needs anyway) and
    * picks the regime: ≤ [[BroadcastMaxRows]] actions → broadcast,
    * else full-outer sort-merge. */
  def apply(snapshot: DataFrame, changelog: Dataset[ChangeAction],
      relation: Relation): DataFrame =
    merge(snapshot, changelog, relation, None)

  /** Caller-pinned regime — `broadcastChangelog = false` is the declared
    * big-batch configuration (pair with a bucketed snapshot to keep the
    * snapshot side exchange-free). */
  def apply(snapshot: DataFrame, changelog: Dataset[ChangeAction], relation: Relation,
      broadcastChangelog: Boolean): DataFrame =
    merge(snapshot, changelog, relation, Some(broadcastChangelog))

  /** @param snapshot  current table state (typed columns per `relation`)
    * @param changelog compacted actions for `relation.table` (compact first:
    *                  [[ChangelogCompactor.compact]]) — after compaction all
    *                  surviving actions touch independent rows, so the merge
    *                  is order-free, exactly as the reference requires
    *                  (multi_row_action.go:65-68). */
  private def merge(snapshot: DataFrame, changelog: Dataset[ChangeAction], relation: Relation,
      broadcastChangelog: Option[Boolean]): DataFrame = {
    val keyCols = relation.identityColumnNames
    require(keyCols.nonEmpty, s"relation ${relation.qualifiedName} has no identity columns")

    // Changelog → one typed row per action:
    //   __op, key_before cols (kb_*), after-image state per column
    //   (new value / is-null / is-unchanged / key-after for identity cols).
    val cl = changelog.filter(col("table") === relation.table)
    val clRaw = cl.select(
      col("op").as("__op") +:
      keyCols.map(k =>
        PgValues.castText(element_at(col("keyBefore"), k),
          relation.columns.find(_.name == k).get.pgOid).as(s"__kb_$k")) ++:
      keyCols.map(k =>
        PgValues.castText(
          map_entry_or(col("keyBefore"), col("values"), col("unchanged"), col("rekey"), k),
          relation.columns.find(_.name == k).get.pgOid).as(s"__ka_$k")) ++:
      relation.columns.flatMap { c =>
        Seq(
          PgValues.castText(element_at(col("values"), c.name), c.pgOid, c.isArray)
            .as(s"__new_${c.name}"),
          array_contains(col("nulls"), c.name).as(s"__isnull_${c.name}"),
          array_contains(col("unchanged"), c.name).as(s"__isunch_${c.name}"),
          map_contains_key(col("values"), c.name).as(s"__has_${c.name}"))
      }: _*)

    // Regime selection. In the broadcast regime the projected changelog
    // feeds three places (the broadcast build for the outer join, the
    // semi-join probe, and the anti-join stream side); without
    // materialization the upstream changelog pipeline re-executes for each,
    // so it is localCheckpoint'd (micro-batch-sized by contract, bounded).
    // When the caller pins the big-batch regime the changelog feeds exactly
    // one join and is left unmaterialized — at backfill scale caching it
    // would only burn executor memory. When nothing is pinned, the
    // checkpoint doubles as the measurement: count it (free, already
    // materialized) and compare to BroadcastMaxRows.
    val (clProjected, useBroadcast) = broadcastChangelog match {
      case Some(true)  => (clRaw.localCheckpoint(true), true)
      case Some(false) => (clRaw, false)
      case None =>
        val ckpt = clRaw.localCheckpoint(true)
        (ckpt, ckpt.count() <= BroadcastMaxRows)
    }

    val joinCond = keyCols.map(k => snapshot(k) === clProjected(s"__kb_$k")).reduce(_ && _)

    // Shared row-merge: works on any (snapshot ⟗ changelog) join shape.
    //   left-only  (__op NULL)     → untouched snapshot row, kept as-is
    //   matched, op = D            → filtered out (delete)
    //   matched, op ≠ D            → per-column CASE merge
    //   right-only (snapshot NULL) → insert: `keep` is NULL, so
    //     TOAST-unchanged / explicit-NULL / unspecified all land NULL and
    //     identity columns take the after-image key — exactly the insert
    //     semantics, row-for-row (see object Scaladoc).
    def applyActions(joined: DataFrame): DataFrame = joined
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(relation.columns.map { c =>
        val keep = snapshot(c.name)
        val merged =
          when(col("__op").isNull, keep) // untouched snapshot row
            .when(col(s"__isunch_${c.name}"), keep) // TOAST-unchanged
            .when(col(s"__isnull_${c.name}"), lit(null)) // explicit NULL
            .when(col(s"__has_${c.name}"), col(s"__new_${c.name}")) // new value
            .otherwise(keep) // unspecified → keep
        val out =
          if (relation.columns.find(_.name == c.name).get.isIdentity)
            // identity columns land at the after-image key (rekey support)
            when(col("__op").isNull, keep).otherwise(col(s"__ka_${c.name}"))
          else merged
        out.cast(snapshot.schema(c.name).dataType).as(c.name)
      }: _*)

    if (useBroadcast) {
      // Micro-batch regime: snapshot is never shuffled. Spark cannot
      // broadcast the build side of a FULL OUTER hash join, hence the
      // two-branch shape (left-outer for updates/deletes + anti-join for
      // inserts), each side broadcasting only changelog-sized inputs.
      val joined = snapshot.join(broadcast(clProjected), joinCond, "left_outer")
      val updated = applyActions(joined)

      // inserts: changelog keys that matched nothing in the snapshot
      val matchedKeys = snapshot
        .select(keyCols.map(snapshot(_)): _*)
        .join(broadcast(clProjected), joinCond, "left_semi")
      val inserts = clProjected
        .filter(col("__op") =!= "D")
        .join(broadcast(matchedKeys),
          keyCols.map(k => clProjected(s"__kb_$k") === matchedKeys(k)).reduce(_ && _),
          "left_anti")
        .select(relation.columns.map { c =>
          val v =
            if (c.isIdentity) col(s"__ka_${c.name}")
            else when(col(s"__isnull_${c.name}") || col(s"__isunch_${c.name}") ||
              !col(s"__has_${c.name}"), lit(null))
              .otherwise(col(s"__new_${c.name}"))
          v.cast(snapshot.schema(c.name).dataType).as(c.name)
        }: _*)

      updated.unionByName(inserts)
    } else {
      // Big-batch regime: ONE full-outer sort-merge join — a single
      // snapshot scan, fully distributed, nothing driver-sized. With the
      // snapshot bucketed on the key (SnapshotWriter.publishBucketed) the
      // snapshot side reads bucket-local and only the changelog exchanges.
      applyActions(snapshot.join(clProjected, joinCond, "full_outer"))
    }
  }

  /** keyAfter for one identity column, columnar: before-value when not
    * rekeying or TOAST-unchanged, else the new value (db.go:160-176). */
  private def map_entry_or(keyBefore: Column, values: Column, unchanged: Column,
      rekey: Column, k: String): Column =
    when(!rekey || array_contains(unchanged, k), element_at(keyBefore, k))
      .otherwise(coalesce(element_at(values, k), element_at(keyBefore, k)))
}
