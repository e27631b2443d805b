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
  *     NEVER shuffled — a broadcast left-outer join applies updates/
  *     deletes in place, and unmatched actions resolve through
  *     changelog-bounded key sets harvested with broadcast semi-joins
  *     (each ≤ |changelog| rows). A full snapshot scan plus two
  *     key-column-pruned scans, zero snapshot shuffles.
  *   - **big batch** (backfill-sized changelogs): broadcasting would
  *     serialize on the driver (collect + hash-relation build per
  *     broadcast), so the merge is distributed sort-merge joins; the
  *     stage-2 reconciliation reuses stage 1's hash partitioning on the
  *     key columns, so the snapshot-sized side exchanges once. With the
  *     snapshot bucketed on the key (SnapshotWriter.publishBucketed) the
  *     snapshot side reads bucket-local and only the changelog exchanges.
  *
  *   Both regimes are the same two-stage function row-for-row (the
  *   stage-2 full-outer's right-only rows hit the NULL-`keep` CASE,
  *   which is exactly the insert semantics for TOAST-unchanged /
  *   explicit-NULL / unspecified columns) — and the two-stage shape is
  *   what makes the merge REPLAY-IDEMPOTENT for identity-changing
  *   updates: see the stage comments in `merge`.
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
          map_entry_or(col("keyBefore"), col("values"), col("nulls"),
            col("unchanged"), col("rekey"), k),
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
    // measurement is a COUNT of the narrow filtered changelog (cheap
    // against the cached compaction the streaming path supplies) — never
    // a localCheckpoint of the 4×-wide projection: a backfill-sized batch
    // would pin a multiplied copy of itself in executor storage with
    // truncated lineage purely to be counted, exactly what the pinned
    // big-batch path exists to avoid.
    val (clProjected, useBroadcast) = broadcastChangelog match {
      case Some(true)  => (clRaw.localCheckpoint(true), true)
      case Some(false) => (clRaw, false)
      case None =>
        if (cl.count() <= BroadcastMaxRows) (clRaw.localCheckpoint(true), true)
        else (clRaw, false)
    }

    // Identity equality: null-safe (`<=>`) for relations declaring
    // nullable identities (REPLICA IDENTITY FULL — `===` would never
    // match NULL-keyed rows: updates duplicate them, deletes no-op),
    // plain `===` otherwise: null-safe join keys cannot use a bucketed
    // scan's co-location, and PK/unique replica identities are NOT NULL
    // by Postgres's own rules, so the common case keeps the
    // exchange-free plan. The compactor's key model admits null identity
    // values either way (esc(null)).
    def keyEq(l: Column, r: Column): Column =
      if (relation.nullableIdentity) l <=> r else l === r
    val joinCond = keyCols.map(k => keyEq(snapshot(k), clProjected(s"__kb_$k"))).reduce(_ && _)

    // Shared row-merge: works on any (state ⟗ changelog) join shape.
    //   left-only  (__op NULL)     → untouched state row, kept as-is
    //   matched, op = D            → filtered out (delete)
    //   matched, op ≠ D            → per-column CASE merge
    //   right-only (state NULL)    → insert: `keep` is NULL, so
    //     TOAST-unchanged / explicit-NULL / unspecified all land NULL and
    //     identity columns take the after-image key — exactly the insert
    //     semantics, row-for-row (see object Scaladoc).
    // `keep` resolves a column of the state side (the original snapshot in
    // stage 1, the stage-1 output in stage 2).
    def applyActions(joined: DataFrame, keep: String => Column): DataFrame = joined
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(relation.columns.map { c =>
        val merged =
          when(col("__op").isNull, keep(c.name)) // untouched state row
            .when(col(s"__isunch_${c.name}"), keep(c.name)) // TOAST-unchanged
            .when(col(s"__isnull_${c.name}"), lit(null)) // explicit NULL
            .when(col(s"__has_${c.name}"), col(s"__new_${c.name}")) // new value
            .otherwise(keep(c.name)) // unspecified → keep
        val out =
          if (c.isIdentity)
            // identity columns land at the after-image key (rekey support)
            when(col("__op").isNull, keep(c.name)).otherwise(col(s"__ka_${c.name}"))
          else merged
        out.cast(snapshot.schema(c.name).dataType).as(c.name)
      }: _*)

    // ---- two-stage, replay-idempotent merge ----
    // Stage 1 applies every action whose key-BEFORE matches a snapshot row
    // (update / delete / move). Actions whose key-before matches nothing
    // ("orphans", op ≠ D) are NOT blindly inserted: on an at-least-once
    // replay, a rekeying update's row already lives at its key-AFTER, and
    // re-inserting it would duplicate the key. Stage 2 therefore
    // reconciles orphans against the key-after: an existing row is
    // re-merged in place (TOAST-unchanged columns keep their inherited
    // values, so the replay converges to the same state), an absent one
    // inserts. A replayed DELETE matches nothing and vanishes in stage 1;
    // a replayed INSERT's key-before matches its own row and re-merges.
    // Caveat (out of the compaction contract): two actions in one batch
    // whose key-AFTER collides (delete k2 + rekey k1→k2) remain ambiguous
    // under replay, exactly as in the reference's key-addressed MERGE.
    val snapKeys = snapshot.select(keyCols.map(snapshot(_)): _*)
    /** Changelog-bounded frames: materialized in the broadcast regime so
      * each feeds its several joins without re-running its snapshot
      * key-scan; left lazy in the big-batch regime (single use each). */
    def bounded(df: DataFrame): DataFrame =
      if (useBroadcast) df.localCheckpoint(true) else df
    def maybeB(df: DataFrame): DataFrame = if (useBroadcast) broadcast(df) else df

    // snapshot keys some action's key-before matches (≤ |changelog| rows)
    val matchedKb = bounded(snapKeys.join(maybeB(clProjected),
      keyCols.map(k => keyEq(snapKeys(k), clProjected(s"__kb_$k"))).reduce(_ && _),
      "left_semi"))
    val orphans = bounded(clProjected.filter(col("__op") =!= "D")
      .join(maybeB(matchedKb),
        keyCols.map(k => keyEq(clProjected(s"__kb_$k"), matchedKb(k))).reduce(_ && _),
        "left_anti"))

    // Stage 1: matched semantics. In the micro-batch regime the snapshot
    // is never shuffled (broadcast left-outer); in the big-batch regime
    // this is a distributed sort-merge join and, with the snapshot
    // bucketed on the key (SnapshotWriter.publishBucketed), the snapshot
    // side reads bucket-local and only the changelog exchanges.
    val s1 = applyActions(
      snapshot.join(maybeB(clProjected), joinCond, "left_outer"),
      c => snapshot(c))

    if (useBroadcast) {
      // Stage 2, micro-batch: split orphans by key-after existence with
      // changelog-bounded key sets; the stage-1 output joins only
      // broadcast sides, so the snapshot still never shuffles.
      val kaMatched = bounded(snapKeys.join(broadcast(orphans),
        keyCols.map(k => keyEq(snapKeys(k), orphans(s"__ka_$k"))).reduce(_ && _),
        "left_semi"))
      val orphanInSnap = orphans.join(broadcast(kaMatched),
        keyCols.map(k => keyEq(orphans(s"__ka_$k"), kaMatched(k))).reduce(_ && _),
        "left_semi")
      val inserts = orphans.join(broadcast(kaMatched),
        keyCols.map(k => keyEq(orphans(s"__ka_$k"), kaMatched(k))).reduce(_ && _),
        "left_anti")
        .select(relation.columns.map { c =>
          val v =
            if (c.isIdentity) col(s"__ka_${c.name}")
            else when(col(s"__isnull_${c.name}") || col(s"__isunch_${c.name}") ||
              !col(s"__has_${c.name}"), lit(null))
              .otherwise(col(s"__new_${c.name}"))
          v.cast(snapshot.schema(c.name).dataType).as(c.name)
        }: _*)
      applyActions(
        s1.join(broadcast(orphanInSnap),
          keyCols.map(k => keyEq(s1(k), orphanInSnap(s"__ka_$k"))).reduce(_ && _),
          "left_outer"),
        c => s1(c))
        .unionByName(inserts)
    } else {
      // Stage 2, big-batch: one full-outer join on the key-after —
      // matched orphans re-merge in place, right-only orphans insert
      // (the NULL-keep CASE), left-only stage-1 rows pass through. The
      // stage-1 output is already hash-partitioned by the key columns,
      // so only the (rare) orphan side exchanges.
      applyActions(
        s1.join(orphans,
          keyCols.map(k => keyEq(s1(k), orphans(s"__ka_$k"))).reduce(_ && _),
          "full_outer"),
        c => s1(c))
    }
  }

  /** keyAfter for one identity column, columnar: before-value when not
    * rekeying or TOAST-unchanged, explicit NULL when the rekey sets the
    * column to NULL (mirrors ChangeAction.keyAfter — a coalesce here
    * would silently resurrect the old identity value), else the new
    * value (db.go:160-176). */
  private def map_entry_or(keyBefore: Column, values: Column, nulls: Column,
      unchanged: Column, rekey: Column, k: String): Column =
    when(!rekey || array_contains(unchanged, k), element_at(keyBefore, k))
      .when(array_contains(nulls, k), lit(null))
      .otherwise(coalesce(element_at(values, k), element_at(keyBefore, k)))
}
