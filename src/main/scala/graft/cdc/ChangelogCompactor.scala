package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** A row-level change action, the engine's analogue of the reference's
  * `db.RowAction` (sync/db/db.go:124-138):
  *
  *   - `keyBefore`  — replica-identity values *before* the action
  *     (text format), i.e. `RowIdentityBefore`;
  *   - `values`     — new column values (text) after the action; empty for
  *     deletes; a column absent from `values`/`nulls`/`unchanged` means
  *     "not specified → keep" (upsert ergonomics);
  *   - `nulls`      — columns explicitly set NULL (`Value.Null`);
  *   - `unchanged`  — TOAST-unchanged columns whose value was not shipped
  *     and must be taken from the target row (`Value.Unchanged`);
  *   - `rekey`      — update changed the row identity
  *     (`ChangesRowIdentity`);
  *   - `(lsn, seq)` — total order of the action in the WAL stream (commit
  *     LSN + position within the transaction).
  */
final case class ChangeAction(
    table: String,
    lsn: Long,
    seq: Int,
    op: String, // "I" | "U" | "D"
    keyBefore: Map[String, String],
    values: Map[String, String],
    nulls: Seq[String],
    unchanged: Seq[String],
    rekey: Boolean) {

  /** Row identity after the action (db.go:160-176 `AfterActionRowIdentity`):
    * identity columns take the new value unless TOAST-unchanged — where
    * "new value" includes an EXPLICIT NULL (a nullable identity column
    * under REPLICA IDENTITY FULL can be set to NULL; the key model
    * already admits null values — see `esc`'s dedicated null rendering —
    * so ignoring `nulls` here would address the row at an identity it no
    * longer has). */
  def keyAfter: Map[String, String] =
    if (!rekey) keyBefore
    else keyBefore.map { case (k, v) =>
      k -> (if (unchanged.contains(k)) v
            else if (nulls.contains(k)) null
            else values.getOrElse(k, v))
    }

  /** Value state of one column: Right(valueOrNull) when specified,
    * Left(true) = TOAST-unchanged, Left(false) = unspecified. */
  private[cdc] def colState(c: String): Either[Boolean, Option[String]] =
    if (unchanged.contains(c)) Left(true)
    else if (nulls.contains(c)) Right(None)
    else values.get(c) match {
      case Some(v) => Right(Some(v))
      case None    => Left(false)
    }
}

/** Distributed changelog compaction — the engine's re-expression of the
  * reference's per-batch action dedup
  * (target/common/multirowaction/multi_row_action.go:69-180).
  *
  * The reference walks the batch sequentially through a driver-side
  * `map[rowIdentity]action`; at 100 TB of changes that map is the
  * bottleneck, so here compaction is a key-partitioned aggregation:
  *
  *  - **cold path** (actions that never change their row identity — the
  *    overwhelming majority): one shuffle on `(table, key)`, then an
  *    in-order fold of each key's actions with `mergeActions`. Exactly the
  *    reference's semantics, because for a fixed key the reference's map
  *    degenerates to the same fold.
  *  - **hot path** (actions whose key is an endpoint of some
  *    identity-changing update): these can form chains across keys
  *    (k1→k2→k3), which no single-key grouping can see. They are rare —
  *    bounded by the number of rekeying updates — so they are grouped per
  *    table and folded with the full sequential algorithm, bit-for-bit the
  *    reference's `deduplicateActions`.
  *
  * The result is order-independent per key (each surviving action touches
  * an independent row), exactly as the reference guarantees.
  */
object ChangelogCompactor extends Serializable {

  /** Canonical grouping key for a row identity. Injective: the framing
    * characters \u0001/\u0002 (and null values) are escaped with \u0000,
    * so no key/value content can forge another identity's rendering \u2014
    * {"a"\u2192"x\u0002b\u0001y"} and {"a"\u2192"x","b"\u2192"y"} render differently. */
  private[cdc] def keyStr(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => esc(k) + "\u0001" + esc(v) }.mkString("\u0002")

  /** Escape \u0000 \u0001 \u0002 so [[keyStr]] is injective; null (legal in a
    * parsed identity map) gets its own code point pair. */
  private[cdc] def esc(s: String): String =
    if (s == null) "\u0000n"
    else s.replace("\u0000", "\u0000\u0000")
      .replace("\u0001", "\u00001").replace("\u0002", "\u00002")

  /** Merge two consecutive actions for the same row
    * (multi_row_action.go:103-180 `mergeActions`). `None` = the pair is a
    * no-op (insert then delete). Invalid sequences throw, as the reference
    * errors the batch. */
  def mergeActions(a: ChangeAction, b: ChangeAction): Option[ChangeAction] = {
    def mergedValueState(): (Map[String, String], Seq[String], Seq[String]) = {
      // Column-wise: take b's state unless b marks the column
      // TOAST-unchanged, in which case a's state flows through
      // (multi_row_action.go:122-127).
      val cols = a.values.keySet ++ a.nulls ++ a.unchanged ++
        b.values.keySet ++ b.nulls ++ b.unchanged
      val states = cols.toSeq.map { c =>
        val st = if (b.unchanged.contains(c)) a.colState(c) match {
          case Left(false) => Left(true) // unknown in a → still unchanged
          case other       => other
        } else b.colState(c)
        c -> st
      }
      val values = states.collect { case (c, Right(Some(v))) => c -> v }.toMap
      val nulls = states.collect { case (c, Right(None)) => c }
      val unch = states.collect { case (c, Left(true)) => c }
      (values, nulls, unch)
    }
    (a.op, b.op) match {
      case ("I", "U") =>
        val (v, n, u) = mergedValueState()
        // insert absorbs the update; identity taken from merged values
        // (multi_row_action.go:121-141)
        val key = b.keyAfter
        Some(ChangeAction(a.table, b.lsn, b.seq, "I", key, v, n, u, rekey = false))
      case ("U", "U") =>
        val (v, n, u) = mergedValueState()
        Some(ChangeAction(a.table, b.lsn, b.seq, "U", a.keyBefore, v, n, u,
          rekey = a.rekey || b.rekey))
      case ("I", "D") => None // elide (multi_row_action.go:156-157)
      case ("U", "D") =>
        // delete wins; if a re-keyed, the delete must target a's original
        // identity (multi_row_action.go:158-168)
        Some(ChangeAction(a.table, b.lsn, b.seq, "D", a.keyBefore,
          Map.empty, Nil, Nil, rekey = false))
      case ("D", "I") =>
        // delete then re-insert → update (multi_row_action.go:169-175).
        // The reference hardcodes ChangesRowIdentity=false here; that is
        // sound because a (D,I) merge is only REACHABLE when the insert's
        // identity equals the deleted row's (the dedup map joins on
        // b.BeforeActionRowIdentity == a.AfterActionRowIdentity) — our
        // keyDiffers computes the same false in every reachable state and
        // stays correct for direct mergeActions callers outside the map.
        Some(ChangeAction(a.table, b.lsn, b.seq, "U", a.keyBefore,
          b.values, b.nulls, b.unchanged, rekey = keyDiffers(a.keyBefore, b.keyAfter)))
      case (x, y) =>
        throw new IllegalStateException(
          s"invalid action sequence ($x, $y) for key ${a.keyBefore} in ${a.table}")
    }
  }

  private def keyDiffers(a: Map[String, String], b: Map[String, String]): Boolean =
    a != b

  /** The reference's sequential `deduplicateActions`
    * (multi_row_action.go:69-101): a map keyed on *current* row identity,
    * re-keyed as identity-changing updates land. Used for the (rare,
    * chain-capable) hot partition and as the test oracle. */
  def sequentialDedup(in: Seq[ChangeAction]): Seq[ChangeAction] =
    sequentialDedupOrdered(in.sortBy(a => (a.lsn, a.seq)).iterator).toSeq

  /** STREAMING form over an already (lsn, seq)-ordered iterator — the hot
    * path feeds it through `flatMapSortedGroups`' secondary sort, so the
    * in-memory state is the dedup map itself (one entry per DISTINCT live
    * key in the group, plus displaced deletes), never the group's raw
    * actions: a hot ordinary key that happens to share an identity with
    * one rekey endpoint can carry millions of actions without
    * materializing them. */
  def sequentialDedupOrdered(in: Iterator[ChangeAction]): Iterator[ChangeAction] = {
    val rowMap = scala.collection.mutable.LinkedHashMap.empty[String, ChangeAction]
    // Deletes displaced by DEAD-IDENTITY REUSE: a rekey INTO an identity
    // the batch previously deleted (D(k2) … U(k1→k2)) stores its entry at
    // the D's slot — the map is keyed by CURRENT identity, and the dead
    // row has no current identity to keep it addressable. Overwriting
    // silently would drop the delete from the compacted batch and the
    // target would keep BOTH the old k2 row and the moved one. Displaced
    // deletes are final (their row is dead; nothing can merge with them)
    // and move to this buffer instead. NOTE this relaxes the
    // "after-keys unique" output invariant to "at most one NON-DELETE per
    // after-key": MergeInto applies the (D, rekey-in) pair correctly
    // because each snapshot row meets each action independently.
    val displaced = scala.collection.mutable.Buffer.empty[ChangeAction]
    def store(slot: String, a: ChangeAction): Unit = rowMap.get(slot) match {
      case None => rowMap(slot) = a
      case Some(occupant) if occupant.op == "D" =>
        // incoming claim on a dead identity: the delete is final
        displaced += occupant; rowMap(slot) = a
      case Some(_) if a.op == "D" =>
        // the incoming is a chain-collapsed delete keyed at its ORIGIN
        // identity, which a fresh live row (inserted after the origin was
        // freed mid-batch) now occupies — the delete is final and the
        // LIVE entry must stay addressable for later actions
        displaced += a
      case Some(_) =>
        throw new IllegalStateException(
          s"two live rows claim identity ${a.keyAfter} in ${a.table}")
    }
    in.foreach { action =>
      rowMap.get(keyStr(action.keyBefore)) match {
        case None =>
          store(keyStr(action.keyAfter), action)
        case Some(existing) =>
          mergeActions(existing, action) match {
            case None => rowMap.remove(keyStr(existing.keyAfter))
            case Some(merged) =>
              // remove the superseded entry unconditionally so `store`'s
              // occupant check never sees the entry being replaced
              rowMap.remove(keyStr(existing.keyAfter))
              store(keyStr(merged.keyAfter), merged)
          }
      }
    }
    (rowMap.values ++ displaced).iterator
  }

  /** Hot-key collection guard: above this many distinct rekey endpoints the
    * batch is degenerate (mass key rewrite) and we fall back to the
    * sequential path for every table that rekeys, rather than ship a giant
    * broadcast. */
  private val DefaultMaxHotKeys = 1 << 20

  /** @param hasRekeys caller's knowledge of whether the batch can contain
    *   identity-changing updates. `Some(false)` (e.g. the table's replica
    *   identity makes rekeys impossible, or the stream producer already
    *   knows) skips both the probe AND the input materialization — the
    *   whole compaction is then exactly one shuffle over a single
    *   execution of the input pipeline. `None` probes the data. */
  def compact(actions: Dataset[ChangeAction],
      maxHotKeys: Int = DefaultMaxHotKeys,
      hasRekeys: Option[Boolean] = None): Dataset[ChangeAction] = {
    val spark = actions.sparkSession
    import spark.implicits._

    if (hasRekeys.contains(false)) return foldGroups(actions)

    // The rekey probe, the hot-endpoint collection and the fold all need
    // the input. Without materialization each is a FULL re-execution of
    // the upstream pipeline (limit(1) over a filter that matches nothing
    // still scans everything) — measured 6× on a window-synthesized 600k
    // stream. A local checkpoint runs the pipeline once and every pass
    // below re-reads its blocks; micro-batch inputs are bounded so the
    // block footprint is bounded, and cleanup is reference-managed.
    val mat = actions.localCheckpoint(true)

    // Columnar existence probe: `rekey` is a plain boolean column, so this
    // scans checkpoint blocks without deserializing a single ChangeAction.
    val anyRekey = mat.toDF().where(col("rekey")).limit(1).count() > 0

    // collect limit+1 so overflow is DETECTED, never silently truncated —
    // a dropped endpoint would route chain members to the cold path, which
    // groups only by keyBefore and cannot follow rekey chains.
    val collected: Array[(String, String)] =
      if (!anyRekey) Array.empty
      else mat
        .filter(_.rekey)
        .flatMap(a => Seq((a.table, keyStr(a.keyBefore)), (a.table, keyStr(a.keyAfter))))
        .distinct()
        .limit(maxHotKeys + 1)
        .collect()

    if (collected.isEmpty) {
      // Fast path: pure key-partitioned fold, no second pass.
      foldGroups(mat)
    } else if (collected.length > maxHotKeys) {
      // Degenerate batch (mass key rewrite): the endpoint set is too big to
      // broadcast, so the documented degradation applies — every table that
      // contains a rekeying update is compacted wholly by the sequential
      // reference algorithm; tables without rekeys still take the
      // distributed cold path.
      val rekeyTables = mat.filter(_.rekey).map(_.table).distinct().collect().toSet
      val hotTables = spark.sparkContext.broadcast(rekeyTables)
      val cold = foldGroups(mat.filter(a => !hotTables.value.contains(a.table)))
      val hotCompacted = mat.filter(a => hotTables.value.contains(a.table))
        .groupByKey(_.table)
        // secondary sort + streaming fold: state = the dedup map (distinct
        // keys), never the group's raw actions (see sequentialDedupOrdered)
        .flatMapSortedGroups(col("lsn"), col("seq")) { (_, it) =>
          sequentialDedupOrdered(it) }
      cold.union(hotCompacted)
    } else {
      val hot = spark.sparkContext.broadcast(collected.toSet)
      val isHot = hotPredicate(hot)
      val cold = foldGroups(mat.filter(a => !isHot(a)))
      val hotCompacted = mat.filter(a => isHot(a))
        .groupByKey(_.table)
        // secondary sort + streaming fold: a hot ORDINARY key sharing an
        // identity with a rekey endpoint routes all its actions here, so
        // the group can be arbitrarily larger than the rekey count — the
        // sorted-iterator fold keeps memory at distinct-keys, not actions
        .flatMapSortedGroups(col("lsn"), col("seq")) { (_, it) =>
          sequentialDedupOrdered(it) }
      cold.union(hotCompacted)
    }
  }

  private def hotPredicate(hot: org.apache.spark.broadcast.Broadcast[Set[(String, String)]])
      : ChangeAction => Boolean =
    a => hot.value.contains((a.table, keyStr(a.keyBefore))) ||
      hot.value.contains((a.table, keyStr(a.keyAfter)))

  /** Columnar fast-path compaction for *simple* streams: full-row images
    * (every value column present on I/U), no TOAST-unchanged, no
    * identity-changing updates — which is exactly what Postgres logical
    * replication emits with REPLICA IDENTITY FULL and no TOAST cutoffs,
    * and what Debezium-style CDC feeds look like.
    *
    * Under those invariants the per-key fold collapses to first/last
    * bookkeeping — (first=I, last=D) → elide; last=D → delete; first=I → I;
    * else → U with the last row image — so the shared sort-fold machinery
    * ([[clusterByKey]] + a streaming run iterator) runs with O(1) state
    * per group and no column-wise value merge. Deliberately NOT an
    * aggregation (`min_by`/`max_by` over the row struct would be fewer
    * lines): aggregation buffers holding map-typed structs are the exact
    * allocation profile that GC-collapsed at millions of keys in the
    * round-5 ladder, and the plan-shape spec pins the sort-fold form.
    * Same one-shuffle shape as [[compact]], cheaper per row; equivalence
    * is property-tested. */
  def compactSimple(actions: Dataset[ChangeAction]): Dataset[ChangeAction] = {
    val spark = actions.sparkSession
    import spark.implicits._
    clusterByKey(actions).mapPartitions(foldSimpleRuns)
  }

  /** First/last bookkeeping over one partition of key-clustered,
    * (lsn,seq)-ordered actions: O(1) state per group, no value-state merge
    * (the full-row-image invariant makes column-wise merging unnecessary). */
  private def foldSimpleRuns(rows: Iterator[ChangeAction]): Iterator[ChangeAction] =
    new GroupRunIterator(rows, { (first, it) =>
      val firstOp = first.op
      var last = first
      while (it.hasNext) last = it.next()
      if (firstOp == "I" && last.op == "D") None
      else {
        val op = if (last.op == "D") "D" else if (firstOp == "I") "I" else "U"
        Some(
          if (op == "D")
            ChangeAction(last.table, last.lsn, last.seq, "D", last.keyBefore,
              Map.empty, Nil, Nil, rekey = false)
          else
            ChangeAction(last.table, last.lsn, last.seq, op, last.keyBefore,
              last.values, last.nulls, Nil, rekey = false))
      }
    })

  /** Cold-path fold, sort-based and streaming: one shuffle on the row
    * identity, an in-partition sort on `(key, lsn, seq)`, then a
    * constant-memory running fold per key. No per-group array is ever
    * materialized — the earlier `collect_list`-per-key shape was CPU-linear
    * at sf0.1 but collapsed under allocation/GC pressure at millions of
    * keys (round-5 ladder: 10× data → 34× wall, 13× CPU per row), because
    * every key's actions were copied into an aggregation-buffer array of
    * map-typed structs before the fold could run. Here the exchange and the
    * external sorter stream Tungsten rows, and exactly one `ChangeAction`
    * accumulator per in-flight group lives on the heap. Identical semantics
    * (property-tested against `sequentialDedup`).
    *
    * The shuffle/sort key is the FLAT injective [[keyStr]] rendering of
    * the row identity, computed columnar-side by a StaticInvoke kernel.
    * Injectivity matters (an unescaped `cast(map_entries(...) as string)`
    * would let a crafted value forge another key's rendering and merge two
    * distinct rows) and [[esc]] provides it; flatness matters just as
    * much: a string sort key compares as one memcmp inside the external
    * sorter, where the previous `array<struct>` key paid an interpreted
    * nested comparator per comparison — ~100 CPU-seconds of pure
    * comparison overhead on the 6M-action ladder input. Group
    * *boundaries* inside a partition are detected by structural `Map`
    * equality (injective by definition, and it agrees with the keyStr
    * sort key: two identity maps are equal iff their renderings are), so
    * the detection is forgery-safe too. */
  private def foldGroups(actions: Dataset[ChangeAction]): Dataset[ChangeAction] = {
    val spark = actions.sparkSession
    import spark.implicits._
    clusterByKey(actions).mapPartitions(foldRuns)
  }

  /** Hash-partition on `(table, row identity)` and sort each partition by
    * `(table, key, lsn, seq)` so every key's actions form one contiguous,
    * WAL-ordered run.
    *
    * The flat [[CompactKeys.keyStrCol]] rendering is used twice but
    * SHIPPED never: the repartition takes the key *expression* (evaluated
    * map-side for the partition id only — `RepartitionByExpression` does
    * not project its partition expressions into the output), and the sort
    * key is materialized as a column AFTER the exchange, from the
    * `keyBefore` map that crosses the wire anyway. Materializing `__key`
    * before the exchange doubled the shuffle payload (round-8 ladder:
    * 25.8→47.3 MB on the same stream) for bytes that are a pure function
    * of bytes already shipped. The post-exchange materialization matters
    * for the sort too: a sort ORDER BY a non-attribute expression
    * re-evaluates it per comparison inside the external sorter, while a
    * column is rendered once per row and compared as one memcmp. */
  private def clusterByKey(actions: Dataset[ChangeAction]): Dataset[ChangeAction] = {
    val spark = actions.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    actions.toDF()
      .repartition(col("table"), CompactKeys.keyStrCol(col("keyBefore")))
      .withColumn("__key", CompactKeys.keyStrCol(col("keyBefore")))
      .sortWithinPartitions(col("table"), col("__key"), col("lsn"), col("seq"))
      .drop("__key")
      .as[ChangeAction]
  }

  private def foldRuns(rows: Iterator[ChangeAction]): Iterator[ChangeAction] =
    new GroupRunIterator(rows, { (first, it) =>
      var acc: Option[ChangeAction] = Some(first)
      while (it.hasNext) {
        val nxt = it.next()
        acc = acc match {
          case None           => Some(nxt)
          case Some(existing) => mergeActions(existing, nxt)
        }
      }
      acc
    })

  /** Streams one partition of key-clustered actions as per-group folds.
    * `foldGroup` receives the group's first action plus an iterator of the
    * rest (valid only until it returns) and yields the surviving action, if
    * any. Groups whose fold elides (insert→delete) produce nothing. */
  private final class GroupRunIterator(
      rows: Iterator[ChangeAction],
      foldGroup: (ChangeAction, Iterator[ChangeAction]) => Option[ChangeAction])
    extends Iterator[ChangeAction] {

    private val buf = rows.buffered
    private var out: ChangeAction = _
    private var ready = false

    private def advance(): Unit = {
      while (!ready && buf.hasNext) {
        val first = buf.next()
        val table = first.table
        val key = first.keyBefore
        val rest: Iterator[ChangeAction] = new Iterator[ChangeAction] {
          def hasNext: Boolean = buf.hasNext &&
            buf.head.table == table && buf.head.keyBefore == key
          def next(): ChangeAction =
            if (hasNext) buf.next() else throw new NoSuchElementException
        }
        foldGroup(first, rest) match {
          case Some(a) =>
            while (rest.hasNext) rest.next() // foldGroup may stop early
            out = a
            ready = true
          case None =>
            while (rest.hasNext) rest.next()
        }
      }
    }

    override def hasNext: Boolean = { if (!ready) advance(); ready }
    override def next(): ChangeAction = {
      if (!hasNext) throw new NoSuchElementException
      ready = false
      out
    }
  }
}

/** Columnar [[ChangelogCompactor.keyStr]]: the same escaped, injective
  * rendering computed directly over Spark `MapData` (StaticInvoke kernel,
  * no per-row Scala Map), so the compaction shuffle/sort key is a flat
  * string — one memcmp per sort comparison instead of an interpreted
  * nested `array<struct>` comparator. Rendering-identical to the Scala
  * form (spec-pinned), so in-partition structural boundary detection and
  * the sequential hot path agree with the shuffle key by construction. */
private[graft] object CompactKeys {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftBridge
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.catalyst.util.MapData
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  def keyStrCol(m: Column): Column =
    GraftBridge.column(StaticInvoke(
      CompactKeys.getClass, StringType, "keyString",
      Seq(GraftBridge.expression(m)),
      inputTypes = Seq(MapType(StringType, StringType)),
      propagateNull = true, returnNullable = true))

  def keyString(m: MapData): UTF8String = {
    val n = m.numElements()
    val ks = m.keyArray()
    val vs = m.valueArray()
    def valAt(i: Int): String =
      if (vs.isNullAt(i)) null else vs.getUTF8String(i).toString
    if (n == 0) return UTF8String.EMPTY_UTF8
    // single-column identities are the overwhelming majority: no sort, no
    // index array, no boxing on the hot path
    if (n == 1)
      return UTF8String.fromString(
        ChangelogCompactor.esc(ks.getUTF8String(0).toString) + "\u0001" +
          ChangelogCompactor.esc(valAt(0)))
    val keys = new Array[String](n)
    var i = 0
    while (i < n) { keys(i) = ks.getUTF8String(i).toString; i += 1 }
    // stable sort by key -- same Ordering[String] as keyStr's sortBy
    val sorted = Array.range(0, n).sortBy(keys)
    val sb = new java.lang.StringBuilder
    var j = 0
    var first = true
    while (j < n) {
      val p = sorted(j)
      // duplicate map keys (legal in MapData read from file sources; a
      // Scala Map cannot carry them) collapse to the LAST occurrence --
      // exactly what Map construction does when the row is deserialized,
      // so the rendering and the structural boundary check stay equal
      if (j + 1 >= n || keys(sorted(j + 1)) != keys(p)) {
        if (!first) sb.append('\u0002')
        first = false
        sb.append(ChangelogCompactor.esc(keys(p))).append('\u0001')
        sb.append(ChangelogCompactor.esc(valAt(p)))
      }
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
