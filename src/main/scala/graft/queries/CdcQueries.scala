package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc._
import graft.sources.Tables

/** CDC-core query entries (SURVEY.md §2.1) for the driver's oracle gate.
  *
  * The testdata has no changelog table, so each query *synthesizes* a valid
  * change stream deterministically from the TPC-H-ish tables (window
  * functions over `events`/`orders`), runs the real engine operator on it,
  * and the DuckDB oracle recomputes the expected end state relationally.
  */
object CdcQueries {

  /** Valid per-user action stream over events: first event per user is the
    * row's INSERT, later events are UPDATEs, and a final 'error' event is
    * the row's DELETE. */
  private def eventActions(s: SparkSession, dir: String) = {
    import s.implicits._
    // columnar synthesis: map()/when() expressions instead of a typed
    // .map building per-row Scala Maps — the stream stays Tungsten all the
    // way to the compactor's per-group fold
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val op = when(col("rn") === 1, "I")
      .when(col("rn") === col("n") && col("event_type") === "error", "D")
      .otherwise("U")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .select(
        lit("users").as("table"),
        col("event_id").as("lsn"),
        lit(0).as("seq"),
        op.as("op"),
        map(lit("id"), col("user_id").cast("string")).as("keyBefore"),
        when(op === "D", map().cast("map<string,string>"))
          .otherwise(map(lit("id"), col("user_id").cast("string"),
            lit("val"), col("value").cast("string"))).as("values"),
        array().cast("array<string>").as("nulls"),
        array().cast("array<string>").as("unchanged"),
        lit(false).as("rekey"))
      .as[ChangeAction]
  }

  /** §2.1 #2 — changelog compaction on a synthesized stream. Each user's
    * I,U,…,U[,D] chain folds to a single insert carrying the last values
    * (or vanishes if the row was deleted). */
  def cdcCompact(s: SparkSession, dir: String): DataFrame = {
    orderedSmall(ChangelogCompactor.compact(eventActions(s, dir))
      .toDF()
      .select(
        element_at(col("keyBefore"), "id").cast("long").as("user_id"),
        col("op"),
        element_at(col("values"), "val").cast("double").as("val"),
        col("lsn")), col("user_id"))
  }

  /** §2.1 #2b — the columnar fast-path compactor on the same stream; same
    * oracle as cdc_compact (the two implementations must agree). */
  def cdcCompactFast(s: SparkSession, dir: String): DataFrame = {
    orderedSmall(ChangelogCompactor.compactSimple(eventActions(s, dir))
      .toDF()
      .select(
        element_at(col("keyBefore"), "id").cast("long").as("user_id"),
        col("op"),
        element_at(col("values"), "val").cast("double").as("val"),
        col("lsn")), col("user_id"))
  }

  /** §2.1 #2c — compaction at lineitem scale: 600k actions / 150k keys at
    * sf0.1 (per order: INSERT at its first line, UPDATEs after, ordered by
    * line number) — the volume proof for the per-key fold. */
  def cdcCompactLineitem(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    // the stream position (lsn) is the row_number over a value-inclusive
    // order — ties then carry identical values and the compacted output
    // stays deterministic on both engines.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_extendedprice"))
    // columnar synthesis (see eventActions)
    val actions = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"),
        row_number().over(w).as("rn"))
      .select(
        lit("li").as("table"),
        col("rn").cast("long").as("lsn"),
        lit(0).as("seq"),
        when(col("rn") === 1, "I").otherwise("U").as("op"),
        map(lit("id"), col("l_orderkey").cast("string")).as("keyBefore"),
        map(lit("id"), col("l_orderkey").cast("string"),
          lit("price"), col("l_extendedprice").cast("string")).as("values"),
        array().cast("array<string>").as("nulls"),
        array().cast("array<string>").as("unchanged"),
        lit(false).as("rekey"))
      .as[ChangeAction]
    // hasRekeys=Some(false): the synthesized stream pins rekey=false by
    // construction, so the producer-knows contract applies — compaction is
    // ONE shuffle over a single execution of the input, no localCheckpoint
    // materialization, no rekey/hot-endpoint probe passes (those stay
    // exercised by cdc_compact / cdc_compact_rekey). At 10× ladder volume
    // the checkpoint write+read of 6M synthesized actions was costing more
    // than the fold itself.
    orderedSmall(ChangelogCompactor.compact(actions, hasRekeys = Some(false))
      .toDF()
      .select(element_at(col("keyBefore"), "id").cast("long").as("order_id"),
        col("op"),
        element_at(col("values"), "price").cast("double").as("val"),
        col("lsn")), col("order_id"))
  }

  /** §2.1 #1 — transaction assembly: DML messages only release with their
    * transaction's COMMIT and adopt its commit LSN. Transactions with
    * xid % 97 == 0 have no commit in the batch and are held back. */
  def cdcTxnAssembly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // columnar synthesis (see eventActions)
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val emptyMap = map().cast("map<string,string>")
    val emptyArr = array().cast("array<string>")
    val dmls = ev.select(
      expr("event_id div 5").as("xid"),
      (col("event_id") % 5).cast("int").as("seq"),
      lit("INSERT").as("msgType"),
      lit(0L).as("lsn"),
      lit("events_t").as("table"),
      map(lit("id"), col("event_id").cast("string")).as("keyBefore"),
      map(lit("id"), col("event_id").cast("string"),
        lit("user"), col("user_id").cast("string"),
        lit("v"), col("value").cast("string")).as("values"),
      emptyArr.as("nulls"), emptyArr.as("unchanged"),
      lit(false).as("rekey")).as[WalMessage]
    val commits = ev.select(expr("event_id div 5").as("xid"))
      .distinct()
      .filter(col("xid") % 97 =!= 0)
      .select(col("xid"),
        lit(Int.MaxValue).as("seq"),
        lit("COMMIT").as("msgType"),
        (col("xid") * 1000 + 999).as("lsn"),
        lit("").as("table"),
        emptyMap.as("keyBefore"), emptyMap.as("values"),
        emptyArr.as("nulls"), emptyArr.as("unchanged"),
        lit(false).as("rekey")).as[WalMessage]
    // strict=false: this query demonstrates hold-back of the commit-less
    // xids (%97) — a real stream uses StatefulAssembler for those
    orderedSmall(ChangelogAssembler.assemble(dmls.union(commits), strict = false)
      .toDF()
      .select(
        element_at(col("values"), "id").cast("long").as("event_id"),
        element_at(col("values"), "user").cast("long").as("user_id"),
        col("lsn").as("commit_lsn"),
        col("op")), col("event_id"))
  }

  /** §2.1 #0 — binary pgoutput wire decode feeding distributed assembly
    * (the reference's input layer, message_accumulator.go:42-202 over
    * pglogrepl frames): each customer row is ENCODED into 1-3
    * self-contained transactions of raw pgoutput frames (insert; %7 a
    * TOAST-unchanged update; %13 a delete), decoded per partition by ONE
    * stateful [[PgOutput.Decoder]] (relation cache + xid/seq stamping —
    * decode is the only sequential step, mirroring the single replication
    * connection), then assembled distributed on xid. */
  def cdcPgoutputDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rel = Relation("public", "customer", Seq(
      RelColumn("c_custkey", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("c_name", PgTypes.TextOid),
      RelColumn("c_acctbal", PgTypes.Float8Oid)))
    val relId = 16384
    val msgs = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .as[(Long, String, Double)]
      .mapPartitions { it =>
        import PgOutput._
        val dec = new Decoder
        it.flatMap { case (k, name, bal) =>
          def txn(off: Long, dml: Array[Byte]): Seq[Array[Byte]] =
            Seq(encodeBegin(k * 10 + off, 0L, k * 4 + off),
              encodeRelation(relId, rel), dml,
              encodeCommit(k * 10 + off, k * 10 + off, 0L))
          val frames =
            txn(0, encodeInsert(relId,
              Seq(CellText(k.toString), CellText(name), CellText(bal.toString)))) ++
            (if (k % 7 == 0) txn(1, encodeUpdate(relId, None,
              Seq(CellText(k.toString), CellUnchanged, CellText((bal + 100).toString))))
             else Nil) ++
            (if (k % 13 == 0) txn(2, encodeDelete(relId, 'K',
              Seq(CellText(k.toString), CellNull, CellNull)))
             else Nil)
          frames.flatMap(dec.feed)
        }
      }
    orderedSmall(ChangelogAssembler.assemble(msgs)
      .toDF()
      .select(
        element_at(col("keyBefore"), "c_custkey").cast("long").as("c_custkey"),
        col("op"),
        element_at(col("values"), "c_acctbal").cast("double").as("bal"),
        element_at(col("values"), "c_name").as("name"),
        array_contains(col("unchanged"), "c_name").as("name_unchanged"),
        col("lsn")),
      col("c_custkey"), col("lsn"))
  }

  /** §2.1 #3 — MERGE a compacted changelog into a snapshot: per-custkey
    * latest order updates the balance; custkey%10==0 is a delete; custkeys
    * missing from the snapshot (custkey%3==0) become inserts. */
  def cdcMergeInto(s: SparkSession, dir: String): DataFrame = {
    val (rel, snapshot, changelog) = mergeScenario(s, dir)
    orderedSmall(MergeInto(snapshot, changelog, rel), col("c_custkey"))
  }

  /** Shared merge fixture (also drives `cdc_incremental_agg`): snapshot =
    * customers with custkey % 3 ≠ 0; changelog = one compacted action per
    * ordering customer (latest order sets c_acctbal; custkey % 10 = 0
    * deletes). */
  private def mergeScenario(s: SparkSession, dir: String) = {
    import s.implicits._
    val rel = Relation("public", "customer", Seq(
      RelColumn("c_custkey", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("c_name", PgTypes.TextOid),
      RelColumn("c_nationkey", PgTypes.Int4Oid),
      RelColumn("c_acctbal", PgTypes.Float8Oid),
      RelColumn("c_mktsegment", PgTypes.TextOid)))
    val snapshot = Tables.customer(s, dir).filter(col("c_custkey") % 3 =!= 0)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    // columnar synthesis (see eventActions)
    val isDelete = col("o_custkey") % 10 === 0
    val changelog = Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        lit("customer").as("table"),
        col("o_custkey").as("lsn"),
        lit(0).as("seq"),
        when(isDelete, "D").otherwise("U").as("op"),
        map(lit("c_custkey"), col("o_custkey").cast("string")).as("keyBefore"),
        when(isDelete, map().cast("map<string,string>"))
          .otherwise(map(lit("c_custkey"), col("o_custkey").cast("string"),
            lit("c_acctbal"), col("o_totalprice").cast("string"))).as("values"),
        array().cast("array<string>").as("nulls"),
        array().cast("array<string>").as("unchanged"),
        lit(false).as("rekey"))
      .as[ChangeAction]
    (rel, snapshot, changelog)
  }

  /** §2.1 #3 (big-batch regime) — MERGE a backfill-sized changelog into a
    * BUCKETED snapshot through the declared big-batch pairing: the
    * snapshot publishes bucketed on the identity key
    * ([[SnapshotWriter.publishBucketed]]), the caller pins
    * `broadcastChangelog = false`, and the sort-merge stages read the
    * snapshot bucket-local — only the changelog side exchanges (the
    * plan shape is pinned in CompactFastAndBucketSpec / PlanAuditSpec;
    * this query is the regime's LADDER family, >400k compacted actions
    * at the 10× point).
    *
    * Scenario: snapshot = orders (o_orderkey % 3 ≠ 0) with 4 columns;
    * changelog = one compacted action per lineitem orderkey — D for
    * % 10 = 0, else U setting o_totalprice to the order's decimal-summed
    * extended price with o_orderpriority TOAST-unchanged (inherited when
    * matched, NULL on the % 3 = 0 insert/orphan path, which exercises
    * stage 2's full-outer reconciliation at volume). */
  def cdcMergeBig(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rel = Relation("public", "orders_bk", Seq(
      RelColumn("o_orderkey", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("o_custkey", PgTypes.Int8Oid),
      RelColumn("o_totalprice", PgTypes.Float8Oid),
      RelColumn("o_orderpriority", PgTypes.TextOid)))
    SnapshotWriter.publishBucketed(
      Tables.orders(s, dir)
        .filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority")),
      "graft_orders_bk", Seq("o_orderkey"), nBuckets = 32)
    val snapshot = s.table("graft_orders_bk")
    val isDelete = col("l_orderkey") % 10 === 0
    // decimal-summed so the synthesized value is order-independent and
    // renders identically in both engines (a double sum would be
    // partition-order-dependent)
    val changelog = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("tp"))
      .select(
        lit("orders_bk").as("table"),
        col("l_orderkey").as("lsn"),
        lit(0).as("seq"),
        when(isDelete, "D").otherwise("U").as("op"),
        map(lit("o_orderkey"), col("l_orderkey").cast("string")).as("keyBefore"),
        when(isDelete, map().cast("map<string,string>"))
          .otherwise(map(lit("o_orderkey"), col("l_orderkey").cast("string"),
            lit("o_totalprice"), col("tp").cast("string"))).as("values"),
        array().cast("array<string>").as("nulls"),
        when(isDelete, array().cast("array<string>"))
          .otherwise(array(lit("o_orderpriority"))).as("unchanged"),
        lit(false).as("rekey"))
      .as[ChangeAction]
    orderedSmall(
      MergeInto(snapshot, changelog, rel, broadcastChangelog = false),
      col("o_orderkey"))
  }

  /** §2.1 #3b — incremental aggregate maintenance: the per-nation balance
    * aggregate stays current through the same changelog WITHOUT
    * re-aggregating the snapshot ([[IncrementalAgg]]: retract old
    * contributions of affected keys, add merged new ones; snapshot
    * touched only by a broadcast semi-join). Oracle = the aggregate over
    * the fully merged end state. */
  def cdcIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val (rel, snapshot, changelog) = mergeScenario(s, dir)
    val agg0 = IncrementalAgg.initialAgg(snapshot, "c_nationkey", "c_acctbal",
      sumName = "sum_bal", cntName = "n_rows")
    IncrementalAgg.maintainSum(agg0, snapshot, changelog, rel,
        groupCol = "c_nationkey", valueCol = "c_acctbal",
        sumName = "sum_bal", cntName = "n_rows")
      .select(col("c_nationkey"), col("sum_bal").cast("double").as("sum_bal"),
        col("n_rows"))
      .orderBy(col("c_nationkey").asc_nulls_first)
  }

  /** §2.1 #10 — PG text-format decode: strings synthesized from typed
    * columns, parsed back through PgValues (bool 't'/'f', int, date,
    * timestamp). */
  def cdcTextCast(s: SparkSession, dir: String): DataFrame = {
    // sort FIRST on the narrow scan, project after: range partitioning
    // samples its child, so an orderBy above the parse/format pipeline
    // would execute that pipeline twice
    Tables.lineitem(s, dir)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "R", "t").otherwise("f").as("bool_s"),
        col("l_partkey").cast("string").as("int_s"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("date_s"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .select(col("l_orderkey"), col("l_linenumber"),
        PgValues.castText(col("bool_s"), PgTypes.BoolOid).as("b"),
        PgValues.castText(col("int_s"), PgTypes.Int8Oid).as("n"),
        // cast parsed date up to timestamp: engines agree on the value and
        // the driver's hash compare sees one physical type on both sides
        PgValues.castText(col("date_s"), PgTypes.DateOid).cast("timestamp").as("d"),
        PgValues.castText(col("ts_s"), PgTypes.TimestamptzOid).as("ts"))
  }

  /** §2.1 #11 — PG array literal parse on synthesized `{k,p,NULL}` text. */
  def pgArrayParse(s: SparkSession, dir: String): DataFrame = {
    // sort-first: see cdcTextCast — keeps the parse/json pipeline out of
    // the range-partitioning sample pass
    Tables.lineitem(s, dir)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        concat(lit("{"), col("l_orderkey"), lit(","), col("l_partkey"), lit(",NULL}")).as("arr_s"))
      .select(col("l_orderkey"), col("l_linenumber"),
        PgValues.castArrayText(col("arr_s"), PgTypes.Int8Oid).as("arr"))
      .select(col("l_orderkey"), col("l_linenumber"),
        // serialize the parsed array for the hash compare (engines render
        // raw lists differently); NULL elements spelled out
        concat_ws(",", transform(col("arr"),
          x => coalesce(x.cast("string"), lit("NULL")))).as("arr_csv"),
        // VARIANT-style target representation (reference: arraytojson.go)
        to_json(col("arr")).as("arr_json"),
        size(col("arr")).as("n_elems"),
        element_at(col("arr"), 2).as("second_elem"))
  }

  /** §2.1 #9b — json/jsonb → VARIANT surface (reference getSfType:690 maps
    * json to Snowflake VARIANT; Spark 4's VariantType is the native
    * analogue): synthesize json text, parse once, path-extract typed
    * values — including a nested path. Values are ints/strings only so the
    * json RENDERING differences between engines never surface; only the
    * extracted values are compared. */
  def cdcJsonVariant(s: SparkSession, dir: String): DataFrame = {
    val j = to_json(struct(
      col("o_orderkey").as("k"),
      col("o_orderpriority").as("p"),
      struct(col("o_custkey").as("c")).as("n")))
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), PgValues.jsonVariant(j).as("__v"))
      .select(col("o_orderkey"),
        PgValues.jsonGet(col("__v"), "$.p", "string").as("priority"),
        PgValues.jsonGet(col("__v"), "$.n.c", "long").as("nested_custkey"))
      .orderBy(col("o_orderkey"))
  }

  /** §2.1 #6c — LSN text format as a gated query: 64-bit values spanning
    * both hex words formatted to "XLOG/OFFSET" (oracle: DuckDB printf) and
    * round-tripped through the parser in-query. */
  def cdcLsnFormat(s: SparkSession, dir: String): DataFrame = {
    val v = col("o_orderkey") * 7000 + 123 // crosses 2^32 at sf0.01+
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 29 === 0)
      .select(col("o_orderkey"), v.as("lsn_v"))
      .select(col("o_orderkey"), col("lsn_v"),
        Lsn.formatCol(col("lsn_v")).as("lsn_text"),
        (Lsn.parseCol(Lsn.formatCol(col("lsn_v"))) === col("lsn_v")).as("roundtrip_ok"))
      .orderBy(col("o_orderkey"))
  }

  /** §2.1 #6 — backfill: publish the typed snapshot atomically (scratch →
    * rename), then read the live path back. */
  def cdcSnapshotTyped(s: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_snapshots").getAbsolutePath
    val live = SnapshotWriter.publish(
      Tables.customer(s, dir), base, "customer", repartitionKeys = Seq("c_custkey"))
    s.read.parquet(live).orderBy(col("c_custkey"))
  }

  /** §2.1 #6b — CSV backfill: COPY-style text CSV → typed frame through
    * the same PG text decode the stream uses. The CSV is produced in-query
    * from `customer` (text round-trip is lossless), so the oracle is the
    * table itself. */
  def cdcCsvBackfill(s: SparkSession, dir: String): DataFrame = {
    val rel = Relation("public", "customer", Seq(
      RelColumn("c_custkey", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("c_name", PgTypes.TextOid),
      RelColumn("c_nationkey", PgTypes.Int4Oid),
      RelColumn("c_acctbal", PgTypes.Float8Oid),
      RelColumn("c_mktsegment", PgTypes.TextOid)))
    val tmp = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_csv_backfill").getAbsolutePath
    Tables.customer(s, dir)
      .select(rel.columnNames.map(c => col(c).cast("string").as(c)): _*)
      .write.mode("overwrite").option("nullValue", "").csv(tmp)
    graft.sources.PgCsv.read(s, rel, tmp).orderBy(col("c_custkey"))
  }

  /** §2.2-adjacent — event-time tumbling windows (same code path as the
    * streaming aggregate; watermark is a no-op on batch input). */
  def qEventWindows(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAggregator
      .windowedStats(Tables.events(s, dir), "ts", "event_type", "value", "1 hour")
      .orderBy(col("window_start"), col("event_type"))

  /** §2.1 #7 — schema diff report (rows-only gate). */
  def cdcSchemaDiff(s: SparkSession, dir: String): DataFrame = {
    val source = Tables.customer(s, dir).schema
    val target = org.apache.spark.sql.types.StructType(
      source.fields.filterNot(_.name == "c_mktsegment").map {
        case f if f.name == "c_acctbal" => f.copy(dataType = org.apache.spark.sql.types.StringType)
        case f => f
      })
    SchemaVerify.diffDf(s, source, target).orderBy(col("column_name"), col("data_type"))
  }

  /** §2.1 #9 — the PG OID → Spark type surface (rows-only gate). */
  def cdcTypemap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    PgTypes.mappedOids
      .flatMap(oid => Seq(
        (oid, false, PgTypes.toSpark(oid, isArray = false).simpleString),
        (oid, true, PgTypes.toSpark(oid, isArray = true).simpleString)))
      .toDF("pg_oid", "is_array", "spark_type")
      .orderBy(col("pg_oid"), col("is_array"))
  }

  /** §2.1 #5 — rekey chains through the hot path (rows-only gate; exact
    * semantics are property-tested in CompactorSpec). */
  def cdcCompactRekey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val actions = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal")).as[(Long, Double)]
      .flatMap { case (key, bal) =>
        val base = ChangeAction("customer", key * 10, 0, "U",
          Map("id" -> key.toString),
          Map("id" -> key.toString, "bal" -> bal.toString), Nil, Nil, rekey = false)
        if (key % 50 == 0)
          Seq(
            base.copy(values = base.values + ("id" -> (key + 5000000L).toString), rekey = true),
            ChangeAction("customer", key * 10 + 1, 0, "U",
              Map("id" -> (key + 5000000L).toString),
              Map("id" -> (key + 9000000L).toString, "bal" -> (bal + 1).toString),
              Nil, Nil, rekey = true))
        else Seq(base)
      }
    orderedSmall(ChangelogCompactor.compact(actions)
      .toDF()
      .select(element_at(col("keyBefore"), "id").cast("long").as("id_before"),
        col("op"), col("rekey"),
        element_at(col("values"), "bal").cast("double").as("bal")), col("id_before"))
  }

  /** §2.1 #3c — SCD Type 2 history from the synthesized per-user change
    * stream ([[graft.cdc.Scd2.history]]): every I/U change becomes a
    * version row with its `[valid_from, valid_to)` LSN interval; the
    * final 'error' event is a DELETE that closes the last version
    * without opening one. */
  private def scd2Changes(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .select(col("user_id"), col("event_id").as("lsn"),
        col("value").as("val"),
        when(col("rn") === 1, "I")
          .when(col("rn") === col("n") && col("event_type") === "error", "D")
          .otherwise("U").as("op"))
  }

  def cdcScd2(s: SparkSession, dir: String): DataFrame =
    orderedSmall(
      Scd2.history(scd2Changes(s, dir), Seq("user_id"), "lsn", "op")
        .select(col("user_id"), col("val"), col("valid_from"),
          col("valid_to"), col("is_current")),
      col("user_id"), col("valid_from"))

  /** §2.1 #3d — point-in-time (time-travel) read of the SCD2 history as
    * of the mid-stream LSN: versions whose interval contains the cutoff.
    * Keys deleted before the cutoff are absent; keys born after it are
    * absent; everything else shows the value it had AT the cutoff. */
  def cdcTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val hist = Scd2.history(scd2Changes(s, dir), Seq("user_id"), "lsn", "op")
    val cutoff = Tables.events(s, dir)
      .agg(floor(max(col("event_id")) / 2).cast("long").as("__cut"))
    orderedSmall(
      Scd2.asOf(hist.crossJoin(broadcast(cutoff)), col("__cut"))
        .select(col("user_id"), col("val"), col("valid_from")),
      col("user_id"), col("valid_from"))
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_scd2" -> (cdcScd2 _),
    "cdc_time_travel" -> (cdcTimeTravel _),
    "cdc_compact" -> (cdcCompact _),
    "cdc_compact_fast" -> (cdcCompactFast _),
    "cdc_compact_lineitem" -> (cdcCompactLineitem _),
    "cdc_txn_assembly" -> (cdcTxnAssembly _),
    "cdc_pgoutput_decode" -> (cdcPgoutputDecode _),
    "cdc_merge_into" -> (cdcMergeInto _),
    "cdc_merge_big" -> (cdcMergeBig _),
    "cdc_incremental_agg" -> (cdcIncrementalAgg _),
    "cdc_text_cast" -> (cdcTextCast _),
    "pg_array_parse" -> (pgArrayParse _),
    "cdc_snapshot_typed" -> (cdcSnapshotTyped _),
    "cdc_csv_backfill" -> (cdcCsvBackfill _),
    "q_event_windows" -> (qEventWindows _),
    "cdc_schema_diff" -> (cdcSchemaDiff _),
    "cdc_typemap" -> (cdcTypemap _),
    "cdc_compact_rekey" -> (cdcCompactRekey _),
    "cdc_json_variant" -> (cdcJsonVariant _),
    "cdc_lsn_format" -> (cdcLsnFormat _),
  )

  val oracle: Map[String, String] = Map(
    // the lead() window replays validity intervals; D rows close their
    // predecessor (supply the lead LSN) but emit no version
    "cdc_scd2" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_id AS lsn, value AS val,
        |    CASE WHEN rn = 1 THEN 'I'
        |         WHEN rn = n AND event_type = 'error' THEN 'D'
        |         ELSE 'U' END AS op
        |  FROM ranked),
        |v AS (
        |  SELECT user_id, val, op, lsn AS valid_from,
        |    lead(lsn) OVER (PARTITION BY user_id ORDER BY lsn) AS valid_to
        |  FROM ch)
        |SELECT user_id, val, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM v WHERE op <> 'D'
        |ORDER BY user_id, valid_from""".stripMargin,
    "cdc_time_travel" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_id AS lsn, value AS val,
        |    CASE WHEN rn = 1 THEN 'I'
        |         WHEN rn = n AND event_type = 'error' THEN 'D'
        |         ELSE 'U' END AS op
        |  FROM ranked),
        |v AS (
        |  SELECT user_id, val, op, lsn AS valid_from,
        |    lead(lsn) OVER (PARTITION BY user_id ORDER BY lsn) AS valid_to
        |  FROM ch),
        |c AS (SELECT max(event_id) // 2 AS cut FROM events)
        |SELECT user_id, val, valid_from
        |FROM v, c
        |WHERE op <> 'D' AND valid_from <= cut
        |  AND (valid_to IS NULL OR valid_to > cut)
        |ORDER BY user_id, valid_from""".stripMargin,
    // golden oracle: the engine's type surface is a fixed contract
    // (snowflake_target.go:675-714 getSfType re-expressed for Spark) —
    // pinning it catches accidental mapping drift
    "cdc_typemap" ->
      ("""SELECT CAST(c0 AS INT) AS pg_oid, c1 AS is_array, c2 AS spark_type
        |FROM (VALUES
        |""" +
        Seq(16 -> "boolean", 17 -> "binary", 20 -> "bigint", 21 -> "smallint",
          23 -> "int", 25 -> "string", 114 -> "string", 700 -> "float",
          701 -> "double", 1042 -> "string", 1043 -> "string", 1082 -> "date",
          1114 -> "timestamp_ntz", 1184 -> "timestamp",
          1700 -> "decimal(38,18)", 2950 -> "string", 3802 -> "string")
          .flatMap { case (oid, t) =>
            Seq(s"  ($oid, false, '$t')", s"  ($oid, true, 'array<string>')")
          }.mkString(",\n") +
        """) t(c0, c1, c2)
        |ORDER BY pg_oid, is_array""").stripMargin,
    // golden oracle for the diff report shape on the synthesized drift
    // (drop c_mktsegment, retype c_acctbal)
    "cdc_schema_diff" ->
      """SELECT * FROM (VALUES
        |  ('c_acctbal', 'double', 'only in: source'),
        |  ('c_acctbal', 'string', 'only in: target'),
        |  ('c_custkey', 'bigint', 'both'),
        |  ('c_mktsegment', 'string', 'only in: source'),
        |  ('c_name', 'string', 'both'),
        |  ('c_nationkey', 'int', 'both')
        |) t(column_name, data_type, status)
        |ORDER BY column_name, data_type""".stripMargin,
    "cdc_lsn_format" ->
      """SELECT o_orderkey,
        |  o_orderkey * 7000 + 123 AS lsn_v,
        |  printf('%X/%X', (o_orderkey * 7000 + 123) // 4294967296,
        |                  (o_orderkey * 7000 + 123) % 4294967296) AS lsn_text,
        |  true AS roundtrip_ok
        |FROM orders WHERE o_orderkey % 29 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "cdc_json_variant" ->
      """WITH j AS (
        |  SELECT o_orderkey,
        |    to_json({'k': o_orderkey, 'p': o_orderpriority,
        |             'n': {'c': o_custkey}}) AS v
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT o_orderkey,
        |  json_extract_string(v, '$.p') AS priority,
        |  CAST(json_extract(v, '$.n.c') AS BIGINT) AS nested_custkey
        |FROM j ORDER BY o_orderkey""".stripMargin,
    // relational closed form of the synthesized rekey stream: lone updates
    // pass through; %50 keys carry a two-step rekey chain whose merge keeps
    // the ORIGINAL identity, the FINAL values, and the rekey flag
    "cdc_compact_rekey" ->
      """SELECT c_custkey AS id_before, 'U' AS op,
        |  (c_custkey % 50 = 0) AS rekey,
        |  CASE WHEN c_custkey % 50 = 0 THEN c_acctbal + 1 ELSE c_acctbal END AS bal
        |FROM customer ORDER BY id_before""".stripMargin,
    "cdc_compact" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT user_id, 'I' AS op, value AS val, event_id AS lsn
        |FROM ranked
        |WHERE rn = n AND NOT (n > 1 AND event_type = 'error')
        |ORDER BY user_id""".stripMargin,
    "cdc_compact_fast" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT user_id, 'I' AS op, value AS val, event_id AS lsn
        |FROM ranked
        |WHERE rn = n AND NOT (n > 1 AND event_type = 'error')
        |ORDER BY user_id""".stripMargin,
    "cdc_compact_lineitem" ->
      """WITH ranked AS (
        |  SELECT l_orderkey, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_orderkey) AS n
        |  FROM lineitem)
        |SELECT l_orderkey AS order_id, 'I' AS op,
        |  l_extendedprice AS val, CAST(n AS BIGINT) AS lsn
        |FROM ranked WHERE rn = n
        |ORDER BY order_id""".stripMargin,
    // closed form of the synthesized wire stream: every row inserts at
    // lsn k*10; %7 rows update (TOAST-unchanged name) at k*10+1; %13 rows
    // delete at k*10+2
    "cdc_pgoutput_decode" ->
      """SELECT * FROM (
        |  SELECT c_custkey, 'I' AS op, c_acctbal AS bal, c_name AS name,
        |         false AS name_unchanged, c_custkey * 10 AS lsn
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'U', c_acctbal + 100, NULL, true, c_custkey * 10 + 1
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, 'D', NULL, NULL, false, c_custkey * 10 + 2
        |  FROM customer WHERE c_custkey % 13 = 0
        |) ORDER BY c_custkey, lsn""".stripMargin,
    "cdc_txn_assembly" ->
      """SELECT event_id, user_id,
        |  (event_id // 5) * 1000 + 999 AS commit_lsn,
        |  'I' AS op
        |FROM events
        |WHERE (event_id // 5) % 97 <> 0
        |ORDER BY event_id""".stripMargin,
    "cdc_merge_into" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |cl AS (
        |  SELECT o_custkey AS key,
        |    CASE WHEN o_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice
        |  FROM latest WHERE rn = 1),
        |snap AS (SELECT * FROM customer WHERE c_custkey % 3 <> 0)
        |SELECT coalesce(s.c_custkey, c.key) AS c_custkey,
        |  s.c_name AS c_name,
        |  s.c_nationkey AS c_nationkey,
        |  CASE WHEN c.key IS NOT NULL THEN c.o_totalprice ELSE s.c_acctbal END AS c_acctbal,
        |  s.c_mktsegment AS c_mktsegment
        |FROM snap s FULL OUTER JOIN cl c ON s.c_custkey = c.key
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY c_custkey""".stripMargin,
    // the aggregate over the fully merged end state (same CTEs as
    // cdc_merge_into) — what delta maintenance must reproduce exactly
    "cdc_incremental_agg" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |cl AS (
        |  SELECT o_custkey AS key,
        |    CASE WHEN o_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice
        |  FROM latest WHERE rn = 1),
        |snap AS (SELECT * FROM customer WHERE c_custkey % 3 <> 0),
        |merged AS (
        |  SELECT s.c_nationkey AS c_nationkey,
        |    CASE WHEN c.key IS NOT NULL THEN c.o_totalprice ELSE s.c_acctbal END AS c_acctbal
        |  FROM snap s FULL OUTER JOIN cl c ON s.c_custkey = c.key
        |  WHERE c.op IS NULL OR c.op <> 'D')
        |SELECT c_nationkey,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  count(*) AS n_rows
        |FROM merged GROUP BY c_nationkey
        |ORDER BY c_nationkey NULLS FIRST""".stripMargin,
    // matched U: totalprice from the changelog, priority inherited
    // (TOAST-unchanged); matched D: gone; unmatched U (%3=0): insert with
    // NULL custkey/priority; unmatched D (%30=0): vanishes
    "cdc_merge_big" ->
      """WITH cl AS (
        |  SELECT l_orderkey AS key,
        |    CASE WHEN l_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM lineitem GROUP BY l_orderkey),
        |snap AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 3 <> 0)
        |SELECT coalesce(s.o_orderkey, c.key) AS o_orderkey,
        |  s.o_custkey AS o_custkey,
        |  CASE WHEN c.key IS NOT NULL THEN c.tp ELSE s.o_totalprice END AS o_totalprice,
        |  s.o_orderpriority AS o_orderpriority
        |FROM snap s FULL OUTER JOIN cl c ON s.o_orderkey = c.key
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
    "cdc_text_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN (CASE WHEN l_returnflag = 'R' THEN 't' ELSE 'f' END) = 't'
        |       THEN true ELSE false END AS b,
        |  CAST(CAST(l_partkey AS VARCHAR) AS BIGINT) AS n,
        |  CAST(CAST(strftime(l_shipdate, '%Y-%m-%d') AS DATE) AS TIMESTAMP) AS d,
        |  CAST(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ts
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "pg_array_parse" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_orderkey AS VARCHAR) || ',' || CAST(l_partkey AS VARCHAR) || ',NULL' AS arr_csv,
        |  '[' || CAST(l_orderkey AS VARCHAR) || ',' || CAST(l_partkey AS VARCHAR) || ',null]' AS arr_json,
        |  3 AS n_elems,
        |  l_partkey AS second_elem
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "cdc_snapshot_typed" ->
      """SELECT * FROM customer ORDER BY c_custkey""".stripMargin,
    "cdc_csv_backfill" ->
      """SELECT * FROM customer ORDER BY c_custkey""".stripMargin,
    "q_event_windows" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
  )
}
