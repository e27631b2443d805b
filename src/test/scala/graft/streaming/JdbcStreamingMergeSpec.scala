package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.TestSpark
import graft.cdc.{ChangeAction, PgTypes, RelColumn, Relation}
import graft.sources.JdbcTarget

/** Stream → warehouse end-to-end: a change-action stream drains through
  * foreachBatch into [[graft.sources.JdbcTarget]]'s transactional staged
  * MERGE against embedded Derby — the reference's replication-to-Snowflake
  * loop with a real SQL engine on the target side. */
class JdbcStreamingMergeSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val url = "jdbc:derby:memory:graftstream;create=true"
  private val target = new JdbcTarget(url)

  private val rel = Relation("public", "accounts", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("bal", PgTypes.Float8Oid)))

  private def action(lsn: Long, op: String, key: Long, bal: Option[Double]) =
    ChangeAction("accounts", lsn, 0, op, Map("id" -> key.toString),
      bal.map(b => Map("id" -> key.toString, "bal" -> b.toString))
        .getOrElse(Map("id" -> key.toString)),
      Nil, Nil, rekey = false)

  private def state(): Map[Long, Double] =
    target.read(spark, "accounts").collect()
      .map(r => r.getLong(r.fieldIndex("ID")) -> r.getDouble(r.fieldIndex("BAL"))).toMap

  test("micro-batches merge server-side; replays are skipped by the in-database LSN") {
    target.initialize(rel, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"))

    val merge = new JdbcStreamingMerge(url, Map.empty, Seq(rel))
    val mem = MemoryStream[ChangeAction]
    val ckpt = java.nio.file.Files.createTempDirectory("jdbc_stream_ckpt").toString
    val q = merge.start(mem.toDS(), ckpt, Trigger.ProcessingTime(0))
    try {
      mem.addData(
        action(100, "U", 1, Some(11.0)),
        action(101, "I", 3, Some(30.0)))
      q.processAllAvailable()
      state() shouldBe Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0)
      target.appliedLsn() shouldBe 101L

      mem.addData(action(102, "D", 2, None))
      q.processAllAvailable()
      state() shouldBe Map(1L -> 11.0, 3L -> 30.0)
      target.appliedLsn() shouldBe 102L
    } finally q.stop()

    // crash-replay: a fresh stream (new checkpoint — the worst case, no
    // streaming state survives) re-delivers everything; the in-database
    // LSN record alone must prevent double-apply
    val mem2 = MemoryStream[ChangeAction]
    val ckpt2 = java.nio.file.Files.createTempDirectory("jdbc_stream_ckpt2").toString
    val q2 = merge.start(mem2.toDS(), ckpt2, Trigger.ProcessingTime(0))
    try {
      mem2.addData(
        action(100, "U", 1, Some(11.0)),
        action(101, "I", 3, Some(30.0)),
        action(102, "D", 2, None))
      q2.processAllAvailable()
      state() shouldBe Map(1L -> 11.0, 3L -> 30.0) // unchanged
      target.appliedLsn() shouldBe 102L

      // genuinely new work after the replay still applies
      mem2.addData(action(103, "U", 3, Some(33.0)))
      q2.processAllAvailable()
      state() shouldBe Map(1L -> 11.0, 3L -> 33.0)
      target.appliedLsn() shouldBe 103L
    } finally q2.stop()
  }

  test("replayed super-batch spanning the in-database watermark converges") {
    // same scenario as StreamingMergeSpec's super-batch test, on the
    // warehouse path: a replay batch that MIXES already-applied actions
    // with new ones must LSN-truncate at the in-database watermark before
    // folding — otherwise an applied I + fresh D for the same key elide
    // and the delete is lost
    val url2 = "jdbc:derby:memory:graftreplay;create=true"
    val t2 = new JdbcTarget(url2)
    val rel2 = Relation("public", "accounts", rel.columns)
    t2.initialize(rel2, Seq.empty[(Long, Double)].toDF("id", "bal"))
    val merge = new JdbcStreamingMerge(url2, Map.empty, Seq(rel2))
    def st(): Map[Long, Double] =
      t2.read(spark, "accounts").collect()
        .map(r => r.getLong(r.fieldIndex("ID")) -> r.getDouble(r.fieldIndex("BAL"))).toMap
    merge.applyBatch(Seq(
      ChangeAction("accounts", 10, 0, "I", Map("id" -> "1"),
        Map("id" -> "1", "bal" -> "5.0"), Nil, Nil, rekey = false)).toDS(), 0L)
    st() shouldBe Map(1L -> 5.0)
    // replayed super-batch: the applied insert again PLUS its delete
    merge.applyBatch(Seq(
      ChangeAction("accounts", 10, 0, "I", Map("id" -> "1"),
        Map("id" -> "1", "bal" -> "5.0"), Nil, Nil, rekey = false),
      ChangeAction("accounts", 20, 0, "D", Map("id" -> "1"),
        Map.empty, Nil, Nil, rekey = false)).toDS(), 0L)
    st() shouldBe Map.empty // pre-fix the (I,D) pair elided and 1 survived
  }

  test("an unknown relation in the stream fails the batch for supervised resync") {
    val merge = new JdbcStreamingMerge(url, Map.empty, Seq(rel))
    an[Exception] should be thrownBy
      merge.applyBatch(Seq(
        ChangeAction("mystery", 999, 0, "I", Map("id" -> "1"),
          Map("id" -> "1"), Nil, Nil, rekey = false)).toDS(), 0L)
  }

  test("relation drift (unknown column) fails the batch for supervised resync") {
    // same contract as StreamingMerge's drift guard: a column the
    // configured relation doesn't know would be silently dropped by the
    // generated MERGE — it must raise instead
    val merge = new JdbcStreamingMerge(url, Map.empty, Seq(rel))
    val ex = intercept[SchemaChangedException] {
      merge.applyBatch(Seq(
        ChangeAction("accounts", 998, 0, "I", Map("id" -> "9"),
          Map("id" -> "9", "bal" -> "1.0", "note" -> "added-by-ddl"),
          Nil, Nil, rekey = false)).toDS(), 0L)
    }
    ex.getMessage should include("note")
  }
}
