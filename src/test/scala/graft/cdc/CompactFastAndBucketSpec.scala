package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

import graft.TestSpark

class CompactFastAndBucketSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def act(lsn: Long, op: String, key: String, v: String): ChangeAction =
    ChangeAction("t", lsn, 0, op, Map("id" -> key),
      if (op == "D") Map.empty else Map("id" -> key, "val" -> v),
      Nil, Nil, rekey = false)

  /** Valid full-row-image streams (no TOAST, no rekey) — the fast path's
    * declared domain. */
  private def genSimple(nKeys: Int, len: Int): Gen[List[ChangeAction]] = {
    def step(live: Set[String], vacant: Set[String], lsn: Long,
        acc: List[ChangeAction]): Gen[List[ChangeAction]] =
      if (lsn > len) Gen.const(acc.reverse)
      else {
        val choices =
          (if (vacant.nonEmpty) Seq(Gen.oneOf(vacant.toSeq).map(k =>
            (act(lsn, "I", k, s"v$lsn"), live + k, vacant - k))) else Nil) ++
          (if (live.nonEmpty) Seq(
            Gen.oneOf(live.toSeq).map(k => (act(lsn, "U", k, s"v$lsn"), live, vacant)),
            Gen.oneOf(live.toSeq).map(k => (act(lsn, "D", k, null), live - k, vacant + k)))
          else Nil)
        Gen.oneOf(choices(0), choices(choices.size - 1), choices: _*)
          .flatMap { case (a, l2, v2) => step(l2, v2, lsn + 1, a :: acc) }
      }
    step(Set.empty, (1 to nKeys).map(i => s"k$i").toSet, 1, Nil)
  }

  private def norm(a: ChangeAction) =
    (a.op, ChangelogCompactor.keyStr(a.keyBefore), a.values, a.nulls.toSet, a.lsn)

  test("columnar fast-path compaction ≡ exact compactor on full-row streams") {
    (1 to 10).foreach { i =>
      val stream = genSimple(6, 40)(Gen.Parameters.default, Seed(i.toLong)).get
      val exact = ChangelogCompactor.compact(stream.toDS()).collect().map(norm).toSet
      val fast = ChangelogCompactor.compactSimple(stream.toDS()).collect().map(norm).toSet
      fast shouldBe exact
    }
  }

  test("fast-path plan is one shuffle + in-partition sort + streaming fold") {
    // ≥2 rows: a single-row probe lets OptimizeOneRowPlan legitimately
    // drop the Sort and would vacuously pass/fail the shape assertions
    val p = ChangelogCompactor.compactSimple(
      (1 to 5).map(i => act(i.toLong, "I", s"k$i", "v")).toDS()).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // sort-based streaming shape: hash exchange on the key, external sort
    // within partitions, constant-memory fold — no aggregation buffers
    // holding map-typed structs (the shape that GC-collapsed at 1.5M keys)
    p should include("Exchange")
    p should include("hashpartitioning") // in the node arguments block
    p should include("Sort")
    p should not include "Aggregate"
    p should not include "collect_list"
    p should not include "MapGroups" // flatMapGroups would mean the typed per-group fold
  }

  test("bucketed snapshot + non-broadcast merge: no exchange on the snapshot side") {
    val rel = Relation("public", "bk", Seq(
      RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
      RelColumn("v", PgTypes.TextOid)))
    val snap = spark.range(500).selectExpr("id", "cast(id as string) as v")
    SnapshotWriter.publishBucketed(snap, "bk_items", Seq("id"), nBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val bucketed = spark.table("bk_items")
      val cl = (1L to 100L).map(i =>
        ChangeAction("bk", i, 0, "U", Map("id" -> i.toString),
          Map("id" -> i.toString, "v" -> s"u$i"), Nil, Nil, false)).toDS()
      val merged = MergeInto(bucketed, cl, rel, broadcastChangelog = false)
      // correctness
      val rows = merged.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      rows(1L) shouldBe "u1"
      rows(499L) shouldBe "499"
      rows should have size 500
      // plan: sort-merge join against a bucketed scan — the snapshot side
      // reads bucket-local (no exchange feeding it)
      val p = merged.queryExecution.explainString(ExplainMode.fromString("formatted"))
      p should include("SortMergeJoin")
      p should include("Bucketed: true")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_items")
    }
  }
}
