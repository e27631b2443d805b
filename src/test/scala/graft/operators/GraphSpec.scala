package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class GraphSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("one iteration on the path graph matches the hand computation") {
    // a-b-c: deg a=c=1, b=2; r0=1/3 each
    // r1(a)=r1(c)=0.15/3+0.85*(1/3)/2 ; r1(b)=0.15/3+0.85*(1/3+1/3)
    val r = Graph.pageRank(sym((1L, 2L), (2L, 3L)), iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r(1L) shouldBe (0.05 + 0.85 / 6.0) +- 1e-9
    r(3L) shouldBe r(1L)
    r(2L) shouldBe (0.05 + 0.85 * (2.0 / 3.0)) +- 1e-9 // a and c each send (1/3)/1
  }

  test("rank mass is conserved and symmetric graphs stay symmetric") {
    val r = Graph.pageRank(sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)),
      iters = 3).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.values.sum shouldBe 1.0 +- 1e-6
    // the 4-cycle is vertex-transitive: all ranks equal
    r.values.toSet.size shouldBe 1
  }

  test("higher-degree nodes rank higher on a star") {
    val r = Graph.pageRank(sym((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)),
      iters = 5).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r(10L) should be > r(1L) * 2
    Seq(1L, 2L, 3L, 4L).map(r).toSet.size shouldBe 1 // leaves tie
  }

  test("directed source-only nodes keep teleport rank and keep contributing") {
    // s(1) -> a(2); a(2) <-> b(3): node 1 has out-edges but NO in-edges.
    // It must stay in the output at teleport/n and its mass must keep
    // flowing — dropping it would leak rank from iteration 2 on.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.keySet shouldBe Set(1L, 2L, 3L)
    r(1L) shouldBe 0.05 +- 1e-9                 // teleport/n both iterations
    // hand computation: r1 = (0.05, 0.05+0.85*2/3, 0.05+0.85/3)
    // r2(2) = 0.05 + 0.85*(r1(1) + r1(3)); r2(3) = 0.05 + 0.85*r1(2)
    r(2L) shouldBe (0.05 + 0.85 * (0.05 + 0.05 + 0.85 / 3.0)) +- 1e-9
    r(3L) shouldBe (0.05 + 0.85 * (0.05 + 0.85 * 2.0 / 3.0)) +- 1e-9
    r.values.sum shouldBe 1.0 +- 1e-6           // no leaked mass
  }

  test("ranks are partition-count independent (scaled-long-summed contributions)") {
    val e = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val a = Graph.pageRank(e, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Graph.pageRank(e.repartition(7), iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    a shouldBe b
  }

  test("the library's own caller satisfies the no-dangling contract (dst subset of src)") {
    // pageRank derives its node set from the src column alone (the
    // node-prep exchange fold): a contract-violating dst-only node would
    // silently vanish from the output and change n. Pinned against the
    // REAL caller's edge construction (Analytics.pagerankEdges — the
    // same frame qPagerank feeds into pageRank), so a caller change that
    // drops the symmetrizing union fails here instead of silently
    // dropping nodes. A locally-rebuilt edge list would symmetrize by
    // this test's own hand and could never fail.
    val edges = graft.queries.Analytics.pagerankEdges(spark, "/root/testdata/sf0.001")
    edges.select("dst").except(edges.select("src")).count() shouldBe 0L
  }

  test("assertNoDangling turns a contract violation loud, costs nothing when clean") {
    // node 9 is a genuinely dangling sink (in-edges, no out-edge): the
    // default silently drops it from the node set; the opt-in check
    // names the violation instead
    val dangling = Seq((1L, 2L), (2L, 1L), (2L, 9L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(dangling, iters = 1, assertNoDangling = true)
    }
    ex.getMessage should include("1 dst node(s) have no out-edge")
    // a compliant graph passes the check and ranks identically to the
    // unchecked run (the check is a pure pre-iteration probe)
    val e = sym((1L, 2L), (2L, 3L))
    val checked = Graph.pageRank(e, iters = 2, assertNoDangling = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val unchecked = Graph.pageRank(e, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    checked shouldBe unchecked
  }

  test("long loops cross the intra-loop lineage cut without changing values") {
    // iters > CkptEvery (8) exercises the periodic LAZY checkpoint inside
    // the fused iteration chain (r22): the cut must be invisible to the
    // arithmetic — same ranks as the same run over repartitioned input
    // (partition independence THROUGH the cut), mass still conserved, and
    // the 4-cycle's vertex-transitivity still collapses to one rank.
    val e = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val a = Graph.pageRank(e, iters = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Graph.pageRank(e.repartition(7), iters = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    a shouldBe b
    a.values.sum shouldBe 1.0 +- 1e-6
  }
}
