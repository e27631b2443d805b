package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class MergeIntoSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rel = Relation("public", "items", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true),
    RelColumn("name", PgTypes.TextOid),
    RelColumn("qty", PgTypes.Int4Oid)))

  private def snap(rows: (Long, String, Integer)*) =
    rows.toDF("id", "name", "qty")

  private def action(op: String, id: Long, name: String = null, qty: Integer = null,
      nulls: Seq[String] = Nil, unchanged: Seq[String] = Nil, newId: java.lang.Long = null) = {
    val values = Map("id" -> (if (newId != null) newId else id).toString) ++
      Option(name).map("name" -> _) ++ Option(qty).map(q => "qty" -> q.toString)
    ChangeAction("items", 1, 0, op, Map("id" -> id.toString),
      if (op == "D") Map.empty else values, nulls, unchanged,
      rekey = newId != null && newId != id)
  }

  private def run(snapshot: org.apache.spark.sql.DataFrame, actions: ChangeAction*) =
    MergeInto(snapshot, actions.toDS(), rel)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else Integer.valueOf(r.getInt(2)))).toSet

  test("matched update rewrites values") {
    run(snap((1L, "a", 10), (2L, "b", 20)), action("U", 1, "a2", 11)) shouldBe
      Set((1L, "a2", 11), (2L, "b", 20))
  }

  test("matched delete removes the row; unmatched delete is a no-op") {
    run(snap((1L, "a", 10), (2L, "b", 20)), action("D", 1), action("D", 99)) shouldBe
      Set((2L, "b", 20))
  }

  test("unmatched insert adds the row") {
    run(snap((1L, "a", 10)), action("I", 3, "c", 30)) shouldBe
      Set((1L, "a", 10), (3L, "c", 30))
  }

  test("TOAST-unchanged column keeps the target value (merge template CASE)") {
    run(snap((1L, "big-toast", 10)), action("U", 1, qty = 99, unchanged = Seq("name"))) shouldBe
      Set((1L, "big-toast", 99))
  }

  test("explicit NULL overwrites; unspecified column keeps target") {
    run(snap((1L, "a", 10)), action("U", 1, qty = 5, nulls = Seq("name"))) shouldBe
      Set((1L, null, 5))
    run(snap((1L, "a", 10)), action("U", 1, name = "zz")) shouldBe
      Set((1L, "zz", 10))
  }

  test("identity-changing update moves the row to its new key") {
    run(snap((1L, "a", 10), (2L, "b", 20)), action("U", 1, "a2", 11, newId = 7L)) shouldBe
      Set((7L, "a2", 11), (2L, "b", 20))
  }

  test("insert with TOAST-unchanged column lands NULL (documented deviation)") {
    run(snap((1L, "a", 10)), action("I", 5, qty = 50, unchanged = Seq("name"))) shouldBe
      Set((1L, "a", 10), (5L, null, 50))
  }

  test("merge is idempotent for upserts (at-least-once replay safe)") {
    val once = run(snap((1L, "a", 10)), action("U", 1, "a2", 11))
    val base = snap((1L, "a2", 11))
    val twice = run(base, action("U", 1, "a2", 11))
    once shouldBe twice
  }

  private def runBig(snapshot: org.apache.spark.sql.DataFrame, actions: ChangeAction*) =
    MergeInto(snapshot, actions.toDS(), rel, broadcastChangelog = false)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else Integer.valueOf(r.getInt(2)))).toSet

  test("rekey replay is idempotent (at-least-once replay safe)") {
    // first apply moves 1 -> 7; replaying against the post-apply snapshot
    // must re-merge the row at 7, never insert a duplicate key
    val a = action("U", 1, "a2", 11, newId = 7L)
    run(snap((1L, "a", 10), (2L, "b", 20)), a) shouldBe
      Set((7L, "a2", 11), (2L, "b", 20))
    run(snap((7L, "a2", 11), (2L, "b", 20)), a) shouldBe
      Set((7L, "a2", 11), (2L, "b", 20))
    runBig(snap((7L, "a2", 11), (2L, "b", 20)), a) shouldBe
      Set((7L, "a2", 11), (2L, "b", 20))
  }

  test("rekey replay preserves TOAST-inherited values") {
    // the rekey carries name as TOAST-unchanged: the first apply inherits
    // "big" from the key-before row; the replay's re-merge must keep it
    // (a blind re-insert would null it)
    val a = action("U", 1, qty = 11, unchanged = Seq("name"), newId = 7L)
    run(snap((1L, "big", 10)), a) shouldBe Set((7L, "big", 11))
    run(snap((7L, "big", 11)), a) shouldBe Set((7L, "big", 11))
    runBig(snap((7L, "big", 11)), a) shouldBe Set((7L, "big", 11))
  }

  test("big-batch regime matches broadcast regime on the core shapes") {
    val actions = Seq(
      action("U", 1, "a2", 11), action("D", 2), action("I", 3, "c", 30),
      action("U", 4, qty = 99, unchanged = Seq("name")))
    val base = snap((1L, "a", 10), (2L, "b", 20), (4L, "toast", 40))
    runBig(base, actions: _*) shouldBe run(base, actions: _*)
  }

  test("nullableIdentity relation matches NULL-keyed rows (REPLICA IDENTITY FULL)") {
    // with a nullable identity column, === never matches a NULL key —
    // updates would duplicate the row and deletes would no-op; the
    // relation-level flag switches the identity joins to <=>
    val relFull = Relation("public", "nk", Seq(
      RelColumn("name", PgTypes.TextOid, isIdentity = true),
      RelColumn("qty", PgTypes.Int4Oid)), nullableIdentity = true)
    val snapshot = Seq((null.asInstanceOf[String], Integer.valueOf(1)),
      ("x", Integer.valueOf(2))).toDF("name", "qty")
    def act(op: String, key: String, qty: Integer = null) =
      ChangeAction("nk", 1, 0, op, Map("name" -> key),
        if (op == "D") Map.empty
        else Map("qty" -> qty.toString) ++ Option(key).map("name" -> _),
        nulls = if (op != "D" && key == null) Seq("name") else Nil,
        unchanged = Nil, rekey = false)
    // update the NULL-keyed row: must match in place, not insert a twin
    MergeInto(snapshot, Seq(act("U", null, 9)).toDS(), relFull)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet shouldBe
      Set((null, 9), ("x", 2))
    // delete the NULL-keyed row: must actually remove it
    MergeInto(snapshot, Seq(act("D", null)).toDS(), relFull)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet shouldBe
      Set(("x", 2))
  }
}
