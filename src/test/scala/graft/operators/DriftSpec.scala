package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class DriftSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("identical snapshots drift exactly zero in every bucket") {
    val df = Seq(1, 1, 2, 3, 3, 3).toDF("v")
    val r = Drift.psiReport(df, df, col("v")).collect()
    r.length shouldBe 3
    r.foreach(_.getDouble(3) shouldBe 0.0)
  }

  test("one-sided buckets get smoothed finite terms; totals reflect both sides") {
    // a only has bucket 1, b only has bucket 2: without smoothing both
    // terms are infinite; with +0.5 smoothing they are finite, equal in
    // magnitude (the setup is symmetric), and opposite-signed sides of
    // the same divergence
    val a = Seq(1, 1).toDF("v")
    val b = Seq(2, 2).toDF("v")
    val m = Drift.psiReport(a, b, col("v")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    m.keySet shouldBe Set(1, 2)
    m(1)._1 shouldBe 2L; m(1)._2 shouldBe 0L
    m(2)._1 shouldBe 0L; m(2)._2 shouldBe 2L
    // p_hot = 2.5/3, p_cold = 0.5/3 on each side; both terms positive
    // (PSI terms always are) and equal by symmetry
    val expect = (2.5 / 3.0 - 0.5 / 3.0) * math.log((2.5 / 3.0) / (0.5 / 3.0))
    m(1)._3 shouldBe expect +- 1e-9
    m(2)._3 shouldBe expect +- 1e-9
  }
}
