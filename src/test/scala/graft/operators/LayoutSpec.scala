package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class LayoutSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("zValue2 interleaves bits: x even positions, y odd") {
    // x=5 (101) -> bits 0,4; y=3 (011) -> bits 1,3 => 1+16+2+8 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    z shouldBe 27L
    // identity checks: y=0 spreads x across even bits; x=0 doubles that
    Seq((7L, 0L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 3)).as[Long].head() shouldBe 21L
    Seq((0L, 7L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 3)).as[Long].head() shouldBe 42L
  }

  test("zValue2 ignores bits above the requested width") {
    val a = Seq((5L + 8L, 3L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 3)).as[Long].head()
    a shouldBe 27L
  }

  test("z-ordered range partitions have tight 2-D bounding boxes") {
    // full 64x64 grid -> 16 partitions; a z-ordered partition covers a
    // compact region (bbox area near 4096/16=256), where any 1-D sort
    // would stripe the full 64 extent of the other dimension
    val grid = spark.range(0, 4096)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y")
    val parts = Layout.zorderBy(grid, col("x"), col("y"), 6, 16)
      .select(col("x"), col("y"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n"),
        ((max(col("x")) - min(col("x")) + 1) *
         (max(col("y")) - min(col("y")) + 1)).as("bbox"))
      .collect()
    parts.map(_.getAs[Long]("n")).sum shouldBe 4096L
    val avgBbox = parts.map(_.getAs[Long]("bbox")).sum.toDouble / parts.length
    avgBbox should be < 1500.0 // vs 4096 for a random or 1-D-striped split
  }
}
