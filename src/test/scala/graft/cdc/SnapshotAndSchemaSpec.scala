package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.types._

import graft.TestSpark

class SnapshotAndSchemaSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("publish writes scratch then atomically replaces live; old version dropped") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val live = SnapshotWriter.publish(v1, base, "items", repartitionKeys = Seq("id"))
    spark.read.parquet(live).count() shouldBe 2

    val v2 = Seq((1L, "a2")).toDF("id", "v")
    SnapshotWriter.publish(v2, base, "items")
    val rows = spark.read.parquet(live).as[(Long, String)].collect().toSet
    rows shouldBe Set((1L, "a2"))
    new java.io.File(SnapshotWriter.scratchPath(base, "items")).exists() shouldBe false
    new java.io.File(SnapshotWriter.trashPath(base, "items")).exists() shouldBe false
  }

  test("recover rolls FORWARD a publish that crashed between the two renames") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap-fwd").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotWriter.publish(Seq((1L, "old")).toDF("id", "v"), base, "t")
    // stage v2 fully, then simulate the crash window: live staged out to
    // trash, forward rename never ran → live is MISSING
    Seq((1L, "new"), (2L, "n2")).toDF("id", "v")
      .write.parquet(SnapshotWriter.scratchPath(base, "t"))
    fs.rename(new org.apache.hadoop.fs.Path(SnapshotWriter.livePath(base, "t")),
      new org.apache.hadoop.fs.Path(SnapshotWriter.trashPath(base, "t")))

    SnapshotWriter.recover(spark, base, "t")
    spark.read.parquet(SnapshotWriter.livePath(base, "t"))
      .as[(Long, String)].collect().toSet shouldBe Set((1L, "new"), (2L, "n2"))
    new java.io.File(SnapshotWriter.trashPath(base, "t")).exists() shouldBe false
    // idempotent
    SnapshotWriter.recover(spark, base, "t")
    spark.read.parquet(SnapshotWriter.livePath(base, "t")).count() shouldBe 2
  }

  test("recover rolls BACK when the staged scratch is incomplete") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap-back").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotWriter.publish(Seq((1L, "old")).toDF("id", "v"), base, "t")
    // incomplete scratch: no _SUCCESS marker
    fs.mkdirs(new org.apache.hadoop.fs.Path(SnapshotWriter.scratchPath(base, "t")))
    fs.rename(new org.apache.hadoop.fs.Path(SnapshotWriter.livePath(base, "t")),
      new org.apache.hadoop.fs.Path(SnapshotWriter.trashPath(base, "t")))

    SnapshotWriter.recover(spark, base, "t")
    spark.read.parquet(SnapshotWriter.livePath(base, "t"))
      .as[(Long, String)].collect().toSet shouldBe Set((1L, "old"))
    new java.io.File(SnapshotWriter.scratchPath(base, "t")).exists() shouldBe false
  }

  test("schema diff reports only-in-source / only-in-target per (column,type)") {
    val src = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("extra", IntegerType)))
    val tgt = StructType(Seq(
      StructField("id", LongType), StructField("name", IntegerType)))
    val d = SchemaVerify.diff(src, tgt)
    d.find(_.columnName == "id").get.status shouldBe "both"
    d.filter(_.columnName == "name").map(_.status).toSet shouldBe
      Set("only in: source", "only in: target") // type mismatch shows as two sides
    d.find(_.columnName == "extra").get.status shouldBe "only in: source"
    SchemaVerify.matches(src, tgt) shouldBe false
    SchemaVerify.matches(src, src) shouldBe true
  }
}
