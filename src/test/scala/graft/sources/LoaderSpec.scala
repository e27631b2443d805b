package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Data-contract hardening for the driver-testdata loaders (round-10
  * regression: the driver regenerated `events.ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) and the loader assumed the old encoding, failing 17
  * queries on one AnalysisException). Every encoding generation the driver
  * has shipped — and the ones it plausibly could — must load to the SAME
  * values through `Tables`.
  */
class LoaderSpec extends AnyFunSpec with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three fixture encodings of the same three instants (whole-micro
    * values, as the generator writes). `nanosAsLong` makes a real
    * TIMESTAMP(NANOS) file indistinguishable from a plain long column,
    * so the long fixture IS the legacy-generation path. */
  private val microsVals = Seq(1700000000000000L, 1700000123456789L, 1700009999000001L)

  private def tmp(): String = Files.createTempDirectory("graft-loader").toString

  private def writeEventsFixture(dir: String, tsType: String): Unit = {
    val base = microsVals.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, "click", 1.0, """{"k":1}""")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val ts = tsType match {
      case "long_nanos" => ($"us" * 1000L).as("ts")                       // legacy NANOS-as-long view
      case "ntz"        => timestamp_micros($"us").cast(TimestampNTZType).as("ts") // current timestamp[us]
      case "tsz"        => timestamp_micros($"us").as("ts")               // UTC-adjusted micros
    }
    base.select($"event_id", ts, $"user_id", $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  describe("Tables.events across encoding generations") {
    for (enc <- Seq("long_nanos", "ntz", "tsz")) {
      it(s"loads the $enc fixture to identical TimestampType instants") {
        val dir = tmp()
        writeEventsFixture(dir, enc)
        val df = Tables.events(spark, dir)
        df.schema("ts").dataType shouldBe TimestampType
        df.select(unix_micros($"ts")).as[Long].collect().sorted shouldBe microsVals.sorted.toArray
      }
    }

    it("loads the driver's actual current events.parquet without analysis errors") {
      val df = Tables.events(spark, "/root/testdata/sf0.001")
      df.schema("ts").dataType shouldBe TimestampType
      // the r10 failure was an AnalysisException at first use, not at read
      df.select(min($"ts"), max($"ts")).collect().head.isNullAt(0) shouldBe false
    }

    it("rejects an unconvertible ts encoding with the table named") {
      val bad = Seq(("a", 1)).toDF("ts", "event_id")
      val e = intercept[IllegalStateException](Tables.normalizeEventTs(bad))
      e.getMessage should include("events.ts")
    }
  }

  describe("Tables.lineitem/orders date-column encodings") {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
    def fixture(dir: String, shipdate: org.apache.spark.sql.Column): Unit =
      Seq((1L, 2L, 3L, 4.0, 5.0, 0.1, "R", "F"))
        .toDF(cols: _*)
        .withColumn("l_shipdate", shipdate)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    for ((enc, mk) <- Seq[(String, org.apache.spark.sql.Column)](
        "long_nanos" -> lit(microsVals.head * 1000L),
        "ntz"        -> timestamp_micros(lit(microsVals.head)).cast(TimestampNTZType),
        "tsz"        -> timestamp_micros(lit(microsVals.head))))
      it(s"normalizes a $enc l_shipdate to the same TIMESTAMP_NTZ instant") {
        val dir = tmp()
        fixture(dir, mk)
        val df = Tables.lineitem(spark, dir)
        df.schema("l_shipdate").dataType shouldBe TimestampNTZType
        df.select(unix_micros(col("l_shipdate").cast(TimestampType)))
          .as[Long].head() shouldBe microsVals.head
      }

    it("normalizes a plain parquet DATE l_shipdate to midnight NTZ") {
      // the most natural re-encoding for a date-grain column; midnight-NTZ
      // is value-identity for date-grain data
      val dayMicros = 1699920000000000L // 2023-11-14 00:00:00 UTC, whole day
      val dir = tmp()
      fixture(dir, timestamp_micros(lit(dayMicros)).cast(DateType))
      val df = Tables.lineitem(spark, dir)
      df.schema("l_shipdate").dataType shouldBe TimestampNTZType
      df.select(unix_micros(col("l_shipdate").cast(TimestampType)))
        .as[Long].head() shouldBe dayMicros
    }

    it("passes the driver's current lineitem and orders through unchanged") {
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .schema("l_shipdate").dataType shouldBe TimestampNTZType
      Tables.orders(spark, "/root/testdata/sf0.001")
        .schema("o_orderdate").dataType shouldBe TimestampNTZType
    }
  }

  describe("Tables.embeddings vector contract") {
    it("downcasts a regenerated list<double> corpus to Array[Float]") {
      val dir = tmp()
      Seq((1L, Seq(1.5d, 2.5d), 0), (2L, Seq(3.0d, 4.0d), 1))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val df = Tables.embeddings(spark, dir)
      df.schema("embedding").dataType shouldBe ArrayType(FloatType, containsNull = true)
      df.orderBy("vec_id").select($"embedding").as[Array[Float]].collect()
        .head shouldBe Array(1.5f, 2.5f)
    }

    it("passes the driver's list<float> corpus through untouched") {
      val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      df.schema("embedding").dataType.asInstanceOf[ArrayType].elementType shouldBe FloatType
    }
  }

  describe("column contract") {
    it("names the table and the missing columns when the driver drops one") {
      val dir = tmp()
      Seq((1L, "x")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val e = intercept[IllegalArgumentException](Tables.documents(spark, dir))
      e.getMessage should (include("documents.parquet") and include("lang"))
    }

    it("holds for every current driver table") {
      Tables.all.foreach(t => Tables(spark, "/root/testdata/sf0.001", t))
    }
  }

  describe("registerAll") {
    it("registers all ten views and events is queryable through SQL") {
      Tables.registerAll(spark, "/root/testdata/sf0.001")
      spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL")
        .as[Long].head() should be > 0L
    }
  }
}
