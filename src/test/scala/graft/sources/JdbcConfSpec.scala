package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class JdbcConfSpec extends AnyFunSuite with Matchers {

  test("partitioned read exposes Spark's parallel-read options") {
    val conf = Jdbc.partitionedTable(
      "jdbc:postgresql://host/db", "public.orders", "o_orderkey", 0L, 1000000L, 64)
    val o = conf.options
    o("partitionColumn") shouldBe "o_orderkey"
    o("lowerBound") shouldBe "0"
    o("upperBound") shouldBe "1000000"
    o("numPartitions") shouldBe "64"
    o("dbtable") shouldBe "public.orders"
  }

  test("unpartitioned read omits partition options") {
    val o = Jdbc.ReadConf("jdbc:postgresql://h/db", "t").options
    o.keySet should not contain "partitionColumn"
    o("fetchsize") shouldBe "10000"
  }

  test("write conf carries batching and isolation") {
    val o = Jdbc.WriteConf("jdbc:postgresql://h/db", "t", batchSize = 5000).options
    o("batchsize") shouldBe "5000"
    o("isolationLevel") shouldBe "READ_COMMITTED"
  }
}
