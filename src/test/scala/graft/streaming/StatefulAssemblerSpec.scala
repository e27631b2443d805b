package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import graft.cdc.WalMessage

class StatefulAssemblerSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def dml(xid: Long, seq: Int, id: Long) =
    WalMessage(xid, seq, "INSERT", 0L, "t",
      Map("id" -> id.toString), Map("id" -> id.toString), Nil, Nil, false)
  private def commit(xid: Long, lsn: Long) =
    WalMessage(xid, Int.MaxValue, "COMMIT", lsn, "", Map.empty, Map.empty, Nil, Nil, false)

  test("a transaction spanning micro-batches releases only on its commit") {
    val mem = MemoryStream[WalMessage]
    val out = StatefulAssembler.assembleStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("asm")
      .outputMode("append").start()
    try {
      // batch 1: txn 7 partially delivered, txn 8 complete
      mem.addData(dml(7, 0, 1), dml(7, 1, 2), dml(8, 0, 10), commit(8, 800))
      q.processAllAvailable()
      val after1 = spark.table("asm").select("lsn", "seq").as[(Long, Int)].collect().toSet
      after1 shouldBe Set((800L, 0)) // only txn 8 released

      // batch 2: rest of txn 7 + its commit → released with commit LSN,
      // including the messages buffered from batch 1
      mem.addData(dml(7, 2, 3), commit(7, 700))
      q.processAllAvailable()
      val after2 = spark.table("asm").select("lsn", "seq").as[(Long, Int)].collect().toSet
      after2 shouldBe Set((800L, 0), (700L, 0), (700L, 1), (700L, 2))
    } finally q.stop()
  }

  test("TRUNCATE in a committed transaction errors the batch (reference fidelity)") {
    val msgs = Seq(
      dml(5, 0, 1),
      WalMessage(5, 1, "TRUNCATE", 0L, "t", Map.empty, Map.empty, Nil, Nil, false),
      commit(5, 500))
    an[UnsupportedOperationException] should be thrownBy
      graft.cdc.ChangelogAssembler.assembleTxn(msgs, msgs.last).toList
  }

  test("cross-batch assembly on the RocksDB state store (scale-path backend)") {
    // same open-txn-spans-batches scenario as above, but with the open-txn
    // buffer held by RocksDB instead of the in-memory HDFS-backed store —
    // the backend the 100 TB path needs when buffered-txn state outgrows
    // executor heaps. Proves the flatMapGroupsWithState state encoders
    // round-trip through RocksDB's serialized form end-to-end.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    graft.GraftSession.useRocksDbState(spark)
    try {
      val mem = MemoryStream[WalMessage]
      val out = StatefulAssembler.assembleStream(mem.toDS())
      val q = out.writeStream.format("memory").queryName("asm_rocks")
        .outputMode("append").start()
      try {
        mem.addData(dml(7, 0, 1), dml(7, 1, 2), dml(8, 0, 10), commit(8, 800))
        q.processAllAvailable()
        spark.table("asm_rocks").select("lsn", "seq").as[(Long, Int)]
          .collect().toSet shouldBe Set((800L, 0))
        mem.addData(dml(7, 2, 3), commit(7, 700))
        q.processAllAvailable()
        spark.table("asm_rocks").select("lsn", "seq").as[(Long, Int)]
          .collect().toSet shouldBe
          Set((800L, 0), (700L, 0), (700L, 1), (700L, 2))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("uncommitted transactions stay parked (no partial emission)") {
    val mem = MemoryStream[WalMessage]
    val out = StatefulAssembler.assembleStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("asm2")
      .outputMode("append").start()
    try {
      mem.addData(dml(9, 0, 1))
      q.processAllAvailable()
      mem.addData(dml(9, 1, 2))
      q.processAllAvailable()
      spark.table("asm2").count() shouldBe 0
    } finally q.stop()
  }
}
