package graft.cdc

/** Postgres LSN text format ("XLOG/OFFSET", both hex — e.g. "16/B374D848")
  * ↔ 64-bit value, mirroring the reference's lsn utilities
  * (sync/lsn/lsn.go, pglogrepl.LSN). The numeric form is what the engine
  * orders and checkpoints on; the text form appears in slot/status APIs. */
object Lsn {

  def parse(s: String): Long = {
    val idx = s.indexOf('/')
    require(idx > 0 && idx < s.length - 1, s"malformed LSN: $s")
    val hiS = s.substring(0, idx)
    val loS = s.substring(idx + 1)
    // hex digits only: parseLong accepts signs, so "0/-1" would otherwise
    // parse to -1L == parse("FFFFFFFF/FFFFFFFF") instead of failing
    require(hiS.forall(Character.digit(_, 16) >= 0) &&
      loS.forall(Character.digit(_, 16) >= 0), s"malformed LSN: $s")
    val hi = java.lang.Long.parseLong(hiS, 16)
    val lo = java.lang.Long.parseLong(loS, 16)
    require(hi <= 0xFFFFFFFFL && lo <= 0xFFFFFFFFL, s"malformed LSN: $s")
    (hi << 32) | lo
  }

  def format(lsn: Long): String =
    f"${lsn >>> 32}%X/${lsn & 0xFFFFFFFFL}%X"

  // ---- column forms (codegen'd StaticInvoke; see LsnImpl) ----

  import org.apache.spark.sql.{Column, GraftBridge}
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.types.{LongType, StringType}

  def formatCol(lsn: Column): Column =
    GraftBridge.column(StaticInvoke(LsnImpl.getClass, StringType, "format",
      Seq(GraftBridge.expression(lsn.cast(LongType))),
      inputTypes = Seq(LongType), propagateNull = true, returnNullable = true))

  def parseCol(text: Column): Column =
    GraftBridge.column(StaticInvoke(LsnImpl.getClass, LongType, "parse",
      Seq(GraftBridge.expression(text)),
      inputTypes = Seq(StringType), propagateNull = true, returnNullable = false))
}

/** UTF8String adapters for Catalyst StaticInvoke (top-level for codegen). */
object LsnImpl {
  import org.apache.spark.unsafe.types.UTF8String
  def format(lsn: Long): UTF8String = UTF8String.fromString(Lsn.format(lsn))
  def parse(s: UTF8String): Long = Lsn.parse(s.toString)
}
