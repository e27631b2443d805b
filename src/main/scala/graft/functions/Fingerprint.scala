package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** Document fingerprinting (SURVEY.md §2.3 #41): polynomial rolling hash
  * over character windows + winnowing (keep the minimum hash of each
  * window band), the standard near-copy detection fingerprint
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03). Implemented as a static method
  * invoked through Catalyst `StaticInvoke`, so it runs inside generated
  * code like a built-in. */
object Fingerprint {

  /** Winnowed fingerprint set (sorted, distinct) of `text`, with k-gram
    * size `k` and winnow window `w`. */
  def winnow(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(StaticInvoke(
      FingerprintImpl.getClass,
      ArrayType(LongType, containsNull = false),
      "winnow",
      Seq(GraftBridge.expression(text),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(k)),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(w))),
      inputTypes = Seq(StringType, IntegerType, IntegerType),
      propagateNull = true,
      returnNullable = true))

  /** One 64-bit document fingerprint: the minimum winnowed hash. NULL
    * for texts too short to carry a k-gram (their winnow set is empty —
    * plain `element_at` would THROW under ANSI mode, killing the whole
    * scan on the first sub-k document). */
  def fingerprint64(text: Column, k: Int = 8, w: Int = 16): Column =
    org.apache.spark.sql.functions.try_element_at(winnow(text, k, w),
      org.apache.spark.sql.functions.lit(1))
}

object FingerprintImpl {
  private val Base = 1000003L

  /** Rolling polynomial hashes (mod 2^64 — native Long overflow, exact and
    * reproducible) of all k-grams, then winnowing: the minimum hash of
    * every w-window of consecutive k-gram hashes, deduplicated and sorted.
    * Deterministic pure function of the text. */
  def winnow(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (text == null) return null
    val s = text.toString.toLowerCase
    if (s.length < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var pow = 1L // Base^(k-1) mod 2^64
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val picked = scala.collection.mutable.SortedSet.empty[Long]
    if (n <= w) picked += hashes.min
    else {
      var j = 0
      while (j + w <= n) {
        var m = Long.MaxValue
        var t = j
        while (t < j + w) { if (hashes(t) < m) m = hashes(t); t += 1 }
        picked += m
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(picked.toArray)
  }
}
