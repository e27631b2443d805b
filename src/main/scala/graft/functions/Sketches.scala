package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Partition-local similarity sketches (MinHash signature, SimHash) as
  * codegen'd static calls.
  *
  * The explode + groupBy formulation of these sketches shuffles one row per
  * (doc, shingle) — at 100 TB that shuffle dwarfs the actual hashing. Both
  * sketches are algebraic over the shingle multiset, so they are computed
  * here in a single pass per document inside the scan's codegen stage:
  * zero shuffle, zero extra rows. */
object Sketches {

  /** `numHashes` MinHash values of the text's k-shingle set. */
  def minhashSig(text: Column, shingleK: Int, numHashes: Int): Column =
    GraftBridge.column(StaticInvoke(
      SketchImpl.getClass,
      ArrayType(LongType, containsNull = false),
      "minhash",
      Seq(GraftBridge.expression(text),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(shingleK)),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(numHashes))),
      inputTypes = Seq(StringType, IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))

  /** Exact two-text k-shingle Jaccard (see the impl note on
    * [[SketchImpl.jaccard]]). */
  def jaccard(a: Column, b: Column, shingleK: Int): Column =
    GraftBridge.column(StaticInvoke(
      SketchImpl.getClass, DoubleType, "jaccard",
      Seq(GraftBridge.expression(a), GraftBridge.expression(b),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(shingleK))),
      inputTypes = Seq(StringType, StringType, IntegerType),
      propagateNull = true, returnNullable = true))

  /** Distinct k-gram shingles of the lowercased text, single pass. The
    * higher-order-function formulation (`transform(sequence, substr)`)
    * re-scans the string per element — O(len²) per document — while this
    * is one linear sweep. Same result set as the SQL-comprehension oracle
    * for BMP text. */
  def shingleSet(text: Column, k: Int): Column =
    GraftBridge.column(StaticInvoke(
      SketchImpl.getClass,
      ArrayType(StringType, containsNull = false),
      "shingleSet",
      Seq(GraftBridge.expression(text),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(k))),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = true))

  /** True iff the text yields at least one k-shingle — EXACTLY the
    * kernel's predicate (`toLowerCase.length >= k` in UTF-16 units, which
    * `length(lower(text))` does NOT match for supplementary characters).
    * Shingle-less documents all carry the same sentinel signature
    * (all-zero MinHash, zero SimHash), so any banding/chunking candidate
    * join that doesn't exclude them degenerates to all-pairs across the
    * corpus's sub-k documents — Θ(N²) at scale for rows that can never
    * verify. Near-dup pipelines filter on this before banding. */
  def hasShingles(text: Column, k: Int): Column =
    GraftBridge.column(StaticInvoke(
      SketchImpl.getClass, BooleanType, "hasShingles",
      Seq(GraftBridge.expression(text),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(k))),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = true))

  /** 64-bit SimHash of the text's k-shingle set. */
  def simhash64(text: Column, shingleK: Int): Column =
    GraftBridge.column(StaticInvoke(
      SketchImpl.getClass,
      LongType,
      "simhash",
      Seq(GraftBridge.expression(text),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(shingleK))),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = true))
}

object SketchImpl {
  // splitmix64 finalizer: cheap, well-distributed 64-bit mixing
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Rolling polynomial hash of each k-shingle of the lowercased text,
    * visited once; `f` receives each shingle's mixed 64-bit hash.
    * (Multiset visit — MinHash/SimHash are insensitive to the distinct-set
    * vs multiset difference for min, and standard for SimHash.) */
  private def foreachShingleHash(text: UTF8String, k: Int)(f: Long => Unit): Boolean = {
    if (text == null) return false
    val s = text.toString.toLowerCase
    if (s.length < k) return false
    val Base = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    f(mix(h))
    i = 1
    val n = s.length - k + 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      f(mix(h))
      i += 1
    }
    true
  }

  def hasShingles(text: UTF8String, k: Int): Boolean =
    text != null && text.toString.toLowerCase.length >= k

  def shingleSet(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val s = text.toString.toLowerCase
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (s.length >= k) {
      var i = 0
      while (i + k <= s.length) {
        out.add(UTF8String.fromString(s.substring(i, i + k)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]].map(x => x: Any))
  }

  /** Exact k-shingle-set Jaccard of two texts in one pass — identical
    * value to `|A∩B| / (|A|+|B|−|A∩B|)` over [[shingleSet]] results
    * (both-empty → 0/0 → NaN, matching the array_intersect/union form).
    * Exists so the verify step of near-dup pipelines can join candidate
    * TEXT (~bytes) instead of materialized shingle arrays (~10× bytes)
    * through the pair join. */
  def jaccard(a: UTF8String, b: UTF8String, k: Int): java.lang.Double = {
    if (a == null || b == null) return null
    def set(t: UTF8String): java.util.HashSet[String] = {
      val s = t.toString.toLowerCase
      val out = new java.util.HashSet[String]()
      var i = 0
      while (i + k <= s.length) { out.add(s.substring(i, i + k)); i += 1 }
      out
    }
    val sa = set(a)
    val sb = set(b)
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }

  def minhash(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val any = foreachShingleHash(text, k) { h =>
      // Kirsch–Mitzenmacher: hash family i = h1 + i*h2 from two derived
      // hashes — one multiply-add per slot instead of a full remix
      val h1 = mix(h)
      val h2 = mix(h ^ 0xC2B2AE3D27D4EB4FL) | 1L
      var hi = h1
      var i = 0
      while (i < numHashes) {
        if (hi < mins(i)) mins(i) = hi
        hi += h2
        i += 1
      }
    }
    if (!any) return new GenericArrayData(Array.fill[Any](numHashes)(0L))
    new GenericArrayData(mins.map(x => x: Any))
  }

  def simhash(text: UTF8String, k: Int): Long = {
    // SWAR bit-count: accumulator g packs the ones-counts of bits
    // {g, g+8, …, g+56} in eight 8-bit lanes; flushed to the wide counts
    // every 255 shingles (lane overflow bound). 8 ops per shingle instead
    // of 64; same result as the naive ±1 walk.
    val ones = new Array[Int](64)
    val acc = new Array[Long](8)
    var pending = 0
    var total = 0
    def flush(): Unit = {
      var g = 0
      while (g < 8) {
        val a = acc(g)
        var j = 0
        while (j < 8) {
          ones(g + j * 8) += ((a >>> (j * 8)) & 0xFFL).toInt
          j += 1
        }
        acc(g) = 0L
        g += 1
      }
      pending = 0
    }
    foreachShingleHash(text, k) { h =>
      var g = 0
      while (g < 8) {
        acc(g) += (h >>> g) & 0x0101010101010101L
        g += 1
      }
      total += 1
      pending += 1
      if (pending == 255) flush()
    }
    if (pending > 0) flush()
    var out = 0L
    var b = 0
    // majority vote: strictly more ones than zeros (ties → 0), identical
    // to the former counts(b) > 0 criterion
    while (b < 64) { if (2 * ones(b) > total) out |= (1L << b); b += 1 }
    out
  }
}
