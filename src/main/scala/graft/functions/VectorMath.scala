package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `array<float>` embedding columns as codegen'd static
  * calls (StaticInvoke → one JVM loop per row).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * produces the same values but a much larger generated-code tree — with
  * cosine appearing in several operators of an ANN plan, Janino compile
  * time dominated small-batch latency. The loop below performs the SAME
  * strict left-to-right fold in double, so results stay bitwise equal to
  * DuckDB's `list_dot_product`/`list_cosine_similarity` on `::DOUBLE[]`
  * (verified by the driver's oracle gate). */
object VectorMath {

  /** Cast an array<float> to array<double> for stable accumulation. */
  def toDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  private def call(name: String, ret: DataType, args: Column*): Column =
    GraftBridge.column(StaticInvoke(
      VectorMathImpl.getClass, ret, name,
      args.map(GraftBridge.expression),
      inputTypes = args.map(_ => ArrayType(DoubleType)),
      propagateNull = true, returnNullable = true))

  /** Sequential-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    call("dot", DoubleType, toDouble(a), toDouble(b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    call("cosine", DoubleType, toDouble(a), toDouble(b))

  /** Random-hyperplane sign signature for LSH bucketing: `nBits` pseudo
    * hyperplanes with weights derived deterministically from a splitmix64
    * of `(seed, bit, dim)` — no stored model, reproducible across runs and
    * executors. Returns a bigint bucket id. Used by the scale path of ANN
    * search (bucket join instead of an all-pairs cross join). */
  def hyperplaneBucket(v: Column, nBits: Int, dims: Int, seed: Int = 0): Column =
    GraftBridge.column(StaticInvoke(
      VectorMathImpl.getClass, LongType, "hyperplaneBucket",
      Seq(GraftBridge.expression(toDouble(v)),
        GraftBridge.expression(lit(nBits)),
        GraftBridge.expression(lit(seed))),
      inputTypes = Seq(ArrayType(DoubleType), IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))

  /** 8-bit scalar quantization of a vector against per-dimension
    * `[min, max]` corpus bounds: `code_d = round((v_d − min_d)·scale_d)`
    * clamped to [0,255], `scale_d = 255/(max_d − min_d)`. Output is a
    * BINARY code — 4× smaller than the float vector, the memory-bandwidth
    * play that makes a 100 TB ANN scan move 25 TB instead. */
  def sq8Quantize(v: Column, mins: Column, scales: Column): Column =
    GraftBridge.column(StaticInvoke(
      VectorMathImpl.getClass, BinaryType, "sq8Quantize",
      Seq(GraftBridge.expression(toDouble(v)),
        GraftBridge.expression(mins), GraftBridge.expression(scales)),
      inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType)),
      propagateNull = true, returnNullable = true))

  /** Asymmetric SQ8 cosine: the float query against a dequantized code
    * (`min_d + code_d·invScale_d`) — the query side never loses
    * precision, the corpus side is read at 1 byte/dim. */
  def sq8CosineAsym(q: Column, code: Column, mins: Column, invScales: Column): Column =
    GraftBridge.column(StaticInvoke(
      VectorMathImpl.getClass, DoubleType, "sq8CosineAsym",
      Seq(GraftBridge.expression(toDouble(q)), GraftBridge.expression(code),
        GraftBridge.expression(mins), GraftBridge.expression(invScales)),
      inputTypes = Seq(ArrayType(DoubleType), BinaryType,
        ArrayType(DoubleType), ArrayType(DoubleType)),
      propagateNull = true, returnNullable = true))

  /** Product-quantization encode: the vector splits into `m` contiguous
    * subspaces and each subvector maps to its nearest (L2) codeword in
    * that subspace's codebook. `cbFlat` is the trained codebook flattened
    * `[subspace][code][dim]`; output is `m` small ints — the corpus at
    * m bytes/row, the billion-scale ANN memory play. Ties break on the
    * smallest code id (deterministic across engines and runs). */
  def pqEncode(v: Column, cbFlat: Column, m: Int, nCodes: Int): Column =
    GraftBridge.column(StaticInvoke(
      VectorMathImpl.getClass, ArrayType(IntegerType, containsNull = false),
      "pqEncode",
      Seq(GraftBridge.expression(toDouble(v)), GraftBridge.expression(cbFlat),
        GraftBridge.expression(lit(m)), GraftBridge.expression(lit(nCodes))),
      inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType),
        IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))

  /** Asymmetric PQ inner product: the full-precision query against the
    * codeword chain a code array selects — on L2-NORMALIZED inputs this
    * approximates cosine. The corpus floats are never touched. */
  def pqIpAsym(q: Column, codes: Column, cbFlat: Column, m: Int, nCodes: Int): Column =
    GraftBridge.column(StaticInvoke(
      VectorMathImpl.getClass, DoubleType, "pqIpAsym",
      Seq(GraftBridge.expression(toDouble(q)), GraftBridge.expression(codes),
        GraftBridge.expression(cbFlat),
        GraftBridge.expression(lit(m)), GraftBridge.expression(lit(nCodes))),
      inputTypes = Seq(ArrayType(DoubleType), ArrayType(IntegerType),
        ArrayType(DoubleType), IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))
}

object VectorMathImpl {

  /** Strict left-to-right fold, identical FP-operation order to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — including its NULL on
    * mismatched lengths (zip_with pads with nulls): a malformed or
    * truncated embedding yields NULL, never a plausible-but-wrong
    * partial product. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** NULL on zero-norm inputs, same policy as the length-mismatch guard:
    * a zero embedding has no direction, and the 0/0 = NaN it would
    * otherwise produce ranks ABOVE every real neighbor under Spark's
    * NaN-is-greatest ordering (`cosine DESC` top-k) and passes
    * `>= threshold` near-dup filters — a zero-vector corpus row would
    * surface as rank-1 neighbor of every query. NULL instead sorts last
    * and fails every threshold. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val denom = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    // the denominator must be FINITE and positive: 0 gives the 0/0 NaN,
    // a NaN component makes the norm NaN, and an Infinity component (or a
    // norm overflowing to Inf) gives x/Inf = NaN for the Inf dimension —
    // every one of which would outrank real neighbors under Spark's
    // NaN-is-greatest ordering. NULL for all three.
    if (!java.lang.Double.isFinite(denom) || denom <= 0.0) return null
    dot(a, b) / denom
  }

  // splitmix64 finalizer
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** All `nBits` hyperplane projections in ONE pass over the vector:
    * weight(seed, bit, dim) ∈ [-499.5, 499.5] pseudo-random. */
  def hyperplaneBucket(v: ArrayData, nBits: Int, seed: Int): Long = {
    val n = v.numElements()
    val proj = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var h = 0
      while (h < nBits) {
        val w = java.lang.Math.floorMod(
          mix(seed.toLong * 0x9E3779B9L + h.toLong * 0x85EBCA6BL + i), 1000L).toDouble - 499.5
        proj(h) += x * w
        h += 1
      }
      i += 1
    }
    var bucket = 0L
    var h = 0
    while (h < nBits) { if (proj(h) >= 0) bucket |= (1L << h); h += 1 }
    bucket
  }

  def sq8Quantize(v: ArrayData, mins: ArrayData, scales: ArrayData): Array[Byte] = {
    val n = v.numElements()
    if (n != mins.numElements() || n != scales.numElements()) return null
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = math.rint((v.getDouble(i) - mins.getDouble(i)) * scales.getDouble(i))
      out(i) = (if (q < 0) 0 else if (q > 255) 255 else q.toInt).toByte
      i += 1
    }
    out
  }

  def sq8CosineAsym(q: ArrayData, code: Array[Byte], mins: ArrayData,
      invScales: ArrayData): java.lang.Double = {
    val n = q.numElements()
    if (n != code.length || n != mins.numElements() || n != invScales.numElements())
      return null
    var dotQC = 0.0
    var nq = 0.0
    var nc = 0.0
    var i = 0
    while (i < n) {
      val qi = q.getDouble(i)
      val ci = mins.getDouble(i) + (code(i) & 0xff).toDouble * invScales.getDouble(i)
      dotQC += qi * ci; nq += qi * qi; nc += ci * ci
      i += 1
    }
    val denom = math.sqrt(nq) * math.sqrt(nc)
    // zero-norm / NaN / Infinity: see cosine
    if (!java.lang.Double.isFinite(denom) || denom <= 0.0) return null
    dotQC / denom
  }

  /** See [[VectorMath.pqEncode]]. Layout of `cbFlat`:
    * codeword d of code c in subspace j lives at ((j*nCodes + c)*sub + d),
    * sub = dims/m. */
  def pqEncode(v: ArrayData, cbFlat: ArrayData, m: Int, nCodes: Int): ArrayData = {
    val dims = v.numElements()
    if (m <= 0 || dims % m != 0) return null
    val sub = dims / m
    if (cbFlat.numElements() != m * nCodes * sub) return null
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < nCodes) {
        var d2 = 0.0
        var d = 0
        val base = (j * nCodes + c) * sub
        while (d < sub) {
          val diff = v.getDouble(j * sub + d) - cbFlat.getDouble(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c } // strict <: ties keep lowest c
        c += 1
      }
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[VectorMath.pqIpAsym]]. */
  def pqIpAsym(q: ArrayData, codes: ArrayData, cbFlat: ArrayData,
      m: Int, nCodes: Int): java.lang.Double = {
    val dims = q.numElements()
    if (m <= 0 || dims % m != 0 || codes.numElements() != m) return null
    val sub = dims / m
    if (cbFlat.numElements() != m * nCodes * sub) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      val base = (j * nCodes + codes.getInt(j)) * sub
      var d = 0
      while (d < sub) {
        acc += q.getDouble(j * sub + d) * cbFlat.getDouble(base + d)
        d += 1
      }
      j += 1
    }
    acc
  }
}
