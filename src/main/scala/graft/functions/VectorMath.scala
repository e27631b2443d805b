package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from native
  * higher-order functions (`zip_with` + `aggregate`) so the arithmetic is
  * codegen'd and — being a strict left-to-right fold in double — bitwise
  * reproducible across engines (verified against DuckDB's
  * list_dot_product/list_cosine_similarity). */
object VectorMath {

  /** Cast an array<float> to array<double> for stable accumulation. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane sign signature for LSH bucketing: `nBits` pseudo
    * hyperplanes derived deterministically from `xxhash64(bit, dim)` —
    * no stored model, reproducible across runs and executors. Returns a
    * bigint bucket id. Used by the scale path of ANN search (bucket join
    * instead of an all-pairs cross join). */
  def hyperplaneBucket(v: Column, nBits: Int, dims: Int, seed: Int = 0): Column = {
    // component c of hyperplane h: a fixed pseudo-random ±1/±2/… weight
    val bits = (0 until nBits).map { h =>
      val proj = aggregate(
        zip_with(toDouble(v), sequence(lit(0), lit(dims - 1)),
          (x, i) => x * (pmod(xxhash64(lit(seed), lit(h), i), lit(1000)).cast("double") - 499.5)),
        lit(0.0), _ + _)
      when(proj >= 0, lit(1L << h)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
