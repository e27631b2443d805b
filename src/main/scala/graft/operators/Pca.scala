package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorMath

/** Distributed power-iteration PCA over an embedding column — the
  * standard dimensionality/structure step of an embedding pipeline
  * (top principal direction for whitening, dedup projection, or drift
  * monitoring), built on the same EXACT-training regime as
  * [[QualityClassifier]]: every per-row contribution to the matrix-vector
  * product is decimal-rounded and decimal-summed, so the iteration is
  * partition-order-independent and replayable in another engine.
  *
  * Why DECIMAL here when [[Graph.pageRank]] sums scaled LONGS (the faster
  * representation): PageRank's summand is bounded by total rank MASS (~1
  * scaled, provably overflow-free at any corpus size), while this
  * per-dimension sum grows with ROW COUNT — at 10^12 rows × O(1)
  * contributions a scaled-long accumulator overflows around 9·10^9 rows,
  * where `sum(decimal(28,9))` widens to precision 38 and survives any
  * corpus. Training runs once per model; the exchange is dims-sized.
  * (Same reasoning keeps [[QualityClassifier]]'s gradient on decimal.)
  *
  * One iteration of `v ← normalize(Σᵢ (xᵢ·v)·xᵢ)` (power iteration on the
  * Gram matrix XᵀX without ever materializing it):
  *   - `xᵢ·v` is a pure projection against the literal `v` (no join);
  *   - the per-dimension sums posexplode to `(dim, contribution)` and
  *     hash-aggregate with map-side partials — dims×partitions rows
  *     shuffle, never the corpus;
  *   - the normalization runs driver-side on the dims-sized vector with
  *     the SAME decimal discipline, so both engines see one value.
  *
  * The model (v, λ) is dims-sized; corpus passes = iterations + 1. */
object Pca {

  /** Top principal direction + eigenvalue estimate (the final iterate's
    * pre-normalization norm). Deterministic seed: the uniform unit
    * vector `1/√dims` (exact in binary for power-of-two dims). */
  def powerIteration(corpus: DataFrame, vecCol: String,
      iters: Int): (Array[Double], Double) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // persist the narrow projection for the life of the loop: every
    // iteration re-reads it, and for a deflated input (top2's second
    // component) the un-cached lineage would re-run the deflation per
    // iteration on top of the corpus re-scan
    val vecs = corpus.select(VectorMath.toDouble(col(vecCol)).as("__x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val dims = vecs.select(size(col("__x"))).head().getInt(0)
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var lambda = 0.0
    for (_ <- 0 until iters) {
      val vLit = typedLit(v.toSeq)
      // dims-sized result: sort on the DRIVER (the rows are collected
      // anyway) instead of an orderBy — range partitioning samples its
      // child, so the cluster-side sort cost one extra exchange plus a
      // sampling job per iteration for an ordering the driver re-derives
      // in microseconds (same trick as Ann's collect().sortBy trainers)
      val w = vecs
        .select(col("__x"), VectorMath.dot(col("__x"), vLit).as("__p"))
        .select(posexplode(col("__x")).as(Seq("__d", "__xd")), col("__p"))
        .groupBy(col("__d"))
        .agg(sum(round(col("__p") * col("__xd"), 9).cast("decimal(28,9)"))
          .cast("double").as("__w"))
        .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
      require(w.length == dims, s"ragged vectors: got ${w.length} dims, expected $dims")
      // driver-side normalization under the same decimal discipline the
      // SQL replay uses: sum of 9-dp-rounded squares, exactly
      val sq = w.map(x => BigDecimal(x * x).setScale(9, BigDecimal.RoundingMode.HALF_UP))
        .sum
      lambda = math.sqrt(sq.toDouble)
      require(lambda > 0, "degenerate corpus: zero matrix-vector product")
      v = w.map(_ / lambda)
    }
    (v, lambda)
    } finally vecs.unpersist(false)
  }

  /** Per-row projection onto the trained direction (adds `proj`). */
  def project(corpus: DataFrame, vecCol: String, v: Array[Double]): DataFrame =
    corpus.withColumn("proj",
      VectorMath.dot(VectorMath.toDouble(col(vecCol)), typedLit(v.toSeq)))

  /** Deflate: subtract each vector's component along `v` — the input to
    * the NEXT power iteration (Hotelling deflation, how top-k PCA
    * extracts successive components). Pure elementwise projection; the
    * subtraction is exact in IEEE given identical `x·v`, so deflated
    * training stays cross-engine replayable. */
  def deflate(corpus: DataFrame, vecCol: String, v: Array[Double],
      outCol: String): DataFrame = {
    val vLit = typedLit(v.toSeq)
    val x = VectorMath.toDouble(col(vecCol))
    corpus
      .withColumn("__p", VectorMath.dot(x, vLit)) // one dot, not one per dim
      .withColumn(outCol, zip_with(x, vLit, (xi, vi) => xi - col("__p") * vi))
      .drop("__p")
  }

  /** Top-2 components by power iteration + deflation. Returns
    * ((v1, λ1), (v2, λ2)). */
  def top2(corpus: DataFrame, vecCol: String,
      iters: Int): ((Array[Double], Double), (Array[Double], Double)) = {
    val first = powerIteration(corpus, vecCol, iters)
    val deflated = deflate(corpus, vecCol, first._1, "__defl")
    val second = powerIteration(deflated, "__defl", iters)
    (first, second)
  }
}
