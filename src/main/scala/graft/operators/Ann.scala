package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorMath

/** Approximate-nearest-neighbor search over embedding columns (SURVEY.md
  * §2.3 #36-37).
  *
  * Scale shape: the query set is broadcast (it is the small side by
  * construction); the corpus is scanned once. `bruteForceTopK` is the exact
  * baseline — |Q|×|C| scored rows, pruned per-query by window top-k; the
  * scale path is [[lshTopK]], which buckets both sides with random
  * hyperplane signatures so each query only scores its bucket (multi-table
  * to recover recall), turning the cross join into an equi-join.
  */
object Ann {

  /** Exact cosine top-k per query (baseline / verifier). Output:
    * (query_id, neighbor_id, cosine, rank). Deterministic: ties break on
    * neighbor id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed top-k: `tables` independent hyperplane signatures of
    * `bits` bits; query and corpus rows meet only inside matching buckets,
    * then exact cosine re-ranks the union of candidates. Recall grows with
    * `tables`, cost with `tables / 2^bits`. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int = 8, tables: Int = 2, dims: Int = 64): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        // each table gets its own hyperplane family (distinct hash seed),
        // tagged so buckets never collide across tables
        posexplode(array((0 until tables).map(t =>
          VectorMath.hyperplaneBucket(col(vecCol), bits, dims, seed = t) +
            lit(t.toLong << 32)): _*)))
        .toDF(idAs, vecAs, "__tbl", "__bkt")
    val q = bucketed(queries, "query_id", "__qv").alias("q")
    val c = bucketed(corpus, "neighbor_id", "__cv").alias("c")
    val scored = c.join(broadcast(q),
        col("q.__bkt") === col("c.__bkt") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.cosine(col("q.__qv"), col("c.__cv")).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) top-k: partition the corpus into `nCentroids`
    * cells around deterministically-sampled centroid vectors (the corpus
    * rows with the smallest id-hash — no trained model, reproducible);
    * each query probes its `nProbe` nearest cells and re-ranks exactly
    * inside them. The cluster-scale shape: the corpus is scored against a
    * broadcast centroid table once at build, and query work is
    * `nProbe/nCentroids` of the corpus instead of all of it. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = broadcast(
      corpus.select(col(idCol), col(vecCol))
        .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nCentroids)
        .select(row_number().over(Window.orderBy(col(idCol))).as("__cid"),
          col(vecCol).as("__cv")))

    def assign(df: DataFrame, idAs: String, vecAs: String, probes: Int) = {
      val scored = df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
        .join(cents, lit(true))
        .select(col(idAs), col(vecAs), col("__cid"),
          VectorMath.cosine(col(vecAs), col("__cv")).as("__cdist"))
      val w = Window.partitionBy(col(idAs)).orderBy(col("__cdist").desc, col("__cid"))
      scored.withColumn("__crn", row_number().over(w))
        .filter(col("__crn") <= probes)
        .drop("__cdist", "__crn")
    }

    val corpusCells = assign(corpus, "neighbor_id", "__cv2", probes = 1)
    val queryCells = broadcast(assign(queries, "query_id", "__qv", probes = nProbe))
    val scored = corpusCells.join(queryCells, Seq("__cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.cosine(col("__qv"), col("__cv2")).as("cosine"))
      .distinct() // a pair can meet in several probed cells
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
