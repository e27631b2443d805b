package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * `tables`, cost with `tables / 2^bits`. TUNE against a brute-force
    * sample: P(bucket match) = (1 - θ/π)^bits per table — corpora whose
    * nearest neighbors sit at moderate cosine (θ large) need FEW bits and
    * MANY tables (the measured-recall harness in LlmOperatorsSpec pins
    * recall@5 ≥ 0.7 at 4 bits × 8 tables on the testdata embeddings). */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int = 4, tables: Int = 8, dims: Int = 64): DataFrame = {
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
  /** Deterministic IVF quantizer: seed centroids are the `nCentroids`
    * corpus rows with the smallest id-hash (reproducible, no RNG), then
    * `iters` Lloyd rounds — assign every corpus vector to its best cell by
    * cosine (pure projection against the literal centroid array), compute
    * per-cell element-wise means distributed (posexplode → groupBy(cell,
    * dim) avg), collect the nCentroids×dims result. Empty cells keep their
    * previous centroid. Spherical-k-means-lite: means are not normalized
    * because cosine scoring is scale-invariant. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int): Array[Seq[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // cache for the training loop (seed pass + one scan per Lloyd
    // iteration); float-level math untouched, released on return —
    // UNLESS the caller already holds a cache (ivfPqTopK trains two
    // models over the same normalized corpus: re-materializing the
    // corpus-sized cache between trainers is waste at any scale)
    val preCached = corpus.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val c =
      if (preCached) corpus
      else corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    var cents: Array[Seq[Double]] = c
      .select(col(idCol).cast("long"), VectorMath.toDouble(col(vecCol)))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nCentroids)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2)
    require(cents.nonEmpty, "empty corpus")
    for (_ <- 0 until iters) {
      val centArr = array(cents.toIndexedSeq.map(v => typedLit(v)): _*)
      val scores = transform(centArr, cv => VectorMath.cosine(col(vecCol), cv))
      val assigned = c.select(
        VectorMath.toDouble(col(vecCol)).as("__v"),
        (array_position(scores, array_max(scores)) - 1).cast("int").as("__cid"))
      val means = assigned
        .select(col("__cid"), posexplode(col("__v")))
        .groupBy(col("__cid"), col("pos")).agg(avg(col("col")).as("m"))
        .as[(Int, Int, Double)].collect()
        .groupBy(_._1)
        .map { case (cid, rows) => cid -> rows.sortBy(_._2).map(_._3).toSeq }
      cents = Array.tabulate(cents.length)(c => means.getOrElse(c, cents(c)))
    }
    cents
    } finally if (!preCached) c.unpersist(false)
  }

  /** The DOCUMENTED partial-probe operating point, decided on a measured
    * recall/latency tradeoff (`IvfOperatingPointSpec`): at 4/16 probes,
    * 3 Lloyd iterations lift recall@5 over hash-sampled seed centroids by
    * an amount that depends on how clustered the corpus is (+0.10 on the
    * sf0.01 embeddings, +0.01 on sf0.1) and never measurably hurt, for a
    * build-time-only cost (a few distributed assignment+mean passes) that
    * amortizes to zero over a static corpus — which is exactly what a
    * training-data pipeline queries. Probe-all (`nProbe = nCentroids`)
    * remains the EXACT configuration and needs no training (cell shapes
    * cannot change an exhaustive search, so the `ann_ivf` correctness
    * gate runs full-probe untrained). */
  final case class IvfConfig(nCentroids: Int, nProbe: Int, trainIters: Int)
  val RecommendedIvf: IvfConfig = IvfConfig(nCentroids = 16, nProbe = 4, trainIters = 3)

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, trainIters: Int = 0): DataFrame = {
    // The quantizer model is bounded (nCentroids×dims) and baked into the
    // plan as a literal, so cell assignment is a pure projection: no
    // centroid join, no per-row window.
    val centVecs: Array[Seq[Double]] =
      trainCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
    val centArr = array(centVecs.toIndexedSeq.map(v => typedLit(v)): _*)

    // per-row cell scores against every centroid (small: nCentroids entries)
    def cellScores(vec: Column): Column =
      transform(centArr, cv => VectorMath.cosine(vec, cv))
    // corpus → its single best cell: first index of the max score
    // (ties → smallest cell id, matching the former window tie-break)
    def bestCell(vec: Column): Column = {
      val s = cellScores(vec)
      (array_position(s, array_max(s)) - 1).cast("int")
    }
    // query → its nProbe best cells
    def probeCells(vec: Column): Column = {
      val s = cellScores(vec)
      val ranked = array_sort(zip_with(s,
        sequence(lit(0), lit(centVecs.length - 1)),
        (sc, i) => struct(sc.as("s"), i.as("i"))))
      transform(slice(reverse(ranked), 1, nProbe), e => e("i").cast("int"))
    }

    // Two quirks in this projection are load-bearing when queries and
    // corpus filter the SAME frame (a self-join):
    //  - two-step select: the cell lambdas must reference the fresh __cv
    //    alias, not the caller's raw vector attribute — self-join dedup
    //    renumbers one branch and lambda-captured references to the
    //    original attribute are what it fails to rewrite;
    //  - the `+ rand*0` no-op taints __cid as nondeterministic, which
    //    stops InferFiltersFromConstraints from expanding the alias into
    //    a join-key not-null filter: that inferred filter lands on the
    //    RENUMBERED branch still referencing the original vector
    //    attribute → runtime [INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]. (The
    //    LSH path is immune only because posexplode blocks constraint
    //    propagation on both sides.)
    val corpusCells = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .select(col("neighbor_id"), col("__cv"),
        (bestCell(col("__cv")) + (rand(0) * 0).cast("int")).as("__cid"))
    // explode gets its own projection: a generator whose child expression
    // nests lambdas breaks self-join attribute dedup
    val queryCells = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
        .withColumn("__cells", probeCells(col("__qv")))
        .select(col("query_id"), col("__qv"), explode(col("__cells")).as("__cid")))
    // each corpus row lives in exactly one cell → a (query, neighbor) pair
    // meets at most once; no dedup needed
    val scored = corpusCells.join(queryCells, Seq("__cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** PQ codebooks trained by per-subspace Lloyd (L2, the PQ objective)
    * over the L2-NORMALIZED corpus: `m` subspaces × `nCodes` codewords.
    * Seeds are the `nCodes` corpus rows with the smallest id-hash (no
    * RNG, reproducible), one distributed assignment+mean job per
    * iteration covers ALL subspaces (posexplode by subspace, slice by
    * column-start), empty cells keep their previous codeword. The model
    * is m×nCodes×(dims/m) doubles — codebook-sized, like the IVF and SQ8
    * models. `vecCol` must already be normalized ([[pqTopK]] does it). */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, nCodes: Int, iters: Int): Array[Array[Array[Double]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // cache for the training loop, same caller-aware regime as
    // trainCentroids
    val preCached = corpus.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val cc =
      if (preCached) corpus
      else corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val seeds = cc
      .select(col(idCol).cast("long"), VectorMath.toDouble(col(vecCol)))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nCodes)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2)
    require(seeds.length == nCodes,
      s"corpus has ${seeds.length} rows < nCodes=$nCodes")
    val dims = seeds.head.size
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val sub = dims / m
    var cb: Array[Array[Array[Double]]] = Array.tabulate(m)(j =>
      seeds.map(v => v.slice(j * sub, (j + 1) * sub).toArray))
    for (_ <- 0 until iters) {
      val cbFlat = typedLit(cb.flatten.flatten.toSeq)
      val means = cc
        .select(VectorMath.toDouble(col(vecCol)).as("__v"),
          VectorMath.pqEncode(col(vecCol), cbFlat, m, nCodes).as("__codes"))
        .select(col("__v"), posexplode(col("__codes")).as(Seq("j", "c")))
        .select(col("j"), col("c"),
          posexplode(slice(col("__v"), col("j") * sub + 1, lit(sub))).as(Seq("d", "x")))
        .groupBy(col("j"), col("c"), col("d")).agg(avg(col("x")).as("mu"))
        .as[(Int, Int, Int, Double)].collect()
        .groupBy(r => (r._1, r._2))
      cb = Array.tabulate(m)(j => Array.tabulate(nCodes)(c =>
        means.get((j, c))
          .map(_.sortBy(_._3).map(_._4).toArray)
          .getOrElse(cb(j)(c))))
    }
    cb
    } finally if (!preCached) cc.unpersist(false)
  }

  /** PRODUCT-QUANTIZED top-k — the billion-scale ANN design (IVF-PQ's
    * compression half): both sides L2-normalize (so inner product =
    * cosine), the corpus encodes to `m` small ints per row against
    * per-subspace trained codebooks (m bytes/row where SQ8 spends
    * dims bytes — a 100 TB float corpus scans as ~1.5 TB of PQ codes at
    * m=8, dims=64), queries score every code ASYMMETRICALLY through the
    * codebook (corpus floats never touched), and the exact float cosine
    * re-ranks only the top `k·rerankFactor` pool per query — the same
    * candidates-broadcast shape as [[sq8TopK]], corpus never shuffled. */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, nCodes: Int = 16, trainIters: Int = 3,
      rerankFactor: Int = 4): DataFrame = {
    def normalized(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col(idCol).as(idAs), VectorMath.toDouble(col(vecCol)).as("__raw"))
        .withColumn("__nrm", VectorMath.norm(col("__raw")))
        // zero-norm, NaN- or Infinity-component vectors have no direction to
        // quantize (and the bare division THROWS under ANSI): excluded, matching
        // cosine's NULL-on-degenerate-norm policy in the un-quantized ANN paths
        .filter(col("__nrm") > 0 && col("__nrm") <= Double.MaxValue)
        .select(col(idAs), transform(col("__raw"), x => x / col("__nrm")).as(vecAs))
    val cN = normalized(corpus, "neighbor_id", "__cv")
    val qN = normalized(queries, "query_id", "__qv")

    val cb = trainPqCodebooks(cN, "neighbor_id", "__cv", m, nCodes, trainIters)
    val cbFlat = typedLit(cb.flatten.flatten.toSeq)

    val codes = cN.select(col("neighbor_id"),
      VectorMath.pqEncode(col("__cv"), cbFlat, m, nCodes).as("__code"))
    val q = broadcast(qN)

    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("__aip").desc, col("neighbor_id"))
    val cands = codes
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.pqIpAsym(col("__qv"), col("__code"), cbFlat, m, nCodes)
          .as("__aip"))
      .withColumn("__arank", row_number().over(wApprox))
      .filter(col("__arank") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank of the pool only (cosine is scale-invariant: the
    // normalized corpus projection serves as the float source)
    val scored = cN.join(broadcast(cands), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-PQ top-k — the two halves of the billion-scale index COMBINED:
    * IVF cell pruning cuts the SCAN to `nProbe/nCentroids` of the corpus,
    * PQ codes cut the BANDWIDTH of what is scanned to `m` ints/row, the
    * asymmetric codebook score ranks candidates without touching corpus
    * floats, and the exact cosine re-rank recovers precision over the
    * per-query pool. The PQ codebook is trained on the whole normalized
    * corpus and SHARED across cells (the IVF-Flat-PQ variant — one
    * codebook model instead of nCentroids residual codebooks; residual
    * encoding trades model size for recall and is not needed at these
    * dims). Both models are literal-sized: nCentroids×dims +
    * m×nCodes×(dims/m) doubles baked into the plan, no joins to build.
    *
    * Exactness envelope (the gate): `nProbe = nCentroids` probes every
    * cell and a pool covering the corpus makes the re-rank exhaustive —
    * the result is then brute force THROUGH the full cell+code machinery.
    * The approximate operating point is pinned by a measured recall floor
    * (`LlmOperatorsSpec`). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 8, nCodes: Int = 16, trainIters: Int = 3,
      rerankFactor: Int = 4): DataFrame = {
    def normalized(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col(idCol).as(idAs), VectorMath.toDouble(col(vecCol)).as("__raw"))
        .withColumn("__nrm", VectorMath.norm(col("__raw")))
        // zero-norm, NaN- or Infinity-component vectors have no direction to
        // quantize (and the bare division THROWS under ANSI): excluded, matching
        // cosine's NULL-on-degenerate-norm policy in the un-quantized ANN paths
        .filter(col("__nrm") > 0 && col("__nrm") <= Double.MaxValue)
        .select(col(idAs), transform(col("__raw"), x => x / col("__nrm")).as(vecAs))
    val cN = normalized(corpus, "neighbor_id", "__cv")
    val qN = normalized(queries, "query_id", "__qv")

    // ONE corpus cache shared by both trainers (IVF centroids + PQ
    // codebooks train over the same normalized projection; the trainers
    // detect the held cache and neither re-persist nor drop it), released
    // before the query plan itself runs — the final scan is a single
    // streaming pass and should not pin corpus-sized memory. The two
    // trainings are INDEPENDENT given that cache — neither reads the
    // other's model — so they run CONCURRENTLY: each is a chain of small
    // assignment+mean jobs with driver-side collects between them, and
    // overlapping the chains hides one trainer's per-job latency behind
    // the other's (the cluster is idle during each driver-side fold).
    // Await-all-then-rethrow, not fail-fast: a failed trainer must not
    // leave the other's jobs running against an unpersisted cache.
    val cNCached = cN.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (centVecs, cb) =
      try {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try {
          // Each trainer tags its jobs with a job group set on its OWN
          // pool thread (job groups are thread-local session properties):
          // the first trainer to fail latches its exception and cancels
          // the sibling's group, so the await-all below can never block
          // forever behind a wedged sibling while a real failure sits
          // unreported (Duration.Inf alone had exactly that hole).
          // cancelJobGroupAndFutureJobs, not cancelJobGroup: the trainers
          // are CHAINS of small jobs with driver-side folds between them,
          // so the sibling is often between jobs at cancel time - a plain
          // cancel would find no active jobs, no-op, and let the rest of
          // the chain run to completion (the lost-cancel race); the
          // future-jobs form also kills submissions that follow. The
          // latched ROOT failure is what rethrows - the sibling's induced
          // cancellation exception never masks the cause - and because
          // cancellation completes both futures, the no-jobs-after-
          // unpersist guarantee of await-all survives intact.
          val sc = cNCached.sparkSession.sparkContext
          val tag = java.util.UUID.randomUUID().toString
          val (gCent, gCb) = (s"graft-ivfpq-cent-$tag", s"graft-ivfpq-cb-$tag")
          val rootFailure = new java.util.concurrent.atomic.AtomicReference[Throwable]
          def grouped[T](group: String, sibling: String)(body: => T): T =
            try {
              sc.setJobGroup(group, "ivf-pq trainer", interruptOnCancel = true)
              body
            } catch { case e: Throwable =>
              if (rootFailure.compareAndSet(null, e))
                sc.cancelJobGroupAndFutureJobs(sibling)
              throw e
            } finally sc.clearJobGroup()
          val fCent = scala.concurrent.Future(grouped(gCent, gCb)(
            trainCentroids(cNCached, "neighbor_id", "__cv", nCentroids, trainIters)))
          val fCb = scala.concurrent.Future(grouped(gCb, gCent)(
            trainPqCodebooks(cNCached, "neighbor_id", "__cv", m, nCodes, trainIters)))
          val inf = scala.concurrent.duration.Duration.Inf
          val rCent = scala.util.Try(scala.concurrent.Await.result(fCent, inf))
          val rCb = scala.util.Try(scala.concurrent.Await.result(fCb, inf))
          Option(rootFailure.get).foreach(e => throw e)
          (rCent.get, rCb.get)
          // shutdownNow, not shutdown: on every normal/failure path both
          // futures have completed (await-all) and it degenerates to
          // shutdown; the one path that reaches here with a trainer still
          // running — the awaiting thread itself interrupted — must not
          // leave detached trainer threads submitting jobs against the
          // about-to-be-unpersisted cache (cf. StreamingMerge's abort path)
        } finally pool.shutdownNow()
      } finally cNCached.unpersist(false)
    val cbFlat = typedLit(cb.flatten.flatten.toSeq)
    val centArr = array(centVecs.toIndexedSeq.map(v => typedLit(v)): _*)

    def cellScores(vec: Column): Column =
      transform(centArr, cv => VectorMath.cosine(vec, cv))
    def bestCell(vec: Column): Column = {
      val s = cellScores(vec)
      (array_position(s, array_max(s)) - 1).cast("int")
    }
    def probeCells(vec: Column): Column = {
      val s = cellScores(vec)
      val ranked = array_sort(zip_with(s,
        sequence(lit(0), lit(centVecs.length - 1)),
        (sc, i) => struct(sc.as("s"), i.as("i"))))
      transform(slice(reverse(ranked), 1, nProbe), e => e("i").cast("int"))
    }

    // corpus rows carry (cell, codes) only — m ints, never the floats;
    // same two-step select + rand-taint quirks as ivfTopK (self-join
    // attribute dedup vs lambda capture, see the comment there)
    val corpusCells = cN
      .select(col("neighbor_id"), col("__cv"))
      .select(col("neighbor_id"),
        VectorMath.pqEncode(col("__cv"), cbFlat, m, nCodes).as("__code"),
        (bestCell(col("__cv")) + (rand(0) * 0).cast("int")).as("__cid"))
    val queryCells = broadcast(
      qN.withColumn("__cells", probeCells(col("__qv")))
        .select(col("query_id"), col("__qv"), explode(col("__cells")).as("__cid")))

    // each corpus row lives in exactly one cell → pairs meet at most once
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("__aip").desc, col("neighbor_id"))
    val cands = corpusCells.join(queryCells, Seq("__cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.pqIpAsym(col("__qv"), col("__code"), cbFlat, m, nCodes)
          .as("__aip"))
      .withColumn("__arank", row_number().over(wApprox))
      .filter(col("__arank") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    val q = broadcast(qN)
    val scored = cN.join(broadcast(cands), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** SQ8 scalar-quantized top-k: the corpus is pre-quantized to 1
    * byte/dimension against per-dimension corpus `[min,max]` bounds (the
    * memory-bandwidth play — a 100 TB float corpus scans as 25 TB of
    * codes), queries score every code ASYMMETRICALLY (full-precision
    * query against dequantized code), and the exact float cosine re-ranks
    * only the top `k·rerankFactor` candidate pool per query.
    *
    * Scale shape: the bounds are one 64-row aggregate (centroid-sized
    * collect, like the IVF quantizer); quantization is a pure projection
    * inside the corpus scan; queries broadcast twice (approx scoring and
    * re-rank); the candidate pool (|Q|·k·rerankFactor rows) broadcasts
    * back against the corpus — the corpus itself is never shuffled.
    *
    * With `rerankFactor` ≥ 4 the exact re-rank makes the result match
    * brute force whenever the true top-k survive quantized pre-ranking
    * into the pool — on the testdata embeddings it is exact (hash-gated
    * against the brute-force oracle); `AnnSq8Spec` pins recall on random
    * vectors. */
  def sq8TopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, rerankFactor: Int = 4): DataFrame = {
    // per-dimension corpus bounds: dims-row aggregate, bounded collect
    val stats = corpus
      .select(posexplode(VectorMath.toDouble(col(vecCol))))
      .toDF("dim", "x")
      .groupBy(col("dim")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("dim"))
      .collect()
    val mins = stats.map(_.getDouble(1)).toSeq
    val scales = stats.map { r =>
      val d = r.getDouble(2) - r.getDouble(1)
      if (d == 0.0) 0.0 else 255.0 / d
    }.toSeq
    val invScales = scales.map(s => if (s == 0.0) 0.0 else 1.0 / s)
    val (minsC, scalesC, invScalesC) = (typedLit(mins), typedLit(scales), typedLit(invScales))

    val codes = corpus.select(col(idCol).as("neighbor_id"),
      VectorMath.sq8Quantize(col(vecCol), minsC, scalesC).as("__code"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))

    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("__acos").desc, col("neighbor_id"))
    val cands = codes
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.sq8CosineAsym(col("__qv"), col("__code"), minsC, invScalesC)
          .as("__acos"))
      .withColumn("__arank", row_number().over(wApprox))
      .filter(col("__arank") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank of the candidate pool only; pool broadcasts, corpus stays put
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = cv.join(broadcast(cands), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorMath.cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
