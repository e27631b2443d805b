package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextAnalysis

/** Corpus-trained BPE vocabulary (SURVEY.md §2.3, the standard
  * LLM-pipeline tokenizer-training step): iterated distributed
  * merge-pair counting. Classic byte-pair-encoding training — start from
  * character segmentations, repeatedly merge the corpus-wide most
  * frequent adjacent symbol pair — re-expressed for Spark:
  *
  *   - ONE corpus-sized scan builds the word-frequency table; every
  *     training round after that runs over the DISTINCT-WORD vocabulary
  *     (bounded by the language, not the corpus — the shape that makes
  *     this viable at 100 TB);
  *   - each round is a pair-count aggregate (explode adjacent symbol
  *     pairs weighted by word count, map-side partial sums) plus a
  *     driver-side argmax of ONE row: the merge decision is global by
  *     definition, and k rounds = k vocab-sized jobs;
  *   - segmentations are flat strings — symbols joined by TWO spaces
  *     with single-space sentinels (` l  o  w `) — so applying a merge is
  *     one codegen'd `replace` of `" l  o "` with `" lo "`: left-to-right
  *     non-overlapping replacement is exactly BPE's greedy merge order,
  *     the double-space interior keeps adjacent matches from consuming
  *     each other's delimiter, and the single-space pattern frame cannot
  *     match inside a multi-character symbol. Pair extraction reuses the
  *     [[TextAnalysis.wordNgrams]] single-pass kernel (symbols are
  *     whitespace tokens of the segmentation).
  *
  * Words shorter than 2 characters can never contribute a pair and are
  * excluded up front (also sidesteps empty-token edge divergence between
  * engines). Ties in pair frequency break on the pair string ascending,
  * so training is deterministic and cross-engine reproducible — the
  * DuckDB oracle replays the same rounds with `replace` on the same
  * segmentation strings.
  */
object Bpe {

  /** Truncate `seg`'s lineage every this many merge rounds: without the
    * cut, round r's plan carries r composed `replace`s and Catalyst
    * re-analyzes the whole chain every round — O(k^2) analysis for a
    * k-merge vocabulary, which is what makes a thousands-of-merges
    * production training run infeasible in one lineage. A localCheckpoint
    * pins a vocab-sized snapshot (bounded by the language, not the
    * corpus), so the cost per cut is small and per-round work stays
    * bounded by `CheckpointEvery` replaces. */
  private val CheckpointEvery = 16

  /** Train `rounds` BPE merges; returns one row per performed round:
    * `(round, pair_left, pair_right, merged, freq)`, in round order.
    * Stops early if the vocabulary runs out of pairs (fully merged). */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMergesList(docs, textCol, rounds)
      .toDF("round", "pair_left", "pair_right", "merged", "freq")
  }

  /** [[trainMerges]], returning the merge list as driver-local data (the
    * result is one row per round by construction — it IS driver-sized).
    * Callers that both publish the vocabulary and encode with it share
    * one training run through this form instead of training twice. */
  def trainMergesList(docs: DataFrame, textCol: String,
      rounds: Int): Seq[(Int, String, String, String, Long)] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // the ONE corpus-sized scan, MATERIALIZED: each round's argmax
    // executes its full lineage, which without the persist is a corpus
    // re-scan per round (measured: 6.0s for 6 rounds at sf0.1; the
    // cached vocab makes rounds vocab-sized as the class doc promises)
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .persist()
    try {
      var seg = words.withColumn("seg", charSeg(col("word"))).select(col("wc"), col("seg"))
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val top = seg
          .select(col("wc"), explode(TextAnalysis.wordNgrams(col("seg"), 2)).as("pair"))
          .groupBy(col("pair")).agg(sum(col("wc")).as("freq"))
          .orderBy(col("freq").desc, col("pair").asc)
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val pair = top(0).getString(0)
          val freq = top(0).getLong(1)
          val Array(left, right) = pair.split(" ", 2)
          merges += ((r, left, right, left + right, freq))
          seg = seg.withColumn("seg",
            replaceAll(col("seg"), s" $left  $right ", s" ${left + right} "))
          // lineage cut (see CheckpointEvery): eager, so the snapshot job
          // runs here, once, instead of inflating the next argmax. The
          // handful of pinned vocab-sized snapshots (rounds/16) are
          // negligible next to executor heap; a reliable checkpoint dir
          // would be the cluster-grade variant.
          if (r % CheckpointEvery == 0) seg = seg.localCheckpoint(true)
          r += 1
        }
      }
      merges.result()
    } finally words.unpersist(blocking = false)
  }

  /** PRODUCTION-SCALE training: `batchK` merges selected per round
    * instead of one — the standard fast-BPE-trainer approximation (also
    * how a 32k-merge vocabulary becomes ~32k/K Spark jobs instead of
    * 32k). Per round, ONE pair-count job ranks all pairs
    * (freq desc, pair asc — same order as exact training) and the top K
    * pairs with pairwise-DISJOINT symbols are merged together: the
    * disjointness guarantee means no selected pair's symbols were
    * produced or consumed by another merge in the same batch, so each
    * selected pair's count was exact at selection time. Counts of
    * NEIGHBORING pairs do shift within a batch (as in every batched
    * trainer), so for K > 1 the merge sequence can diverge from exact
    * BPE's; `batchK = 1` is exactly [[trainMerges]] (spec-pinned).
    * Merges within a batch apply greedily in rank order through the same
    * composed-replace chain as encode, and lineage checkpoints as in
    * exact training. Returns `(round, rank, pair_left, pair_right,
    * merged, freq)` — freq as measured at the batch's selection point. */
  def trainMergesBatched(docs: DataFrame, textCol: String, totalMerges: Int,
      batchK: Int): DataFrame = {
    require(totalMerges >= 1, s"totalMerges must be >= 1, got $totalMerges")
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .persist()
    try {
      var seg = words.withColumn("seg", charSeg(col("word"))).select(col("wc"), col("seg"))
      val out = Seq.newBuilder[(Int, Int, String, String, String, Long)]
      var done = 0
      var round = 1
      var exhausted = false
      var sinceCheckpoint = 0
      while (done < totalMerges && !exhausted) {
        val want = math.min(batchK, totalMerges - done)
        // over-fetch: disjointness filtering drops some of the top ranks,
        // and the filter must run in rank order over a driver-sized list
        val ranked = seg
          .select(col("wc"), explode(TextAnalysis.wordNgrams(col("seg"), 2)).as("pair"))
          .groupBy(col("pair")).agg(sum(col("wc")).as("freq"))
          .orderBy(col("freq").desc, col("pair").asc)
          .limit(want * 4 + 16)
          .as[(String, Long)].collect()
        if (ranked.isEmpty) exhausted = true
        else {
          val used = collection.mutable.Set.empty[String]
          val picked = ranked.iterator.flatMap { case (pair, freq) =>
            val Array(l, r) = pair.split(" ", 2)
            if (used.contains(l) || used.contains(r)) None
            else { used += l; used += r; Some((l, r, freq)) }
          }.take(want).toSeq
          picked.zipWithIndex.foreach { case ((l, r, freq), i) =>
            out += ((round, i + 1, l, r, l + r, freq))
            seg = seg.withColumn("seg",
              replaceAll(col("seg"), s" $l  $r ", s" ${l + r} "))
            sinceCheckpoint += 1
            if (sinceCheckpoint >= CheckpointEvery) {
              seg = seg.localCheckpoint(true)
              sinceCheckpoint = 0
            }
          }
          done += picked.size
          // fewer picked than wanted means disjointness starved the batch,
          // not exhaustion — the next round's fresh count continues
          if (picked.isEmpty) exhausted = true
          round += 1
        }
      }
      out.result().toDF("round", "rank", "pair_left", "pair_right", "merged", "freq")
    } finally words.unpersist(blocking = false)
  }

  /** The APPLY side of [[trainMerges]] — tokenize a corpus with a trained
    * merge list: per-document word and subword-token counts under the
    * vocabulary. ONE corpus scan: every word char-segments and the k
    * merges compose into a single codegen'd replace chain (same framed
    * representation, so application order and greedy semantics match
    * training exactly); the only shuffle is the one-row-per-doc partial
    * aggregate. Output: `(idCol, n_words, n_subtokens)`. */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val seg0 = charSeg(col("__word"))
    val segN = merges.foldLeft(seg0) { case (s, (l, r)) =>
      replaceAll(s, s" $l  $r ", s" ${l + r} ")
    }
    docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("__word"))
      .select(col(idCol),
        size(split(trim(segN), "\\s+")).cast("long").as("__n_sub"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__n_sub")).as("n_subtokens"))
  }

  /** Literal (non-regex) replace-all; `functions.replace` arrived in
    * Spark 3.5 under the SQL name — build the expression via the
    * registry-independent StringReplace. */
  private def replaceAll(src: Column, search: String, replacement: String): Column =
    GraftBridge.column(org.apache.spark.sql.catalyst.expressions.StringReplace(
      GraftBridge.expression(src),
      GraftBridge.expression(lit(search)),
      GraftBridge.expression(lit(replacement))))

  /** ` c  h  a  r ` segmentation of a word: code-point symbols joined by
    * two spaces inside single-space sentinels (see class doc for why this
    * exact framing makes `replace` a correct BPE merge). */
  def charSeg(word: Column): Column =
    GraftBridge.column(StaticInvoke(
      Bpe.getClass, StringType, "charSegImpl",
      Seq(GraftBridge.expression(word)),
      inputTypes = Seq(StringType),
      propagateNull = true, returnNullable = true))

  def charSegImpl(word: UTF8String): UTF8String = {
    if (word == null) return null
    val s = word.toString
    val sb = new java.lang.StringBuilder(s.length * 3 + 2)
    sb.append(' ')
    var i = 0
    var first = true
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!first) sb.append("  ")
      first = false
      sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.append(' ')
    UTF8String.fromString(sb.toString)
  }
}
