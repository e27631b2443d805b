package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset assignment for training pipelines: stable
  * train/val/test splits and hash-fraction sampling that never change
  * across runs, engines, partitionings, or cluster sizes — `rand()`-based
  * splits reshuffle documents between sets on every materialization,
  * which silently leaks validation data into training.
  *
  * Mechanism: the first 4 hex digits of `md5(salt || key)` compared
  * against fraction thresholds AS STRINGS. md5 produces identical
  * lowercase hex everywhere (verified against DuckDB by the driver
  * oracle), hex-string order is value order, and 4 digits give 1/65536
  * granularity — so the same row lands in the same split on any engine.
  * Changing `salt` re-draws the assignment wholesale (e.g. per epoch or
  * per experiment). */
object Sampling {

  private def hexPrefix(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 4)

  private def threshold(frac: Double): String =
    f"${math.min(65535, math.max(0, math.round(frac * 65536))).toInt}%04x"

  /** Split label per row. `fractions` are (label, fraction) with
    * fractions summing to ≤ 1; rows beyond the sum get the last label
    * (i.e. the last fraction may be given as the remainder). */
  def splitLabel(key: Column, salt: String, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "at least one split")
    val sums = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    require(sums.last <= 1.0 + 1e-9, s"fractions sum to ${sums.last} > 1")
    val h = hexPrefix(key, salt)
    fractions.init.zip(sums.init)
      .foldRight(lit(fractions.last._1): Column) { case (((label, _), cum), rest) =>
        when(h < lit(threshold(cum)), lit(label)).otherwise(rest)
      }
  }

  /** Keep-predicate for a deterministic `frac` sample. */
  def sampledBy(key: Column, salt: String, frac: Double): Column =
    if (frac >= 1.0) lit(true)
    else if (frac <= 0.0) lit(false)
    else hexPrefix(key, salt) < lit(threshold(frac))

  /** Per-stratum deterministic sampling — the dataset-MIXING primitive:
    * each source keeps its own rate (downsample the crawl, keep all of
    * the curated set), stable across runs like [[sampledBy]]. Strata
    * absent from `fractions` use `defaultFrac`. */
  def stratifiedSampleBy(key: Column, stratum: Column, salt: String,
      fractions: Map[String, Double], defaultFrac: Double): Column =
    fractions.toSeq.sortBy(_._1).foldRight(sampledBy(key, salt, defaultFrac)) {
      case ((s, f), rest) => when(stratum === s, sampledBy(key, salt, f)).otherwise(rest)
    }

  /** Greedy per-stratum BUDGET fill — the token-budget side of dataset
    * mixing ([[stratifiedSampleBy]] is the rate side): within each
    * stratum, rows are ordered by the same engine-stable md5 draw as
    * [[sampledBy]] (a deterministic shuffle, uncorrelated with any data
    * attribute) and kept while the stratum's RUNNING `weight` total stays
    * within its budget. Greedy prefix, not a knapsack: the first
    * overflowing row and everything after it drop. The selection is a
    * pure function of (dataset, salt, budgets) — identical on any
    * engine, run, or partitioning, which is the reproducibility a mixing
    * recipe needs (rand()-based fills redraw every materialization).
    * One shuffle (hash-partition by
    * stratum, in-partition sort); strata fill independently in parallel,
    * so the op scales with the number of sources, and the per-stratum
    * sort is the honest cost of a running total. Output adds
    * `cum_weight` (the running total including the current row). */
  def budgetFill(df: DataFrame, keyCol: String, stratumCol: String,
      weight: Column, salt: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(concat(lit(salt), col(keyCol).cast("string"))))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(defaultBudget): Column) { case ((s0, b), rest) =>
        when(col(stratumCol) === s0, lit(b)).otherwise(rest)
      }
    df.filter(validWeight(weight))
      .withColumn("cum_weight", sum(weight).over(w))
      .filter(col("cum_weight") <= budget)
  }

  /** Malformed weights (NULL / NaN / negative) are EXCLUDED from the
    * running-total operators: a NaN in a cumulative sum poisons every
    * LATER row in the stratum (NaN fails `<=` → silent stratum
    * truncation in [[budgetFill]]; NaN → long cast throws in
    * [[packSequences]] under ANSI), and a negative weight refunds budget
    * that was never spent. Exclusion mirrors [[weightedSampleKey]]'s
    * never-sampled policy for the same inputs; zero-weight rows are
    * legitimate (an empty document is free to admit). */
  private def validWeight(weight: Column): Column =
    weight.isNotNull && !isnan(weight.cast("double")) && weight >= 0

  /** Approximate sequence PACKING — the final context-window prep step:
    * rows deal into 16 independent lanes by an md5 hex digit (packing
    * parallelizes; there is never a global sort, at any scale), order
    * within the lane by the same engine-stable hash, and each row joins
    * the bin its FIRST token lands in under a running-total cut every
    * `maxPerBin` tokens. Semantically: "concatenate in hash order, split
    * into maxPerBin-token windows, assign each doc to the window where
    * it starts" — a bin can run past maxPerBin by at most one row's
    * weight (the standard doc-straddling approximation; the split itself
    * is downstream chunking's job). Deterministic like [[budgetFill]]:
    * a pure function of (data, salt, maxPerBin). Output adds
    * `(bucket, cum_weight, bin)`. */
  def packSequences(df: DataFrame, keyCol: String, weight: Column,
      salt: String, maxPerBin: Long): DataFrame = {
    require(maxPerBin >= 1, s"maxPerBin must be >= 1, got $maxPerBin")
    val h = md5(concat(lit(salt), col(keyCol).cast("string")))
    df.filter(validWeight(weight)) // see validWeight: NaN poisons the lane
      .withColumn("__h", h)
      .withColumn("bucket", substring(col("__h"), 1, 1))
      .withColumn("cum_weight",
        sum(weight).over(Window.partitionBy(col("bucket")).orderBy(col("__h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin",
        floor((col("cum_weight") - weight) / lit(maxPerBin)).cast("long"))
      .drop("__h")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis): each
    * row draws a deterministic uniform from its salted md5 (13 hex
    * digits → 52 mantissa bits, exact in a double) and ranks by the
    * exponential key `u^(1/w)` — the classic distributed one-pass
    * weighted reservoir, here as a rank-per-stratum expression. Keys are
    * ROUNDED to 9 places with the row id as tiebreak so the selection
    * order is engine-stable (libm `pow` may wobble an ulp); heavier rows
    * win proportionally to weight, and the whole draw replays from
    * `(salt, id, weight)` alone. Spark plans the per-stratum top-k as a
    * window rank over the stratum partitioning — one shuffle, k rows per
    * stratum survive. */
  def weightedSampleKey(key: Column, weight: Column, salt: String): Column = {
    val u = (conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 13),
      16, 10).cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    // Efraimidis–Spirakis is defined for w > 0 only. A negative weight
    // would make u^(1/w) > 1 — winning EVERY draw — and w = 0 divides by
    // zero; both get a NULL key instead (sorts last under the DESC
    // selection order → never sampled, the only sensible reading of
    // "non-positive sampling weight"). nanvl closes the third gap in the
    // same class: Spark orders NaN ABOVE every double, so a NaN weight
    // passes `> 0` and its NaN key would rank FIRST in the DESC draw —
    // nanvl folds it to 0, which the positivity guard then rejects.
    val wd = nanvl(weight.cast("double"), lit(0.0))
    when(wd > 0.0, round(pow(u, lit(1.0) / wd), 9))
  }

  /** Top-`k` rows per stratum under [[weightedSampleKey]] order.
    *
    * Rows whose key is NULL (non-positive/NaN weight — see
    * [[weightedSampleKey]]) are filtered BEFORE the window: row_number
    * would otherwise still rank them (last, but kept by `<= k` when a
    * stratum has fewer than k valid rows), contradicting the
    * never-sampled policy for malformed weights. */
  def weightedSamplePerStratum(df: DataFrame, idCol: String, stratum: Column,
      weight: Column, salt: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(col("__wsk").desc, col(idCol))
    df.withColumn("__wsk", weightedSampleKey(col(idCol), weight, salt))
      .filter(col("__wsk").isNotNull)
      .withColumn("__wsr", row_number().over(w))
      .filter(col("__wsr") <= k)
      .drop("__wsr", "__wsk")
  }

  /** RENDER the packed bins of [[packSequences]] into actual training
    * sequences: within each `(bucket, bin)` the documents concatenate in
    * the same md5-hash order the packer assigned them, separated by
    * `sep` (the EOS marker). Output per bin: doc count, token total, and
    * the md5 of the rendered sequence — the verifiable artifact digest
    * (emitting the digest instead of megabytes of text keeps the gate
    * surface small; the `array_join` that produced it IS the sequence).
    *
    * Scale shape: one shuffle on `(bucket, bin)` — the same partitioning
    * the packer's window already used; each group holds ≤ maxPerBin
    * tokens of text by construction, so the per-group sort+join is
    * bounded by the context size, never by the corpus. */
  def renderPackedSequences(df: DataFrame, keyCol: String, textCol: String,
      weight: Column, salt: String, maxPerBin: Long, sep: String): DataFrame = {
    val packed = packSequences(df, keyCol, weight, salt, maxPerBin)
      .withColumn("__h", md5(concat(lit(salt), col(keyCol).cast("string"))))
    packed
      .groupBy(col("bucket"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(weight).cast("long").as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("__h"), col(textCol).as("t")))),
            e => e("t")),
          sep)).as("seq_md5"))
  }

  /** Deterministic shard id in `[0, nShards)`: the same engine-stable
    * md5 draw as [[splitLabel]], parsed from hex (Spark `conv`, DuckDB
    * `('0x'||h)::INT` — both yield the identical integer) and reduced
    * mod `nShards`. Shard membership is a pure function of (key, salt,
    * nShards) — re-running the export, on any cluster size, writes the
    * SAME documents into the same shard. */
  def shardId(key: Column, salt: String, nShards: Int): Column = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    (conv(hexPrefix(key, salt), 16, 10).cast("int") % nShards).as("shard_id")
  }

  /** Per-shard export manifest — the receipt a training-data delivery
    * ships beside its shards: document count, token total, and a
    * content signature (md5 over the numerically-sorted id list) that
    * any engine can recompute to verify the shard it received is the
    * shard that was written. One hash-partition shuffle on shard_id;
    * the id lists are shard-sized (corpus/nShards), never corpus-sized
    * on one node. */
  def shardManifest(docs: DataFrame, idCol: String, tokens: Column,
      salt: String, nShards: Int): DataFrame =
    docs
      .select(col(idCol), shardId(col(idCol), salt, nShards),
        tokens.as("__nt"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).cast("long").as("n_tokens"),
        md5(array_join(
          transform(sort_array(collect_list(col(idCol))), _.cast("string")),
          ",")).as("content_sig"))
}
