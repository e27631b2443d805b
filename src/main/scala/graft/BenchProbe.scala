package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{ChangeAction, ChangelogCompactor}
import graft.sources.Tables

/** Stage-attribution probe for the compact-at-fact-volume ladder query
  * (not part of the driver contract; run by hand while tuning):
  * times the action synthesis, the cluster shuffle+sort, and the typed
  * fold separately so a regression can be pinned to a stage. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def synth: DataFrame = {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_extendedprice"))
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_extendedprice"),
          row_number().over(w).as("rn"))
        .select(
          lit("li").as("table"),
          col("rn").cast("long").as("lsn"),
          lit(0).as("seq"),
          when(col("rn") === 1, "I").otherwise("U").as("op"),
          map(lit("id"), col("l_orderkey").cast("string")).as("keyBefore"),
          map(lit("id"), col("l_orderkey").cast("string"),
            lit("price"), col("l_extendedprice").cast("string")).as("values"),
          array().cast("array<string>").as("nulls"),
          array().cast("array<string>").as("unchanged"),
          lit(false).as("rekey"))
    }

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    timed("synth only")(synth.write.format("noop").mode("overwrite").save())
    timed("synth + shuffle/sort") {
      // mirrors clusterByKey's production key (CompactKeys.keyStrCol) so
      // the stage attribution tracks the pipeline actually shipped
      synth
        .withColumn("__key", graft.cdc.CompactKeys.keyStrCol(col("keyBefore")))
        .repartition(col("table"), col("__key"))
        .sortWithinPartitions(col("table"), col("__key"), col("lsn"), col("seq"))
        .drop("__key")
        .write.format("noop").mode("overwrite").save()
    }
    timed("synth + typed decode only (count)") {
      synth.as[ChangeAction].mapPartitions(it => Iterator.single(it.size)).collect()
    }
    timed("synth + typed decode + re-encode (identity mapPartitions)") {
      synth.as[ChangeAction].mapPartitions(identity)
        .toDF().write.format("noop").mode("overwrite").save()
    }
    timed("localCheckpoint alone") {
      val ckpt = synth.as[ChangeAction].localCheckpoint(true)
      ckpt.unpersist()
    }
    timed("compact with hasRekeys=Some(false) (pure fold, no checkpoint)") {
      ChangelogCompactor.compact(synth.as[ChangeAction], hasRekeys = Some(false))
        .toDF().write.format("noop").mode("overwrite").save()
    }
    timed("synth + shuffle/sort + typed fold (full compact)") {
      ChangelogCompactor.compact(synth.as[ChangeAction])
        .toDF().write.format("noop").mode("overwrite").save()
    }

    // ---- minhash pipeline stages (dedup_minhash ladder attribution) ----
    import graft.operators.Dedup
    val docs = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      d.unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" spark engine dedup suffix tail")).as("text")))
    }
    def sigs = Dedup.minhashSignature(docs, "doc_id", "text", 5, 64)
    for (round <- Seq("cold", "warm")) {
      timed(s"minhash sigs only ($round)")(
        sigs.write.format("noop").mode("overwrite").save())
      timed(s"minhash candidates ($round)") {
        val n = Dedup.minhashCandidates(sigs, "doc_id", 8, 8).count()
        println(s"[probe]   candidates: $n")
      }
      timed(s"minhash full pairs ($round)")(
        Dedup.minhashPairs(docs, "doc_id", "text", 5, 64, 8, 0.7)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
