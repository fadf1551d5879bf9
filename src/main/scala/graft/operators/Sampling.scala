package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sampling for training-data pipelines: deterministic hash-based
  * splits (reproducible across engines and runs — a content-addressed
  * split survives re-partitioning, re-ingestion, and backfills, unlike
  * random() tagging), stratified downsampling, and exact-k hash
  * samples. All per-row decisions — zero shuffles except the exact-k
  * top-n (WindowGroupLimit-style TakeOrdered).
  */
object Sampling {

  /** #54 Train/val/test split by content hash: bucket = first 4 hex
    * chars of md5 → 0..99; <80 train, <90 val, else test. Stable under
    * any re-ordering or re-partitioning of the corpus.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        (conv(substring(md5(col("text").cast("binary")), 1, 4), 16, 10).cast("long") % 100)
          .as("bucket"))
      .select(
        col("doc_id"),
        col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test")
          .as("split"))

  /** #55 Stratified sample: per-language fractions via DETERMINISTIC
    * hash-threshold Bernoulli — keep a row iff its salted content hash
    * mod 10000 falls under the stratum's threshold (en: 2500 = 25%,
    * tail languages kept whole). Replaces seeded `sampleBy`: an
    * engine-RNG sample changes under repartitioning and can't be
    * oracle-checked; a content-addressed sample is reproducible across
    * engines, runs, AND backfills (same properties as [[splitAssign]])
    * and is exactly replayed by the DuckDB oracle.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    // per-stratum keep-thresholds out of 10000
    val thresholds = Seq("en" -> 2500, "de" -> 10000, "fr" -> 10000, "es" -> 10000, "zh" -> 10000)
    val bucket =
      conv(substring(md5(concat(lit("graft-strat-1"), col("text")).cast("binary")), 1, 15), 16, 10)
        .cast("long") % 10000
    val threshold = thresholds
      .foldLeft(lit(0)) { case (acc, (lang, t)) => when(col("lang") === lang, lit(t)).otherwise(acc) }
    Tables
      .documents(spark, dir)
      .filter(bucket < threshold)
      .select(col("doc_id"), col("lang"))
  }

  /** #70 Sequence packing: concatenate-and-chunk assignment of docs
    * into fixed `ctxLen`-token training windows — the standard LLM
    * pretraining packing (concat the shard, slice every ctxLen
    * tokens). One windowed cumulative sum PER SHARD (`lang` here;
    * a file/partition id in production): each shard packs
    * independently, so no global total order is ever required — the
    * 100 TB-safe formulation of an inherently sequential assignment.
    * Emits each doc's token offset and first/last window ids plus a
    * boundary-crossing flag (the docs a loader must split).
    */
  def packSequences(spark: SparkSession, dir: String, ctxLen: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val seqOf = (off: Column) => floor(off.cast("double") / ctxLen).cast("long")
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        size(Dedup.toks(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .select(
        col("doc_id"),
        col("lang"),
        col("n_tokens"),
        col("start_off"),
        seqOf(col("start_off")).as("seq_first"),
        seqOf(col("start_off") + col("n_tokens") - 1).as("seq_last"))
      .withColumn("crosses_boundary", (col("seq_first") =!= col("seq_last")).cast("int"))
  }

  /** #56 Exact-k uniform sample by hash order: the k docs with the
    * smallest salted content hash — deterministic, engine-agnostic
    * (md5 hex strings sort identically everywhere), and unbiased for
    * any salt. Compiles to TakeOrderedAndProject (per-partition top-k,
    * no full sort).
    */
  def hashSample(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        md5(concat(lit("graft-sample-1"), col("text")).cast("binary")).as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(k)
}
