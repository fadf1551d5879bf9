package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Encoder row types for the mapPartitions decode stage (top-level so
  * the generated deserializer can access them).
  */
case class MmPayload(doc_id: Long, modality: String, payload: Array[Byte])
case class MmFeatures(doc_id: Long, modality: String, n_bytes: Long, features: Array[Float])

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * with typed metadata. The container has no codec libraries, so the
  * decode step is a clearly-marked deterministic stub — but the
  * Spark-side plumbing (schema, binary columns, partition-preserving
  * mapPartitions, batch shape) is real and what a production pipeline
  * would keep when swapping in a real decoder.
  */
object Multimodal {

  /** #33 Binary payload manifest: each document's bytes as an opaque
    * payload with modality + size + content hash — the catalog row a
    * 100 TB multimodal lake partitions by modality. Pure column
    * expressions; payload bytes never leave the executor.
    */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")
          .as("modality"),
        octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
        md5(col("text").cast("binary")).as("content_md5")
      )

  /** #34 Decode / feature-extract plumbing: partition-preserving
    * `mapPartitions` over batches of payloads → fixed-width feature
    * vectors. The decode itself is a STUB (deterministic byte
    * statistics standing in for pixel/sample decoding — the real
    * decoder would replace `stubDecode` only); batching (64/batch)
    * mirrors how a vectorized decoder amortizes setup per batch.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = manifest(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("modality"), col("text").cast("binary").as("payload"))
      .as[MmPayload]
    payloads
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          // batch-shaped: a real decoder initializes once per batch here
          batch.iterator.map { p =>
            MmFeatures(p.doc_id, p.modality, p.payload.length.toLong, stubDecode(p.payload))
          }
        }
      }
      .toDF()
  }

  /** Driver-comparable projection of [[features]]: one (doc_id, pos, f)
    * row per vector element. Arrays stay in the operator (and its
    * specs); the flat shape is what the hash-compare harness can diff
    * against a DuckDB oracle, and is also the layout a columnar store
    * would shred the vector into anyway.
    */
  def featuresFlat(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select(
        col("doc_id"),
        col("modality"),
        col("n_bytes"),
        posexplode(col("features")).as(Seq("pos", "f_raw")))
      .select(
        col("doc_id"),
        col("modality"),
        col("n_bytes"),
        col("pos").cast("long").as("pos"),
        round(col("f_raw").cast("double"), 4).as("f"))

  /** #53 Per-modality feature statistics: distributed array
    * aggregation (posexplode → per-dimension mean → re-assembled
    * vector) over the decoded features — the monitoring/QA stage of a
    * multimodal pipeline. One exchange on (modality, dim).
    */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select(col("modality"), posexplode(col("features")).as(Seq("pos", "x")))
      .groupBy("modality", "pos")
      .agg(avg("x").as("mu"), count(lit(1)).as("n"))
      .groupBy("modality")
      .agg(
        (max("n")).as("n_docs"),
        array_sort(collect_list(struct(col("pos"), col("mu")))).as("entries"))
      .select(
        col("modality"),
        col("n_docs"),
        expr("transform(entries, e -> round(e.mu, 4))").as("mean_features"))

  /** Driver-comparable projection of [[featureStats]]: one
    * (modality, pos, mu) row per mean-vector element.
    */
  def featureStatsFlat(spark: SparkSession, dir: String): DataFrame =
    featureStats(spark, dir)
      .select(
        col("modality"),
        col("n_docs"),
        posexplode(col("mean_features")).as(Seq("pos", "mu")))
      .select(col("modality"), col("n_docs"), col("pos").cast("long").as("pos"), col("mu"))

  /** #85 Video frame-sample scheduling: for every video payload, emit
    * the frame indices a decoder should extract — one frame every
    * `everySec` seconds of content, from per-video metadata (synthetic
    * here: 4 bytes/frame, fps 25 or 30 by doc parity). This is the
    * scheduling half of video ingestion (the decode half is the
    * [[features]] stub): pure sequence/explode column expressions, so
    * the fan-out is linear in sampled frames and fully codegen'd —
    * the shape that lets a 100 TB video lake plan decode work without
    * touching a single payload byte.
    */
  def frameSample(spark: SparkSession, dir: String, everySec: Int = 2): DataFrame =
    manifest(spark, dir)
      .filter(col("modality") === "video")
      .select(
        col("doc_id"),
        (col("byte_len") / 4).cast("long").as("n_frames"),
        (lit(25) + (col("doc_id") % 2) * 5).cast("long").as("fps"))
      // degenerate payloads (< 1 frame): Spark's sequence(0, -1, step)
      // THROWS where the oracle's range() returns no rows — filter
      // before the explode so both engines emit nothing for them
      .filter(col("n_frames") > 0)
      .select(
        col("doc_id"),
        col("n_frames"),
        col("fps"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("fps") * everySec))
          .as("frame_idx"))
      .withColumn("ts_sec", round(col("frame_idx").cast("double") / col("fps"), 2))

  /** STUB decode: 8 deterministic byte-histogram moments in [0,1) —
    * stands in for image resize / audio frame-sample feature
    * extraction (codec libs absent in this environment).
    */
  private def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(a => ((a % 1000L).toFloat / 1000.0f))
  }
}
