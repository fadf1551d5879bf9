package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table (`array<float>[64]`).
  *
  * Scale design: the query side (k vectors) is always the broadcast
  * side — the corpus is scanned exactly once and never shuffled for
  * the join. Top-k uses `row_number` + rank filter, which Spark ≥3.5
  * rewrites to WindowGroupLimit: each input partition keeps only its
  * local top-k BEFORE the exchange, so the shuffle carries O(k ×
  * partitions) rows, not the scored corpus. The LSH path cuts scored
  * candidates ~bucket-fold before any scoring.
  */
object Similarity {

  private val NumPlanes = 6 // 2^6 = 64 buckets

  /** Deterministic random hyperplanes (seed 42), 64-dim gaussians. */
  private val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Seq.fill(64)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: bit p = sign(vec · plane_p).
    * Cosine-similar vectors land in the same bucket with high
    * probability (SRP-LSH, Charikar '02).
    */
  def hyperplaneBucket(vec: Column): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        val dot = aggregate(
          zip_with(vec, typedlit(p), (x, y) => x * y),
          lit(0.0),
          (acc, v) => acc + v)
        when(dot > 0, lit(1 << i)).otherwise(lit(0))
      }
      .reduce(_ + _)

  private def queryVectors(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  /** #27 Brute-force cosine top-k: broadcast the k queries over one
    * corpus scan, score with the native `cosine_sim` kernel, keep the
    * top 10 per query (WindowGroupLimit keeps the exchange tiny).
    */
  def bruteForce(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queryVectors(spark, dir)))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
  }

  /** #28 LSH-bucketed ANN: queries probe only their hyperplane bucket;
    * candidates are scored and ranked per query. ~bucket-fold fewer
    * `cosine_sim` evaluations than brute force — the 100 TB path.
    */
  def lsh(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val corpus = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", hyperplaneBucket(col("embedding")))
    val queries = queryVectors(spark, dir)
      .withColumn("bucket", hyperplaneBucket(col("q_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(broadcast(queries), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
  }

  /** #60 Multi-probe LSH ANN: each query probes its own bucket plus
    * the 6 buckets at Hamming distance 1 (one hyperplane flip) —
    * ~7× candidates for ~7× recall of near-boundary neighbors, still
    * a bucket-bounded equi-join (the standard recall/cost knob;
    * Lv et al., VLDB '07).
    */
  def lshMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val corpus = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", hyperplaneBucket(col("embedding")))
    val probes = (0 until NumPlanes).map(p => col("q_bucket").bitwiseXOR(lit(1 << p)))
    val queries = queryVectors(spark, dir)
      .withColumn("q_bucket", hyperplaneBucket(col("q_emb")))
      .withColumn("bucket", explode(array(col("q_bucket") +: probes: _*)))
      .drop("q_bucket")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(broadcast(queries), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
  }

  /** #52 L2-normalize + int8 quantization: the memory path for ANN at
    * 100 TB (4× smaller vectors, SIMD-friendly int dot products).
    * Emits the per-vector scale so scores are recoverable; spec checks
    * cosine is preserved to ~1e-2 after dequantization.
    */
  def quantize(spark: SparkSession, dir: String): DataFrame = {
    // norm aliased once — inlining it in the transform lambda would
    // recompute the 64-element aggregate per element (the recompute
    // trap; see minhash_sig / bigrams)
    val norm = sqrt(aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v))
    Tables
      .embeddings(spark, dir)
      .withColumn("l2_norm_raw", norm)
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        round(col("l2_norm_raw"), 6).as("l2_norm"),
        // zero-vector guard: without it an all-zero embedding quantizes to
        // NaN per element (nulls after the int cast, or a runtime error in
        // ANSI mode). 0 matches cosine_sim's zero-vector convention.
        expr("transform(embedding, x -> CAST(round(" +
          "CASE WHEN l2_norm_raw = 0D THEN 0D ELSE x / l2_norm_raw * 127 END) AS INT))")
          .as("qvec"))
  }

  /** Driver-comparable projection of [[quantize]]: one
    * (vec_id, pos, q) row per quantized element — the shape the
    * hash-compare harness can diff against a DuckDB oracle.
    */
  def quantizeFlat(spark: SparkSession, dir: String): DataFrame =
    quantize(spark, dir)
      .select(
        col("vec_id"),
        col("label"),
        col("l2_norm"),
        posexplode(col("qvec")).as(Seq("pos", "q")))
      .select(col("vec_id"), col("label"), col("l2_norm"), col("pos").cast("long").as("pos"), col("q"))

  /** #29 IVF-style centroid stats: per-label centroid (partial-agg
    * per-dimension means via posexplode), then nearest-centroid
    * assignment of every vector — the coarse quantizer of an IVF
    * index, and a confusion report of label vs. assigned cell.
    */
  def centroidAssign(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, dir)
    val centroids = vecs
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(avg("x").as("mu"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("entries"))
      .select(
        col("label").as("c_label"),
        expr("transform(entries, e -> CAST(e.mu AS FLOAT))").as("centroid"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("c_label"))
    vecs
      .select(col("vec_id"), col("label"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .select(
        col("vec_id"),
        col("label"),
        col("c_label"),
        round(expr("cosine_sim(embedding, centroid)"), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        col("c_label").cast("long").as("assigned_label"),
        col("cos"))
  }
}
