package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Attribute-filtered vector search (§2 #435/#436) — the
  * metadata-constrained top-k every production vector store exposes
  * (Qdrant/Weaviate payload filters, Filtered-DiskANN, Gollapudi et
  * al. 2023): "nearest neighbors WHERE label = X". The two classic
  * strategies differ at 100 TB exactly as the literature says:
  *
  *   - PRE-filter: the predicate is pushed INTO the inverted-list
  *     probe — candidates that fail the filter never get scored, and
  *     the index returns a full k as long as the probed cells hold k
  *     matching vectors. Candidate volume ≈ selectivity · nprobe/k
  *     of the corpus.
  *   - POST-filter: run the UNfiltered search, then filter its top-k.
  *     At selectivity s the expected surviving list is s·k — at the
  *     10-label corpus (s ≈ 0.1) an unfiltered top-10 keeps ~1 row,
  *     which is the well-known failure mode this pair of operators
  *     exists to price.
  *
  * Both ride the #72 IVF machinery verbatim (e4-quantized Lloyd
  * train + assignment, replayed as DuckDB CTEs); the filter column is
  * the embeddings table's own `label`.
  */
object FilteredAnn {

  private def labeledQueries(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        col("label").cast("long").as("q_label"))

  /** nprobe nearest cells per query, label carried through. */
  private def probeCells(
      spark: SparkSession, dir: String, cdf: DataFrame, nprobe: Int): DataFrame = {
    val wQ = Window.partitionBy("query_id").orderBy(col("ccos_e4").desc, col("cell"))
    labeledQueries(spark, dir)
      .crossJoin(broadcast(cdf))
      .select(
        col("query_id"),
        col("q_emb"),
        col("q_label"),
        col("cell"),
        Similarity.ccosE4("q_emb", "centroid").as("ccos_e4"))
      .withColumn("rn", row_number().over(wQ))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_label"), col("cell"))
  }

  /** The probe join: IVF candidates per query, optionally constrained
    * to the query's label INSIDE the probe (pre-filtering).
    */
  private def probe(
      spark: SparkSession,
      dir: String,
      cdf: DataFrame,
      nprobe: Int,
      preFilter: Boolean): DataFrame = {
    val corpusCells = Similarity
      .ivfAssign(spark, dir, cdf)
      .join(
        Tables.embeddings(spark, dir).select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val cands = corpusCells
      .join(broadcast(probeCells(spark, dir, cdf, nprobe)), "cell")
      .filter(col("vec_id") =!= col("query_id"))
    (if (preFilter) cands.filter(col("label") === col("q_label")) else cands)
      .select(
        col("query_id"),
        col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
  }

  /** #435 Label-filtered IVF search: top-10 same-label neighbors per
    * query, the predicate evaluated inside the probed inverted lists.
    */
  def filteredSearch(spark: SparkSession, dir: String,
      k: Int = 16, iters: Int = 3, nprobe: Int = 2): DataFrame = {
    GraftFunctions.register(spark)
    val cdf = Similarity.centroidsDf(spark, Similarity.trainCentroids(spark, dir, k, iters))
    probe(spark, dir, cdf, nprobe, preFilter = true)
  }

  /** Exact filtered truth: brute-force top-10 among same-label
    * corpus vectors — what both strategies are scored against.
    */
  private def filteredTruth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    Tables
      .fanOut(Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"), col("label").cast("long").as("label")))
      .crossJoin(broadcast(labeledQueries(spark, dir)))
      .filter(col("vec_id") =!= col("query_id") && col("label") === col("q_label"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
  }

  /** #436 Filter-strategy scorecard (§15.4): recall@10 of pre- vs
    * post-filtering against the exact filtered truth, one row per
    * strategy. The quantizer trains ONCE and both probes share it.
    * The expected read (and the measured one): pre-filter sits at the
    * index's intrinsic recall; post-filter collapses to ≈ selectivity
    * — the unfiltered top-10 only keeps ~1 same-label row at 10
    * labels, so even a perfect index can't exceed ~0.1.
    */
  def filteredEval(spark: SparkSession, dir: String,
      k: Int = 16, iters: Int = 3, nprobe: Int = 2): DataFrame = {
    GraftFunctions.register(spark)
    val cdf = Similarity.centroidsDf(spark, Similarity.trainCentroids(spark, dir, k, iters))
    val truth = filteredTruth(spark, dir)
      .select(col("query_id"), col("vec_id"))
      .localCheckpoint(eager = false)
    val pre = probe(spark, dir, cdf, nprobe, preFilter = true)
      .select(col("query_id"), col("vec_id"))
    val labels = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val post = probe(spark, dir, cdf, nprobe, preFilter = false)
      .join(labels, "vec_id")
      .join(
        broadcast(labeledQueries(spark, dir).select(col("query_id"), col("q_label"))),
        "query_id")
      .filter(col("label") === col("q_label"))
      .select(col("query_id"), col("vec_id"))
    def score(name: String, got: DataFrame): DataFrame = {
      val nTruth = truth.count()
      val nGot = got.count()
      val hits = got.intersect(truth).count()
      import spark.implicits._
      Seq((name, nTruth, nGot, hits, hits * 1000000L / nTruth))
        .toDF("strategy", "n_truth", "n_returned", "n_hits", "recall_e6")
    }
    score("prefilter", pre).unionAll(score("postfilter", post))
  }
}
