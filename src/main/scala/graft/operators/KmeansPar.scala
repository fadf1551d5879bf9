package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** k-means|| scalable seeding (§2 #437/#438) — Bahmani, Moseley,
  * Vattani, Kumar & Vassilvitskii 2012, hash-determinized. The
  * distributed answer to k-means++'s inherently SEQUENTIAL seeding
  * (k dependent passes): oversample ℓ candidates per round with
  * probability ∝ d²(x, C) for a handful of rounds, weight the
  * candidate set by how much corpus each candidate represents, and
  * reduce to k on the driver — the candidate set, not the corpus, is
  * what the final reduction ever touches. This is THE seeding a
  * 100 TB Lloyd fit runs (Spark MLlib's own KMeans default); #72's
  * first-k-vec_ids seeding is the baseline it replaces, and #438
  * prices the difference in k-means cost.
  *
  * Integer discipline: corpus on the e4 floor grid (the #426 grid),
  * d² exact BIGINT sums via codegen'd zip_with/aggregate, φ = Σd² a
  * 1-row broadcast, inclusion via the #86 hash draw (hash60 mod 10¹²
  * < ℓ·d²·10¹² div φ, DECIMAL(38,0) headroom), and the driver-side
  * k-means++-flavored reduction is a deterministic GREEDY argmax of
  * weight·d²(c, chosen) — every step replays as DuckDB CTEs
  * bit-identically (the #255 FPS unrolled-greedy precedent). Model
  * state on the driver is the candidate set only: ~1 + rounds·ℓ
  * rows of (id, 64 ints, weight) — corpus-independent.
  */
object KmeansPar {

  private[graft] val Rounds = 3
  private[graft] val Oversample = 32L
  private[graft] val FinalK = 8

  /** e4-grid quantized corpus: (vec_id, q BIGINT[64]). */
  private def qCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))")
          .as("q"))

  private def d2Expr: String =
    "aggregate(zip_with(q, sq, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"

  /** min d²(x, seeds) per corpus point: one broadcast join + a min
    * aggregate; `seeds` is (seed_id, sq).
    */
  private def minD2(corpus: DataFrame, seeds: DataFrame): DataFrame =
    corpus
      .crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("q"), expr(d2Expr).as("d2"))
      .groupBy("vec_id")
      .agg(first("q").as("q"), min("d2").as("d2"))

  /** The oversampling rounds: returns the full candidate set
    * (vec_id, q) with the deterministic first seed (min vec_id).
    */
  private def oversample(
      spark: SparkSession, corpus: DataFrame): Seq[(Long, Seq[Long])] = {
    import spark.implicits._
    val first = corpus.orderBy("vec_id").limit(1).collect().head
    var cands = Vector((first.getLong(0), first.getSeq[Long](1)))
    for (r <- 1 to Rounds) {
      val seeds = cands.toDF("seed_id", "sq")
      val md = minD2(corpus, broadcast(seeds)).localCheckpoint(eager = false)
      val drawn = md
        .crossJoin(broadcast(md.agg(sum("d2").as("phi"))))
        .filter(
          pmod(Dedup.hash60(concat(lit(s"kmpar:$r:"), col("vec_id"))), lit(1000000000000L)) <
            expr(s"""least(CAST(1000000000000 AS DECIMAL(38,0)),
                     CAST($Oversample AS DECIMAL(38,0)) * d2 * 1000000000000 div phi)"""))
        .select(col("vec_id"), col("q"))
        .collect()
        .map(row => (row.getLong(0), row.getSeq[Long](1)))
      cands = (cands ++ drawn).distinctBy(_._1).sortBy(_._1)
    }
    cands
  }

  /** Candidate weights: corpus points assigned to their nearest
    * candidate (tie → smaller candidate id), counted per candidate.
    */
  private def weighted(
      spark: SparkSession,
      corpus: DataFrame,
      cands: Seq[(Long, Seq[Long])]): Seq[(Long, Seq[Long], Long)] = {
    import spark.implicits._
    val cdf = cands.toDF("cand_id", "sq")
    val wN = Window.partitionBy("vec_id").orderBy(col("d2"), col("cand_id"))
    val weights = corpus
      .crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("cand_id"), expr(d2Expr).as("d2"))
      .withColumn("rn", row_number().over(wN))
      .filter(col("rn") === 1)
      .groupBy("cand_id")
      .agg(count(lit(1)).as("w"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    cands.map { case (id, q) => (id, q, weights.getOrElse(id, 0L)) }
  }

  private def d2BigInt(a: Seq[Long], b: Seq[Long]): BigInt =
    a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum

  /** Deterministic weighted-greedy reduction to [[FinalK]]: first pick
    * = max weight; each further pick maximizes weight·min-d²-to-chosen
    * (ties → smaller vec_id) — the MAP stand-in for k-means++'s
    * weighted draw over the candidate set, fully replayable.
    */
  private def reduce(cands: Seq[(Long, Seq[Long], Long)]): Seq[(Long, Seq[Long], Long)] = {
    var chosen = Vector(cands.maxBy { case (id, _, w) => (w, -id) })
    while (chosen.size < FinalK) {
      val rest = cands.filterNot(c => chosen.exists(_._1 == c._1))
      val next = rest
        .map(c => (c, BigInt(c._3) * chosen.map(s => d2BigInt(c._2, s._2)).min))
        .maxBy { case (c, score) => (score, -c._1) }
      chosen :+= next._1
    }
    chosen
  }

  /** #437 k-means|| seeding: the selected k seeds with their
    * representation weights — (sel_rank, vec_id, weight,
    * n_candidates).
    */
  def seeds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    // fanOut BEFORE the checkpoint (r13 opt round): the checkpointed
    // blocks keep their build partitioning — a 1-partition block set
    // would single-thread every minD2/weighting pass below
    val corpus = Tables.fanOut(qCorpus(spark, dir)).localCheckpoint(eager = false)
    val cands = weighted(spark, corpus, oversample(spark, corpus))
    val sel = reduce(cands)
    sel.zipWithIndex
      .map { case ((id, _, w), i) => (i + 1L, id, w, cands.size.toLong) }
      .toDF("sel_rank", "vec_id", "weight", "n_candidates")
  }

  /** k-means cost (Σ min-d² on the e4 grid) of a seed id-set. */
  private def cost(corpus: DataFrame, seedsDf: DataFrame): Long =
    minD2(corpus, broadcast(seedsDf))
      .agg(sum("d2"))
      .collect()
      .head
      .getLong(0)

  /** #438 Seeding-quality scorecard (§15.4): k-means cost of the
    * k-means|| seeds vs two baselines at the same k — a deterministic
    * hash-uniform draw (`kmunif:` salt) and #72's first-k-vec_ids —
    * each as (seeding, n_seeds, cost, ratio_vs_uniform_e6). The claim
    * the scorecard prices: oversampled, spread-reduced seeds start
    * Lloyd's at materially lower cost than uniform or first-k picks.
    */
  def seedingEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    // fanOut before the checkpoint — same as [[seeds]]
    val corpus = Tables.fanOut(qCorpus(spark, dir)).localCheckpoint(eager = false)
    val sel = reduce(weighted(spark, corpus, oversample(spark, corpus)))
    val kmparSeeds = sel.map { case (id, q, _) => (id, q) }.toDF("seed_id", "sq")
    val uniformSeeds = corpus
      .orderBy(
        pmod(Dedup.hash60(concat(lit("kmunif:"), col("vec_id"))), lit(1000000000000L)),
        col("vec_id"))
      .limit(FinalK)
      .select(col("vec_id").as("seed_id"), col("q").as("sq"))
    val firstKSeeds = corpus
      .orderBy("vec_id")
      .limit(FinalK)
      .select(col("vec_id").as("seed_id"), col("q").as("sq"))
    val cU = cost(corpus, uniformSeeds)
    val rows = Seq(
      ("kmeans_par", FinalK.toLong, cost(corpus, kmparSeeds)),
      ("uniform", FinalK.toLong, cU),
      ("first_k", FinalK.toLong, cost(corpus, firstKSeeds)))
    rows
      .map { case (n, k, c) => (n, k, c, (BigInt(c) * 1000000 / cU).toLong) }
      .toDF("seeding", "n_seeds", "cost", "ratio_vs_uniform_e6")
  }
}
