package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Residual vector quantization (§2 #445/#446) — Juang & Gray 1982's
  * multi-stage VQ, the lineage under additive quantization (Babenko &
  * Lempitsky 2014) and every neural-codec token stack: quantize the
  * FULL vector with a small codebook, then quantize the RESIDUAL with
  * a second codebook, so precision compounds multiplicatively
  * (K² effective cells from 2K codewords) while each stage stays a
  * tiny broadcast model. The third member of the quantization family:
  * #120 PQ splits DIMENSIONS, #349 OPQ rotates before splitting, RVQ
  * stacks STAGES on the whole vector — at 100 TB each stage is one
  * broadcast join over one corpus scan, and the codebook cascade
  * (2·K·d longs) is driver model state only.
  *
  * Reuses the #120 Lloyd machinery verbatim ([[Similarity.trainPqOnSubs]]
  * with a single full-width "subspace"): e4-grid integer vectors,
  * exact BIGINT squared-L2, ⌊avg+0.5⌋ codeword means — the whole
  * two-stage cascade replays as DuckDB CTEs bit-identically.
  */
object Rvq {

  private[graft] val K = 16
  private[graft] val Iters = 2

  private def eqDf(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), Similarity.quantE4(col("embedding")).as("eq"))

  /** The (vec_id, s = 0, sv) single-subspace frame trainPqOnSubs
    * expects, over any integer-vector column.
    */
  private def toSubs(df: DataFrame, vcol: String): DataFrame =
    df.select(col("vec_id"), lit(0).as("s"), col(vcol).as("sv"))

  private def seedsOf(subs: DataFrame): Seq[(Int, Int, Seq[Long])] =
    subs
      .orderBy("vec_id")
      .limit(K)
      .collect()
      .zipWithIndex
      .map { case (r, c) => (0, c, r.getSeq[Long](2)) }
      .toSeq

  /** Frozen-codebook assignment: (vec_id, code, dist, res) with the
    * residual sv − cw carried for the next stage.
    */
  private def assign(spark: SparkSession, subs: DataFrame,
      cb: Seq[(Int, Int, Seq[Long])]): DataFrame = {
    val wMin = Window.partitionBy("vec_id", "s").orderBy(col("dist"), col("code"))
    subs
      .join(broadcast(Similarity.pqCodebookDf(spark, cb)), "s")
      .withColumn("dist", Similarity.pqDist)
      .withColumn("rn", row_number().over(wMin))
      .filter(col("rn") === 1)
      .select(
        col("vec_id"),
        col("code"),
        col("dist"),
        expr("zip_with(sv, cw, (x, y) -> x - y)").as("res"))
  }

  /** #445 RVQ code assignment: per vector, the stage-1 and stage-2
    * codes plus the distortion after each stage — the persisted
    * compressed index (8 bits/vector at K = 16²).
    */
  def rvqCodes(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // fanOut (r13 opt round): the assignment/train kernels otherwise
    // run at the single-row-group scan's task count
    val subs1 = toSubs(Tables.fanOut(eqDf(spark, dir)), "eq")
    val cb1 = Similarity.trainPqOnSubs(spark, subs1, seedsOf(subs1), Iters)
    // one frame carries the stage-1 outcome AND feeds stage 2; the
    // lazy cut keeps the three consumers (seed collect, train rounds,
    // final assign) from re-running stage 1
    val subs2 = assign(spark, subs1, cb1)
      .select(
        col("vec_id"),
        lit(0).as("s"),
        col("res").as("sv"),
        col("code").as("code1"),
        col("dist").as("dist1"))
      .localCheckpoint(eager = false)
    val stage2In = subs2.select(col("vec_id"), col("s"), col("sv"))
    val cb2 = Similarity.trainPqOnSubs(spark, stage2In, seedsOf(subs2), Iters)
    val a2 = assign(spark, stage2In, cb2)
    subs2
      .select(col("vec_id"), col("code1"), col("dist1"))
      .join(a2.select(col("vec_id"), col("code").as("code2"), col("dist").as("dist2")), "vec_id")
      .select(
        col("vec_id"),
        col("code1").cast("long").as("code1"),
        col("code2").cast("long").as("code2"),
        col("dist1").as("dist1_e8"),
        col("dist2").as("dist2_e8"))
  }

  /** #446 Quantizer-family distortion scorecard (§15.4): mean/max
    * distortion and codes-used for RVQ stage 1, the full RVQ cascade,
    * and #120's PQ on the same corpus, each with its bit budget —
    * the read that prices stacking STAGES (RVQ, 8 bits) against
    * splitting DIMENSIONS (PQ M=4×K=16, 16 bits). The pinned claims:
    * the cascade strictly improves on its own stage 1, and PQ at 2×
    * the bits beats both (the budget, not the family, buys accuracy).
    */
  def rvqEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val codes = rvqCodes(spark, dir).localCheckpoint(eager = false)
    val s1 = codes
      .agg(
        count(lit(1)).as("n"),
        sum("dist1_e8").as("sd"),
        max("dist1_e8").as("mx"),
        count_distinct(col("code1")).as("cu"))
      .select(
        lit("rvq_stage1").as("quantizer"),
        lit(4L).as("bits_per_vec"),
        expr("CAST(sd div n AS BIGINT)").as("mean_dist_e8"),
        col("mx").as("max_dist_e8"),
        col("cu").as("n_codes_used"))
    val s2 = codes
      .agg(
        count(lit(1)).as("n"),
        sum("dist2_e8").as("sd"),
        max("dist2_e8").as("mx"),
        count_distinct(concat(col("code1"), lit(":"), col("code2"))).as("cu"))
      .select(
        lit("rvq_cascade").as("quantizer"),
        lit(8L).as("bits_per_vec"),
        expr("CAST(sd div n AS BIGINT)").as("mean_dist_e8"),
        col("mx").as("max_dist_e8"),
        col("cu").as("n_codes_used"))
    val pqc = Similarity.pqCodes(spark, dir).localCheckpoint(eager = false)
    val pq = pqc
      .groupBy("vec_id")
      .agg(sum("dist_e8").as("d"))
      .agg(count(lit(1)).as("n"), sum("d").as("sd"), max("d").as("mx"))
      .crossJoin(broadcast(
        pqc
          .select(concat(col("s"), lit(":"), col("code")).as("sc"))
          .agg(count_distinct(col("sc")).as("cu"))))
      .select(
        lit("pq_m4_k16").as("quantizer"),
        lit(16L).as("bits_per_vec"),
        expr("CAST(sd div n AS BIGINT)").as("mean_dist_e8"),
        col("mx").as("max_dist_e8"),
        col("cu").as("n_codes_used"))
    s1.unionAll(s2).unionAll(pq)
  }
}
