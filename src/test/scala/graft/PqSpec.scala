package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product-quantization contract: the codes table is a complete M-way
  * code assignment (the 64×-compressed index), and the two-stage ADC
  * search (code-only coarse stage, exact integer-L2 re-rank of the
  * shortlist) recovers most true nearest neighbors.
  */
class PqSpec extends SparkSpec {

  private val quant =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT))"

  test("pq codes: exactly M codes per vector, in-range, nonnegative residual") {
    val c = Similarity.pqCodes(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(c.count() == n * Similarity.PqM)
    assert(c.groupBy("vec_id").count().filter(col("count") =!= Similarity.PqM).count() == 0)
    assert(c.filter(col("code") < 0 || col("code") >= Similarity.PqK).count() == 0)
    assert(c.filter(col("dist_e8") < 0).count() == 0)
    // every subspace uses more than one codeword (training didn't collapse)
    val used = c.groupBy("s").agg(countDistinct("code").as("k"))
    assert(used.filter(col("k") < 2).count() == 0, "a subspace collapsed to one codeword")
  }

  test("pq search: ADC shortlist + exact re-rank recovers most exact-L2 neighbors") {
    val s = Similarity.pqSearch(spark, sf).cache()
    assert(s.groupBy("query_id").count().filter(col("count") =!= 10).count() == 0)
    // exact integer-L2 truth on the same e4 quantized grid
    val eq = Tables.embeddings(spark, sf).select(col("vec_id"), expr(quant).as("eq"))
    val q = eq.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("eq").as("q_eq"))
    val w = Window.partitionBy("query_id").orderBy(col("d"), col("vec_id"))
    val truth = eq
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        expr("aggregate(zip_with(eq, q_eq, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, t) -> acc + t)")
          .as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("query_id", "vec_id")
    val hit = s.select("query_id", "vec_id").intersect(truth).count().toDouble
    val recall = hit / truth.count()
    assert(recall >= 0.7, s"recall@10 $recall below 0.7")
    // the exact re-rank really ranks by the exact distance: within each
    // query, dist_e8 is non-decreasing in rank
    val mono = s
      .withColumn("prev", lag("dist_e8", 1).over(
        Window.partitionBy("query_id").orderBy("rank")))
      .filter(col("prev").isNotNull && col("prev") > col("dist_e8"))
    assert(mono.count() == 0)

    // OPQ: the signed-permutation rotation is orthogonal, so the same
    // brute-force truth applies (L2 is rotation-invariant up to the
    // e4 grid); rotated codes must not LOSE recall vs plain PQ
    val o = Similarity.opqSearch(spark, sf).cache()
    assert(o.groupBy("query_id").count().filter(col("count") =!= 10).count() == 0)
    val oHit = o.select("query_id", "vec_id").intersect(truth).count().toDouble
    val oRecall = oHit / truth.count()
    assert(oRecall >= recall, s"OPQ recall@10 $oRecall below plain PQ $recall")
  }

  test("ivfadc: residual PQ in probed cells recovers most exact-L2 neighbors") {
    val s = Similarity.ivfAdcSearch(spark, sf).cache()
    assert(s.groupBy("query_id").count().filter(col("count") =!= 10).count() == 0)
    val eq = Tables.embeddings(spark, sf).select(col("vec_id"), expr(quant).as("eq"))
    val q = eq.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("eq").as("q_eq"))
    val w = Window.partitionBy("query_id").orderBy(col("d"), col("vec_id"))
    val truth = eq
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        expr("aggregate(zip_with(eq, q_eq, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, t) -> acc + t)")
          .as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("query_id", "vec_id")
    val recall = s.select("query_id", "vec_id").intersect(truth).count().toDouble / truth.count()
    assert(recall >= 0.7, s"ivfadc recall@10 $recall below 0.7")
    // deterministic end to end (integer arithmetic + e4 cosine train)
    val again = Similarity.ivfAdcSearch(spark, sf)
    assert(s.exceptAll(again).count() == 0)
  }

  test("ivfadc over the persisted index is bit-identical and scans codes, not vectors") {
    val inline = Similarity.ivfAdcSearch(spark, sf)
    val indexed = Similarity.ivfAdcViaIndex(spark, sf).cache()
    assert(indexed.exceptAll(inline).count() == 0)
    assert(inline.exceptAll(indexed).count() == 0)
    // build to an explicit path to inspect the at-rest payload — the
    // driver-facing ivfAdcViaIndex now cleans up its per-run scratch
    // dir, so the index is re-materialized here for inspection
    val p = java.nio.file.Files.createTempDirectory("graft-pq-idx").toString
    try {
      Similarity.buildIvfAdcIndex(spark, sf, p)
      // the at-rest index is the integer 5 B/vector payload: codes
      // table carries ONLY (vec_id, cell, s, code)
      val codes = spark.read.parquet(s"$p/codes")
      assert(codes.columns.sorted.toSeq == Seq("cell", "code", "s", "vec_id"))
      assert(codes.count() == Tables.embeddings(spark, sf).count() * Similarity.PqM)
      // the search plan reads the codes table; the full embedding column
      // appears only in the query-side and re-rank scans (vec_id-filtered
      // or survivor-joined), never in an unfiltered coarse corpus scan
      val viaIdx = Similarity.ivfAdcSearchIndexed(spark, sf, p)
      val plan = viaIdx.queryExecution.executedPlan.toString
      assert(plan.contains("codes"), s"indexed search does not scan the codes table:\n$plan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files
        .walk(java.nio.file.Paths.get(p))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator()
        .asScala
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("pq distortion: rollup ties to the #120 code frame; utilization bounded by K") {
    val got = Similarity.pqDistortion(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val codes = Similarity.pqCodes(spark, sf)
      .select("vec_id", "s", "code", "dist_e8")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = codes.groupBy(_._1).map { case (s, xs) =>
      s -> ((xs.length.toLong, xs.map(_._3).sum / xs.length,
        xs.map(_._3).max, xs.map(_._2).distinct.length.toLong))
    }
    assert(got == exp, "distortion differs from the code-frame rollup")
    // every subspace covers the whole corpus; utilization within [1, 256]
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    got.values.foreach { case (nv, _, _, used) =>
      assert(nv == n && used >= 1 && used <= 256)
    }
  }

}
