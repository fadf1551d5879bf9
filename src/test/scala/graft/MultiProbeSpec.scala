package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class MultiProbeSpec extends SparkSpec {

  test("multi-probe recall@10 is a multiple of single-probe recall") {
    // the synthetic embeddings are near-uniform (true top-10 sit at
    // cos ≈ 0.3), so absolute LSH recall is intrinsically modest; the
    // probe knob's job is widening candidate sets past bucket
    // boundaries — recall must strictly improve on single-probe
    val single = recallAt10(Similarity.lsh(spark, sf))
    val multi = recallAt10(Similarity.lshMultiProbe(spark, sf))
    assert(multi >= single, s"multi-probe recall $multi < single-probe $single")
    assert(multi >= math.max(0.15, 1.3 * single),
      s"multi-probe recall too low: $multi (single: $single)")
  }

  test("multi-probe results are deduplicated and rank-contiguous") {
    val m = Similarity.lshMultiProbe(spark, sf).cache()
    assert(m.groupBy("query_id", "vec_id").count().filter("count > 1").count() == 0)
    assert(m.filter(col("rank") < 1 || col("rank") > 10).count() == 0)
  }

  test("range search: threshold honored, subset of brute-force tau-set, covers multiprobe survivors") {
    val r = Similarity.rangeSearch(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("cos") < 0.2).count() == 0)
    // no pair beyond the brute-force threshold set (same 6dp cosine)
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val truth = emb
      .crossJoin(
        broadcast(emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(org.apache.spark.sql.functions.expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
      .filter(col("cos") >= 0.2)
    assert(r.exceptAll(truth).count() == 0, "range search returned a pair below tau or a wrong cos")
    // every multiprobe top-10 row passing tau MUST appear (identical
    // candidate contract, range drops only the rank cutoff)
    val mp = Similarity.lshMultiProbe(spark, sf)
      .filter(col("cos") >= 0.2).select("query_id", "vec_id", "cos")
    assert(mp.exceptAll(r).count() == 0, "a multiprobe survivor above tau is missing")
    val again = Similarity.rangeSearch(spark, sf)
    assert(r.exceptAll(again).count() == 0 && again.exceptAll(r).count() == 0)
    r.unpersist()
  }

  test("tables curve: each point ties the standalone lsh search; monotone in tables") {
    val curve = Similarity.lshTablesCurve(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(curve.keySet == Similarity.TablesPoints.map(_.toLong).toSet)
    val truth = Similarity.bruteForce(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nQ = truth.map(_._1).size.toLong
    Similarity.TablesPoints.foreach { t =>
      val standalone = Similarity.lsh(spark, sf, tables = t)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (gotNq, _, hits, rec) = curve(t.toLong)
      assert(gotNq == nQ)
      assert(hits == standalone.intersect(truth).size.toLong, s"tables $t hits")
      assert(rec == hits * 1000000L / (nQ * 10L))
    }
    val byT = Similarity.TablesPoints.map(t => curve(t.toLong))
    byT.zip(byT.drop(1)).foreach { case ((_, c1, h1, _), (_, c2, h2, _)) =>
      assert(c2 >= c1 && h2 >= h1)
    }
  }
}
