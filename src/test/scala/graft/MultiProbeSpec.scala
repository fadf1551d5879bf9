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
}
