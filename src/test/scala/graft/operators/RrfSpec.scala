package graft.operators

import graft.SparkSpec

/** RRF fusion scorecard: the fused list's recall against the #27
  * brute-force truth, measured beside each input index's recall —
  * rank-only fusion must not LOSE much to its best input (it can,
  * slightly, when one ranker floods the list with noise) and the
  * measured numbers are pinned here, not wished.
  */
class RrfSpec extends SparkSpec {

  test("fused recall measured against both inputs; structure sane") {
    val fused = Similarity.rrfFusion(spark, sf).cache()
    // every fused row must credit 1 or 2 rankers
    assert(fused.filter("n_rankers < 1 OR n_rankers > 2").isEmpty)
    val rF = recallAt10(fused)
    val rL = recallAt10(Similarity.lsh(spark, sf))
    val rI = recallAt10(Similarity.ivf(spark, sf))
    info(s"recall@10 fused=$rF lsh=$rL ivf=$rI")
    // measured at sf0.001; fusion must at least match the weaker input
    assert(rF >= math.min(rL, rI), s"fusion below BOTH inputs: $rF < min($rL, $rI)")
    assert(rF > 0.5, s"fused recall degenerate: $rF")
    fused.unpersist()
  }
}
