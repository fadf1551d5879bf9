package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph-ANN paradigm (§15.4 evaluation invariant: every approximate
  * index ships with its scorecard): the exact k-NN graph is the truth
  * structure, NSW greedy search the approximation whose recall is
  * pinned here. Measured at sf0.001 (500 vectors): recall@10 = 0.93
  * at the default hops=4/beam=10 from the single min-vec_id entry
  * (sweep: 0.50 @ h3/b10, 0.56 @ h3/b16, 0.93 @ h4/b10, 0.96 @
  * h4/b16, 1.00 @ h5/b16) — the walk needs enough hops to cross the
  * corpus diameter from ONE entry; the bound pins the measured
  * floor, not a wish.
  */
class NswSpec extends SparkSpec {

  test("exact k-NN graph: k rows per vector, reciprocal-ish density, self-free") {
    val g = Similarity.exactKnnGraph(spark, sf).cache()
    val n = g.select("src").distinct().count()
    assert(g.count() == n * 10, "every vector must have exactly k=10 neighbors")
    assert(g.filter(col("src") === col("dst")).isEmpty, "self-edges excluded")
    // cos must be non-increasing in rank per src
    val bad = g.alias("a")
      .join(g.alias("b"), expr("a.src = b.src AND a.rank + 1 = b.rank"))
      .filter(expr("a.cos < b.cos"))
    assert(bad.isEmpty, "neighbor list must be sorted by cosine")
    g.unpersist()
  }

  test("NSW greedy search hits the measured recall floor against brute force") {
    val r = recallAt10(Similarity.nswSearch(spark, sf))
    assert(r >= 0.93, s"recall@10 regressed: $r < 0.93 (the measured hops=4/beam=10 floor)")
  }

  test("one more hop at wider beam reaches full recall on this corpus") {
    val r = recallAt10(Similarity.nswSearch(spark, sf, beam = 16, hops = 5))
    assert(r >= 0.99, s"hops=5/beam=16 measured 1.00 at entry; got $r")
  }

  test("scalable (cell-bounded) walk matches or beats the exact-g0 walk") {
    // #448 recall-delta scorecard: the n^1.5 build (spill-3 cells +
    // 4 long links + 2 NN-Descent rounds, symmetrized walk graph)
    // measured 1.00 at sf0.001 and 0.99 at sf0.01 vs the DIRECTED
    // exact graph's 0.93/0.90 — symmetrization + long links buy more
    // than the exact lists lose. Floor pinned under the measure.
    val scal = recallAt10(Similarity.nswSearchScalable(spark, sf))
    assert(scal >= 0.97, s"scalable NSW recall regressed: $scal < 0.97 (measured 1.00)")
    val exact = recallAt10(Similarity.nswSearch(spark, sf))
    assert(scal >= exact - 0.02, s"scalable walk fell behind exact-g0: $scal vs $exact")
  }
}
