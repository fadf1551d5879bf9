package graft

import graft.operators.FilteredAnn

/** #435/#436 filtered vector search: the label constraint holds on
  * every returned row, the search degrades to the exact filtered
  * truth's set, and the scorecard prices the two strategies the way
  * the literature says — pre-filtering dominates post-filtering at
  * the same probe budget, and post-filtering collapses to roughly
  * the label selectivity.
  */
class FilteredAnnSpec extends SparkSpec {

  test("filtered search returns only same-label neighbors, <= 10 per query") {
    val res = FilteredAnn.filteredSearch(spark, sf)
    val labels = graft.Tables
      .embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val rows = res.select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, v) =>
      assert(labels(v) == labels(q), s"query $q got cross-label neighbor $v")
      assert(v != q)
    }
    val perQuery = rows.groupBy(_._1).map(_._2.size)
    assert(perQuery.max <= 10)
  }

  test("scorecard: prefilter beats postfilter at equal budget; postfilter collapses") {
    val rows = FilteredAnn
      .filteredEval(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val (tPre, retPre, hitsPre, recPre) = rows("prefilter")
    val (tPost, retPost, hitsPost, recPost) = rows("postfilter")
    assert(tPre == tPost && tPre == 100L) // 10 queries x full filtered top-10
    // hits are bounded by what each strategy returned
    assert(hitsPre <= retPre && hitsPost <= retPost)
    // the strategy ordering the operators exist to demonstrate
    assert(recPre > recPost)
    assert(recPre >= 350000L, s"prefilter recall dropped to $recPre")
    // post-filtering an unfiltered top-10 at ~10 labels keeps ~1 row
    // per query: recall is capped near the selectivity
    assert(retPost <= 30L)
    assert(recPost <= 200000L)
  }
}
