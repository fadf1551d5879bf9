package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** #419/#420 — incremental k-NN graph maintenance. The spec pins the
  * structural fold contract and the measured per-kind recall floors
  * (sf0.001: all 0.939, base 0.965, delta 0.706 — insertion by beam
  * walk is the approximate half, and the split keeps that failure
  * mode visible instead of averaging it away).
  */
class GraphInsertSpec extends SparkSpec {

  test("fold shape: every corpus node keeps at most k ranked self-free neighbors") {
    val g = Similarity.graphInsert(spark, sf).cache()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(g.select("src").distinct().count() == n, "a node lost its list in the fold")
    assert(g.groupBy("src").count().filter(col("count") > 10).isEmpty)
    assert(g.filter(col("src") === col("dst")).isEmpty)
    val bad = g.alias("a")
      .join(g.alias("b"), expr("a.src = b.src AND a.rank + 1 = b.rank"))
      .filter(expr("a.cos < b.cos"))
    assert(bad.isEmpty, "re-ranked lists must stay cosine-sorted")
    g.unpersist()
  }

  test("reverse updates only improve base lists: folded base edges ⊇ exact-on-base hits") {
    // every base edge the fold keeps is either the persisted base edge
    // or a strictly-better delta edge — so against the FULL truth the
    // base side must be at least as good as the base-only index was
    val rows = Similarity
      .graphInsertEval(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3))
      .toMap
    assert(rows.keySet == Set("all", "base", "delta"))
    assert(rows("base") >= 940000L, s"base recall ${rows("base")} under the measured floor")
    assert(rows("delta") >= 680000L, s"delta recall ${rows("delta")} under the measured floor")
    assert(rows("all") >= 920000L, s"overall recall ${rows("all")} under the measured floor")
    assert(
      rows("base") >= rows("delta"),
      "base lists (exact + reverse updates) must not trail walk-inserted delta lists")
  }
}
