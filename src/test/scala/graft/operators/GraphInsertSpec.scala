package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** #419/#420 — incremental k-NN graph maintenance. The spec pins the
  * structural fold contract and the measured per-kind recall floors
  * (sf0.001 under the r11 lift — descent entry, efConstruction-wide
  * 48×5 walk, all-visited reverse offers: all 0.998, base 0.999,
  * delta 0.992; the r10 global-entry 10×4 walk measured delta 0.706,
  * and the split keeps that failure mode visible instead of
  * averaging it away).
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
    assert(rows("base") >= 990000L, s"base recall ${rows("base")} under the measured floor")
    assert(rows("delta") >= 980000L, s"delta recall ${rows("delta")} under the measured floor")
    assert(rows("all") >= 990000L, s"overall recall ${rows("all")} under the measured floor")
    assert(
      rows("base") >= rows("delta"),
      "base lists (exact + reverse updates) must not trail walk-inserted delta lists")
  }

  test("scalable fold: cell-bounded base index keeps the measured floor") {
    // #450 recall-delta scorecard: the fold over the scalable base
    // index (spill-3 + long links + 2 NN-Descent rounds, base-trained
    // quantizer) measured 0.921 at sf0.001 / 0.929 at sf0.01 against
    // the full-corpus exact rebuild — the ~0.07 delta IS the build's
    // approximation cost (the exact-base fold measures 0.998); the
    // insertion machinery is unchanged. Floor pinned under the
    // measures with the honesty margin.
    val folded = Similarity
      .graphInsertScalable(spark, sf)
      .select("src", "dst")
    val truth = Similarity.exactKnnGraph(spark, sf).select("src", "dst")
    val r = folded.intersect(truth).count().toDouble / truth.count()
    assert(r >= 0.88, s"scalable fold recall regressed: $r < 0.88 (measured 0.921)")
  }
}
