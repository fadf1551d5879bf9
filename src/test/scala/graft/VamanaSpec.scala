package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** #428/#429 — Vamana α-pruned navigable graph (batch build). Pins
  * the structural contract of RobustPrune on every final list (degree
  * cap, selection-order monotonicity, the α domination invariant) and
  * the measured search-recall floors of the scorecard.
  */
class VamanaSpec extends SparkSpec {

  test("vamana: degree cap, monotone selection, alpha invariant on every list") {
    val g = Similarity.vamana(spark, sf).cache()
    val n = graft.Tables.embeddings(spark, sf).count()
    // every node keeps a list; no list exceeds the degree cap; no self-edges
    assert(g.select("src").distinct().count() == n, "a node lost its out-list")
    assert(g.groupBy("src").count().filter(col("count") > Similarity.VamanaR).isEmpty)
    assert(g.filter(col("src") === col("dst")).isEmpty)
    // selection order: cos_e6 non-increasing in rank (each argmax runs
    // over a shrinking candidate set)
    val bad = g.alias("a")
      .join(g.alias("b"), expr("a.src = b.src AND a.rank + 1 = b.rank"))
      .filter(expr("a.cos_e6 < b.cos_e6"))
    assert(bad.isEmpty, "selection-order cosine must be non-increasing")
    // the alpha invariant: for every ordered pick pair (earlier e,
    // later l) of one list, e did NOT dominate l at prune time:
    // NOT (12*(1e6 - cos(e,l)) <= 10*(1e6 - cos(p,l)))
    val emb = graft.Tables
      .embeddings(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    def cosE6(a: Long, b: Long): Long = {
      val (x, y) = (emb(a), emb(b))
      val dot = x.zip(y).map { case (u, v) => u * v }.sum
      val nx = math.sqrt(x.map(u => u * u).sum)
      val ny = math.sqrt(y.map(u => u * u).sum)
      math.floor(dot / (nx * ny) * 1e6 + 0.5).toLong
    }
    val lists = g.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    lists.foreach { case (p, rows) =>
      val ordered = rows.sortBy(_._4)
      for (i <- ordered.indices; j <- (i + 1) until ordered.length) {
        val (e, l, cosPl) = (ordered(i)._2, ordered(j)._2, ordered(j)._3)
        assert(
          !(Similarity.VamanaAlphaNum * (1000000L - cosE6(e, l))
            <= Similarity.VamanaAlphaDen * (1000000L - cosPl)),
          s"list $p: pick $l survives although earlier pick $e dominates it")
      }
    }
    g.unpersist()
  }

  test("vamana recall scorecard: measured floors hold and recall is monotone in beam") {
    val rows = Similarity
      .vamanaRecall(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(3))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Similarity.HnswBeamPoints.map(_.toLong).sorted)
    // nested-ish budgets: wider beams must not lose recall materially
    // (trajectories differ, so allow the small measured wobble)
    rows.sliding(2).foreach {
      case Array((_, lo), (_, hi)) => assert(hi >= lo - 20000L, s"recall fell with beam: $lo -> $hi")
      case _ =>
    }
    // measured floor at the production beam=10 point (see BASELINE/
    // SURVEY row #429 for the per-scale numbers backing 0.85)
    val at10 = rows.toMap.apply(10L)
    assert(at10 >= 850000L, s"beam-10 recall $at10 under the measured floor")
  }
}
