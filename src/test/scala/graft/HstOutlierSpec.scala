package graft

import graft.operators.Scale

/** #426/#427 — hash-split (half-space-tree) density outliers. Replays
  * the full forest driver-side (planting, bounds, hash-drawn splits,
  * leaf masks, occupancy scores) and pins the planted-truth scorecard
  * floors measured at sf0.001: catch 10/10, clean FPR 2/500, planted
  * mean score 462 vs clean 2332.
  */
class HstOutlierSpec extends SparkSpec {

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("hst: forest replay matches; planted scorecard floors hold") {
    val base = graft.Tables
      .embeddings(spark, sf)
      .selectExpr("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e4).toLong))
    val corpus = (base ++ base.collect { case (id, q) if id % Scale.HstPlantEvery == 0 =>
      (id + Scale.HstPlantOffset) -> q.map(_ * Scale.HstPlantScale)
    }).toMap
    val dims = corpus.head._2.length
    val lo = (0 until dims).map(p => corpus.values.map(_(p)).min)
    val hi = (0 until dims).map(p => corpus.values.map(_(p)).max)
    val splits = for (t <- 0 until Scale.HstTrees; j <- 0 until Scale.HstDepth) yield {
      val pos = (hash60(s"hst:dim:$t:$j") % 64).toInt
      val frac = hash60(s"hst:thr:$t:$j") % 1000000L
      (t, j, pos, lo(pos) + (hi(pos) - lo(pos)) * frac / 1000000L)
    }
    val leaves = corpus.map { case (id, q) =>
      (id, splits.groupBy(_._1).map { case (t, ss) =>
        t -> ss.map { case (_, j, pos, thr) => if (q(pos) > thr) 1L << j else 0L }.sum
      })
    }
    val occ = leaves.toSeq
      .flatMap { case (_, m) => m.toSeq }
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toMap
    val wantScores = leaves.map { case (id, m) => id -> m.map(occ(_)).sum }
    val got = Scale
      .hstOutliers(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wantTop = wantScores.toSeq
      .map { case (id, s) => (id, if (id >= Scale.HstPlantOffset) 1L else 0L, s) }
      .sortBy { case (id, _, s) => (s, id) }
      .take(100)
    assert(got.toSeq == wantTop)
    // §15.4 floors (measured at sf0.001: catch 1.0, FPR 0.004,
    // separation 462 vs 2332; sf0.1 independently: 0.925 / 0)
    val ev = Scale.hstOutlierEval(spark, sf).collect().head
    val (catchE6, fprE6) = (ev.getLong(3), ev.getLong(5))
    val (pMean, cMean) = (ev.getLong(6), ev.getLong(7))
    assert(catchE6 >= 900000L, s"catch $catchE6 under the measured floor")
    assert(fprE6 <= 20000L, s"clean FPR $fprE6 over the measured ceiling")
    assert(pMean * 2 < cMean, s"separation collapsed: planted $pMean vs clean $cMean")
    // the eval's flag rule is consistent with the replayed scores
    val n = corpus.size.toLong
    val sumScore = wantScores.values.sum
    val caught = wantScores.count { case (id, s) =>
      id >= Scale.HstPlantOffset && s * 2 * n < sumScore
    }
    assert(ev.getLong(2) == caught.toLong)
  }
}
