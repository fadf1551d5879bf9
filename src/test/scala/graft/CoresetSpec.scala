package graft

import graft.operators.Similarity

/** #425 — sensitivity-sampling lightweight coreset. Replays the whole
  * quantize→mean→sensitivity→draw fold driver-side and pins the
  * measured bounds: the weighted sample conserves total mass (Σ1/p
  * vs n — measured 0.953·n at sf0.001, one deterministic draw of an
  * unbiased estimator), the sample lands near its size target, and
  * every sensitivity respects the uniform floor.
  */
class CoresetSpec extends SparkSpec {

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("coreset: draw-rule replay; q floor; size and weight-conservation bounds") {
    val got = Similarity
      .coreset(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val vecs = graft.Tables
      .embeddings(spark, sf)
      .selectExpr("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e4).toLong))
    val n = vecs.length.toLong
    val dims = vecs.head._2.length
    val mu = (0 until dims).map { p =>
      math.floor(vecs.map(_._2(p)).sum.toDouble / n + 0.5).toLong
    }
    val d2 = vecs.map { case (id, q) =>
      id -> q.zip(mu).map { case (x, m) => (x - m) * (x - m) }.sum
    }.toMap
    val sumD2 = d2.values.sum
    val m = Similarity.CoresetM
    val want = d2.collect {
      case (id, d) =>
        val q12 = 1000000000000L / (2 * n) +
          (BigInt(d) * 1000000000000L / (2 * sumD2)).toLong
        val p12 = math.min(1000000000000L, m * q12)
        (id, d, q12, p12, hash60(s"coreset:$id") % 1000000000000L < p12)
    }
    want.foreach { case (id, d, q12, p12, in) =>
      assert(got.contains(id) == in, s"inclusion mismatch for $id")
      if (in) {
        assert(got(id) == ((d, q12, p12, 1000000000000000000L / p12)), s"row mismatch for $id")
        // the sensitivity floor: q >= uniform mass 1/(2n)
        assert(q12 >= 1000000000000L / (2 * n))
      }
    }
    // size near target; Σ(1/p) conserves mass (measured 0.953·n —
    // pinned as the ±20% band of an unbiased single draw)
    assert(got.size >= m / 2 && got.size <= 2 * m, s"sample size ${got.size} far from $m")
    val sumW = got.values.map(_._4).sum
    assert(
      sumW >= n * 800000L && sumW <= n * 1200000L,
      s"weight mass $sumW outside the conservation band for n=$n")
    // far points are kept: the max-d² point saturates its draw
    val far = d2.maxBy(_._2)._1
    assert(got.contains(far) || m * (1000000000000L / (2 * n) +
      (BigInt(d2(far)) * 1000000000000L / (2 * sumD2)).toLong) < 1000000000000L)
  }
}
