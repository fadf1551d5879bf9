package graft

import graft.operators.Rvq

/** #445/#446 residual vector quantization: code-range and
  * distortion invariants plus the family ordering the scorecard
  * exists to demonstrate. The bit-exact two-stage Lloyd replay lives
  * in the generated DuckDB oracle (rvqCtes).
  */
class RvqSpec extends SparkSpec {

  test("rvq codes: every vector coded in range at both stages; cascade never hurts on average") {
    val rows = Rvq
      .rvqCodes(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(rows.length == n)
    rows.foreach { case (_, c1, c2, d1, d2) =>
      assert(c1 >= 0 && c1 < Rvq.K && c2 >= 0 && c2 < Rvq.K)
      assert(d1 >= 0 && d2 >= 0)
    }
    val meanD1 = rows.map(_._4).sum / rows.length
    val meanD2 = rows.map(_._5).sum / rows.length
    assert(meanD2 < meanD1, s"cascade mean $meanD2 !< stage1 mean $meanD1")
  }

  test("rvq scorecard: distortion orders by bit budget across the quantizer family") {
    val rows = Rvq
      .rvqEval(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    val (b1, m1, cu1) = rows("rvq_stage1")
    val (b2, m2, cu2) = rows("rvq_cascade")
    val (bp, mp, cup) = rows("pq_m4_k16")
    assert(b1 == 4 && b2 == 8 && bp == 16)
    // more bits, less distortion — within RVQ and across the family
    assert(m2 < m1, s"cascade $m2 !< stage1 $m1")
    assert(mp < m2, s"pq $mp !< cascade $m2")
    // stage-1 uses its full codebook; the cascade's pair space is
    // well-populated (> half of K^2); PQ uses all M*K codewords
    assert(cu1 == Rvq.K)
    assert(cu2 > Rvq.K.toLong * Rvq.K / 2)
    assert(cup == 64L)
  }
}
