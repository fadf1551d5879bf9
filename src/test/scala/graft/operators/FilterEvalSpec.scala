package graft.operators

import graft.SparkSpec

/** #421 — quality-filter scorecard. Measured at sf0.001: every
  * planted family caught 10/10 BY ITS INTENDED RULE (repeat →
  * repetitive, short → too_short, symbol → low_quality — the rule
  * attribution is the point: a scorecard that only counted catches
  * couldn't see one rule shadowing another), clean FPR 10.8%
  * (54/500 — mostly genuinely short/noisy synthetic docs; honest
  * corpus number, documented not wished away).
  */
class FilterEvalSpec extends SparkSpec {

  test("each planted degenerate family is fully caught by its intended rule") {
    val rows = TextOps
      .filterEval(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rows.keySet == Set("clean", "planted_repeat", "planted_short", "planted_symbol"))
    val (nr, cr, _, _, rep) = rows("planted_repeat")
    assert(cr == nr && rep == nr, s"repeat spam must be caught as repetitive: $cr/$nr, rule=$rep")
    val (ns, cs, short, _, _) = rows("planted_short")
    assert(cs == ns && short == ns, s"stubs must be caught as too_short: $cs/$ns")
    val (ny, cy, _, lowq, _) = rows("planted_symbol")
    assert(cy == ny && lowq == ny, s"symbol noise must be caught as low_quality: $cy/$ny")
  }

  test("clean-corpus false-positive rate stays inside the measured band") {
    val clean = TextOps
      .filterEval(spark, sf)
      .filter("kind = 'clean'")
      .head
    val fprE6 = clean.getLong(3)
    // measured 10.8% at sf0.001 / 8.8% at sf0.01 — a jump past 20%
    // means a threshold or tokenizer drifted
    assert(fprE6 <= 200000L, s"clean FPR $fprE6 e6 blew past the measured band")
    assert(fprE6 > 0L, "a zero FPR on this synthetic corpus means the signals stopped firing")
  }
}
