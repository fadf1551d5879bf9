package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** The Bloom join-pruning contract: the pruned-then-joined result is
  * bit-identical to the plain join (no false negatives, the real join
  * removes false positives), and the filter actually PRUNES — the
  * pass-rate tracks true selectivity plus a small false-positive
  * margin, which is the whole point of shipping KBs of bits instead
  * of shuffling the full fact table.
  */
class BloomSpec extends SparkSpec {

  test("bloom-pruned join result equals the plain join exactly") {
    val bloom = Scale.bloomJoin(spark, sf)
    val dim = Tables
      .customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val plain = Tables
      .orders(spark, sf)
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("revenue_cents"))
    assert(bloom.exceptAll(plain).count() == 0 && plain.exceptAll(bloom).count() == 0)
  }

  test("no false negatives; pass-rate tracks selectivity with a small FP margin") {
    val orders = Tables.orders(spark, sf).select(col("o_custkey"))
    val dim = Tables
      .customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val pruned = Scale.bloomPrunedFact(spark, sf).cache()
    // every truly-joining fact row survives the bloom probe
    val joining = orders.join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
    assert(joining.exceptAll(pruned).count() == 0, "bloom dropped a joining row")
    // and the probe prunes: pass-rate <= selectivity + 5% margin
    val n = orders.count().toDouble
    val passRate = pruned.count() / n
    val selectivity = joining.count() / n
    assert(passRate <= selectivity + 0.05, s"pass $passRate vs selectivity $selectivity")
    assert(passRate < 0.5, s"bloom barely prunes: $passRate")
  }

  test("bloom fpr: measured rate in the theory band; absent probes never all-negative") {
    val row = graft.operators.Scale.bloomFpr(spark, sf).collect().head
    val (nKeys, nProbes, fp) = (row.getAs[Long]("n_keys"), row.getAs[Long]("n_probes"),
      row.getAs[Long]("n_false_pos"))
    assert(row.getAs[Long]("fpr_e6") == fp * 1000000L / nProbes)
    val theory = math.pow(1.0 - math.exp(-(3.0 * nKeys) / 16384.0), 3)
    assert(row.getAs[Long]("theory_e6") == math.floor(theory * 1e6 + 0.5).toLong)
    // measured FPR within a loose band of theory (binomial noise on
    // 100k probes): theory/3 - 10ppm .. 3*theory + 10ppm
    val m = fp.toDouble / nProbes
    assert(m <= 3 * theory + 1e-5 && m >= theory / 3 - 1e-5,
      s"measured $m vs theory $theory out of band")
  }
}
