package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Shapley theorem on this data: for the subset value function
  * v(S) = #conversions with touchset ⊆ S, game theory says the
  * coalition-enumerated Shapley value equals the closed form "each
  * conversion splits 1/|touchset| across its channels" (v is a sum of
  * unanimity games). The operator computes the ENUMERATION; this spec
  * recomputes the CLOSED FORM independently (exact integers over the
  * common n! denominator) and asserts bit equality — validating the
  * general machinery that a synergy-bearing v(S) would reuse
  * unchanged. Plus the efficiency axiom: Σφ = v(grand) − v(∅).
  */
class ShapleySpec extends SparkSpec {

  test("coalition enumeration equals the unanimity closed form; efficiency holds") {
    val out = AnalyticsExt.shapleyAttribution(spark, sf).collect()
    val denom = out.head.getAs[Long]("denom")
    val phi = out.map(r => r.getAs[String]("channel") -> r.getAs[Long]("phi_num")).toMap

    // independent closed form: per converting journey, denom/|T| to each c in T
    val seqs = graft.Tables
      .events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)")
        .as("t0"))
      .filter(expr("array_position(t0, 'purchase') > 0"))
      .select(
        expr("""array_sort(array_distinct(
                  slice(t0, 1, CAST(array_position(t0, 'purchase') AS INT) - 1)))""")
          .as("touchset"))
      .filter(size(col("touchset")) > 0)
      .collect()
      .map(_.getSeq[String](0))
    val closed = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    seqs.foreach { t =>
      val share = denom / t.length // denom = n! is divisible by every |T| <= n
      t.foreach(c => closed(c) += share)
    }
    phi.foreach { case (c, p) =>
      assert(p == closed(c), s"$c: enumerated $p != closed-form ${closed(c)} (x$denom)")
    }
    // efficiency: sum of phi = (v(grand) - v(empty)) * denom
    assert(phi.values.sum == seqs.length * denom)
  }
}
