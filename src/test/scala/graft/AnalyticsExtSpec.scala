package graft

import org.apache.spark.sql.functions._

import graft.operators.AnalyticsExt

class AnalyticsExtSpec extends SparkSpec {

  test("asof join: one row per event; attached order never postdates the event") {
    val a = AnalyticsExt.asofJoin(spark, sf).cache()
    assert(a.count() == graft.Tables.events(spark, sf).count())
    // order_date (µs) must be <= event ts for every matched row
    val bad = a
      .filter(col("o_orderkey").isNotNull)
      .filter(unix_micros(to_timestamp(col("order_date"))) > col("ts"))
      .count()
    assert(bad == 0)
  }

  test("range join: counts are bounded by the user's total engagement events") {
    val r = AnalyticsExt.rangeJoin(spark, sf).cache()
    val totals = graft.Tables
      .events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_total"))
    assert(
      r.join(totals, "user_id")
        .filter(col("n_prior_engagements") > col("n_total"))
        .count() == 0)
    assert(r.filter(col("n_prior_engagements") < 0).count() == 0)
  }

  test("percentiles: p50 <= p90 everywhere") {
    val p = AnalyticsExt.percentiles(spark, sf)
    assert(p.filter(col("p50_acctbal") > col("p90_acctbal")).count() == 0)
  }

  test("cube totals: grand total row equals table count") {
    val c = AnalyticsExt.cubeOrders(spark, sf)
    val grand = c
      .filter(col("o_orderstatus") === "(all)" && col("o_orderpriority") === "(all)")
      .select("n_orders")
      .head
      .getLong(0)
    assert(grand == graft.Tables.orders(spark, sf).count())
  }

  test("ntile: quartiles 1..4, sizes within 1 of each other per segment") {
    val n = AnalyticsExt.ntileCustomers(spark, sf).cache()
    assert(n.filter(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    val spread = n
      .groupBy("c_mktsegment", "quartile")
      .count()
      .groupBy("c_mktsegment")
      .agg((max("count") - min("count")).as("spread"))
    assert(spread.filter(col("spread") > 1).count() == 0)
  }
}
