package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Scale}

class ScaleSpec extends SparkSpec {

  test("salted join equals the plain join (technique changes the plan, not the answer)") {
    val salted = Scale.saltedJoin(spark, sf)
    val plain = Tables
      .events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("incremental merge of snapshot+delta equals the full recompute") {
    val merged = Scale.mergeIncremental(spark, sf)
    val full = Cdc.current(spark, sf)
    assert(merged.exceptAll(full).count() == 0 && full.exceptAll(merged).count() == 0)
  }

  test("daily resample: dense calendar per user, gap days zero-filled, totals preserved") {
    val r = Scale.resampleDaily(spark, sf).cache()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val days = r.select("day").distinct().count()
    assert(r.count() == users * days)
    val totalEvents = r.agg(sum("n_events")).head.getLong(0)
    assert(totalEvents == Tables.events(spark, sf).count())
  }

  test("approx percentiles are ordered and bracket the median") {
    val p = Scale.approxPercentiles(spark, sf)
    assert(p.filter(col("p50") > col("p90") || col("p90") > col("p99")).count() == 0)
  }
}
