package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }

  test("filter scan pushes filters and prunes columns at the parquet scan") {
    val df = Analytics.filterScan(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && !scan.contains("PushedFilters: []"))
    assert(scan.contains("l_quantity"))
    // pruned: props/l_tax etc. not read
    assert(!scan.contains("l_tax"))
  }

  test("q5 star join broadcasts every dimension — no shuffle exchange for joins") {
    val df = Analytics.regionRevenue(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val plan = executedPlan(df)
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    // the only exchange is the final groupBy(r_name, n_name) aggregation
    assert(shuffles.size <= 1, s"expected <=1 shuffle, got ${shuffles.size}:\n$plan")
    assert(plan.toString.contains("BroadcastHashJoin"))
  }

  test("approx distinct: HLL estimate within 3x rsd of exact for every group") {
    import org.apache.spark.sql.functions._
    val df = Analytics.approxDistinct(spark, sf)
    assert(df.count() == 5)
    assert(df.filter(col("within_3rsd") =!= 1).count() == 0)
  }

  test("count-min sketch: never undercounts, total mass conserved, overcount bounded") {
    import org.apache.spark.sql.functions._
    val c = Analytics.cmsCounts(spark, sf).cache()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    val nEvents = Tables.events(spark, sf).count()
    assert(c.count() == nUsers)
    // exact side really is exact
    assert(c.agg(sum("n_exact")).head.getLong(0) == nEvents)
    // CMS hard invariant: estimates only ever overcount
    assert(c.filter(col("n_cms") < col("n_exact")).count() == 0)
    assert(c.filter(col("overcount") =!= col("n_cms") - col("n_exact")).count() == 0)
    // realized collision mass stays near the E[overcount] <= n/width
    // contract (width 256, depth 3 — generous 4x slack per row)
    assert(c.filter(col("overcount") > lit(4.0) * nEvents / 256).count() == 0)
  }

  test("top-n per group emits exactly <=3 rows per brand, rank contiguous") {
    import org.apache.spark.sql.functions._
    val df = Analytics.topPartsPerBrand(spark, sf).cache()
    assert(df.groupBy("p_brand").count().filter("count > 3").count() == 0)
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
  }

  test("sessionize: session bounds ordered, counts positive") {
    import org.apache.spark.sql.functions._
    val s = Analytics.sessionize(spark, sf).cache()
    assert(s.filter(col("session_end") < col("session_start")).count() == 0)
    assert(s.filter(col("n_events") < 1).count() == 0)
  }

  test("funnel stages are monotonically non-increasing") {
    val r = Analytics.funnel(spark, sf).collect().head
    val (s, e, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s >= e && e >= c && s > 0)
  }

  test("cohort retention: offset-0 retention is 1.0, rates bounded, cohorts partition users") {
    import org.apache.spark.sql.functions._
    val r = Analytics.cohortRetention(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("week_offset") < 0).count() == 0)
    assert(r.filter(col("n_users") > col("cohort_size")).count() == 0)
    // by definition every cohort member is active in their first week
    val w0 = r.filter(col("week_offset") === 0)
    assert(w0.count() == r.select("cohort_week").distinct().count())
    assert(w0.filter(col("retention") =!= 1.0).count() == 0)
    // cohort sizes partition the user base
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(w0.agg(sum("cohort_size")).head.getLong(0) == users)
  }
}
