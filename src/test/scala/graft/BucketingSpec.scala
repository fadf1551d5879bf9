package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join technique SURVEY §5 claims for
  * 100 TB: both sides pre-hashed into the same bucket layout on the
  * join key ⇒ the join runs with ZERO shuffle exchanges.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      Tables
        .orders(spark, sf)
        .write
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
      Tables
        .lineitem(spark, sf)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")

      val joined = spark
        .table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum("l_extendedprice"), 2).as("rev"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val joinShuffles = plan.collect { case s: ShuffleExchangeExec => s }
      // the ONLY exchange allowed is the final 1-key aggregation
      assert(joinShuffles.size <= 1, s"bucketed join still shuffles:\n$plan")
      // correctness: equals the unbucketed join
      val plain = Tables
        .lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum("l_extendedprice"), 2).as("rev"))
      assert(joined.exceptAll(plain).count() == 0 && plain.exceptAll(joined).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed CDC outputs: current x stats joins with zero shuffle exchanges") {
    import graft.operators.Cdc
    spark.sql("DROP TABLE IF EXISTS cdc_b_current")
    spark.sql("DROP TABLE IF EXISTS cdc_b_stats")
    try {
      Cdc.writeBucketed(spark, sf)
      val enriched = Cdc.bucketedEnriched(spark)
      enriched.collect()
      val plan = enriched.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"bucketed CDC join still shuffles:\n$plan")
      // equality with the unbucketed join of the live DataFrames
      val plain = Cdc.current(spark, sf)
        .join(Cdc.stats(spark, sf), "user_id")
        .select(
          col("user_id"), col("last_event_id"), col("value"),
          col("n_changes"), col("n_updates"), col("total_value"))
      assert(enriched.exceptAll(plain).count() == 0 && plain.exceptAll(enriched).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS cdc_b_current")
      spark.sql("DROP TABLE IF EXISTS cdc_b_stats")
    }
  }
}
