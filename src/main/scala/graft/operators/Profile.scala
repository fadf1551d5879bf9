package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data profiling: per-column null counts, distinct cardinality, and
  * min/max — the schema-driven quality report run before any 100 TB
  * ingest. The plan is built dynamically from the input schema and
  * executes as ONE aggregation pass over the table (all columns'
  * stats computed side-by-side, then unpivoted), not one scan per
  * column.
  */
object Profile {

  /** Profile every column of `df`: one row per column.
    *
    * `approxDistinct = true` is the at-scale mode: HLL++ sketches
    * (`approx_count_distinct`, 2% rsd) keep per-column state constant
    * instead of one exact hash set PER COLUMN in a single pass — at
    * 100 TB the exact mode's aggregate state is the scan's memory
    * bottleneck, and a diagnostic profile doesn't need exact
    * cardinalities. Default stays exact so the driver's
    * `q_profile_customer` oracle (DuckDB `count(DISTINCT ...)`) can
    * hash-compare; `ProfileQuantSpec` pins the sketch within 5% of
    * exact at spec scale.
    */
  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (approxDistinct) approx_count_distinct(col(c), rsd = 0.02)
        else count_distinct(col(c))
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        distinctAgg.as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one struct per column, exploded to rows
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    wide
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.column"), col("e.n_nulls"), col("e.n_distinct"), col("e.min_value"), col("e.max_value"))
  }

  /** #51 Profile of the customer table (driver query). */
  def profileCustomer(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.customer(spark, dir))

  /** #91 Fixed-width value histogram per group: bucket counts with
    * in-bucket min/max — the distribution profile a warehouse keeps
    * per column/partition for optimizer statistics and drift
    * monitoring. One aggregation, buckets derived arithmetically (no
    * second pass to find ranges) — at 100 TB this is a single
    * map-side-combined shuffle of (groups × buckets) rows.
    */
  def valueHistogram(spark: SparkSession, dir: String, width: Double = 25.0): DataFrame =
    graft.Tables
      .events(spark, dir)
      .groupBy(
        col("event_type"),
        floor(col("value") / width).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min("value"), 2).as("lo"),
        round(max("value"), 2).as("hi"))
      .select(
        col("event_type"),
        col("bucket"),
        round(col("bucket") * width, 2).as("bucket_start"),
        col("n"),
        col("lo"),
        col("hi"))
}
