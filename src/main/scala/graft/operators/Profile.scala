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

  /** Profile every column of `df`: one row per column. */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
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
}
