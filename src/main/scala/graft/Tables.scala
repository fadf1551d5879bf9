package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-pruned parquet readers for the driver testdata layout
  * (`TESTDATA.md`): one parquet file per table under the sf dir.
  *
  * All readers return lazy DataFrames; Catalyst prunes columns and
  * pushes filters into the scan, so callers should select/filter
  * directly on these.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** The `events` changelog table. Its `ts` column is parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects; we read
    * it as a raw nanosecond epoch long (`spark.sql.legacy.parquet.nanosAsLong`)
    * which is also what the DuckDB oracle emits via `epoch_ns(ts)` —
    * exact integer parity, no µs-truncation ambiguity.
    *
    * Schema: event_id long, ts long (ns), user_id long,
    * event_type string, value double, props string.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
  }

  /** `ts` as a µs TimestampType column (for streaming / window-by-time).
    * NOTE: integer `div`, not `/` — ns epochs (~1.7e18) overflow double
    * precision, so float division would corrupt low-order digits.
    */
  def eventsWithTimestamp(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
}
