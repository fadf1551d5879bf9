package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session builder with the scale-oriented defaults this library assumes:
  * AQE on (runtime re-plan + skew-join), modest shuffle parallelism for
  * local mode (the driver overrides via conf on a real cluster), UTC.
  */
object GraftSession {
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The SQL façade: register the star schema plus the CDC warehouse
    * as temp views so the warehouse is queryable exactly the way the
    * reference's psql surface is (`test-etl-pipeline.sh:244-260`,
    * `README.md:106-108` — `SELECT * FROM bank_accounts_history ORDER
    * BY change_timestamp DESC LIMIT 10`, etc. run verbatim through
    * `sql` below; `GraftSqlSpec` pins three of them).
    *
    * Views registered:
    *   - the ten base parquet tables under their own names
    *     (`region` … `embeddings`);
    *   - `bank_accounts_history` / `bank_accounts_current` /
    *     `user_account_stats` — the reference's three OLAP tables
    *     (`README.md:34-38`), with the reference's column names over
    *     this repo's events-changelog mapping (SURVEY §1):
    *     `original_id` := the CDC key (user_id), `account` := value,
    *     `change_timestamp` := the event time as a µs timestamp,
    *     `original_registered_at` := the INSERT-preserved field
    *     (`simple_kafka_etl.py:96-105`'s carry-forward), and
    *     `kafka_offset` := event_id (the delivery-coordinate analog
    *     the reference dedups on, `simple_kafka_etl.py:81-84`).
    *
    * Temp views are metadata-only: each query still plans lazily
    * against the parquet scans with full pushdown, so the façade adds
    * zero execution cost at any scale.
    */
  def registerWarehouse(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents",
      "embeddings").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    graft.operators.Cdc
      .history(spark, dir)
      .select(
        col("user_id").as("original_id"),
        col("user_id"),
        col("value").as("account"),
        col("change_type"),
        timestamp_micros(expr("ts div 1000")).as("change_timestamp"),
        col("original_value").as("original_registered_at"),
        col("event_id").as("kafka_offset"),
        lit(0).as("kafka_partition"),
        lit("graft.events").as("kafka_topic"))
      .createOrReplaceTempView("bank_accounts_history")
    graft.operators.Cdc
      .current(spark, dir)
      .select(
        col("user_id").as("original_id"),
        col("user_id"),
        col("value").as("account"),
        timestamp_micros(expr("last_ts div 1000")).as("last_updated_at"),
        col("last_event_id").as("kafka_offset"))
      .createOrReplaceTempView("bank_accounts_current")
    graft.operators.Cdc.stats(spark, dir).createOrReplaceTempView("user_account_stats")
  }

  /** Run a SQL query against the registered warehouse — the
    * documented entry a reference user's `psql -c "..."` maps onto.
    * Call [[registerWarehouse]] once per (session, dir) first.
    */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
