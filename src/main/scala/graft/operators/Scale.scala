package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale-technique operators: the patterns that keep plans alive at
  * 100 TB when keys skew or views must update incrementally. Each is
  * oracle-checked against the equivalent direct computation — the
  * technique must change the plan, not the answer.
  */
object Scale {

  /** #43 Skew-salted join: fact side salted into `nSalts` subkeys,
    * dim side replicated `nSalts`× — a hot key's rows spread over
    * `nSalts` reducers instead of melting one. (AQE skew-join handles
    * moderate skew adaptively; explicit salting is the deterministic
    * fallback for pathological keys.) Answer must equal the plain
    * join — verified by the oracle.
    */
  def saltedJoin(spark: SparkSession, dir: String, nSalts: Int = 8): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("user_id"), col("value"))
      // deterministic pseudo-random salt: spreads each key's rows
      .withColumn("_salt", pmod(xxhash64(col("user_id"), col("value")), lit(nSalts)))
    val dim = Tables
      .customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    ev.join(dim, ev("user_id") === dim("c_custkey") && ev("_salt") === dim("_salt"))
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
  }

  /** Merge a delta changelog onto a snapshot of per-key state: the
    * incremental-materialization primitive (Delta/Iceberg MERGE INTO
    * shape). One union + one window pass — never a full recompute.
    * Snapshot rows carry op = their last op; tombstoned keys drop.
    */
  def merge(snapshot: DataFrame, delta: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    snapshot
      .unionByName(delta)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .drop("rn")
  }

  /** #44 Incremental merge: snapshot built from the first half of the
    * changelog (as current-state + op), delta = second half; merged
    * result must equal the full-log current state (the oracle).
    */
  def mergeIncremental(spark: SparkSession, dir: String): DataFrame = {
    val changes = Cdc.classify(spark, dir)
    val mid = 5000L // deterministic split point (event_id is dense from 0)
    val snapW = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val snapshot = changes
      .filter(col("event_id") < mid)
      .withColumn("rn", row_number().over(snapW))
      .filter(col("rn") === 1) // keep tombstones: merge needs the last op
      .drop("rn")
    val delta = changes.filter(col("event_id") >= mid)
    merge(snapshot, delta)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("ts").as("last_ts"),
        col("value"))
  }

  /** #45 Daily resample with gap fill: per-user daily event counts
    * over the full calendar span, zero-filled — the time-series
    * regularization step before windowed feature extraction. Calendar
    * explode is per-key-bounded (days × users), not a cross join.
    */
  def resampleDaily(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        to_date(timestamp_micros(expr("ts div 1000"))).as("day"),
        col("value"))
    val perDay = ev
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val calendar = Tables
      .events(spark, dir)
      .select(col("user_id"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    calendar
      .join(perDay, Seq("user_id", "day"), "left")
      .select(
        col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
  }

  /** #46 Approximate percentiles (KLL-style sketch in Spark): the
    * constant-memory quantile path a 100 TB pipeline actually runs;
    * rows-only (sketch outputs are engine-specific).
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_extendedprice"), array(lit(0.5), lit(0.9), lit(0.99)), lit(1000))
          .as("p"))
      .select(
        col("l_returnflag"),
        round(element_at(col("p"), 1), 2).as("p50"),
        round(element_at(col("p"), 2), 2).as("p90"),
        round(element_at(col("p"), 3), 2).as("p99"))
}
