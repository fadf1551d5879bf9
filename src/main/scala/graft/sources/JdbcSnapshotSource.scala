package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Change

/** JDBC bounded-partition snapshot source — the Debezium SNAPSHOT
  * phase of the reference deployment, Spark-first. The reference's
  * connector (`mysql-connector-config-clean.json`: MySqlConnector over
  * `bankdb.bank_accounts`) begins by chunking the source table on its
  * primary key and emitting every existing row as a read/INSERT wave
  * before switching to the binlog; this source reproduces that
  * contract with `spark.read.jdbc(partitionColumn, lower, upper,
  * numPartitions)` so the snapshot is pulled by MANY executors in
  * parallel, each owning one key range — the same PK-chunked scan
  * Debezium's snapshotter performs, but distributed instead of the
  * connector's single task (`tasks.max: 1`).
  *
  * Emission shape: each source row becomes a connector-agnostic
  * [[graft.streaming.Change]] with `op = INSERT` carrying the row's
  * stored (event_id, ts) — the snapshot-wave analog of Debezium's
  * `op: r` records — so every downstream Cdc / CdcStream operator and
  * the [[graft.streaming.JdbcUpsertSink]] consume a snapshot exactly
  * like live changes (the snapshot→streaming handoff is a plain
  * union of waves; `JdbcSnapshotSourceSpec` proves snapshot +
  * tail-changelog replays to the full-log current state).
  *
  * Scale: bounds come from ONE `SELECT MIN(pk), MAX(pk)` probe (what
  * Debezium's chunker runs); the read is `numPartitions` concurrent
  * range scans, each a PK-indexed slice on the source database — at
  * 100 TB the knob trades source-DB load against snapshot wall-clock,
  * and stride gaps/skew cost only imbalance, never correctness (the
  * spec pins partitioning-invariance: 1-partition ≡ N-partition).
  * Tested against embedded Derby; in production the same URL points
  * at MySQL/Postgres.
  */
object JdbcSnapshotSource {

  val SnapshotTable = "bank_accounts"

  /** Materialize a current-state frame as the source table (test
    * harness stand-in for the OLTP database being snapshotted).
    * Overwrite mode = Spark's distributed JDBC writer creates the
    * table from the frame's schema, one connection per partition.
    */
  def seed(state: DataFrame, url: String): Unit =
    state.write.mode("overwrite").jdbc(url, SnapshotTable, new java.util.Properties())

  /** The chunker's bounds probe: one MIN/MAX of the partition key. */
  def keyBounds(url: String): (Long, Long) = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT MIN("user_id"), MAX("user_id") FROM $SnapshotTable""")
        try { rs.next(); (rs.getLong(1), rs.getLong(2)) }
        finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  /** The snapshot wave: PK-chunked parallel read → INSERT-op Change
    * records. `numPartitions` key-range slices; rows outside no slice
    * exist (Spark's first/last ranges are unbounded below/above).
    */
  def readSnapshot(spark: SparkSession, url: String, numPartitions: Int = 8): Dataset[Change] = {
    import spark.implicits._
    val (lo, hi) = keyBounds(url)
    spark.read
      .jdbc(url, SnapshotTable, "user_id", lo, hi, numPartitions, new java.util.Properties())
      .select(
        col("last_event_id").as("event_id"),
        col("last_ts").as("ts"),
        col("user_id"),
        lit("INSERT").as("op"),
        col("value"))
      .as[Change]
  }
}
