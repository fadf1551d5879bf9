package graft.sources

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** The Debezium snapshot-phase contract against embedded Derby:
  * PK-chunked parallel `spark.read.jdbc` emits the seeded table as an
  * INSERT wave that (a) round-trips the file-path current state
  * exactly, (b) is partitioning-invariant (1 chunk ≡ N chunks — the
  * chunker loses/duplicates nothing at range seams), and (c) hands
  * off to the tail changelog: snapshot-at-mid + second-half changes
  * replays to the SAME current state as the full log (the
  * snapshot→streaming switchover Debezium performs at the binlog
  * position, `mysql-connector-config-clean.json`).
  */
class JdbcSnapshotSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftSnapshot;create=true"

  private def latestCurrent(changes: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("ts").as("last_ts"),
        col("value"))
  }

  test("bounded-partition snapshot read round-trips the current state in parallel") {
    val want = Cdc.current(spark, sf).cache()
    JdbcSnapshotSource.seed(want, url)
    val snap = JdbcSnapshotSource.readSnapshot(spark, url, numPartitions = 4)
    assert(snap.rdd.getNumPartitions == 4, "read must be PK-chunked into the requested slices")
    val got = snap.toDF().select(
      col("user_id"),
      col("event_id").as("last_event_id"),
      col("ts").as("last_ts"),
      col("value"))
    assert(snap.filter(col("op") =!= "INSERT").isEmpty, "snapshot wave must be all INSERTs")
    assert(
      got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "snapshot wave diverged from the seeded current state")
  }

  test("chunk count does not change the wave: 1 partition == 4 partitions") {
    JdbcSnapshotSource.seed(Cdc.current(spark, sf), url)
    val one = JdbcSnapshotSource.readSnapshot(spark, url, numPartitions = 1).toDF()
    val four = JdbcSnapshotSource.readSnapshot(spark, url, numPartitions = 4).toDF()
    assert(one.exceptAll(four).isEmpty && four.exceptAll(one).isEmpty)
  }

  test("snapshot at mid-log + tail changelog replays to the full-log current state") {
    val changes = Cdc.classify(spark, sf).cache()
    val mid = changes.agg(expr("percentile(ts, 0.5)")).head.getDouble(0).toLong
    // the OLTP table as it stands at the snapshot point
    JdbcSnapshotSource.seed(latestCurrent(changes.filter(col("ts") <= mid)), url)
    val wave = JdbcSnapshotSource
      .readSnapshot(spark, url, numPartitions = 4)
      .toDF()
      .select("event_id", "ts", "user_id", "op", "value")
    val tail = changes.filter(col("ts") > mid).select("event_id", "ts", "user_id", "op", "value")
    val got = latestCurrent(wave.unionAll(tail))
    val want = Cdc.current(spark, sf)
      .select("user_id", "last_event_id", "last_ts", "value")
    assert(
      got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "snapshot+tail handoff diverged from the full-log current state")
  }
}
