package graft

import org.apache.spark.sql.functions._

/** The zero-code-change skew path users actually rely on at 100 TB:
  * `spark.sql.adaptive.skewJoin` (OptimizeSkewedJoin) splitting an
  * oversized shuffle partition at runtime. The repo's `q_salted_join`
  * (#43) is the explicit-salting alternative; this spec pins the AQE
  * alternative by planting a key that owns ~95% of the left side's
  * bytes and asserting the executed (adaptive, post-materialization)
  * plan really did run the sort-merge join in skew mode — so a future
  * config or session-builder change that silently disables the path
  * fails CI, not a production run.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE OptimizeSkewedJoin splits a planted skewed partition (skew=true in the final plan)") {
    val conf = spark.conf
    // session is shared across suites (sequential in the forked JVM):
    // save + restore everything we touch
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      // force SMJ (skew handling doesn't apply to broadcast joins) and
      // scale the byte thresholds down to test size: the planted
      // partition is ~5 MB, the rest ~KBs
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      val pad = "x" * 64
      // 200k rows, 95% on key 0 → one shuffle partition dwarfs the rest
      val left = spark
        .range(0, 200000)
        .select(
          when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("left_id"),
          lit(pad).as("payload"))
      val right = spark
        .range(0, 200000)
        .select(col("id").as("k"), (col("id") * 2).as("right_val"))
      val joined = left.join(right, "k")
      // materialize THIS Dataset's own QueryExecution (count() would
      // build a separate one and leave joined's plan unexecuted —
      // isFinalPlan=false, no skew marking): AQE only replans at runtime
      val n = joined.collect().length
      assert(n == 200000, s"join cardinality $n — every left row matches exactly one right key")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(
        finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire — no skew=true in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
