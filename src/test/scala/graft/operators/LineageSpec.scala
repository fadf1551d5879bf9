package graft.operators

import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Lineage.CpOps

/** The r10 ownership contract of [[Lineage.checkpointReleasing]]:
  * scopes track exactly the checkpoints their body registered, so
  * (1) two wrapped bodies interleaving on one SparkContext run
  * CONCURRENTLY (the r6-r9 form serialized them on a process-wide
  * sweepLock) and neither sweeps the other's in-flight blocks, and
  * (2) on exit a wrapper releases its own intermediates and nothing
  * else — the result frame, materialized before release, stays
  * readable afterwards.
  */
class LineageSpec extends SparkSpec {

  /** A small iterative body shaped like pageRank's loop: `rounds`
    * chained checkpoints over an input cache, final frame returned
    * uncheckpointed. The barrier forces both threads INSIDE their
    * bodies at once — under the old sweepLock this deadlocks nothing
    * but serializes; under scope ownership it interleaves, and the
    * test's correctness assertions prove no cross-sweep happened
    * (a swept lazy localCheckpoint is unrecoverable, so any
    * cross-sweep fails the count/sum checks loudly).
    */
  private def iterativeBody(seed: Long, rounds: Int, barrier: CyclicBarrier): DataFrame =
    Lineage.checkpointReleasing(spark) { implicit scope =>
      val base = spark.range(seed, seed + 1000).toDF("v").cache()
      var acc = base.select(col("v"), col("v").as("s")).cp(false)
      barrier.await()
      for (_ <- 1 to rounds) {
        acc = acc.select(col("v"), (col("s") + col("v")).as("s")).cp(false)
        barrier.await()
      }
      (acc.agg(sum("s").as("total"), count(lit(1)).as("n")), Seq(base))
    }

  private def expected(seed: Long, rounds: Int): Long =
    (seed until seed + 1000).map(v => v.toLong * (rounds + 1)).sum

  test("two wrapped bodies interleave concurrently without sweeping each other") {
    val rounds = 4
    // 2 worker threads + the barrier trips only when BOTH threads are
    // at the same round boundary — guaranteed interleaving, not luck
    val barrier = new CyclicBarrier(2)
    var r1: DataFrame = null
    var r2: DataFrame = null
    var e1: Throwable = null
    var e2: Throwable = null
    val t1 = new Thread(() =>
      try r1 = iterativeBody(0L, rounds, barrier)
      catch { case e: Throwable => e1 = e })
    val t2 = new Thread(() =>
      try r2 = iterativeBody(100000L, rounds, barrier)
      catch { case e: Throwable => e2 = e })
    t1.start(); t2.start()
    t1.join(120000); t2.join(120000)
    assert(e1 == null, s"body 1 failed: $e1")
    assert(e2 == null, s"body 2 failed: $e2")
    val row1 = r1.head
    val row2 = r2.head
    assert(row1.getLong(1) == 1000L && row2.getLong(1) == 1000L)
    assert(row1.getLong(0) == expected(0L, rounds), "body 1 trajectory corrupted")
    assert(row2.getLong(0) == expected(100000L, rounds), "body 2 trajectory corrupted")
  }

  test("scope releases its own intermediates; the result stays readable") {
    val sc = spark.sparkContext
    // quiesce: drop anything earlier suites left behind so the
    // after-exit census counts only this test's blocks
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.keySet
    val out = Lineage.checkpointReleasing(spark) { implicit scope =>
      val base = spark.range(0, 500).toDF("v").cache()
      var acc = base.select(col("v"), col("v").as("s")).cp(false)
      for (_ <- 1 to 3) acc = acc.select(col("v"), (col("s") + 1L).as("s")).cp(false)
      (acc.agg(sum("s").as("total")), Seq(base))
    }
    val survivors = sc.getPersistentRDDs.keySet -- before
    // exactly the wrapper's eager checkpoint of the result survives:
    // 4 round checkpoints + 1 cache released, 1 result block kept
    assert(survivors.size == 1, s"expected only the result's blocks, got $survivors")
    // and the result reads fine AFTER its lineage inputs were dropped
    assert(out.head.getLong(0) == 500L * 3 + (0L until 500L).sum)
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
