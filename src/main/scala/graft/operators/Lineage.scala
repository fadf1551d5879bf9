package graft.operators

import scala.collection.mutable.ListBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Checkpoint-block hygiene for the iterative operators.
  *
  * Every multi-round operator (PageRank/PPR/HITS, label propagation,
  * k-core/k-truss peeling, TextRank, near-dup clustering) cuts its
  * per-round lineage with `localCheckpoint` — without the cut, round
  * N's plan nests N copies of the edge join and both planning time and
  * recovery lineage explode. But each cut PERSISTS the round's blocks,
  * and `SparkSession.catalog.clearCache()` does NOT release them
  * (they live in `SparkContext.getPersistentRDDs`, not the
  * CacheManager) — the r6 bench showed exactly this: blocks from 312
  * queries' round checkpoints accumulating across a shared JVM until
  * late queries ran 2-3× slow. The fix is the same discipline the
  * operators already apply to their `.cache()`s: release on exit.
  *
  * [[checkpointReleasing]] wraps an operator body. The body receives a
  * per-invocation [[Scope]] and registers every round checkpoint with
  * it (the `.cp(eager)` extension — a drop-in for `.localCheckpoint`);
  * it returns the UNcheckpointed final frame plus the caches it holds.
  * The wrapper then (1) eagerly checkpoints the result — materializing
  * it while every intermediate block is still alive, (2) unpersists
  * the returned caches, and (3) releases exactly the blocks the body
  * registered, leaving ONLY the result's own blocks. Correctness: a
  * localCheckpoint TRUNCATES lineage, so a frame whose blocks are
  * dropped cannot be recomputed — which is why step (1) must run
  * before step (3), and why the result's own blocks (created after the
  * body returns, never registered) are never touched.
  *
  * Concurrency contract: ownership is EXPLICIT. The scope tracks the
  * persisted RDD behind each checkpoint it created (pulled from the
  * checkpointed frame's `LogicalRDD` leaf — the same RDD
  * `getPersistentRDDs` would list) and releases only those, so two
  * wrapped bodies interleaving on one context never touch each
  * other's blocks and run fully in parallel. This replaced the r6-r9
  * form, which diffed GLOBAL `getPersistentRDDs` state around the body
  * and therefore had to serialize every wrapped operator on a
  * process-wide lock — a scheduling chokepoint under a shared
  * SparkSession (1000-executor deployments routinely multiplex one
  * context across query threads), and the prime suspect in the r7-r9
  * monotone graph-query drift. Concurrent UNwrapped work is likewise
  * safe now: only blocks this scope created are ever swept.
  */
object Lineage {

  /** Per-invocation checkpoint registry. Thread-safe: a body may fan
    * out its rounds across threads; registration and release touch a
    * private buffer only.
    */
  final class Scope private[Lineage] () {
    private val tracked = ListBuffer.empty[RDD[_]]
    private val caches = ListBuffer.empty[DataFrame]

    /** Register an already-cached frame for unpersist when the
      * wrapping [[checkpointReleasing]] exits — SUCCESS OR FAILURE.
      * The tuple-return path releases caches only when the body
      * returns them; a body that throws (or whose result's eager
      * checkpoint throws) leaks its caches under that contract.
      * Registration here closes the failure path: release runs in the
      * wrapper's `finally`, which on success is after the result's
      * own blocks are materialized.
      */
    def cache(df: DataFrame): DataFrame = {
      caches.synchronized { caches += df }
      df
    }

    /** `df.localCheckpoint(eager)` + register the persisted blocks for
      * release when the wrapping [[checkpointReleasing]] exits.
      */
    def cp(df: DataFrame, eager: Boolean): DataFrame = {
      val out = df.localCheckpoint(eager)
      // the checkpointed frame's plan is a LogicalRDD leaf over the
      // persisted internal-row RDD — the exact object the old global
      // sweep pulled out of getPersistentRDDs
      out.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }.foreach { r =>
        tracked.synchronized { tracked += r }
      }
      out
    }

    /** [[cp]] + STATS RESET. `Dataset.localCheckpoint` preserves the
      * origin plan's estimated statistics through the cut, and
      * Catalyst's non-CBO join estimate is the PRODUCT of child
      * sizeInBytes — so an iterative operator whose per-round plan
      * joins its own previous output compounds that product
      * double-exponentially. Measured in the #428 Vamana build: the
      * stat reached 416k BITS by round two and the planner's BigInt
      * multiplications (Toom-Cook frames in every stack sample)
      * became a ~2×-per-iteration driver bottleneck while the jobs
      * themselves stayed at milliseconds. Rebuilding the frame from
      * the checkpointed RDD drops the inherited stat to the session
      * default, making per-iteration planning cost constant. The row
      * round-trip adds an encode pass on reads — use for SMALL
      * iterate-state frames only.
      */
    def cpFresh(df: DataFrame, eager: Boolean): DataFrame = {
      val out = cp(df, eager)
      out.sparkSession.createDataFrame(out.rdd, out.schema)
    }

    private[Lineage] def releaseAll(): Unit = {
      tracked.synchronized {
        tracked.foreach(_.unpersist(blocking = false))
        tracked.clear()
      }
      caches.synchronized {
        caches.foreach(_.unpersist())
        caches.clear()
      }
    }
  }

  /** `.cp(eager)` — the in-body drop-in for `.localCheckpoint(eager)`
    * that registers the blocks with the ambient scope.
    */
  implicit final class CpOps(private val df: DataFrame) extends AnyVal {
    def cp(eager: Boolean)(implicit scope: Scope): DataFrame = scope.cp(df, eager)

    /** See [[Scope.cpFresh]] — checkpoint with inherited-stats reset. */
    def cpf(eager: Boolean)(implicit scope: Scope): DataFrame = scope.cpFresh(df, eager)
  }

  /** A mid-plan lineage cut that a PLAN AUDIT can disable: identity
    * when `enabled` is false, so PlanDisciplineSpec can plan the full
    * pre-checkpoint form of an operator whose production plan hides
    * its upstream behind an RDDScan (a lazy localCheckpoint truncates
    * the SparkPlan — the window walker cannot see through it).
    * Production callers never pass false: the cut is load-bearing
    * (multi-consumer subtrees re-execute without it).
    */
  def cutIf(enabled: Boolean)(df: DataFrame, eager: Boolean = false): DataFrame =
    if (enabled) df.localCheckpoint(eager) else df

  def checkpointReleasing(spark: SparkSession)(
      build: Scope => (DataFrame, Seq[DataFrame])): DataFrame = {
    val scope = new Scope
    try {
      val (raw, caches) = build(scope)
      // materialize the result FIRST: it may read both the caches and
      // the round checkpoints, so nothing is released until its own
      // blocks exist (never registered with the scope — never swept)
      val out = raw.localCheckpoint(eager = true)
      caches.foreach(_.unpersist())
      out
    } finally scope.releaseAll()
  }
}
