package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * [[checkpointReleasing]] wraps an operator body. The body builds its
  * result (creating any number of round checkpoints and caches) and
  * returns the UNcheckpointed final frame plus the caches it holds;
  * the wrapper then (1) eagerly checkpoints the result — materializing
  * it while every intermediate block is still alive, (2) unpersists
  * the returned caches, and (3) unpersists every persistent RDD the
  * body created, leaving ONLY the result's own blocks. Correctness:
  * a localCheckpoint TRUNCATES lineage, so a frame whose blocks are
  * dropped cannot be recomputed — which is why step (1) must run
  * before step (3), and why the result's own blocks (created after the
  * body returns) are never touched.
  *
  * Concurrency contract: the before/after diff observes GLOBAL
  * SparkContext state, so two wrapped bodies interleaving on one
  * context would each sweep the other's in-flight checkpoint blocks —
  * and a swept localCheckpoint is unrecoverable (lineage already
  * truncated). The wrapper therefore SERIALIZES wrapped bodies on a
  * process-wide lock: concurrent callers queue rather than corrupt.
  * Residual caveat (documented, not enforced): a concurrent UNwrapped
  * query that persists blocks while a wrapped body runs will have
  * those blocks swept too — callers running ad-hoc concurrent work on
  * the same context should persist outside wrapped-operator calls or
  * accept recompute (plain caches recompute; only bare localCheckpoint
  * blocks are unrecoverable, and graft's own operators only create
  * those inside this wrapper).
  */
object Lineage {
  private val sweepLock = new Object

  def checkpointReleasing(spark: SparkSession)(
      build: => (DataFrame, Seq[DataFrame])): DataFrame = sweepLock.synchronized {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val (raw, caches) = build
    val intermediates = sc.getPersistentRDDs.keySet.toSet -- before
    // materialize the result FIRST: it may read both the caches and the
    // round checkpoints, so nothing is released until its own blocks
    // exist (created after the snapshot above — never swept below)
    val out = raw.localCheckpoint(eager = true)
    caches.foreach(_.unpersist())
    intermediates.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    out
  }
}
