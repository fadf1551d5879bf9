package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #136 Transactionally-consistent multi-table CDC apply: one change
  * stream fans out into SEVERAL warehouse tables, and a reader must
  * never observe a batch applied to one table but not the others —
  * the cross-table atomicity a single-table MERGE can't give you.
  *
  * Protocol (the manifest-gated commit every lakehouse multi-table
  * transaction reduces to):
  *   1. write each table's slice of the batch to its own path,
  *      partitioned by `batch_id` (data lands invisible);
  *   2. only THEN append one `batch_id` row to the manifest.
  * Readers resolve `max(committed batch_id)` from the manifest ONCE
  * and filter every table to `batch_id <=` that watermark — so a
  * crash between step 1 and step 2 leaves orphaned (never-read) files
  * instead of torn state, and re-running the batch overwrites its own
  * partition idempotently (`batch_id` is the dynamic-overwrite key).
  *
  * Scale: the manifest is one row per batch (trivial); data writes
  * are the partitioned appends the sink performs anyway; the reader's
  * filter is partition pruning on `batch_id` — no extra scan cost.
  */
object MultiTableApply {

  /** Step 1+2 for one micro-batch: `batch` carries a `table` routing
    * column; each table's slice lands in `base/<table>/batch_id=<id>`,
    * then the manifest row commits the batch atomically-enough (the
    * manifest append is the single commit point).
    */
  def applyBatch(batch: DataFrame, tables: Seq[String], batchId: Long, base: String): Unit = {
    val cached = batch.cache()
    try {
      tables.foreach { t =>
        cached
          .filter(col("table") === t)
          .drop("table")
          .write
          .mode("overwrite")
          .parquet(s"$base/$t/batch_id=$batchId")
      }
      // the commit point: one manifest row makes the whole batch visible
      val spark = batch.sparkSession
      import spark.implicits._
      Seq(batchId).toDF("batch_id").coalesce(1).write.mode("append").parquet(s"$base/_manifest")
    } finally { cached.unpersist(); () }
  }

  /** Consistent snapshot of one table: only batches PRESENT in the
    * manifest are visible — membership, not `<= max`. A `<=`-watermark
    * read is only torn-state-safe under strictly in-order single-writer
    * commits, which `applyBatch` (arbitrary `batchId`) does not
    * enforce: an orphaned uncommitted batch with a LOWER id would
    * become visible the moment any higher batch commits. The
    * left-semi join against the one-row-per-batch manifest keeps the
    * guarantee writer-order-free; partition pruning still applies via
    * dynamic partition pruning / the trivially small build side.
    * All tables resolve the SAME manifest snapshot, so the view stays
    * cross-table consistent.
    */
  def readConsistent(spark: SparkSession, base: String, table: String): DataFrame = {
    val committed = committedBatches(spark, base)
    spark.read
      .option("basePath", s"$base/$table")
      .parquet(s"$base/$table/batch_id=*")
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
  }

  /** The set of committed batch ids (empty when nothing committed).
    * Only a MISSING manifest maps to "nothing committed"; any real
    * read failure (IO error, permissions, corrupt footer) propagates —
    * an empty-but-plausible snapshot must never mask an error.
    */
  def committedBatches(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    if (!new java.io.File(s"$base/_manifest").exists())
      Seq.empty[Long].toDF("batch_id")
    else spark.read.parquet(s"$base/_manifest").select(col("batch_id")).distinct()
  }

  /** The highest committed batch id (−1 when nothing committed); the
    * manifest-missing probe is explicit, real read errors propagate.
    */
  def committedWatermark(spark: SparkSession, base: String): Long = {
    val r = committedBatches(spark, base).agg(max("batch_id")).head
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }
}
