package graft

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic main: runs the named queries through
  * the noop sink (the bench's timed action) with a listener that
  * aggregates per-job and per-stage wall/task/shuffle numbers, then
  * prints a breakdown — the local-mode stand-in for the Spark UI's
  * Stages page (guide §1.1/§7.1). Diagnostic only: never invoked by
  * the driver contract; changes no query.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   runMain graft.ProfileQuery <query> [query...]
  */
object ProfileQuery {
  private final class Agg extends SparkListener {
    case class StageRow(
        id: Int,
        name: String,
        tasks: Int,
        wallMs: Long,
        taskMs: Long,
        shufReadB: Long,
        shufWriteB: Long,
        inputB: Long)
    val stages = mutable.ArrayBuffer.empty[StageRow]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long)]
    private val jobStart = mutable.Map.empty[Int, Long]
    private val taskMs = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    private val shufR = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    private val shufW = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    private val inB = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    private val nTask = mutable.Map.empty[Int, Int].withDefaultValue(0)

    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobStart(e.jobId) = e.time
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs += ((e.jobId, e.time - jobStart.getOrElse(e.jobId, e.time)))
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val sid = e.stageId
      nTask(sid) += 1
      val m = e.taskMetrics
      if (m != null) {
        taskMs(sid) += m.executorRunTime
        shufR(sid) += m.shuffleReadMetrics.totalBytesRead
        shufW(sid) += m.shuffleWriteMetrics.bytesWritten
        inB(sid) += m.inputMetrics.bytesRead
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val i = e.stageInfo
      val wall = (for {
        s <- i.submissionTime
        c <- i.completionTime
      } yield c - s).getOrElse(0L)
      stages += StageRow(
        i.stageId,
        i.name.takeWhile(_ != '\n').take(90),
        nTask(i.stageId),
        wall,
        taskMs(i.stageId),
        shufR(i.stageId),
        shufW(i.stageId),
        inB(i.stageId))
    }
    def reset(): Unit = { stages.clear(); jobs.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)

    // warmup (the bench's protocol)
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()

    for (name <- args) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      Thread.sleep(50)
      agg.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      val totJobMs = agg.jobs.map(_._2).sum
      println(f"\n===== $name: wall ${wall}%.2f s, ${agg.jobs.size} jobs " +
        f"(sum ${totJobMs / 1e3}%.2f s), ${agg.stages.size} stages =====")
      println("  top stages by wall ms:")
      agg.stages.sortBy(-_.wallMs).take(25).foreach { s =>
        println(f"   ${s.wallMs}%6d ms  tasks=${s.tasks}%4d  taskMs=${s.taskMs}%7d  " +
          f"shufR=${s.shufReadB / 1024}%8d K shufW=${s.shufWriteB / 1024}%8d K " +
          f"in=${s.inputB / 1024}%8d K  ${s.name}")
      }
      val gaps = totJobMs
      println(f"  stage wall sum: ${agg.stages.map(_.wallMs).sum / 1e3}%.2f s; " +
        f"job wall sum: ${gaps / 1e3}%.2f s; action wall: ${wall}%.2f s")
    }
    spark.stop()
  }
}
