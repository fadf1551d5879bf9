package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is fully materialized through the noop sink (count()
  * would let Catalyst prune the projection and under-measure scans).
  * A warmup job first absorbs session/codegen/parquet-footer startup
  * so per-query numbers measure the plan, not the JVM.
  *
  * The full query suite shares one JVM, and round-2 showed accumulated heap/GC
  * debt inflating late queries up to 10× over their isolated times
  * (q_json_extract: 13.8 s recorded, 0.7 s isolated). Two defenses:
  * drop caches + force a GC + settle BEFORE each query, and record
  * the BEST OF TWO back-to-back runs (the second run re-plans from
  * scratch — only JVM-level noise is amortized, never Spark results).
  */
object Bench {
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

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // (first-run, best-of-two): the best suppresses JVM noise for the
    // baseline compare, but best-of-two alone systematically under-
    // reports one-shot latency (planning/codegen cost) — the first-run
    // series is published alongside so single-execution regressions
    // stay visible.
    def materialize(name: String): (Double, Double) = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(50)
      val first = once(name)
      if (first < 0) return (first, first)
      val second = once(name)
      (first, if (second < 0) first else math.min(first, second))
    }

    // warmup: touch every table + exercise codegen paths once
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    once(SparkEntry.queries.keys.head)

    // optional comma-separated filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    val results = names.map(n => n -> materialize(n))
    val qs = results
      .map { case (k, (_, best)) => "\"" + k + "\":" + f"$best%.3f" }
      .mkString("{", ",", "}")
    val firsts = results
      .map { case (k, (first, _)) => "\"" + k + "\":" + f"$first%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_first":$firsts,"sf":"$sfDir"}""")
    spark.stop()
  }
}
