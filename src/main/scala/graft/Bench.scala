package graft

import java.nio.file.{Files, Paths}

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
  *
  * Round-4 follow-up (the 2.9×-pagerank / uniform-1.6× drift
  * verdict): suite-conditioned numbers must carry their own
  * explanation. After the main pass, every query whose best-of-two
  * exceeds 2× its BASELINE.md entry is re-measured once more at
  * suite END (fresh clearCache+GC, best-of-two) — if the retry lands
  * back under 2×, the excursion was suite conditioning, not a plan
  * change, and the retry number is published as the evidence. The
  * one-line JSON keeps `queries` FIRST and the verdict fields
  * (`retry_isolated`, `over2x_after_retry`, totals) LAST: the
  * driver's capture keeps the tail of the line, so the diagnosis
  * survives even when the full per-query map is truncated. The
  * complete record (first-run series, suite order, baseline ratios,
  * retries) goes to BENCH_DETAIL.json in the working directory;
  * suite position = alphabetical rank (queries run in sorted order).
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
    // series is published alongside in BENCH_DETAIL.json so single-
    // execution regressions stay visible.
    def materialize(name: String): (Double, Double) = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(50)
      val first = once(name)
      if (first < 0) return (first, first)
      val second = once(name)
      (first, if (second < 0) first else math.min(first, second))
    }

    // per-query baseline entries for the 2× rule (absent for queries
    // first measured this round)
    val baseline: Map[String, Double] = {
      val p = Paths.get("BASELINE.md")
      if (!Files.exists(p)) Map.empty
      else {
        val Row = """\|\s*(\S+)\s*\|\s*([0-9.]+)\s*\|""".r
        // explicit UTF-8: the forked JVM's default charset may be
        // POSIX/ASCII and the file contains multibyte prose
        Files
          .readString(p, java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator
          .collect { case Row(n, s) => n -> s.toDouble }
          .toMap
      }
    }

    // warmup: touch every table + exercise codegen paths once
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    once(SparkEntry.queries.keys.head)

    // optional comma-separated filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    val results = names.map(n => n -> materialize(n))

    // end-of-suite isolated retries for everything over 2× baseline:
    // same fresh-cache best-of-two protocol, worst offenders first
    val offenders = results
      .collect {
        case (n, (_, best)) if best >= 0 && baseline.get(n).exists(b => best > 2 * b) =>
          n -> best / baseline(n)
      }
      .sortBy(-_._2)
      .map(_._1)
    val retries = offenders.map { n => n -> materialize(n)._2 }.toMap
    val stillOver = offenders.filter(n => retries(n) > 2 * baseline(n))

    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2._2).filter(_ >= 0).sum

    val detail = names.zipWithIndex
      .map { case (n, i) =>
        val (first, best) = results(i)._2
        val extra =
          baseline.get(n).map(b => f""","baseline":$b%.3f,"ratio":${best / b}%.2f""").getOrElse("") +
            retries.get(n).map(r => f""","retry_isolated":$r%.3f""").getOrElse("")
        f"""  "$n": {"pos":$i,"first":$first%.3f,"best":$best%.3f$extra}"""
      }
      .mkString("{\n", ",\n", "\n}")
    // filtered (SPARK_GRAFT_ONLY) iteration runs must not clobber the
    // committed full-suite record
    if (only.isEmpty)
      Files.writeString(
        Paths.get("BENCH_DETAIL.json"),
        f"""{"sf":"$sfDir","order":"alphabetical","total_best":$total%.3f,"queries":\n$detail}\n""")

    // queries first, verdict fields last — the tail survives capture
    println(
      f"""{"metric":"total","queries":${jmap(results.map { case (n, r) => n -> r._2 })},""" +
        f""""retry_isolated":${jmap(retries.toSeq.sortBy(_._1))},""" +
        f""""over2x_after_retry":${stillOver.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        f""""n_queries":${results.size},"value":$total%.3f,"unit":"sec","sf":"$sfDir"}""")
    spark.stop()
  }
}
