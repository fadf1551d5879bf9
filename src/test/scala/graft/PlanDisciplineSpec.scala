package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Fleet-wide plan discipline — the automated form of the 100 TB
  * scale-killer audit: EVERY driver query's physical plan is checked
  * for (a) CartesianProduct — a non-broadcast cross join that shuffles
  * |L|×|R| at scale (the sanctioned broadcast-NLJ pattern over 1-row /
  * k-row sides compiles to BroadcastNestedLoopJoin, which stays
  * allowed), and (b) Python evaluation nodes — nothing here should
  * ever leave codegen for a socket round-trip. A new operator that
  * regresses either discipline fails this spec by name.
  */
class PlanDisciplineSpec extends SparkSpec {

  // walk THROUGH adaptive wrappers AND cached plans: with AQE on, the
  // executed plan is an AdaptiveSparkPlanExec whose children don't show
  // via .collect, and a `.cache()`d subtree hides its whole physical
  // plan behind InMemoryTableScanExec.relation.cachedPlan — the r6
  // verdict's escape hatch (q_zorder_recluster's cached exact-ntile
  // windows were invisible while the uncached q_zorder_stats needed a
  // whitelist entry for the same windows). Closed here for BOTH tests.
  // Each cached plan is walked ONCE no matter how many scans reference
  // it (recluster reads its cached base 4×: 4 scans of the same
  // 3-window build — counting 12 would make the documented instance
  // counts depend on the consumer fan-out, not the build).
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val seenCaches = new java.util.IdentityHashMap[SparkPlan, Unit]()
    def go(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case m: InMemoryTableScanExec =>
          val cp = m.relation.cachedPlan
          if (seenCaches.containsKey(cp)) Nil
          else { seenCaches.put(cp, ()); Seq(cp) }
        case _ => Nil
      }
      p +: (p.children ++ p.subqueries ++ extra).flatMap(go)
    }
    go(p)
  }

  // the structural boundedness whitelist, shared by the production-
  // plan census below and the checkpoint-free audit-form census
  private val shardLikeNames = Set("shard", "shard2", "bshard", "rshard")
  private def structurallyBounded(w: WindowExec): Boolean = {
    val sub = flatten(w.child)
    val rankLimited = sub.exists(_.isInstanceOf[WindowGroupLimitExec])
    val topkLimited = sub.exists {
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec           => true
      case _: org.apache.spark.sql.execution.CollectLimitExec          => true
      case _                                                           => false
    }
    val scalarInput = sub.exists {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _                    => false
    }
    val shardCarry = sub.exists {
      case a: BaseAggregateExec =>
        a.groupingExpressions.nonEmpty &&
        a.groupingExpressions.forall(
          _.references.toSeq.forall(r => shardLikeNames(r.name.toLowerCase)))
      case _ => false
    }
    rankLimited || topkLimited || scalarInput || shardCarry
  }

  test("every unpartitioned window rides a bounded input: rank-limited, shard-carry, or scalar") {
    // An unpartitioned WindowExec moves ALL rows to one partition — a
    // 100 TB scale-killer unless its input is provably bounded. The
    // whitelist, checked structurally on the window's child subtree:
    //   rank-limited — Spark inserted a WindowGroupLimit (a top-k
    //     rank filter prunes each task's input before the exchange);
    //   topk-limited — a TakeOrderedAndProject/limit already cut the
    //     input to k rows before the window;
    //   shard-carry — the input is an aggregate keyed ONLY by shard-
    //     like columns. `shard` names are RESERVED for value-range
    //     buckets `((v - lo) * nShards) div (hi - lo + 1)`: <= nShards
    //     rows by construction. Calendar/decile grains (day, month,
    //     decile) deliberately do NOT qualify — their bound is
    //     data-shape, not plan structure, so those queries carry a
    //     documented exception with an exact instance count instead
    //     (the r6 ADVICE: the guardrail must not be satisfiable by
    //     column naming alone);
    //   scalar — the input contains a global (groupless) aggregate,
    //     so exactly one row reaches the window.
    // Plus NAMED exceptions whose bound is data-shape — each carries
    // its reason and an exact instance count so a NEW global window in
    // those queries still fails. Anything else fails by name: a future
    // global window over an unbounded frame must either restructure or
    // extend this list.
    val documented: Map[String, (Int, String)] = Map(
      "cdc_balance_curve" -> (1 ->
        "running balance over a PER-DAY aggregate: <= #calendar-days rows"),
      "q_bootstrap_ci" -> (1 ->
        "replica-mean ranking over a PER-REPLICA aggregate: exactly B=100 rows"),
      "q_bass_diffusion" -> (1 ->
        "cumulative-adopter prefix sum over a PER-DAY first-order aggregate: <= #calendar-days rows"),
      "q_sprt" -> (2 ->
        "LLR cumsum + prefix extrema over a PER-DAY aggregate: <= #calendar-days rows"),
      "q_zorder_stats" -> (3 ->
        ("exact-ntile oracle mode by design; the 100 TB path is " +
          "zorderStats(scaleMode=true), pinned window-free by ScaleSpec")),
      "q_zorder_recluster" -> (3 ->
        ("the same exact-ntile oracle-mode base as q_zorder_stats, built " +
          "behind a .cache(); the QUERY returns an eager checkpoint (plan " +
          "= one RDD scan), so the real plan is audited by the dedicated " +
          "cache-walker test below via materialize=false")),
      "q_kaplan_meier" -> (1 ->
        "at-risk suffix sum over a PER-LIFETIME-MONTH aggregate: <= #calendar-months rows"),
      "q_nelson_aalen" -> (1 ->
        "the shared KM at-risk suffix sum: <= #calendar-months rows (cum hazard is an array fold)"),
      "q_logrank" -> (1 ->
        "both group at-risk suffix sums share one frame over the <= #calendar-months step table"),
      "q_lift_table" -> (1 ->
        "cumulative gains over a PER-DECILE aggregate: exactly 10 rows"),
      "q_peak_concurrency" -> (1 ->
        "day-offset carry over a PER-DAY aggregate: <= #calendar-days rows"),
      "q_catalog_breadth" -> (1 ->
        "novelty cumsum over a PER-MONTH aggregate: <= #calendar-months rows"),
      "q_cusum" -> (2 ->
        "CUSUM prefix sum + prefix extrema over a PER-DAY aggregate: <= #calendar-days rows"),
      "q_lorenz" -> (1 ->
        "cumulative share over a PER-DECILE aggregate: exactly 10 rows"),
      "q_runs_test" -> (4 ->
        ("median rank + global count + sign lag over a PER-DAY aggregate: " +
          "<= #calendar-days rows (global rank feeds a 1-row median)")),
      "q_page_hinkley" -> (3 ->
        ("running mean, deviation cumsum, and prefix extrema over a " +
          "PER-DAY aggregate: <= #calendar-days rows")),
      "q_degree_dist" -> (1 ->
        "octave-over-octave lag over the PER-OCTAVE aggregate: <= 64 rows"),
      "q_imr_chart" -> (2 ->
        ("moving-range lag over a PER-DAY aggregate (<= #calendar-days " +
          "rows); the lag subtree is planned twice — once under the " +
          "1-row stats fold, once under the output join")),
      "q_split_gain" -> (2 ->
        ("prefix-count cumsum + best-gain rank over the PER-BIN " +
          "aggregate: <= nBins = 10 rows")),
      "q_binseg_gain" -> (1 ->
        ("prefix count+sum over the PER-DAY aggregate: <= #calendar-days " +
          "rows (production plan checkpoints the day fold; the cut=false " +
          "audit form is walked RDDScan-free by the checkpoint-audit test)")),
      "q_curve_compare" -> (2 ->
        ("one exact-ntile file split per curve (Morton + Hilbert) — " +
          "oracle mode by design, the #83/#135 zorder precedent; the " +
          "documented scale path is the range-partitioner-sample " +
          "construction in Scale.zfile's scaleMode")),
      "text_qnorm" -> (1 ->
        ("the pooled rank grid: ONE exact global row_number over the " +
          "documents frame — oracle mode per the same zorder precedent; " +
          "scale path = sampled range ranking")),
      "q_ar2_forecast" -> (2 ->
        ("lag-2 frame over a PER-DAY aggregate: <= #calendar-days rows; " +
          "planned twice — once under the 1-row co-moment fold, once under " +
          "the backtest scan (the q_imr_chart planned-twice precedent)")),
      "q_conformal" -> (2 ->
        ("calibration-score rank + global count over a PER-DAY aggregate: " +
          "<= #calendar-days rows (the q_runs_test pattern)")))
    val unresolved = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val wins =
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan
          flatten(plan).collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        } catch { case e: Throwable => fail(s"$name: planning failed: $e") }
      val leftover = wins.filterNot(structurallyBounded)
      documented.get(name) match {
        case Some((allowed, why)) =>
          if (leftover.size <= allowed) Nil
          else
            Seq(s"$name: ${leftover.size} unpartitioned windows exceed the $allowed " +
              s"documented ($why) — a NEW global window appeared")
        case None =>
          leftover.map(w =>
            s"$name: unpartitioned WindowExec over unbounded input " +
              s"[${w.windowExpression.map(_.sql).mkString(", ")}] " +
              s"child=${w.child.getClass.getSimpleName}")
      }
    }
    assert(unresolved.isEmpty, s"global-window whitelist violations:\n${unresolved.mkString("\n")}")
  }

  test("the window walker sees through caches: recluster's 3 exact-ntile windows are found") {
    // the r6 hole, pinned closed: zorderRecluster builds its z-filed
    // base behind .cache(), and a children-only walk sees zero
    // unpartitioned windows there while the real plan holds the 3
    // exact-mode ntile windows. The shipped QUERY additionally hides
    // everything behind an eager checkpoint, so the audit plans the
    // materialize=false form — the full build, cache included. If the
    // window count drops to 0 the walker regressed (or the base stopped
    // being cached — either way this spec must be revisited).
    val plan = graft.operators.Scale
      .zorderRecluster(spark, sf, materialize = false)
      .queryExecution
      .executedPlan
    val all = flatten(plan)
    assert(
      all.exists(_.isInstanceOf[InMemoryTableScanExec]),
      "zorderRecluster no longer plans an InMemoryTableScanExec — cache removed?")
    val wins = all.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    // a children-only walk must MISS them all — this is exactly what
    // the cache descent adds; if this starts seeing windows the cache
    // moved and the main assertion above is no longer testing descent
    val childrenOnly = {
      def walk(p: SparkPlan): Seq[SparkPlan] = {
        val extra = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
          case _                        => Nil
        }
        p +: (p.children ++ p.subqueries ++ extra).flatMap(walk)
      }
      walk(plan).collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    }
    spark.catalog.clearCache()
    assert(
      wins.size == 3,
      s"expected the 3 cached exact-ntile windows via the cache-aware walk, saw ${wins.size}")
    assert(
      childrenOnly.isEmpty,
      "the cached windows became visible to a children-only walk — cache layout changed")
  }

  test("no whitelist entry hides its plan behind a checkpoint: audit forms are RDDScan-free") {
    // the r8-r10 blind spot, closed: a lazy mid-plan localCheckpoint
    // truncates the SparkPlan to an RDDScan, so the window walker was
    // taking those whitelist entries on faith. Every operator with a
    // load-bearing mid-plan cut now exposes a cut=false audit form
    // (Lineage.cutIf); this census plans it, demands the walker can
    // see EVERYTHING (zero RDDScans), and pins the full-visibility
    // unbounded-window counts (data-shape-bounded by the documented
    // reasons in the main test; counts differ from production where
    // disabling the cut re-plans a shared subtree per consumer).
    val auditForms: Map[String, (Int, () => org.apache.spark.sql.DataFrame)] = Map(
      "text_qnorm" -> (1 ->
        (() => graft.operators.TextStats.quantileNormalize(spark, sf, cut = false))),
      "q_lift_table" -> (1 ->
        (() => graft.operators.AnalyticsExt.liftTable(spark, sf, cut = false))),
      "q_peak_concurrency" -> (1 ->
        (() => graft.operators.AnalyticsExt.peakConcurrency(spark, sf, cut = false))),
      "q_catalog_breadth" -> (1 ->
        (() => graft.operators.AnalyticsExt.catalogBreadth(spark, sf, cut = false))),
      "q_binseg_gain" -> (1 ->
        (() => graft.operators.AnalyticsExt.binsegSplit(spark, sf, cut = false))),
      // 6, not production's 2: without the cut the shared 3-window
      // exact-ntile base re-plans once per layout consumer (2 layouts
      // × (cust-ntile + price-ntile + file-ntile)) — same oracle-mode
      // windows, multiplied by consumer fan-out, the q_imr_chart
      // planned-twice precedent
      "q_curve_compare" -> (6 ->
        (() => graft.operators.Scale.curveCompare(spark, sf, cut = false))),
      "q_zorder_recluster" -> (3 ->
        (() => graft.operators.Scale.zorderRecluster(spark, sf, materialize = false))))
    val bad = auditForms.toSeq.sortBy(_._1).flatMap { case (name, (allowed, mk)) =>
      val plan = mk().queryExecution.executedPlan
      val nodes = flatten(plan)
      val rdds = nodes.count(_.getClass.getSimpleName.contains("RDDScan"))
      val leftover = nodes
        .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        .filterNot(structurallyBounded)
      (if (rdds > 0) Seq(s"$name: $rdds RDDScan nodes in the audit form — still hidden") else Nil) ++
        (if (leftover.size <= allowed) Nil
         else Seq(s"$name: ${leftover.size} unbounded windows in the audit form exceed $allowed"))
    }
    spark.catalog.clearCache()
    assert(bad.isEmpty, s"checkpoint-audit violations:\n${bad.mkString("\n")}")
  }

  test("no driver query plans a CartesianProduct or a Python UDF") {
    // structural walk (not plan.toString) so cached subtrees behind
    // InMemoryTableScanExec are checked too — the string form elides
    // them the same way the children-only walk did
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val nodes = flatten(fn(spark, sf).queryExecution.executedPlan)
        Seq(
          "CartesianProduct" -> nodes.exists(_.isInstanceOf[CartesianProductExec]),
          "PythonEval" -> nodes.exists(_.getClass.getSimpleName.contains("Python"))
        ).collect { case (k, true) => s"$name: $k" }
      } catch { case e: Throwable => Seq(s"$name: PLANNING FAILED: $e") }
    }
    assert(bad.isEmpty, s"plan discipline violations:\n${bad.mkString("\n")}")
  }
}
