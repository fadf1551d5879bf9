package graft

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

  test("every unpartitioned window rides a bounded input: rank-limited, shard-carry, or scalar") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // walk THROUGH adaptive wrappers: with AQE on, the executed plan is
    // an AdaptiveSparkPlanExec whose children don't show via .collect
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case _                        => Nil
      }
      p +: (p.children ++ p.subqueries ++ extra).flatMap(flatten)
    }
    // An unpartitioned WindowExec moves ALL rows to one partition — a
    // 100 TB scale-killer unless its input is provably bounded. The
    // whitelist, checked structurally on the window's child subtree:
    //   rank-limited — Spark inserted a WindowGroupLimit (a top-k
    //     rank filter prunes each task's input before the exchange);
    //   topk-limited — a TakeOrderedAndProject/limit already cut the
    //     input to k rows before the window;
    //   shard-carry — the input is an aggregate keyed ONLY by shard-
    //     like columns (the hierarchical-rank offsets frame:
    //     <= nShards rows by construction);
    //   scalar — the input contains a global (groupless) aggregate,
    //     so exactly one row reaches the window.
    // Plus three NAMED exceptions whose bound is data-shape, not plan
    // structure — each carries its reason and an exact instance count
    // so a new global window in those queries still fails.
    // Anything else fails by name: a future global window over an
    // unbounded frame must either restructure or extend this list.
    val shardLike = Set("shard", "shard2", "bshard", "rshard")
    val documented: Map[String, (Int, String)] = Map(
      "cdc_balance_curve" -> (1 ->
        "running balance over a PER-DAY aggregate: <= #calendar-days rows"),
      "q_bootstrap_ci" -> (1 ->
        "replica-mean ranking over a PER-REPLICA aggregate: exactly B=100 rows"),
      "q_zorder_stats" -> (3 ->
        ("exact-ntile oracle mode by design; the 100 TB path is " +
          "zorderStats(scaleMode=true), pinned window-free by ScaleSpec")),
      "q_kaplan_meier" -> (1 ->
        "at-risk suffix sum over a PER-LIFETIME-MONTH aggregate: <= #calendar-months rows"),
      "q_nelson_aalen" -> (1 ->
        "the shared KM at-risk suffix sum: <= #calendar-months rows (cum hazard is an array fold)"),
      "q_logrank" -> (1 ->
        "both group at-risk suffix sums share one frame over the <= #calendar-months step table"),
      "q_lift_table" -> (1 ->
        "cumulative gains over a PER-DECILE aggregate: exactly 10 rows"))
    val unresolved = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val wins =
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan
          flatten(plan).collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        } catch { case e: Throwable => fail(s"$name: planning failed: $e") }
      val leftover = wins.filterNot { w =>
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
              _.references.toSeq.forall(r => shardLike(r.name.toLowerCase)))
          case _ => false
        }
        rankLimited || topkLimited || scalarInput || shardCarry
      }
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

  test("no driver query plans a CartesianProduct or a Python UDF") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: $e" }
      Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BatchEvalPython" -> plan.contains("BatchEvalPython"),
        "PLANNING FAILED" -> plan.startsWith("PLANNING FAILED")
      ).collect { case (k, true) => s"$name: $k" }
    }
    assert(bad.isEmpty, s"plan discipline violations:\n${bad.mkString("\n")}")
  }
}
