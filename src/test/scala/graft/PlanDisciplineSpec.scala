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
