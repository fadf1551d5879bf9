package graft

import graft.operators.Warehouse

/** The decorrelation contract of the correlated-subquery warehouse
  * queries: Catalyst must rewrite every correlated subquery into an
  * aggregate + join (LeftSemi/LeftAnti for the EXISTS chain) — a
  * surviving per-row subquery in the physical plan would re-execute
  * the inner query once per outer row, the 100 TB scale-killer this
  * family exists to catch.
  */
class WarehouseSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: min-cost supplier decorrelates the scalar subquery into agg + join") {
    val df = Warehouse.minCostSupplier(spark, sf)
    val plan = physical(df)
    assert(!plan.contains("ScalarSubquery"), s"per-row scalar subquery survived:\n$plan")
    assert(plan.contains("Join"), "expected the decorrelated join")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the picked supplier's price really is the min for its part
    import org.apache.spark.sql.functions._
    val mins = df.groupBy("p_partkey").agg(countDistinct("unit_price").as("n"))
    assert(mins.filter(col("n") > 1).count() == 0)
  }

  test("q17: small-quantity revenue decorrelates the avg-per-key comparison") {
    val df = Warehouse.smallQtyRevenue(spark, sf)
    val plan = physical(df)
    assert(!plan.contains("ScalarSubquery"), s"per-row scalar subquery survived:\n$plan")
    val rows = df.collect()
    assert(rows.length == 1)
    assert(!rows.head.isNullAt(0) && rows.head.getDouble(0) > 0)
  }

  test("q20: nested IN with correlated HAVING decorrelates fully") {
    val df = Warehouse.dominantSupplier(spark, sf)
    val plan = physical(df)
    assert(!plan.contains("ScalarSubquery"), s"per-row scalar subquery survived:\n$plan")
    assert(plan.contains("LeftSemi"), s"IN did not become a semi join:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("q21: EXISTS / NOT EXISTS chain becomes LeftSemi / LeftAnti joins") {
    val df = Warehouse.waitingSuppliers(spark, sf)
    val plan = physical(df)
    assert(plan.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS did not become an anti join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // numwait descending with s_name tiebreak — deterministic top-20
    val nw = rows.map(_.getLong(1))
    assert(nw.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
}
