package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Correlated-subquery warehouse depth — the TPC-H Q2/Q17/Q21 query
  * shapes a reporting user hits weekly, adapted to the testdata
  * schema (no partsupp / commitdate, so "cost" is the observed unit
  * price in lineitem and "late" is shipping >60 days after the order
  * date).
  *
  * These are deliberately written as SQL text WITH correlated
  * subqueries and handed to Catalyst: the point (and what
  * `WarehouseSpec` pins) is that the optimizer decorrelates them into
  * aggregate + join plans — a per-row re-execution of the subquery
  * would be the 100 TB scale-killer. Q2's scalar subquery becomes a
  * min-aggregate joined on partkey; Q21's EXISTS / NOT EXISTS chain
  * becomes LeftSemi / LeftAnti joins, all shuffle-partitioned on the
  * correlation key.
  */
object Warehouse {

  /** Register the warehouse tables once per (session, dir) under
    * stable names the SQL text references.
    */
  private def views(spark: SparkSession, dir: String): Unit = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("wh_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("wh_part")
    Tables.orders(spark, dir).createOrReplaceTempView("wh_orders")
    Tables.supplier(spark, dir).createOrReplaceTempView("wh_supplier")
  }

  /** #100 Min-cost supplier per part (TPC-H Q2 shape): for each small
    * part, the supplier(s) selling it at the minimum observed unit
    * price — the correlated scalar-subquery-per-group pattern.
    * Catalyst decorrelates `(SELECT min(..) WHERE partkey = outer)`
    * into one aggregate over the CTE joined back on partkey. Unit
    * prices are 6dp-rounded BEFORE the min-equality so the
    * cross-engine comparison happens on the same grid the oracle
    * computes (the Scale.winsorize lesson).
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      WITH ps AS (
        SELECT l_partkey, l_suppkey,
          round(avg(l_extendedprice / l_quantity), 6) AS unit_price
        FROM wh_lineitem GROUP BY l_partkey, l_suppkey)
      SELECT p.p_partkey, p.p_brand, ps.l_suppkey AS s_suppkey, ps.unit_price
      FROM wh_part p JOIN ps ON ps.l_partkey = p.p_partkey
      WHERE p.p_size <= 10
        AND ps.unit_price = (SELECT min(ps2.unit_price) FROM ps ps2
                             WHERE ps2.l_partkey = p.p_partkey)
    """)
  }

  /** #101 Small-quantity revenue (TPC-H Q17 shape): revenue from
    * lineitems of one brand whose quantity is below 20% of that
    * part's average — the correlated avg-per-key comparison. The
    * comparison is EXACT cross-engine: quantities are integer-valued
    * doubles, so the per-part sum (and hence avg) is the same double
    * in any summation order.
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM wh_lineitem l JOIN wh_part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#1'
        AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM wh_lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
    """)
  }

  /** #104 Dominant supplier (TPC-H Q20 shape): suppliers shipping more
    * than 15% of some PROMO part's total quantity — a nested-IN whose
    * inner aggregate carries its own correlated scalar subquery in the
    * HAVING clause. Catalyst decorrelates both levels: the IN becomes
    * a LeftSemi join, the HAVING threshold an aggregate joined back on
    * partkey. Quantities are integer-valued, so the 0.15·total
    * comparison is exact cross-engine.
    */
  def dominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT s.s_suppkey, s.s_name
      FROM wh_supplier s
      WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM wh_lineitem l JOIN wh_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
        GROUP BY l.l_partkey, l.l_suppkey
        HAVING sum(l.l_quantity) > 0.15 * (SELECT sum(l2.l_quantity)
                                           FROM wh_lineitem l2
                                           WHERE l2.l_partkey = l.l_partkey))
      ORDER BY s.s_suppkey
    """)
  }

  /** #102 Waiting suppliers (TPC-H Q21 shape): suppliers who were the
    * ONLY late shipper (>60 days after order date) in a multi-supplier
    * order — the EXISTS + NOT EXISTS chain. The inner lateness check
    * joins orders itself so the only correlation is the orderkey
    * equality, which Catalyst turns into LeftSemi/LeftAnti shuffle
    * joins on l_orderkey. Top-20 by a deterministic total order.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT s.s_name, count(*) AS numwait
      FROM wh_supplier s
      JOIN wh_lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN wh_orders o ON o.o_orderkey = l1.l_orderkey
      WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM wh_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM wh_lineitem l3
                        JOIN wh_orders o3 ON o3.o_orderkey = l3.l_orderkey
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      GROUP BY s.s_name
      ORDER BY numwait DESC, s.s_name
      LIMIT 20
    """)
  }
}
