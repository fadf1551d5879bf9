package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    Tables.customer(spark, dir).createOrReplaceTempView("wh_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("wh_nation")
    Tables.region(spark, dir).createOrReplaceTempView("wh_region")
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

  /** #111 Late-order priority audit (TPC-H Q4 shape): per-priority
    * count of orders in a date window that had at least one lineitem
    * shipped more than 45 days after the order date. The correlated
    * EXISTS becomes a LeftSemi join on l_orderkey (pinned by
    * `WarehouseSpec`) — the probe side is pre-filtered by the pushed
    * date-window predicate, so the semi join's build input scales
    * with the window, not the table.
    */
  def latePriority(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT o.o_orderpriority, count(*) AS order_count
      FROM wh_orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
        AND EXISTS (SELECT 1 FROM wh_lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority
    """)
  }

  /** #112 Important stock (TPC-H Q11 shape): parts whose total shipped
    * quantity exceeds 1.5× the MEAN per-part share of the global
    * shipped quantity — the group-aggregate-vs-global-scalar HAVING.
    * The scalar subquery is uncorrelated: it executes once and
    * broadcasts, never per-group, and the relative threshold keeps the
    * result non-empty at every scale factor (a fixed global fraction
    * empties as the part count grows). Quantities are integer-valued
    * doubles, so both sums and the count are order-independent — the
    * threshold division is the same double in any engine.
    */
  def importantStock(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
      FROM wh_lineitem
      GROUP BY l_partkey
      HAVING sum(l_quantity) > (SELECT 1.5 * sum(l_quantity)
                                       / count(DISTINCT l_partkey)
                                FROM wh_lineitem)
      ORDER BY total_qty DESC, l_partkey
    """)
  }

  /** #113 Customer order distribution (TPC-H Q13 shape): how many
    * customers placed 0, 1, 2, … non-urgent orders — the LEFT OUTER
    * join with a predicate in the ON clause (so order-less customers
    * survive with count 0) followed by a count-of-counts. Two
    * aggregations: the first shuffles on c_custkey, the second on the
    * tiny c_count domain. All-integer arithmetic, exact cross-engine.
    */
  def custDistribution(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM wh_customer c
        LEFT OUTER JOIN wh_orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """)
  }

  /** #114 Top revenue supplier (TPC-H Q15 shape): supplier(s) whose
    * discounted revenue equals the maximum over the per-supplier
    * revenue view — the agg-view + max-equality pattern. Revenue is
    * accumulated in integer CENTS (`floor(price·(1−disc)·100 + 0.5)`:
    * the per-row double multiply is IEEE-identical in any engine, and
    * the integer sum is order-free), so the max-equality cannot be
    * broken by float summation order — the q15 analog of the
    * `dedup_semantic` e4 trick.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      WITH rev AS (
        SELECT l_suppkey,
          CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_c
        FROM wh_lineitem GROUP BY l_suppkey)
      SELECT s.s_suppkey, s.s_name, rev.revenue_c
      FROM wh_supplier s JOIN rev ON rev.l_suppkey = s.s_suppkey
      WHERE rev.revenue_c = (SELECT max(revenue_c) FROM rev)
      ORDER BY s.s_suppkey
    """)
  }

  /** #115 Disjunctive-predicate revenue (TPC-H Q19 shape): a join
    * whose WHERE is an OR of three brand/size/quantity conjunct
    * groups. What matters is the plan: Catalyst extracts the common
    * join key, pushes the part-only disjuncts (brand, size) into the
    * part scan and the lineitem-only bounds into the lineitem scan,
    * and evaluates only the residual OR post-join — a naive engine
    * evaluates the whole disjunction as a filter AFTER a full join.
    * Revenue in exact integer cents (see [[topSupplier]]).
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT count(*) AS n_items,
        CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
          AS BIGINT) AS revenue_c
      FROM wh_lineitem l JOIN wh_part p ON p.p_partkey = l.l_partkey
      WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity BETWEEN 1 AND 20)
         OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
             AND l.l_quantity BETWEEN 10 AND 40)
         OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
             AND l.l_quantity BETWEEN 20 AND 50)
    """)
  }

  /** #116 Idle high-balance customers (TPC-H Q22 shape): customers in
    * selected market segments with an above-average account balance
    * and NO RECENT order (every testdata customer has at least one
    * lifetime order, so "idle" is a date-windowed NOT EXISTS) —
    * global-scalar threshold + anti join + in-list, aggregated per
    * segment. The average is rounded to 4dp on both engines before
    * the comparison (the winsorize bounds lesson) so a last-ulp
    * difference in float summation order cannot flip a customer
    * across the threshold.
    */
  def idleCustomers(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT c.c_mktsegment, count(*) AS numcust,
        round(sum(c.c_acctbal), 2) AS totacctbal
      FROM wh_customer c
      WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
        AND c.c_acctbal > (SELECT round(avg(c2.c_acctbal), 4)
                           FROM wh_customer c2 WHERE c2.c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM wh_orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-07-01')
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment
    """)
  }

  /** #126 Volume shipping between nation pairs (TPC-H Q7 shape): the
    * bidirectional nation-pair disjunction — revenue flowing between
    * NATION_3 and NATION_19 in either orientation, by ship year. Two
    * nation dimension joins (fixed 25 rows — broadcast), the pair OR
    * evaluated post-join, cents-exact revenue.
    */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
          AS BIGINT) AS revenue_c
      FROM wh_lineitem l
      JOIN wh_supplier s ON s.s_suppkey = l.l_suppkey
      JOIN wh_orders o ON o.o_orderkey = l.l_orderkey
      JOIN wh_customer c ON c.c_custkey = o.o_custkey
      JOIN wh_nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN wh_nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
         OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3')
      GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
      ORDER BY supp_nation, cust_nation, l_year
    """)
  }

  /** #127 Market share (TPC-H Q8 shape): one supplier nation's share
    * of revenue to ASIA customers per order year — the conditional-
    * numerator ratio. Numerator and denominator are exact integer
    * cents from ONE aggregation (no second scan); the final share is
    * one bigint/bigint division, identical IEEE in any engine,
    * rounded to 4dp.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT o_year,
        round(CAST(nation_rev_c AS DOUBLE) / total_rev_c, 4) AS mkt_share
      FROM (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
          CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
            THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS nation_rev_c,
          CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_rev_c
        FROM wh_lineitem l
        JOIN wh_orders o ON o.o_orderkey = l.l_orderkey
        JOIN wh_customer c ON c.c_custkey = o.o_custkey
        JOIN wh_nation n2 ON n2.n_nationkey = c.c_nationkey
        JOIN wh_region r ON r.r_regionkey = n2.n_regionkey
        JOIN wh_supplier s ON s.s_suppkey = l.l_suppkey
        JOIN wh_nation n1 ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY year(o.o_orderdate))
      ORDER BY o_year
    """)
  }

  /** #128 Returned-item revenue report (TPC-H Q10 shape): top-20
    * customers by revenue lost to returns ('R' lineitems) in a
    * half-year window — join + agg + deterministic top-k on exact
    * integer cents (no float-ordering ambiguity in the LIMIT).
    */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT c.c_custkey, c.c_name, n.n_name,
        CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
          AS BIGINT) AS revenue_c
      FROM wh_customer c
      JOIN wh_orders o ON o.o_custkey = c.c_custkey
      JOIN wh_lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN wh_nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-07-01'
      GROUP BY c.c_custkey, c.c_name, n.n_name
      ORDER BY revenue_c DESC, c.c_custkey
      LIMIT 20
    """)
  }

  /** #129 Shipping-priority classes (TPC-H Q12 shape): for LATE
    * shipments (>60 days after order date), counts of high-priority
    * (1-URGENT/2-HIGH) vs other orders per return flag — the
    * conditional-aggregation CASE bucket pattern, all-integer.
    */
  def shipPriorityClasses(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT l.l_returnflag,
        CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM wh_lineitem l JOIN wh_orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      GROUP BY l.l_returnflag
      ORDER BY l.l_returnflag
    """)
  }

  /** #130 Promotion revenue share (TPC-H Q14 shape): PROMO parts'
    * percentage of a year's revenue — conditional numerator over one
    * join+agg, exact cents, one final double division rounded 4dp.
    */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT round(100.0 * CAST(promo_c AS DOUBLE) / total_c, 4) AS promo_share
      FROM (
        SELECT
          CAST(sum(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS promo_c,
          CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_c
        FROM wh_lineitem l JOIN wh_part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
          AND l.l_shipdate < TIMESTAMP '1999-01-01')
    """)
  }

  /** #139 Forecast revenue change (TPC-H Q6 shape): the pure
    * predicate-pushdown aggregate — no join at all; date window +
    * discount band + quantity cap must ALL reach the parquet scan,
    * and the whole query is one map-side-combined single-row
    * aggregation. Revenue = price × discount in exact integer cents.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT count(*) AS n_items,
        CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT))
          AS BIGINT) AS revenue_c
      FROM wh_lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    """)
  }

  /** #140 Product-type profit (TPC-H Q9 shape): per supplier-nation
    * per order-year profit across the full join breadth (lineitem ×
    * orders × supplier × nation × part). The schema has no
    * ps_supplycost, so cost is modeled as 80% of the part's retail
    * price per unit — same two-measure profit arithmetic, in exact
    * integer cents on both terms.
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
               - CAST(floor(p.p_retailprice * l.l_quantity * 0.8 * 100 + 0.5) AS BIGINT))
          AS BIGINT) AS profit_c
      FROM wh_lineitem l
      JOIN wh_orders o ON o.o_orderkey = l.l_orderkey
      JOIN wh_supplier s ON s.s_suppkey = l.l_suppkey
      JOIN wh_nation n ON n.n_nationkey = s.s_nationkey
      JOIN wh_part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type IN ('ECONOMY', 'STANDARD')
      GROUP BY n.n_name, year(o.o_orderdate)
      ORDER BY nation, o_year
    """)
  }

  /** #131 Supplier relationship count (TPC-H Q16 shape): how many
    * distinct suppliers serve each small (brand, type, size) part
    * bucket, EXCLUDING a blocklist via NOT IN — the null-free NOT IN
    * compiles to a LeftAnti join (`WarehouseSpec` pins it), never a
    * per-row subquery. count(DISTINCT) after the anti join.
    */
  def supplierRelationship(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT p.p_brand, p.p_type, p.p_size,
        count(DISTINCT l.l_suppkey) AS supplier_cnt
      FROM wh_lineitem l JOIN wh_part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand <> 'Brand#1'
        AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        AND l.l_suppkey NOT IN (SELECT s_suppkey FROM wh_supplier
                                WHERE s_suppkey % 10 = 0)
      GROUP BY p.p_brand, p.p_type, p.p_size
      ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
      LIMIT 20
    """)
  }

  /** #132 Large-volume customers (TPC-H Q18 shape): orders whose
    * total quantity clears a threshold, found via IN over a grouped
    * HAVING — the semi-join-on-aggregate pattern. Integer quantities
    * make the threshold exact; top-20 on (qty, orderkey).
    */
  def largeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql("""
      SELECT c.c_custkey, c.c_name, o.o_orderkey,
        CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
      FROM wh_customer c
      JOIN wh_orders o ON o.o_custkey = c.c_custkey
      JOIN wh_lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM wh_lineitem l2
                             GROUP BY l2.l_orderkey
                             HAVING sum(l2.l_quantity) > 300)
      GROUP BY c.c_custkey, c.c_name, o.o_orderkey
      ORDER BY total_qty DESC, o.o_orderkey
      LIMIT 20
    """)
  }

  /** #177 RFM segmentation: per customer, Recency (days since last
    * order, measured from the corpus max date), Frequency (lifetime
    * order count) and Monetary (lifetime spend in cents), each scored
    * into within-NATION quintiles — the classic marketing segmentation
    * (555 = best-of-market whales, 111 = churned one-timers), scored
    * within market because cross-market balance/price levels aren't
    * comparable.
    *
    * All-integer: metrics are exact BIGINTs, quintile = ((rn−1)·5)
    * div n + 1 under a (metric, custkey) total order — the #156
    * rank-defined banding, zero percentile interpolation. Recency
    * scores INVERTED (most recent = 5). Windows partition BY NATION —
    * bounded, no global ordering (the #58 percent-rank discipline);
    * the reference date is one broadcast scalar.
    */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
    val refDate = o.agg(max(to_date(col("o_orderdate"))).as("ref"))
    val per = o
      .groupBy(col("o_custkey"))
      .agg(
        max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)")
          .as("monetary_c"))
    val base = per
      .crossJoin(broadcast(refDate))
      .join(
        Tables.customer(spark, dir).select(
          col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("c_nationkey")),
        "o_custkey")
      .withColumn("recency_days", datediff(col("ref"), col("last_order")).cast("long"))
    val wN = Window.partitionBy("c_nationkey")
    base
      .withColumn("n_nat", count(lit(1)).over(wN))
      .withColumn(
        "rn_r",
        row_number()
          .over(wN.orderBy(col("recency_days").desc, col("o_custkey")))
          .cast("long"))
      .withColumn(
        "rn_f",
        row_number().over(wN.orderBy(col("frequency"), col("o_custkey"))).cast("long"))
      .withColumn(
        "rn_m",
        row_number().over(wN.orderBy(col("monetary_c"), col("o_custkey"))).cast("long"))
      .withColumn("r_score", expr("((rn_r - 1) * 5) div n_nat + 1"))
      .withColumn("f_score", expr("((rn_f - 1) * 5) div n_nat + 1"))
      .withColumn("m_score", expr("((rn_m - 1) * 5) div n_nat + 1"))
      .select(
        col("o_custkey").as("c_custkey"),
        col("c_nationkey"),
        col("recency_days"),
        col("frequency"),
        col("monetary_c"),
        col("r_score"),
        col("f_score"),
        col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm_code"))
  }

  /** #212 FIFO inventory allocation: match each part's outflows to
    * its inflows in first-in-first-out order — the cost-basis /
    * lot-matching operator (COGS attribution, tax-lot accounting)
    * that looks inherently sequential but is EXACTLY an interval
    * join: each movement occupies the cumulative-quantity range
    * [cum_before, cum_after) on its side, and FIFO matches are
    * precisely the overlaps of inflow and outflow ranges, with
    * matched qty = min(ends) − max(starts). Inflows = even-orderkey
    * line items, outflows = odd (the synthetic in/out split);
    * quantities are exact integers.
    *
    * Shape: one per-(part, side) cumsum window + ONE part equi-join
    * with the overlap predicate — fan-out is the true match count
    * (each inflow overlaps a contiguous run of outflows), never a
    * per-part cross product. All exchanges on `l_partkey`.
    */
  def fifoAllocation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables
      .lineitem(spark, dir)
      .select(
        col("l_partkey"),
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_shipdate"),
        col("l_quantity").cast("long").as("qty"))
    def ranged(side: DataFrame): DataFrame = {
      val w = Window
        .partitionBy("l_partkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      side
        .withColumn("cum_to", sum("qty").over(w))
        .withColumn("cum_from", col("cum_to") - col("qty"))
    }
    val inflows = ranged(li.filter(col("l_orderkey") % 2 === 0)).select(
      col("l_partkey"),
      col("l_orderkey").as("in_order"),
      col("l_linenumber").as("in_line"),
      col("cum_from").as("in_from"),
      col("cum_to").as("in_to"))
    val outflows = ranged(li.filter(col("l_orderkey") % 2 === 1)).select(
      col("l_partkey"),
      col("l_orderkey").as("out_order"),
      col("l_linenumber").as("out_line"),
      col("cum_from").as("out_from"),
      col("cum_to").as("out_to"))
    inflows
      .join(
        outflows,
        Seq("l_partkey"))
      .filter(col("in_from") < col("out_to") && col("out_from") < col("in_to"))
      .select(
        col("l_partkey"),
        col("in_order"),
        col("in_line"),
        col("out_order"),
        col("out_line"),
        (least(col("in_to"), col("out_to")) -
          greatest(col("in_from"), col("out_from"))).as("qty_matched"))
  }

  /** #216 Cohort LTV curve: for each acquisition cohort (month of a
    * customer's FIRST order), cumulative revenue by cohort age in
    * months — the lifetime-value triangle marketing runs payback
    * math on; #87's retention triangle counts the customers, this
    * accumulates what they spend. Whole-cent BIGINTs; month index is
    * integer year·12+month so age subtraction is exact; the cumsum
    * runs per cohort over the AGE dimension (calendar-bounded).
    */
  def ltvCurve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val firstM = orders.groupBy("o_custkey").agg(min("m").as("cohort_m"))
    val aged = orders
      .join(firstM, "o_custkey")
      .select(
        col("cohort_m"),
        (col("m") - col("cohort_m")).as("age_months"),
        col("o_custkey"),
        col("cents"))
    val cells = aged
      .groupBy("cohort_m", "age_months")
      .agg(
        countDistinct("o_custkey").as("n_active"),
        sum("cents").as("rev_cents"))
    cells
      .withColumn(
        "cum_rev_cents",
        sum("rev_cents").over(
          Window
            .partitionBy("cohort_m")
            .orderBy("age_months")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        col("cohort_m").cast("long").as("cohort_m"),
        col("age_months").cast("long").as("age_months"),
        col("n_active"),
        col("rev_cents"),
        col("cum_rev_cents"))
  }

  /** #213 Eventually-follows matrix (process mining): for every
    * ordered pair of event types (a, b), how many users have SOME
    * a-event strictly before SOME b-event — the directly/eventually-
    * follows relation process-discovery algorithms (alpha miner,
    * heuristics miner) start from; #174's transition matrix counts
    * ADJACENT steps, this counts reachability.
    *
    * Shape: one (user, type) min/max-ts aggregate, a per-user
    * type-pair join (≤ |types|² fan per user, alphabet-bounded), one
    * counting aggregate. The rate denominator is users having both
    * types at all.
    */
  def eventuallyFollows(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min("us").as("first_ts"), max("us").as("last_ts"))
    val a = spans.select(
      col("user_id"),
      col("event_type").as("type_a"),
      col("first_ts").as("a_first"))
    val b = spans.select(
      col("user_id"),
      col("event_type").as("type_b"),
      col("last_ts").as("b_last"))
    a.join(b, Seq("user_id"))
      .filter(col("type_a") =!= col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(
        count(lit(1)).as("n_users_both"),
        sum(when(col("a_first") < col("b_last"), 1L).otherwise(0L)).as("n_follows"))
      .select(
        col("type_a"),
        col("type_b"),
        col("n_users_both"),
        col("n_follows"),
        expr("(n_follows * 1000000) div n_users_both").as("follow_rate_e6"))
  }

  /** #246 Herfindahl-Hirschman market concentration: per supplier
    * nation, HHI = Σ shareᵢ² of each supplier's revenue share plus
    * CR1 (largest single share) and the effective competitor count —
    * the antitrust-grade concentration screen (DOJ thresholds: HHI
    * > 0.25 ≡ 250 000 on the e6 grid = highly concentrated) that
    * tells a sourcing strategy whether a nation's supply base is a
    * market or a monopoly. #180's Gini measures inequality of the
    * same distribution; HHI measures CONCENTRATION — a two-supplier
    * 50/50 nation is perfectly equal (Gini 0) yet dangerously
    * concentrated (HHI 0.5), which is why both screens exist.
    *
    * Single-quotient exactness: HHI·10⁶ = (Σ revᵢ²)·10⁶ div (Σrevᵢ)²
    * — shares are never materialized, so no per-supplier rounding
    * accumulates. Cross products in DECIMAL(38,0) ↔ HUGEINT (revᵢ²
    * crosses 2⁶³ at ~$10⁸ per supplier-nation — far below 100 TB).
    * Two partial-agg passes (supplier rollup, nation rollup) joined
    * to `nation` — linear, no windows.
    */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    val bySupp = Tables
      .lineitem(spark, dir)
      .select(
        col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("l_suppkey")
      .agg(sum("cents").as("rev"))
      .join(
        Tables.supplier(spark, dir).select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
        "l_suppkey")
    bySupp
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum("rev").as("total_cents"),
        sum(expr("CAST(rev AS DECIMAL(38,0)) * rev")).as("sq"),
        max("rev").as("max_rev"))
      .join(
        Tables.nation(spark, dir).select(col("n_nationkey").as("s_nationkey"), col("n_name")),
        "s_nationkey")
      .select(
        col("s_nationkey").cast("long").as("nationkey"),
        col("n_name"),
        col("n_suppliers"),
        col("total_cents"),
        expr("""CAST((sq * 1000000)
                 div (CAST(total_cents AS DECIMAL(38,0)) * total_cents) AS BIGINT)""")
          .as("hhi_e6"),
        expr("CAST((max_rev * 1000000) div total_cents AS BIGINT)").as("cr1_e6"))
  }

  /** #352 Supplier return-rate Wilson ranking: suppliers ranked by
    * the LOWER Wilson bound of their return rate (l_returnflag = 'R')
    * — the "sort by bad reviews properly" classic: a raw rate ranks a
    * 1-for-2 supplier above a 40-for-100 one; the Wilson bound prices
    * the sample size in. z² = 4 (the ~95.4% two-sided point) keeps
    * the whole bound rational: lb = (r + 2 − 2√(r(n−r)/n + 1))/(n+4);
    * the √ is the #226 one-ulp-clamp isqrt on the e6 grid (inner·10⁶
    * stays far inside the double-exactness domain at any SF; the
    * bound carries e3 √-precision, documented). Top-25 by (lb desc,
    * suppkey) rides WindowGroupLimit.
    */
  def returnWilson(spark: SparkSession, dir: String, topK: Int = 25): DataFrame = {
    val per = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum((col("l_returnflag") === "R").cast("long")).as("n_returns"))
    val scored = per
      .withColumn(
        "inner_e6",
        expr("""CAST(n_returns AS DECIMAL(38,0)) * (n_lines - n_returns) * 1000000
                 div n_lines + 1000000"""))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(inner_e6 AS DOUBLE))) AS BIGINT)"))
      .withColumn(
        "sq_e3",
        expr("""s0 + (CASE WHEN (CAST(s0 AS DECIMAL(38,0)) + 1) * (s0 + 1) <= inner_e6 THEN 1 ELSE 0 END)
                   - (CASE WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > inner_e6 THEN 1 ELSE 0 END)"""))
      .withColumn(
        "wilson_lb_e6",
        expr("CAST(((n_returns + 2) * 1000000 - 2 * sq_e3 * 1000) div (n_lines + 4) AS BIGINT)"))
      .withColumn("rate_e6", expr("CAST(n_returns * 1000000 div n_lines AS BIGINT)"))
    scored
      .orderBy(col("wilson_lb_e6").desc, col("suppkey"))
      .limit(topK)
      .withColumn(
        "rank",
        row_number()
          .over(Window.orderBy(col("wilson_lb_e6").desc, col("suppkey")))
          .cast("long"))
      .select(
        col("rank"),
        col("suppkey"),
        col("n_lines"),
        col("n_returns"),
        col("rate_e6"),
        col("wilson_lb_e6"))
  }

  /** Promise window (days from order date) a line must ship within to
    * count on-time — shared with the oracle; the testdata carries no
    * commit date, so the SLA is order-date-anchored (the same
    * convention #282's ship-delay and Q4's 45-day lateness use).
    */
  val OtifSlaDays = 30

  /** #391 Backlog aging waterfall: every order NOT yet finalized
    * (status ≠ 'F'), bucketed by age at the corpus as-of date (months
    * since order date: 0–5, 6–11, 12–23, 24+) × status, with counts
    * and open value — the AR/fulfillment aging table every ops review
    * opens with (#111 counts late-line orders in one year; this ages
    * the ENTIRE open book). As-of = max order date, a 1-row
    * broadcast; ages on the exact integer month grid; one aggregate,
    * ≤ statuses×4 output rows, no windows.
    */
  def backlogAging(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_orderstatus"),
        expr(
          "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
    val asof = o.agg(max("m").as("asof_m"))
    o.filter(col("o_orderstatus") =!= "F")
      .crossJoin(broadcast(asof))
      .select(
        col("o_orderstatus"),
        col("c"),
        expr("""CASE WHEN asof_m - m < 6 THEN '0-5'
                     WHEN asof_m - m < 12 THEN '6-11'
                     WHEN asof_m - m < 24 THEN '12-23'
                     ELSE '24+' END""").as("age_bucket"))
      .groupBy("o_orderstatus", "age_bucket")
      .agg(count(lit(1)).as("n_orders"), sum("c").as("open_value_c"))
  }

  /** #392 Whale-dependency trend: each month's revenue share held by
    * the all-time top-10 customers — the key-account concentration
    * TREND (#382's CR4/CR8 ranks each month's own top accounts, so a
    * rotating cast can hide rising dependency on the same whales;
    * this FIXES the cohort — the number a CFO tracks before renewal
    * season). Top-10 by lifetime revenue rides a rank-limited global
    * window (WindowGroupLimit, the #13/#380 shape) and is then a
    * 10-row broadcast; one (month) aggregate each for whale and
    * total revenue; share a truncating e6 quotient through
    * DECIMAL(38,0). ≤#months rows, linear.
    */
  def whaleDependency(spark: SparkSession, dir: String, topK: Int = 10): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        expr(
          "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
    // whale pick needs no rank column at all: pure TakeOrdered
    val whales = o
      .groupBy("o_custkey")
      .agg(sum("c").as("rev"))
      .orderBy(col("rev").desc, col("o_custkey"))
      .limit(topK)
      .select("o_custkey")
    val whaleByM = o
      .join(broadcast(whales), Seq("o_custkey"), "left_semi")
      .groupBy("m")
      .agg(count(lit(1)).as("n_whale_orders"), sum("c").as("whale_c"))
    o.groupBy("m")
      .agg(count(lit(1)).as("n_orders"), sum("c").as("total_c"))
      .join(whaleByM, Seq("m"), "left")
      .na
      .fill(0L, Seq("n_whale_orders", "whale_c"))
      .select(
        col("m"),
        col("n_orders"),
        col("total_c"),
        col("n_whale_orders"),
        col("whale_c"),
        expr("CAST(CAST(whale_c AS DECIMAL(38,0)) * 1000000 div total_c AS BIGINT)")
          .as("whale_share_e6"))
  }

  /** #390 OTIF (on-time-in-full) monthly trend: the fraction of
    * orders whose EVERY line shipped within [[OtifSlaDays]] of the
    * order date — the supply-chain service KPI (#282's ship-delay
    * percentiles measure HOW late lines run; OTIF measures how often
    * the WHOLE order kept its promise, the number contracts and
    * penalties bind to; the all-lines conjunction is what per-line
    * rates silently overstate). One order-line join, one per-order
    * min fold of the on-time flag, one ≤#months aggregate; rate a
    * truncating e6 quotient. Linear, no windows.
    */
  def otif(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(
        Tables
          .orders(spark, dir)
          .select(
            col("o_orderkey").as("l_orderkey"),
            col("o_orderdate"),
            expr(
              "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
              .as("m")),
        "l_orderkey")
      .select(
        col("l_orderkey"),
        col("m"),
        expr(s"""CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))
                 <= $OtifSlaDays AS LONG)""").as("ok"))
      .groupBy("l_orderkey", "m")
      .agg(min("ok").as("all_ok"), count(lit(1)).as("n_lines"))
      .groupBy("m")
      .agg(
        count(lit(1)).as("n_orders"),
        sum("all_ok").as("n_otif"),
        sum("n_lines").as("n_lines"))
      .select(
        col("m"),
        col("n_orders"),
        col("n_otif"),
        col("n_lines"),
        expr("CAST(n_otif * 1000000 div n_orders AS BIGINT)").as("otif_e6"))
}
