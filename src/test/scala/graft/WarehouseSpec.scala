package graft

import org.apache.spark.sql.functions._

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

  test("q4: EXISTS becomes a LeftSemi join and the date window is pushed") {
    val df = Warehouse.latePriority(spark, sf)
    val plan = physical(df)
    assert(plan.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$plan")
    // the date-window filter must reach the orders scan, not sit post-join
    assert(
      plan.contains("PushedFilters: [IsNotNull(o_orderdate)") ||
        plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date window not pushed into the orders scan:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5)
  }

  test("q11: group-vs-global HAVING keeps one uncorrelated scalar, no cartesian") {
    val df = Warehouse.importantStock(spark, sf)
    val plan = physical(df)
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // threshold honored: every returned part clears 1.5× the mean per-part share
    import org.apache.spark.sql.functions._
    val g = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(sum("l_quantity").as("s"), countDistinct("l_partkey").as("n")).head
    val threshold = 1.5 * g.getDouble(0) / g.getLong(1)
    assert(rows.forall(_.getLong(1) > threshold))
  }

  test("q13: order-less customers survive the outer join with count 0") {
    val df = Warehouse.custDistribution(spark, sf)
    val plan = physical(df)
    assert(plan.contains("LeftOuter"), s"expected a left outer join:\n$plan")
    val rows = df.collect()
    // distribution covers all customers exactly once
    val nCust = rows.map(_.getLong(1)).sum
    val expected = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(nCust == expected, s"distribution covers $nCust of $expected customers")
  }

  test("q15: integer-cents revenue makes the max-equality exact") {
    val df = Warehouse.topSupplier(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every returned supplier carries the same (maximal) revenue
    assert(rows.map(_.getLong(2)).distinct.length == 1)
  }

  test("q19: part-side disjuncts are pushed into the part scan") {
    val df = Warehouse.disjunctiveRevenue(spark, sf)
    val plan = physical(df)
    // Catalyst extracts brand IN (...) / size bounds as a scan-level
    // filter on part — the Or must appear under a Filter over the part
    // scan, not only post-join
    assert(
      plan.contains("Brand#1") && plan.contains("Brand#3"),
      s"brand disjuncts missing from the plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    val row = df.collect().head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
  }

  test("q22: NOT EXISTS becomes LeftAnti with the global threshold applied once") {
    val df = Warehouse.idleCustomers(spark, sf)
    val plan = physical(df)
    assert(plan.contains("LeftAnti"), s"NOT EXISTS did not become an anti join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 3)
    // idle means idle: the segment counts cannot exceed the customers
    // with no order on/after the cutoff
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val recent = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") >= lit("2000-07-01").cast("timestamp"))
    val idle = cust.join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
    assert(rows.map(_.getLong(1)).sum <= idle.count())
  }

  test("q7: both pair orientations present, revenue positive") {
    val rows = Warehouse.volumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).distinct
    assert(pairs.contains(("NATION_3", "NATION_19")) && pairs.contains(("NATION_19", "NATION_3")))
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("q8: market shares are valid ratios per year") {
    val rows = Warehouse.marketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("q16: NOT IN blocklist becomes an anti join, no blocked supplier survives") {
    val df = Warehouse.supplierRelationship(spark, sf)
    val plan = physical(df)
    assert(plan.contains("LeftAnti"), s"NOT IN did not become an anti join:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("q18: IN over grouped HAVING becomes a semi join, threshold honored") {
    val df = Warehouse.largeVolumeCustomers(spark, sf)
    val plan = physical(df)
    assert(plan.contains("LeftSemi"), s"IN did not become a semi join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(3) > 300))
  }

  test("q6: all three predicates reach the lineitem scan, no join anywhere") {
    val df = Warehouse.forecastRevenue(spark, sf)
    val plan = physical(df)
    assert(!plan.contains("Join"), s"the no-join query planned a join:\n$plan")
    // the PushedFilters list is elided in toString, so assert the
    // scan-level pushdown prefix plus all three columns in the
    // data-filter chain above the scan
    assert(
      plan.contains("PushedFilters: [IsNotNull(l_shipdate)") &&
        plan.contains("(l_discount") && plan.contains("(l_quantity"),
      s"predicates not pushed into the scan:\n$plan")
    val row = df.collect().head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
  }

  test("q9: full join breadth, profit grouped per nation-year") {
    val rows = Warehouse.productProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    // deterministic ordering: (nation, year) ascending
    val keys = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.sliding(2).forall(p =>
      p.length < 2 || p(0)._1 < p(1)._1 || (p(0)._1 == p(1)._1 && p(0)._2 < p(1)._2)))
  }

  test("rfm: one row per ordering customer, quintiles balanced within nation") {
    import org.apache.spark.sql.functions._
    val r = Warehouse.rfm(spark, sf).cache()
    val customersWithOrders = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(r.count() == customersWithOrders)
    // scores in range, code consistent
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(r.filter(col(c) < 1 || col(c) > 5).count() == 0, c)
    assert(r.filter(
      col("rfm_code") =!= col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .count() == 0)
    assert(r.filter(col("recency_days") < 0).count() == 0)
    // rank-defined quintiles: populations within a nation differ by <= 1
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val per = r.groupBy("c_nationkey", c).count()
        .groupBy("c_nationkey").agg((max("count") - min("count")).as("spread"))
      assert(per.filter(col("spread") > 1).count() == 0, s"$c unbalanced")
    }
    // the top spender of each nation with >= 5 customers scores m=5
    // (smaller nations can't populate the top band: ((n-1)*5) div n + 1 < 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey").orderBy(col("monetary_c").desc, col("c_custkey").desc)
    val top = r
      .withColumn("n_nat", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("c_nationkey")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("n_nat") >= 5)
    assert(top.filter(col("m_score") =!= 5).count() == 0)
    val again = Warehouse.rfm(spark, sf)
    assert(r.exceptAll(again).count() == 0)
  }

  test("fifo allocation: matches replay a sequential FIFO simulation") {
    val alloc = Warehouse.fifoAllocation(spark, sf).cache()
    // every match is positive and bounded by both movements' quantities
    assert(alloc.filter(col("qty_matched") <= 0).count() == 0)
    // per part: matched volume equals min(total inflow, total outflow)
    val li = Tables
      .lineitem(spark, sf)
      .selectExpr(
        "l_partkey", "l_orderkey", "CAST(l_linenumber AS BIGINT) AS l_linenumber",
        "l_shipdate", "CAST(l_quantity AS BIGINT) AS qty")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.get(3).toString, r.getLong(4)))
    val byPart = li.groupBy(_._1)
    val gotPerPart = alloc
      .groupBy("l_partkey")
      .agg(sum("qty_matched").as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    byPart.foreach { case (pk, rows) =>
      val inQ = rows.filter(_._2 % 2 == 0).map(_._5).sum
      val outQ = rows.filter(_._2 % 2 == 1).map(_._5).sum
      val expTotal = math.min(inQ, outQ)
      assert(gotPerPart.getOrElse(pk, 0L) == expTotal, s"part $pk volume")
    }
    // sequential FIFO replay on the heaviest part: same pair->qty map
    val pk = gotPerPart.maxBy(_._2)._1
    val rows = byPart(pk)
    def queue(side: Long) = rows
      .filter(_._2 % 2 == side)
      .sortBy(r => (r._4, r._2, r._3))
      .map(r => ((r._2, r._3), r._5))
      .toBuffer
    val ins = queue(0); val outs = queue(1)
    val exp = collection.mutable.Map.empty[(Long, Long, Long, Long), Long]
    while (ins.nonEmpty && outs.nonEmpty) {
      val ((io, il), iq) = ins.head
      val ((oo, ol), oq) = outs.head
      val m = math.min(iq, oq)
      exp((io, il, oo, ol)) = m
      if (iq == m) ins.remove(0) else ins(0) = ((io, il), iq - m)
      if (oq == m) outs.remove(0) else outs(0) = ((oo, ol), oq - m)
    }
    val gotPk = alloc
      .filter(col("l_partkey") === pk)
      .collect()
      .map(r => ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getLong(5)))
      .toMap
    assert(gotPk == exp.toMap, s"part $pk FIFO pairing")
    alloc.unpersist()
  }

  test("ltv curve: cumulative revenue replays and conserves total spend") {
    val c = Warehouse.ltvCurve(spark, sf).cache()
    val rows = c
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val orders = Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val first = orders.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
    val cells = orders
      .map { case (k, m, cents) => ((first(k).toLong, (m - first(k)).toLong), (k, cents)) }
      .groupBy(_._1)
      .map { case (key, xs) =>
        key -> (xs.map(_._2._1).distinct.length.toLong, xs.map(_._2._2).sum)
      }
    assert(rows.keySet == cells.keySet)
    cells.foreach { case (key, (n, rev)) =>
      val (gn, grev, _) = rows(key)
      assert(gn == n && grev == rev, s"cell $key")
    }
    // cumulative column: per cohort, running sum over age
    cells.keys.map(_._1).toSeq.distinct.foreach { cm =>
      val ages = cells.keys.filter(_._1 == cm).map(_._2).toSeq.sorted
      var run = 0L
      ages.foreach { a =>
        run += cells((cm, a))._2
        assert(rows((cm, a))._3 == run, s"cohort $cm age $a cum")
      }
    }
    // conservation: total revenue equals the orders table total
    assert(rows.values.map(_._2).sum == orders.map(_._3).sum)
    c.unpersist()
  }

  test("eventually-follows: counts match a scala replay, diagonal absent") {
    val ef = Warehouse.eventuallyFollows(spark, sf).cache()
    assert(ef.filter(col("type_a") === col("type_b")).count() == 0)
    val got = ef
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val spans = Tables
      .events(spark, sf)
      .selectExpr("user_id", "event_type", "ts div 1000 AS us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(e => (e._1, e._2))
      .map { case ((u, t), xs) => (u, t, xs.map(_._3).min, xs.map(_._3).max) }
      .toSeq
    val byUser = spans.groupBy(_._1)
    val exp = collection.mutable.Map.empty[(String, String), (Long, Long)]
    byUser.values.foreach { ts =>
      for (a <- ts; b <- ts if a._2 != b._2) {
        val (n, f) = exp.getOrElse((a._2, b._2), (0L, 0L))
        exp((a._2, b._2)) = (n + 1, f + (if (a._3 < b._4) 1 else 0))
      }
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, (n, f)) =>
      assert(got(k) == ((n, f, f * 1000000 / n)), s"pair $k")
    }
    ef.unpersist()
  }

  test("hhi: exact BigInt replay; bounds 1/n <= hhi <= 1; cr1 dominates equality line") {
    val got = graft.operators.Warehouse.hhi(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val li = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_suppkey", "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("l_suppkey").agg(sum("c").as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val nat = graft.Tables.supplier(spark, sf)
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT) AS n")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byNat = nat.filter(s => li.contains(s._1)).groupBy(_._2)
      .map { case (n, ss) => n -> ss.map(s => li(s._1)) }
    assert(got.keySet == byNat.keySet)
    byNat.foreach { case (n, revs) =>
      val tot = revs.sum
      val hhi = (revs.map(r => BigInt(r) * r).sum * 1000000 / (BigInt(tot) * tot)).toLong
      val cr1 = revs.max * 1000000L / tot
      val (gn, gt, gh, gc) = got(n)
      assert(gn == revs.size.toLong && gt == tot && gh == hhi && gc == cr1, s"nation $n")
      // HHI lives in [1/n, 1]; CR1 can never sit below the equal-share line
      assert(gh >= 1000000L / revs.size - 1 && gh <= 1000000L)
      assert(gc >= 1000000L / revs.size - 1)
    }
  }

  test("return wilson: BigInt bound replay; small-n high-rate ranks below large-n evidence") {
    val rows = Warehouse.returnWilson(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
      .sortBy(_._1)
    val per = Tables.lineitem(spark, sf)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum((col("l_returnflag") === "R").cast("long")).as("r"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val scored = per.map { case (k, n, r) =>
      val inner = BigInt(r) * (n - r) * 1000000 / n + 1000000
      var s0 = BigInt(math.sqrt(inner.toDouble).toLong)
      if ((s0 + 1) * (s0 + 1) <= inner) s0 += 1
      if (s0 * s0 > inner) s0 -= 1
      val lb = (BigInt(r + 2) * 1000000 - 2 * s0 * 1000) / (n + 4)
      (k, n, r, BigInt(r) * 1000000 / n, lb)
    }
    val want = scored.sortBy { case (k, _, _, _, lb) => (-lb, k) }.take(25).zipWithIndex
      .map { case ((k, n, r, rate, lb), i) =>
        ((i + 1).toLong, k, n, r, rate.toLong, lb.toLong)
      }
    assert(rows.toSeq == want.toSeq, "wilson ranking replay mismatch")
    // the bound is always below the raw rate (it prices uncertainty in)
    rows.foreach { case (_, _, _, r, rate, lb) => if (r > 0) assert(lb < rate) }
  }

  test("otif: all-lines-within-SLA conjunction replay per month") {
    val got = Warehouse.otif(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val orderInfo = Tables.orders(spark, sf)
      .selectExpr(
        "o_orderkey",
        "CAST(o_orderdate AS DATE) AS od",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDate(1).toLocalDate, r.getLong(2))))
      .toMap
    val lines = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS sd")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1)
      .map { case (o, xs) =>
        val (od, m) = orderInfo(o)
        val allOk = xs.forall { case (_, sd) =>
          java.time.temporal.ChronoUnit.DAYS.between(od, sd) <= Warehouse.OtifSlaDays
        }
        (o, m, allOk, xs.size.toLong)
      }
      .toSeq
    assert(got.keySet == lines.map(_._2).toSet)
    lines.groupBy(_._2).foreach { case (m, os) =>
      val n = os.length.toLong
      val otif = os.count(_._3).toLong
      val nl = os.map(_._4).sum
      assert(got(m) == ((n, otif, nl, otif * 1000000L / n)), s"month $m")
    }
  }

  test("backlog aging: open-book bucket replay; buckets partition the open orders") {
    val got = Warehouse.backlogAging(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val o = Tables.orders(spark, sf)
      .selectExpr(
        "o_orderstatus",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val asof = o.map(_._2).max
    val open = o.filter(_._1 != "F")
    val want = open
      .map { case (st, m, c) =>
        val age = asof - m
        val bucket =
          if (age < 6) "0-5" else if (age < 12) "6-11" else if (age < 24) "12-23" else "24+"
        ((st, bucket), c)
      }
      .groupBy(_._1)
      .map { case (k, xs) => k -> ((xs.length.toLong, xs.map(_._2).sum)) }
    assert(got == want)
    assert(got.values.map(_._1).sum == open.length.toLong)
  }

  test("whale dependency: fixed top-10 cohort replay; share bounded by each month's CR-10") {
    val got = Warehouse.whaleDependency(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val o = Tables.orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val whales = o.groupBy(_._1)
      .map { case (cust, xs) => (cust, xs.map(_._3).sum) }
      .toSeq
      .sortBy { case (cust, rev) => (-rev, cust) }
      .take(10)
      .map(_._1)
      .toSet
    assert(got.keySet == o.map(_._2).toSet)
    o.groupBy(_._2).foreach { case (m, xs) =>
      val total = xs.map(_._3).sum
      val wx = xs.filter(x => whales.contains(x._1))
      val wc = wx.map(_._3).sum
      assert(
        got(m) == ((xs.length.toLong, total, wx.length.toLong, wc,
          (BigInt(wc) * 1000000 / BigInt(total)).toLong)),
        s"month $m")
    }
  }
}
