package graft

import org.apache.spark.sql.functions._

import graft.operators.AnalyticsExt

class AnalyticsExtSpec extends SparkSpec {

  test("asof join: one row per event; attached order never postdates the event") {
    val a = AnalyticsExt.asofJoin(spark, sf).cache()
    assert(a.count() == graft.Tables.events(spark, sf).count())
    // order_date (µs) must be <= event ts for every matched row
    val bad = a
      .filter(col("o_orderkey").isNotNull)
      .filter(unix_micros(to_timestamp(col("order_date"))) > col("ts"))
      .count()
    assert(bad == 0)
  }

  test("range join: counts are bounded by the user's total engagement events") {
    val r = AnalyticsExt.rangeJoin(spark, sf).cache()
    val totals = graft.Tables
      .events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_total"))
    assert(
      r.join(totals, "user_id")
        .filter(col("n_prior_engagements") > col("n_total"))
        .count() == 0)
    assert(r.filter(col("n_prior_engagements") < 0).count() == 0)
  }

  test("percentiles: p50 <= p90 everywhere") {
    val p = AnalyticsExt.percentiles(spark, sf)
    assert(p.filter(col("p50_acctbal") > col("p90_acctbal")).count() == 0)
  }

  test("freq items: every true heavy hitter appears in the sketch's candidates") {
    val f = AnalyticsExt.freqItems(spark, sf)
    assert(f.count() == 5)
    assert(f.filter(col("in_sketch") =!= 1).count() == 0)
  }

  test("cube totals: grand total row equals table count") {
    val c = AnalyticsExt.cubeOrders(spark, sf)
    val grand = c
      .filter(col("o_orderstatus") === "(all)" && col("o_orderpriority") === "(all)")
      .select("n_orders")
      .head
      .getLong(0)
    assert(grand == graft.Tables.orders(spark, sf).count())
  }

  test("ntile: quartiles 1..4, sizes within 1 of each other per segment") {
    val n = AnalyticsExt.ntileCustomers(spark, sf).cache()
    assert(n.filter(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    val spread = n
      .groupBy("c_mktsegment", "quartile")
      .count()
      .groupBy("c_mktsegment")
      .agg((max("count") - min("count")).as("spread"))
    assert(spread.filter(col("spread") > 1).count() == 0)
  }

  test("copurchase: canonical pair order, counts bounded by smaller part's order count") {
    val c = AnalyticsExt.copurchase(spark, sf, topK = 25).cache()
    assert(c.count() > 0 && c.count() <= 25)
    assert(c.filter(col("part_a") >= col("part_b")).count() == 0)
    // a pair can't co-occur more often than either part appears in orders
    val perPart = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_partkey").count()
    val bounded = c
      .join(perPart.withColumnRenamed("l_partkey", "part_a").withColumnRenamed("count", "ca"), "part_a")
      .join(perPart.withColumnRenamed("l_partkey", "part_b").withColumnRenamed("count", "cb"), "part_b")
    assert(bounded.filter(col("n_orders") > least(col("ca"), col("cb"))).count() == 0)
  }

  test("pagerank: top-50 well-formed, deterministic, centrality tracks degree") {
    val pr = graft.operators.AnalyticsExt.pageRank(spark, sf).cache()
    val rows = pr.collect()
    assert(rows.length == 50)
    // rank order is the score order with part tiebreak
    val scores = rows.sortBy(_.getLong(2)).map(_.getLong(1))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(rows.forall(_.getLong(1) > 0))
    // deterministic across runs (integer arithmetic end to end)
    val again = graft.operators.AnalyticsExt.pageRank(spark, sf)
    assert(pr.exceptAll(again).count() == 0)
    // centrality sanity: the top-10 parts have above-average basket degree
    val deg = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_partkey").count()
    val avgDeg = deg.agg(avg("count")).head.getDouble(0)
    val topDeg = pr.filter(col("rank") <= 10)
      .join(deg.withColumnRenamed("l_partkey", "part"), "part")
      .agg(avg("count")).head.getDouble(0)
    assert(topDeg > avgDeg, s"top-ranked degree $topDeg not above average $avgDeg")
  }

  test("components: matches a union-find reference exactly, converged, sizes tile the parts") {
    val c = graft.operators.AnalyticsExt.components(spark, sf).cache()
    val po = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").distinct()
    val nParts = po.select("l_partkey").distinct().count()
    assert(c.count() == nParts)
    // the 6-round propagation actually converged on this graph
    assert(c.filter(col("converged") =!= 1L).count() == 0)
    // comp_size really is the component's cardinality
    val bad = c.groupBy("component").agg(count(lit(1)).as("n"), max("comp_size").as("s"),
      min("comp_size").as("s2"))
      .filter(col("n") =!= col("s") || col("s") =!= col("s2"))
    assert(bad.count() == 0)
    // union-find reference over the same support->=2 edge set
    val edges = po.as("a")
      .join(po.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .count().filter(col("count") >= 2)
      .select("pa", "pb").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = c.select("part").collect().map(_.getLong(0))
      .map(p => p -> find(p)).toMap
    val got = c.select("part", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "component labels differ from union-find min-label reference")
    val again = graft.operators.AnalyticsExt.components(spark, sf)
    assert(c.exceptAll(again).count() == 0)
  }

  test("seasonal decomposition: additive identity exact, full gap-free frames, scala replay") {
    val sd = AnalyticsExt.seasonalDecomp(spark, sf).cache()
    assert(sd.count() > 0)
    // the additive identity closes EXACTLY on every row
    assert(sd.filter(
      col("cents") =!= col("trend_cents") + col("seasonal_cents") + col("remainder_cents"))
      .count() == 0)
    // full centered frames: a contiguous d-day series keeps d-6 rows
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr(s"ts div ${nsPerDay}L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perSeries = daily.groupBy(_._1)
    val gotCounts = sd.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSeries.foreach { case (et, rows) =>
      val days = rows.map(_._2).sorted
      val contiguous = days.zip(days.drop(1)).forall { case (a, b) => b == a + 1 }
      if (contiguous) assert(gotCounts(et) == days.length - 6, s"$et kept-row count")
    }
    // scala replay of one full series
    val (et, rows) = perSeries.head
    val byDay = rows.sortBy(_._2)
    val c = byDay.map(_._3)
    val expected = (3 until byDay.length - 3).map { i =>
      val day = byDay(i)._2
      val trend = c.slice(i - 3, i + 4).sum / 7 // positive: / == div
      (day, c(i), trend, c(i) - trend, day % 7)
    }
    val snum = expected.groupBy(_._5).map { case (dw, xs) =>
      val s = xs.map(_._4).sum
      val n = xs.length
      dw -> (if (s < 0) -(math.abs(s) / n) else s / n)
    }
    val exp = expected.map { case (day, cents, trend, det, dw) =>
      (day, cents, trend, snum(dw), det - snum(dw))
    }.toSet
    val got = sd.filter(col("event_type") === et)
      .select("day", "cents", "trend_cents", "seasonal_cents", "remainder_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == exp, s"scala replay mismatch for $et")
    sd.unpersist()
  }

  test("anomaly flags: lower-median/MAD replay exact; flag rule holds on every row") {
    val af = AnalyticsExt.anomalyFlags(spark, sf).cache()
    val rem = AnalyticsExt.seasonalDecomp(spark, sf)
      .select("event_type", "day", "remainder_cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(af.count() == rem.length)
    def lowerMed(xs: Seq[(Long, Long)]): Long = { // (value, day) order
      val sorted = xs.sortBy(identity).map(_._1)
      sorted((sorted.length + 1) / 2 - 1)
    }
    val expected = rem.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val med = lowerMed(rows.toSeq.map(r => (r._3, r._2)))
      val mad = lowerMed(rows.toSeq.map(r => (math.abs(r._3 - med), r._2)))
      rows.toSeq.map(r =>
        (et, r._2, r._3, med, mad, if (math.abs(r._3 - med) > 3 * mad) 1L else 0L))
    }.toSet
    val got = af.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected, "anomaly flags differ from the scala median/MAD replay")
    af.unpersist()
  }

  test("theil-sen: true discrete median of the pair slopes, robust to a planted outlier") {
    val ts = graft.operators.AnalyticsExt.theilSen(spark, sf).cache()
    assert(ts.count() > 0)
    // m matches the increasing-x pair count and the median rank is honored:
    // recompute one customer end-to-end in driver code
    val pick = ts.filter(col("m") >= 6).select("o_custkey").head.getLong(0)
    val rows = Tables.orders(spark, sf).filter(col("o_custkey") === pick)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("x"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slopes = (for {
      (k1, x1, y1) <- rows; (k2, x2, y2) <- rows if x2 > x1
    } yield (((y2 - y1) * 10000L) / (x2 - x1), k1, k2)).sorted
    val got = ts.filter(col("o_custkey") === pick).head
    assert(got.getLong(1) == slopes.length)
    assert(got.getLong(2) == slopes((slopes.length + 1) / 2 - 1)._1)
    // robustness: median of slopes is bounded by the extremes
    assert(slopes.head._1 <= got.getLong(2) && got.getLong(2) <= slopes.last._1)
    val again = graft.operators.AnalyticsExt.theilSen(spark, sf)
    assert(ts.exceptAll(again).count() == 0)
  }

  test("weighted percentile: monotone in p, one row per (flag, p), brackets the unweighted") {
    val wp = graft.operators.AnalyticsExt.weightedPercentile(spark, sf).cache()
    val flags = Tables.lineitem(spark, sf).select("l_returnflag").distinct().count()
    // exactly one winner per (flag, p)
    assert(wp.count() == flags * 4)
    assert(wp.groupBy("l_returnflag", "p").count().filter(col("count") =!= 1).count() == 0)
    // monotone: value non-decreasing in p within each flag
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag").orderBy("p")
    assert(wp.withColumn("prev", lag("price_c", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > col("price_c")).count() == 0)
    // the weighted median splits the QUANTITY mass ~in half
    val med = wp.filter(col("p") === 0.5)
      .select(col("l_returnflag"), col("price_c").as("m"))
    val mass = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("pc"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .join(med, "l_returnflag")
      .groupBy("l_returnflag")
      .agg((sum(when(col("pc") <= col("m"), col("qty")).otherwise(0L)) /
        sum("qty")).as("frac"))
    assert(mass.filter(col("frac") < 0.5 || col("frac") > 0.55).count() == 0)
    val again = graft.operators.AnalyticsExt.weightedPercentile(spark, sf)
    assert(wp.exceptAll(again).count() == 0)
  }

  test("ols trend: matches Spark's regr_slope, identity holds, deterministic") {
    val t = graft.operators.AnalyticsExt.olsTrend(spark, sf).cache()
    assert(t.count() > 0 && t.filter(col("n") < 2).count() == 0)
    // the e4 integer slope tracks the float regr_slope to quantization
    val ref = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("double").as("x"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").cast("double").as("y"))
      .groupBy("o_custkey").agg(expr("regr_slope(y, x)").as("s"), count(lit(1)).as("cnt"))
    val joined = t.join(ref, "o_custkey")
      .withColumn("diff", abs(col("slope_e4") / 1e4 - col("s")))
    assert(joined.filter(col("diff") > 1.0).count() == 0,
      "integer slope deviates from regr_slope beyond quantization")
    // division identity: sy*1e4 - slope*sx - intercept*n is a remainder < n
    val agg = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("x"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("y"))
      .groupBy("o_custkey").agg(sum("x").as("sx"), sum("y").as("sy"))
    val id = t.join(agg, "o_custkey")
      .withColumn("r", col("sy") * 10000 - col("slope_e4") * col("sx")
        - col("intercept_e4") * col("n"))
    assert(id.filter(abs(col("r")) >= col("n")).count() == 0)
    val again = graft.operators.AnalyticsExt.olsTrend(spark, sf)
    assert(t.exceptAll(again).count() == 0)
  }

  test("equi-depth histogram: bins tile each type, populations equal +-1, boundaries ordered") {
    val bins = 8
    val h = graft.operators.AnalyticsExt.equidepthHist(spark, sf, bins).cache()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    // every type gets all B bins (each type has >> B rows) and rows tile exactly
    assert(h.count() == types * bins)
    val per = h.groupBy("event_type")
      .agg(sum("n_rows").as("rows"), max("n_rows").as("mx"), min("n_rows").as("mn"))
    val truth = Tables.events(spark, sf).groupBy("event_type").count()
    assert(per.join(truth, "event_type").filter(col("rows") =!= col("count")).count() == 0)
    // equal depth +-1
    assert(per.filter(col("mx") - col("mn") > 1).count() == 0)
    // boundaries: within a bin lo <= hi; across bins hi(b) <= lo(b+1) up to ties
    assert(h.filter(col("lo") > col("hi")).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bin")
    val crossed = h.withColumn("prev_hi", lag("hi", 1).over(w))
      .filter(col("prev_hi").isNotNull && col("prev_hi") > col("lo"))
    assert(crossed.count() == 0)
    val again = graft.operators.AnalyticsExt.equidepthHist(spark, sf, bins)
    assert(h.exceptAll(again).count() == 0)
  }

  test("attribution: credit telescopes to exactly 10000 bp per attributed conversion") {
    val a = graft.operators.AnalyticsExt.attribution(spark, sf).cache()
    assert(a.count() > 0)
    // independent reconstruction of the touchpoint join
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"), col("event_type"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("conv_us"), col("event_id").as("conv_id"))
    val j = conv.join(ev.filter(col("event_type") =!= "purchase"), "user_id")
      .filter(col("ts_us") >= col("conv_us") - 86400000000L && col("ts_us") < col("conv_us"))
      .cache()
    val attributed = j.select("conv_id").distinct().count()
    val touches = j.count()
    assert(a.agg(sum("credit_bp")).head.getLong(0) == 10000L * attributed)
    assert(a.agg(sum("n_touch")).head.getLong(0) == touches)
    assert(a.filter(col("credit_bp") <= 0 || col("n_touch") <= 0).count() == 0)
    // a type can't credit more conversions than it touches
    assert(a.filter(col("n_conversions") > col("n_touch")).count() == 0)
    // purchases never appear as touchpoints
    assert(a.filter(col("event_type") === "purchase").count() == 0)
    j.unpersist()
    val again = graft.operators.AnalyticsExt.attribution(spark, sf)
    assert(a.exceptAll(again).count() == 0)
  }

  test("changepoint: apex matches per-type brute-force CUSUM") {
    val cp = graft.operators.AnalyticsExt.changepoint(spark, sf).cache()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(cp.count() == types)
    assert(cp.filter(col("s_abs") =!= abs(col("s_at_cp"))).count() == 0)
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      val t = sorted.map(_._3).sum
      val n = sorted.length.toLong
      var s = 0L
      val traj = sorted.map { case (_, day, c) => s += n * c - t; (day, s) }
      assert(traj.last._2 == 0L, s"CUSUM must telescope to 0 for $et")
      val apex = traj.maxBy { case (day, sv) => (math.abs(sv), -day) }
      (et, n, t, apex._1, apex._2)
    }.toSet
    val got = cp.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    val again = graft.operators.AnalyticsExt.changepoint(spark, sf)
    assert(cp.exceptAll(again).count() == 0)
  }

  test("gini: matches BigInt brute force, bounds hold") {
    val g = graft.operators.AnalyticsExt.gini(spark, sf).cache()
    assert(g.count() == 1)
    val row = g.head
    val spends = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("x"))
      .select("o_custkey", "x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = spends.sortBy(r => (r._2, r._1)).map(_._2)
    val n = BigInt(sorted.length)
    val sx = sorted.map(BigInt(_)).sum
    val six = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expectedGini = ((BigInt(2) * six - (n + 1) * sx) * 1000000) / (n * sx)
    assert(row.getLong(0) == sorted.length)
    assert(BigInt(row.getLong(1)) == sx)
    assert(BigInt(row.getLong(2)) == expectedGini, s"got ${row.getLong(2)} want $expectedGini")
    assert(row.getLong(3) == sorted.max * 1000000L / sx.toLong)
    assert(row.getLong(2) >= 0 && row.getLong(2) < 1000000L)
    val again = graft.operators.AnalyticsExt.gini(spark, sf)
    assert(g.exceptAll(again).count() == 0)
  }

  test("basket lift: metric formulas exact, ordering by lift, bounds hold") {
    val b = graft.operators.AnalyticsExt.basketLift(spark, sf).cache()
    assert(b.count() == 25)
    // formula identities on the emitted integers
    val n = Tables.lineitem(spark, sf).select("l_orderkey").distinct().count()
    assert(b.filter(col("support_e6") =!= expr(s"(c_ab * 1000000) div $n")).count() == 0)
    assert(b.filter(col("conf_ab_e6") =!= expr("(c_ab * 1000000) div c_a")).count() == 0)
    assert(b.filter(col("lift_e6") =!= expr(s"(c_ab * $n * 1000000) div (c_a * c_b)")).count() == 0)
    // a pair can't out-count its items; confidences bounded by 1e6
    assert(b.filter(col("c_ab") > col("c_a") || col("c_ab") > col("c_b")).count() == 0)
    assert(b.filter(col("conf_ab_e6") > 1000000L || col("conf_ba_e6") > 1000000L).count() == 0)
    // lift non-increasing down the list
    val lifts = b.orderBy(col("lift_e6").desc, col("part_a"), col("part_b"))
      .collect().map(_.getAs[Long]("lift_e6"))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
    val again = graft.operators.AnalyticsExt.basketLift(spark, sf)
    assert(b.exceptAll(again).count() == 0)
  }

  test("triangles: equals brute-force edge-intersection count, invariants hold") {
    val t = graft.operators.AnalyticsExt.triangles(spark, sf).cache()
    assert(t.count() == 1)
    val row = t.head
    val (nNodes, nEdges, openW, nWedges, nTri, ccE6) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    // brute force: rebuild the same edge set, sum |N(a) n N(b)| over edges / 3
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).toSet)
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Int]()
    baskets.foreach { parts =>
      val s = parts.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        pairCounts((s(i), s(j))) = pairCounts.getOrElse((s(i), s(j)), 0) + 1
    }
    val edges = pairCounts.filter(_._2 >= 2).keys.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    assert(nNodes == adj.size)
    assert(nEdges == edges.size)
    val triBrute = edges.toSeq.map { case (a, b) => (adj(a) & adj(b)).size.toLong }.sum / 3
    assert(nTri == triBrute, s"operator $nTri vs brute $triBrute")
    assert(openW == adj.values.map(s => s.size.toLong * (s.size - 1)).sum / 2)
    assert(nTri <= nWedges && nWedges <= openW)
    assert(ccE6 == 3 * nTri * 1000000L / math.max(openW, 1L))
    val again = graft.operators.AnalyticsExt.triangles(spark, sf)
    assert(t.exceptAll(again).count() == 0)
  }

  test("event transitions: counts telescope, rows sum to their margins, p_e6 rows sum to ~1e6") {
    val t = graft.operators.AnalyticsExt.eventTransitions(spark, sf).cache()
    // every user with k events contributes exactly k-1 transitions
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val users = ev.select("user_id").distinct().count()
    assert(t.agg(sum("n_trans")).head.getLong(0) == total - users)
    // margin consistency: per-from transition counts sum to n_from
    val bad = t.groupBy("from_type", "n_from").agg(sum("n_trans").as("s"))
      .filter(col("s") =!= col("n_from"))
    assert(bad.count() == 0)
    // each matrix row's probabilities sum to 1e6 up to floor loss (< n_cols)
    val rows = t.groupBy("from_type").agg(sum("p_e6").as("p"), count(lit(1)).as("k"))
    assert(rows.filter(col("p") > 1000000L || col("p") <= lit(1000000L) - col("k")).count() == 0)
    val again = graft.operators.AnalyticsExt.eventTransitions(spark, sf)
    assert(t.exceptAll(again).count() == 0)
  }

  test("weighted median: matches brute-force weighted expansion per nation") {
    val m = graft.operators.AnalyticsExt.weightedMedian(spark, sf).cache()
    // brute force: per nation, walk the (bal_c, custkey) order until the
    // running order-count weight reaches ceil(W/2)
    val w = Tables.orders(spark, sf).groupBy("o_custkey").count()
    val rows = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nk"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("bal_c"))
      .join(w, col("c_custkey") === col("o_custkey"))
      .select("nk", "bal_c", "c_custkey", "count")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).map { case (nk, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val wtot = sorted.map(_._4).sum
      val t = (wtot + 1) / 2
      var cum = 0L
      val win = sorted.find { r => cum += r._4; cum >= t }.get
      (nk, wtot, win._2)
    }.toSet
    val got = m.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // exactly one median row per nation present in the joined data
    assert(m.groupBy("c_nationkey").count().filter(col("count") =!= 1).count() == 0)
    val again = graft.operators.AnalyticsExt.weightedMedian(spark, sf)
    assert(m.exceptAll(again).count() == 0)
  }

  test("chi2: contributions match a BigInt brute force, margins consistent") {
    val rows = graft.operators.AnalyticsExt.chi2Assoc(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // independent brute force from raw counts
    val counts = graft.Tables.orders(spark, sf)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = BigInt(counts.values.sum)
    val rm = counts.groupBy(_._1._1).map { case (k, m) => k -> BigInt(m.values.sum) }
    val cm = counts.groupBy(_._1._2).map { case (k, m) => k -> BigInt(m.values.sum) }
    var totE = BigInt(0)
    val expect = counts.map { case ((st, pr), o) =>
      val d = n * BigInt(o) - rm(st) * cm(pr)
      val contrib = (d * d * 1000000) / (n * rm(st) * cm(pr))
      val expd = (rm(st) * cm(pr) * 1000000) / n
      totE += contrib
      (st, pr) -> (expd.toLong, contrib.toLong)
    }
    rows.foreach { case (pr, st, nc, exp, con, tot) =>
      assert(counts((st, pr)) == nc)
      val (e, c) = expect((st, pr))
      assert(e == exp && c == con, s"cell ($st,$pr)")
      assert(tot == totE.toLong)
    }
    assert(rows.map(_._3).sum == n.toLong)
  }

  test("abc pareto: classes partition parts, shares exact, A leads") {
    val rows = graft.operators.AnalyticsExt
      .abcPareto(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    // brute force: per-part whole-dollar revenue, desc cumsum, class cuts
    val rev = Tables
      .lineitem(spark, sf)
      .selectExpr(
        "l_partkey",
        "CAST(floor(l_extendedprice * (1.0d - l_discount)) AS BIGINT) AS r")
      .groupBy("l_partkey")
      .agg(sum("r").as("rev"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, v) => (-v, k) }
    val t = BigInt(rev.map(_._2).sum)
    var cum = BigInt(0)
    val classOf = rev.map { case (_, v) =>
      cum += v
      val share = cum * 1000000 / t
      if (share <= 800000) "A" else if (share <= 950000) "B" else "C"
    }
    val exp = classOf
      .zip(rev.map(_._2))
      .groupBy(_._1)
      .map { case (c, xs) => c -> (xs.length.toLong, xs.map(_._2).sum) }
    rows.foreach { case (c, np, crev, shr) =>
      assert(exp(c) == ((np, crev)), s"class $c")
      assert(shr == (BigInt(crev) * 1000000 / t).toLong, s"class $c share")
    }
    // partition: counts and revenue sum to the whole part set
    assert(rows.map(_._2).sum == rev.length)
    assert(rows.map(_._3).sum == t.toLong)
    // Pareto shape: A holds the largest share
    assert(rows.find(_._1 == "A").get._4 >= rows.map(_._4).max)
  }

  test("skyline: equals the quadratic dominance brute force") {
    val got = AnalyticsExt
      .skyline(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val pts = Tables
      .part(spark, sf)
      .selectExpr(
        "p_partkey",
        "CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c",
        "CAST(p_size AS BIGINT) AS p_size")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = pts
      .filter { case (_, pc, sz) =>
        !pts.exists { case (_, qc, qz) =>
          qc <= pc && qz <= sz && (qc < pc || qz < sz)
        }
      }
      .sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
    assert(got.nonEmpty)
    // frontier is a strict staircase once equal-point duplicates collapse:
    // sorted by price, sizes strictly decrease across distinct points
    val dedup = got.map(t => (t._2, t._3)).distinct.sortBy(identity)
    dedup.sliding(2).foreach {
      case Array((pc1, s1), (pc2, s2)) =>
        assert(pc1 < pc2 || s1 == s2)
        if (pc1 < pc2) assert(s2 < s1, s"staircase broken at $pc2")
      case _ =>
    }
  }

  test("rolling mau: trailing-7d distinct users match a brute-force window") {
    val got = AnalyticsExt
      .rollingMau(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val pres = Tables
      .events(spark, sf)
      .selectExpr("ts div 86400000000000 AS day", "user_id")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val days = pres.map(_._1).distinct
    val exp = days.map { d =>
      d -> pres.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).distinct.length.toLong
    }.toMap
    assert(got == exp)
    // window is a superset of the single day: n_active_7d >= daily actives
    val daily = pres.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).distinct.length }
    daily.foreach { case (d, n) => assert(got(d) >= n) }
  }

  test("event regex: counts match a scala-regex replay of each user's sequence") {
    val got = AnalyticsExt
      .eventRegex(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val seqs = Tables
      .events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (u, evs) =>
        val s = evs
          .sortBy(e => (e._2, e._3))
          .map(e =>
            e._4 match {
              case "signup"   => 's'
              case "click"    => 'c'
              case "view"     => 'v'
              case "purchase" => 'p'
              case _          => 'e'
            })
          .mkString
        u -> s
      }
    val re = "v[vc]*p".r
    seqs.foreach { case (u, s) =>
      val (n, m) = got(u)
      assert(n == s.length.toLong, s"user $u length")
      assert(m == re.findAllIn(s).length.toLong, s"user $u matches")
    }
    assert(got.size == seqs.size)
  }

  test("ewma: dyadic num/den match a brute-force trailing-16 window") {
    val got = AnalyticsExt
      .ewma(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val daily = Tables
      .events(spark, sf)
      .selectExpr(
        "event_type",
        "ts div 86400000000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got.keySet == daily.keySet)
    daily.keys.foreach { case (t, d) =>
      var num = 0L; var den = 0L
      (0 to 15).foreach { i =>
        daily.get((t, d - i)).foreach { c =>
          num += c << (15 - i); den += 1L << (15 - i)
        }
      }
      val (gn, gd, ge) = got((t, d))
      assert(gn == num && gd == den, s"($t,$d)")
      assert(ge == num / den, s"($t,$d) quotient")
    }
    // a day present in the series always contributes weight 2^15
    got.values.foreach { case (_, den, _) => assert(den >= (1L << 15)) }
  }

  test("conversion lag: discrete percentiles match a scala replay") {
    val got = AnalyticsExt
      .conversionLag(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = Tables
      .events(spark, sf)
      .selectExpr("user_id", "event_type", "ts div 1000 AS us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstView = ev
      .filter(_._2 == "view")
      .groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val lags = ev
      .filter(_._2 == "purchase")
      .flatMap { case (u, _, us) =>
        firstView.get(u).filter(us > _).map(v => (u, us, v))
      }
      .groupBy(_._1)
      .map { case (u, xs) => (u, xs.map(_._2).min - xs.head._3) }
      .toSeq
      .sortBy { case (u, lag) => (lag, u) }
    val n = lags.length.toLong
    assert(n > 0)
    Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)).foreach {
      case (p, num, den) =>
        val rank = (n * num + den - 1) / den
        val (grank, lag, gn) = got(p)
        assert(grank == rank && gn == n, s"$p rank")
        assert(lag == lags((rank - 1).toInt)._2, s"$p value")
    }
    // percentile values are monotone
    assert(got("p50")._2 <= got("p90")._2 && got("p90")._2 <= got("p99")._2)
  }

  test("kcore: fixpoint reached and every member has core degree >= k") {
    val core = AnalyticsExt.kcore(spark, sf, k = 3, maxRounds = 16).cache()
    assert(core.count() > 0)
    assert(core.filter(col("core_deg") < 3).count() == 0, "peel did not converge")
    assert(core.filter(col("converged") =!= 1L).count() == 0, "converged flag not set")
    // a higher cap changes nothing (the loop early-exited at the true fixpoint)
    val more = AnalyticsExt.kcore(spark, sf, k = 3, maxRounds = 17)
    assert(core.exceptAll(more).count() == 0 && more.exceptAll(core).count() == 0)
    // the 3-core is a subgraph of the full graph's >= 3-degree nodes
    val members = core.select("node").collect().map(_.getLong(0)).toSet
    val pairInstances: Seq[(Long, Long)] = Tables
      .lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .toSeq
      .flatMap { rows =>
        val ps = rows.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }
    // NB: .iterator first — Map.collect emitting (pa, pb) tuples would
    // rebuild a Map keyed by pa and silently collapse parallel edges
    val edges = pairInstances
      .groupBy(identity)
      .iterator
      .collect { case (e, xs) if xs.size >= 2 => e }
      .toSet
    // scala replay of the peel
    var alive = edges
    var changed = true
    while (changed) {
      val deg = alive.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map {
        case (n, xs) => n -> xs.size
      }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = alive.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != alive.size
      alive = next
    }
    val expDeg = alive.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map {
      case (n, xs) => n -> xs.size.toLong
    }
    val gotDeg =
      core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDeg == expDeg)
    assert(members == expDeg.keySet)
    core.unpersist()
  }

  test("betweenness: exact truncated-Brandes replay; sigma sums and delta quotients bit-equal") {
    val depth = 3
    val got = AnalyticsExt.betweenness(spark, sf, seedMod = 250, depth = depth, topK = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // support-2 symmetric co-purchase graph, replayed from scratch
    val pairInstances: Seq[(Long, Long)] = Tables
      .lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .toSeq
      .flatMap { rows =>
        val ps = rows.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }
    val und = pairInstances
      .groupBy(identity)
      .iterator
      .collect { case (e, xs) if xs.size >= 2 => e }
      .toSet
    val adj = (und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ % 250 == 1)
    assert(seeds.nonEmpty, "seed set empty at this SF — the spec checks nothing")
    // truncated Brandes per seed: BFS levels with exact path counts,
    // then the SAME per-edge truncating quotient, summed per node
    val bcAcc = collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
    seeds.foreach { s =>
      var levels = Vector(Map(s -> BigInt(1)))
      var visited = Set(s)
      for (_ <- 1 to depth) {
        val next = collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
        levels.last.foreach { case (v, sig) =>
          adj(v).filterNot(visited).foreach(w => next(w) += sig)
        }
        levels = levels :+ next.toMap
        visited ++= next.keySet
      }
      var delta = levels(depth).map { case (v, _) => v -> BigInt(0) }
      for (r <- (depth - 1) to 1 by -1) {
        delta = levels(r).map { case (v, sig) =>
          val d = adj(v).toSeq
            .flatMap(w => levels(r + 1).get(w).map(sw => sig * (1000000 + delta(w)) / sw))
            .sum
          v -> d
        }
        delta.foreach { case (v, d) => bcAcc(v) += d }
      }
    }
    val want = bcAcc.toSeq
      .map { case (v, d) => (v, d.toLong) }
      .sortBy { case (v, d) => (-d, v) }
      .take(100)
      .zipWithIndex
      .map { case ((v, d), i) => (v, d, (i + 1).toLong) }
    assert(got.toSeq.sortBy(_._3) == want, "truncated-Brandes replay mismatch")
    assert(got.nonEmpty && got.forall(_._2 >= 0))
  }

  test("closeness: harmonic sums replay from a scala BFS; unreached seeds contribute zero") {
    val depth = 3
    val got = AnalyticsExt.closeness(spark, sf, seedMod = 250, depth = depth, topK = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pairInstances: Seq[(Long, Long)] = Tables
      .lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .toSeq
      .flatMap { rows =>
        val ps = rows.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }
    val und = pairInstances
      .groupBy(identity)
      .iterator
      .collect { case (e, xs) if xs.size >= 2 => e }
      .toSet
    val adj = (und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ % 250 == 1)
    assert(seeds.nonEmpty)
    val acc = collection.mutable.Map.empty[Long, (Long, Long)].withDefaultValue((0L, 0L))
    seeds.foreach { s =>
      var frontier = Set(s)
      var visited = Set(s)
      for (r <- 1 to depth) {
        val next = frontier.flatMap(adj(_)).diff(visited)
        next.foreach { v =>
          val (h, n) = acc(v); acc(v) = (h + 1000000L / r, n + 1)
        }
        visited ++= next
        frontier = next
      }
    }
    val want = acc.toSeq
      .map { case (v, (h, n)) => (v, h, n) }
      .sortBy { case (v, h, _) => (-h, v) }
      .take(100)
      .zipWithIndex
      .map { case ((v, h, n), i) => (v, h, n, (i + 1).toLong) }
    assert(got.toSeq.sortBy(_._4) == want, "harmonic closeness replay mismatch")
  }

  test("betweenness eval: overlap/recall arithmetic pins to the two estimators' own top sets") {
    val row = AnalyticsExt.betweennessEval(spark, sf).collect().head
    def tops(seedMod: Int, depth: Int, k: Int): Set[Long] = AnalyticsExt
      .betweenness(spark, sf, seedMod = seedMod, depth = depth, topK = k)
      .select("part")
      .collect()
      .map(_.getLong(0))
      .toSet
    val o20 = (tops(250, 3, 20) & tops(50, 4, 20)).size.toLong
    val o50 = (tops(250, 3, 50) & tops(50, 4, 50)).size.toLong
    assert(row.getAs[Long]("overlap_20") == o20)
    assert(row.getAs[Long]("overlap_50") == o50)
    assert(row.getAs[Long]("recall20_e6") == o20 * 1000000L / 20)
    assert(row.getAs[Long]("recall50_e6") == o50 * 1000000L / 50)
    // the denser reference scores at least as many nodes (more seeds,
    // deeper truncation can only grow the scored set)
    assert(row.getAs[Long]("n_scored_ref") >= row.getAs[Long]("n_scored"))
    assert(row.getAs[Long]("overlap_20") <= 20 && row.getAs[Long]("overlap_50") <= 50)
  }

  test("kendall tau-b: exact pair-sweep replay with both tie margins and the isqrt clamp") {
    val row = AnalyticsExt.kendallTau(spark, sf).collect().head
    val byDay = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("day").agg(count(lit(1)).as("x"), sum("c").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var (nc, nd, tx, ty, n0) = (0L, 0L, 0L, 0L, 0L)
    for (i <- byDay.indices; j <- i + 1 until byDay.length) {
      val sx = java.lang.Long.signum(byDay(j)._2 - byDay(i)._2).toLong
      val sy = java.lang.Long.signum(byDay(j)._3 - byDay(i)._3).toLong
      n0 += 1
      if (sx * sy == 1) nc += 1 else if (sx * sy == -1) nd += 1
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
    }
    assert((row.getAs[Long]("n0"), row.getAs[Long]("n_c"), row.getAs[Long]("n_d")) ==
      ((n0, nc, nd)))
    assert((row.getAs[Long]("ties_x"), row.getAs[Long]("ties_y")) == ((tx, ty)))
    val den2 = BigInt(n0 - tx) * BigInt(n0 - ty)
    val den = {
      var s0 = BigInt(math.sqrt(den2.toDouble).toLong)
      if ((s0 + 1) * (s0 + 1) <= den2) s0 += 1
      if (s0 * s0 > den2) s0 -= 1
      s0
    }
    assert(den * den <= den2 && (den + 1) * (den + 1) > den2, "isqrt bracket")
    val tau = (if (nc >= nd) BigInt(1) else BigInt(-1)) *
      ((nc - nd).abs * BigInt(1000000) / den)
    assert(BigInt(row.getAs[Long]("tau_b_e6")) == tau)
  }

  test("cohen's d: staged quotient replay; Hedges shrinks toward zero") {
    val row = AnalyticsExt.cohensD(spark, sf).collect().head
    val vals = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).selectExpr("p_partkey AS l_partkey",
        "CAST(p_type LIKE 'PROMO%' AS LONG) AS t"), "l_partkey")
      .selectExpr("t", "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val g1 = vals.filter(_._1 == 1).map(_._2)
    val g2 = vals.filter(_._1 == 0).map(_._2)
    val (n1, n2) = (BigInt(g1.length), BigInt(g2.length))
    val (s1, s2) = (g1.map(BigInt(_)).sum, g2.map(BigInt(_)).sum)
    val q1 = g1.map(c => BigInt(c) * c).sum
    val q2 = g2.map(c => BigInt(c) * c).sum
    val v1 = (n1 * q1 - s1 * s1) / (n1 * (n1 + n2 - 2))
    val v2 = (n2 * q2 - s2 * s2) / (n2 * (n1 + n2 - 2))
    val sp2 = v1 + v2
    var sp = BigInt(math.sqrt(sp2.toDouble).toLong)
    if ((sp + 1) * (sp + 1) <= sp2) sp += 1
    if (sp * sp > sp2) sp -= 1
    val num = s1 * n2 - s2 * n1
    val d = (if (num < 0) BigInt(-1) else BigInt(1)) * (num.abs * 1000000 / (n1 * n2 * sp))
    assert(BigInt(row.getAs[Long]("pooled_sd_cents")) == sp)
    assert(BigInt(row.getAs[Long]("d_e6")) == d)
    val g = d - (3 * d) / (4 * (n1 + n2) - 9)
    assert(BigInt(row.getAs[Long]("g_e6")) == g)
    assert(g.abs <= d.abs, "Hedges correction shrinks |d|")
  }

  test("cliff's delta: brute-force pair dominance equals the doubled-midrank form") {
    val row = AnalyticsExt.cliffsDelta(spark, sf).collect().head
    val vals = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).selectExpr("p_partkey AS l_partkey",
        "CAST(p_type LIKE 'PROMO%' AS LONG) AS t"), "l_partkey")
      .selectExpr("t", "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val g1 = vals.filter(_._1 == 1).map(_._2).sorted
    val g2 = vals.filter(_._1 == 0).map(_._2).sorted
    // O((n1+n2) log) dominance counts via merge positions
    var (gt, lt) = (BigInt(0), BigInt(0))
    g1.foreach { x =>
      val below = {
        var (lo, hi) = (0, g2.length)
        while (lo < hi) { val m = (lo + hi) / 2; if (g2(m) < x) lo = m + 1 else hi = m }
        lo
      }
      val upTo = {
        var (lo, hi) = (0, g2.length)
        while (lo < hi) { val m = (lo + hi) / 2; if (g2(m) <= x) lo = m + 1 else hi = m }
        lo
      }
      gt += below
      lt += (g2.length - upTo)
    }
    val (n1, n2) = (BigInt(g1.length), BigInt(g2.length))
    val delta = (if (gt >= lt) BigInt(1) else BigInt(-1)) * ((gt - lt).abs * 1000000 / (n1 * n2))
    assert(BigInt(row.getAs[Long]("delta_e6")) == delta)
    // the doubled-midrank identity: u1_2x = 2*U1 = 2*gt + ties
    val u = BigInt(row.getAs[Long]("u1_2x"))
    assert((u - n1 * n2).abs == (gt - lt).abs, "doubled-U numerator identity")
  }

  test("anova F and levene W: one-truncation-per-group BigInt replay on the dollar grid") {
    val vals = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority AS g", "o_orderkey",
        "CAST(floor(o_totalprice + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def fStat(groups: Map[String, Seq[Long]]): (Long, Long, BigInt, BigInt, BigInt) = {
      val k = groups.size
      val n = groups.values.map(_.size).sum
      val s = groups.values.flatten.map(BigInt(_)).sum
      val q = groups.values.flatten.map(c => BigInt(c) * c).sum
      val bsum = groups.values.map(g => g.map(BigInt(_)).sum.pow(2) / g.size).sum
      val ssb = bsum - s * s / n
      val ssw = q - bsum
      (k.toLong, n.toLong, ssb, ssw, ssb * (n - k) * 1000000 / (ssw * (k - 1)))
    }
    val byG = vals.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._3).toSeq }
    val (k, n, ssb, ssw, f) = fStat(byG)
    val fRow = AnalyticsExt.anovaF(spark, sf).collect().head
    assert(fRow.getAs[Long]("k") == k && fRow.getAs[Long]("n") == n)
    assert(BigInt(fRow.getAs[Long]("ssb_d2")) == ssb && BigInt(fRow.getAs[Long]("ssw_d2")) == ssw)
    assert(BigInt(fRow.getAs[Long]("f_e6")) == f)
    // levene: same machinery on |x - lower-median_g|
    val devs = vals.groupBy(_._1).map { case (g, xs) =>
      val sorted = xs.sortBy(t => (t._3, t._2))
      val med = sorted((sorted.size + 1) / 2 - 1)._3
      g -> xs.map(t => math.abs(t._3 - med)).toSeq
    }
    val (k2, n2, ssbz, sswz, w) = fStat(devs)
    val wRow = AnalyticsExt.levene(spark, sf).collect().head
    assert(wRow.getAs[Long]("k") == k2 && wRow.getAs[Long]("n") == n2)
    assert(BigInt(wRow.getAs[Long]("ssb_z2")) == ssbz && BigInt(wRow.getAs[Long]("ssw_z2")) == sswz)
    assert(BigInt(wRow.getAs[Long]("w_e6")) == w)
  }

  test("ljung-box: per-lag factored r2 replay; Q sums one truncation per lag") {
    val row = AnalyticsExt.ljungBox(spark, sf).collect().head
    val daily = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x")
      .groupBy("d").agg(sum("x").as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = daily.size.toLong
    var tsum = BigInt(0)
    var nLags = 0L
    (1 to 10).foreach { lag =>
      val pairs = daily.toSeq.flatMap { case (d, x) => daily.get(d + lag).map(y => (x, y)) }
      val m = BigInt(pairs.size)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val num = m * sxy - sx * sy
      val dx = m * sxx - sx * sx
      val dy = m * syy - sy * sy
      if (dx > 0 && dy > 0) {
        nLags += 1
        val r2 = (num.abs * 1000 / dx) * (num.abs * 1000 / dy)
        tsum += r2 / (n - lag)
      }
    }
    assert(row.getAs[Long]("n_days") == n && row.getAs[Long]("n_lags") == nLags)
    assert(BigInt(row.getAs[Long]("q_e6")) == BigInt(n) * (n + 2) * tsum)
    assert(row.getAs[Long]("significant") ==
      (if (BigInt(n) * (n + 2) * tsum > 18307000) 1L else 0L))
  }


  test("degree dist: octave histogram replay; octaves tile the degree range") {
    val rows = AnalyticsExt.degreeDist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(_._1)
    val pairInstances: Seq[(Long, Long)] = Tables
      .lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.toSeq
      .flatMap { xs =>
        val ps = xs.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }
    val edges = pairInstances.groupBy(identity).iterator
      .collect { case (e, xs) if xs.size >= 2 => e }.toSeq
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (_, xs) => xs.size.toLong }
    val want = deg.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d)).toSeq
      .map { case (o, ds) => (o.toLong, ds.size.toLong, ds.min, ds.max) }
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3, t._4)).toSeq == want)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._5.contains(b._2 * 1000000L / a._2), "octave ratio replay")
        assert(a._4 < b._3, "octaves tile: max(deg) of octave k below min of k+1")
      case _ => ()
    }
    assert(rows.head._5.isEmpty)
  }

  test("ewma chart: dyadic fold replay; limit brackets sqrt(3 var); alarms consistent") {
    val rows = AnalyticsExt.ewmaChart(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
      .sortBy(_._1)
    val daily = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("day").agg(sum("c").as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = BigInt(daily.size)
    val sx = daily.values.map(BigInt(_)).sum
    val sxx = daily.values.map(v => BigInt(v) * v).sum
    val mu = sx / n
    val v3 = 3 * ((n * sxx - sx * sx) / (n * n))
    var s0 = BigInt(math.sqrt(v3.toDouble).toLong)
    if ((s0 + 1) * (s0 + 1) <= v3) s0 += 1
    if (s0 * s0 > v3) s0 -= 1
    assert(s0 * s0 <= v3 && (s0 + 1) * (s0 + 1) > v3)
    rows.foreach { case (day, cents, ewma, muG, lim, alarm) =>
      assert(cents == daily(day) && BigInt(muG) == mu && BigInt(lim) == s0)
      val (num, den) = (0 to 15).foldLeft((BigInt(0), BigInt(0))) { case ((nu, de), i) =>
        daily.get(day - i) match {
          case Some(x) => (nu + BigInt(x) * (BigInt(1) << (15 - i)), de + (BigInt(1) << (15 - i)))
          case None    => (nu, de)
        }
      }
      assert(BigInt(ewma) == num / den, s"ewma fold day $day")
      assert((alarm == 1L) == ((BigInt(ewma) - mu).abs > s0))
    }
    assert(rows.nonEmpty)
  }



  test("interarrival: gap-multiset percentiles replay per event type") {
    val rows = AnalyticsExt.interarrival(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))))
      .toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts div 1000 AS ts_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = ev.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case ((_, t), xs) =>
        val ts = xs.map(_._3).sorted
        ts.zip(ts.tail).map { case (a, b) => (t, b - a) }
      }
      .groupBy(_._1)
      .map { case (t, gs) =>
        val sorted = gs.map(_._2).sorted
        val n = sorted.size
        def pct(num: Int, den: Int) = sorted((num * n + num) / den - 1)
        t -> ((n.toLong, sorted.map(BigInt(_)).sum / n,
          pct(1, 2), pct(9, 10), pct(99, 100)))
      }
    want.foreach { case (t, (n, mean, p50, p90, p99)) =>
      val g = rows(t)
      assert(g._1 == n && BigInt(g._2) == mean, s"type $t count/mean")
      assert((g._3, g._4, g._5) == ((p50, p90, p99)), s"type $t percentiles")
    }
    assert(rows.keySet == want.keySet)
  }

  test("split gain: BigInt Gini replay over every threshold; exactly one best") {
    val rows = AnalyticsExt.splitGain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .sortBy(_._1)
    val pop = Tables.orders(spark, sf)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v",
        "CAST(o_orderstatus = 'F' AS LONG) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (pop.map(_._1).min, pop.map(_._1).max)
    val bins = pop.groupBy(p => (p._1 - lo) * 10 / (hi - lo + 1))
      .map { case (b, xs) => b -> ((xs.size.toLong, xs.map(_._2).sum)) }
    val n = pop.size.toLong
    val pos = pop.map(_._2).sum
    def gini(nn: Long, pp: Long): BigInt =
      if (nn <= 0) BigInt(0)
      else BigInt(1000000) - (BigInt(pp) * pp + BigInt(nn - pp) * (nn - pp)) * 1000000 /
        (BigInt(nn) * nn)
    val gParent = gini(n, pos)
    var bestGain = BigInt(Long.MinValue)
    var bestBin = -1L
    val want = (0L to 8L).map { t =>
      val (nl, pl) = (0L to t).foldLeft((0L, 0L)) { case ((a, b), k) =>
        bins.get(k).map(x => (a + x._1, b + x._2)).getOrElse((a, b))
      }
      val split = (BigInt(nl) * gini(nl, pl) + BigInt(n - nl) * gini(n - nl, pos - pl)) / n
      val gain = gParent - split
      if (gain > bestGain || (gain == bestGain && t < bestBin)) { bestGain = gain; bestBin = t }
      (t, nl, pl, n - nl, pos - pl, gParent, split, gain)
    }
    val gotByBin = rows.map(r => r._1 -> r).toMap
    want.foreach { case (t, nl, pl, nr, pr, gp, gs, gain) =>
      gotByBin.get(t).foreach { g =>
        assert((g._2, g._3, g._4, g._5) == ((nl, pl, nr, pr)), s"bin $t counts")
        assert(BigInt(g._6) == gp && BigInt(g._7) == gs && BigInt(g._8) == gain, s"bin $t gini")
      }
    }
    assert(rows.count(_._9 == 1L) == 1, "exactly one best split")
    assert(rows.find(_._9 == 1L).get._1 == bestBin)
  }



  test("psi: scala float-identity replay within quantization; flags honor thresholds") {
    val rows = AnalyticsExt.psi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val nsPerWeek = 7L * 86400L * 1000000000L
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", s"ts div ${nsPerWeek}L AS week",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (lo, hi) = (ev.map(_._3).min, ev.map(_._3).max)
    val w0 = ev.map(_._2).min
    val binned = ev.map { case (t, w, c) => (t, w - w0, (c - lo) * 10 / (hi - lo + 1)) }
    val cells = binned.groupBy(x => (x._1, x._2, x._3)).map { case (k, xs) => k -> xs.size.toLong }
    val weeks = binned.groupBy(x => (x._1, x._2)).map { case (k, xs) => k -> xs.size.toLong }
    weeks.keys.filter(_._2 > 0).foreach { case (t, w) =>
      val nW = weeks((t, w))
      val n0 = weeks((t, 0L))
      val tsum = (0L until 10L).map { b =>
        val c = cells.getOrElse((t, w, b), 0L)
        val c0 = cells.getOrElse((t, 0L, b), 0L)
        val p = (c * 2 + 1).toDouble / (nW * 2 + 10)
        val q = (c0 * 2 + 1).toDouble / (n0 * 2 + 10)
        math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong
      }.sum
      val g = rows((t, w))
      assert(g._1 == nW && g._2 == tsum, s"psi $t week $w")
      assert(g._3 == (if (tsum > 100000L) 1L else 0L))
      assert(g._4 == (if (tsum > 250000L) 1L else 0L))
      assert(tsum >= 0, "PSI is a sum of (p-q)ln(p/q) terms, each nonnegative")
    }
    assert(rows.nonEmpty)
  }

  test("tukey fences: quartile/fence/outlier replay per priority") {
    val rows = AnalyticsExt.tukeyFences(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))))
      .toMap
    val vals = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority AS g", "o_orderkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    vals.groupBy(_._1).foreach { case (g, xs) =>
      val sorted = xs.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.size.toLong
      val q1 = sorted(((n + 3) / 4 - 1).toInt)
      val q3 = sorted(((3 * n + 3) / 4 - 1).toInt)
      val iqr = q3 - q1
      val (loF, hiF) = (q1 - (3 * iqr) / 2, q3 + (3 * iqr) / 2)
      val below = sorted.count(_ < loF).toLong
      val above = sorted.count(_ > hiF).toLong
      assert(rows(g) == ((n, q1, q3, iqr, loF, hiF, below, above,
        (below + above) * 1000000L / n)), s"priority $g")
    }
    assert(rows.size == 5)
  }



  test("revenue bridge: waterfall telescopes exactly; scala per-part replay") {
    val rows = AnalyticsExt.revenueBridge(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
    // identity: delta = new - churned + price + volume + cross
    rows.values.foreach { case (d, _, nr, _, cr, pe, ve, ce) =>
      assert(d == nr - cr + pe + ve + ce, "waterfall identity")
    }
    // replay one month end-to-end
    val pm = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey",
        "CAST(year(CAST(l_shipdate AS DATE)) * 12 + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS r")
      .groupBy("l_partkey", "m").agg(sum("q").as("q"), sum("r").as("r"))
      .filter(col("q") >= 1)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), (x.getLong(2), x.getLong(3) / x.getLong(2))))
      .toMap
    val months = pm.keys.map(_._2).toSeq.distinct.sorted
    val m = months.find(mm => months.contains(mm - 1) && rows.contains(mm)).get
    val cur = pm.collect { case ((pk, mm), v) if mm == m => pk -> v }
    val prev = pm.collect { case ((pk, mm), v) if mm == m - 1 => pk -> v }
    val newRev = cur.collect { case (pk, (q, p)) if !prev.contains(pk) => p * q }.sum
    val churn = prev.collect { case (pk, (q, p)) if !cur.contains(pk) => p * q }.sum
    val cont = cur.keySet & prev.keySet
    val pe = cont.toSeq.map { pk => (cur(pk)._2 - prev(pk)._2) * prev(pk)._1 }.sum
    val ve = cont.toSeq.map { pk => (cur(pk)._1 - prev(pk)._1) * prev(pk)._2 }.sum
    val ce = cont.toSeq.map { pk => (cur(pk)._2 - prev(pk)._2) * (cur(pk)._1 - prev(pk)._1) }.sum
    val g = rows(m)
    assert((g._3, g._5, g._6, g._7, g._8) == ((newRev, churn, pe, ve, ce)), s"month $m replay")
  }


  test("ppr: exact integer replay of the seeded trajectory; teleport mass only on seeds") {
    val ppr = graft.operators.AnalyticsExt.personalizedPageRank(spark, sf).cache()
    // scala integer replay over the collected edge list
    val po = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = po.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (e, xs) => e -> xs.size.toLong }
    val edges = pairCount.toSeq.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val wout = edges.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val nodes = wout.keySet.toSeq.sorted
    val nSeeds = nodes.count(_ % 100 == 0)
    var r = nodes.map(p => p -> (if (p % 100 == 0) 100000000L / nSeeds else 0L)).toMap
    for (_ <- 1 to 3) {
      val cs = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => r(s) * w / wout(s) }.sum
      }
      r = nodes.map { p =>
        val tele = if (p % 100 == 0) 15L * 100000000L / (100L * nSeeds) else 0L
        p -> (tele + 85L * cs.getOrElse(p, 0L) / 100L)
      }.toMap
    }
    val expTop = r.toSeq.sortBy { case (p, v) => (-v, p) }.take(50)
      .zipWithIndex.map { case ((p, v), i) => (p, v, i + 1L) }.toSet
    val got = ppr.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == expTop, "ppr differs from the scala integer replay")
    // every surfaced seed carries at least its teleport floor
    val floorV = 15L * 100000000L / (100L * nSeeds)
    assert(ppr.filter(col("part") % 100 === 0 && col("ppr_e8") < floorV).count() == 0)
    ppr.unpersist()
  }

  test("incremental components: delta fold equals the batch run frame-for-frame") {
    val inc = graft.operators.AnalyticsExt.componentsIncremental(spark, sf).cache()
    val batch = graft.operators.AnalyticsExt.components(spark, sf)
    assert(inc.filter(col("converged") =!= 1L).count() == 0)
    assert(inc.exceptAll(batch).count() == 0 && batch.exceptAll(inc).count() == 0,
      "incremental fold diverged from the batch operator")
    inc.unpersist()
  }

  test("components: planted diameter-20 path converges under short-cutting, not under 6 plain hops") {
    // a chain part 1 - 2 - ... - 21 (diameter 20), each edge supported by
    // two orders so it survives the minSupport >= 2 filter; written as a
    // minimal lineitem parquet so the operator runs its real scan path
    val tmp = java.nio.file.Files.createTempDirectory("graft_path_graph").toFile
    tmp.deleteOnExit()
    val rows = for {
      p <- 1L to 20L // edge p -(two orders)- p+1
      rep <- 0 to 1
      end <- Seq(p, p + 1)
    } yield (p * 2 + rep, end) // orderkey 2p and 2p+1 both contain {p, p+1}
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey").write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/lineitem.parquet")
    // legacy plain-hop propagation at the old fixed 6 rounds: a
    // diameter-20 chain provably does NOT converge (radius 6 < 20)
    val plain = graft.operators.AnalyticsExt
      .components(spark, tmp.getAbsolutePath, maxRounds = 6, shortcut = false)
    assert(plain.filter(col("converged") === 1L).count() == 0,
      "6 plain hops should not converge a diameter-20 path")
    assert(plain.select("component").distinct().count() > 1,
      "unconverged plain propagation should still show >1 label on a single chain")
    // short-cutting: radius ~doubles per round, converges well inside the cap
    val cc = graft.operators.AnalyticsExt.components(spark, tmp.getAbsolutePath)
    assert(cc.filter(col("converged") =!= 1L).count() == 0, "short-cutting did not converge")
    assert(cc.select("component").distinct().count() == 1, "path graph is one component")
    assert(cc.filter(col("component") =!= 1L).count() == 0, "component label is the min part id")
    assert(cc.filter(col("comp_size") =!= 21L).count() == 0)
    assert(cc.count() == 21)
  }

  test("quantile normalize: rank-preserving and distribution-aligned") {
    val qn = AnalyticsExt.quantileNormalize(spark, sf).cache()
    val docs = Tables
      .documents(spark, sf)
      .selectExpr("doc_id", "source", "n_chars AS len")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(qn.count() == docs.length)
    // scala replay: global sorted lens, per-source ranks, type-1 lookup
    val globalSorted = docs.sortBy(d => (d._3, d._1)).map(_._3)
    val n = docs.length
    val exp = docs
      .groupBy(_._2)
      .toSeq
      .flatMap { case (_, ds) =>
        val sorted = ds.sortBy(d => (d._3, d._1))
        val ns = sorted.length
        sorted.zipWithIndex.map { case ((id, src, len), i) =>
          val target = ((i + 1).toLong * n + ns - 1) / ns
          (id, (src, len, globalSorted((target - 1).toInt)))
        }
      }
    val got = qn
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == exp.toMap)
    // the last doc of every source maps to the global maximum
    val gmax = globalSorted.last
    got.values.groupBy(_._1).foreach { case (src, vs) =>
      assert(vs.map(_._3).max == gmax, s"source $src tail")
    }
    qn.unpersist()
  }

  test("autocorr: exact moments match a scala replay") {
    val got = AnalyticsExt
      .autocorr(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val daily = Tables
      .events(spark, sf)
      .selectExpr(
        "event_type",
        "ts div 86400000000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val types = daily.keys.map(_._1).toSeq.distinct
    types.foreach { t =>
      val series = daily.collect { case ((`t`, d), c) => (d, c) }.toSeq.sortBy(_._1)
      val byDay = series.toMap
      val pairs = series.flatMap { case (d, x) => byDay.get(d + 1).map(y => (x, y)) }
      val m = pairs.length.toLong
      if (m > 0) {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val num = m * sxy - sx * sy
        val denx = m * sxx - sx * sx
        val deny = m * syy - sy * sy
        val sign = if (num < 0) -1L else 1L
        val q1 = (BigInt(num).abs * 1000) / BigInt(denx)
        val q2 = (BigInt(num).abs * 1000) / BigInt(deny)
        val (gm, gn, gdx, gdy, gr2) = got(t)
        assert(gm == m && gn == num && gdx == denx && gdy == deny, s"type $t moments")
        assert(gr2 == sign * (q1 * q2).toLong, s"type $t r2")
        assert(math.abs(gr2) <= 1000000, s"type $t bound")
      }
    }
    assert(got.keySet == types.toSet)
  }

  test("hits: exact integer replay of the 2-iteration trajectory; both leaderboards") {
    val got = AnalyticsExt.hits(spark, sf).cache()
    // scala replay over the collected bipartite edge list
    val ords = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect()
      .flatMap(r => ords.get(r.getLong(0)).map(c => (c, r.getLong(1))))
      .groupBy(identity)
      .map { case ((c, p), xs) => (c, p, xs.length.toLong) }
      .toSeq
    var h = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a: Map[Long, Long] = Map.empty
    for (_ <- 1 to 2) {
      val ar = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map { case (c, _, w) => h(c) * w }.sum
      }
      val amax = ar.values.max
      a = ar.map { case (p, v) => p -> v * 1000000L / amax }
      val hr = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map { case (_, p, w) => a(p) * w }.sum
      }
      val hmax = hr.values.max
      h = hr.map { case (c, v) => c -> v * 1000000L / hmax }
    }
    def top(m: Map[Long, Long], kind: String) = m.toSeq
      .sortBy { case (n, v) => (-v, n) }.take(20)
      .zipWithIndex.map { case ((n, v), i) => (kind, n, v, i + 1L) }
    val exp = (top(a, "authority") ++ top(h, "hub")).toSet
    val g = got.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(g == exp, "hits differs from the scala integer replay")
    // each normalization pins at least one score to exactly 1e6
    assert(got.filter(col("kind") === "authority" && col("score_e6") === 1000000L).count() >= 1)
    assert(got.filter(col("kind") === "hub" && col("score_e6") === 1000000L).count() >= 1)
    got.unpersist()
  }

  test("assortativity: exact moments match a scala replay; r2 within the e6 bound") {
    val row = AnalyticsExt.assortativity(spark, sf).collect().head
    val po = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = po.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).iterator.collect { case (e, xs) if xs.size >= 2 => e }.toSeq
    val sym = pairs.flatMap { case (x, y) => Seq((x, y), (y, x)) }
    val deg = sym.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
    val xy = sym.map { case (s, d) => (deg(s), deg(d)) }
    val m = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val num = BigInt(m) * sxy - BigInt(sx) * sy
    val denx = BigInt(m) * sxx - BigInt(sx) * sx
    val deny = BigInt(m) * syy - BigInt(sy) * sy
    assert(row.getLong(0) == m)
    assert(row.getLong(1) == num.toLong && row.getLong(2) == denx.toLong
      && row.getLong(3) == deny.toLong)
    val sign = if (num < 0) -1L else 1L
    val expR2 = sign * ((num.abs * 1000 / denx) * (num.abs * 1000 / deny)).toLong
    assert(row.getLong(4) == expR2)
    assert(math.abs(row.getLong(4)) <= 1000000)
    // symmetric edge list: the x and y marginals coincide
    assert(sx == sy && denx == deny)
  }

  test("interval union: scala sweep replay; coverage bounded by span and by raw sum") {
    val got = AnalyticsExt.intervalUnion(spark, sf).cache()
    val usPerDay = 86400000000L
    val ords = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS od")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val ivs = Tables.lineitem(spark, sf)
      .selectExpr("l_suppkey", "l_orderkey", "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS sd")
      .collect()
      .flatMap { r =>
        ords.get(r.getLong(1)).map { od =>
          val sd = r.getLong(2)
          val s = math.min(od, sd); val e = math.max(od, sd)
          (r.getLong(0), s / usPerDay, e / usPerDay)
        }
      }
    val exp = ivs.groupBy(_._1).map { case (supp, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(identity)
      // sequential sweep merge
      var merged = List.empty[(Long, Long)]
      sorted.foreach { case (s, e) =>
        merged match {
          case (ms, me) :: rest if s <= me => merged = (ms, math.max(me, e)) :: rest
          case _ => merged = (s, e) :: merged
        }
      }
      val cov = merged.map { case (s, e) => e - s + 1 }.sum
      supp -> (merged.size.toLong, cov, sorted.map(_._1).min, merged.map(_._2).max)
    }
    val g = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(g == exp, "interval union differs from the sequential sweep replay")
    // coverage never exceeds the span, never exceeds the raw inclusive sum
    got.collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(4) - r.getLong(3) + 1)
    }
    got.unpersist()
  }

  test("auc: matches a direct scala replay with the half-tie convention") {
    val row = AnalyticsExt.auc(spark, sf).collect().head
    val scored = Tables.orders(spark, sf)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v",
        "o_orderstatus = 'F' AS pos")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val n1 = scored.count(_._2).toLong
    val n0 = scored.length - n1
    // 2U = sum over positives of (2 * #neg strictly below + #neg tied)
    val negByV = scored.filter(!_._2).groupBy(_._1).map { case (v, xs) => v -> xs.length.toLong }
    var u2 = BigInt(0)
    scored.filter(_._2).foreach { case (v, _) =>
      val below = negByV.toSeq.filter(_._1 < v).map(_._2).sum
      val tied = negByV.getOrElse(v, 0L)
      u2 += 2L * below + tied
    }
    val expAuc = (u2 * 1000000 / (BigInt(2) * n1 * n0)).toLong
    assert(row.getLong(0) == n1 && row.getLong(1) == n0)
    assert(row.getLong(3) == expAuc, "auc differs from the scala replay")
    assert(row.getLong(3) >= 0 && row.getLong(3) <= 1000000)
    // n_tied_scores counts score values carrying both classes
    val posV = scored.filter(_._2).map(_._1).toSet
    assert(row.getLong(2) == posV.intersect(negByV.keySet).size.toLong)
  }

  test("crosscorr: lag-0 moments symmetric; every pair/lag matches a scala replay") {
    val got = AnalyticsExt.crossCorr(spark, sf).cache()
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 86400000000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("event_type", "day").agg(sum("cents").as("c"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val rows = got.collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    for {
      i <- types.indices; j <- i + 1 until types.length
      lag <- 0L to 2L
    } {
      val (ta, tb) = (types(i), types(j))
      val sa = daily.collect { case ((`ta`, d), c) => (d, c) }.toMap
      val sb = daily.collect { case ((`tb`, d), c) => (d, c) }.toMap
      val pairs = sa.toSeq.flatMap { case (d, x) => sb.get(d + lag).map(y => (x, y)) }
      val m = pairs.length.toLong
      if (m > 0) {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
        val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
        val syy = pairs.map(p => BigInt(p._2) * p._2).sum
        val num = BigInt(m) * sxy - BigInt(sx) * sy
        val denx = BigInt(m) * sxx - BigInt(sx) * sx
        val deny = BigInt(m) * syy - BigInt(sy) * sy
        val sign = if (num < 0) -1L else 1L
        val expR2 = sign * ((num.abs * 1000 / denx) * (num.abs * 1000 / deny)).toLong
        val (gm, gn, gdx, gdy, gr2) = rows((ta, tb, lag))
        assert(gm == m && gn == num.toLong && gdx == denx.toLong && gdy == deny.toLong,
          s"pair ($ta,$tb) lag $lag moments")
        assert(gr2 == expR2, s"pair ($ta,$tb) lag $lag r2")
      }
    }
    // all 10 unordered pairs at 3 lags surface on the test corpus
    assert(got.count() == types.length.toLong * (types.length - 1) / 2 * 3)
    got.unpersist()
  }

  test("calibration: bins partition the orders; rates exact; bin count bounded") {
    val got = AnalyticsExt.calibration(spark, sf).cache()
    val scored = Tables.orders(spark, sf)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v",
        "o_orderstatus = 'F' AS pos")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val lo = scored.map(_._1).min; val hi = scored.map(_._1).max
    val exp = scored.groupBy { case (v, _) => (v - lo) * 10 / (hi - lo + 1) }.map {
      case (bin, xs) =>
        val n = xs.length.toLong; val np = xs.count(_._2).toLong
        val sv = xs.map(_._1).sum
        bin -> (n, np, np * 1000000L / n, sv / n)
    }
    val g = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(g == exp, "calibration differs from the scala replay")
    assert(g.values.map(_._1).sum == scored.length.toLong)
    assert(g.keySet.forall(b => b >= 0 && b <= 9))
    got.unpersist()
  }

  test("kaplan meier: sequential scala fold replay; monotone non-increasing survival") {
    val got = AnalyticsExt.kaplanMeier(spark, sf).cache()
    val byCust = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
      .groupBy(_._1).map { case (c, xs) => c -> (xs.map(_._2).min, xs.map(_._2).max) }
    val mmax = byCust.values.map(_._2).max
    val lifes = byCust.values.toSeq.map { case (m0, m1) =>
      (m1 - m0, if (m1 < mmax - 2) 1L else 0L)
    }
    val byT = lifes.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    var surv = 1000000L
    val exp = byT.zipWithIndex.map { case ((t, _, d), i) =>
      val n = byT.drop(i).map(_._2).sum // at-risk: lifetimes >= t
      surv = surv * (n - d) / n
      (t, n, d, surv)
    }.toSet
    val g = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(g == exp, "KM curve differs from the sequential scala fold")
    // survival is non-increasing in t and within [0, 1e6]
    val byTime = got.collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    byTime.sliding(2).foreach {
      case Array((_, s1), (_, s2)) => assert(s2 <= s1, "survival must be non-increasing")
      case _ =>
    }
    assert(byTime.forall { case (_, s) => s >= 0 && s <= 1000000 })
    // at-risk at the earliest observed lifetime equals the full cohort
    val minT = byTime.head._1
    assert(got.filter(col("t") === minT).collect().head.getLong(1) == byCust.size.toLong)
    got.unpersist()
  }

  test("sax motifs: scala replay of symbolization and word counts; one motif per type") {
    val got = AnalyticsExt.saxMotifs(spark, sf).cache()
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 86400000000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("event_type", "day").agg(sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = daily.groupBy(_._1).map { case (t, rows) =>
      // ntile(4) under the (c, day) total order
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = sorted.length
      val sym = sorted.zipWithIndex.map { case ((_, day, _), i) =>
        // ntile bucket for 0-based rank i of n rows
        val big = n % 4; val base = n / 4
        val s = if (big == 0) i / base + 1
        else if (i < (base + 1) * big) i / (base + 1) + 1
        else big + (i - (base + 1) * big) / base + 1
        day -> s.toLong
      }.toMap
      val days = rows.map(_._2).sorted
      val words = days.flatMap { d =>
        if (sym.contains(d + 1) && sym.contains(d + 2))
          Some(sym(d) * 100 + sym(d + 1) * 10 + sym(d + 2))
        else None
      }
      val top = words.groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
        .toSeq.sortBy { case (w, c) => (-c, w) }.head
      t -> (top._1, top._2, words.length.toLong)
    }
    val g = got.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(g == exp, "sax motifs differ from the scala replay")
    assert(g.keySet == daily.map(_._1).toSet)
    got.unpersist()
  }

  test("funnel windowed: nested within the unconstrained funnel; scala replay") {
    val gotRow = AnalyticsExt.funnelWindowed(spark, sf).collect().head
    val free = graft.operators.Analytics.funnel(spark, sf).collect().head
    // time-constrained stages can never exceed the unconstrained ones
    assert(gotRow.getLong(0) == free.getLong(0), "signup stage has no window")
    assert(gotRow.getLong(1) <= free.getLong(1))
    // scala replay of the greedy chain
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 AS ts", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val w = 7L * 86400000000L
    val signup = ev.filter(_._3 == "signup").groupBy(_._1).map {
      case (u, xs) => u -> xs.map(_._2).min
    }
    val engaged = ev.filter(e => Set("click", "view")(e._3))
      .flatMap { case (u, ts, _) =>
        signup.get(u).filter(s => ts > s && ts <= s + w).map(_ => (u, ts))
      }
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val converted = ev.filter(_._3 == "purchase")
      .flatMap { case (u, ts, _) =>
        engaged.get(u).filter(g0 => ts > g0 && ts <= g0 + w).map(_ => u)
      }
      .distinct
    assert(gotRow.getLong(0) == signup.size.toLong)
    assert(gotRow.getLong(1) == engaged.size.toLong)
    assert(gotRow.getLong(2) == converted.length.toLong)
  }

  test("local clustering: brute-force per-node replay; corners sum to 3x global triangles") {
    val got = AnalyticsExt.localClustering(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // rebuild the support->=2 co-purchase graph in scala
    val baskets = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).toSet)
    val pairCounts = baskets
      .flatMap(ps => ps.toSeq.sorted.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.size }
    val edges = pairCounts.filter(_._2 >= 2).keys.toSet
    val adj = edges.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    assert(got.keySet == adj.keySet, "one output row per graph node")
    var triTotal = 0L
    adj.foreach { case (n, nb) =>
      val deg = nb.size.toLong
      val tri = nb.toSeq.sorted.combinations(2).count(c => edges((c(0), c(1))))
      triTotal += tri
      val expLcc = if (deg < 2) 0L else 2L * tri * 1000000L / (deg * (deg - 1))
      val (gd, gt, gl) = got(n)
      assert(gd == deg && gt == tri.toLong && gl == expLcc, s"node $n mismatch")
      assert(gl >= 0 && gl <= 1000000)
    }
    // every triangle is counted at its 3 corners; ties to #176's global count
    val globalTri =
      AnalyticsExt.triangles(spark, sf).select("n_triangles").head.getLong(0)
    assert(triTotal == 3 * globalTri)
  }

  test("growth accounting: per-user scala replay; ledger identities hold") {
    val got = AnalyticsExt.growthAccounting(spark, sf)
      .collect()
      .map(r =>
        r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val ud = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 86400000000000 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = ud.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    val days = ud.map(_._2).distinct.sorted
    val active = ud.groupBy(_._2).map { case (d, xs) => d -> xs.size.toLong }
    days.foreach { d =>
      var nNew, nRet, nRes = 0L
      byUser.values.foreach { ds =>
        val i = ds.indexOf(d)
        if (i == 0) nNew += 1
        else if (i > 0 && ds(i - 1) == d - 1) nRet += 1
        else if (i > 0) nRes += 1
      }
      val (a, nw, rt, rs, ch) = got(d)
      assert(a == active(d) && nw == nNew && rt == nRet && rs == nRes, s"day $d")
      assert(a == nw + rt + rs, "active = new + retained + resurrected")
      assert(ch == active.getOrElse(d - 1, 0L) - rt, "churned = active(d-1) - retained")
    }
    // every user is new exactly once
    assert(got.values.map(_._2).sum == byUser.size.toLong)
  }

  test("pr curve: exact confusion replay at every threshold; monotone recall") {
    val rows = AnalyticsExt.prCurve(spark, sf)
      .orderBy("threshold_cents").collect()
    val scored = Tables.orders(spark, sf)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v",
        "o_orderstatus = 'F' AS pos")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val totPos = scored.count(_._2).toLong
    val distinct = scored.map(_._1).distinct.sorted
    assert(rows.length == math.min(10, distinct.length))
    // bin 0 threshold is the global min score => everything predicted
    // positive => recall exactly 1e6
    assert(rows.head.getLong(1) == distinct.head)
    assert(rows.head.getLong(6) == 1000000L)
    var prevRecall = Long.MaxValue
    rows.foreach { r =>
      val t = r.getLong(1)
      val tp = scored.count(x => x._2 && x._1 >= t).toLong
      val fp = scored.count(x => !x._2 && x._1 >= t).toLong
      val fn = totPos - tp
      assert(r.getLong(2) == tp && r.getLong(3) == fp && r.getLong(4) == fn, s"t=$t")
      val p = tp * 1000000L / math.max(tp + fp, 1L)
      val rc = tp * 1000000L / math.max(totPos, 1L)
      assert(r.getLong(5) == p && r.getLong(6) == rc)
      assert(r.getLong(7) == 2 * p * rc / math.max(p + rc, 1L))
      assert(rc <= prevRecall, "recall non-increasing in threshold")
      prevRecall = rc
    }
  }

  test("mann kendall: exact pairwise scala replay; S bounded by pair count") {
    val got = AnalyticsExt.mannKendall(spark, sf)
      .collect()
      .map(r =>
        r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val daily = Tables.events(spark, sf)
      .selectExpr(
        "event_type",
        "ts div 86400000000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("event_type", "day").agg(sum("cents").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val series = rows.sortBy(_._2).map(_._3)
      val n = series.length.toLong
      var s = 0L
      for (i <- series.indices; j <- (i + 1) until series.length)
        s += java.lang.Long.signum(series(j) - series(i))
      val tieGroups = series.groupBy(identity).values.map(_.length.toLong)
      val var18 = n * (n - 1) * (2 * n + 5) -
        tieGroups.map(g => g * (g - 1) * (2 * g + 5)).sum
      val (gn, gp, gs, gd, gv) = got(t)
      assert(gn == n && gp == n * (n - 1) / 2 && gs == s, s"type $t")
      assert(gd == tieGroups.size.toLong && gv == var18)
      assert(math.abs(gs) <= gp, "S bounded by the pair count")
    }
  }

  test("spearman: exact doubled-tie-rank replay; rho2 within [-1e6, 1e6]") {
    val row = AnalyticsExt.spearman(spark, sf).collect().head
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val spend = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val pts = cust.map { case (k, x) => (x, spend.getOrElse(k, 0L)) }
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val byV = vs.groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
      byV.keys.toSeq.sorted.foldLeft((0L, Map.empty[Long, Long])) {
        case ((below, acc), v) =>
          (below + byV(v), acc + (v -> (2 * below + byV(v) + 1)))
      }._2
    }
    val rx = rank2(pts.map(_._1).toSeq)
    val ry = rank2(pts.map(_._2).toSeq)
    val m = BigInt(pts.length)
    val xs = pts.map(p => BigInt(rx(p._1)))
    val ys = pts.map(p => BigInt(ry(p._2)))
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(a => a * a).sum
    val num = m * sxy - sx * sy
    val (denX, denY) = (m * sxx - sx * sx, m * syy - sy * sy)
    val exp = (if (num < 0) -1 else 1) *
      ((num.abs * 1000 / denX) * (num.abs * 1000 / denY))
    assert(row.getLong(0) == pts.length.toLong)
    assert(BigInt(row.getLong(1)) == exp, "rho2 differs from the scala replay")
    assert(math.abs(row.getLong(1)) <= 1000000L)
  }

  test("holt: sequential scala fold replay; forecast closes; level tracks a constant series") {
    val got = AnalyticsExt.holt(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    def tq(a: Long): Long = if (a < 0) -((-a) / 4) else a / 4
    val daily = Tables.events(spark, sf)
      .selectExpr(
        "event_type",
        "ts div 86400000000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("event_type", "day").agg(sum("cents").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val series = rows.sortBy(_._2)
      var l = series.head._3
      var b = 0L
      series.zipWithIndex.foreach { case ((_, day, y), i) =>
        if (i > 0) {
          val nl = tq(y + 3 * (l + b))
          b = tq((nl - l) + 3 * b)
          l = nl
        }
        val (gc, gl, gb, gf) = got((t, day))
        assert(gc == y && gl == l && gb == b, s"$t day $day")
        assert(gf == l + b, "forecast = level + trend")
      }
    }
    assert(got.size == daily.length)
  }

  test("top paths: scala sessionize+path replay; counts tie to #16's session count") {
    val got = AnalyticsExt.topPaths(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 AS ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 30L * 60 * 1000 * 1000
    val pathCounts = collection.mutable.Map.empty[String, (Long, Long)]
    var totalSessions = 0L
    ev.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var sessions = Vector.empty[Vector[String]]
      var prevTs = Long.MinValue
      sorted.foreach { case (_, ts, _, t) =>
        if (prevTs == Long.MinValue || ts - prevTs > gap) sessions :+= Vector(t)
        else sessions = sessions.init :+ (sessions.last :+ t)
        prevTs = ts
      }
      totalSessions += sessions.length
      sessions.foreach { s =>
        val p = s.take(3)
        val key = p.mkString(">")
        val (n, st) = pathCounts.getOrElse(key, (0L, Long.MaxValue))
        pathCounts(key) = (n + 1, math.min(st, p.length.toLong))
      }
    }
    val exp = pathCounts.toSeq.sortBy { case (p, (n, _)) => (-n, p) }.take(10)
      .zipWithIndex.map { case ((p, (n, st)), i) => (p, n, st, i + 1L) }
    assert(got.sortBy(_._4).toSeq == exp, "top paths differ from the scala replay")
    // the ranked paths cover at most every session once
    assert(got.map(_._2).sum <= totalSessions)
    val s16 = graft.operators.Analytics.sessionize(spark, sf).count()
    assert(totalSessions == s16, "replayed session count ties to #16")
  }

  test("ab test: staged-quotient z2 replay; chi2 cross-check within quantization") {
    val row = AnalyticsExt.abTest(spark, sf).collect().head
    val base = Tables.orders(spark, sf)
      .join(
        Tables.customer(spark, sf).selectExpr("c_custkey AS o_custkey", "c_mktsegment"),
        "o_custkey")
      .selectExpr("c_mktsegment = 'BUILDING' AS a", "o_orderstatus = 'F' AS conv")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val n1 = base.count(_._1).toLong
    val c1 = base.count(x => x._1 && x._2).toLong
    val n2 = base.length - n1
    val c2 = base.count(x => !x._1 && x._2).toLong
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n1, c1, n2, c2)))
    assert(row.getLong(4) == c1 * 1000000L / n1 && row.getLong(5) == c2 * 1000000L / n2)
    val d = BigInt(c1) * n2 - BigInt(c2) * n1
    assert(row.getLong(6) == (if (d < 0) -1L else 1L))
    val q1 = d * d / (BigInt(n1) * n2)
    val exp = q1 * (n1 + n2) * 1000000 / (BigInt(c1 + c2) * (n1 + n2 - c1 - c2))
    assert(BigInt(row.getLong(7)) == exp, "z2 differs from the staged replay")
    // float cross-check: the staged integer z2 tracks the textbook
    // formula within its quantization
    val (p1, p2) = (c1.toDouble / n1, c2.toDouble / n2)
    val p = (c1 + c2).toDouble / (n1 + n2)
    val zf = (p1 - p2) * (p1 - p2) / (p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(row.getLong(7) / 1e6 - zf) < 0.01 * math.max(1.0, zf))
  }

  test("markov stationary: exact 3-round power-iteration replay; mass nearly conserved") {
    val got = AnalyticsExt.markovStationary(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tr = AnalyticsExt.eventTransitions(spark, sf)
      .select("from_type", "to_type", "n_trans", "n_from")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val states = (tr.map(_._1) ++ tr.map(_._2)).distinct.sorted
    val k = states.length.toLong
    var pi: Map[String, Long] = states.map(_ -> 1000000L / k).toMap
    for (_ <- 1 to 3) {
      val next = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      tr.foreach { case (f, t, n, nf) => next(t) += pi(f) * n / nf }
      pi = states.map(s => s -> next(s)).toMap
    }
    assert(got == pi, "stationary vector differs from the scala replay")
    // each round loses < 1 per edge to truncation; mass stays near 1e6
    val mass = got.values.sum
    assert(mass <= 1000000L && mass >= 1000000L - 3 * tr.length, s"mass $mass")
  }

  test("control chart: squared-inequality replay; flag consistent with the ratio") {
    val rows = AnalyticsExt.controlChart(spark, sf).collect()
    val byDay = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "o_orderstatus = 'F' AS conv")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val t = byDay.length.toLong
    val ctot = byDay.count(_._2).toLong
    val exp = byDay.groupBy(_._1).map { case (d, xs) =>
      val (n, c) = (xs.length.toLong, xs.count(_._2).toLong)
      val dev = BigInt(c) * t - BigInt(ctot) * n
      val lim = BigInt(9) * ctot * (t - ctot) * n
      d -> ((n, c, c * 1000000L / n,
        if (dev * dev > lim) 1L else 0L, (dev * dev * 1000000 / lim).toLong))
    }
    assert(rows.length == exp.size)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(exp(d) == ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))),
        s"day $d")
      // flag and ratio tell the same story
      assert((r.getLong(4) == 1L) == (r.getLong(5) > 1000000L))
    }
  }

  test("safety stock: BigInt moment+isqrt replay; reorder closes; ss grows with variance") {
    val rows = AnalyticsExt.safetyStock(spark, sf).collect()
    val wd = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        "l_orderkey")
      .selectExpr(
        "l_partkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) div 7 AS week",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .groupBy("l_partkey", "week").agg(sum("q").as("qw"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    def isqrt(v: BigInt): BigInt = {
      if (v <= 0) BigInt(0)
      else {
        var s0 = BigInt(math.sqrt(v.toDouble).floor.toLong)
        if ((s0 + 1) * (s0 + 1) <= v) s0 += 1
        if (s0 * s0 > v) s0 -= 1
        s0
      }
    }
    val exp = wd.groupBy(_._1).collect { case (p, xs) if xs.length >= 2 =>
      val n = BigInt(xs.length)
      val sq = xs.map(x => BigInt(x._2)).sum
      val sqq = xs.map(x => BigInt(x._2) * x._2).sum
      val varQ = (n * sqq - sq * sq) / (n * (n - 1))
      val meanW = sq / n
      val ss = isqrt(8 * varQ)
      p -> ((n.toLong, sq.toLong, meanW.toLong, varQ.toLong, ss.toLong,
        (2 * meanW + ss).toLong))
    }.toMap
    assert(rows.length == exp.size)
    rows.foreach { r =>
      assert(exp(r.getLong(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))),
        s"part ${r.getLong(0)}")
    }
    // zero-variance parts hold zero safety stock
    rows.filter(_.getLong(4) == 0L).foreach(r => assert(r.getLong(5) == 0L))
  }

  test("xyz matrix: per-part class replay; cells partition the parts; ties to #191 totals") {
    val got = AnalyticsExt.xyzMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val abc = AnalyticsExt.abcPareto(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // per-ABC-class marginals of the matrix equal #191's rows exactly
    abc.foreach { case (cls, (nParts, rev)) =>
      val cells = got.filter(_._1._1 == cls).values
      assert(cells.map(_._1).sum == nParts, s"class $cls part count")
      assert(cells.map(_._2).sum == rev, s"class $cls revenue")
    }
    // classes are legal and shares sum to ~1e6 (floor loss < cells)
    assert(got.keys.forall { case (a, x) => Set("A", "B", "C")(a) && Set("X", "Y", "Z")(x) })
    val share = got.values.map(_._3).sum
    assert(share <= 1000000L && share >= 1000000L - got.size)
  }

  test("nation similarity: brute-force set replay; jaccard symmetric-complete and bounded") {
    val got = AnalyticsExt.nationSimilarity(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val np = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_custkey"),
        "l_orderkey")
      .join(Tables.customer(spark, sf).selectExpr("c_custkey AS o_custkey", "c_nationkey"),
        "o_custkey")
      .selectExpr("CAST(c_nationkey AS BIGINT) AS n", "l_partkey")
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sets = np.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val nations = sets.keys.toSeq.sorted
    val exp = (for {
      i <- nations.indices; j <- (i + 1) until nations.length
      (a, b) = (nations(i), nations(j))
      inter = (sets(a) & sets(b)).size.toLong
      if inter > 0
    } yield (a, b) -> ((sets(a).size.toLong, sets(b).size.toLong, inter,
      inter * 1000000L / (sets(a).size + sets(b).size - inter)))).toMap
    assert(got == exp, "similarity differs from the brute-force set replay")
    got.values.foreach { case (_, _, _, j) => assert(j >= 0 && j <= 1000000L) }
  }

  test("discounted ltv: dyadic decay replay; discounted never exceeds raw") {
    val got = AnalyticsExt.discountedLtv(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val o = Tables.orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mmax = o.map(_._2).max
    val exp = o.groupBy(_._1).map { case (c, xs) =>
      c -> ((xs.length.toLong, xs.map(_._3).sum,
        xs.map(x => x._3 / (1L << math.min(mmax - x._2, 62L).toInt)).sum))
    }
    assert(got == exp, "discounted ltv differs from the scala replay")
    got.values.foreach { case (_, raw, disc) => assert(disc <= raw) }
  }

  test("burstiness: single-quotient fano replay; uniform-series floor") {
    val got = AnalyticsExt.burstiness(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 86400000000000 AS day")
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, xs) =>
      val n = BigInt(xs.length)
      if (n >= 2) {
        val s = xs.map(x => BigInt(x._2)).sum
        val ss = xs.map(x => BigInt(x._2) * x._2).sum
        val fano = ((n * ss - s * s) * 1000000 / ((n - 1) * s)).toLong
        assert(got(t) == ((n.toLong, s.toLong, fano)), s"type $t")
        assert(fano >= 0)
      }
    }
  }

  test("forecast backtest: lag replay over the holt frame; errors tie to the fold") {
    val got = AnalyticsExt.forecastBacktest(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val h = AnalyticsExt.holt(spark, sf)
      .select("event_type", "day", "cents", "forecast_next_c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    h.groupBy(_._1).foreach { case (t, rows) =>
      val s = rows.sortBy(_._2).toSeq
      val pairs = s.sliding(2).collect { case Seq(a, b) => (b._3, a._4, a._3) }.toSeq
      val hs = pairs.map { case (y, f, _) => math.abs(y - f) }.sum
      val ns = pairs.map { case (y, _, py) => math.abs(y - py) }.sum
      val n = pairs.length.toLong
      assert(got(t) == ((n, hs, ns, hs / n, ns / n, if (hs < ns) 1L else 0L)), s"type $t")
    }
  }

  test("interpolation kernel: planted gaps filled exactly, falling segments sign-safe") {
    import spark.implicits._
    // planted series: a rising gap (10 -> 40 over 3 days), a falling
    // gap with a truncation-sensitive slope, and a dense pair
    val daily = Seq(
      ("a", 0L, 10L), ("a", 3L, 40L),       // rising: expect 20, 30
      ("b", 0L, 10L), ("b", 3L, -10L),      // falling: -20/3 steps
      ("c", 0L, 5L), ("c", 1L, 7L)          // no gap
    ).toDF("event_type", "day", "c")
    val got = AnalyticsExt.interpolateDaily(daily)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(("a", 1L)) == ((20L, 1L)) && got(("a", 2L)) == ((30L, 1L)))
    // b: v(d) = 10 + trunc(-20*d/3): d=1 -> 10-6=4; d=2 -> 10-13=-3
    assert(got(("b", 1L)) == ((4L, 1L)) && got(("b", 2L)) == ((-3L, 1L)))
    // observed rows pass through unmodified
    assert(got(("a", 0L)) == ((10L, 0L)) && got(("b", 3L)) == ((-10L, 0L)))
    assert(got(("c", 0L)) == ((5L, 0L)) && got(("c", 1L)) == ((7L, 0L)))
    assert(got.size == 10)
    // and on the real corpus the operator is conservative: every
    // observed day survives bit-identically
    val obs = AnalyticsExt.interpolateGaps(spark, sf)
      .filter(org.apache.spark.sql.functions.col("is_interpolated") === 0L)
      .count()
    val dailyN = Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 86400000000000 AS day").distinct().count()
    assert(obs == dailyN)
  }

  test("power analysis: exact ceil-div replay; n falls with MDE; detects the textbook point") {
    val rows = AnalyticsExt.powerAnalysis(spark, sf).orderBy("mde_bp").collect()
    val (t, c) = {
      val o = Tables.orders(spark, sf)
        .selectExpr("o_orderstatus = 'F' AS f").collect().map(_.getBoolean(0))
      (o.length.toLong, o.count(identity).toLong)
    }
    val z2 = BigInt(2802) * 2802
    var prev = Long.MaxValue
    rows.foreach { r =>
      val mde = r.getLong(0)
      val num = 2 * BigInt(c) * (t - c) * z2 * BigInt(100000000L)
      val den = BigInt(t) * t * mde * mde * 1000000L
      val exp = ((num + den - 1) / den).toLong
      assert(r.getLong(1) == c * 1000000L / t)
      assert(r.getLong(2) == exp, s"mde $mde")
      assert(r.getLong(2) <= prev, "required n decreases with larger MDE")
      prev = r.getLong(2)
    }
    assert(rows.length == 10)
    // float cross-check at one point: n ~ 2*p(1-p)*(2.802)^2/d^2
    val p = c.toDouble / t
    val d = rows.head.getLong(0) / 10000.0
    val nf = 2 * p * (1 - p) * 2.802 * 2.802 / (d * d)
    assert(math.abs(rows.head.getLong(2) - nf) <= math.max(2.0, nf * 0.001))
  }

  test("peak concurrency: sequential sweep replay; peak bounded by sessions that day") {
    val got = AnalyticsExt.peakConcurrency(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // replay: sessions from #16's frame, then a global +-1 sweep
    val sess = graft.operators.Analytics.sessionize(spark, sf)
      .select("session_start", "session_end")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val events = (sess.map(s => (s._1, 1L)) ++ sess.map(s => (s._2 + 1, -1L)))
      .sortBy(e => (e._1, e._2))
    var conc = 0L
    val best = collection.mutable.Map.empty[Long, (Long, Long)]
    events.foreach { case (ts, d) =>
      conc += d
      val day = ts / 86400000000L
      val (bc, _) = best.getOrElse(day, (Long.MinValue, 0L))
      if (conc > bc) best(day) = (conc, ts)
    }
    assert(got == best.toMap, "peak differs from the sequential sweep replay")
    // peak can never exceed the number of sessions alive that day
    val perDay = sess.groupBy(_._1 / 86400000000L).map { case (d, xs) => d -> xs.length.toLong }
    got.foreach { case (d, (pk, _)) =>
      assert(pk >= 1)
      // sessions starting today plus any carried from earlier days
      val startedUpTo = sess.count(_._1 / 86400000000L <= d).toLong
      assert(pk <= startedUpTo)
    }
    assert(perDay.nonEmpty)
  }

  test("new vs repeat: per-month scala replay; first months are all-new; cents conserved") {
    val got = AnalyticsExt.newVsRepeat(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val o = Tables.orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val firstM = o.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }
    val exp = o.groupBy(_._2).map { case (m, xs) =>
      val nw = xs.filter(x => firstM(x._1) == m)
      val rp = xs.filterNot(x => firstM(x._1) == m)
      val (nc, rc) = (nw.map(_._3).sum, rp.map(_._3).sum)
      m -> ((xs.length.toLong, nw.length.toLong, nc, rc,
        rc * 1000000L / math.max(nc + rc, 1L)))
    }
    assert(got == exp, "split differs from the scala replay")
    // the corpus's first month is definitionally all-new
    val m0 = o.map(_._2).min
    assert(got(m0)._4 == 0L, "no repeat revenue before anyone is repeat")
    // cents conserved across the split
    assert(got.values.map(v => v._3 + v._4).sum == o.map(_._3).sum)
  }

  test("stickiness: dau/wau replay; bounded in (0, 1e6]; wau dominates dau") {
    val got = AnalyticsExt.stickiness(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val pres = Tables.events(spark, sf)
      .selectExpr("ts div 86400000000000 AS day", "user_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = pres.map(_._1).distinct
    val exp = days.map { d =>
      val dau = pres.count(_._1 == d).toLong
      val wau = pres.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).distinct.length.toLong
      d -> ((dau, wau, dau * 1000000L / wau))
    }.toMap
    assert(got == exp, "stickiness differs from the scala replay")
    got.values.foreach { case (dau, wau, s) =>
      assert(dau <= wau && s > 0 && s <= 1000000L)
    }
  }

  test("repurchase cycle: per-customer gap-median replay; overdue ratio closes") {
    val got = AnalyticsExt.repurchaseCycle(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val o = Tables.orders(spark, sf)
      .selectExpr(
        "o_custkey", "o_orderkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = o.groupBy(_._1).collect { case (c, xs) if xs.length >= 2 =>
      val s = xs.sortBy(x => (x._3, x._2))
      val gaps = s.sliding(2).collect { case Array(a, b) => (b._2, b._3, b._3 - a._3) }.toSeq
      val sorted = gaps.sortBy(g => (g._3, g._1))
      val med = sorted(((gaps.length + 1) / 2) - 1)._3
      val last = gaps.maxBy(g => (g._2, g._1))._3
      c -> ((gaps.length.toLong, med, last, last * 1000000L / math.max(med, 1L)))
    }
    assert(got == exp.toMap, "repurchase cycle differs from the scala replay")
    // single-order customers never appear
    assert(!o.groupBy(_._1).collect { case (c, xs) if xs.length == 1 => c }
      .exists(got.contains))
  }

  test("dup payments: every planted resubmission flagged; exact group replay") {
    val got = AnalyticsExt.dupPayments(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    val o = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "o_orderkey", "CAST(o_orderdate AS STRING) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val aug = o ++ o.filter(_._2 % 499 == 0)
    val exp = aug.groupBy(x => (x._1, x._3, x._4)).collect {
      case (k, xs) if xs.length > 1 =>
        k -> ((xs.length.toLong, (xs.length - 1).toLong * k._3))
    }
    assert(got == exp.toMap, "dup groups differ from the replay")
    // every planted resubmission surfaces
    o.filter(_._2 % 499 == 0).foreach { x =>
      assert(got.contains((x._1, x._3, x._4)), s"planted dup of order ${x._2} missed")
    }
    assert(got.nonEmpty)
  }

  test("structuring: planted quarter-splits flagged when they cross the threshold") {
    val rows = AnalyticsExt.structuring(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val o = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "o_orderkey", "CAST(o_orderdate AS STRING) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val planted = o.filter(_._2 % 977 == 0).flatMap { x =>
      (1 to 4).map(i =>
        (x._1, x._2 * 10 + i + 100000000L, x._3,
          if (i < 4) x._4 / 4 else x._4 - 3 * (x._4 / 4)))
    }
    val aug = o ++ planted
    val n = aug.length.toLong
    val thr = aug.map(_._4).sorted.apply((((n + 1) * 9 / 10) - 1).toInt)
    val exp = aug.filter(_._4 < thr).groupBy(x => (x._1, x._3)).collect {
      case (k, xs) if xs.length >= 3 && xs.map(_._4).sum >= thr =>
        k -> ((thr, xs.length.toLong, xs.map(_._4).sum))
    }
    assert(rows == exp.toMap, "structuring groups differ from the replay")
    // plants from big-enough sources must be flagged
    o.filter(x => x._2 % 977 == 0 && x._4 >= thr && x._4 / 4 < thr &&
        o.count(y => y._1 == x._1 && y._3 == x._3 && y._4 < thr) == 0)
      .foreach { x => assert(rows.contains((x._1, x._3)), s"planted split of ${x._2} missed") }
    assert(rows.nonEmpty)
  }

  test("lag features: point-in-time correctness — every feature strictly past-only") {
    val rows = AnalyticsExt.lagFeatures(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5), r.getLong(6))))
      .toMap
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 86400000000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("event_type", "day").agg(sum("c").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, xs) =>
      val s = xs.sortBy(_._2)
      s.zipWithIndex.foreach { case ((_, day, y), i) =>
        val (gy, l1, l7, t7, dow) = rows((t, day))
        assert(gy == y)
        assert(l1 == (if (i >= 1) Some(s(i - 1)._3) else None))
        assert(l7 == (if (i >= 7) Some(s(i - 7)._3) else None))
        assert(t7 == s.slice(math.max(0, i - 7), i).map(_._3).sum, s"$t $day trail7")
        assert(dow == ((day % 7) + 7) % 7)
      }
    }
    assert(rows.size == daily.length)
  }

  test("target encoding: leave-one-out replay; encoding never sees its own label") {
    val got = AnalyticsExt.targetEncoding(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val o = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).selectExpr("c_custkey AS o_custkey", "c_mktsegment"),
        "o_custkey")
      .selectExpr("o_orderkey", "c_mktsegment", "CAST(o_orderstatus = 'F' AS LONG) AS y")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val seg = o.groupBy(_._2).map { case (s, xs) => s -> ((xs.length.toLong, xs.map(_._3).sum)) }
    val prior = o.map(_._3).sum * 1000000L / o.length
    o.foreach { case (k, s, y) =>
      val (n, c) = seg(s)
      val exp = ((c - y) * 1000000L + prior * 20L) / (n - 1 + 20)
      assert(got(k) == ((s, y, exp)), s"order $k")
    }
    // the LOO property: two same-segment orders with different labels
    // get different encodings — the label leaks into NEITHER
    val bySeg = o.groupBy(_._2).values.find(xs => xs.map(_._3).distinct.length == 2)
    bySeg.foreach { xs =>
      val e1 = got(xs.find(_._3 == 1L).get._1)._3
      val e0 = got(xs.find(_._3 == 0L).get._1)._3
      assert(e1 < e0, "excluding a positive label must lower the encoding")
    }
  }

  test("hash collisions: exact placement replay; rate rises as width shrinks") {
    val got = AnalyticsExt.hashCollisions(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val cats = Tables.part(spark, sf)
      .selectExpr("p_brand || '|' || p_type AS cat").distinct()
      .collect().map(_.getString(0))
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex("graft-fh-1:" + s).take(15), 16)
    Seq(256L, 1024L, 4096L).foreach { w =>
      val buckets = cats.map(c => math.floorMod(h60(c), w)).groupBy(identity)
      val nColl = buckets.values.filter(_.length > 1).map(_.length.toLong).sum
      assert(got(w) == ((cats.length.toLong, buckets.size.toLong, nColl,
        nColl * 1000000L / cats.length)), s"width $w")
    }
    // shrinking the table can only worsen (or tie) the collision rate
    assert(got(256L)._4 >= got(1024L)._4 && got(1024L)._4 >= got(4096L)._4)
  }

  test("catalog breadth: per-month scala replay; cumulative closes to the full catalog") {
    val got = AnalyticsExt.catalogBreadth(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val mp = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        "l_orderkey")
      .selectExpr(
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "l_partkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val first = mp.groupBy(_._2).map { case (p, xs) => p -> xs.map(_._1).min }
    val months = mp.map(_._1).distinct.sorted
    var cum = 0L
    months.foreach { m =>
      val active = mp.count(_._1 == m).toLong
      val nw = first.count(_._2 == m).toLong
      cum += nw
      assert(got(m) == ((active, nw, cum)), s"month $m")
    }
    assert(cum == first.size.toLong, "cumulative closes to the distinct catalog")
    assert(got.size == months.length)
  }

  test("ship delay: rank-percentile replay per priority; p50 <= p90; share exact") {
    val got = AnalyticsExt.shipDelay(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val d = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .selectExpr("o_orderkey AS l_orderkey", "o_orderdate", "o_orderpriority"),
        "l_orderkey")
      .selectExpr("o_orderpriority AS p", "l_orderkey", "CAST(l_linenumber AS BIGINT) AS ln",
        "CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT) AS delay")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    d.groupBy(_._1).foreach { case (p, xs) =>
      val s = xs.sortBy(x => (x._4, x._2, x._3)).map(_._4)
      val n = s.length.toLong
      val p50 = s((((n + 1) / 2) - 1).toInt)
      val p90 = s(((((n * 9) + 9) / 10) - 1).toInt)
      val late = s.count(_ > 60).toLong
      assert(got(p) == ((n, p50, p90, late, late * 1000000L / n)), s"priority $p")
      assert(p50 <= p90)
    }
  }

  test("link prediction: scala wedge replay; results never adjacent; top-k total order") {
    val got = AnalyticsExt.linkPrediction(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val baskets = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sorted).toSeq
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        val p = (ps(i), ps(j))
        pairCount(p) = pairCount.getOrElse(p, 0) + 1
      }
    }
    // NB: .collect on a Map yielding tuples would rebuild a Map keyed
    // by the first element — filter/keys keeps every pair
    val edges = pairCount.filter(_._2 >= 2).keys.toSet
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1
      deg(b) = deg.getOrElse(b, 0L) + 1
    }
    val nbrs = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      if (deg(a) <= 64) nbrs(a) = b :: nbrs.getOrElse(a, Nil)
      if (deg(b) <= 64) nbrs(b) = a :: nbrs.getOrElse(b, Nil)
    }
    val cnCount = scala.collection.mutable.Map.empty[(Long, Long), Long]
    nbrs.values.foreach { vsRaw =>
      val vs = vsRaw.sorted
      for (i <- vs.indices; j <- i + 1 until vs.length) {
        val p = (vs(i), vs(j))
        cnCount(p) = cnCount.getOrElse(p, 0L) + 1
      }
    }
    val cn = cnCount.filter { case (p, _) => !edges.contains(p) }
    val scored = cn.toSeq.map { case ((a, b), c) =>
      (a, b, c, deg(a), deg(b), c * 1000000L / (deg(a) + deg(b) - c))
    }
    val want = scored.sortBy(t => (-t._6, -t._3, t._1, t._2)).take(100)
    assert(got.toSeq.sortBy(t => (-t._6, -t._3, t._1, t._2)) == want)
    got.foreach { case (a, b, c, da, db, _) =>
      assert(!edges.contains((a, b)), s"($a,$b) already adjacent")
      assert(c <= math.min(da, db), "common neighbors bounded by min degree")
    }
  }

  test("cusum: closed form equals the recursive max(0, .) fold; alarms match threshold") {
    val got = AnalyticsExt.cusumChart(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    val byDay = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("d").agg(sum("c").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = byDay.length.toLong
    val sx = byDay.map(_._2).sum
    val mu = sx / n
    val sxx = byDay.map(x => BigInt(x._2) * x._2).sum
    val varC = (BigInt(n) * sxx - BigInt(sx) * sx) / (BigInt(n) * n)
    // exact integer sqrt: search around the double seed
    var s0 = BigInt(math.sqrt(varC.toDouble).toLong)
    while (s0 * s0 > varC) s0 -= 1
    while ((s0 + 1) * (s0 + 1) <= varC) s0 += 1
    val h = 4L * s0.toLong
    // the recursive definition the closed form must reproduce
    var cp = 0L
    var cm = 0L
    byDay.zip(got).foreach { case ((d, x), g) =>
      cp = math.max(0L, cp + (x - mu))
      cm = math.max(0L, cm - (x - mu))
      assert(g._1 == d && g._2 == x)
      assert(g._3 == cp, s"day $d c_plus")
      assert(g._4 == cm, s"day $d c_minus")
      assert(g._5 == h)
      assert(g._6 == (if (cp > h) 1L else 0L))
      assert(g._7 == (if (cm > h) 1L else 0L))
    }
  }

  test("lorenz: decile replay; curve convex, shares close to exactly one million") {
    val got = AnalyticsExt.lorenzCurve(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val per = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("o_custkey").agg(sum("c").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = per.sortBy(t => (t._2, t._1))
    val nTot = sorted.length.toLong
    val total = sorted.map(_._2).sum
    val byDecile = sorted.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / nTot }
    var cum = 0L
    got.foreach { case (d, nc, dc, cumc, share) =>
      val want = byDecile(d)
      assert(nc == want.length.toLong, s"decile $d count")
      assert(dc == want.map(_._1._2).sum, s"decile $d cents")
      cum += dc
      assert(cumc == cum)
      assert(share == (BigInt(cum) * 1000000 / total).toLong)
    }
    assert(got.last._5 == 1000000L)
    // convexity: per-customer decile means never decrease (decile
    // SUMS can dip when a later decile holds one fewer customer)
    got.sliding(2).foreach { w =>
      assert(BigInt(w(0)._3) * w(1)._2 <= BigInt(w(1)._3) * w(0)._2)
    }
  }

  test("did: 2x2 cell replay; did equals the double difference of floor means") {
    val r = AnalyticsExt.diffInDiff(spark, sf).collect().head
    val lines = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .selectExpr("o_orderkey AS l_orderkey",
          "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day"),
        "l_orderkey")
      .join(Tables.part(spark, sf)
        .selectExpr("p_partkey AS l_partkey",
          "CAST(p_type LIKE 'PROMO%' AS BIGINT) AS treated"),
        "l_partkey")
      .selectExpr("treated", "day",
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day")
      .collect().map(_.getLong(0))
    val mid = (days.min + days.max + 1) / 2
    def cell(t: Long, p: Long): (Long, Long) = {
      val xs = lines.filter(x => x._1 == t && (if (x._2 >= mid) 1L else 0L) == p).map(_._3)
      (xs.length.toLong, xs.sum / xs.length)
    }
    val (nt0, mt0) = cell(1, 0); val (nt1, mt1) = cell(1, 1)
    val (nc0, mc0) = cell(0, 0); val (nc1, mc1) = cell(0, 1)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((nt0, nt1, nc0, nc1)))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) == ((mt0, mt1, mc0, mc1)))
    assert(r.getLong(8) == (mt1 - mt0) - (mc1 - mc0))
  }

  test("mann-whitney: doubled-midrank replay; U1+U2 identity; CL in [0, 1e6]") {
    val r = AnalyticsExt.mannWhitney(spark, sf).collect().head
    val lines = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf)
        .selectExpr("p_partkey AS l_partkey", "CAST(p_type LIKE 'PROMO%' AS BIGINT) AS t"),
        "l_partkey")
      .selectExpr("t", "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = lines.length.toLong
    val n1 = lines.count(_._1 == 1L).toLong
    val n2 = n - n1
    // doubled midranks: 2*midrank(v) = 2*cum_below(v) + cnt(v) + 1
    val byVal = lines.groupBy(_._2).map { case (v, xs) =>
      v -> (xs.length.toLong, xs.count(_._1 == 1L).toLong)
    }.toSeq.sortBy(_._1)
    var cum = 0L
    var r1x2 = 0L
    var tieT = BigInt(0)
    byVal.foreach { case (_, (cnt, c1)) =>
      r1x2 += c1 * (2 * cum + cnt + 1)
      tieT += BigInt(cnt) * cnt * cnt - cnt
      cum += cnt
    }
    val u1x2 = r1x2 - n1 * (n1 + 1)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((n1, n2, u1x2)))
    assert(r.getLong(3) == (BigInt(u1x2) * 1000000 / (2 * BigInt(n1) * n2)).toLong)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    // U1 + U2 = n1*n2 identity on the doubled grid: replay group 2
    var cum2 = 0L
    var r2x2 = 0L
    byVal.foreach { case (_, (cnt, c1)) =>
      r2x2 += (cnt - c1) * (2 * cum2 + cnt + 1)
      cum2 += cnt
    }
    val u2x2 = r2x2 - n2 * (n2 + 1)
    assert(u1x2 + u2x2 == 2 * n1 * n2, "U1 + U2 = n1*n2")
    val varU = BigInt(n1) * n2 * (BigInt(n + 1) * n * (n - 1) - tieT) /
      (12 * BigInt(n) * (n - 1))
    var s0 = BigInt(math.sqrt(varU.toDouble).toLong)
    while (s0 * s0 > varU) s0 -= 1
    while ((s0 + 1) * (s0 + 1) <= varU) s0 += 1
    val num = BigInt(u1x2) - BigInt(n1) * n2
    val zWant = (if (num >= 0) 1 else -1) * (num.abs * 1000000 / (2 * s0))
    assert(r.getLong(4) == zWant.toLong)
  }

  test("runs test: sequential sign-change replay; runs bounded by used days") {
    val r = AnalyticsExt.runsTest(spark, sf).collect().head
    val byDay = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("d").agg(sum("c").as("x"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = byDay.length.toLong
    val med = byDay.map(x => (x._2, x._1)).sorted.apply((((n + 1) / 2) - 1).toInt)._1
    val signs = byDay.sortBy(_._1).filter(_._2 != med).map(x => if (x._2 > med) 1L else 0L)
    val nU = signs.length.toLong
    val n1 = signs.count(_ == 1L).toLong
    val runs = 1L + signs.sliding(2).count(w => w.length == 2 && w(0) != w(1)).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((nU, n1, nU - n1, med, runs)))
    assert(r.getLong(5) == 1000000L + 2 * n1 * (nU - n1) * 1000000L / nU)
    assert(runs >= 1L && runs <= nU)
    val q = 2 * n1 * (nU - n1) * (2 * n1 * (nU - n1) - nU) / (nU - 1)
    var s0 = math.sqrt(q.toDouble).toLong
    while (s0 * s0 > q) s0 -= 1
    while ((s0 + 1) * (s0 + 1) <= q) s0 += 1
    val num = runs * nU - nU - 2 * n1 * (nU - n1)
    assert(r.getLong(6) == (if (num >= 0) 1L else -1L) * (math.abs(num) * 1000000L / s0))
  }

  test("dow seasonality: 7-row replay; day and cents totals conserved") {
    val got = AnalyticsExt.dowSeasonality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val daily = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("d").agg(sum("c").as("x"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val byDow = daily.groupBy(x => (x._1 + 3) % 7)
    val td = daily.length.toLong
    val tc = daily.map(_._2).sum
    assert(got.length == byDow.size && got.length == 7)
    got.foreach { case (dow, nd, dc, mean, idx) =>
      val xs = byDow(dow)
      assert(nd == xs.length.toLong && dc == xs.map(_._2).sum)
      assert(mean == dc / nd)
      assert(idx == (BigInt(dc / nd) * 1000000 / (tc / td)).toLong)
    }
    assert(got.map(_._2).sum == td && got.map(_._3).sum == tc)
  }

  test("holt-winters: sequential scala fold replay; slot moves only on its weekday") {
    val nsPerDay = 86400L * 1000000000L
    val got = AnalyticsExt.holtWinters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    def q(a: Long): Long = if (a < 0) -((-a) / 4) else a / 4
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", s"ts div ${nsPerDay}L AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("event_type", "day").agg(sum("c").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    var checked = 0
    daily.groupBy(_._1).foreach { case (et, xs) =>
      val steps = xs.map(t => (t._2, t._3)).sortBy(_._1)
      var l = steps.head._2
      var b = 0L
      val s = Array.fill(7)(0L)
      steps.zipWithIndex.foreach { case ((day, y), i) =>
        if (i > 0) {
          val dow = (day % 7).toInt
          val sOld = s(dow)
          val nl = q((y - sOld) + 3 * (l + b))
          val nb = q((nl - l) + 3 * b)
          val before = s.clone()
          s(dow) = q((y - nl) + 3 * sOld)
          // every other slot is untouched by this step
          (0 until 7).filter(_ != dow).foreach(k => assert(s(k) == before(k)))
          l = nl; b = nb
        }
        val fc = l + b + s(((day + 1) % 7).toInt)
        assert(got((et, day)) == ((y, l, b, s((day % 7).toInt), fc)), s"$et day $day")
        checked += 1
      }
    }
    assert(checked == got.size)
  }

  test("abc migration: per-period class replay; matrix conserves the part universe") {
    val got = AnalyticsExt.abcMigration(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val lines = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .selectExpr("o_orderkey AS l_orderkey",
          "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day"),
        "l_orderkey")
      .selectExpr("l_partkey", "day",
        "CAST(floor(l_extendedprice * (1.0d - l_discount)) AS BIGINT) AS r")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val days = lines.map(_._2)
    val mid = (days.min + days.max + 1) / 2
    def classify(period: Int): Map[Long, (String, Long)] = {
      val rev = lines.filter(x => (if (x._2 >= mid) 1 else 0) == period)
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._3).sum }
      val tot = rev.values.sum
      var cum = 0L
      rev.toSeq.sortBy(t => (-t._2, t._1)).map { case (p, rv) =>
        cum += rv
        val share = BigInt(cum) * 1000000 / tot
        val cls = if (share <= 800000) "A" else if (share <= 950000) "B" else "C"
        p -> ((cls, rv))
      }.toMap
    }
    val c0 = classify(0)
    val c1 = classify(1)
    val allParts = c0.keySet ++ c1.keySet
    val want = allParts.toSeq
      .map { p =>
        (c0.get(p).map(_._1).getOrElse("-"), c1.get(p).map(_._1).getOrElse("-"),
          c1.get(p).map(_._2).getOrElse(0L))
      }
      .groupBy(t => (t._1, t._2))
      .map { case (k, xs) => k -> ((xs.length.toLong, xs.map(_._3).sum)) }
    assert(got == want)
    assert(got.values.map(_._1).sum == allParts.size.toLong)
  }

  test("vintage ramp: age replay; revenue conserved; age 0 covers every part") {
    val got = AnalyticsExt.vintageRamp(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val pm = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        "l_orderkey")
      .selectExpr("l_partkey",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(l_extendedprice * (1.0d - l_discount)) AS BIGINT) AS r")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((p, m), xs) => (p, m, xs.map(_._3).sum) }
    val first = pm.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).min }
    val want = pm.groupBy(t => t._2 - first(t._1)).map { case (age, xs) =>
      age -> ((xs.size.toLong, xs.map(_._3).sum))
    }
    assert(got.size == want.size)
    want.foreach { case (age, (n, rv)) =>
      assert(got(age) == ((n, rv, rv / n)), s"age $age")
    }
    // age 0 holds exactly one part-month per part (its first month)
    assert(got(0L)._1 == first.size.toLong)
    assert(got.values.map(_._2).sum == pm.map(_._3).sum)
  }

  test("monthly bands: rank replay per month; p25 <= p50 <= p75") {
    val got = AnalyticsExt.monthlyBands(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val daily = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("m", "d").agg(sum("c").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (m, xs) =>
      val s = xs.map(t => (t._3, t._2)).sorted.map(_._1)
      val n = s.length.toLong
      val p25 = s(((n + 3) / 4 - 1).toInt)
      val p50 = s(((n + 1) / 2 - 1).toInt)
      val p75 = s(((3 * n + 3) / 4 - 1).toInt)
      assert(got(m) == ((n, p25, p50, p75)), s"month $m")
      assert(p25 <= p50 && p50 <= p75)
    }
    assert(got.size == daily.map(_._1).distinct.length)
  }

  test("seasonal strength: BigInt moment replay over the decomposition frame; bounded") {
    val got = AnalyticsExt.seasonalStrength(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val frame = AnalyticsExt.seasonalDecomp(spark, sf)
      .selectExpr("event_type", "cents - trend_cents AS det",
        "cents - seasonal_cents AS des", "remainder_cents AS rem")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    frame.groupBy(_._1).foreach { case (et, xs) =>
      val n = BigInt(xs.length)
      def v(sel: ((String, Long, Long, Long)) => Long): BigInt = {
        val s = xs.map(x => BigInt(sel(x))).sum
        val ss = xs.map(x => BigInt(sel(x)) * sel(x)).sum
        n * ss - s * s
      }
      val vd = v(_._2).max(1)
      val vs = v(_._3).max(1)
      val vr = v(_._4)
      val fs = (((vd - vr) * 1000000) / vd).max(0).toLong
      val ft = (((vs - vr) * 1000000) / vs).max(0).toLong
      assert(got(et) == ((xs.length.toLong, fs, ft)), et)
      assert(fs >= 0 && fs <= 1000000L && ft >= 0 && ft <= 1000000L)
    }
    assert(got.size == frame.map(_._1).distinct.length)
  }

  test("eoq: exact isqrt replay per part; implied orders identity") {
    val got = AnalyticsExt.eoq(spark, sf).collect()
    assert(got.nonEmpty)
    val demand = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .groupBy("l_partkey").sum("q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val price = Tables.part(spark, sf)
      .selectExpr("p_partkey", "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val (pk, d, h, e) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d == demand(pk) && h == price(pk))
      val x = (BigInt(2) * d * 10000) / h
      assert(BigInt(e) * e <= x && (BigInt(e) + 1) * (BigInt(e) + 1) > x, s"isqrt at part $pk")
      if (e > 0) assert(r.getLong(4) == d / e) else assert(r.isNullAt(4))
    }
  }

  test("nelson-aalen: per-step e9 hazard replay; cumulative is the exact running sum") {
    val got = AnalyticsExt.nelsonAalen(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // independent lifetime replay
    val byCust = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m")
      .groupBy("o_custkey").agg(org.apache.spark.sql.functions.expr("min(m) AS m0"),
        org.apache.spark.sql.functions.expr("max(m) AS m1"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val mmax = byCust.map(_._2).max
    val steps = byCust
      .map { case (m0, m1) => (m1 - m0, if (m1 < mmax - 2) 1L else 0L) }
      .groupBy(_._1).map { case (t, xs) => (t, xs.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    var atRisk = steps.map(_._2).sum
    var cum = 0L
    steps.zip(got).foreach { case ((t, cnt, d), (gt, gn, gd, ghz, gcum)) =>
      assert(gt == t && gn == atRisk && gd == d)
      val hz = d * 1000000000L / atRisk
      cum += hz
      assert(ghz == hz && gcum == cum)
      atRisk -= cnt
    }
  }

  test("logrank: full BigInt replay; chi2 nonnegative; group counts conserve customers") {
    val r = AnalyticsExt.logRank(spark, sf).collect().head
    val rows = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(
        org.apache.spark.sql.functions.expr("CAST(min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS BIGINT) AS m0"),
        org.apache.spark.sql.functions.expr("CAST(max(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS BIGINT) AS m1"))
      .join(Tables.customer(spark, sf)
        .selectExpr("c_custkey AS o_custkey", "c_mktsegment"), "o_custkey")
      .selectExpr("m0", "m1", "CAST(c_mktsegment = 'BUILDING' AS BIGINT) AS a")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val mmax = rows.map(_._2).max
    val lifes = rows.map { case (m0, m1, a) => (m1 - m0, if (m1 < mmax - 2) 1L else 0L, a) }
    val byT = lifes.groupBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._3 == 1L).toLong, xs.count(_._3 == 0L).toLong,
        xs.filter(_._3 == 1L).map(_._2).sum, xs.filter(_._3 == 0L).map(_._2).sum)
    }.toSeq.sortBy(_._1)
    var (na, nb) = (byT.map(_._2).sum, byT.map(_._3).sum)
    var (ea, ve) = (BigInt(0), BigInt(0))
    byT.foreach { case (_, ca, cb, da, db) =>
      val (dd, nn) = (da + db, na + nb)
      if (dd > 0 && nn > 1) {
        ea += BigInt(dd) * na * 1000000000L / nn
        ve += BigInt(dd) * na * nb * (nn - dd) * 1000000000L / (BigInt(nn) * nn * (nn - 1))
      }
      na -= ca; nb -= cb
    }
    val (oa, ob) = (byT.map(_._4).sum, byT.map(_._5).sum)
    assert(r.getLong(0) == byT.map(_._2).sum && r.getLong(1) == byT.map(_._3).sum)
    assert(r.getLong(2) == oa && r.getLong(3) == ob)
    assert(BigInt(r.getLong(4)) == ea && BigInt(r.getLong(5)) == ve)
    val dev = BigInt(oa) * 1000000000L - ea
    assert(BigInt(r.getLong(6)) == dev * dev / ve / 1000)
    assert(r.getLong(6) >= 0L)
  }

  test("lift table: tie-block decile replay; gains close at exactly 1e6; counts conserve") {
    val got = AnalyticsExt.liftTable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).sortBy(_._1)
    val scored = Tables.orders(spark, sf)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v",
        "CAST(o_orderstatus = 'F' AS BIGINT) AS pos")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val nt = scored.length.toLong
    val pt = scored.map(_._2).sum
    // tie-block decile: rows with strictly higher v, times 10, div N
    val byV = scored.groupBy(_._1).map { case (v, xs) =>
      (v, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(-_._1)
    var above = 0L
    val decAgg = collection.mutable.Map[Long, (Long, Long)]().withDefaultValue((0L, 0L))
    byV.foreach { case (_, cnt, p) =>
      val d = above * 10 / nt
      val (n0, p0) = decAgg(d)
      decAgg(d) = (n0 + cnt, p0 + p)
      above += cnt
    }
    assert(got.map(_._1).toSeq == decAgg.keys.toSeq.sorted)
    var (cumN, cumP) = (0L, 0L)
    got.foreach { case (d, n, np, rate, lift, gain, clift) =>
      val (wn, wp) = decAgg(d)
      assert(n == wn && np == wp)
      cumN += n; cumP += np
      assert(rate == np * 1000000L / n)
      assert(lift == (BigInt(np) * nt * 1000000 / (BigInt(n) * pt)).toLong)
      assert(gain == cumP * 1000000L / pt)
      assert(clift == (BigInt(cumP) * nt * 1000000 / (BigInt(cumN) * pt)).toLong)
    }
    assert(cumN == nt && cumP == pt)
    assert(got.last._6 == 1000000L, "cumulative gains close at 1e6")
  }

  test("modularity: per-brand replay; sum of degrees = 2m; Q numerators sum within [-4m2, 4m2]") {
    val got = AnalyticsExt.modularity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val baskets = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val edges = baskets.flatMap(ps => ps.combinations(2).map(x => (x(0), x(1)))).toSet
    val brand = Tables.part(spark, sf).selectExpr("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = edges.size.toLong
    val intra = edges.toSeq.filter { case (a, b) => brand(a) == brand(b) }
      .groupBy { case (a, _) => brand(a) }.map { case (k, v) => k -> v.size.toLong }
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(brand(a) -> a, brand(b) -> b) }
    val degSum = deg.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nParts = deg.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size.toLong }
    assert(got.map(_._4).sum == 2 * m, "sum of degrees = 2m")
    got.foreach { case (b, np, ie, ds, num, e6) =>
      assert(np == nParts(b) && ie == intra.getOrElse(b, 0L) && ds == degSum(b))
      val want = BigInt(4) * m * ie - BigInt(ds) * ds
      assert(BigInt(num) == want)
      val div = BigInt(4) * m * m
      val wantE6 = (if (want < 0) -1 else 1) * (want.abs * 1000000 / div)
      assert(BigInt(e6) == wantE6)
    }
    val q = got.map(x => BigInt(x._5)).sum
    assert(q.abs <= BigInt(4) * m * m, "Q in [-1, 1]")
  }

  test("discount elasticity: BigInt moment replay; slope sign follows the numerator") {
    val got = AnalyticsExt.discountElasticity(spark, sf).collect()
    assert(got.nonEmpty)
    val pts = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).selectExpr("p_partkey AS l_partkey", "p_brand"), "l_partkey")
      .selectExpr("p_brand", "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    got.foreach { r =>
      val xs = pts(r.getString(0))
      val n = BigInt(xs.length)
      val sx = BigInt(xs.map(_._2).sum)
      val sy = BigInt(xs.map(_._3).sum)
      val sxy = xs.map(p => BigInt(p._2) * p._3).sum
      val sxx = xs.map(p => BigInt(p._2) * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      assert(BigInt(r.getLong(2)) == num && BigInt(r.getLong(3)) == den && den > 0)
      val want = (if (num < 0) -1 else 1) * (num.abs * 1000000 / den)
      assert(BigInt(r.getLong(4)) == want)
      assert((r.getLong(4) < 0) == (num < 0) || num == 0)
    }
  }

  test("itemsets3: triple support replay; apriori bound vs pair supports; top-k total order") {
    val got = AnalyticsExt.itemsets3(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val baskets = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted.toList).toSeq
    val triples = baskets.flatMap(_.combinations(3))
      .groupBy(identity).map { case (k, v) => (k(0), k(1), k(2)) -> v.size.toLong }
    val pairs = baskets.flatMap(_.combinations(2))
      .groupBy(identity).map { case (k, v) => (k(0), k(1)) -> v.size.toLong }
    val wantTop = triples.toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(25)
      .map { case ((a, b, c), s) => (a, b, c, s) }
    assert(got.toSeq == wantTop)
    got.foreach { case (a, b, c, s) =>
      assert(s <= pairs((a, b)) && s <= pairs((a, c)) && s <= pairs((b, c)),
        "apriori: triple support bounded by every pair support")
    }
  }

  test("kruskal-wallis: doubled-midrank replay; rank-sum conservation; tie correction inflates") {
    val got = AnalyticsExt.kruskalWallis(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
    }
    assert(got.length == 6)
    val rows = Tables
      .lineitem(spark, sf)
      .join(
        Tables.part(spark, sf)
          .selectExpr("p_partkey AS l_partkey", "split_part(p_type, ' ', 1) AS g"),
        "l_partkey")
      .selectExpr("g", "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byVal = rows.groupBy(_._2).map { case (c, v) => c -> v.size.toLong }
    val sortedVals = byVal.toSeq.sortBy(_._1)
    val cumMap = sortedVals.map(_._1).zip(sortedVals.scanLeft(0L)(_ + _._2).init).toMap
    val n = rows.length.toLong
    val tieT = byVal.values.map(t => BigInt(t) * t * t - t).sum
    val perG = rows.groupBy(_._1).map { case (g, v) =>
      val r2x = v.groupBy(_._2).map { case (c, vv) =>
        vv.size.toLong * (2 * cumMap(c) + byVal(c) + 1)
      }.sum
      g -> (v.size.toLong, r2x)
    }
    assert(perG.values.map(_._2).sum == n * (n + 1), "doubled rank sums total n(n+1)")
    got.foreach { case (g, nG, r2x, meanRank, term, k, nn, _, _) =>
      val (en, er) = perG(g)
      assert(nG == en && r2x == er && nn == n && k == perG.size.toLong)
      assert(meanRank == (BigInt(r2x) * 1000000 / (2 * nG)).toLong)
      val dev = BigInt(r2x) - BigInt(nG) * (n + 1)
      assert(term == (3 * dev * dev * 1000000 / (BigInt(nG) * n * (n + 1))).toLong)
      assert(term >= 0)
    }
    val hExp = got.map(_._5).sum
    assert(got.forall(_._8 == hExp), "h_e6 is the sum of the group terms")
    val denom = BigInt(n) * n * n - n - tieT
    assert(denom > 0)
    val htie = (BigInt(hExp) * (BigInt(n) * n * n - n) / denom).toLong
    assert(got.forall(_._9 == htie) && htie >= hExp, "tie correction only inflates H")
  }

  test("price index: base month pinned at 1e6; BigInt basket replay; Fisher is the exact isqrt") {
    val got = AnalyticsExt.priceIndex(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    val pm = Tables
      .lineitem(spark, sf)
      .selectExpr(
        "l_partkey",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS rev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val price = pm
      .groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> (v.map(_._3).sum, v.map(_._4).sum) }
      .collect { case (k, (qty, rev)) if qty >= 1 => k -> (rev / qty, qty) }
    val m0 = price.keys.map(_._2).min
    val base = price.collect { case ((pk, m), pq) if m == m0 => pk -> pq }
    val want = price.keys.map(_._2).toSeq.distinct.flatMap { m =>
      val common = price.collect {
        case ((pk, mm), (p, qty)) if mm == m && base.contains(pk) =>
          val (p0, q0) = base(pk); (p, qty, p0, q0)
      }.toSeq
      if (common.isEmpty) None
      else {
        val l = common.map(t => BigInt(t._1) * t._4).sum * 1000000 /
          common.map(t => BigInt(t._3) * t._4).sum
        val p = common.map(t => BigInt(t._1) * t._2).sum * 1000000 /
          common.map(t => BigInt(t._3) * t._2).sum
        Some(m -> (common.size.toLong, l.toLong, p.toLong))
      }
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (m, (nParts, l, p, f)) =>
      val (wn, wl, wp) = want(m)
      assert(nParts == wn && l == wl && p == wp, s"month $m index replay")
      val x = BigInt(l) * p
      assert(BigInt(f) * f <= x && x < (BigInt(f) + 1) * (BigInt(f) + 1), "exact isqrt")
      assert(f >= math.min(l, p) && f <= math.max(l, p), "geometric mean inside the bracket")
    }
    assert(got(m0) == ((base.size.toLong, 1000000L, 1000000L, 1000000L)), "base month is unity")
  }

  test("newsvendor: exact fractile order statistic per part; service-level coverage") {
    val got = AnalyticsExt.newsvendor(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val daily = Tables
      .lineitem(spark, sf)
      .selectExpr(
        "l_partkey",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.map(_._3).sum }
    val byPart = daily.groupBy(_._1._1)
    assert(got.length == byPart.size, "one stocking row per part")
    got.foreach { case (pk, nDays, totQ, qStar, rankAt) =>
      val ds = byPart(pk).toSeq.map { case ((_, d), q) => (q, d) }.sorted
      assert(nDays == ds.size.toLong && totQ == ds.map(_._1).sum)
      val rk = (AnalyticsExt.NewsvendorCu * ds.size + AnalyticsExt.NewsvendorCu +
        AnalyticsExt.NewsvendorCo - 1) / (AnalyticsExt.NewsvendorCu + AnalyticsExt.NewsvendorCo)
      assert(rankAt == rk.toLong && qStar == ds(rk - 1)._1, s"part $pk fractile")
      assert(ds.count(_._1 <= qStar) >= rk, "coverage at least the fractile rank")
    }
  }

  test("corr matrix: BigInt moment replay over all pairs; no degenerate columns") {
    val got = AnalyticsExt.corrMatrix(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }.toMap
    assert(got.size == 6)
    val names = AnalyticsExt.CorrMatrixVars.map(_._1)
    val rows = Tables
      .lineitem(spark, sf)
      .selectExpr(AnalyticsExt.CorrMatrixVars.map { case (nm, e) => s"$e AS $nm" }: _*)
      .collect().map(r => names.indices.map(r.getLong).toVector)
    val n = BigInt(rows.length)
    def s(i: Int) = rows.map(v => BigInt(v(i))).sum
    def sxy(i: Int, j: Int) = rows.map(v => BigInt(v(i)) * v(j)).sum
    for { i <- names.indices; j <- (i + 1) until names.length } {
      val num = n * sxy(i, j) - s(i) * s(j)
      val dx = n * sxy(i, i) - s(i) * s(i)
      val dy = n * sxy(j, j) - s(j) * s(j)
      val want =
        if (dx > 0 && dy > 0)
          Some(((num.abs * 1000 / dx) * (num.abs * 1000 / dy)).toLong *
            (if (num < 0) -1L else 1L))
        else None
      val (gn, gr) = got((names(i), names(j)))
      assert(gn == rows.length.toLong && gr == want, s"${names(i)} vs ${names(j)}")
      gr.foreach(v => assert(v.abs <= 1000000L, "Cauchy-Schwarz bounds r^2"))
    }
    // every measure varies in this corpus, so no pair degenerates to NULL
    assert(got.values.forall(_._2.isDefined), "no constant columns")
  }

  test("ktruss: scala peel replay to fixpoint; every edge holds k-2 triangles; converged") {
    val k = 3
    val got = AnalyticsExt.ktruss(spark, sf, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val base = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.toSeq
      .flatMap(b =>
        b.map(_._2).distinct.sorted.toList.combinations(2).map(p => (p(0), p(1))).toSeq)
      .groupBy(identity).filter(_._2.size >= 2).keySet
    def supports(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val nbrs = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (n, v) => n -> v.map(_._2).toSet }
      es.toSeq.flatMap { case (a, b) =>
        (nbrs(a) & nbrs(b)).toSeq.flatMap { c =>
          Seq((a, b)) // one credit to (a,b) per common neighbor c
        }
      }.groupBy(identity).map { case (e, v) => e -> v.size.toLong }
    }
    var edges = base
    var changed = true
    while (changed) {
      val sup = supports(edges)
      val next = edges.filter(e => sup.getOrElse(e, 0L) >= k - 2)
      changed = next.size != edges.size
      edges = next
    }
    val finalSup = supports(edges)
    assert(got.keySet == edges, "surviving edge set matches the fixpoint")
    got.foreach { case (e, (sup, conv)) =>
      assert(sup == finalSup(e) && sup >= k - 2 && conv == 1L, s"edge $e")
    }
    // the peel actually removed something on this corpus
    assert(edges.size < base.size)
  }

  test("croston: sequential two-track fold replay; interval state never below one day") {
    val got = AnalyticsExt.croston(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val daily = Tables.lineitem(spark, sf)
      .selectExpr(
        "l_partkey",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.map(_._3).sum }
    def q4(a: Long): Long = if (a < 0) -((-a) / 4) else a / 4
    daily.groupBy(_._1._1).foreach { case (pk, m) =>
      val steps = m.toSeq.map { case ((_, d), q) => (d, q) }.sortBy(_._1)
      var (z, p, prev) = (steps.head._2, 1L, steps.head._1)
      steps.zipWithIndex.foreach { case ((d, q), i) =>
        if (i > 0) {
          z = z + q4(q - z)
          p = p + q4((d - prev) - p)
          prev = d
        }
        val (gq, gz, gp, grate) = got((pk, d))
        assert(gq == q && gz == z && gp == p, s"part $pk day $d state")
        assert(p >= 1, "interval state stays >= 1")
        assert(grate == BigInt(z) * 1000 / p)
      }
    }
    assert(got.size == daily.size)
  }

  test("linkpred backtest: full scala replay of split, scoring, top-k and hit counts") {
    val r = AnalyticsExt.linkPredBacktest(spark, sf).head()
    val rows = Tables.lineitem(spark, sf)
      .join(
        Tables.orders(spark, sf).selectExpr(
          "o_orderkey AS l_orderkey",
          "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day"),
        "l_orderkey")
      .selectExpr("l_orderkey", "l_partkey", "day")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val mid = (rows.map(_._3).min + rows.map(_._3).max + 1) / 2
    def pairs(rs: Seq[(Long, Long, Long)]): Map[(Long, Long), Long] =
      rs.map(t => (t._1, t._2)).distinct
        .groupBy(_._1).values.toSeq
        .flatMap(b =>
          b.map(_._2).distinct.sorted.toList.combinations(2).map(p => (p(0), p(1))).toSeq)
        .groupBy(identity).map { case (e, v) => e -> v.size.toLong }
    val train = pairs(rows.filter(_._3 < mid).toSeq)
      .filter(_._2 >= AnalyticsExt.LinkPredMinOrders).keySet
    val testNew = pairs(rows.filter(_._3 >= mid).toSeq).keySet -- train
    val deg = train.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
    val adj = train.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (u, _) => deg(u) <= AnalyticsExt.LinkPredMaxCenterDeg }
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2) }
    val cn = adj.values.toSeq
      .flatMap(vs => vs.sorted.toList.combinations(2).map(p => (p(0), p(1))).toSeq)
      .groupBy(identity).map { case (e, v) => e -> v.size.toLong }
      .filter(e => !train.contains(e._1))
    val scored = cn.toSeq.map { case ((a, b), c) =>
      val j = c * 1000000L / (deg(a) + deg(b) - c)
      (a, b, c, j)
    }
    val top = scored.sortBy { case (a, b, c, j) => (-j, -c, a, b) }
      .take(AnalyticsExt.LinkPredTopK)
    val topkHits = top.count(t => testNew.contains((t._1, t._2))).toLong
    val baseHits = scored.count(t => testNew.contains((t._1, t._2))).toLong
    assert(r.getAs[Long]("n_train_edges") == train.size.toLong)
    assert(r.getAs[Long]("n_test_new") == testNew.size.toLong)
    assert(r.getAs[Long]("n_candidates") == scored.size.toLong)
    assert(r.getAs[Long]("base_hits") == baseHits)
    assert(r.getAs[Long]("k_used") == top.size.toLong)
    assert(r.getAs[Long]("topk_hits") == topkHits)
    assert(r.getAs[Long]("precision_e6") == topkHits * 1000000L / top.size)
  }

  test("theil: decomposition identity within quantization slack; shares partition unity") {
    val rows = AnalyticsExt.theil(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Long]("share_e6"))
    val nNations = rows.length
    assert(math.abs(shares.sum - 1000000L) <= nNations, "shares partition unity")
    val tTotal = rows.head.getAs[Long]("t_total_e6")
    assert(rows.forall(_.getAs[Long]("t_total_e6") == tTotal))
    // T >= 0 up to per-customer quantization
    val nCust = rows.map(_.getAs[Long]("n_cust")).sum
    assert(tTotal >= -(nCust / 2 + 2), "Theil index nonnegative")
    // decomposition: T = sum share*T_within + sum between, in doubles
    val within = rows.map(r =>
      (r.getAs[Long]("share_e6") / 1e6) * (r.getAs[Long]("t_within_e6") / 1e6)).sum
    val between = rows.map(_.getAs[Long]("between_e6") / 1e6).sum
    assert(math.abs(tTotal / 1e6 - (within + between)) < 2e-3,
      s"decomposition: ${tTotal / 1e6} vs within $within + between $between")
  }

  test("propensity strata: full scala replay; ATE is the support-weighted diff") {
    val rows = AnalyticsExt.propensityStrata(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val promo = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_type").startsWith("PROMO"))
        .selectExpr("p_partkey AS l_partkey"), Seq("l_partkey"), "left_semi")
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).toSet
    val pop = Tables.orders(spark, sf)
      .selectExpr(
        "o_orderkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS bal",
        "CAST(o_orderstatus = 'F' AS LONG) AS outcome")
      .collect()
      .map(r => (r.getLong(1), if (promo(r.getLong(0))) 1L else 0L, r.getLong(2)))
    val (lo, hi) = (pop.map(_._1).min, pop.map(_._1).max)
    val strata = pop.groupBy(t => (t._1 - lo) * 10 / (hi - lo + 1))
    rows.foreach { r =>
      val s = strata(r.getAs[Long]("stratum"))
      val (nT, yT) = (s.count(_._2 == 1).toLong, s.filter(_._2 == 1).map(_._3).sum)
      val (nC, yC) = (s.count(_._2 == 0).toLong, s.filter(_._2 == 0).map(_._3).sum)
      assert(r.getAs[Long]("n_t") == nT && r.getAs[Long]("y_t") == yT &&
        r.getAs[Long]("n_c") == nC && r.getAs[Long]("y_c") == yC,
        s"stratum ${r.getAs[Long]("stratum")}")
      assert(r.getAs[Long]("in_support") == (if (nT >= 1 && nC >= 1) 1L else 0L))
    }
    val supported = rows.filter(_.getAs[Long]("in_support") == 1)
    val wsum = supported.map(r =>
      (r.getAs[Long]("n_t") + r.getAs[Long]("n_c")) * r.getAs[Long]("diff_e6")).sum
    val nSup = supported.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum
    val want = (if (wsum < 0) -1L else 1L) * (math.abs(wsum) / nSup)
    assert(rows.forall(_.getAs[Long]("ate_e6") == want))
    assert(rows.forall(_.getAs[Long]("n_supported") == nSup))
  }

  test("welch t: BigInt staged-quotient replay of every output column") {
    val r = AnalyticsExt.welchT(spark, sf).head()
    val xs = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).selectExpr(
        "p_partkey AS l_partkey", "CAST(p_type LIKE 'PROMO%' AS LONG) AS t"), "l_partkey")
      .selectExpr("t", "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val g1 = xs.filter(_._1 == 1).map(_._2)
    val g2 = xs.filter(_._1 == 0).map(_._2)
    val (n1, n2) = (BigInt(g1.length), BigInt(g2.length))
    val (s1, s2) = (g1.map(BigInt(_)).sum, g2.map(BigInt(_)).sum)
    val (q1, q2) = (g1.map(x => BigInt(x) * x).sum, g2.map(x => BigInt(x) * x).sum)
    val a1 = (n1 * q1 - s1 * s1) / (n1 * n1 * (n1 - 1))
    val a2 = (n2 * q2 - s2 * s2) / (n2 * n2 * (n2 - 1))
    val dNum = s1 * n2 - s2 * n1
    val d = (if (dNum < 0) BigInt(-1) else BigInt(1)) * (dNum.abs / (n1 * n2))
    assert(BigInt(r.getAs[Long]("n1")) == n1 && BigInt(r.getAs[Long]("n2")) == n2)
    assert(BigInt(r.getAs[Long]("mean1_cents")) == s1 / n1)
    assert(BigInt(r.getAs[Long]("mean2_cents")) == s2 / n2)
    assert(BigInt(r.getAs[Long]("d_cents")) == d)
    assert(BigInt(r.getAs[Long]("se2_1_c2")) == a1 && BigInt(r.getAs[Long]("se2_2_c2")) == a2)
    assert(BigInt(r.getAs[Long]("t2_e6")) == d * d * 1000000 / (a1 + a2))
    val dfDen = a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1)
    assert(BigInt(r.getAs[Long]("df_e3")) == (a1 + a2) * (a1 + a2) * 1000 / dfDen)
    // Welch df is bounded by the pooled df
    assert(r.getAs[Long]("df_e3") <= (n1 + n2 - 2).toLong * 1000)
  }

  test("order reconciliation: exact error-percentile ranks and summary counts replay") {
    val rows = AnalyticsExt.orderReconciliation(spark, sf).collect()
    assert(rows.length == 3)
    val rc = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey",
        "CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT) AS lc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val ords = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val errs = ords.flatMap { case (o, t) =>
      rc.get(o).filter(_ => t >= 1).map(re => math.abs(re - t) * 1000000L / t)
    }.sorted
    val nLineless = ords.count(o => !rc.contains(o._1)).toLong
    val nExact = ords.count(o => rc.get(o._1).contains(o._2)).toLong
    val drift = ords.flatMap(o => rc.get(o._1).map(_ - o._2)).sum
    val byP = rows.map(r => r.getString(0) -> r).toMap
    Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)).foreach { case (p, num, den) =>
      val rank = (errs.length * num + den - 1) / den
      val r = byP(p)
      assert(r.getAs[Long]("rank") == rank && r.getAs[Long]("rel_err_e6") == errs(rank.toInt - 1),
        s"$p rank/value")
      assert(r.getAs[Long]("n_orders") == ords.length.toLong)
      assert(r.getAs[Long]("n_lineless") == nLineless)
      assert(r.getAs[Long]("n_exact") == nExact)
      assert(r.getAs[Long]("net_drift_cents") == drift)
    }
  }

  test("brier decomposition: full BigInt replay; Murphy identity within quantization slack") {
    val rows = AnalyticsExt.brierDecomp(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val pop = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v",
        "CAST(o_orderstatus = 'F' AS LONG) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (pop.map(_._1).min + pop.map(_._1).max + 1) / 2
    val (lo, hi) = (pop.map(_._2).min, pop.map(_._2).max)
    def binOf(v: Long) = (v - lo) * 10 / (hi - lo + 1)
    val train = pop.filter(_._1 < mid).groupBy(t => binOf(t._2))
      .map { case (b, v) => b -> (v.size.toLong, v.map(_._3).sum) }
    val test = pop.filter(_._1 >= mid).groupBy(t => binOf(t._2))
      .map { case (b, v) => b -> (v.size.toLong, v.map(_._3).sum) }
    val covered = test.keySet & train.keySet
    val nTest = covered.toSeq.map(test(_)._1).sum
    val oTest = covered.toSeq.map(test(_)._2).sum
    val obar = BigInt(oTest) * 1000000 / nTest
    var (bm, rm, sm) = (BigInt(0), BigInt(0), BigInt(0))
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(covered(b))
      val (nTr, yTr) = train(b)
      val (nB, oB) = test(b)
      val p = BigInt(yTr) * 1000000 / nTr
      val ob = BigInt(oB) * 1000000 / nB
      assert(r.getAs[Long]("n_train") == nTr && BigInt(r.getAs[Long]("p_e6")) == p)
      assert(r.getAs[Long]("n_b") == nB && r.getAs[Long]("o_b") == oB)
      assert(BigInt(r.getAs[Long]("obar_b_e6")) == ob)
      bm += BigInt(oB) * (1000000 - p) * (1000000 - p) + BigInt(nB - oB) * p * p
      rm += BigInt(nB) * (p - ob) * (p - ob)
      sm += BigInt(nB) * (ob - obar) * (ob - obar)
    }
    assert(rows.length == covered.size)
    val head = rows.head
    assert(head.getAs[Long]("n_test") == nTest)
    assert(BigInt(head.getAs[Long]("obar_e6")) == obar)
    assert(BigInt(head.getAs[Long]("brier_e12")) == bm / nTest)
    assert(BigInt(head.getAs[Long]("rel_e12")) == rm / nTest)
    assert(BigInt(head.getAs[Long]("res_e12")) == sm / nTest)
    assert(BigInt(head.getAs[Long]("unc_e12")) == obar * (1000000 - obar))
    // the documented unseen-bin exclusion is ACCOUNTED: test-only bins
    // and their orders show up in the dropped_* columns
    val testOnly = test.keySet -- train.keySet
    assert(head.getAs[Long]("dropped_bins") == testOnly.size.toLong)
    assert(head.getAs[Long]("dropped_rows") == testOnly.toSeq.map(test(_)._1).sum)
    // Murphy: Brier = REL - RES + UNC, up to e6-rate quantization
    val lhs = head.getAs[Long]("brier_e12")
    val rhs = head.getAs[Long]("rel_e12") - head.getAs[Long]("res_e12") +
      head.getAs[Long]("unc_e12")
    assert(math.abs(lhs - rhs) < 20000000L, s"Murphy identity: $lhs vs $rhs")
  }

  test("period detect: per-lag BigInt ACF replay; winner by (r2, lag) total order") {
    val rows = AnalyticsExt.periodDetect(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 13)
    val daily = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, v) => d -> v.map(_._2).sum }
    val want = (2 to 14).flatMap { lag =>
      val pairsL = daily.keys.toSeq.flatMap(d => daily.get(d + lag).map(y => (daily(d), y)))
      val m = BigInt(pairsL.size)
      if (m == 0) None
      else {
        val sx = pairsL.map(p => BigInt(p._1)).sum
        val sy = pairsL.map(p => BigInt(p._2)).sum
        val sxy = pairsL.map(p => BigInt(p._1) * p._2).sum
        val sxx = pairsL.map(p => BigInt(p._1) * p._1).sum
        val syy = pairsL.map(p => BigInt(p._2) * p._2).sum
        val num = m * sxy - sx * sy
        val dx = m * sxx - sx * sx
        val dy = m * syy - sy * sy
        if (dx <= 0 || dy <= 0) None
        else {
          val r2 = (if (num < 0) BigInt(-1) else BigInt(1)) *
            ((num.abs * 1000 / dx) * (num.abs * 1000 / dy))
          Some(lag.toLong -> (m.toLong, r2.toLong))
        }
      }
    }.toMap
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (m, r2) = want(r.getAs[Long]("lag"))
      assert(r.getAs[Long]("m") == m && r.getAs[Long]("r2_signed_e6") == r2,
        s"lag ${r.getAs[Long]("lag")}")
      assert(r.getAs[Long]("significant") ==
        (if (math.abs(r2) * m > 4000000L) 1L else 0L))
    }
    val bestWant = want.toSeq.map { case (l, (_, r2)) => (l, r2) }
      .sortBy { case (l, r2) => (-r2, l) }.head
    assert(rows.forall(r => r.getAs[Long]("best_lag") == bestWant._1 &&
      r.getAs[Long]("best_r2_e6") == bestWant._2))
  }

  test("seasonal mann-kendall: within-season sweeps replay; seasonal var18 below plain") {
    val got = AnalyticsExt.seasonalMannKendall(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty)
    val nsPerDay = 86400L * 1000000000L
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", s"ts div ${nsPerDay}L AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((e, d), v) => (e, d) -> v.map(_._3).sum }
    daily.keys.map(_._1).toSeq.distinct.foreach { et =>
      val series = daily.collect { case ((e, d), c) if e == et => (d, c) }.toSeq
      val bySeason = series.groupBy(_._1 % 7)
      var (sTot, nPairs, var18) = (0L, 0L, 0L)
      bySeason.values.foreach { rows =>
        val sorted = rows.sortBy(_._1)
        for { i <- sorted.indices; j <- (i + 1) until sorted.length } {
          sTot += java.lang.Long.signum(sorted(j)._2 - sorted(i)._2)
          nPairs += 1
        }
        val nd = sorted.length.toLong
        val tie = sorted.groupBy(_._2).values
          .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
        var18 += nd * (nd - 1) * (2 * nd + 5) - tie
      }
      val (gn, gs, gp, gst, gv) = got(et)
      assert(gn == series.length.toLong && gs == bySeason.size.toLong)
      assert(gp == nPairs && gst == sTot && gv == var18, s"series $et")
      // restricting to within-season pairs can only shrink the pair count
      assert(nPairs <= series.length.toLong * (series.length - 1) / 2)
    }
  }

  test("cramers v: BigInt chi2 replay; V bounded to [0, 1]; exact isqrt bracket") {
    val r = AnalyticsExt.cramersV(spark, sf).head()
    val cells = Tables.orders(spark, sf)
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val n = cells.map(_._3).sum
    val rm = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val cm = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val chi2 = cells.map { case (s, p, o) =>
      val d = BigInt(n) * o - BigInt(rm(s)) * cm(p)
      d * d * 1000000 / (BigInt(n) * rm(s) * cm(p))
    }.sum
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_rows") == rm.size.toLong && r.getAs[Long]("n_cols") == cm.size.toLong)
    assert(BigInt(r.getAs[Long]("chi2_e6")) == chi2)
    val v2 = chi2 * 1000000 / (BigInt(n) * (math.min(rm.size, cm.size) - 1))
    assert(BigInt(r.getAs[Long]("v2_e12")) == v2)
    val v = BigInt(r.getAs[Long]("v_e6"))
    assert(v * v <= v2 && v2 < (v + 1) * (v + 1), "exact isqrt")
    assert(v >= 0 && v <= 1000000L, "V lives on [0, 1]")
  }

  test("odds ratio: 2x2 cell replay; cells partition the orders; ratio quotients exact") {
    val r = AnalyticsExt.oddsRatio(spark, sf).head()
    val promo = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_type").startsWith("PROMO"))
        .selectExpr("p_partkey AS l_partkey"), Seq("l_partkey"), "left_semi")
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).toSet
    val pop = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "CAST(o_orderstatus = 'F' AS LONG) AS y")
      .collect().map(x => (promo(x.getLong(0)), x.getLong(1) == 1L))
    val a = pop.count(t => t._1 && t._2).toLong
    val b = pop.count(t => t._1 && !t._2).toLong
    val c = pop.count(t => !t._1 && t._2).toLong
    val d = pop.count(t => !t._1 && !t._2).toLong
    assert(r.getAs[Long]("a") == a && r.getAs[Long]("b") == b &&
      r.getAs[Long]("c") == c && r.getAs[Long]("d") == d)
    assert(a + b + c + d == pop.length.toLong, "cells partition the orders")
    assert(BigInt(r.getAs[Long]("odds_ratio_e6")) == BigInt(a) * d * 1000000 / (BigInt(b) * c))
    assert(BigInt(r.getAs[Long]("risk_ratio_e6")) ==
      BigInt(a) * (c + d) * 1000000 / (BigInt(c) * (a + b)))
    assert(r.getAs[Long]("risk_diff_e6") == a * 1000000L / (a + b) - c * 1000000L / (c + d))
  }

  test("page-hinkley: sequential replay of the running-mean fold; PH stats nonnegative") {
    val rows = AnalyticsExt.pageHinkley(spark, sf).collect()
      .map(r => r.getAs[Long]("day") -> r).toMap
    val daily = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, v) => d -> v.map(_._2).sum }
      .toSeq.sortBy(_._1)
    assert(rows.size == daily.size)
    var (sPre, m, mMin, mMax) = (0L, 0L, Long.MaxValue, Long.MinValue)
    daily.zipWithIndex.foreach { case ((d, x), idx) =>
      sPre += x
      val mean = sPre / (idx + 1)
      m += x - mean
      mMin = math.min(mMin, m)
      mMax = math.max(mMax, m)
      val r = rows(d)
      assert(r.getAs[Long]("cents") == x && r.getAs[Long]("mean_so_far") == mean, s"day $d")
      assert(r.getAs[Long]("m") == m, s"day $d m")
      assert(r.getAs[Long]("ph_plus") == m - mMin && r.getAs[Long]("ph_minus") == mMax - m)
      assert(r.getAs[Long]("ph_plus") >= 0 && r.getAs[Long]("ph_minus") >= 0)
      assert(r.getAs[Long]("alarm_up") ==
        (if (m - mMin > r.getAs[Long]("lambda_c")) 1L else 0L))
    }
  }

  test("assortment turnover: set replay per month pair; add/drop conservation") {
    val rows = AnalyticsExt.assortmentTurnover(spark, sf).collect()
      .map(r => r.getAs[Long]("month") -> r).toMap
    assert(rows.nonEmpty)
    val mp = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        "l_orderkey")
      .selectExpr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m",
        "l_partkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (m, v) => m -> v.map(_._2).toSet }
    val months = mp.keys.toSeq.sorted
    val pairs = months.zip(months.tail).filter { case (a, b) => b == a + 1 }
    assert(rows.size == pairs.size, "one row per consecutive month pair")
    pairs.foreach { case (a, b) =>
      val (sa, sb) = (mp(a), mp(b))
      val r = rows(a)
      val common = (sa & sb).size.toLong
      assert(r.getAs[Long]("n_active") == sa.size.toLong &&
        r.getAs[Long]("n_next") == sb.size.toLong && r.getAs[Long]("n_common") == common)
      assert(r.getAs[Long]("n_added") == (sb -- sa).size.toLong)
      assert(r.getAs[Long]("n_dropped") == (sa -- sb).size.toLong)
      assert(r.getAs[Long]("jaccard_e6") ==
        common * 1000000L / (sa.size + sb.size - common))
    }
  }

  test("supplier hhi: share replay; sole-source exactly 1e8; top-set by (hhi, part)") {
    val rows = AnalyticsExt.supplierConcentration(spark, sf).collect()
    assert(rows.length <= 25 && rows.nonEmpty)
    val ps = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_suppkey", "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.map(_._3).sum }
    val byPart = ps.groupBy(_._1._1)
      .map { case (pk, m) => pk -> m.values.toSeq }
      .filter(_._2.sum >= 1)
    val hhi = byPart.map { case (pk, qs) =>
      val tot = qs.sum
      pk -> ((qs.size.toLong, tot, qs.map(q => { val s = q * 10000L / tot; s * s }).sum))
    }
    val multi = hhi.filter(_._2._1 >= 2)
    val wantTop = multi.toSeq.sortBy { case (pk, (_, _, h)) => (-h, pk) }.take(25).map(_._1)
    assert(rows.map(_.getAs[Long]("l_partkey")).toSet == wantTop.toSet)
    rows.foreach { r =>
      val (ns, tot, h) = hhi(r.getAs[Long]("l_partkey"))
      assert(r.getAs[Long]("n_suppliers") == ns && r.getAs[Long]("q_tot") == tot &&
        r.getAs[Long]("hhi_e8") == h)
      assert(h <= 100000000L, "HHI bounded by the sole-source ceiling")
    }
    val soleCount = hhi.count(_._2._1 == 1).toLong
    assert(rows.forall(_.getAs[Long]("n_sole_source") == soleCount))
    assert(rows.forall(_.getAs[Long]("n_parts") == hhi.size.toLong))
    // every sole-source part is exactly the 1e8 ceiling (replay-side identity)
    hhi.collect { case (_, (1L, _, h)) => h }.foreach(h => assert(h == 100000000L))
  }

  /** Shared scala build of the support-2 weighted co-purchase graph
    * used by the LPA and Adamic-Adar replays below.
    */
  private def copurchaseGraph(): (Map[(Long, Long), Long], Set[Long]) = {
    val baskets = graft.Tables
      .lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .map(_.map(_._2).sorted)
      .toSeq
    val verts = baskets.flatten.toSet
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        val p = (ps(i), ps(j))
        pairCount(p) = pairCount.getOrElse(p, 0L) + 1L
      }
    }
    (pairCount.filter(_._2 >= 2L).toMap, verts)
  }

  /** Scala replay of the exact 4-round synchronous weighted LPA. */
  private def lpaReplay(edges: Map[(Long, Long), Long], verts: Set[Long]): Map[Long, Long] = {
    val nbrs = scala.collection.mutable.Map.empty[Long, List[(Long, Long)]]
    edges.foreach { case ((a, b), w) =>
      nbrs(a) = (b, w) :: nbrs.getOrElse(a, Nil)
      nbrs(b) = (a, w) :: nbrs.getOrElse(b, Nil)
    }
    var labels = verts.map(v => v -> v).toMap
    for (_ <- 1 to AnalyticsExt.LabelPropRounds) {
      labels = labels.map { case (v, own) =>
        val tally = nbrs
          .getOrElse(v, Nil)
          .groupBy { case (n, _) => labels(n) }
          .map { case (l, xs) => l -> xs.map(_._2).sum }
        if (tally.isEmpty) v -> own
        else v -> tally.toSeq.minBy { case (l, tw) => (-tw, l) }._1
      }
    }
    labels
  }

  test("label prop: scala 4-round synchronous replay; isolated parts self-labeled") {
    val got = AnalyticsExt
      .labelProp(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val (edges, verts) = copurchaseGraph()
    val want = lpaReplay(edges, verts)
    assert(got.keySet == verts)
    val sizes = want.values.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    verts.foreach { v =>
      assert(got(v) == ((want(v), sizes(want(v)))), s"part $v")
    }
    // a part with no support-2 edge keeps its own id as community
    val touched = edges.keys.flatMap(p => Seq(p._1, p._2)).toSet
    (verts -- touched).foreach(v => assert(got(v)._1 == v, s"isolated $v"))
  }

  test("label prop eval: modularity fold replay on the shared edge set; lpa_wins consistent") {
    val r = AnalyticsExt.labelPropEval(spark, sf).collect().head
    val (edges, verts) = copurchaseGraph()
    val lpa = lpaReplay(edges, verts)
    val brand = graft.Tables
      .part(spark, sf)
      .selectExpr("p_partkey", "p_brand")
      .collect()
      .map(x => x.getLong(0) -> x.getString(1))
      .toMap
    def qFold[L](assign: Long => L): (Long, BigInt) = {
      val m = BigInt(edges.size)
      val labeled = edges.keys.toSeq.map { case (a, b) => (assign(a), assign(b)) }
      val intra = labeled.filter { case (x, y) => x == y }.groupBy(_._1).map {
        case (c, xs) => c -> BigInt(xs.size)
      }
      val deg = labeled
        .flatMap { case (x, y) => Seq(x, y) }
        .groupBy(identity)
        .map { case (c, xs) => c -> BigInt(xs.size) }
      // NB: deg.keys is Set-backed — mapping it through a non-injective
      // lookup would COLLAPSE equal mc values before the sum; intra's
      // own values (keys ⊆ deg keys) are the safe fold
      val sumMc = intra.values.sum
      val sumDeg2 = deg.values.toSeq.map(d => d * d).sum
      (deg.size.toLong, 4 * m * sumMc - sumDeg2)
    }
    val m = BigInt(edges.size)
    val (nL, qnL) = qFold(lpa)
    val (nB, qnB) = qFold(brand)
    def e6(qn: BigInt): Long = (qn.sign * (qn.abs * 1000000 / (4 * m * m))).toLong
    assert(r.getAs[Long]("m") == edges.size.toLong)
    assert(r.getAs[Long]("n_comms_lpa") == nL && r.getAs[Long]("n_comms_brand") == nB)
    assert(r.getAs[Long]("q_lpa_e6") == e6(qnL) && r.getAs[Long]("q_brand_e6") == e6(qnB))
    assert(r.getAs[Long]("lpa_wins") == (if (qnL > qnB) 1L else 0L))
    assert(math.abs(r.getAs[Long]("q_lpa_e6")) <= 1000000L)
    assert(math.abs(r.getAs[Long]("q_brand_e6")) <= 1000000L)
  }

  test("adamic-adar: scala wedge replay with per-center e6 ln terms; never adjacent") {
    val got = AnalyticsExt
      .adamicAdar(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (edgesW, _) = copurchaseGraph()
    val edges = edgesW.keySet
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1
      deg(b) = deg.getOrElse(b, 0L) + 1
    }
    def term(d: Long): Long = math.floor(1000000.0 / math.log(d.toDouble) + 0.5).toLong
    val nbrs = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      if (deg(a) <= AnalyticsExt.LinkPredMaxCenterDeg) nbrs(a) = b :: nbrs.getOrElse(a, Nil)
      if (deg(b) <= AnalyticsExt.LinkPredMaxCenterDeg) nbrs(b) = a :: nbrs.getOrElse(b, Nil)
    }
    val acc = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    nbrs.foreach { case (center, vsRaw) =>
      val vs = vsRaw.sorted
      val t = term(deg(center))
      for (i <- vs.indices; j <- i + 1 until vs.length) {
        val p = (vs(i), vs(j))
        val (c, s) = acc.getOrElse(p, (0L, 0L))
        acc(p) = (c + 1, s + t)
      }
    }
    val scored = acc.filter { case (p, _) => !edges.contains(p) }.toSeq.map {
      case ((a, b), (c, s)) => (a, b, c, s)
    }
    val want = scored.sortBy(t => (-t._4, -t._3, t._1, t._2)).take(100)
    assert(got.toSeq.sortBy(t => (-t._4, -t._3, t._1, t._2)) == want)
    got.foreach { case (a, b, c, s) =>
      assert(!edges.contains((a, b)), s"($a,$b) already adjacent")
      assert(s >= c * term(AnalyticsExt.LinkPredMaxCenterDeg.toLong),
        "each wedge term at least the max-degree floor")
    }
  }

  test("imr chart: cross-multiplied limits equal the rational textbook limits") {
    val got = AnalyticsExt
      .imrChart(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val days = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
      .toSeq
      .sortBy(_._1)
    val xs = days.map(_._2)
    val mrs = xs.zip(xs.drop(1)).map { case (a, b) => math.abs(b - a) }
    val n = BigInt(xs.length)
    val sx = xs.map(BigInt(_)).sum
    val n1 = BigInt(mrs.length)
    val smr = mrs.map(BigInt(_)).sum
    assert(got.length == xs.length)
    got.zipWithIndex.foreach { case ((day, x, mr, nDays, xOoc, mrOoc), i) =>
      assert(day == days(i)._1 && x == xs(i) && nDays == xs.length.toLong)
      assert(mr == (if (i == 0) None else Some(mrs(i - 1))))
      val wantX = ((BigInt(x) * n - sx).abs * 1128 * n1 > 3000 * smr * n)
      assert(xOoc == (if (wantX) 1L else 0L), s"day $day x_ooc")
      val wantMr = i > 0 && BigInt(mrs(i - 1)) * 1000 * n1 > 3267 * smr
      assert(mrOoc == (if (wantMr) 1L else 0L), s"day $day mr_ooc")
    }
  }

  test("xbar-r chart: full-week subgroups only; flags replay the rational A2/D3/D4 limits") {
    val got = AnalyticsExt
      .xbarRChart(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    val byDay = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
    val weeks = byDay.toSeq
      .groupBy { case (d, _) => d / 7 }
      .collect { case (wk, ds) if ds.length == 7 =>
        val vals = ds.map(_._2)
        (wk, vals.sum, vals.max - vals.min)
      }
      .toSeq
      .sortBy(_._1)
    val w = BigInt(weeks.length)
    val ss = weeks.map(t => BigInt(t._2)).sum
    val sr = weeks.map(t => BigInt(t._3)).sum
    assert(got.length == weeks.length && weeks.nonEmpty)
    got.zipWithIndex.foreach { case ((wk, s, r, nW, xo, rh, rl), i) =>
      assert((wk, s, r) == weeks(i) && nW == weeks.length.toLong)
      // the cross-multiplied forms ARE the rational textbook limits:
      // |s/7 - ss/(7w)| > (419/1000)(sr/w) multiplied through by 7000w
      assert(xo == (if ((BigInt(s) * w - ss).abs * 1000 > 2933 * sr) 1L else 0L), s"wk $wk")
      assert(rh == (if (BigInt(r) * 1000 * w > 1924 * sr) 1L else 0L), s"wk $wk r_high")
      assert(rl == (if (BigInt(r) * 1000 * w < 76 * sr) 1L else 0L), s"wk $wk r_low")
    }
  }

  test("nrr: full cohort-revenue replay; ratios exact; retention never exceeds floor<=nrr") {
    val got = AnalyticsExt
      .nrr(spark, sf)
      .collect()
      .map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
    val cm = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, xs) => (k, xs.map(_._2).sum) }
    val months = cm.keys.map(_._2).toSet
    val valid = months.filter(m => months.contains(m + 1))
    assert(got.keySet == valid)
    valid.foreach { m =>
      val base = cm.collect { case ((c, `m`), v) => c -> v }.toMap
      val next = cm.collect { case ((c, mm), v) if mm == m + 1 => c -> v }.toMap
      val nBase = base.size.toLong
      val nRet = base.keySet.intersect(next.keySet).size.toLong
      val baseC = base.values.sum
      val retC = base.keySet.toSeq.flatMap(next.get).sum
      val minC = base.keySet.intersect(next.keySet).toSeq
        .map(c => math.min(base(c), next(c))).sum
      val newC = (next.keySet -- base.keySet).toSeq.map(next).sum
      val nrrE6 = (BigInt(retC) * 1000000 / BigInt(baseC)).toLong
      val grrE6 = (BigInt(minC) * 1000000 / BigInt(baseC)).toLong
      assert(got(m) == ((nBase, nRet, baseC, retC, minC, newC, nrrE6, grrE6)), s"month $m")
      assert(grrE6 <= nrrE6, s"month $m: GRR floor must not exceed NRR")
    }
  }

  test("hm dependency: counts pin to eventTransitions; dep replays; antisymmetric off-diagonal") {
    val dep = AnalyticsExt
      .hmDependency(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val trans = AnalyticsExt
      .eventTransitions(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // key set = observed directly-follows pairs closed under mirroring
    assert(dep.keySet == trans.keySet.flatMap { case (a, b) => Set((a, b), (b, a)) })
    dep.foreach { case ((a, b), (nAb, nBa, d)) =>
      assert(nAb == trans.getOrElse((a, b), 0L), s"($a,$b) n_ab")
      assert(nBa == trans.getOrElse((b, a), 0L), s"($a,$b) n_ba")
      val want =
        if (a == b) nAb * 1000000L / (nAb + 1L)
        else {
          val s = if (nAb < nBa) -1L else 1L
          s * (math.abs(nAb - nBa) * 1000000L / (nAb + nBa + 1L))
        }
      assert(d == want, s"($a,$b) dep")
      if (a != b) {
        // sign-factored magnitude division makes dep exactly antisymmetric
        assert(dep((b, a))._3 == -d || (nAb == nBa && d == 0L), s"($a,$b) antisymmetry")
      }
      assert(math.abs(d) <= 1000000L)
    }
  }

  test("markov entropy: quantized-term replay from the transition counts; H <= Hmax") {
    val got = AnalyticsExt
      .markovEntropy(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val trans = AnalyticsExt
      .eventTransitions(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1)
    def lg2(x: Double) = math.log(x) / math.log(2)
    assert(got.keySet == trans.keySet)
    trans.foreach { case (from, rows) =>
      val counts = rows.map(_._2)
      val nFrom = counts.sum
      val terms = counts.map { c =>
        val p = c.toDouble / nFrom
        math.floor(-p * lg2(p) * 1e6 + 0.5).toLong
      }
      val hmax = math.floor(lg2(counts.size.toDouble) * 1e6 + 0.5).toLong
      assert(got(from) == ((nFrom, counts.size.toLong, terms.sum, hmax)), s"state $from")
      // entropy bounded by the uniform maximum (up to per-term quantization)
      assert(terms.sum <= hmax + counts.size, s"state $from H > Hmax")
      assert(terms.sum >= 0L)
    }
  }

  test("alpha footprint: completed grid; relations replay from the counts; mirrors consistent") {
    val got = AnalyticsExt
      .alphaFootprint(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    val trans = AnalyticsExt
      .eventTransitions(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val alphabet = graft.Tables
      .events(spark, sf)
      .select("event_type")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    // grid completion: exactly alphabet², including never-observed cells
    assert(got.keySet == (for (a <- alphabet; b <- alphabet) yield (a, b)))
    got.foreach { case ((a, b), (nAb, nBa, rel)) =>
      assert(nAb == trans.getOrElse((a, b), 0L) && nBa == trans.getOrElse((b, a), 0L))
      val want =
        if (nAb > 0 && nBa == 0) "causal"
        else if (nAb == 0 && nBa > 0) "rev_causal"
        else if (nAb > 0 && nBa > 0) "parallel"
        else "choice"
      assert(rel == want, s"($a,$b)")
      // mirror consistency: causal flips, parallel/choice are symmetric
      val mirror = got((b, a))._3
      assert(mirror == (rel match {
        case "causal" => "rev_causal"
        case "rev_causal" => "causal"
        case s => s
      }), s"($a,$b) mirror")
    }
  }

  test("hill tail: order-statistic + quantized ln-term replay; alpha inverts H") {
    val r = AnalyticsExt.hillTail(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val revs = graft.Tables
      .orders(spark, sf)
      .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1)
      .map { case (c, xs) => (c, xs.map(_._2).sum) }
      .toSeq
      .sortBy { case (c, v) => (-v, c) }
    val k = AnalyticsExt.HillK
    assert(revs.length > k)
    val thr = revs(k)._2
    val sum = revs.take(k).map { case (_, v) =>
      math.floor(math.log(v.toDouble / thr) * 1e6 + 0.5).toLong
    }.sum
    val hill = sum / k
    assert(row.getAs[Long]("k") == k.toLong)
    assert(row.getAs[Long]("thr_c") == thr)
    assert(row.getAs[Long]("hill_e6") == hill)
    assert(row.getAs[Long]("alpha_e6") ==
      (if (hill > 0) 1000000000000L / hill else 0L))
    // all terms nonnegative by the order-statistic contract
    assert(hill >= 0L)
  }

  test("trace variants: per-user journey strings replay; top set exact with tiebreak") {
    val got = AnalyticsExt
      .traceVariants(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byUser = graft.Tables
      .events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1)
      .map { case (u, xs) =>
        val seq = xs.map(_._2).sortBy { case (ts, id, _) => (ts, id) }
        (u, seq.map(_._3).mkString(">"), seq.length.toLong)
      }
    val want = byUser
      .groupBy(_._2)
      .map { case (v, xs) => (v, xs.size.toLong, xs.map(_._3).max) }
      .toSeq
      .sortBy { case (v, n, _) => (-n, v) }
      .take(25)
    assert(got.toSeq == want)
  }

  test("token replay: four-counter fold replays; clean variants hit 1e6; counters consistent") {
    val got = AnalyticsExt
      .tokenReplay(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))
    // driver-side fold: augmented sequences -> DFG counts -> filtered
    // model -> sequential replay
    val seqs = graft.Tables
      .events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1)
      .map { case (u, xs) =>
        u -> ("START" +: xs.map(_._2).sortBy { case (ts, id, _) => (ts, id) }.map(_._3) :+ "END")
      }
    val allPairs = seqs.values.flatMap(t => t.zip(t.tail)).toSeq
    // top-12 happy-path edges by (count desc, a, b); toSeq first —
    // Map.collect/map producing tuples rebuilds a Map and collapses
    // edges by source activity
    val model = allPairs
      .groupBy(identity)
      .toSeq
      .map { case (p, xs) => (p, xs.size) }
      .sortBy { case ((a, b), n) => (-n, a, b) }
      .take(12)
      .map(_._1)
      .toSet
    val want = seqs.values
      .map { t =>
        val pairs = t.zip(t.tail)
        val bad = pairs.count(!model.contains(_)).toLong
        (t.slice(1, t.length - 1).mkString(">"), pairs.length.toLong, bad)
      }
      .groupBy(_._1)
      .map { case (v, xs) =>
        val (p, bad) = (xs.head._2, xs.head._3)
        val fit = 500000L * (p + 1 - bad) / (p + 1) + 500000L * (p + 1 - bad) / (p + 1)
        (v, xs.size.toLong, p + 1, p + 1, bad, bad, fit)
      }
      .toSeq
      .sortBy { case (v, n, _, _, _, _, _) => (-n, v) }
      .take(25)
    assert(got.toSeq == want)
    // the replay invariants: produced = consumed, missing = remaining
    // <= pairs, and a deviation-free variant scores exactly 1e6
    got.foreach { case (_, _, prod, cons, miss, rem, fit) =>
      assert(prod == cons && miss == rem && miss <= prod - 1)
      if (miss == 0) assert(fit == 1000000L) else assert(fit < 1000000L)
    }
    // the top-12 happy-path model must actually discriminate on this
    // corpus (a frequency-floor model kept all 34 edges and scored
    // nothing — the measured degenerate case the cut replaced)
    assert(got.exists(_._5 > 0), "no variant deviates: the model cut is degenerate")
  }

  test("cr concentration: month replay; CR4 <= CR8 <= 1e6; small months saturate") {
    val got = AnalyticsExt
      .crConcentration(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))))
      .toMap
    val cm = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => ((r.getLong(1), r.getLong(0)), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, xs) => (k, xs.map(_._2).sum) }
      .toSeq
    assert(got.keySet == cm.map(_._1._1).toSet)
    cm.groupBy(_._1._1).foreach { case (m, rows) =>
      val byCust = rows.map { case ((_, c), v) => (c, v) }.sortBy { case (c, v) => (-v, c) }
      val total = byCust.map(_._2).sum
      val top4 = byCust.take(4).map(_._2).sum
      val top8 = byCust.take(8).map(_._2).sum
      val (nC, tot, t4, t8, cr4, cr8) = got(m)
      assert(nC == byCust.length.toLong && tot == total && t4 == top4 && t8 == top8,
        s"month $m")
      assert(cr4 == (BigInt(top4) * 1000000 / BigInt(total)).toLong)
      assert(cr8 == (BigInt(top8) * 1000000 / BigInt(total)).toLong)
      assert(cr4 <= cr8 && cr8 <= 1000000L)
      if (byCust.length <= 4) assert(cr4 == 1000000L, s"month $m should saturate")
    }
  }

  test("markov attribution: full integer-trajectory replay; removal never helps; shares bounded") {
    val got = AnalyticsExt
      .markovAttribution(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // scala replay: journeys -> truncation -> edges -> scenarios -> rounds
    val journeys = graft.Tables
      .events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1)
      .values
      .map { xs =>
        val seq = xs.map(_._2).toSeq.sortBy { case (ts, id, _) => (ts, id) }.map(_._3)
        val cut = seq.indexOf("purchase") match {
          case -1 => seq
          case i => seq.take(i + 1)
        }
        ("START" +: cut) ++ (if (cut.last != "purchase") Seq("NULL") else Seq())
      }
    val edges = journeys
      .flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val channels = edges.keys
      .flatMap { case (a, b) => Seq(a, b) }
      .toSet -- Set("START", "NULL", "purchase")
    def convFor(removed: Option[String]): Long = {
      val redirected = edges.toSeq
        .filter { case ((a, _), _) => !removed.contains(a) }
        .map { case ((a, b), n) => ((a, if (removed.contains(b)) "NULL" else b), n) }
        .groupBy(_._1)
        .map { case (k, xs) => k -> xs.map(_._2).sum }
      val withLoops = redirected ++ Map(("purchase", "purchase") -> 1L, ("NULL", "NULL") -> 1L)
      val nFrom = withLoops.groupBy(_._1._1).map { case (a, xs) => a -> xs.values.sum }
      var mass = Map("START" -> 1000000L)
      for (_ <- 1 to AnalyticsExt.MarkovAttrRounds) {
        mass = withLoops.toSeq
          .flatMap { case ((a, b), n) =>
            mass.get(a).map(m => b -> m * n / nFrom(a))
          }
          .groupBy(_._1)
          .map { case (b, xs) => b -> xs.map(_._2).sum }
      }
      mass.getOrElse("purchase", 0L)
    }
    val base = convFor(None)
    val effects = channels.map(c => c -> (base - convFor(Some(c)))).toMap
    val sumEff = effects.values.sum
    assert(got.keySet == channels)
    channels.foreach { c =>
      val (b, rc, eff, attr) = got(c)
      assert(b == base, s"channel $c base")
      assert(rc == base - effects(c), s"channel $c removed conv")
      assert(eff == effects(c) && eff >= 0L, s"channel $c effect (removal must not help)")
      assert(attr == (if (sumEff > 0) effects(c) * 1000000L / sumEff else 0L))
    }
    // shares sum to <= 1e6 (floor loss < #channels)
    val shareSum = got.values.map(_._4).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - channels.size)
  }

  test("edge embeddedness: neighborhood-Jaccard replay on the support-2 graph; top set exact") {
    val got = AnalyticsExt
      .edgeEmbeddedness(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val (edges, _) = copurchaseGraph()
    val nbrs = edges.keys
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2).toSet }
    val scored = edges.keys.toSeq.map { case (a, b) =>
      val cn = (nbrs(a) intersect nbrs(b)).size.toLong
      val den = nbrs(a).size + nbrs(b).size - 2 - cn
      val emb = if (den > 0) cn * 1000000L / den else 0L
      (a, b, nbrs(a).size.toLong, nbrs(b).size.toLong, cn, emb)
    }
    val want = scored.sortBy { case (a, b, _, _, _, e) => (-e, a, b) }.take(100)
    assert(got.toSeq == want)
    // cn never exceeds either endpoint's external degree
    got.foreach { case (_, _, da, db, cn, _) =>
      assert(cn <= da - 1 && cn <= db - 1)
    }
  }

  test("mix shift: BigInt term replay; split telescopes to the contribution up to 2 quanta") {
    val got = AnalyticsExt.mixShift(spark, sf)
      .collect()
      .map { r =>
        (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6),
            if (r.isNullAt(7)) None else Some(r.getLong(7)),
            if (r.isNullAt(8)) None else Some(r.getLong(8)),
            r.getLong(9),
            if (r.isNullAt(10)) None else Some(r.getLong(10))))
      }
      .toMap
    val cm = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf)
        .selectExpr("c_custkey AS o_custkey", "c_mktsegment"), "o_custkey")
      .selectExpr(
        "c_mktsegment AS segment",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, xs) => k -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val tot = cm.toSeq.groupBy(_._1._2).map { case (m, xs) =>
      m -> ((xs.map(_._2._1).sum, xs.map(_._2._2).sum))
    }
    val months = tot.keySet
    def tdiv(num: BigInt, den: BigInt): Long = {
      val s = if (num < 0) -1 else 1
      (s * (num.abs * 10000 / den)).toLong
    }
    months.filter(m => months.contains(m + 1)).foreach { m =>
      val (nt0, _) = tot(m); val (nt1, _) = tot(m + 1)
      val segs = cm.keys.collect { case (s, mm) if mm == m || mm == m + 1 => s }.toSet
      segs.foreach { seg =>
        val (n0, s0) = cm.getOrElse((seg, m), (0L, 0L))
        val (n1, s1) = cm.getOrElse((seg, m + 1), (0L, 0L))
        val status = if (n0 > 0 && n1 > 0) "both" else if (n0 == 0) "new" else "gone"
        val dcontrib = tdiv(BigInt(s1) * nt0 - BigInt(s0) * nt1, BigInt(nt0) * nt1)
        val g = got((m, seg))
        assert((g._1, g._2, g._3, g._4, g._5) == ((n0, n1, s0, s1, status)), s"$m/$seg")
        assert(g._8 == dcontrib, s"$m/$seg dcontrib")
        if (status == "both") {
          val mix = tdiv((BigInt(n1) * nt0 - BigInt(n0) * nt1) * s0, BigInt(nt0) * nt1 * n0)
          val rate = tdiv(BigInt(s1) * n0 - BigInt(s0) * n1, BigInt(nt1) * n0)
          assert(g._6.contains(mix) && g._7.contains(rate), s"$m/$seg terms")
          // exact rational telescoping leaves only truncation slack
          assert(g._9.contains(dcontrib - mix - rate) && math.abs(dcontrib - mix - rate) <= 2,
            s"$m/$seg residual")
        } else assert(g._6.isEmpty && g._7.isEmpty && g._9.isEmpty)
      }
    }
  }

  test("demand classes: SBC quadrant replay; cross-multiplied cutoffs; parts conserve") {
    val got = AnalyticsExt.demandClasses(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val daily = graft.Tables.lineitem(spark, sf)
      .selectExpr(
        "l_partkey",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, xs) => (k, xs.map(_._2).sum) }
      .toSeq
    val want = daily
      .groupBy(_._1._1)
      .toSeq
      .map { case (_, xs) =>
        val days = xs.map(_._1._2)
        val qs = xs.map(_._2)
        val n = BigInt(qs.length)
        val span = BigInt(days.max - days.min)
        val s = qs.map(BigInt(_)).sum
        val sq2 = qs.map(q => BigInt(q) * q).sum
        val lowCv = (n * sq2 - s * s) * 100 < 49 * s * s
        val quadrant =
          if (n < 2) "single_day"
          else if (span * 100 < 132 * (n - 1)) { if (lowCv) "smooth" else "erratic" }
          else { if (lowCv) "intermittent" else "lumpy" }
        (quadrant, s.toLong)
      }
      .groupBy(_._1)
      .map { case (qd, xs) => qd -> ((xs.size.toLong, xs.map(_._2).sum)) }
    assert(got == want)
    val nParts = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey").distinct().count()
    assert(got.values.map(_._1).sum == nParts)
  }

  test("purchase streaks: gaps-and-islands replay; histogram conserves customers") {
    val got = AnalyticsExt
      .purchaseStreaks(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val cm = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .distinct
      .groupBy(_._1)
    val want = cm.map { case (_, xs) =>
      val ms = xs.map(_._2).sorted
      // longest run of consecutive months
      var best = 1L; var cur = 1L
      ms.zip(ms.drop(1)).foreach { case (a, b) =>
        cur = if (b == a + 1) cur + 1 else 1L
        best = math.max(best, cur)
      }
      best
    }.groupBy(identity).map { case (len, xs) => len -> xs.size.toLong }
    assert(got == want)
    assert(got.values.sum == cm.size.toLong)
  }
}
