package graft

import graft.operators.AnalyticsExt

/** Driver-side replays for the r11 stats batch (§2 #430-#432):
  * Wilcoxon signed-rank, CUPED, and the Yule-Walker AR(2) backtest.
  * Each test refolds the whole operator from the raw tables with
  * BigInt arithmetic and compares every output column exactly — the
  * same discipline as CoresetSpec/HstOutlierSpec.
  */
class StatsBSpec extends SparkSpec {

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("wilcoxon: exact replay of pairs, midranks, tie term and z; rank mass conserved") {
    val row = AnalyticsExt.wilcoxonSignedRank(spark, sf).collect().head
    val (nPairs, wPlus2x, wMinus2x, tieT, zE6) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))

    val orders = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(month(CAST(o_orderdate AS DATE)) % 2 AS BIGINT) AS par",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ds = orders
      .groupBy(_._1)
      .values
      .flatMap { xs =>
        val x = xs.filter(_._2 == 1).map(_._3)
        val y = xs.filter(_._2 == 0).map(_._3)
        if (x.nonEmpty && y.nonEmpty && x.sum != y.sum) Some(y.sum - x.sum) else None
      }
      .toSeq
    val n = ds.size.toLong
    assert(nPairs == n)
    // doubled midranks: 2*avgrank = 2*(count strictly below) + t + 1
    val byAbs = ds.groupBy(math.abs).toSeq.sortBy(_._1)
    var below = 0L
    var wp2 = BigInt(0)
    var tie = BigInt(0)
    byAbs.foreach { case (_, group) =>
      val t = group.size.toLong
      val pos = group.count(_ > 0).toLong
      wp2 += BigInt(pos) * (2 * below + t + 1)
      tie += BigInt(t) * t * t - t
      below += t
    }
    assert(wPlus2x == wp2.toLong)
    assert(tieT == tie.toLong)
    // rank mass: W+ + W- on the doubled grid is n(n+1)
    assert(wPlus2x + wMinus2x == n * (n + 1))
    val mu2x = BigInt(n) * (n + 1) / 2
    val var2x = (2 * BigInt(n) * (n + 1) * (2 * n + 1) - tie) / 12
    val s0 = BigInt(math.sqrt(var2x.toDouble).floor.toLong)
    val sigma = s0 + (if ((s0 + 1) * (s0 + 1) <= var2x) 1 else 0) -
      (if (s0 * s0 > var2x) 1 else 0)
    val diff = BigInt(wPlus2x) - mu2x
    val want = (if (diff >= 0) 1 else -1) * (diff.abs * 1000000 / sigma)
    assert(zE6 == want.toLong)
  }

  test("cuped: exact co-moment replay; rho2 in [0, 1e6]; adjusted diff = raw - theta*pre-gap") {
    val row = AnalyticsExt.cuped(spark, sf).collect().head
    val nsPerDay = 86400L * 1000000000L
    val ev = graft.Tables
      .events(spark, sf)
      .selectExpr("user_id", s"ts div ${nsPerDay}L AS day", "CAST(floor(value + 0.5) AS BIGINT) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lo = ev.map(_._2).min
    val hi = ev.map(_._2).max
    val split = lo + (hi - lo + 1) / 2
    val perUser = ev.groupBy(_._1).map { case (u, xs) =>
      val x = xs.filter(_._2 < split).map(_._3).sum
      val y = xs.filter(_._2 >= split).map(_._3).sum
      (u, BigInt(x), BigInt(y), hash60(s"cuped:$u") % 2)
    }.toSeq
    val n = BigInt(perUser.size)
    val sx = perUser.map(_._2).sum
    val sy = perUser.map(_._3).sum
    val sxx = perUser.map(p => p._2 * p._2).sum
    val syy = perUser.map(p => p._3 * p._3).sum
    val sxy = perUser.map(p => p._2 * p._3).sum
    val n1 = BigInt(perUser.map(_._4).sum)
    val n0 = n - n1
    val sx1 = perUser.filter(_._4 == 1).map(_._2).sum
    val sy1 = perUser.filter(_._4 == 1).map(_._3).sum
    val num = n * sxy - sx * sy
    val denX = n * sxx - sx * sx
    val denY = n * syy - sy * sy
    def sdiv(a: BigInt, b: BigInt): BigInt = (if (a < 0) -1 else 1) * (a.abs / b)
    val theta = sdiv(num * 1000000, denX)
    val dRaw = sdiv((sy1 * n0 - (sy - sy1) * n1) * 1000000, n1 * n0)
    val gapX = sx1 * n0 - (sx - sx1) * n1
    val dCuped = dRaw - sdiv(theta * gapX, n1 * n0)
    val rho2 = num * num * 1000000 / (denX * denY)
    assert(row.getLong(0) == n.toLong && row.getLong(1) == n1.toLong && row.getLong(2) == n0.toLong)
    assert(row.getLong(3) == theta.toLong)
    assert(row.getLong(4) == dRaw.toLong)
    assert(row.getLong(5) == dCuped.toLong)
    assert(row.getLong(6) == rho2.toLong)
    assert(rho2 >= 0 && rho2 <= 1000000)
  }

  test("conformal: full split replay; empirical coverage lands near the 0.9 target") {
    val row = AnalyticsExt.conformal(spark, sf).collect().head
    val byDay = graft.Tables
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
    val lo = byDay.map(_._1).min
    val hi = byDay.map(_._1).max
    val t1 = lo + (hi - lo + 1) / 3
    val t2 = lo + 2 * ((hi - lo + 1) / 3)
    val train = byDay.filter(_._1 < t1)
    val model = train.groupBy(_._1 % 7).map { case (s, xs) =>
      s -> xs.map(_._2).sum / xs.size
    }
    val calScores = byDay
      .filter(d => d._1 >= t1 && d._1 < t2)
      .map { case (d, y) => (math.abs(y - model(d % 7)), d) }
      .sorted
    val nCal = calScores.size.toLong
    val r = math.min(nCal, (9 * (nCal + 1) + 9) / 10).toInt
    val qhat = calScores(r - 1)._1
    val test = byDay.filter(_._1 >= t2)
    val covered = test.count { case (d, y) => math.abs(y - model(d % 7)) <= qhat }
    assert(row.getLong(0) == train.size.toLong)
    assert(row.getLong(1) == nCal && row.getLong(2) == test.size.toLong)
    assert(row.getLong(3) == qhat)
    assert(row.getLong(4) == covered.toLong)
    assert(row.getLong(5) == covered.toLong * 1000000L / test.size)
    // the distribution-free guarantee, read empirically: measured
    // 0.895/0.908 at sf0.001/0.01 against the 0.9 target
    assert(row.getLong(5) >= 820000L && row.getLong(5) <= 980000L)
  }

  test("isotonic: minimax closed form == sequential PAVA; monotone; mass conserved per pool") {
    val rows = AnalyticsExt
      .isotonic(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 9L))
    // raw rates replay from the bin sums
    rows.foreach { case (_, n, s, raw, _) => assert(raw == s * 1000000L / n) }
    // monotone non-decreasing fit
    rows.sliding(2).foreach { w => assert(w(0)._5 <= w(1)._5) }
    // sequential pool-adjacent-violators on the same (n, s) bins must
    // land on the same values — the two-formulation identity
    var pools = rows.map { case (_, n, s, _, _) => (BigInt(n), BigInt(s)) }.toVector
    var merged = true
    while (merged) {
      merged = false
      val idx = pools.indices.dropRight(1).find { i =>
        // rate_i > rate_{i+1}  <=>  s_i * n_{i+1} > s_{i+1} * n_i
        pools(i)._2 * pools(i + 1)._1 > pools(i + 1)._2 * pools(i)._1
      }
      idx.foreach { i =>
        val p = (pools(i)._1 + pools(i + 1)._1, pools(i)._2 + pools(i + 1)._2)
        pools = pools.patch(i, Seq(p), 2)
        merged = true
      }
    }
    // expand pools back to per-bin values and compare on the e6 grid
    val binN = rows.map(_._2)
    var want = Vector.empty[Long]
    var bi = 0
    pools.foreach { case (pn, ps) =>
      var acc = BigInt(0)
      while (acc < pn) {
        want :+= (ps * 1000000 / pn).toLong
        acc += binN(bi)
        bi += 1
      }
    }
    assert(rows.map(_._5).toVector == want)
  }

  test("trend test: exact Cochran-Armitage replay; flag consistent with the statistic") {
    val row = AnalyticsExt.trendTest(spark, sf).collect().head
    val groups = graft.Tables
      .lineitem(spark, sf)
      .selectExpr(
        "least(4L, CAST(floor(l_quantity - 0.5) AS BIGINT) div 10) AS w",
        "CAST(l_returnflag = 'R' AS LONG) AS y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (w, xs) => (w, BigInt(xs.size), BigInt(xs.map(_._2).sum)) }
      .toSeq
    val bigN = groups.map(_._2).sum
    val bigY = groups.map(_._3).sum
    val swy = groups.map(g => g._1 * g._3).sum
    val swn = groups.map(g => g._1 * g._2).sum
    val sw2n = groups.map(g => g._1 * g._1 * g._2).sum
    val a = bigN * swy - bigY * swn
    val den = bigY * (bigN - bigY) * (bigN * sw2n - swn * swn)
    assert(row.getLong(0) == groups.size.toLong)
    assert(row.getLong(1) == bigN.toLong && row.getLong(2) == bigY.toLong)
    assert(row.getLong(3) == a.toLong)
    val z2 = a * a * bigN * 1000000 / den
    assert(row.getLong(4) == z2.toLong)
    assert(row.getLong(5) == (if (z2 >= 3841459) 1L else 0L))
  }

  test("g-test: exact term replay; G tracks chi2 on the shared large-N table") {
    val rows = AnalyticsExt
      .gTest(spark, sf)
      .collect()
      .map(r =>
        ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val cells = graft.Tables
      .orders(spark, sf)
      .selectExpr("o_orderstatus", "o_orderpriority")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity)
      .map { case (k, xs) => (k, xs.length.toLong) }
    val n = cells.values.sum
    val rowm = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val colm = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    var gTotal = 0L
    cells.foreach { case ((st, pr), o) =>
      val r = rowm(st); val c = colm(pr)
      val term =
        math.floor(2.0 * o * math.log((o.toDouble * n) / (r.toDouble * c)) * 1e6 + 0.5).toLong
      val (nCell, expE6, gE6, _) = rows((st, pr))
      assert(nCell == o && gE6 == term, s"$st/$pr")
      assert(expE6 == (BigInt(r) * c * 1000000 / n).toLong)
      gTotal += term
    }
    rows.values.foreach { case (_, _, _, tot) => assert(tot == gTotal) }
    // on a large-N table G and Pearson chi2 agree to second order;
    // both read the same (near-independent) contingency here
    val chi2 = AnalyticsExt
      .chi2Assoc(spark, sf)
      .collect()
      .head
      .getLong(5)
    assert(math.abs(gTotal - chi2) <= math.max(gTotal, chi2) / 10,
      s"G $gTotal vs chi2 $chi2 diverge > 10%")
  }

  /** Daily cents per event type, the shared series under the r13
    * time-series diagnostics — independent Scala fold from raw events.
    */
  private def dailySeries(): Map[String, Vector[(Long, Long)]] = {
    val nsPerDay = 86400L * 1000000000L
    graft.Tables
      .events(spark, sf)
      .selectExpr(
        "event_type",
        s"ts div ${nsPerDay}L AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, xs) =>
        t -> xs
          .groupBy(_._2)
          .map { case (d, ys) => (d, ys.map(_._3).sum) }
          .toVector
          .sortBy(_._1)
      }
  }

  test("jarque-bera: exact power-sum replay; near-zero JB on a synthetic normal check") {
    val got = AnalyticsExt
      .jarqueBera(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    dailySeries().foreach { case (t, series) =>
      val cs = series.map(_._2)
      val n = cs.length.toLong
      val s1 = cs.map(BigInt(_)).sum
      val s2 = cs.map(c => BigInt(c) * c).sum
      if (n >= 8 && BigInt(n) * s2 - s1 * s1 > 0) {
        val s3 = cs.map(c => BigInt(c) * c * c).sum
        val s4 = cs.map(c => BigInt(c) * c * c * c).sum
        val m1 = s1.toDouble / n; val r2 = s2.toDouble / n
        val r3 = s3.toDouble / n; val r4 = s4.toDouble / n
        val m2 = r2 - m1 * m1
        val m3 = r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1
        val m4 = r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1
        val skew = m3 / math.sqrt(m2 * m2 * m2)
        val kurt = m4 / (m2 * m2)
        val jb = (n.toDouble / 6.0) * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
        val (gn, gs, gk, gj, rej) = got(t)
        assert(gn == n, t)
        assert(gs == math.floor(skew * 1e6 + 0.5).toLong, t)
        assert(gk == math.floor(kurt * 1e6 + 0.5).toLong, t)
        assert(gj == math.floor(jb * 1e6 + 0.5).toLong, t)
        assert(rej == (if (gj > 5991465) 1L else 0L), t)
      } else assert(!got.contains(t), t)
    }
  }

  test("durbin-watson: closed form equals the explicit-residual statistic") {
    val got = AnalyticsExt
      .durbinWatson(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    dailySeries().foreach { case (t, series) =>
      val n = series.length
      if (got.contains(t)) {
        // explicit residuals from the same OLS fit
        val sd = series.map(p => BigInt(p._1)).sum
        val sy = series.map(p => BigInt(p._2)).sum
        val sdd = series.map(p => BigInt(p._1) * p._1).sum
        val sdy = series.map(p => BigInt(p._1) * p._2).sum
        val b = (BigInt(n) * sdy - sd * sy).toDouble / (BigInt(n) * sdd - sd * sd).toDouble
        val a = (sy.toDouble - b * sd.toDouble) / n
        val e = series.map { case (d, c) => c - a - b * d }
        val num = e.sliding(2).map { w => val x = w(1) - w(0); x * x }.sum
        val den = e.map(x => x * x).sum
        val dwExplicit = num / den
        val (gn, dwE6, rhoE6, flag) = got(t)
        assert(gn == n.toLong, t)
        // the operator's power-sum form and this residual form are
        // algebraically equal; doubles may differ in the last ulps
        assert(math.abs(dwE6 / 1e6 - dwExplicit) < 1e-4, s"$t: $dwE6 vs $dwExplicit")
        assert(rhoE6 == 1000000L - dwE6 / 2, t)
        assert(flag == (if (dwE6 < 1500000L) 1L else 0L), t)
      } else assert(n < 8, t)
    }
  }

  test("adf: centered-sum replay; t negative when the series mean-reverts") {
    val got = AnalyticsExt
      .adfTest(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    dailySeries().foreach { case (t, series) =>
      val pairs = series.map(_._2).sliding(2).collect { case Vector(x0, x1) => (x0, x1 - x0) }.toVector
      val m = pairs.length
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sdl = pairs.map(p => BigInt(p._2)).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val sxd = pairs.map(p => BigInt(p._1) * p._2).sum
      val sdd = pairs.map(p => BigInt(p._2) * p._2).sum
      if (m >= 10 && BigInt(m) * sxx - sx * sx > 0) {
        val cxx = m.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        val cxd = m.toDouble * sxd.toDouble - sx.toDouble * sdl.toDouble
        val cdd = m.toDouble * sdd.toDouble - sdl.toDouble * sdl.toDouble
        if (cdd * cxx - cxd * cxd > 0) {
          val rho = cxd / cxx
          val tStat = rho * math.sqrt((m - 2.0) * cxx / (cdd - cxd * cxd / cxx))
          val (gm, gr, gt, rej) = got(t)
          assert(gm == m.toLong, t)
          assert(gr == math.floor(rho * 1e6 + 0.5).toLong, t)
          assert(gt == math.floor(tStat * 1e6 + 0.5).toLong, t)
          assert(rej == (if (gt < -2860000L) 1L else 0L), t)
          // daily spend around a stable level mean-reverts: rho < 0
          assert(gr < 0, s"$t rho should be negative on level-stationary cents")
        }
      } else assert(!got.contains(t), t)
    }
  }

  test("pacf: Durbin-Levinson replay; pacf1 == r1 by construction") {
    val got = AnalyticsExt
      .pacf(spark, sf)
      .collect()
      .map(r =>
        r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getLong(7)))
      .toMap
    dailySeries().foreach { case (t, series) =>
      val cs = series.map(_._2)
      val n = cs.length
      val sy = cs.map(BigInt(_)).sum
      val syy = cs.map(c => BigInt(c) * c).sum
      if (n >= 12 && BigInt(n) * syy - sy * sy > 0) {
        def ckn(k: Int): Double = {
          val head = cs.dropRight(k); val tail = cs.drop(k)
          val p = head.zip(tail).map { case (x, y) => BigInt(x) * y }.sum
          val h = head.map(BigInt(_)).sum; val tl = tail.map(BigInt(_)).sum
          val m = (n - k).toDouble
          n.toDouble * n.toDouble * p.toDouble -
            n.toDouble * sy.toDouble * (h.toDouble + tl.toDouble) +
            m * sy.toDouble * sy.toDouble
        }
        val c0 = n.toDouble * n.toDouble * syy.toDouble - n.toDouble * sy.toDouble * sy.toDouble
        val (r1, r2, r3) = (ckn(1) / c0, ckn(2) / c0, ckn(3) / c0)
        if (1.0 - r1 * r1 != 0.0) {
          val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
          val phi21 = r1 * (1.0 - phi22)
          if (1.0 - phi21 * r1 - phi22 * r2 != 0.0) {
            val phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1.0 - phi21 * r1 - phi22 * r2)
            val (gn, gr1, gr2, gr3, p1, p2, p3) = got(t)
            assert(gn == n.toLong, t)
            // replay multiplies the same exact integers in a different
            // association order; allow one ulp on the e6 grid
            assert(math.abs(gr1 - math.floor(r1 * 1e6 + 0.5).toLong) <= 1, t)
            assert(math.abs(gr2 - math.floor(r2 * 1e6 + 0.5).toLong) <= 1, t)
            assert(math.abs(gr3 - math.floor(r3 * 1e6 + 0.5).toLong) <= 1, t)
            assert(p1 == gr1, s"$t pacf1 must equal r1")
            assert(math.abs(p2 - math.floor(phi22 * 1e6 + 0.5).toLong) <= 1, t)
            assert(math.abs(p3 - math.floor(phi33 * 1e6 + 0.5).toLong) <= 1, t)
          }
        }
      } else assert(!got.contains(t), t)
    }
  }

  test("capture-recapture: Chapman replay; estimate brackets the true distinct count") {
    val row = AnalyticsExt.captureRecapture(spark, sf).collect().head
    val docs = graft.Tables
      .documents(spark, sf)
      .selectExpr("doc_id", "md5(text) AS fp")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byFp = docs.groupBy(_._2).values.toSeq.map { xs =>
      val ids = xs.map(_._1)
      (ids.exists(id => hash60(s"capA:$id") % 100 < 30),
        ids.exists(id => hash60(s"capB:$id") % 100 < 30))
    }
    val nTrue = byFp.size.toLong
    val nA = byFp.count(_._1).toLong
    val nB = byFp.count(_._2).toLong
    val m = byFp.count(p => p._1 && p._2).toLong
    val nHat = (nA + 1) * (nB + 1) / (m + 1) - 1
    assert(row.getLong(0) == nA && row.getLong(1) == nB && row.getLong(2) == m)
    assert(row.getLong(3) == nHat && row.getLong(4) == nTrue)
    // structural bounds + the measured accuracy band (11% here; 30%
    // is the generous sampling-variance envelope at this corpus)
    assert(m <= math.min(nA, nB) && nHat >= math.max(nA, nB))
    assert(math.abs(row.getLong(5)) <= 300000L)
  }

  test("ar2: Yule-Walker replay from the day series; in-sample AR(2) beats the naive forecast") {
    val row = AnalyticsExt.ar2Forecast(spark, sf).collect().head
    val byDay = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (d, xs) => (d, xs.map(_._2).sum / 100) }
      .toSeq
      .sortBy(_._1)
    val n = BigInt(byDay.size)
    val s = byDay.map(x => BigInt(x._2)).sum
    def sdiv(a: BigInt, b: BigInt): BigInt = (if (a < 0) -1 else 1) * (a.abs / b)
    val v = byDay.map { case (_, x) => sdiv(n * x - s, n) }
    val c0 = v.map(u => u * u).sum
    val c1 = v.zip(v.drop(1)).map { case (a, b) => a * b }.sum
    val c2 = v.zip(v.drop(2)).map { case (a, b) => a * b }.sum
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == c0.toLong && row.getLong(2) == c1.toLong && row.getLong(3) == c2.toLong)
    val c0s = sdiv(c0, 1000); val c1s = sdiv(c1, 1000); val c2s = sdiv(c2, 1000)
    val den = c0s * c0s - c1s * c1s
    assert(den > 0)
    val phi1 = sdiv(c1s * (c0s - c2s) * 1000000, den)
    val phi2 = sdiv((c0s * c2s - c1s * c1s) * 1000000, den)
    assert(row.getLong(4) == phi1.toLong && row.getLong(5) == phi2.toLong)
    // backtest replay on the e6 grid
    val muE6 = s * 1000000 / n
    val xs = byDay.map(x => BigInt(x._2))
    val terms = (2 until xs.size).map { t =>
      val pred = muE6 + phi1 * v(t - 1) + phi2 * v(t - 2)
      val errAr = (xs(t) * 1000000 - pred).abs
      val errNaive = (xs(t) - xs(t - 1)).abs * 1000000
      (errAr, errNaive)
    }
    val sumAr = terms.map(_._1).sum
    val sumNaive = terms.map(_._2).sum
    val nScored = BigInt(terms.size)
    assert(row.getLong(6) == nScored.toLong)
    assert(row.getLong(7) == (sumAr / (nScored * 1000000)).toLong)
    assert(row.getLong(8) == (sumNaive / (nScored * 1000000)).toLong)
    val ratio = sumAr * 1000000 / sumNaive
    assert(row.getLong(9) == ratio.toLong)
    // the fitted AR(2) must beat last-value persistence in-sample
    assert(ratio < 1000000)
  }

  test("eb shrinkage: exact replay; shrunk rate sits between raw and global") {
    val got = AnalyticsExt.ebShrinkage(spark, sf).collect()
    assert(got.length == 50)
    val per = graft.Tables
      .orders(spark, sf)
      .selectExpr("o_custkey", "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
      .groupBy(_._1)
      .map { case (c, xs) => (c, xs.length.toLong, xs.map(_._2).sum) }
      .toVector
    val totN = per.map(_._2).sum
    val totC = per.map(_._3).sum
    val all = per.map { case (c, n, x) =>
      val raw = x * 1000000L / n
      val shrunk = (x * totN + 20L * totC) * 1000000L / (totN * (n + 20L))
      (c, n, x, raw, shrunk, shrunk - raw)
    }
    val top = all.sortBy { case (c, _, _, _, _, d) => (-math.abs(d), c) }.take(50)
    val gotSorted = got
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy { case (c, _, _, _, _, d) => (-math.abs(d), c) }
    assert(gotSorted.toVector == top)
    val g = totC.toDouble / totN
    top.foreach { case (c, n, x, raw, shrunk, _) =>
      val lo = math.min(raw / 1e6, g) - 1e-6
      val hi = math.max(raw / 1e6, g) + 1e-6
      assert(shrunk / 1e6 >= lo && shrunk / 1e6 <= hi, s"cust $c shrunk outside [raw, global]")
    }
  }

  test("rmst: independent KM fold + clipped integral; monotone in tau") {
    val byCust = graft.Tables
      .orders(spark, sf)
      .selectExpr("o_custkey", "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .toVector
      .map { case (_, xs) => (xs.map(_._2).min, xs.map(_._2).max) }
    val mmax = byCust.map(_._2).max
    val lifes = byCust.map { case (m0, m1) => (m1 - m0, if (m1 < mmax - 2) 1L else 0L) }
    val byT = lifes
      .groupBy(_._1)
      .map { case (t, xs) => (t, xs.length.toLong, xs.map(_._2).sum) }
      .toVector
      .sortBy(_._1)
    // at-risk suffix counts + integer survival fold
    val steps = {
      var surv = 1000000L
      val suffix = byT.scanRight(0L) { case ((_, cnt, _), acc) => cnt + acc }.init
      byT.zip(suffix).map { case ((t, _, d), n) =>
        surv = surv * (n - d) / n
        (t, surv)
      }
    }
    def rmstAt(tau: Long): Long = {
      val tFirst = steps.head._1
      var acc = 1000000L * math.min(tFirst, tau)
      steps.zipWithIndex.foreach { case ((t, s), i) =>
        val tNext = if (i + 1 < steps.length) steps(i + 1)._1 else tau
        acc += s * (math.min(tNext, tau) - math.min(t, tau))
      }
      acc
    }
    val got = AnalyticsExt
      .rmst(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    Seq(6L, 12L, 24L).foreach { tau =>
      val want = rmstAt(tau)
      val (g, frac) = got(tau)
      assert(g == want, s"tau $tau: $g vs $want")
      assert(frac == g / tau, s"tau $tau frac")
      assert(g <= 1000000L * tau, s"tau $tau: rmst cannot exceed tau")
    }
    assert(got(6L)._1 <= got(12L)._1 && got(12L)._1 <= got(24L)._1)
    assert(got(6L)._2 >= got(12L)._2 && got(12L)._2 >= got(24L)._2)
  }

  test("hurst: per-block R/S replay; exponent from the 3-point log-log slope") {
    val got = AnalyticsExt
      .hurstRs(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    dailySeries().foreach { case (t, series) =>
      val cs = series.map(_._2)
      val mrs = Seq(5, 10, 15).flatMap { w =>
        val rsBlocks = cs
          .grouped(w)
          .filter(_.length == w)
          .flatMap { blk =>
            val s1 = blk.sum
            val s2 = blk.map(c => BigInt(c) * c).sum
            val prefix = blk.scanLeft(0L)(_ + _).tail
            val cds = prefix.zipWithIndex.map { case (p, i) => w * p - (i + 1) * s1 }
            val den = BigInt(w) * s2 - BigInt(s1) * s1
            if (den > 0)
              Some(math.floor(
                (cds.max - cds.min).toDouble /
                  math.sqrt(w.toDouble * s2.toDouble - s1.toDouble * s1.toDouble) * 1e9 +
                  0.5).toLong)
            else None
          }
          .toVector
        if (rsBlocks.nonEmpty) Some(w -> rsBlocks.sum / rsBlocks.length) else None
      }.toMap
      if (mrs.keySet == Set(5, 10, 15) && mrs.values.forall(_ > 0)) {
        val (g5, g10, g15, h) = got(t)
        assert((g5, g10, g15) == ((mrs(5), mrs(10), mrs(15))), t)
        val hw = ((-0.5972531564093522) * math.log(mrs(5).toDouble / 1000000000.0)
          + (0.09589402415059345) * math.log(mrs(10).toDouble / 1000000000.0)
          + (0.5013591322587576) * math.log(mrs(15).toDouble / 1000000000.0)) /
          0.6172679762079831
        assert(h == math.floor(hw * 1e6 + 0.5).toLong, t)
        // R/S exponents live in (0, 1.25) for any real series at
        // these tiny block counts; a wild value means a broken fold
        assert(h > 0 && h < 1250000, s"$t hurst $h")
      } else assert(!got.contains(t), t)
    }
  }

  test("sprt: Wald walk replay; crossing flags are prefix-monotone") {
    def h60(str: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val daily = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (ck, _, _) => h60(s"sprt:$ck") % 2 == 1 }
      .groupBy(_._2)
      .toVector
      .map { case (d, xs) => (d, xs.length.toLong, xs.map(_._3.toLong).sum) }
      .sortBy(_._1)
    val lnPos = 0.06001800972625295
    val incr = daily.map { case (d, n, s) =>
      (d, n, s, math.floor((s * lnPos + (n - s) * (-lnPos)) * 1e6 + 0.5).toLong)
    }
    val cums = incr.scanLeft(0L) { case (acc, (_, _, _, i)) => acc + i }.tail
    val got = AnalyticsExt
      .sprt(spark, sf)
      .collect()
      .map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))
      .toMap
    assert(got.keySet == incr.map(_._1).toSet)
    var cmax = Long.MinValue; var cmin = Long.MaxValue
    incr.zip(cums).foreach { case ((d, n, s, li), cum) =>
      cmax = math.max(cmax, cum); cmin = math.min(cmin, cum)
      val (gn, gs, gli, gcum, rej, acc) = got(d)
      assert((gn, gs, gli, gcum) == ((n, s, li, cum)), s"day $d")
      assert(rej == (if (cmax >= 2944439L) 1L else 0L), s"day $d rej")
      assert(acc == (if (cmin <= -2944439L) 1L else 0L), s"day $d acc")
    }
    // flags latch: once crossed, they stay crossed for every later day
    val ordered = incr.map(_._1).map(got)
    ordered.map(_._5).foldLeft(0L) { (prev, r) => assert(r >= prev); r }
    ordered.map(_._6).foldLeft(0L) { (prev, a) => assert(a >= prev); a }
  }

  test("mcnemar: discordant-pair replay; continuity-corrected chi2 exact") {
    val per = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(month(CAST(o_orderdate AS DATE)) % 2 AS INT) AS par",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
      .toVector
      .map { case (_, xs) =>
        val odd = xs.filter(_._2 == 1); val even = xs.filter(_._2 == 0)
        (odd.nonEmpty, even.nonEmpty,
          if (odd.exists(_._3 == 1)) 1 else 0,
          if (even.exists(_._3 == 1)) 1 else 0)
      }
      .filter(p => p._1 && p._2)
    val b = per.count(p => p._3 == 1 && p._4 == 0).toLong
    val c = per.count(p => p._3 == 0 && p._4 == 1).toLong
    val row = AnalyticsExt.mcnemar(spark, sf).collect().head
    assert(row.getLong(0) == per.size.toLong)
    assert(row.getLong(1) == b && row.getLong(2) == c)
    val chi2 = (math.abs(b - c) - 1) * (math.abs(b - c) - 1) * 1000000L / (b + c)
    assert(row.getLong(3) == chi2)
    assert(row.getLong(4) == (if (chi2 > 3841459L) 1L else 0L))
  }

  test("negbin: moment replay on daily counts; p in (0,1] and r > 0 when overdispersed") {
    val daily = graft.Tables
      .events(spark, sf)
      .selectExpr("event_type", s"ts div ${86400L * 1000000000L}L AS day")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (t, xs) => t -> xs.groupBy(_._2).values.map(_.length.toLong).toVector }
    val got = AnalyticsExt
      .negbinFit(spark, sf)
      .collect()
      .map(r =>
        r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getLong(4)),
            if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getLong(6)))
      .toMap
    daily.foreach { case (t, cs) =>
      val n = cs.length
      if (n >= 8) {
        val s1 = cs.sum
        val s2 = cs.map(c => BigInt(c) * c).sum
        val m = s1.toDouble / n
        val v = (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1)
        if (m > 0 && v > 0) {
          val (gn, me, de, re, pe, od) = got(t)
          assert(gn == n.toLong, t)
          assert(me == math.floor(m * 1e6 + 0.5).toLong, t)
          assert(de == math.floor(v / m * 1e6 + 0.5).toLong, t)
          if (v > m) {
            assert(od == 1L, t)
            assert(re.get == math.floor(m * m / (v - m) * 1e6 + 0.5).toLong, t)
            assert(pe.get == math.floor(m / v * 1e6 + 0.5).toLong, t)
            assert(re.get > 0 && pe.get > 0 && pe.get <= 1000000L, t)
          } else assert(od == 0L && re.isEmpty && pe.isEmpty, t)
        }
      } else assert(!got.contains(t), t)
    }
  }

  test("friedman: doubled-midrank replay; rank mass 20 per block; tie-corrected chi2 exact") {
    val per = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST((month(CAST(o_orderdate AS DATE)) - 1) div 3 AS INT) AS qtr",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
      .toVector
      .map { case (_, xs) =>
        (0 to 3).map(q => xs.filter(_._2 == q).map(_._3).sum).toVector
      }
    val drs = per.map { vals =>
      vals.map(v => 2L * vals.count(_ < v) + vals.count(_ == v) + 1L)
    }
    // every block's doubled ranks sum to 2*(1+2+3+4) = 20 regardless of ties
    drs.foreach(dr => assert(dr.sum == 20L))
    val n = drs.length.toLong
    val r2 = (0 to 3).map(j => drs.map(_(j)).sum)
    val sdr2 = drs.flatten.map(d => BigInt(d) * d).sum
    val den = sdr2 - BigInt(n) * 4 * 25
    val num = BigInt(3) * r2.map(r => BigInt(r - n * 5) * (r - n * 5)).sum * 1000000
    val row = AnalyticsExt.friedman(spark, sf).collect().head
    assert(row.getLong(0) == n)
    (0 to 3).foreach(j => assert(row.getLong(1 + j) == r2(j), s"R2_$j"))
    assert(row.getLong(5) == (num / den).toLong)
    assert(row.getLong(6) == (if ((num / den).toLong > 7814728L) 1L else 0L))
  }

  test("bass: Cramer replay from daily adopters; honest not-bass-shaped corpus read") {
    val d0s = graft.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .toVector
      .map { case (_, xs) => xs.map(_._2).min }
    val daily = d0s.groupBy(identity).toVector.map { case (d, xs) => (d, xs.length.toLong) }.sortBy(_._1)
    val cprev = daily.scanLeft(0L) { case (acc, (_, nn)) => acc + nn }.init
    val rows = daily.zip(cprev).map { case ((_, nn), cp) => (nn, cp) }
    val t = rows.length
    val sc = rows.map(r => BigInt(r._2)).sum
    val sc2 = rows.map(r => BigInt(r._2) * r._2).sum
    val sc3 = rows.map(r => BigInt(r._2) * r._2 * r._2).sum
    val sc4 = rows.map(r => BigInt(r._2) * r._2 * r._2 * r._2).sum
    val sy = rows.map(r => BigInt(r._1)).sum
    val syc = rows.map(r => BigInt(r._2) * r._1).sum
    val syc2 = rows.map(r => BigInt(r._2) * r._2 * r._1).sum
    val (m00, m01, m02, m12, m22) = (t.toDouble, sc.toDouble, sc2.toDouble, sc3.toDouble, sc4.toDouble)
    val (b0, b1, b2) = (sy.toDouble, syc.toDouble, syc2.toDouble)
    val det = m00 * (m02 * m22 - m12 * m12) - m01 * (m01 * m22 - m12 * m02) +
      m02 * (m01 * m12 - m02 * m02)
    val a = (b0 * (m02 * m22 - m12 * m12) - m01 * (b1 * m22 - m12 * b2) +
      m02 * (b1 * m12 - m02 * b2)) / det
    val b = (m00 * (b1 * m22 - b2 * m12) - b0 * (m01 * m22 - m12 * m02) +
      m02 * (m01 * b2 - m02 * b1)) / det
    val c = (m00 * (m02 * b2 - m12 * b1) - m01 * (m01 * b2 - m02 * b1) +
      b0 * (m01 * m12 - m02 * m02)) / det
    val row = AnalyticsExt.bassDiffusion(spark, sf).collect().head
    assert(row.getLong(0) == t.toLong)
    assert(row.getLong(1) == math.floor(a * 1e6 + 0.5).toLong)
    assert(row.getLong(2) == math.floor(b * 1e9 + 0.5).toLong)
    assert(row.getLong(3) == math.floor(c * 1e12 + 0.5).toLong)
    // the fit residuals must beat the intercept-only model in-sample
    // (OLS guarantees it); and this corpus is NOT bass-shaped
    val bassShaped = c < 0.0 && b * b - 4.0 * a * c > 0.0
    assert(row.getLong(4) == (if (bassShaped) 1L else 0L))
    if (!bassShaped) assert(row.isNullAt(5) && row.isNullAt(6) && row.isNullAt(7))
  }

  test("gumbel: block-maxima moment replay; return levels ordered rl60 > rl12 > mu") {
    val got = AnalyticsExt
      .gumbelFit(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    dailySeries().foreach { case (t, series) =>
      val blocks = series
        .groupBy { case (d, _) => d / 2 }
        .toVector
        .map { case (_, xs) => xs.map(_._2).max }
      val nb = blocks.length
      val s1 = blocks.map(BigInt(_)).sum
      val s2 = blocks.map(b => BigInt(b) * b).sum
      if (nb >= 12 && BigInt(nb) * s2 - s1 * s1 > 0) {
        val mean = s1.toDouble / nb
        val v = (s2.toDouble - s1.toDouble * s1.toDouble / nb) / (nb - 1)
        val beta = math.sqrt(6.0 * v) / math.Pi
        val mu = mean - 0.5772156649015329 * beta
        val (gn, gmu, gbeta, rl12, rl60) = got(t)
        assert(gn == nb.toLong, t)
        assert(gmu == math.floor(mu * 100 + 0.5).toLong, t)
        assert(gbeta == math.floor(beta * 100 + 0.5).toLong, t)
        assert(rl12 == math.floor((mu + beta * 2.441716398881459) * 100 + 0.5).toLong, t)
        assert(rl60 == math.floor((mu + beta * 4.085952773003955) * 100 + 0.5).toLong, t)
        assert(rl60 > rl12 && rl12 > gmu, s"$t return levels must order")
      } else assert(!got.contains(t), t)
    }
  }

  test("handoff: per-user timeline replay; share mass per from-type conserved") {
    val rows = graft.Tables
      .events(spark, sf)
      .selectExpr("user_id", "ts div 1000 AS tus", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = rows
      .groupBy(_._1)
      .toVector
      .flatMap { case (_, xs) =>
        val s = xs.sortBy(e => (e._2, e._3))
        s.zip(s.tail).map { case (a, b) => ((a._4, b._4), b._2 - a._2) }
      }
    val want = pairs
      .groupBy(_._1)
      .map { case ((f, t2), gs) =>
        (f, t2) -> (gs.length.toLong, gs.map(_._2).sum, gs.map(_._2).max)
      }
    val fromTotals = want.toSeq.groupBy(_._1._1).map { case (f, xs) => f -> xs.map(_._2._1).sum }
    val got = AnalyticsExt
      .handoffTimes(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k @ (f, _), (n, tot, mx)) =>
      val (gn, mean, gmx, gtot, share) = got(k)
      assert(gn == n && gtot == tot && gmx == mx, s"$k")
      assert(mean == tot / n, s"$k mean")
      assert(share == n * 1000000L / fromTotals(f), s"$k share")
    }
    // per from-type, the floored shares sum to at most 1e6 and within
    // alphabet-size rounding of it
    got.toSeq.groupBy(_._1._1).foreach { case (f, xs) =>
      val s = xs.map(_._2._5).sum
      assert(s <= 1000000L && s > 1000000L - xs.length, s"$f share mass")
    }
  }

  test("graph diameter: scala BFS replay from the same edges; reach curve monotone") {
    val po = graft.Tables
      .lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toVector
    val edges = po
      .groupBy(_._1)
      .toVector
      .flatMap { case (_, xs) =>
        val ps = xs.map(_._2).distinct.sorted
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }
      .groupBy(identity)
      .iterator
      .collect { case (e, os) if os.length >= 2 => e }
      .toVector
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).toSet }
    val nodes = adj.keySet
    val landmarks = nodes.toVector.sorted.take(4)
    val got = AnalyticsExt
      .landmarkBfs(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.keySet == landmarks.toSet)
    landmarks.foreach { l =>
      var dist = Map(l -> 0L)
      var frontier = Set(l)
      (1 to 4).foreach { d =>
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)).diff(dist.keySet)
        dist ++= frontier.map(_ -> d.toLong)
      }
      val (nr, w1, w2, w3, ecc) = got(l)
      assert(nr == dist.size.toLong, s"$l reached")
      assert(w1 == dist.values.count(_ <= 1).toLong, s"$l w1")
      assert(w2 == dist.values.count(_ <= 2).toLong, s"$l w2")
      assert(w3 == dist.values.count(_ <= 3).toLong, s"$l w3")
      assert(ecc == dist.values.max, s"$l ecc")
      assert(w1 <= w2 && w2 <= w3 && w3 <= nr && ecc <= 4)
    }
  }

  test("price elasticity: e9-ln OLS replay per brand") {
    val li = graft.Tables
      .lineitem(spark, sf)
      .join(
        graft.Tables.part(spark, sf).select("p_partkey", "p_brand"),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr(
        "p_brand",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m",
        "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ec")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = AnalyticsExt
      .priceElasticity(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    li.groupBy(_._1).foreach { case (brand, xs) =>
      val monthly = xs
        .groupBy(_._2)
        .toVector
        .map { case (_, ys) => (ys.map(_._3).sum, ys.map(_._4).sum) }
        .filter { case (sq, se) => sq > 0 && se > 0 }
      val lns = monthly.map { case (sq, se) =>
        (math.floor(math.log(se.toDouble / sq.toDouble) * 1e9 + 0.5).toLong,
          math.floor(math.log(sq.toDouble) * 1e9 + 0.5).toLong)
      }
      val m = lns.length
      val sp = lns.map(p => BigInt(p._1)).sum
      val sq2 = lns.map(p => BigInt(p._2)).sum
      val spq = lns.map(p => BigInt(p._1) * p._2).sum
      val spp = lns.map(p => BigInt(p._1) * p._1).sum
      if (m >= 12 && BigInt(m) * spp - sp * sp > 0) {
        val el = (m.toDouble * spq.toDouble - sp.toDouble * sq2.toDouble) /
          (m.toDouble * spp.toDouble - sp.toDouble * sp.toDouble)
        val (gm, ge) = got(brand)
        assert(gm == m.toLong, brand)
        assert(ge == math.floor(el * 1e6 + 0.5).toLong, brand)
      } else assert(!got.contains(brand), brand)
    }
  }
}
