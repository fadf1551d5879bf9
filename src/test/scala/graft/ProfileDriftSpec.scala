package graft

import graft.operators.{Cdc, Profile}

/** Specs for the r11 profiling batch: #433 value-mask pattern
  * profiling (full driver-side regex replay + share conservation) and
  * #434 payload schema-drift audit (the planted-evolution read:
  * add / rename / span / presence all land where the construction
  * put them).
  */
class ProfileDriftSpec extends SparkSpec {

  private def mask(s: String): String =
    s.replaceAll("[A-Z]+", "A").replaceAll("[a-z]+", "a").replaceAll("[0-9]+", "9")

  test("value mask: driver-side regex replay matches every (column, mask, cnt, share)") {
    val got = Profile
      .valueMask(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val inputs = Seq(
      ("customer.c_name", graft.Tables.customer(spark, sf).select("c_name")),
      ("part.p_name", graft.Tables.part(spark, sf).select("p_name")),
      ("orders.o_orderpriority", graft.Tables.orders(spark, sf).select("o_orderpriority")),
      ("documents.source", graft.Tables.documents(spark, sf).select("source")))
    inputs.foreach { case (label, df) =>
      val vals = df.collect().map(r => mask(r.getString(0)))
      val total = vals.length.toLong
      val hist = vals.groupBy(identity).map { case (m, xs) => m -> xs.length.toLong }
      val top = hist.toSeq.sortBy { case (m, c) => (-c, m) }.take(10)
      top.foreach { case (m, c) =>
        val (cnt, share) = got((label, m))
        assert(cnt == c, s"$label/$m")
        assert(share == c * 1000000L / total, s"$label/$m share")
      }
      // when fewer than 10 masks exist the histogram conserves rows
      if (hist.size <= 10)
        assert(top.map(_._2).sum == total, s"$label mass")
    }
  }

  test("dp counts: exact draw replay from the shared table; utility orders by alpha") {
    val rows = graft.operators.Profile
      .dpCounts(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val trueCounts = graft.Tables
      .customer(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("c_nationkey").cast("long"))
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    graft.operators.Profile.DpTiers.foreach { case (a, b) =>
      val table = graft.operators.Profile.dlapTable(a, b)
      val mine = rows.filter(_._1 == s"$a/$b")
      assert(mine.length == trueCounts.size)
      mine.foreach { case (_, nation, nTrue, noise, released, absErr) =>
        assert(nTrue == trueCounts(nation))
        def g(salt: String): Long = {
          val u = hash60(s"dp:$a/$b:$salt:$nation") % 1000000000000L
          val rhs = (999999999999L - u) * 1000000L
          table.count(_ > rhs).toLong
        }
        val want = g("A") - g("B")
        assert(noise == want, s"$a/$b nation $nation")
        assert(released == nTrue + want && absErr == math.abs(want))
      }
    }
    // utility orders by alpha: smaller alpha (bigger epsilon) = less noise
    val l1 = graft.operators.Profile.DpTiers.map { case (a, b) =>
      rows.filter(_._1 == s"$a/$b").map(_._6).sum
    }
    assert(l1(0) <= l1(1) && l1(1) <= l1(2), s"L1 ordering violated: $l1")
  }

  test("schema drift: the planted add/rename evolution reads back exactly") {
    val rows = Cdc
      .schemaDrift(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.keySet == Set("id", "user_id", "amount", "amount_cents", "channel"))

    val nsPerDay = 86400L * 1000000000L
    val days = graft.Tables
      .events(spark, sf)
      .selectExpr(s"ts div ${nsPerDay}L AS day")
      .collect()
      .map(_.getLong(0))
    val (lo, hi) = (days.min, days.max)
    val t1 = lo + (hi - lo + 1) / 3
    val t2 = lo + 2 * ((hi - lo + 1) / 3)
    val n = days.length.toLong

    // base keys span the whole feed and ride every message
    Seq("id", "user_id").foreach { k =>
      val (first, last, _, nMsgs, presence) = rows(k)
      assert(first == lo && last == hi && nMsgs == n && presence == 1000000L, k)
    }
    // the rename: amount dies the day amount_cents is born
    val amount = rows("amount")
    val amountCents = rows("amount_cents")
    assert(amount._2 < t2 && amountCents._1 >= t2)
    assert(amount._4 + amountCents._4 == n, "rename conserves messages")
    // the add: channel starts at the middle third
    val channel = rows("channel")
    assert(channel._1 >= t1 && channel._1 < t2 && channel._2 == hi)
    // every planted key is present in every message of its span
    rows.values.foreach { case (_, _, _, _, presence) => assert(presence == 1000000L) }
  }
}
