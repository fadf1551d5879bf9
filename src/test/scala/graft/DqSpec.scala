package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Data-quality audit contract: the rule engine detects exactly the
  * planted violations on corrupted inputs, and the real testdata's one
  * genuine defect (lineitem's non-unique (l_orderkey, l_linenumber))
  * is reported while every other rule passes.
  */
class DqSpec extends SparkSpec {

  test("dq audit on the sf tables: lineitem pk rule fails, the rest pass") {
    val a = Profile.dqAudit(spark, sf).cache()
    assert(a.count() == 11)
    val failing = a.filter(col("pass") === 0).collect()
    assert(failing.length == 1, s"expected exactly one failing rule, got ${failing.toSeq}")
    assert(failing.head.getString(1) == "pk_unique:(l_orderkey,l_linenumber)")
    assert(failing.head.getLong(3) > 0)
    // checked counts equal the table sizes
    val n = a.filter(col("table_name") === "orders").select(max("n_checked")).head.getLong(0)
    assert(n == Tables.orders(spark, sf).count())
  }

  test("dq rules flag exactly the planted violations on corrupted inputs") {
    import spark.implicits._
    val ts = Timestamp.valueOf("1995-06-01 00:00:00")
    val badTs = Timestamp.valueOf("1931-01-01 00:00:00")
    // orders: duplicate key 1, orphan custkey 99, negative price, pre-1990 date
    val orders = Seq(
      (1L, 10L, "O", 5.0, ts, "1-URGENT"),
      (1L, 10L, "O", 5.0, ts, "1-URGENT"),
      (2L, 99L, "O", -3.0, badTs, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val customer = Seq((10L, "c", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    // lineitem: orphan orderkey 7, quantity 99 out of range
    val lineitem = Seq(
      (1L, 1L, 1L, 1, 99.0, 1.0, 0.05, 0.0),
      (7L, 1L, 1L, 1, 5.0, 1.0, 2.00, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val events = Seq((1L, 1L, 1L, "teleport", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = Profile.dqRules(orders, lineitem, customer, events).cache()
    def viol(rule: String): Long =
      a.filter(col("rule") === rule).head.getLong(3)
    assert(viol("pk_unique:o_orderkey") == 1)
    assert(viol("fk:o_custkey->customer") == 1)
    assert(viol("range:o_totalprice>0") == 1)
    assert(viol("range:o_orderdate in [1990,2030)") == 1)
    assert(viol("fk:l_orderkey->orders") == 1)
    assert(viol("range:l_quantity in [1,50]") == 1)
    assert(viol("range:l_discount in [0,1]") == 1)
    assert(viol("domain:event_type") == 1)
    assert(viol("not_null:o_custkey") == 0)
    assert(viol("pk_unique:c_custkey") == 0)
  }

  test("fd check: per-candidate scala replay; the PK FD holds, the known-false ones do not") {
    import graft.operators.Profile
    val got = Profile.fdCheck(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.size == 5)
    def replay(df: org.apache.spark.sql.DataFrame, l: String, r: String) = {
      val pairs = df.selectExpr(s"CAST($l AS STRING)", s"CAST($r AS STRING)")
        .collect().map(x => (x.getString(0), x.getString(1)))
      val byL = pairs.groupBy(_._1).map { case (_, xs) => xs.map(_._2).distinct.size.toLong }
      (byL.size.toLong, byL.count(_ > 1).toLong, byL.max,
        if (byL.count(_ > 1) == 0) 1L else 0L)
    }
    assert(got(("nation", "n_nationkey", "n_regionkey")) ==
      replay(graft.Tables.nation(spark, sf), "n_nationkey", "n_regionkey"))
    assert(got(("events", "user_id", "event_type")) ==
      replay(graft.Tables.events(spark, sf), "user_id", "event_type"))
    assert(got(("lineitem", "l_partkey", "l_suppkey")) ==
      replay(graft.Tables.lineitem(spark, sf), "l_partkey", "l_suppkey"))
    // the key-determined FD holds; per-user event types genuinely vary
    assert(got(("nation", "n_nationkey", "n_regionkey"))._4 == 1L)
    assert(got(("events", "user_id", "event_type"))._4 == 0L)
  }

  test("heatmap 2d: cells partition the orders; marginal totals conserved") {
    import graft.operators.Profile
    val cells = Profile.heatmap2d(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // grain = orders with >= 1 lineitem (the joint needs both axes);
    // zero-line orders are a data artifact the 1-D marginal (#91) keeps
    val withLines = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    assert(cells.map(_._3).sum == withLines, "every lined order lands in exactly one cell")
    assert(cells.forall { case (x, y, n, _) => x >= 0 && x < 8 && y >= 0 && y < 8 && n > 0 })
    // cents conservation over the same grain
    val totCents = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf).select("l_orderkey").distinct()
        .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v")
      .agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0)
    assert(cells.map(_._4).sum == totCents)
  }

  test("ind discovery: scala set-containment replay; star FKs hold, coverage bounded") {
    val got = Profile.indCheck(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.size == Profile.indCandidates.size)
    // scala replay for two candidates: a true star FK and the reverse
    def vals(t: String, c: String): Set[Long] = {
      val df = t match {
        case "lineitem" => Tables.lineitem(spark, sf)
        case "orders" => Tables.orders(spark, sf)
        case "customer" => Tables.customer(spark, sf)
        case _ => fail(s"unexpected table $t")
      }
      df.selectExpr(s"CAST($c AS BIGINT) AS v").na.drop().distinct()
        .collect().map(_.getLong(0)).toSet
    }
    for ((lt, lc, rt, rc) <- Seq(
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_custkey", "orders", "o_custkey"))) {
      val l = vals(lt, lc)
      val r = vals(rt, rc)
      val missing = (l -- r).size.toLong
      val (nl, nm, cov, holds) = got((s"$lt.$lc", s"$rt.$rc"))
      assert(nl == l.size.toLong && nm == missing, s"$lt.$lc subset of $rt.$rc")
      assert(cov == (nl - nm) * 1000000L / nl)
      assert(holds == (if (missing == 0L) 1L else 0L))
    }
    // the orders->customer FK genuinely holds; contract sanity on all rows
    assert(got(("orders.o_custkey", "customer.c_custkey"))._4 == 1L)
    got.values.foreach { case (nl, nm, cov, holds) =>
      assert(nm >= 0 && nm <= nl && cov >= 0 && cov <= 1000000L)
      assert(holds == (if (nm == 0L) 1L else 0L))
    }
  }

  test("key discovery: exact distinct replay per combo; the PK flags, the control does not") {
    val got = Profile.keyDiscovery(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == Profile.KeyCombos.map(_.mkString(",")).toSet)
    val rows = Tables.orders(spark, sf)
      .selectExpr(
        "o_orderkey", "o_custkey", "CAST(o_orderdate AS STRING) AS o_orderdate",
        "o_totalprice", "o_orderstatus", "o_orderpriority")
      .collect()
      .map(r => Map(
        "o_orderkey" -> r.get(0), "o_custkey" -> r.get(1), "o_orderdate" -> r.get(2),
        "o_totalprice" -> r.get(3), "o_orderstatus" -> r.get(4),
        "o_orderpriority" -> r.get(5)))
    Profile.KeyCombos.foreach { combo =>
      val distinct = rows.map(m => combo.map(m)).distinct.length.toLong
      val n = rows.length.toLong
      val (nr, nd, isKey, dup) = got(combo.mkString(","))
      assert(nr == n && nd == distinct, s"combo $combo")
      assert(isKey == (if (n == distinct) 1L else 0L))
      assert(dup == (BigInt(n) * 1000000 / BigInt(distinct)).toLong)
    }
    // the declared PK really is one; the low-cardinality control is not
    assert(got("o_orderkey")._3 == 1L)
    assert(got("o_orderstatus,o_orderpriority")._3 == 0L)
  }
}
