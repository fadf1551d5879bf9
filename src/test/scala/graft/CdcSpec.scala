package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** Shared local session for all specs (sf0.001 data). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"

  /** recall@10 of an ANN result against the brute-force truth — one
    * definition shared by every approximate-search spec.
    */
  def recallAt10(approx: org.apache.spark.sql.DataFrame): Double = {
    val truth = graft.operators.Similarity.bruteForce(spark, sf).select("query_id", "vec_id")
    approx.select("query_id", "vec_id").intersect(truth).count().toDouble / truth.count()
  }

  override def afterAll(): Unit = {
    // shared across suites in one JVM; let the JVM exit tear it down
  }
}

class CdcSpec extends SparkSpec {

  test("classify maps event types to CDC ops, no rows lost") {
    val df = Cdc.classify(spark, sf).cache()
    val total = df.count()
    assert(total > 0)
    val ops = df.groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops.keySet == Set("INSERT", "UPDATE", "DELETE"))
    assert(ops.values.sum == total)
  }

  test("current keeps exactly one row per non-tombstoned key") {
    val cur = Cdc.current(spark, sf)
    assert(cur.groupBy("user_id").count().filter("count > 1").count() == 0)
    // a key whose last change is DELETE must not appear
    val lastOps = Cdc.compact(spark, sf)
    val deleted = lastOps.filter("net_op = 'DELETE'").select("user_id")
    assert(cur.join(deleted, "user_id").count() == 0)
  }

  test("history preserves original INSERT value per key") {
    import org.apache.spark.sql.functions._
    val h = Cdc.history(spark, sf)
    // after the first INSERT of a key, original_value is non-null and
    // constant until the next INSERT — check the carry-forward holds for
    // rows that ARE inserts: original_value == value
    val bad = h.filter(col("change_type") === "INSERT" &&
      col("original_value") =!= col("value")).count()
    assert(bad == 0)
  }

  test("scd2 intervals chain: valid_to of version n = valid_from of n+1, one current per live key") {
    import org.apache.spark.sql.functions._
    val s = Cdc.scd2(spark, sf).cache()
    val currents = s.filter(col("is_current") === 1).groupBy("user_id").count()
    assert(currents.filter("count > 1").count() == 0)
    // intervals are well-formed
    assert(s.filter(col("valid_to").isNotNull && col("valid_to") < col("valid_from")).count() == 0)
  }

  test("redelivery dedup collapses duplicate offsets") {
    val d = Cdc.dedupRedelivery(spark, sf).cache()
    assert(d.groupBy("event_id").count().filter("count > 1").count() == 0)
    assert(d.filter("n_deliveries = 2").count() > 0)
    assert(d.filter("event_id % 10 = 0 AND n_deliveries <> 2").count() == 0)
  }

  test("snapshot diff partitions keys; CHANGED/ADDED rows carry the after-state") {
    import org.apache.spark.sql.functions._
    val d = Cdc.snapshotDiff(spark, sf).cache()
    // every key appears exactly once
    assert(d.groupBy("user_id").count().filter("count > 1").count() == 0)
    assert(d.filter(col("diff") === "ADDED" && col("old_event_id").isNotNull).count() == 0)
    assert(d.filter(col("diff") === "REMOVED" && col("new_event_id").isNotNull).count() == 0)
    assert(d.filter(col("diff") === "UNCHANGED" &&
      col("old_event_id") =!= col("new_event_id")).count() == 0)
  }

  test("stats counts sum to n_changes") {
    import org.apache.spark.sql.functions._
    val st = Cdc.stats(spark, sf)
    val bad = st.filter(
      col("n_inserts") + col("n_updates") + col("n_deletes") =!= col("n_changes")).count()
    assert(bad == 0)
  }

  test("scd3 agrees with current on the live value and carries a real previous") {
    import org.apache.spark.sql.functions._
    val s3 = Cdc.scd3(spark, sf).cache()
    val cur = Cdc.current(spark, sf)
    // same keys as current (both drop tombstoned keys)
    assert(s3.select("user_id").exceptAll(cur.select("user_id")).count() == 0)
    assert(cur.select("user_id").exceptAll(s3.select("user_id")).count() == 0)
    // current_value matches the current table's value
    val joined = s3.join(cur.select(col("user_id"), col("value")), "user_id")
    assert(joined.filter(col("current_value") =!= col("value")).count() == 0)
    // keys with >1 change have a non-null previous value
    val st = Cdc.stats(spark, sf).select(col("user_id"), col("n_changes"))
    val multi = s3.join(st, "user_id").filter(col("n_changes") > 1)
    assert(multi.filter(col("prev_value").isNull).count() == 0)
  }

  test("scd2 lookup picks the version valid at each fact timestamp") {
    import org.apache.spark.sql.functions._
    val lk = Cdc.scd2Lookup(spark, sf).cache()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(lk.count() == orders.count(), "left join must preserve every fact")
    // replay the semantics directly: latest change at or before o_ts
    val changes = Cdc.classify(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val manual = lk
      .join(changes, col("user_id") === col("o_custkey") && col("ts") <= col("o_ts"), "left")
      .groupBy("o_orderkey", "dim_event_id")
      .agg(max(struct(col("ts"), col("event_id"))).as("best"))
    val bad = manual.filter(
      col("dim_event_id").isNotNull && col("best.event_id") =!= col("dim_event_id"))
    assert(bad.count() == 0, "a fact matched a version that is not the latest <= its ts")
    // facts before the key's first version carry null dimension columns
    assert(lk.filter(col("dim_event_id").isNull && col("dim_value").isNotNull).count() == 0)
  }

  test("sequence audit matches a per-key state-machine replay") {
    val audit = Cdc.sequenceAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // brute-force replay of the absent/live state machine per key
    val rows = Cdc.classify(spark, sf)
      .select("user_id", "ts", "event_id", "op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tallies = collection.mutable.Map.empty[(String, String), (Long, collection.mutable.Set[Long])]
    rows.groupBy(_._1).foreach { case (uid, evs) =>
      var live = false
      evs.sortBy(e => (e._2, e._3)).foreach { case (_, _, _, op) =>
        val violation = op match {
          case "INSERT" if live   => "double_insert"
          case "UPDATE" if !live  => "update_while_absent"
          case "DELETE" if !live  => "delete_while_absent"
          case _                  => "ok"
        }
        if (op == "INSERT") live = true
        if (op == "DELETE") live = false
        val (n, keys) = tallies.getOrElseUpdate((op, violation), (0L, collection.mutable.Set.empty[Long]))
        tallies((op, violation)) = (n + 1, keys += uid)
      }
    }
    val expected = tallies.map { case (k, (n, keys)) => k -> (n, keys.size.toLong) }.toMap
    assert(audit == expected)
    // every op accounted for
    assert(audit.values.map(_._1).sum == rows.length)
  }

  test("state ttl audit: horizons tile the key space, retention monotone in horizon") {
    import org.apache.spark.sql.functions._
    val ttl = Cdc.stateTtlAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(ttl.keySet == Set(7L, 30L, 90L))
    val keys = Cdc.classify(spark, sf).select("user_id").distinct().count()
    val changes = Cdc.classify(spark, sf).count()
    ttl.values.foreach { case (ret, exp, chg) =>
      assert(ret + exp == keys)
      assert(chg <= changes)
    }
    // longer horizon retains at least as many keys and changes
    assert(ttl(7L)._1 <= ttl(30L)._1 && ttl(30L)._1 <= ttl(90L)._1)
    assert(ttl(7L)._3 <= ttl(30L)._3 && ttl(30L)._3 <= ttl(90L)._3)
  }

  test("watermark lateness: sharded hierarchy equals the flat global prefix scan") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = Cdc.watermarkLateness(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // shards=1 degenerates to the flat single-window global scan
    val flat = Cdc.watermarkLateness(spark, sf, shards = 1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == flat)
    // buckets tile all events; jitter actually plants disorder
    assert(got.values.map(_._1).sum == Cdc.classify(spark, sf).count())
    assert(got.keySet.size > 1, "planted jitter must produce out-of-order arrivals")
  }

  test("ivm maintenance equals the from-scratch recompute of the view") {
    import org.apache.spark.sql.functions._
    val maintained = Cdc.ivmAgg(spark, sf)
    // independent recompute: current live state -> per-bucket aggregate
    val recomputed = Cdc.current(spark, sf)
      .select(
        (col("user_id") % 16).as("bucket"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_live"), sum("cents").as("sum_value_cents"))
    assert(maintained.exceptAll(recomputed).count() == 0)
    assert(recomputed.exceptAll(maintained).count() == 0)
    assert(maintained.count() > 0)
  }

  test("tombstone gc: horizons monotone, reclaim accounted against dead keys") {
    import org.apache.spark.sql.functions._
    val gc = Cdc.tombstoneGc(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(gc.keySet == Set(7L, 30L, 90L))
    // dead keys partition into reclaimable + retained at every horizon
    val lastOps = Cdc.compact(spark, sf)
    val dead = lastOps.filter(col("net_op") === "DELETE").count()
    gc.values.foreach { case (rec, _, ret) => assert(rec + ret == dead) }
    // longer horizon reclaims no more than a shorter one
    assert(gc(7L)._1 >= gc(30L)._1 && gc(30L)._1 >= gc(90L)._1)
    assert(gc(7L)._2 >= gc(30L)._2 && gc(30L)._2 >= gc(90L)._2)
    // reclaimed rows can never exceed the whole changelog
    val total = Cdc.classify(spark, sf).count()
    gc.values.foreach { case (_, rows, _) => assert(rows <= total) }
    // dead keys exist (whether reclaimable depends on when they died
    // relative to the horizon — at tiny SFs all deaths can be recent)
    assert(dead > 0, "synthetic stream must have tombstoned keys")
  }

  test("scd2 compaction: runs tile the history, adjacent bands differ") {
    import org.apache.spark.sql.functions._
    val c = Cdc.scd2Compact(spark, sf).cache()
    // merged version counts account for every non-DELETE change
    val total = Cdc.classify(spark, sf).filter(col("op") =!= "DELETE").count()
    assert(c.agg(sum("n_versions_merged")).first().getLong(0) == total)
    // intervals chain per user: valid_to of run k = valid_from of k+1
    val byUser = c
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    byUser.values.foreach { runs =>
      val s = runs.sortBy(_._2)
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"interval gap between runs ${a._2} and ${b._2}")
          assert(a._3 != b._3, s"adjacent runs share band ${a._3} — not compacted")
        case _ =>
      }
      assert(s.forall(r => r._4 < r._5))
    }
    // compaction really merged something
    assert(c.filter(col("n_versions_merged") > 1).count() > 0)
    c.unpersist()
  }

  test("balance curve: integral of deltas equals the point-in-time state sum") {
    import org.apache.spark.sql.functions._
    val curve = Cdc.balanceCurve(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(curve.nonEmpty)
    // cumulative integrity: balance(d) = sum of net deltas through d
    var run = 0L
    curve.foreach { case (_, nd, bal) => run += nd; assert(bal == run) }
    // the FINAL balance equals the current-state table's value sum
    val live = Cdc.current(spark, sf)
      .selectExpr("CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .agg(sum("c")).first().getLong(0)
    assert(curve.last._3 == live, s"final ${curve.last._3} vs current-state $live")
    // a mid-series day: balance equals the brute-force as-of state sum
    val midDay = curve(curve.length / 2)._1
    val ch = Cdc.classify(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3), x.getDouble(4)))
    val cutoff = (midDay + 1) * 86400000000L
    val asOf = ch.filter(_._2 < cutoff).groupBy(_._3).values.map { evs =>
      val last = evs.maxBy(e => (e._2, e._1))
      if (last._4 == "DELETE") 0L else math.floor(last._5 * 100 + 0.5).toLong
    }.sum
    assert(curve.find(_._1 == midDay).get._3 == asOf, s"as-of day $midDay")
  }

  test("restatement: exactly the facts whose covering version arrived later") {
    import org.apache.spark.sql.functions._
    val r = Cdc.restatement(spark, sf).cache()
    val got = r
      .collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4))))
      .toMap
    def arrOf(eventId: Long, ts: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"graft-rst:$eventId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ts + java.lang.Long.parseLong(hex.substring(0, 15), 16) % 7200000001L
    }
    val ch = Cdc
      .classify(spark, sf)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3), x.getDouble(4)))
    val horizon = ch.map(_._2).max + 1
    val byUser = ch.groupBy(_._3)
    val exp = byUser.toSeq.flatMap { case (u, evs) =>
      val vers = evs
        .filter(e => e._4 == "INSERT" || (e._4 == "UPDATE" && e._1 % 2 == 0))
        .sortBy(e => (e._2, e._1))
      val closed = vers.zipWithIndex.map { case ((id, ts, _, _, v), i) =>
        val to = if (i + 1 < vers.length) vers(i + 1)._2 else horizon
        (ts, to, arrOf(id, ts), v)
      }
      evs.filter(e => e._4 == "UPDATE" && e._1 % 2 == 1).flatMap { f =>
        val fArr = arrOf(f._1, f._2)
        closed
          .find(c => c._1 <= f._2 && f._2 < c._2)
          .filter(_._3 > fArr)
          .map(c => f._1 -> ((u, f._2, c._4, c._3 - fArr)))
      }
    }.toMap
    assert(got == exp)
    assert(got.nonEmpty, "late-arriving versions must exist in the synthetic stream")
    // every restated fact is strictly late
    assert(r.filter(col("arrived_late_by_us") <= 0).count() == 0)
    r.unpersist()
  }

  test("scd2 align: segments tile each key's joint validity, attributes correct") {
    import org.apache.spark.sql.functions._
    val segs = Cdc.scd2Align(spark, sf).cache()
    assert(segs.count() > 0)
    // every segment is non-empty and both attributes are present
    assert(segs.filter(col("seg_from") >= col("seg_to")).count() == 0)
    assert(
      segs
        .filter(col("acct_value").isNull || col("engagement_value").isNull)
        .count() == 0)
    // per key, segments never overlap: sum of lengths == covered span
    val perKey = segs
      .groupBy("user_id")
      .agg(
        sum(col("seg_to") - col("seg_from")).as("sum_len"),
        min("seg_from").as("lo"),
        max("seg_to").as("hi"),
        count(lit(1)).as("n"))
    // each a-version intersects >= 1 b-version per emitted key, and the
    // union of segments cannot exceed the overall [lo, hi) envelope
    assert(perKey.filter(col("sum_len") > col("hi") - col("lo")).count() == 0)
    // brute-force replay on one sampled user
    val u = segs.select("user_id").orderBy("user_id").first().getLong(0)
    val ch = Cdc
      .classify(spark, sf)
      .filter(col("user_id") === u)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getString(3), r.getDouble(4))) // event_id, ts, op, value
    val horizon = Cdc.classify(spark, sf).agg(max("ts")).first().getLong(0) + 1
    def vers(p: ((Long, Long, String, Double)) => Boolean) = {
      val vs = ch.filter(p).sortBy(e => (e._2, e._1))
      vs.zipWithIndex.map { case ((_, ts, _, v), i) =>
        val to = if (i + 1 < vs.length) vs(i + 1)._2 else horizon
        (ts, to, BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val va = vers(e => e._3 == "INSERT" || (e._3 == "UPDATE" && e._1 % 2 == 0))
    val vb = vers(e => e._3 == "UPDATE" && e._1 % 2 == 1)
    val exp = for {
      (af, at, av) <- va
      (bf, bt, bv) <- vb
      if af < bt && bf < at
    } yield (math.max(af, bf), math.min(at, bt), av, bv)
    val gotU = segs
      .filter(col("user_id") === u)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(s => (s._1, s._2))
    assert(gotU.toSeq == exp.sortBy(s => (s._1, s._2)).toSeq)
    segs.unpersist()
  }

  test("ooo repair: scala replay of the planted delay; repaired state equals cdc_current") {
    val got = Cdc.outOfOrderRepair(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "ts div 1000 AS ts", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._3)
    // replay: arrival = event_id (+1000 when id % 7 == 3); naive state =
    // max arrival (event_id tiebreak), repaired = max (ts, event_id)
    val affected = byUser.flatMap { case (u, xs) =>
      val naive = xs.maxBy { case (e, _, _) =>
        (e + (if (e % 7 == 3) 1000L else 0L), e)
      }._1
      val repaired = xs.maxBy { case (e, ts, _) => (ts, e) }._1
      val sortedByArrival = xs.sortBy { case (e, _, _) =>
        (e + (if (e % 7 == 3) 1000L else 0L), e)
      }
      val inv = sortedByArrival.sliding(2).count {
        case Array((_, t1, _), (_, t2, _)) => t2 < t1
        case _ => false
      }.toLong
      if (naive != repaired) Some(u -> (xs.length.toLong, inv, naive, repaired)) else None
    }
    val g = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6)))
      .toMap
    assert(g == affected, "ooo repair differs from the scala replay")
    // every affected key shows at least one inversion, and the repaired
    // state is exactly what cdc_current (ts-order) reports for that key
    assert(got.filter(org.apache.spark.sql.functions.col("n_inversions") === 0L).count() == 0)
    val cur = Cdc.current(spark, sf)
      .select("user_id", "last_event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.collect().foreach { r =>
      val u = r.getLong(0)
      // keys whose repaired op is DELETE are absent from current
      if (cur.contains(u)) assert(cur(u) == r.getLong(6), s"user $u repaired state")
    }
    got.unpersist()
  }

  test("erasure audit: exactly the tombstoned keys; census ties to stats; eligibility exact") {
    val ea = Cdc.erasureAudit(spark, sf).cache()
    // audited keys = keys absent from current but present in the changelog
    val curKeys = Cdc.current(spark, sf).select("user_id")
      .collect().map(_.getLong(0)).toSet
    val allKeys = Cdc.classify(spark, sf).select("user_id")
      .distinct().collect().map(_.getLong(0)).toSet
    val audited = ea.select("user_id").collect().map(_.getLong(0)).toSet
    assert(audited == allKeys -- curKeys, "audit rows = tombstoned keys exactly")
    // row census agrees with cdc_stats for those keys
    val st = Cdc.stats(spark, sf)
      .select("user_id", "n_changes", "n_inserts", "n_updates", "n_deletes")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val nowTs = Cdc.classify(spark, sf)
      .agg(org.apache.spark.sql.functions.max("ts")).head.getLong(0)
    ea.collect().foreach { r =>
      val u = r.getLong(0)
      assert(st(u) == ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))), s"user $u")
      val age = (nowTs - r.getLong(6)) / 86400000000L
      assert(r.getLong(7) == age, s"user $u age")
      assert(r.getLong(8) == (if (nowTs - r.getLong(6) >= 7L * 86400000000L) 1L else 0L))
    }
    ea.unpersist()
  }

  test("hot keys: top-10 replay with exact shares; cumulative share monotone") {
    val rows = Cdc.hotKeys(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    val per = Tables.events(spark, sf).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = per.map(_._2).sum
    val want = per.sortBy { case (k, n) => (-n, k) }.take(10)
    rows.zip(want).foreach { case ((rank, uid, n, share, _, nk, nt), (wuid, wn)) =>
      assert(uid == wuid && n == wn)
      assert(share == n * 1000000L / total)
      assert(nt == total && nk == per.length.toLong)
    }
    val cums = rows.map(_._5)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "cumulative share monotone")
    assert(cums.last == want.map(_._2).sum * 1000000L / total)
  }
}
