package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Randomized (seeded) as-of join check against a naive per-row
  * reference computed on the driver: for every left row, the right
  * payload must be that of the latest right row with time <= left
  * time on the same key — including keys with no right rows (null)
  * and exact time ties (right row wins, inclusive semantics).
  */
class AsOfSpec extends SparkSpec {

  test("as-of join equals the naive per-row lookup on a randomized dataset") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 800).map(i => (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 300).map(i => (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, i.toLong))
      // pre-resolve right-side (key, time) ties: keep max payload
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq

    val l = left.toDF("l_id", "k", "t")
    val r = right.toDF("k", "t", "payload")
      .select(col("k").as("rk"), col("t").as("rt"), col("payload"))

    val got = AsOf
      .join(l, r, "k", "rk", "t", "rt", Seq("payload"))
      .select("l_id", "payload")
      .collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap

    val byKey = right.groupBy(_._1)
    val expect = left.map { case (id, k, t) =>
      val candidates = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
      id -> (if (candidates.isEmpty) None
             else Some(candidates.maxBy(c => (c._2, c._3))._3))
    }.toMap

    assert(got.size == expect.size)
    val diffs = expect.collect { case (id, e) if got(id) != e => (id, e, got(id)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("nearest picks the min-|delta| side, ties backward, null when no right rows") {
    import spark.implicits._
    // key 1: order at t=100 and t=200 — event at 140 → backward (40 ≤ 60),
    // event at 160 → forward (40 < 60), event at 150 → TIE → backward.
    // key 2: only a later order → forward. key 3: no orders → null.
    val left = Seq((1L, 1L, 140L), (2L, 1L, 160L), (3L, 1L, 150L), (4L, 2L, 50L), (5L, 3L, 10L))
      .toDF("l_id", "k", "t")
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 90L, 30L))
      .toDF("rk", "rt", "payload")
    val got = AsOf
      .nearest(left, right, "k", "rk", "t", "rt", Seq("payload"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)), Option(r.getAs[String]("direction")), Option(r.get(5))))
      .toMap
    assert(got(1L) == ((Some(10L), Some("b"), Some(40L))))
    assert(got(2L) == ((Some(20L), Some("f"), Some(-40L))))
    assert(got(3L) == ((Some(10L), Some("b"), Some(50L))))
    assert(got(4L) == ((Some(30L), Some("f"), Some(-40L))))
    assert(got(5L) == ((None, None, None)))
  }
}
