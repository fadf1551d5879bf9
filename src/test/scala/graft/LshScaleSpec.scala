package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** The 100×-scale contract of the hyperplane LSH family: bit count is
  * DERIVED from corpus size (expected bucket occupancy bounded by
  * `TargetBucket` at any n), and multi-table banding recovers the
  * recall each table's banding gives up. A fixed bit count — the
  * round-2 design — lets occupancy grow linearly with the corpus and
  * the within-bucket self-join go quadratic; this spec pins the
  * replacement.
  */
class LshScaleSpec extends SparkSpec {

  test("numPlanes grows with corpus size and clamps to [4, 24]") {
    assert(Similarity.numPlanes(1) == 4)
    assert(Similarity.numPlanes(500) == 4)
    // 100 TB-scale corpus: 1e9 vectors → 22 bits, not 6
    assert(Similarity.numPlanes(1000000000L) == 22)
    assert(Similarity.numPlanes(1L << 45) == 24)
    // monotone non-decreasing in n
    val ns = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L, 1L << 40)
    assert(ns.map(Similarity.numPlanes).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("expected bucket occupancy n / 2^bits stays ≤ TargetBucket up to the clamp ceiling") {
    // holds for every corpus size until bits hit the 24-bit clamp
    // (beyond n = 2^32 the knob is TargetBucket or more tables)
    for (e <- 0 to 32) {
      val n = 1L << e
      val occ = n.toDouble / (1L << Similarity.numPlanes(n))
      assert(occ <= Similarity.TargetBucket, s"n=$n occupancy $occ")
    }
  }

  test("observed max bucket occupancy is a small multiple of the expected mean") {
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val n = vecs.count()
    val bits = Similarity.numPlanes(n)
    val occ = Similarity
      .bandedBuckets(vecs, "embedding", bits)
      .groupBy("t", "bucket")
      .count()
    val maxOcc = occ.agg(max("count")).head.getLong(0)
    val mean = math.max(1.0, n.toDouble / (1L << bits))
    assert(maxOcc <= 8 * mean, s"max occupancy $maxOcc vs mean $mean (bits=$bits)")
  }

  test("a second hyperplane table does not lose recall vs one table") {
    val one = recallAt10(Similarity.lsh(spark, sf, tables = 1))
    val two = recallAt10(Similarity.lsh(spark, sf, tables = 2))
    assert(two >= one, s"2-table recall $two < 1-table $one")
  }

  test("embedding near-dup recall on planted pairs survives the derived-bits banding") {
    val planted = Tables
      .embeddings(spark, sf)
      .filter(col("vec_id") % 4 === 0)
      .count()
    val found = Dedup
      .embedding(spark, sf)
      .filter(col("vec_b") === col("vec_a") + 1000000L)
      .count()
    // θ ≈ 0 between a vector and its jittered copy → per-table miss
    // probability ≈ 0; all planted pairs must surface
    assert(found == planted, s"found $found of $planted planted pairs")
  }

  test("ann eval: recall/MRR agree with a direct set comparison of the two indexes") {
    val ev = graft.operators.Similarity.evalRecall(spark, sf).cache()
    val bf = graft.operators.Similarity.bruteForce(spark, sf)
      .select("query_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ls = graft.operators.Similarity.lsh(spark, sf)
      .select("query_id", "vec_id", "rank")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val exp = bf.groupBy(_._1).map { case (q, rows) =>
      val hits = rows.count { case (qq, v, _) => ls.contains((qq, v)) }.toLong
      val rr = rows.find(_._3 == 1L).flatMap { case (qq, v, _) =>
        ls.get((qq, v)).map(1000000L / _)
      }.getOrElse(0L)
      q -> (hits, hits * 1000000L / 10L, rr)
    }
    val g = ev.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(g == exp, "eval harness differs from the direct comparison")
    assert(g.keySet.size == 10)
    assert(g.values.forall { case (h, rec, rr) =>
      h >= 0 && h <= 10 && rec <= 1000000 && rr <= 1000000
    })
    ev.unpersist()
  }

  test("ann eval ndcg: independently derived discounts; direct DCG replay; [0,1e6]") {
    // derive the e6 discounts from scratch — the spec must not trust
    // the production constants it is checking
    val w = (1 to 10).map(i => math.floor(1e6 / (math.log(i + 1) / math.log(2))).toLong)
    val idcg = w.zipWithIndex.map { case (wi, i) => (10L - i) * wi }.sum
    val nd = SparkEntry.queries("ann_eval_ndcg")(spark, sf).cache()
    val bfRank = graft.operators.Similarity.bruteForce(spark, sf)
      .select("query_id", "vec_id", "rank")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val ls = graft.operators.Similarity.lsh(spark, sf)
      .select("query_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = ls.groupBy(_._1).map { case (q, rows) =>
      val dcg = rows.map { case (qq, v, lrank) =>
        bfRank.get((qq, v)).map(br => (11L - br) * w(lrank.toInt - 1)).getOrElse(0L)
      }.sum
      val nRel = rows.count { case (qq, v, _) => bfRank.contains((qq, v)) }.toLong
      q -> ((nRel, dcg, dcg * 1000000L / idcg))
    }
    val g = nd.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(g == exp, "ndcg differs from the direct replay")
    assert(g.values.forall { case (_, _, n) => n >= 0 && n <= 1000000 })
    // a perfectly-ordered full-recall query would score exactly 1e6
    nd.unpersist()
  }
}
