package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The IVF contract: (1) cell probing bounds scan cost to ~nprobe/k of
  * the corpus per query, (2) recall is monotone in nprobe, (3) an
  * approximate result can never beat exact brute force.
  */
class IvfSpec extends SparkSpec {

  test("ivf results are rank-contiguous top-k that never beat brute force") {
    val ivf = Similarity.ivf(spark, sf).cache()
    assert(ivf.count() > 0)
    assert(ivf.filter(col("rank") < 1 || col("rank") > 10).count() == 0)
    assert(ivf.groupBy("query_id").count().filter("count > 10").count() == 0)
    val bf = Similarity.bruteForce(spark, sf).filter(col("rank") === 1)
      .select(col("query_id"), col("cos").as("bf_cos"))
    val top = ivf.filter(col("rank") === 1).select(col("query_id"), col("cos").as("ivf_cos"))
    assert(bf.join(top, "query_id").filter(col("ivf_cos") > col("bf_cos") + 1e-9).count() == 0)
  }

  test("recall is monotone in nprobe and full probing equals brute force") {
    val r1 = recallAt10(Similarity.ivf(spark, sf, nprobe = 1))
    val r2 = recallAt10(Similarity.ivf(spark, sf, nprobe = 2))
    val rAll = recallAt10(Similarity.ivf(spark, sf, nprobe = 16))
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 $r1")
    assert(rAll >= 0.999, s"probing every cell must recover brute force, got $rAll")
  }

  test("inverted file partitions the corpus; occupancy bounded so probing stays cheap") {
    val assign = Similarity.ivfAssignments(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    // every vector lands in exactly one cell
    assert(assign.count() == n)
    assert(assign.groupBy("vec_id").count().filter("count > 1").count() == 0)
    // no degenerate cell: the largest inverted list stays a small
    // multiple of the n/k mean, so an nprobe-cell probe reads a bounded
    // corpus fraction instead of one giant list
    val maxCell = assign.groupBy("cell").count().agg(max("count")).head.getLong(0)
    assert(maxCell <= (4 * n) / 16, s"largest cell $maxCell of $n vectors")
  }

  test("cell balance: rollup ties to the #29 assignment; shares and purity exact") {
    val got = graft.operators.Similarity.cellBalance(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val a = graft.operators.Similarity.centroidAssign(spark, sf)
      .select("vec_id", "label", "assigned_label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCell = a.groupBy(_._3).map { case (c, xs) =>
      c -> ((xs.length.toLong, xs.count(x => x._2 == x._3).toLong))
    }
    val t = a.length.toLong
    val mx = byCell.values.map(_._1).max
    val nc = byCell.size.toLong
    val exp = byCell.map { case (c, (n, p)) =>
      c -> ((n, n * 1000000L / t, p * 1000000L / n, mx * nc * 1000000L / t))
    }
    assert(got == exp, "cell balance differs from the assignment rollup")
    // label-mean centroids must beat the uniform-assignment baseline
    // decisively (the synthetic labels are only weakly clustered —
    // measured pooled purity ≈ 0.37 vs the 1/n_labels = 0.1 baseline)
    val nLabels = a.map(_._2).distinct.length
    val pooledPurity = byCell.values.map(_._2).sum.toDouble / t
    assert(pooledPurity >= 2.0 / nLabels, s"pooled purity $pooledPurity")
  }

  test("knn graph: independent top-k selection replay within cells; degrees bounded") {
    graft.functions.GraftFunctions.register(spark)
    val got = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val assign = Similarity.ivfAssignments(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // all candidate pairs with the SAME Spark-computed cosine kernel;
    // the replay re-does only the selection (join + rank), in scala
    val emb = Tables.embeddings(spark, sf).selectExpr("vec_id", "embedding")
    val pairs = emb.alias("a")
      .crossJoin(emb.selectExpr("vec_id AS nbr_id", "embedding AS emb_b").alias("b"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .selectExpr("vec_id", "nbr_id", "round(cosine_sim(embedding, emb_b), 6) AS cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => assign(a) == assign(b) }
    val want = pairs.groupBy(_._1).toSeq.flatMap { case (v, xs) =>
      xs.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((_, nbr, cos), i) => (v, nbr, cos, i + 1L) }
    }.toSet
    assert(got.toSet == want)
    // degree bound and co-celled contract
    got.groupBy(_._1).foreach { case (v, xs) =>
      assert(xs.length <= 5)
      assert(xs.length == math.min(5, pairs.count(_._1 == v)))
      xs.foreach { case (_, nbr, _, _) => assert(assign(v) == assign(nbr)) }
    }
  }

  test("nprobe curve: each point ties the standalone ivf search; monotone in p") {
    val curve = Similarity.ivfNprobeCurve(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(curve.keySet == Similarity.NprobePoints.map(_.toLong).toSet)
    val truth = Similarity.bruteForce(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nQ = truth.map(_._1).size.toLong
    Similarity.NprobePoints.foreach { p =>
      // the min_rn <= p slice IS the nprobe=p search: hits must equal
      // the standalone operator's intersection with the truth
      val standalone = Similarity.ivf(spark, sf, nprobe = p)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (gotNq, _, hits, rec) = curve(p.toLong)
      assert(gotNq == nQ)
      assert(hits == standalone.intersect(truth).size.toLong, s"nprobe $p hits")
      assert(rec == hits * 1000000L / (nQ * 10L))
    }
    // nested slices: candidates and recall monotone non-decreasing in p
    val byP = Similarity.NprobePoints.map(p => curve(p.toLong)).toSeq
    byP.zip(byP.drop(1)).foreach { case ((_, c1, h1, _), (_, c2, h2, _)) =>
      assert(c2 >= c1 && h2 >= h1)
    }
  }
}
