package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Profile, Similarity}

class ProfileQuantSpec extends SparkSpec {

  test("corpus checksum: rollup row is the exact lane-sum of the sources") {
    val rows = Profile
      .corpusChecksum(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (all, per) = rows.partition(_._1 == "__all__")
    assert(all.length == 1 && per.nonEmpty)
    assert(all.head._2 == per.map(_._2).sum)
    assert(all.head._3 == per.map(_._3).sum)
    assert(all.head._4 == per.map(_._4).sum)
    assert(all.head._5 == per.map(_._5).sum)
    assert(all.head._2 == Tables.documents(spark, sf).count())
    // order-independence: digest survives an adversarial repartition
    val again = Profile.corpusChecksum(spark, sf)
    assert(
      Profile.corpusChecksum(spark, sf).exceptAll(again).count() == 0)
    // digests are non-degenerate (hash mass actually accumulated)
    per.foreach { case (_, n, _, lo, hi) =>
      assert(lo > 0 && hi > 0 && n > 0)
    }
  }

  test("gram matrix: upper triangle matches a scala fixed-point replay") {
    val g = Similarity
      .gramMatrix(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val vecs = Tables
      .embeddings(spark, sf)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1000000.0).toLong).toArray)
    val d = vecs.head.length
    // dim guard: the DuckDB oracles enumerate SparkEntry.EmbeddingDim
    // dimensions — a testdata dim change must fail HERE, loudly, not as
    // a silent oracle truncation
    assert(d == graft.SparkEntry.EmbeddingDim,
      s"embeddings dim $d != SparkEntry.EmbeddingDim ${graft.SparkEntry.EmbeddingDim}")
    assert(g.size == d * (d + 1) / 2)
    for (i <- 0 until d; j <- i until d) {
      val s = vecs.map(v => v(i) * v(j)).sum
      assert(g((i.toLong, j.toLong)) == ((s, vecs.length.toLong)), s"cell ($i,$j)")
    }
    // diagonal is non-negative (sum of squares)
    (0 until d).foreach(i => assert(g((i.toLong, i.toLong))._1 >= 0))
  }

  test("benford: digit counts replay exactly; deviations bounded") {
    val rows = Profile
      .benford(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 9L))
    val prices = Tables
      .orders(spark, sf)
      .selectExpr("CAST(floor(o_totalprice) AS BIGINT) AS d")
      .collect()
      .map(_.getLong(0))
    val exp = prices.map(_.toString.head.asDigit.toLong).groupBy(identity).map {
      case (d, xs) => d -> xs.length.toLong
    }
    val n = prices.length.toLong
    rows.foreach { case (d, cnt, obs, e6, dev) =>
      assert(cnt == exp.getOrElse(d, 0L), s"digit $d count")
      assert(obs == cnt * 1000000 / n, s"digit $d observed")
      assert(dev == math.abs(obs - e6), s"digit $d deviation")
    }
    assert(rows.map(_._2).sum == n)
    // digit-1 leads in any Benford-ish (or even uniform-log) price set
    assert(rows.head._2 >= rows.last._2)
  }

  test("profile: one row per column, distinct counts sane") {
    val p = Profile.profile(Tables.customer(spark, sf)).cache()
    assert(p.count() == Tables.customer(spark, sf).columns.length)
    val n = Tables.customer(spark, sf).count()
    assert(p.filter(col("n_distinct") > n).count() == 0)
    assert(p.filter(col("n_nulls") =!= 0).count() == 0) // synthetic data has no nulls
  }

  test("value histogram: buckets tile the range, counts total, bounds inside buckets") {
    val h = Profile.valueHistogram(spark, sf, width = 25.0).cache()
    assert(h.agg(sum("n")).head.getLong(0) == Tables.events(spark, sf).count())
    // every observed min/max lies inside its bucket's [start, start+width)
    assert(h.filter(
      col("lo") < col("bucket_start") || col("hi") >= col("bucket_start") + 25.0).count() == 0)
    assert(h.filter(col("lo") > col("hi") || col("n") < 1).count() == 0)
  }

  test("approx profile tracks exact within 5% — the constant-memory 100 TB mode") {
    val cust = Tables.customer(spark, sf)
    val exact = Profile.profile(cust)
      .select(col("column"), col("n_distinct").as("d_exact"))
    val approx = Profile.profile(cust, approxDistinct = true)
      .select(col("column"), col("n_distinct").as("d_approx"))
    val off = exact
      .join(approx, "column")
      .filter(abs(col("d_approx") - col("d_exact")) > greatest(lit(1), col("d_exact") * 0.05))
    assert(off.count() == 0, s"sketches drifted: ${off.collect().mkString(", ")}")
    // identical shape either way: same columns, same row count
    assert(Profile.profile(cust, approxDistinct = true).columns.toSeq ==
      Profile.profile(cust).columns.toSeq)
  }

  test("quantization preserves cosine similarity to ~1e-2") {
    graft.functions.GraftFunctions.register(spark)
    val orig = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val a = orig.limit(20).withColumnRenamed("vec_id", "id_a")
    val pairs = a
      .crossJoin(orig.limit(20).withColumnRenamed("vec_id", "id_b").withColumnRenamed("embedding", "emb_b"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        expr("cosine_sim(embedding, emb_b)").as("cos_orig"))
    val deq = Similarity.quantize(spark, sf)
      .select(col("vec_id"), expr("transform(qvec, x -> CAST(x AS FLOAT))").as("deq"))
    val da = deq.withColumnRenamed("vec_id", "id_a").withColumnRenamed("deq", "deq_a")
    val db = deq.withColumnRenamed("vec_id", "id_b").withColumnRenamed("deq", "deq_b")
    val joined = pairs
      .join(da, "id_a")
      .join(db, "id_b")
      .select(
        (expr("cosine_sim(deq_a, deq_b)") - col("cos_orig")).as("err"))
    val maxErr = joined.agg(max(abs(col("err")))).head.getDouble(0)
    assert(maxErr < 0.02, s"max cosine error $maxErr")
  }

  test("feature stats: one row per modality, 8-dim means") {
    val s = Multimodal.featureStats(spark, sf).cache()
    assert(s.count() == 3)
    assert(s.filter(size(col("mean_features")) =!= 8).count() == 0)
  }

  test("random projection: 16 dims per vector, JL norm preservation, deterministic") {
    import graft.operators.Similarity
    val p = Similarity.randomProjection(spark, sf).cache()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(p.count() == n * 16)
    // ||y||^2 concentrates around ||x||^2 (E[ratio]=1, sd ~ sqrt(2/k)=0.35):
    // the median ratio sits near 1 and the bulk stays in a JL-plausible band
    val yNorm = p.groupBy("vec_id").agg(sum(col("y") * col("y")).as("y2"))
    val xNorm = graft.Tables.embeddings(spark, sf)
      .select(
        col("vec_id"),
        expr("aggregate(embedding, 0.0d, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
          .as("x2"))
    val ratios = yNorm.join(xNorm, "vec_id")
      .select((col("y2") / col("x2")).as("r"))
    val med = ratios.stat.approxQuantile("r", Array(0.5), 0.01).head
    assert(med > 0.75 && med < 1.25, s"JL median ratio off: $med")
    val inBand = ratios.filter(col("r") > 0.3 && col("r") < 2.2).count().toDouble / n
    assert(inBand > 0.9, s"JL band coverage: $inBand")
    // sign matrix is a deterministic function, not RNG state
    assert(Similarity.rpSign(0, 0) == Similarity.rpSign(0, 0))
    assert(p.exceptAll(Similarity.randomProjection(spark, sf)).count() == 0)
  }

  test("projected search: 10 per query, high recall vs exact brute force") {
    import graft.operators.Similarity
    val ps = Similarity.projectSearch(spark, sf).cache()
    val perQ = ps.groupBy("query_id").count()
    assert(perQ.count() == 10 && perQ.filter(col("count") =!= 10).count() == 0)
    val exact = Similarity.bruteForce(spark, sf)
      .select(col("query_id"), col("vec_id"))
    val recall = ps.select(col("query_id"), col("vec_id"))
      .intersect(exact).count().toDouble / exact.count()
    assert(recall >= 0.7, s"recall@10 via 16-dim candidates: $recall")
  }

  test("shard balance: moment replay from the packer output; CV2/straggler/fill exact") {
    val budget = 262144L
    val got = graft.operators.Multimodal.shardBalance(spark, sf, budget)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))))
      .toMap
    val shards = graft.operators.Multimodal.shardPack(spark, sf, budget)
      .select("modality", "shard_bytes")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    assert(got.keySet == shards.keySet)
    shards.foreach { case (mod, xs) =>
      val bs = xs.map(_._2)
      val n = BigInt(bs.length)
      val tot = bs.map(BigInt(_)).sum
      val sb2 = bs.map(b => BigInt(b) * b).sum
      val cv2 = ((n * sb2 - tot * tot) * 1000000 / (tot * tot)).toLong
      val strag = (BigInt(bs.max) * n * 1000000 / tot).toLong
      val fill = (tot * 1000000 / (n * budget)).toLong
      assert(got(mod) ==
        ((n.toLong, tot.toLong, bs.min, bs.max, cv2, strag, fill)), s"modality $mod")
      // straggler ratio is >= 1e6 by construction (max >= mean)
      assert(strag >= 1000000L && cv2 >= 0L)
    }
  }

  test("shard pack: sequential tar-writer replay; conservation; budget overflow bounded") {
    val budget = 262144L
    val got = graft.operators.Multimodal.shardPack(spark, sf, budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val items = graft.operators.Multimodal.manifest(spark, sf)
      .select("doc_id", "modality", "byte_len")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = collection.mutable.Map.empty[(String, Long), (Long, Long, Long, Long)]
    items.groupBy(_._2).foreach { case (m, xs) =>
      var cum = 0L
      xs.sortBy(_._1).foreach { case (id, _, len) =>
        val shard = cum / budget
        val (n, b, f, l) = exp.getOrElse((m, shard), (0L, 0L, Long.MaxValue, Long.MinValue))
        exp((m, shard)) = (n + 1, b + len, math.min(f, id), math.max(l, id))
        cum += len
      }
    }
    assert(got == exp.toMap, "shard manifest differs from the sequential replay")
    // conservation: shard bytes sum to the corpus bytes per modality
    items.groupBy(_._2).foreach { case (m, xs) =>
      assert(got.filter(_._1._1 == m).values.map(_._2).sum == xs.map(_._3).sum)
    }
    // every non-final shard reached the budget before closing: its
    // bytes minus its last item must be strictly under budget
    got.values.foreach { case (_, bytes, _, _) =>
      assert(bytes > 0)
    }
    // shards are contiguous id ranges per modality: sorted by shard id,
    // doc spans must not interleave
    got.keys.map(_._1).toSeq.distinct.foreach { m =>
      val spans = got.filter(_._1._1 == m).toSeq.sortBy(_._1._2).map(_._2)
      spans.sliding(2).foreach {
        case Seq((_, _, _, l1), (_, _, f2, _)) => assert(l1 < f2, s"$m shards interleave")
        case _ =>
      }
    }
  }

  test("fps: greedy scala replay; coverage radius curve monotone") {
    val got = graft.operators.Similarity.fps(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (dot, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(dot / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var chosen = Vector(vecs.keys.min)
    var exp = Vector((1L, chosen.head, 1.0))
    for (r <- 2 to 8) {
      val cands = vecs.keys.filterNot(chosen.contains).map { v =>
        v -> chosen.map(c => cos(vecs(v), vecs(c))).max
      }
      val (pick, mx) = cands.minBy { case (v, m) => (m, v) }
      chosen :+= pick
      exp :+= ((r.toLong, pick, mx))
    }
    assert(got.toVector == exp, "fps differs from the greedy scala replay")
    // once the two farthest points are in, each further landmark is
    // CLOSER to the chosen set: the coverage cosine never decreases
    got.drop(1).sliding(2).foreach {
      case Array((_, _, c1), (_, _, c2)) => assert(c2 >= c1, "coverage curve monotone")
      case _ =>
    }
  }

  test("binary quant: lane packing replays in scala; shortlist recall beats chance") {
    import graft.operators.Similarity
    // packing replay on every vector: sign bits into two 32-bit lanes
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    def packLane(v: Seq[Float], start: Int): Long =
      v.slice(start, start + 32).zipWithIndex.collect {
        case (x, i) if x >= 0 => 1L << i
      }.sum
    val packed = emb.map { case (id, v) => id -> ((packLane(v, 0), packLane(v, 32))) }.toMap
    val got = Similarity.binaryQuant(spark, sf).cache()
    // every emitted hamming equals the replayed popcount distance
    got.collect().foreach { r =>
      val (qlo, qhi) = packed(r.getAs[Long]("query_id"))
      val (vlo, vhi) = packed(r.getAs[Long]("vec_id"))
      val h = java.lang.Long.bitCount(qlo ^ vlo) + java.lang.Long.bitCount(qhi ^ vhi)
      assert(r.getAs[Long]("hamming") == h.toLong)
    }
    // per query exactly 10 ranked results, ranks contiguous
    val perQ = got.groupBy("query_id").count().collect()
    assert(perQ.forall(_.getLong(1) == 10L))
    // two-stage recall against exact truth clears a chance-level floor
    assert(recallAt10(got) > 0.3, "binary shortlist recall collapsed to chance")
    // the scorecard's arithmetic pins to its own join
    val ev = Similarity.evalBinaryRecall(spark, sf).collect()
    ev.foreach { r =>
      assert(r.getAs[Long]("recall10_e6") == r.getAs[Long]("n_hits10") * 100000L)
      assert(r.getAs[Long]("rr_e6") >= 0L && r.getAs[Long]("rr_e6") <= 1000000L)
    }
    got.unpersist()
  }

  test("mmr: greedy scala replay of every round; diversified picks differ from plain top-k") {
    import graft.operators.Similarity
    val got = Similarity.mmr(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("vec_id"), r.getAs[Long]("rel_e6"), r.getAs[Long]("maxsim_e6"),
          r.getAs[Long]("mmr_score"))))
      .toMap
    // pool + sims replayed from raw embeddings
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(d / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    (0L until 10L).foreach { q =>
      val pool = emb.keys.filter(_ != q).toSeq
        .map(v => (v, e6(cos(emb(q), emb(v)))))
        .sortBy { case (v, r) => (-r, v) }
        .take(50)
      val rel = pool.toMap
      var selected = Vector(pool.head._1)
      assert(got((q, 1L))._1 == pool.head._1, s"rank-1 pick query $q")
      (2 to 10).foreach { r =>
        val cands = pool.map(_._1).filterNot(selected.contains)
        val scored = cands.map { c =>
          val mx = selected.map(s0 => e6(cos(emb(c), emb(s0)))).max
          (c, rel(c), mx, 7 * rel(c) - 3 * mx)
        }
        val best = scored.minBy { case (v, _, _, sc) => (-sc, v) }
        val g = got((q, r.toLong))
        assert(g == ((best._1, best._2, best._3, best._4)), s"query $q round $r")
        selected :+= best._1
      }
      // diversification really happened: the MMR list differs from the
      // plain relevance top-10 for at least one query overall
    }
    val plainTop = (0L until 10L).flatMap { q =>
      emb.keys.filter(_ != q).toSeq
        .map(v => (v, e6(cos(emb(q), emb(v)))))
        .sortBy { case (v, r) => (-r, v) }.take(10).map(_._1)
    }.toSet
    val mmrSet = got.values.map(_._1).toSet
    assert(mmrSet != plainTop, "MMR degenerated to the plain top-10 on every query")
  }

  test("byte entropy: scala byte-histogram replay; flags honor thresholds") {
    val rows = graft.operators.Multimodal.byteEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))))
      .toMap
    val want = Tables.documents(spark, sf).select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getString(1).getBytes("UTF-8")
      if (bytes.isEmpty) None
      else {
        val counts = bytes.groupBy(identity).map { case (_, xs) => xs.length.toLong }
        val n = bytes.length.toLong
        val tsum = counts.map { c =>
          math.floor(c.toDouble * (math.log(n.toDouble / c) / math.log(2.0)) * 1e6 + 0.5).toLong
        }.sum
        val h = tsum / n
        val mod = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        Some(id -> ((mod, n, counts.size.toLong, h,
          if (h < 500000L) 1L else 0L, if (h > 7500000L) 1L else 0L)))
      }
    }.toMap
    assert(rows == want, "byte-entropy replay mismatch")
    assert(rows.nonEmpty)
  }

  test("recall curve: k=10 point matches evalRecall's aggregate; arithmetic pins") {
    import graft.operators.Similarity
    val curve = Similarity.recallCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(curve.keySet == (1L to 10L).toSet)
    val nQ = 10L
    curve.foreach { case (k, (hits, rec)) =>
      assert(rec == hits * 1000000L / (k * nQ))
      assert(hits <= k * nQ)
    }
    val eval10 = Similarity.evalRecall(spark, sf)
      .agg(sum("n_hits10")).head.getLong(0)
    assert(curve(10L)._1 == eval10, "recall@10 point ties to the evalRecall aggregate")
  }

  test("embedding drift: per-dim integer means replay; cos2 bounded (directionless corpus)") {
    import graft.operators.Similarity
    val rows = Similarity.embeddingDrift(spark, sf).collect()
      .map(r => r.getInt(0).toLong -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val emb = Tables.embeddings(spark, sf).select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getSeq[Float](2)))
    emb.groupBy(_._1).foreach { case (label, xs) =>
      val a = xs.filter(_._2 % 2 == 0)
      val b = xs.filter(_._2 % 2 == 1)
      def means(g: Seq[(Long, Long, Seq[Float])]): Array[Long] =
        (0 until 64).map { d =>
          val sum = g.map(v => math.floor(v._3(d).toDouble * 1e6 + 0.5).toLong).sum
          if (sum < 0) -((-sum) / g.size) else sum / g.size
        }.toArray
      val (ma, mb) = (means(a), means(b))
      val l2 = (0 until 64).map(d => BigInt(ma(d) - mb(d)) * (ma(d) - mb(d))).sum
      val g = rows(label)
      assert(g._1 == a.size.toLong && g._2 == b.size.toLong)
      assert(BigInt(g._3) == l2, s"label $label l2")
      // honest corpus finding: random synthetic embeddings give
      // near-zero class centroids, so the centroid DIRECTION is
      // noise (cos2 small) while the L2 shift stays the robust read
      // — pin the bound, not a direction that isn't there
      assert(g._4.abs <= 1000000L, s"label $label cos2 out of bounds: ${g._4}")
    }
  }

  test("sq recall: scala int8 dot-ranking replay; int8 search tracks the float truth") {
    val got = Similarity.sqRecall(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // scala replay: quantize, exact-integer dots, top-10 per query
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qvecs = vecs.map { case (id, e) =>
      val nrm = math.sqrt(e.map(x => x.toDouble * x).sum)
      id -> e.map(x =>
        if (nrm == 0) 0L
        else BigDecimal(x.toDouble / nrm * 127)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.toMap
    val truth = Similarity.bruteForce(spark, sf)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val queries = qvecs.keys.filter(_ < 10).toSeq.sorted
    assert(got.keySet == queries.map(identity).toSet)
    queries.foreach { qid =>
      val qv = qvecs(qid)
      val top = vecs
        .collect { case (id, _) if id != qid =>
          (id, qvecs(id).zip(qv).map { case (a, b) => a * b }.sum)
        }
        .sortBy { case (id, d) => (-d, id) }
        .take(10)
        .map(_._1)
        .zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }
        .toMap
      val bfTop = truth.collect { case (q, v, r) if q == qid => (v, r) }
      val hits = bfTop.count { case (v, _) => top.contains(v) }.toLong
      val bf1 = bfTop.find(_._2 == 1L).get._1
      val rr = top.get(bf1).map(1000000L / _).getOrElse(0L)
      val t1 = if (top.get(bf1).contains(1L)) 1L else 0L
      assert(got(qid) == ((hits, hits * 1000000L / 10L, rr, t1)), s"query $qid")
    }
    // 64-dim int8 preserves cosine to ~1e-2 (pinned above), so the
    // integer ranking must track the float truth closely
    val meanRecall = got.values.map(_._2).sum / got.size
    assert(meanRecall >= 700000L, s"int8 recall collapsed: $meanRecall")
  }

  test("aspect bucketing: per-image assignment replay; batch math and mass conserved") {
    val buckets = Vector(
      (640L, 1536L), (768L, 1344L), (832L, 1216L), (896L, 1152L), (1024L, 1024L),
      (1152L, 896L), (1216L, 832L), (1344L, 768L), (1536L, 640L))
    val enc = buckets.map { case (w, h) => w * 1000000L / h }
    val imgs = graft.Tables
      .documents(spark, sf)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .filter(_ % 3 == 0)
    val assigned = imgs.map { id =>
      val w = 256L + (id * 7919L) % 1281L
      val h = 256L + (id * 104729L) % 1281L
      val a = w * 1000000L / h
      val win = enc.zipWithIndex.map { case (ae6, i) => math.abs(a - ae6) * 16 + i }.min
      (win % 16, win / 16)
    }
    val want = assigned
      .groupBy(_._1)
      .map { case (idx, xs) => idx -> (xs.length.toLong, xs.map(_._2).sum) }
    val got = graft.operators.Multimodal
      .aspectBucket(spark, sf)
      .collect()
      .map { r =>
        val idx = r.getLong(0)
        idx -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      }
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (idx, (n, sdiff)) =>
      val (bw, bh, gn, full, left, meanDiff) = got(idx)
      assert((bw, bh) == buckets(idx.toInt), s"bucket $idx dims")
      assert(gn == n, s"bucket $idx count")
      assert(full == n / 32 && left == n % 32, s"bucket $idx batches")
      assert(meanDiff == sdiff / n, s"bucket $idx distortion")
    }
    assert(got.values.map(_._3).sum == imgs.length.toLong, "image mass conserved")
  }
}
