package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  test("hash split: covers all docs, roughly 80/10/10, stable across runs") {
    val s = Sampling.splitAssign(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(s.count() == n)
    val frac = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95)
    assert(frac.getOrElse("val", 0.0) > 0.0 && frac.getOrElse("test", 0.0) > 0.0)
    val again = Sampling.splitAssign(spark, sf)
    assert(s.exceptAll(again).count() == 0)
  }

  test("stratified sample: non-en strata kept whole, en downsampled, deterministic") {
    val docs = Tables.documents(spark, sf)
    val s1 = Sampling.stratifiedSample(spark, sf).cache()
    val kept = s1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (l <- Seq("de", "fr", "es", "zh")) assert(kept(l) == total(l), s"stratum $l truncated")
    assert(kept("en") < total("en"))
    val s2 = Sampling.stratifiedSample(spark, sf)
    assert(s1.exceptAll(s2).count() == 0, "sampleBy with fixed seed must be deterministic")
  }

  test("hash sample: exactly k rows, stable, and plan is TakeOrdered not full sort") {
    val h = Sampling.hashSample(spark, sf, 50)
    assert(h.count() == 50)
    assert(h.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("sequence packing: contiguous per-shard offsets, windows consistent") {
    import org.apache.spark.sql.expressions.Window
    val p = Sampling.packSequences(spark, sf, ctxLen = 512).cache()
    assert(p.count() == Tables.documents(spark, sf).count())
    assert(p.filter(col("start_off") < 0 || col("seq_first") > col("seq_last")).count() == 0)
    // offsets tile each shard exactly: next start = previous start + n_tokens
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val gaps = p
      .withColumn("prev_end", lag(col("start_off") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("start_off") =!= col("prev_end"))
    assert(gaps.count() == 0, "packing left a gap or overlap")
    // boundary flag consistent with window ids
    assert(p.filter(
      (col("crosses_boundary") === 1) =!= (col("seq_first") =!= col("seq_last"))).count() == 0)
  }

  test("composite packing: tiles each (lang, source) shard, refines the lang shards") {
    import org.apache.spark.sql.expressions.Window
    val p = Sampling.packComposite(spark, sf, ctxLen = 512).cache()
    assert(p.count() == Tables.documents(spark, sf).count())
    val w = Window.partitionBy("lang", "source").orderBy("doc_id")
    val gaps = p
      .withColumn("prev_end", lag(col("start_off") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("start_off") =!= col("prev_end"))
    assert(gaps.count() == 0, "composite packing left a gap or overlap")
    // finer shards: strictly more shards than the lang-only packing,
    // and per-doc token counts identical between the two
    val nShards = p.select("lang", "source").distinct().count()
    val nLangs = p.select("lang").distinct().count()
    assert(nShards > nLangs)
    val coarse = Sampling.packSequences(spark, sf, ctxLen = 512)
      .select("doc_id", "n_tokens")
    assert(p.select("doc_id", "n_tokens").exceptAll(coarse).count() == 0)
  }

  test("source cap: at most k per source, deterministic, pre-shuffle group limit") {
    val cap = 5
    val c = Sampling.sourceCap(spark, sf, cap).cache()
    val over = c.groupBy("source").count().filter(col("count") > cap)
    assert(over.count() == 0)
    assert(c.filter(col("rank_in_source") < 1 || col("rank_in_source") > cap).count() == 0)
    // every source with >= cap docs contributes exactly cap
    val full = Tables.documents(spark, sf).groupBy("source").count()
      .filter(col("count") >= cap).count()
    assert(c.groupBy("source").count().filter(col("count") === cap).count() == full)
    assert(c.exceptAll(Sampling.sourceCap(spark, sf, cap)).count() == 0)
    // the rank filter must become a WindowGroupLimit (map-side top-k)
    assert(c.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("negative sampling: k deterministic negatives per anchor, never the anchor itself") {
    val k = 4
    val s = Sampling.negSample(spark, sf, k).cache()
    val anchors = Tables.documents(spark, sf).filter(col("doc_id") % 11 === 0).count()
    // every anchor drew negatives (self-collisions may drop at most a few)
    val perAnchor = s.groupBy("anchor_id").count()
    assert(perAnchor.count() == anchors)
    assert(perAnchor.filter(col("count") > k).count() == 0)
    assert(s.filter(col("neg_id") === col("anchor_id")).count() == 0)
    // negatives are real docs (distinct: the same negative may serve many anchors)
    val docs = Tables.documents(spark, sf).select(col("doc_id").as("neg_id"))
    assert(s.select("neg_id").distinct().exceptAll(docs).count() == 0)
    assert(s.exceptAll(Sampling.negSample(spark, sf, k)).count() == 0, "not deterministic")
  }

  test("mixture weights: normalized, temperature upweights small sources") {
    val m = Sampling.mixtureWeights(spark, sf, alpha = 0.7).cache()
    val total = m.agg(sum("weight")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-3, s"weights sum to $total")
    // alpha < 1 compresses the range: weight ratio < token ratio for
    // the extreme sources
    val rows = m.orderBy(col("n_tokens")).collect()
    val (lo, hi) = (rows.head, rows.last)
    val tokRatio = hi.getAs[Long]("n_tokens").toDouble / lo.getAs[Long]("n_tokens")
    val wRatio = hi.getAs[Double]("weight") / lo.getAs[Double]("weight")
    assert(wRatio <= tokRatio + 1e-9, "temperature failed to compress the mix")
  }

  test("shuffle order: a dense per-shard permutation, balanced, decorrelated from doc_id") {
    import graft.operators.Sampling
    val s = Sampling.shuffleOrder(spark, sf).cache()
    val n = graft.Tables.documents(spark, sf).count()
    assert(s.count() == n)
    assert(s.select("doc_id").distinct().count() == n)
    // positions are dense 0..count-1 inside every shard
    val bad = s.groupBy("shard")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("c") - 1 || col("mn") =!= 0)
    assert(bad.count() == 0)
    // hash-balanced shards: each within 2x of the mean
    val sizes = s.groupBy("shard").count().select("count").collect().map(_.getLong(0))
    assert(sizes.length == 8 && sizes.min > n / 16 && sizes.max < n / 4)
    // pseudo-random order: within a shard, the fraction of adjacent
    // positions whose doc_ids ascend should hover near 1/2 — a sorted
    // or id-correlated order would push it toward 0 or 1
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("pos")
    val asc = s.withColumn("nxt", lead("doc_id", 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(avg((col("nxt") > col("doc_id")).cast("double")).as("p"))
      .head().getDouble(0)
    assert(asc > 0.35 && asc < 0.65, s"order correlated with doc_id: $asc")
  }

  test("pps sample: picks telescope to exactly k, weight-biased, deterministic") {
    val s = Sampling.ppsSample(spark, sf, k = 100).cache()
    // systematic PPS invariant: total multiplicity is exactly k
    assert(s.agg(sum("n_picks")).head.getLong(0) == 100)
    // a doc lighter than the stride can be hit at most once
    val total = Tables.documents(spark, sf).agg(sum("n_chars")).head.getLong(0)
    val stride = total / 100
    assert(s.filter(col("w") < stride && col("n_picks") > 1).count() == 0)
    // inclusion prob proportional to size: the sample's mean weight
    // must exceed the corpus mean by a clear margin
    val meanAll = Tables.documents(spark, sf).agg(avg("n_chars")).head.getDouble(0)
    val meanSamp = s.agg(avg("w")).head.getDouble(0)
    assert(meanSamp > meanAll, s"sample mean $meanSamp not above corpus mean $meanAll")
    val again = Sampling.ppsSample(spark, sf, k = 100)
    assert(s.exceptAll(again).count() == 0)
  }

  test("token budget: quotas telescope exactly to the budget, off-by-at-most-one from proportional") {
    import graft.operators.Sampling
    val budget = 1000000L
    val q = Sampling.tokenBudget(spark, sf, budget).cache()
    // Hamilton's method: the leftover seats make the total EXACT
    assert(q.agg(sum("quota")).head.getLong(0) == budget)
    // each quota is base or base+1, and base = floor-proportional
    assert(q.filter(col("quota") < col("base") || col("quota") > col("base") + 1).count() == 0)
    val total = q.agg(sum("n_tokens")).head.getLong(0)
    assert(q.filter(col("base") =!= expr(s"(n_tokens * $budget) div $total")).count() == 0)
    // deterministic
    val again = Sampling.tokenBudget(spark, sf, budget)
    assert(q.exceptAll(again).count() == 0)
  }

  test("epoch shuffle: epoch 0 equals the single-epoch order, epochs decorrelated") {
    val m = Sampling.multiEpochShuffle(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(m.count() == n * 3)
    // epoch 0 is bit-identical to the #95 single-epoch schedule
    val e0 = m.filter(col("epoch") === 0L).select("doc_id", "shard", "pos")
    val single = Sampling.shuffleOrder(spark, sf)
    assert(e0.exceptAll(single).count() == 0 && single.exceptAll(e0).count() == 0)
    // positions dense per (epoch, shard)
    val bad = m.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("c") - 1 || col("mn") =!= 0L)
    assert(bad.count() == 0)
    // decorrelation: same-shard repeat rate across consecutive epochs ~ 1/8
    val rep = m.filter(col("epoch") === 0L).select(col("doc_id"), col("shard").as("s0"))
      .join(m.filter(col("epoch") === 1L).select(col("doc_id"), col("shard").as("s1")), "doc_id")
      .filter(col("s0") === col("s1")).count().toDouble / n
    assert(rep > 0.05 && rep < 0.25, s"same-shard repeat rate $rep")
    val again = Sampling.multiEpochShuffle(spark, sf)
    assert(m.exceptAll(again).count() == 0)
  }

  test("length batching: tiles the corpus, full batches except tails, waste bounded by the band") {
    val b = Sampling.lengthBatching(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(b.agg(sum("n_docs")).head.getLong(0) == n)
    assert(b.filter(col("n_docs") > 8 || col("n_docs") < 1).count() == 0)
    // only the last batch of a bucket may be partial
    val lastIdx = b.groupBy("bucket_id").agg(max("batch_idx").as("last"))
    assert(b.join(lastIdx, "bucket_id")
      .filter(col("batch_idx") < col("last") && col("n_docs") =!= 8).count() == 0)
    // bucketing is honored: max_len inside the bucket's 16-token band
    assert(b.filter(col("max_len") > col("bucket_id") * 16 ||
      col("max_len") <= (col("bucket_id") - 1) * 16).count() == 0)
    // THE point of the technique: within-batch padding is bounded by the
    // band width (waste <= n_docs * 15), vs unbounded for random batching
    assert(b.filter(col("waste") > col("n_docs") * 15).count() == 0)
    assert(b.filter(col("waste") =!= col("n_docs") * col("max_len") - col("sum_len")).count() == 0)
    val again = Sampling.lengthBatching(spark, sf)
    assert(b.exceptAll(again).count() == 0)
  }

  test("quota fill: every quota met minimally in the deterministic order, never starved") {
    val f = Sampling.quotaFill(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    val nTotal = docs.agg(sum(size(split(lower(trim(col("text"))), "\\s+")))).head.getLong(0)
    val quotas = Sampling.tokenBudget(spark, sf, nTotal / 4)
      .select(col("source"), col("quota"))
    // every source with a positive quota is served
    assert(f.select("source").distinct().count() ==
      quotas.filter(col("quota") > 0).count())
    // quota met: the selected tokens reach the quota...
    val per = f.groupBy("source").agg(sum("n_tok").as("got"), max("quota").as("q"),
      max(col("cum") - col("n_tok")).as("last_start"))
    assert(per.filter(col("got") < col("q")).count() == 0)
    // ...minimally: dropping the last (highest-cum) pick would starve it
    assert(per.filter(col("last_start") >= col("q")).count() == 0)
    // selection takes roughly a quarter of the corpus tokens
    val got = f.agg(sum("n_tok")).head.getLong(0).toDouble
    assert(got / nTotal > 0.2 && got / nTotal < 0.4, s"selected fraction ${got / nTotal}")
    // deterministic
    val again = Sampling.quotaFill(spark, sf)
    assert(f.exceptAll(again).count() == 0)
  }

  test("priority sample: k per source, DLT estimator unbiased-ish, tau is the threshold") {
    val k = 16
    val s = Sampling.prioritySample(spark, sf, k).cache()
    val docs = Tables.documents(spark, sf).cache()
    // exactly min(k, n_source) rows per source (every source has >= 25 docs)
    val perSource = s.groupBy("source").count()
    assert(perSource.filter(col("count") =!= k).count() == 0)
    assert(perSource.count() == docs.select("source").distinct().count())
    // every included priority beats tau, and the estimator is max(w<<20, tau)
    assert(s.filter(col("prio") <= col("tau")).count() == 0)
    assert(s.filter(col("est_scaled") =!= greatest(col("w") * (1L << 20), col("tau"))).count() == 0)
    // the DLT subset-sum estimate tracks the true per-source token mass:
    // unbiased by construction, so with k=16 every source lands well
    // within a 3x band (empirically ~1.25x worst-case here)
    val est = s.groupBy("source").agg((sum("est_scaled") / (1L << 20)).as("est"))
    val truth = docs.groupBy("source").agg(sum("n_chars").as("tot"))
    val bad = est.join(truth, "source")
      .filter(col("est") > col("tot") * 3 || col("est") < col("tot") / 3)
    assert(bad.count() == 0, bad.collect().mkString(","))
    // and the POOLED estimate (20 independent groups) is tight
    val pooled = est.agg(sum("est")).head.getDouble(0)
    val total = docs.agg(sum("n_chars")).head.getLong(0).toDouble
    assert(math.abs(pooled - total) / total < 0.25, s"pooled $pooled vs $total")
    val again = Sampling.prioritySample(spark, sf, k)
    assert(s.exceptAll(again).count() == 0)
    docs.unpersist()
  }

  test("source diversity: one row, exact Simpson, Shannon bounded by log2(S)") {
    val d = Sampling.sourceDiversity(spark, sf).cache()
    assert(d.count() == 1)
    val row = d.head
    val docs = Tables.documents(spark, sf)
    assert(row.getLong(0) == docs.count())
    assert(row.getLong(1) == docs.select("source").distinct().count())
    // exact integer replication of Simpson
    val counts = docs.groupBy("source").count().collect().map(_.getLong(1))
    val n = counts.sum
    val expectedSimpson = counts.map(c => c * (c - 1)).sum * 1000000L / (n * (n - 1))
    assert(row.getLong(2) == expectedSimpson)
    // entropy bounds: 0 <= H <= log2(S) (+ quantization slack)
    val h = row.getDouble(3)
    assert(h >= 0.0 && h <= math.log(row.getLong(1).toDouble) / math.log(2.0) + 1e-4)
    val again = Sampling.sourceDiversity(spark, sf)
    assert(d.exceptAll(again).count() == 0)
  }

  test("neyman allocation: exact isqrt, Hamilton quotas within 1, budget exactly spent") {
    val a = graft.operators.Sampling.neymanAlloc(spark, sf).cache()
    val got = a.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.map(_._4).sum == 1000L, "allocation must spend the budget exactly")
    got.foreach { case (_, _, _, allocN, nSampled, _) => assert(nSampled == allocN) }
    // integer sqrt exactness + quota bound, replayed with BigInt moments
    val pop = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
      .groupBy(_._1).map { case (st, xs) =>
        val ys = xs.map(_._2); val n = BigInt(ys.length)
        val varC2 = (n * ys.map(y => y * y).sum - ys.sum * ys.sum) / (n * n)
        st -> (ys.length.toLong, varC2)
      }
    val sExp = pop.map { case (st, (n, v)) =>
      var s = BigInt(math.sqrt(v.toDouble).toLong)
      while (s * s > v) s -= 1
      while ((s + 1) * (s + 1) <= v) s += 1
      st -> (n, s.toLong)
    }
    got.foreach { case (st, nPop, sCents, _, _, _) =>
      val (n, s) = sExp(st)
      assert(nPop == n && sCents == s, s"stratum $st isqrt/n mismatch")
    }
    val wTot = sExp.values.map { case (n, s) => BigInt(n) * BigInt(s) }.sum
    got.foreach { case (st, _, _, allocN, _, _) =>
      val (n, s) = sExp(st)
      val quota = BigDecimal(BigInt(1000) * BigInt(n) * BigInt(s)) / BigDecimal(wTot)
      assert((BigDecimal(allocN) - quota).abs < 1,
        s"stratum $st allocation $allocN strays >=1 from quota $quota")
    }
    val again = graft.operators.Sampling.neymanAlloc(spark, sf)
    assert(a.exceptAll(again).count() == 0)
    a.unpersist()
  }

  test("systematic sample: exactly stride-spaced through the permutation; size = ceil(n/stride)") {
    val got = Sampling.systematicSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val n = Tables.documents(spark, sf).count()
    val stride = math.max(1L, n / 200)
    assert(got.forall(_._3 == stride))
    val idxs = got.map(_._2).sorted
    assert(idxs.forall(_ % stride == 0))
    // evenly spaced: consecutive picks are exactly one stride apart
    assert(idxs.zip(idxs.tail).forall { case (a, b) => b - a == stride })
    assert(idxs.head == 0L && idxs.length == ((n + stride - 1) / stride))
    // a true sample of the corpus: distinct docs, all present
    assert(got.map(_._1).distinct.length == got.length)
    // reproducible: same layout, same picks
    val again = Sampling.systematicSample(spark, sf).collect().map(_.getLong(0)).sorted
    assert(again.toSeq == got.map(_._1).sorted.toSeq)
  }

  test("split balance: pairwise KS replay on the integer grid") {
    val rows = Sampling.splitBalance(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Sampling.splitAssign(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "n_chars"), "doc_id")
      .selectExpr("split", "CAST(n_chars AS LONG) AS len")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    Seq(("train", "val"), ("train", "test"), ("val", "test")).foreach { case (a, b) =>
      val la = docs.filter(_._1 == a).map(_._2)
      val lb = docs.filter(_._1 == b).map(_._2)
      val lens = (la ++ lb).distinct.sorted
      val (na, nb) = (la.size.toLong, lb.size.toLong)
      val dMax = lens.map { t =>
        val ca = la.count(_ <= t).toLong
        val cb = lb.count(_ <= t).toLong
        (BigInt(ca) * nb - BigInt(cb) * na).abs
      }.max
      val g = rows(s"$a|$b")
      assert(g._1 == na && g._2 == nb)
      assert(BigInt(g._3) == dMax * 1000000 / (BigInt(na) * nb), s"pair $a|$b")
    }
    assert(rows.size == 3)
  }

  test("alpha mixture: quantized pow-ratio replay; alpha=1 mirrors corpus; flattening monotone") {
    val got = Sampling.alphaMixture(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val toks = Tables.documents(spark, sf)
      .selectExpr("source",
        "size(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')) AS nt")
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).sum }
    val nMax = toks.values.max
    Sampling.AlphaPointsE1.foreach { a =>
      val rs = toks.map { case (s, n) =>
        s -> math.floor(math.pow(n.toDouble / nMax, a / 10.0) * 1e6 + 0.5).toLong
      }
      val sumR = rs.values.sum
      val sumR2 = rs.values.map(r => BigInt(r) * r).sum
      val eff = (BigInt(sumR) * sumR * 1000000 / sumR2).toLong
      toks.keys.foreach { s =>
        val (nt, rE6, wE6, effG) = got((a.toLong, s))
        assert(nt == toks(s) && rE6 == rs(s), s"alpha $a source $s")
        assert(wE6 == (BigInt(rs(s)) * 1000000 / sumR).toLong)
        assert(effG == eff)
      }
    }
    // the flattening contract: effective source count non-increasing in alpha
    val effByAlpha = Sampling.AlphaPointsE1.map(a => got((a.toLong, toks.keys.head))._4)
    effByAlpha.zip(effByAlpha.drop(1)).foreach { case (lo, hi) => assert(lo >= hi) }
    // alpha = 1 mirrors the raw token shares (up to the r-grid quantization)
    val w1 = got((10L, toks.keys.head))._3
    val exact = (BigInt(toks(toks.keys.head)) * 1000000 /
      BigInt(toks.values.sum)).toLong
    assert(math.abs(w1 - exact) <= 25, s"alpha=1 weight $w1 vs corpus share $exact")
  }

  test("universe sample: join of samples == sample of join; zero orphans; exact scaling") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def kept(k: Long): Boolean = h60(s"universe:$k") % 1000 < 125
    val cust = Tables
      .customer(spark, sf)
      .select("c_custkey", "c_mktsegment")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val orders = Tables
      .orders(spark, sf)
      .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // sample-of-join: filter the JOINED rows by the customer hash —
    // must equal the join of independently filtered sides
    val joinedSample = orders.filter { case (ck, _) => kept(ck) }
    val sampledCust = cust.keySet.filter(kept)
    val joinOfSamples = orders.filter { case (ck, _) => sampledCust.contains(ck) }
    assert(joinedSample.toSeq.sorted == joinOfSamples.toSeq.sorted,
      "universe property: join of samples must equal sample of join")
    val bySeg = joinedSample
      .groupBy { case (ck, _) => cust(ck) }
      .map { case (seg, xs) =>
        seg -> (xs.map(_._1).distinct.length.toLong, xs.length.toLong, xs.map(_._2).sum)
      }
    val truth = orders
      .groupBy { case (ck, _) => cust(ck) }
      .map { case (seg, xs) => seg -> xs.map(_._2).sum }
    val got = Sampling
      .universeSample(spark, sf)
      .collect()
      .map(r =>
        r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getLong(7)))
      .toMap
    assert(got.keySet == bySeg.keySet)
    bySeg.foreach { case (seg, (nc, no, rev)) =>
      val (gnc, gno, grev, gest, gtrue, gerr, orphans) = got(seg)
      assert((gnc, gno, grev) == ((nc, no, rev)), seg)
      assert(gest == rev * 1000 / 125, seg)
      assert(gtrue == truth(seg), seg)
      assert(gerr == math.abs(rev * 1000 / 125 - truth(seg)) * 1000000 / truth(seg), seg)
      assert(orphans == 0L, "sampled orders must never orphan")
    }
  }
}
