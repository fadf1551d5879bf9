package graft

import org.apache.spark.sql.functions._

import graft.operators.TextStats

class TextStatsSpec extends SparkSpec {

  test("top terms: ranks contiguous 1..k, doc_freq non-increasing") {
    val t = TextStats.topTerms(spark, sf).orderBy("rank").collect()
    assert(t.map(_.getLong(2)).toSeq == (1L to t.length))
    val freqs = t.map(_.getLong(1))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
  }

  test("tfidf: <=3 terms per doc, scores positive unless term in every doc") {
    val x = TextStats.tfidf(spark, sf).cache()
    assert(x.groupBy("doc_id").count().filter("count > 3").count() == 0)
    assert(x.filter(col("tfidf") < 0).count() == 0)
  }

  test("bigram count total is bounded by token count minus docs") {
    val b = TextStats.topBigrams(spark, sf, k = 1000000).agg(sum("n")).head.getLong(0)
    val tokens = TextStats.topTerms(spark, sf, k = 1) // touch
    val nTok = graft.operators.TextOps.tokenCounts(spark, sf)
      .agg(sum("n_ws_tokens")).head.getLong(0)
    val nDocs = Tables.documents(spark, sf).count()
    assert(b == nTok - nDocs)
  }

  test("fuzzy verify: planted truncation dups score high similarity") {
    val f = TextStats.fuzzyVerify(spark, sf).cache()
    assert(f.count() > 0)
    assert(f.filter(col("edit_sim") < 0.5).count() == 0)
    assert(f.filter(col("edit_dist") < 0).count() == 0)
  }

  test("repetition: one row per doc, fractions in [0,1], flag honors thresholds") {
    val r = graft.operators.TextOps.repetition(spark, sf).cache()
    assert(r.count() == Tables.documents(spark, sf).count())
    assert(r.filter(col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1).count() == 0)
    assert(r.filter(col("top_token_ratio") <= 0 || col("top_token_ratio") > 1).count() == 0)
    // flag agrees with the (rounded) reported stats away from the boundary
    val bad = r.filter(
      (col("is_repetitive") === 1 && col("dup_trigram_frac") < 0.19 && col("top_token_ratio") < 0.19) ||
        (col("is_repetitive") === 0 && (col("dup_trigram_frac") > 0.21 || col("top_token_ratio") > 0.21)))
    assert(bad.count() == 0)
  }

  test("contamination: benchmark docs fully contaminated, rest bounded") {
    val c = graft.operators.TextOps.contamination(spark, sf).cache()
    assert(c.count() == Tables.documents(spark, sf).count())
    // a benchmark doc overlaps itself completely
    val bench = c.filter(col("is_benchmark") === 1)
    assert(bench.count() > 0)
    assert(bench.filter(col("contamination_frac") < 1.0 || col("is_contaminated") =!= 1).count() == 0)
    assert(c.filter(col("n_contaminated") > col("n_shingles")).count() == 0)
  }

  test("unigram log-prob: per-doc scores finite and ordered by token rarity") {
    val u = graft.operators.TextOps.unigramLogProb(spark, sf).cache()
    assert(u.count() == Tables.documents(spark, sf).count())
    // surprisal is -log2 of an empirical probability: strictly positive, finite
    assert(u.filter(col("avg_surprisal") <= 0 || col("avg_surprisal").isNull).count() == 0)
    // a doc's score is bounded by the rarest possible token: p >= 1/N
    val n = u.agg(sum("n_tokens")).head.getLong(0).toDouble
    val maxPossible = math.log(n) / math.log(2)
    assert(u.filter(col("avg_surprisal") > maxPossible + 1e-6).count() == 0)
    assert(u.filter(
      (col("is_tail") === 1) =!= (col("avg_surprisal") > 8.0)).count() == 0)
  }

  test("filter pipeline: verdicts consistent with the component signals, every rule fires") {
    import graft.operators.TextOps
    val f = TextOps.filterPipeline(spark, sf).cache()
    val n = graft.Tables.documents(spark, sf).count()
    assert(f.count() == n)
    // keep <=> reason = 'keep', and the reason always names a failing rule
    assert(f.filter((col("keep") === 1) =!= (col("reason") === "keep")).count() == 0)
    assert(f.filter(col("reason") === "benchmark").filter(col("is_benchmark") =!= 1).count() == 0)
    assert(f.filter(col("reason") === "repetitive").filter(col("is_repetitive") =!= 1).count() == 0)
    assert(f.filter(col("reason") === "too_short").filter(col("n_tokens") >= 15).count() == 0)
    assert(
      f.filter(col("reason") === "low_quality").filter(col("quality_score") >= 0.2).count() == 0)
    // the synthetic corpus exercises the rules and still keeps a majority
    // (repetitive docs exist but are all also short/low-quality, so the
    // flag fires while the higher-precedence reason wins)
    val reasons = f.select("reason").distinct().collect().map(_.getString(0)).toSet
    assert(
      Set("keep", "benchmark", "contaminated", "too_short", "low_quality", "lang_unknown")
        .subsetOf(reasons),
      s"missing reasons: $reasons")
    assert(f.filter(col("is_repetitive") === 1).count() > 0)
    assert(f.filter(col("keep") === 1).count() > n / 2)
  }

  test("pii redaction: planted PII is counted and fully scrubbed") {
    val p = graft.operators.TextOps.piiRedact(spark, sf).cache()
    assert(p.count() == Tables.documents(spark, sf).count())
    // the plant schedule must be detected
    assert(p.filter(col("doc_id") % 3 === 0 && col("n_emails") < 1).count() == 0)
    assert(p.filter(col("doc_id") % 5 === 0 && col("n_ips") < 1).count() == 0)
    assert(p.filter(col("doc_id") % 7 === 0 && col("n_phones") < 1).count() == 0)
    // nothing PII-shaped survives redaction
    assert(p.filter(col("redacted").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")).count() == 0)
    assert(p.filter(col("redacted").rlike("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}")).count() == 0)
    assert(p.filter(col("redacted").rlike("\\+\\d{2}-\\d{3}-\\d{4}")).count() == 0)
    // flag consistent with counts
    assert(p.filter(
      (col("has_pii") === 1) =!= (col("n_emails") + col("n_ips") + col("n_phones") > 0)).count() == 0)
  }

  test("boilerplate: df-threshold blocks removed everywhere, clean docs untouched") {
    val b = graft.operators.TextOps.boilerplate(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(b.count() == docs.count())
    // the corpus carries natural boilerplate (blocks in >=3 docs)
    assert(b.agg(sum("n_boiler")).head.getLong(0) > 0)
    // a doc with no boilerplate keeps its full normalized text
    val norm = docs.select(
      col("doc_id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
    val untouched = b.filter(col("n_boiler") === 0).join(norm, "doc_id")
    assert(untouched.filter(col("cleaned_text") =!= col("norm")).count() == 0)
    // boiler counts never exceed block counts
    assert(b.filter(col("n_boiler") > col("n_blocks")).count() == 0)
  }

  test("kl drift: margins cover the corpus, KL non-negative up to quantization") {
    val d = TextStats.klDrift(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(d.count() == docs.select("source").distinct().count())
    // per-source token counts partition the corpus token count
    val totalTokens = d.agg(sum("n_tokens")).head.getLong(0)
    val expected = docs.select(
      explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))).count()
    assert(totalTokens == expected)
    // Gibbs inequality: true KL >= 0; e6 quantization can dip at most
    // 5e-7 per term, so a small negative floor bounds the error
    val minKl = d.agg(min("kl_bits")).head.getDouble(0)
    assert(minKl >= -0.001, s"KL below quantization floor: $minKl")
  }

  test("kmv overlap: estimators inside their error bounds, sketch never lies about containment") {
    import graft.operators.TextStats
    val r = TextStats.kmvOverlap(spark, sf).head()
    val (estA, exactA) = (r.getAs[Long]("est_distinct_a"), r.getAs[Long]("exact_distinct_a"))
    val (estB, exactB) = (r.getAs[Long]("est_distinct_b"), r.getAs[Long]("exact_distinct_b"))
    // KMV relative error ~ 1/sqrt(k-2) (k=64 -> ~12.7%); assert 3 sigma
    assert(math.abs(estA - exactA).toDouble / exactA < 0.4, s"est_a $estA vs $exactA")
    assert(math.abs(estB - exactB).toDouble / exactB < 0.4, s"est_b $estB vs $exactB")
    // Jaccard estimate within 3*sqrt(0.25/k) + quantization of exact
    val (jEst, jExact) = (r.getAs[Long]("jaccard_est_bp"), r.getAs[Long]("jaccard_exact_bp"))
    assert(math.abs(jEst - jExact) <= 2000, s"jaccard est $jEst vs exact $jExact bp")
    // structural sanity: theta ordering and rho bounded by k
    assert(r.getAs[Long]("rho") <= r.getAs[Long]("k"))
    assert(r.getAs[Long]("exact_overlap") >= 0)
  }

  test("curriculum: balanced quality-monotone deciles, dense shuffled positions inside each") {
    import graft.operators.TextOps
    val c = TextOps.curriculum(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(c.count() == n)
    // deciles are balanced to within 1
    val sizes = c.groupBy("decile").count().collect().map(_.getLong(1))
    assert(sizes.length == 10 && sizes.max - sizes.min <= 1, sizes.mkString(","))
    // quality is monotone ACROSS deciles (ties may touch boundaries)
    val bounds = c.groupBy("decile")
      .agg(min("q_e4").as("lo"), max("q_e4").as("hi"))
      .orderBy("decile").collect()
    bounds.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("hi") <= w(1).getAs[Long]("lo"),
        s"decile ${w(0).getLong(0)} overlaps ${w(1).getLong(0)}")
    }
    // positions are dense 1..m within every (decile, shard)
    val bad = c.groupBy("decile", "shard")
      .agg(count(lit(1)).as("m"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("m") || col("mn") =!= 1L)
    assert(bad.count() == 0)
    // deterministic
    val again = TextOps.curriculum(spark, sf)
    assert(c.exceptAll(again).count() == 0)
  }

  test("chunking: stride starts, full coverage, bounded windows, exact reconstruction") {
    val win = 32; val stride = 24
    val c = graft.operators.TextOps.chunkDocs(spark, sf, win, stride).cache()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("n"))
    // chunk count per doc = floor((n-1)/stride)+1; starts are dense stride multiples
    val per = c.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max(col("start_tok") + col("n_tok")).as("covered"),
        max("n_tok").as("mx"))
      .join(docs, "doc_id")
    assert(per.filter(col("k") =!= expr(s"(n - 1) div $stride + 1")).count() == 0)
    // the windows jointly cover every token, and none exceeds win
    assert(per.filter(col("covered") =!= col("n")).count() == 0)
    assert(per.filter(col("mx") > win).count() == 0)
    assert(c.filter(col("start_tok") =!= col("chunk_idx") * stride).count() == 0)
    // non-final chunks are longer than the stride (else a token gap)
    val finalIdx = c.groupBy("doc_id").agg(max("chunk_idx").as("last"))
    assert(c.join(finalIdx, "doc_id")
      .filter(col("chunk_idx") < col("last") && col("n_tok") <= stride).count() == 0)
    // chunk text round-trips: token count of the chunk string == n_tok
    assert(c.filter(col("n_tok") > 0 &&
      size(split(col("chunk"), " ")) =!= col("n_tok")).count() == 0)
    // exact reconstruction of one multi-chunk doc from stride prefixes
    val pick = c.filter(col("chunk_idx") >= 2).select("doc_id").head.getLong(0)
    val parts = c.filter(col("doc_id") === pick).orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(4)))
    val rebuilt = parts.map { case (i, s) =>
      val t = s.split(" "); if (i == parts.last._1) t else t.take(stride)
    }.flatten.mkString(" ")
    val orig = Tables.documents(spark, sf).filter(col("doc_id") === pick)
      .select(lower(trim(col("text")))).head.getString(0).split("\\s+").mkString(" ")
    assert(rebuilt == orig)
  }

  test("collocations: dense top-25 by integer Dice, scores consistent and bounded") {
    val c = graft.operators.TextStats.collocations(spark, sf).cache()
    val rows = c.orderBy("rank").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    assert(rows.length == 25)
    // dice non-increasing down the ranking
    val d = rows.map(_.getLong(6))
    assert(d.zip(d.tail).forall { case (x, y) => x >= y })
    // score formula holds and is bounded: 2ab <= a+b => dice_e6 <= 1e6
    assert(c.filter(col("dice_e6") =!= expr("(2 * c_ab * 1000000) div (c_a + c_b)")).count() == 0)
    assert(c.filter(col("dice_e6") > 1000000L).count() == 0)
    // a bigram can't outnumber either of its unigrams; min count respected
    assert(c.filter(col("c_ab") > col("c_a") || col("c_ab") > col("c_b")).count() == 0)
    assert(c.filter(col("c_ab") < 5).count() == 0)
    val again = graft.operators.TextStats.collocations(spark, sf)
    assert(c.exceptAll(again).count() == 0)
  }

  test("novelty: ratios bounded, recomputed exactly from collected shingle sets") {
    val n = graft.operators.TextStats.novelty(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(n.count() == docs.count())
    assert(n.filter(col("novelty_e6") < 0 || col("novelty_e6") > 1000000L).count() == 0)
    assert(n.filter(col("n_unique") > col("n_shingles")).count() == 0)
    assert(n.filter(col("novelty_e6") =!= expr("(n_unique * 1000000) div n_shingles")).count() == 0)
    // brute force over collected shingle sets
    val t = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    val sh3 = when(size(t) < 3, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", slice(t, i, lit(3)))))
    val sets = docs.select(col("doc_id"), array_distinct(sh3).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val dfCount = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    sets.foreach(_._2.foreach(s => dfCount(s) += 1))
    val expected = sets.map { case (id, sh) =>
      (id, sh.size.toLong, sh.count(dfCount(_) == 1).toLong)
    }.toSet
    val got = n.select("doc_id", "n_shingles", "n_unique")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    val again = graft.operators.TextStats.novelty(spark, sf)
    assert(n.exceptAll(again).count() == 0)
  }

  test("sparse sim: basket-explode pairs equal the self-join construction, cosine bounded") {
    val s = graft.operators.TextStats.sparseSim(spark, sf).cache()
    assert(s.count() == 50)
    assert(s.filter(col("cosine") <= 0 || col("cosine") > 1).count() == 0)
    assert(s.filter(col("n_shared") < 1).count() == 0)
    // independent construction: shingle self-join instead of
    // posting-list explode — same pruned vocab, same arithmetic
    val t = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    val sh3 = when(size(t) < 3, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", slice(t, i, lit(3)))))
    val tf = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(sh3).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val kept = tf.join(
      tf.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100).select("term"), "term")
    val a = kept.select(col("term"), col("doc_id").as("doc_a"), col("tf").as("tfa"))
    val b = kept.select(col("term"), col("doc_id").as("doc_b"), col("tf").as("tfb"))
    val dots = a.join(b, "term").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("tfa") * col("tfb")).as("dot2"), count(lit(1)).as("ns2"))
    val joined = s.join(dots, Seq("doc_a", "doc_b"), "left")
    assert(joined.filter(col("dot") =!= col("dot2") || col("n_shared") =!= col("ns2")).count() == 0)
    val again = graft.operators.TextStats.sparseSim(spark, sf)
    assert(s.exceptAll(again).count() == 0)
  }

  test("top-p select: covers >= 90% of token mass minimally, per source") {
    val s = graft.operators.TextOps.topPSelect(spark, sf).cache()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(s.count() == nSources)
    // coverage: selected mass reaches the ceil(0.9 W) threshold
    assert(s.filter(col("tok_sel") * 10 < col("tok_total") * 9).count() == 0)
    assert(s.filter(col("n_sel") > col("n_docs") || col("tok_sel") > col("tok_total")).count() == 0)
    // brute-force replication: same quality ordering, same cut
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        when(length(trim(col("text"))) === 0, array().cast("array<string>"))
          .otherwise(split(lower(trim(col("text"))), "\\s+")).as("tok"),
        col("text"))
    val nChars = length(col("text")).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "\\p{Punct}", ""))).cast("double")
    val q = docs.select(col("source"), col("doc_id"), size(col("tok")).cast("long").as("ntok"),
      floor(least(lit(1.0), size(col("tok")).cast("double") / 100.0) *
        (lit(1.0) - when(nChars === 0, 0.0).otherwise(nPunct / nChars)) * 10000.0 + 0.5)
        .cast("long").as("q_e4"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = q.groupBy(_._1).map { case (src, rs) =>
      val sorted = rs.sortBy(r => (-r._4, r._2))
      val w = sorted.map(_._3).sum
      val t = (9 * w + 9) / 10
      var cum = 0L
      val sel = sorted.takeWhile { r => val before = cum; cum += r._3; before < t }
      (src, rs.length.toLong, sel.length.toLong, w, sel.map(_._3).sum, sel.map(_._4).min)
    }.toSet
    val got = s.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    val again = graft.operators.TextOps.topPSelect(spark, sf)
    assert(s.exceptAll(again).count() == 0)
  }

  test("MG merge: contract holds, counters never overcount, guaranteed terms survive") {
    val slots = 16
    val m = graft.operators.TextStats.mgMerge(spark, sf, slots = slots).cache()
    val rows = m.orderBy("rank").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    // the mergeable-summaries theorem, measured: every row passes its
    // own contract check (support > n/(k+1) => present AND undercount
    // bounded by n/(k+1))
    assert(m.filter(col("mg_ok") =!= 1).count() == 0)
    // MG counters NEVER overcount (decrements only)
    assert(m.filter(col("mg_count") > col("n_exact")).count() == 0)
    // every guaranteed-support term actually survives the merge
    assert(m.filter(col("guaranteed") === 1 && col("mg_count") <= 0).count() == 0)
    // a smaller slot table weakens the contract but must still honor it
    val tight = graft.operators.TextStats.mgMerge(spark, sf, slots = 4)
    assert(tight.filter(col("mg_ok") =!= 1).count() == 0)
    val again = graft.operators.TextStats.mgMerge(spark, sf, slots = slots)
    assert(m.exceptAll(again).count() == 0)
  }

  test("ks drift: matches BigInt brute force per source, bounds hold") {
    val rows = TextStats.ksDrift(spark, sf).collect()
    val docs = Tables
      .documents(spark, sf)
      .select("source", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val lens = docs.map(_._2).distinct.sorted
    val n = BigInt(docs.length)
    val bySrc = docs.groupBy(_._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val (src, nDocs, ks, atLen) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val mine = bySrc(src).map(_._2)
      val ns = BigInt(mine.length)
      val nb = n - ns
      assert(nDocs == mine.length)
      // brute-force KS: max cross-multiplied CDF gap over the grid,
      // smallest argmax length on ties
      var bestNum = BigInt(-1); var bestLen = -1L
      lens.foreach { x =>
        val ca = BigInt(mine.count(_ <= x))
        val cb = BigInt(docs.count(d => d._1 != src && d._2 <= x))
        val num = (ca * nb - cb * ns).abs
        if (num > bestNum) { bestNum = num; bestLen = x }
      }
      assert(atLen == bestLen, s"source $src argmax")
      assert(ks == (bestNum * 1000000 / (ns * nb)).toLong, s"source $src ks")
      assert(ks >= 0 && ks <= 1000000)
    }
  }

  test("hapax: per-source vocabulary counts match a scala replay") {
    import graft.operators.TextStats
    val got = TextStats
      .hapax(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val docs = Tables
      .documents(spark, sf)
      .select("source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, ds) =>
      val counts = ds
        .flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .groupBy(identity)
        .map { case (_, xs) => xs.length }
      val vocab = counts.size.toLong
      val hap = counts.count(_ == 1).toLong
      val dis = counts.count(_ == 2).toLong
      val toks = counts.map(_.toLong).sum
      assert(got(src) == ((vocab, hap, dis, toks, hap * 1000000 / vocab)), s"source $src")
    }
  }

  test("rake: top phrases match a scala replay of the full pipeline") {
    import graft.operators.{TextOps, TextStats}
    val got = TextStats
      .rake(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10)
    val stops = TextOps.stopwords.toSet
    val docs = Tables
      .documents(spark, sf)
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+")))
    // islands: stopword-free runs per doc
    val phrases = docs.flatMap { case (id, tok) =>
      val runs = collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      tok.foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs.map(ws => (id, ws))
    }
    val wordStats = phrases
      .flatMap { case (_, ws) => ws.map(w => (w, ws.length.toLong)) }
      .groupBy(_._1)
      .map { case (w, xs) =>
        w -> (xs.map(_._2).sum * 1000000L / xs.length)
      }
    val scored = phrases.map { case (_, ws) =>
      (ws.mkString(" "), ws.length.toLong, ws.map(wordStats).sum)
    }
    val agg = scored
      .groupBy(_._1)
      .map { case (p, xs) => (p, xs.length.toLong, xs.head._2, xs.head._3) }
      .toSeq
      .sortBy { case (p, _, _, s) => (-s, p) }
      .take(10)
    assert(got.toSeq == agg.map(t => (t._1, t._2, t._3, t._4)))
    // scores strictly ordered (desc) with phrase tiebreak
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      case _ =>
    }
  }

  test("zipf octaves: power-of-two ranks with exact frequency ratios") {
    import graft.operators.TextStats
    val z = TextStats
      .zipfOctaves(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(z.nonEmpty)
    // ranks are powers of two and octave = log2(rank)
    z.foreach { case (_, oct, rank, _, _) =>
      assert((rank & (rank - 1)) == 0 && rank >= 1)
      assert(rank == (1L << oct.toInt))
    }
    // scala replay on one source
    val src = z.head._1
    val counts = Tables
      .documents(spark, sf)
      .filter(col("source") === src)
      .select("text")
      .collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .groupBy(identity)
      .toSeq
      .map { case (t, xs) => (t, xs.length.toLong) }
      .sortBy { case (t, c) => (-c, t) }
    val mine = z.filter(_._1 == src).sortBy(_._2)
    mine.foreach { case (_, _, rank, freq, ratio) =>
      assert(freq == counts((rank - 1).toInt)._2, s"rank $rank freq")
      if (rank > 1) {
        val prev = counts((rank / 2 - 1).toInt)._2
        assert(ratio == freq * 1000000 / prev, s"rank $rank ratio")
        // frequencies are non-increasing in rank
        assert(ratio <= 1000000)
      } else assert(ratio == -1L)
    }
  }

  test("phrase search: scala replay exact; per-phrase hits sum to the corpus trigram count") {
    val ps = graft.operators.TextStats.phraseSearch(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+").toSeq))
    val triCounts = docs
      .flatMap { case (_, tk) => if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")) else Nil }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val top3 = triCounts.toSeq.sortBy { case (p, c) => (-c, p) }.take(3).map(_._1)
    val expected = (for {
      phrase <- top3
      (docId, tk) <- docs
      if tk.length >= 3
      starts = tk.sliding(3).zipWithIndex.collect {
        case (w, i) if w.mkString(" ") == phrase => i.toLong
      }.toSeq
      if starts.nonEmpty
    } yield (phrase, docId, starts.length.toLong, starts.min)).toSet
    val got = ps.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, "phrase search differs from the scala positional replay")
    // total hits per phrase == the phrase's corpus trigram frequency
    top3.foreach { p =>
      val total = got.toSeq.filter(_._1 == p).map(_._3).sum
      assert(total == triCounts(p), s"phrase '$p' hit total")
    }
    ps.unpersist()
  }

  test("textrank: exact integer trajectory replay of the word-graph rounds") {
    val got = TextStats.textRank(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // scala replay: window-2 co-occurrence graph + 2 damped rounds
    val stop = graft.operators.TextOps.stopwords.toSet
    val docs = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val pairCounts = collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { t =>
      val ws = t.trim.toLowerCase.split("\\s+").zipWithIndex
        .filterNot { case (w, _) => stop(w) }
      for {
        i <- ws.indices
        j <- (i + 1) until ws.length
        if ws(j)._2 > ws(i)._2 && ws(j)._2 <= ws(i)._2 + 2
        if ws(i)._1 != ws(j)._1
      } {
        val k = if (ws(i)._1 < ws(j)._1) (ws(i)._1, ws(j)._1) else (ws(j)._1, ws(i)._1)
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1
      }
    }
    val edges = pairCounts.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    val wout = edges.groupBy(_._1).map { case (w, es) => w -> es.map(_._3).sum }
    val n = wout.size.toLong
    var r: Map[String, Long] = wout.keys.map(_ -> 100000000L / n).toMap
    for (_ <- 1 to 2) {
      val cs = collection.mutable.Map.empty[String, Long]
      edges.foreach { case (src, dst, cw) =>
        cs(dst) = cs.getOrElse(dst, 0L) + r(src) * cw / wout(src)
      }
      r = cs.map { case (w, c) => w -> (15L * 100000000L / (100 * n) + 85 * c / 100) }.toMap
    }
    val exp = r.toSeq.sortBy { case (w, s) => (-s, w) }.take(20)
      .zipWithIndex.map { case ((w, s), i) => (w, s, i + 1L) }
    assert(got.sortBy(_._3).toSeq == exp, "textrank differs from the scala trajectory")
  }

  test("heaps curve: prefix-vocabulary replay; both columns monotone; endpoints exact") {
    val got = TextStats.heapsCurve(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val toks = docs.map { case (_, t) => t.trim.toLowerCase.split("\\s+").toSeq }
    val n = docs.length.toLong
    val cps = (Iterator.iterate(2L)(_ * 2).takeWhile(_ < n).toSeq :+ n).distinct
    assert(got.map(_._1).toSeq == cps, "checkpoint grid")
    cps.zip(got).foreach { case (cp, (_, nt, v)) =>
      val prefix = toks.take(cp.toInt)
      assert(nt == prefix.map(_.length.toLong).sum, s"tokens at $cp")
      assert(v == prefix.flatten.distinct.length.toLong, s"vocab at $cp")
    }
    // growth curves never decrease
    got.sliding(2).foreach {
      case Array((_, t1, v1), (_, t2, v2)) => assert(t2 >= t1 && v2 >= v1)
      case _ =>
    }
    // final point covers the whole corpus vocabulary
    assert(got.last._3 == toks.flatten.distinct.length.toLong)
  }

  test("term clumping: per-term cf/df replay; clump >= 1e6 by definition") {
    val got = TextStats.termClumping(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val perDoc = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .flatMap { r =>
        r.getString(1).trim.toLowerCase.split("\\s+")
          .groupBy(identity).map { case (t, xs) => (t, r.getLong(0), xs.length.toLong) }
      }
    val stats = perDoc.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.length.toLong, xs.map(_._3).sum, xs.map(_._3).max))
    }.filter(_._2._1 >= 5)
    val exp = stats.toSeq
      .map { case (t, (df, cf, mx)) => (t, df, cf, mx, cf * 1000000L / df) }
      .sortBy { case (t, _, _, _, cl) => (-cl, t) }
      .take(25)
      .zipWithIndex.map { case ((t, df, cf, mx, cl), i) => t -> ((df, cf, mx, cl, i + 1L)) }
    assert(got.sortBy(_._2._5).toSeq == exp, "clumping differs from the scala replay")
    // cf >= df always, so the clump ratio is bounded below by 1e6
    got.foreach { case (t, (_, _, _, cl, _)) => assert(cl >= 1000000L, t) }
  }

  test("readability: java-regex replay per doc; planted punctuation drives the sentence count") {
    val got = graft.operators.TextOps.readability(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val docs = Tables.documents(spark, sf).selectExpr("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val w =
        if (text.trim.isEmpty) 0L
        else text.trim.toLowerCase.split("\\s+").length.toLong
      val s = math.max("[.!?]+".r.findAllIn(text).size.toLong, 1L)
      val sy = math.max("[aeiouy]+".r.findAllIn(text.toLowerCase).size.toLong, 1L)
      val w1 = math.max(w, 1L)
      assert(
        got(id) == ((w, s, sy, w * 1000 / s, sy * 1000 / w1,
          206835L - 1015 * w / s - 84600 * sy / w1)),
        s"doc $id")
    }
    // the synthetic corpus has no sentence punctuation; prove the
    // sentence path live with planted text through the same kernel
    val planted = spark.sql(
      """SELECT greatest(regexp_count('One. Two!! Three? And', '[.!?]+'), 1) AS s,
           greatest(regexp_count(lower('One. Two!! Three? And'), '[aeiouy]+'), 1) AS sy""")
      .collect().head
    assert(planted.get(0).toString.toLong == 3L)
    assert(planted.get(1).toString.toLong == 5L)
  }

  test("simpson: BigInt term-count replay; lambda in (0, 1e9]; inverse bounded by vocab") {
    val got = TextStats.simpson(spark, sf).collect()
    assert(got.nonEmpty)
    val counts = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("t"))
      .groupBy("source", "t").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    got.foreach { r =>
      val cs = counts(r.getString(0))
      val vocab = cs.size.toLong
      val n = cs.sum
      val rep = cs.map(c => BigInt(c) * (c - 1)).sum
      assert(r.getLong(1) == vocab && r.getLong(2) == n)
      assert(BigInt(r.getLong(3)) == rep)
      assert(BigInt(r.getLong(4)) == rep * 1000000000L / (BigInt(n) * (n - 1)))
      assert(r.getLong(4) > 0L && r.getLong(4) <= 1000000000L)
      if (rep > 0) {
        assert(BigInt(r.getLong(5)) == BigInt(n) * (n - 1) * 1000 / rep)
        // effective vocabulary can't exceed the actual vocabulary
        assert(r.getLong(5) <= vocab * 1000 + 1000)
      }
    }
  }

  test("js drift: sources partition tokens; bounded [0,1] bits; exact coverage tail replay") {
    val d = TextStats.jsDrift(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(d.count() == docs.select("source").distinct().count())
    val totalTokens = d.agg(sum("n_tokens")).head.getLong(0)
    val tok = docs.select(
      col("source"),
      explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("w"))
    assert(totalTokens == tok.count())
    // independent coverage replay: per source, the corpus mass of its present tokens
    val cw = tok.groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTotal = cw.values.sum
    val present = tok.distinct().collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(x => cw(x._2)).sum }
    d.collect().foreach { r =>
      val src = r.getString(0)
      val cov = present(src)
      assert(r.getAs[Long]("coverage_e6") == (BigInt(cov) * 1000000 / nTotal).toLong,
        s"coverage tail for $src")
      // JS is bounded by 1 bit; per-term quantization dips at most 5e-7 each
      val slack = r.getAs[Long]("n_terms") / 2 + 2
      val js = r.getAs[Long]("js_e6")
      assert(js >= -slack && js <= 1000000L + slack, s"JS out of [0,1] bits for $src: $js")
    }
  }

  test("mutual info: float identity within quantization slack; NMI bounded by min entropy") {
    val r = TextStats.mutualInfo(spark, sf).head()
    val docs = Tables.documents(spark, sf)
    assert(r.getAs[Long]("n_docs") == docs.count())
    val cells = docs.groupBy("lang", "source").count().collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(r.getAs[Long]("n_cells") == cells.length.toLong)
    val n = cells.map(_._3).sum.toDouble
    val rl = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val cs = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    assert(r.getAs[Long]("n_langs") == rl.size.toLong &&
      r.getAs[Long]("n_sources") == cs.size.toLong)
    def lg2(x: Double) = math.log(x) / math.log(2)
    val mi = cells.map { case (l, s, c) => (c / n) * lg2(c * n / (rl(l).toDouble * cs(s))) }.sum
    val hl = rl.values.map(c => (c / n) * lg2(n / c)).sum
    val hs = cs.values.map(c => (c / n) * lg2(n / c)).sum
    assert(math.abs(r.getAs[Long]("mi_e6") / 1e6 - mi) < 1e-3)
    assert(math.abs(r.getAs[Long]("h_lang_e6") / 1e6 - hl) < 1e-3)
    assert(math.abs(r.getAs[Long]("h_source_e6") / 1e6 - hs) < 1e-3)
    // MI <= min(H) up to per-cell rounding; NMI lives on [0, 1e6] within slack
    val minH = math.min(r.getAs[Long]("h_lang_e6"), r.getAs[Long]("h_source_e6"))
    assert(r.getAs[Long]("mi_e6") <= minH + cells.length)
    val nmi = r.getAs[Long]("nmi_e6")
    assert(nmi >= -cells.length.toLong && nmi <= 1000000L + cells.length)
  }

  test("lang kappa: all-integer replay from the confusion frame; sign follows po - pe") {
    val r = TextStats.langKappa(spark, sf).head()
    val conf = graft.operators.TextOps.langConfusion(spark, sf)
      .select("label_lang", "pred_lang", "n_docs")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val n = conf.map(_._3).sum
    val diag = conf.collect { case (l, p, c) if l == p => c }.sum
    val rm = conf.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val cm = conf.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val eSum = rm.keysIterator.flatMap(l => cm.get(l).map(c => BigInt(rm(l)) * c)).sum
    assert(r.getAs[Long]("n_docs") == n && r.getAs[Long]("n_cells") == conf.length.toLong)
    assert(r.getAs[Long]("n_agree") == diag)
    assert(BigInt(r.getAs[Long]("po_e6")) == BigInt(diag) * 1000000 / n)
    assert(BigInt(r.getAs[Long]("pe_e6")) == eSum * 1000000 / (BigInt(n) * n))
    val num = BigInt(n) * diag - eSum
    val den = BigInt(n) * n - eSum
    assert(den > 0)
    val want = (if (num < 0) BigInt(-1) else BigInt(1)) * (num.abs * 1000000 / den)
    assert(BigInt(r.getAs[Long]("kappa_e6")) == want)
    assert(r.getAs[Long]("kappa_e6") <= 1000000L)
    // kappa's sign is the sign of observed-minus-expected agreement
    assert((r.getAs[Long]("kappa_e6") >= 0) == (r.getAs[Long]("po_e6") >= r.getAs[Long]("pe_e6"))
      || num == 0)
  }

  test("term burstiness: VMR replay over all docs; df cut is the (df, term) total order") {
    val got = TextStats.termBurstiness(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.length == 20)
    val perDoc = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("w"))
      .groupBy("w", "doc_id").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (w, v) => w -> v.map(_._2) }
    val nDocs = Tables.documents(spark, sf).count()
    val wantTop = perDoc.toSeq.map { case (w, cs) => (w, cs.size.toLong) }
      .sortBy { case (w, df) => (-df, w) }.take(20).map(_._1).toSet
    assert(got.map(_._1).toSet == wantTop)
    got.foreach { case (w, (gn, df, tot, vmr)) =>
      val cs = perDoc(w)
      val s = cs.sum
      val q = cs.map(c => BigInt(c) * c).sum
      assert(gn == nDocs && df == cs.size.toLong && tot == s)
      assert(BigInt(vmr) ==
        (BigInt(nDocs) * q - BigInt(s) * s) * 1000000 / (BigInt(nDocs) * s), s"term $w")
      // VMR of counts over all docs is at least mean-free floor: nonneg
      assert(vmr >= 0)
    }
  }

  test("cond entropy: float identity within quantization slack; conditioning cannot add bits") {
    val r = TextStats.condEntropy(spark, sf).head()
    val toks = Tables.documents(spark, sf)
      .select(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("tk"))
      .collect().map(_.getSeq[String](0))
    val uni = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bi = toks.flatMap(tk => tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def lg2(x: Double) = math.log(x) / math.log(2)
    def h(m: Map[String, Long]): Double = {
      val n = m.values.sum.toDouble
      m.values.map(c => (c / n) * lg2(n / c)).sum
    }
    assert(r.getAs[Long]("n_tokens") == uni.values.sum)
    assert(r.getAs[Long]("vocab") == uni.size.toLong)
    assert(r.getAs[Long]("n_bigrams") == bi.values.sum)
    assert(r.getAs[Long]("distinct_bigrams") == bi.size.toLong)
    assert(math.abs(r.getAs[Long]("h_unigram_e6") / 1e6 - h(uni)) < 1e-3)
    assert(math.abs(r.getAs[Long]("h_bigram_e6") / 1e6 - h(bi)) < 1e-3)
    assert(r.getAs[Long]("h_cond_e6") ==
      r.getAs[Long]("h_bigram_e6") - r.getAs[Long]("h_unigram_e6"))
    // subadditivity: H(bigram) <= 2 H(unigram), so H_cond <= H_unigram
    // (up to doc-boundary edge effects + quantization)
    val slack = (uni.size + bi.size).toLong
    assert(r.getAs[Long]("h_cond_e6") <= r.getAs[Long]("h_unigram_e6") + slack + 10000L)
    assert(r.getAs[Long]("h_cond_e6") >= -(slack + 10000L))
  }

  test("bigram ppl: full scala LM replay; higher-count bigrams carry lower surprisal") {
    val got = TextStats.bigramPerplexity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def norm(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> norm(r.getString(1)).split(" ").toSeq).toMap
    val bigrams = docs.toSeq.flatMap { case (d, tk) =>
      if (tk.size < 2) Nil else tk.zip(tk.tail).map(b => (d, b))
    }
    val c12 = bigrams.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val c1 = c12.toSeq.groupBy(_._1._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val v = docs.values.flatten.toSet.size.toLong
    val want = bigrams.groupBy(_._1).map { case (d, bs) =>
      val terms = bs.map { case (_, b) =>
        math.floor(
          (math.log((c1(b._1) + v).toDouble / (c12(b) + 1).toDouble) / math.log(2.0))
            * 1e6 + 0.5).toLong
      }
      d -> ((bs.size.toLong, terms.sum / bs.size))
    }
    assert(got == want, "bigram-LM cross-entropy replay mismatch")
    assert(got.nonEmpty && got.values.forall(_._2 > 0))
  }

  test("char entropy: scala replay; uniform-ish docs sit below log2(alphabet)") {
    val got = TextStats.charEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def norm(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    val want = Tables.documents(spark, sf).select("doc_id", "text").collect().flatMap { r =>
      val cs = norm(r.getString(1)).toSeq.map(_.toString).filter(_.nonEmpty)
      if (cs.isEmpty) None
      else {
        val counts = cs.groupBy(identity).map { case (_, xs) => xs.size.toLong }
        val n = cs.size.toLong
        val tsum = counts.map { c =>
          math.floor(c.toDouble * (math.log(n.toDouble / c) / math.log(2.0)) * 1e6 + 0.5).toLong
        }.sum
        Some(r.getLong(0) -> ((n, counts.size.toLong, tsum / n)))
      }
    }.toMap
    assert(got == want, "char-entropy replay mismatch")
    // H <= log2(n_distinct): entropy bounded by the alphabet actually used
    got.values.foreach { case (_, k, h) =>
      assert(h <= math.ceil(math.log(k.toDouble) / math.log(2.0) * 1e6).toLong + 1)
    }
  }

  test("msttr: per-segment distinct replay at seg=25; ratio bounded by (0, 1e6]") {
    val got = graft.operators.TextOps.msttr(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def norm(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    val want = Tables.documents(spark, sf).select("doc_id", "text").collect().flatMap { r =>
      val tk = norm(r.getString(1)).split(" ").toSeq
      val nseg = tk.size / 25
      if (nseg < 1) None
      else {
        val dsum = (0 until nseg).map(s0 => tk.slice(s0 * 25, s0 * 25 + 25).distinct.size.toLong).sum
        Some(r.getLong(0) -> ((tk.size.toLong, nseg.toLong, dsum * 1000000L / (25L * nseg))))
      }
    }.toMap
    assert(got == want, "msttr replay mismatch")
    got.values.foreach { case (_, _, m) => assert(m > 0 && m <= 1000000L) }
  }

  test("good-turing: bigram spectrum replay; adjusted counts and unseen mass exact") {
    def norm(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    val counts = Tables
      .documents(spark, sf)
      .select("text")
      .collect()
      .flatMap { r =>
        val tk = norm(r.getString(0)).split(" ", -1).toSeq
        if (tk.size < 2) Seq.empty[String]
        else tk.zip(tk.tail).map { case (a, b) => s"$a $b" }
      }
      .groupBy(identity)
      .map { case (_, xs) => xs.length.toLong }
      .toVector
    val spectrum = counts.groupBy(identity).map { case (r, xs) => (r, xs.length.toLong) }
    val nTokens = counts.sum
    val vocab = counts.length.toLong
    val nr1 = spectrum.getOrElse(1L, 0L)
    val got = TextStats
      .goodTuring(spark, sf)
      .collect()
      .map(r =>
        r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getLong(7)))
      .toMap
    assert(got.nonEmpty, "bigram spectrum head must be non-empty")
    spectrum.filter(_._1 <= 10).foreach { case (r, nR) =>
      val nNext = spectrum.getOrElse(r + 1, 0L)
      val (gNr, gNext, gTok, gVocab, rStar, pR, p0) = got(r)
      assert(gNr == nR && gNext == nNext, s"r=$r")
      assert(gTok == nTokens && gVocab == vocab, s"r=$r totals")
      assert(rStar == (r + 1) * nNext * 1000000L / nR, s"r=$r r*")
      assert(pR == (r + 1) * nNext * 1000000000L / (nR * nTokens), s"r=$r p_r")
      assert(p0 == nr1 * 1000000L / nTokens, s"r=$r p0")
    }
    assert(got.keySet == spectrum.keySet.filter(_ <= 10), "spectrum head rows")
    // mass conservation across the FULL spectrum: sum r*N_r = N
    assert(spectrum.map { case (r, nR) => r * nR }.sum == nTokens)
  }

  test("kneser-ney: full LM replay; H_KN >= H_MLE; per-context mass bounded by 1") {
    def norm(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    val bigrams = Tables
      .documents(spark, sf)
      .select("text")
      .collect()
      .flatMap { r =>
        val tk = norm(r.getString(0)).split(" ", -1).toSeq
        if (tk.size < 2) Seq.empty[(String, String)] else tk.zip(tk.tail)
      }
    val c12 = bigrams.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val nsucc = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val npred = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val bb = c12.size.toLong
    val nn = c12.values.sum
    def pKn(w1: String, w2: String): Double =
      (c12((w1, w2)).toDouble - 0.75) / c1(w1).toDouble +
        (0.75 * nsucc(w1).toDouble / c1(w1).toDouble) * (npred(w2).toDouble / bb.toDouble)
    var skn = BigInt(0); var smle = BigInt(0)
    c12.foreach { case ((w1, w2), c) =>
      skn += BigInt(c) * math.floor(-math.log(pKn(w1, w2)) * 1e9 + 0.5).toLong
      smle += BigInt(c) * math.floor(-math.log(c.toDouble / c1(w1).toDouble) * 1e9 + 0.5).toLong
    }
    val row = TextStats.knBigramEntropy(spark, sf).collect().head
    assert(row.getLong(0) == nn && row.getLong(1) == bb)
    assert(row.getLong(2) == (skn / nn).toLong, "H_KN")
    assert(row.getLong(3) == (smle / nn).toLong, "H_MLE")
    assert(row.getLong(4) == ((skn - smle) / nn).toLong)
    // MLE is the in-sample optimum: smoothing always costs nats
    assert(row.getLong(4) >= 0L)
    // interpolated KN never assigns an observed-context mass above 1
    c1.keys.foreach { w1 =>
      val mass = c12.keys.filter(_._1 == w1).map { case (_, w2) => pKn(w1, w2) }.sum
      assert(mass <= 1.0 + 1e-9, s"context $w1 mass $mass")
    }
  }
}
