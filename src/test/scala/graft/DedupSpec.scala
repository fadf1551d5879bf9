package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextOps}

class DedupSpec extends SparkSpec {

  test("exact dedup finds every planted exact copy, no false positives") {
    val d = Dedup.exact(spark, sf).cache()
    val dups = d.filter(col("n_copies") > 1)
    // planted: every 7th doc duplicated once
    assert(dups.filter(col("n_copies") =!= 2).count() == 0)
    assert(dups.count() == d.filter(col("canonical_id") % 7 === 0).filter(col("n_copies") === 2).count())
  }

  test("minhash LSH recalls all planted near-dups (80% truncation)") {
    val pairs = Dedup.minhash(spark, sf).cache()
    val planted = pairs.filter(col("doc_b") === col("doc_a") + 1000000L)
    val nPlantedDocs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).count()
    // ≥90% recall of planted truncation-dups via 8×4 banding
    assert(planted.count() >= (nPlantedDocs * 9) / 10,
      s"recall ${planted.count()}/$nPlantedDocs")
    // estimates on planted pairs should be high
    assert(planted.filter(col("est_jaccard") < 0.3).count() == 0)
  }

  test("jaccard verify scores planted pairs high") {
    val j = Dedup.jaccardVerify(spark, sf).cache()
    val planted = j.filter(col("doc_b") === col("doc_a") + 1000000L)
    assert(planted.count() > 0)
    assert(planted.agg(min("jaccard")).head.getDouble(0) >= 0.5)
  }

  test("simhash near-dup includes planted pairs at small hamming distance") {
    val s = Dedup.simhash(spark, sf).cache()
    val planted = s.filter(col("doc_b") === col("doc_a") + 1000000L)
    assert(planted.count() > 0)
  }

  test("idf-weighted simhash finds planted pairs comparably to unweighted on uniform vocab") {
    val unweighted = Dedup.simhash(spark, sf)
      .filter(col("doc_b") === col("doc_a") + 1000000L).count()
    val weighted = Dedup.simhashIdf(spark, sf)
      .filter(col("doc_b") === col("doc_a") + 1000000L).count()
    assert(weighted > 0)
    // uniform synthetic vocab → IDF weights near-constant → comparable recall
    assert(math.abs(weighted - unweighted) <= math.max(5L, unweighted / 2),
      s"weighted=$weighted unweighted=$unweighted diverged unexpectedly")
  }

  test("embedding near-dup finds exactly the planted perturbed vectors") {
    val e = Dedup.embedding(spark, sf).cache()
    assert(e.count() > 0)
    // every pair is (v, v+1M) with cos ≥ 0.99
    assert(e.filter(col("vec_b") =!= col("vec_a") + 1000000L).count() == 0)
  }

  test("semantic dedup drops exactly one side of each planted pair, keeping the cluster outlier") {
    val s = Dedup.semantic(spark, sf).cache()
    val base = graft.Tables.embeddings(spark, sf).count()
    val planted = base / 4 // every 4th vec_id (0-based ids) gets a near-copy
    assert(s.count() == base + planted)
    val droppedCount = s.filter(col("keep") === 0).count()
    assert(droppedCount == planted, s"dropped $droppedCount, planted $planted")
    // each dropped vector has its planted partner kept (pair = v <-> v+1M)
    val dropped = s.filter(col("keep") === 0).select(col("vec_id")).cache()
    val partner = dropped.select(
      when(col("vec_id") >= 1000000L, col("vec_id") - 1000000L)
        .otherwise(col("vec_id") + 1000000L).as("vec_id"))
    assert(partner.join(s.filter(col("keep") === 1), "vec_id").count() == planted)
    // the SemDeDup rule: the kept side of a pair is never closer to
    // the centroid than the dropped side
    val pairs = s.filter(col("keep") === 0)
      .select(col("vec_id").as("d_id"), col("ccos_e4").as("d_ccos"))
      .join(
        s.filter(col("keep") === 1).select(col("vec_id").as("k_id"), col("ccos_e4").as("k_ccos")),
        col("k_id") === col("d_id") + 1000000L || col("k_id") === col("d_id") - 1000000L)
    assert(pairs.filter(col("k_ccos") > col("d_ccos")).count() == 0)
  }

  test("near-dup clustering matches a union-find reference; planted pairs share clusters") {
    val labels = Dedup.clusters(spark, sf).cache()
    val pairRows = Dedup.minhash(spark, sf).select("doc_a", "doc_b").collect()
    // union-find reference on the driver (small at spec scale)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairRows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc in a pair must carry the union-find root as cluster id
    val bad = pairRows.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      .filter(d => got(d) != find(d))
    assert(bad.isEmpty, s"cluster mismatch for docs ${bad.take(5).toSeq}")
    // exactly one keeper per cluster
    assert(labels.filter(col("keep") === 1)
      .groupBy("cluster_id").count().filter("count > 1").count() == 0)
  }

  test("incremental dedup equals the cross-side subset of full minhash pairs") {
    val inc = Dedup.incremental(spark, sf).cache()
    assert(inc.count() > 0)
    // exactly the (existing, new) pairs — no new×new, no existing×existing
    assert(inc.filter(col("doc_a") >= 1000000L || col("doc_b") < 1000000L).count() == 0)
    val full = Dedup.minhash(spark, sf)
      .filter(col("doc_a") < 1000000L && col("doc_b") >= 1000000L)
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0,
      "incremental probe diverged from the full self-join's cross pairs")
  }

  test("duplicate-span removal matches an in-memory reference rewrite") {
    val s = Dedup.spans(spark, sf, blockLen = 8).cache()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    // reference model: scan docs in (doc_id, position) order, keep the
    // first occurrence of every >=3-token block, always keep short tails
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.map { case (id, text) =>
      val tok = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      val blocks = tok.grouped(8).map(_.mkString(" ")).toVector
      val kept = blocks.filter { b =>
        if (b.split(" ", -1).length < 3) true
        else if (seen.contains(b)) false
        else { seen += b; true }
      }
      (id, blocks.size.toLong, kept.size.toLong, kept.mkString(" "))
    }.toSeq
    val actual = s.select("doc_id", "n_blocks", "n_kept", "cleaned_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1).toSeq
    assert(actual == expected)
    // the rewrite did real work on this corpus (cross-doc repeated spans exist)
    assert(s.filter(col("n_kept") < col("n_blocks")).count() > 0)
  }

  test("dedup apply: one row per cluster, sizes account for the whole corpus") {
    val a = Dedup.applyKeepList(spark, sf).cache()
    val labels = Dedup.clusters(spark, sf)
    assert(a.count() == labels.filter(col("keep") === 1).count())
    assert(a.filter(col("doc_id") =!= col("cluster_id")).count() == 0)
    assert(a.agg(sum("cluster_size")).head.getLong(0) == labels.count())
    assert(a.filter(col("n_dropped") < 0).count() == 0)
  }

  test("ann brute force: top-k per query, self excluded, ranks contiguous") {
    val bf = Similarity.bruteForce(spark, sf).cache()
    assert(bf.groupBy("query_id").count().filter("count > 10").count() == 0)
    assert(bf.filter(col("vec_id") === col("query_id")).count() == 0)
    assert(bf.filter("rank < 1 OR rank > 10").count() == 0)
  }

  test("ann lsh results are a subset-quality approximation of brute force top-1") {
    val bf = Similarity.bruteForce(spark, sf).filter(col("rank") === 1)
      .select(col("query_id"), col("cos").as("bf_cos"))
    val ls = Similarity.lsh(spark, sf).filter(col("rank") === 1)
      .select(col("query_id"), col("cos").as("lsh_cos"))
    // lsh top-1 can't beat brute force
    assert(bf.join(ls, "query_id").filter(col("lsh_cos") > col("bf_cos") + 1e-9).count() == 0)
  }

  test("centroid assignment: one assignment per vector, cos in [-1,1]") {
    val c = Similarity.centroidAssign(spark, sf).cache()
    assert(c.count() == graft.Tables.embeddings(spark, sf).count())
    assert(c.filter(col("cos") > 1.0001 || col("cos") < -1.0001).count() == 0)
  }

  test("text ops: token counts consistent, quality in [0,1]") {
    val t = TextOps.tokenCounts(spark, sf).cache()
    assert(t.filter(col("n_ws_tokens") > col("n_bpe_tokens")).count() == 0)
    val q = TextOps.qualityScore(spark, sf)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    val l = TextOps.langId(spark, sf)
    assert(l.filter(col("pred_lang").isNull).count() == 0)
  }

  test("frame sampling: every video scheduled, indices in range on the fps*2 grid") {
    val f = Multimodal.frameSample(spark, sf, everySec = 2).cache()
    val videos = Multimodal.manifest(spark, sf).filter(col("modality") === "video")
    assert(f.select("doc_id").distinct().count() == videos.count())
    assert(f.filter(col("frame_idx") < 0 || col("frame_idx") >= col("n_frames")).count() == 0)
    assert(f.filter(col("frame_idx") % (col("fps") * 2) =!= 0).count() == 0)
    assert(f.filter(col("frame_idx") === 0).count() == videos.count(), "first frame always sampled")
  }

  test("multimodal: manifest covers all docs; features are 8-dim, deterministic") {
    val m = Multimodal.manifest(spark, sf)
    assert(m.count() == graft.Tables.documents(spark, sf).count())
    val f1 = Multimodal.features(spark, sf).orderBy("doc_id").collect()
    val f2 = Multimodal.features(spark, sf).orderBy("doc_id").collect()
    assert(f1.sameElements(f2))
    assert(f1.forall(_.getSeq[Float](3).length == 8))
  }

  test("dedup report: covers the dup-corpus, rates valid, planted dups detected") {
    val r = Dedup.report(spark, sf).cache()
    val nBase = graft.Tables.documents(spark, sf).count()
    val nPlanted = graft.Tables.documents(spark, sf).filter(col("doc_id") % 5 === 0).count()
    // every doc of the dup-corpus is attributed to exactly one source row
    assert(r.agg(sum("n_docs")).head.getLong(0) == nBase + nPlanted)
    assert(r.filter(col("dup_rate") < 0 || col("dup_rate") > 1).count() == 0)
    assert(r.filter(col("n_dups") > col("n_docs")).count() == 0)
    // the planted every-5th near-copies make the overall dup mass real
    val dups = r.agg(sum("n_dups")).head.getLong(0)
    assert(dups >= nPlanted, s"only $dups dups found for $nPlanted planted copies")
  }

  test("prefix join: EXACTLY the brute-force Jaccard>=0.6 pair set, no recall loss") {
    val p = Dedup.prefixJoin(spark, sf).cache()
    // brute-force ground truth over the same corpus (test-SF-sized only)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val t = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    val keep = greatest(lit(1), floor(size(t) * 0.8).cast("int"))
    def sh(tok: org.apache.spark.sql.Column) =
      when(size(tok) < 3, array(concat_ws(" ", tok)))
        .otherwise(transform(sequence(lit(1), size(tok) - 2),
          i => concat_ws(" ", slice(tok, i, lit(3)))))
    val corpus = docs.select(col("doc_id"), array_distinct(sh(t)).as("ts"))
      .unionAll(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_distinct(sh(slice(t, lit(1), keep))).as("ts")))
    val a = corpus.select(col("doc_id").as("doc_a"), col("ts").as("ts_a"))
    val b = corpus.select(col("doc_id").as("doc_b"), col("ts").as("ts_b"))
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("i", size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
      .withColumn("u", (size(col("ts_a")) + size(col("ts_b"))).cast("long") - col("i"))
      .filter(col("i") * 5 >= col("u") * 3)
      .select("doc_a", "doc_b")
    // set equality both ways: prefix filtering loses NOTHING and adds nothing
    assert(p.select("doc_a", "doc_b").exceptAll(truth).count() == 0)
    assert(truth.exceptAll(p.select("doc_a", "doc_b")).count() == 0)
    // the planted truncation copies are found
    assert(p.filter(col("doc_b") === col("doc_a") + 1000000L).count() > 0)
    // score formula holds
    assert(p.filter(col("jaccard_e4") =!= expr("(n_inter * 10000) div n_union")).count() == 0)
    val again = Dedup.prefixJoin(spark, sf)
    assert(p.exceptAll(again).count() == 0)
  }

  test("substring dedup: catches planted MISALIGNED copies that aligned 8-blocks provably miss") {
    val spans = Dedup.substringSpans(spark, sf).cache()
    val t = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    val srcs = Tables.documents(spark, sf)
      .select(col("doc_id"), t.as("tok"))
      .filter(col("doc_id") % 6 === 0 && size(col("tok")) >= 25)
      .select(col("doc_id"), col("tok"), size(col("tok")).cast("long").as("n"))
      .cache()
    val nPlanted = srcs.count()
    assert(nPlanted > 0)
    // every planted copy is caught as EXACTLY the span [3, m+2]
    // (m = n-10 copied tokens behind the 3 unique junk tokens), with
    // every interior window flagged: start 3, length m, m-9 windows
    val got = spans.filter(col("doc_id") >= 6000000L)
      .join(srcs.select((col("doc_id") + 6000000L).as("doc_id"), col("n")), "doc_id")
    assert(got.count() == nPlanted, "each planted doc has exactly one maximal span")
    assert(got.filter(col("span_start") =!= 3L).count() == 0)
    assert(got.filter(col("span_len") =!= col("n") - 10L).count() == 0)
    assert(got.filter(col("span_end") =!= col("n") - 8L).count() == 0)
    assert(got.filter(col("n_windows") =!= col("n") - 19L).count() == 0)
    // the aligned-8-block detector (dedup_spans' geometry) PROVABLY
    // misses them: the copy shifts content by 2 (mod 8), so no full
    // 8-token block of any planted doc equals any aligned block of its
    // source — zero shared block strings across all planted pairs
    def blocks8(tok: org.apache.spark.sql.Column) =
      filter(
        transform(sequence(lit(1), floor((size(tok) + lit(7)) / lit(8)).cast("int")),
          i => array_join(slice(tok, (i - lit(1)) * 8 + 1, lit(8)), " ")),
        b => size(split(b, " ")) === 8)
    val plantedToks = srcs.select(
      col("doc_id"),
      concat(
        array(
          concat(lit("zzq"), col("doc_id"), lit("a")),
          concat(lit("zzq"), col("doc_id"), lit("b")),
          concat(lit("zzq"), col("doc_id"), lit("c"))),
        expr("slice(tok, 6, size(tok) - 10)")).as("ptok"))
    val crossMatches = srcs.join(plantedToks, "doc_id")
      .select(explode(array_intersect(blocks8(col("tok")), blocks8(col("ptok")))))
      .count()
    assert(crossMatches == 0, s"aligned blocks unexpectedly matched $crossMatches times")
    // deterministic
    val again = Dedup.substringSpans(spark, sf)
    assert(spans.exceptAll(again).count() == 0 && again.exceptAll(spans).count() == 0)
    srcs.unpersist(); spans.unpersist()
  }

  test("substring rewrite: planted copies reduce to their junk prefix; kept = tokens - span coverage") {
    val rw = Dedup.substringRewrite(spark, sf).cache()
    val spans = Dedup.substringSpans(spark, sf)
    // per-doc conservation: the rewrite removes EXACTLY the union of
    // the detector's maximal spans (islands are merged coverage)
    val removed = spans.groupBy("doc_id").agg(sum("span_len").as("n_removed"))
    val bad = rw
      .join(removed, Seq("doc_id"), "left")
      .filter(col("n_kept") =!= col("n_tokens") - coalesce(col("n_removed"), lit(0L)))
    assert(bad.count() == 0, "n_kept != n_tokens - span coverage somewhere")
    // every planted copy loses its whole copied region and keeps the
    // 3-token junk prefix verbatim
    val planted = rw.filter(col("doc_id") >= 6000000L).cache()
    assert(planted.count() > 0)
    assert(planted.filter(col("n_kept") =!= 3L).count() == 0)
    assert(
      planted
        .filter(col("cleaned_text") =!= concat(
          lit("zzq"), col("doc_id") - 6000000L, lit("a zzq"),
          col("doc_id") - 6000000L, lit("b zzq"),
          col("doc_id") - 6000000L, lit("c")))
        .count() == 0)
    // docs with no detected span pass through bit-identical
    val untouched = rw
      .join(spans.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .filter(col("doc_id") < 6000000L)
    assert(untouched.count() > 0)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
    assert(
      untouched.join(docs, "doc_id").filter(col("cleaned_text") =!= col("norm")).count() == 0)
    assert(untouched.filter(col("n_kept") =!= col("n_tokens")).count() == 0)
    planted.unpersist(); rw.unpersist()
  }

  test("SNM: planted truncation dups land in the sort window and verify") {
    val s = Dedup.snm(spark, sf).cache()
    // planted pairs share their 24-char prefix => identical sort key =>
    // adjacent up to prefix collisions; nearly all must be recovered
    val planted = s.filter(col("doc_b") === col("doc_a") + 1000000L && col("doc_a") % 5 === 0)
    val nPlanted = Tables.documents(spark, sf).filter(col("doc_id") % 5 === 0).count()
    assert(planted.count() >= (nPlanted * 9) / 10, s"${planted.count()} of $nPlanted planted dups found")
    // every emitted pair is threshold-verified and within the window
    assert(s.filter(col("jaccard") < 0.3).count() == 0)
    assert(s.filter(col("dist") < 1 || col("dist") > 4).count() == 0)
    // no duplicate pairs: window positions are unique
    assert(s.groupBy("doc_a", "doc_b").count().filter(col("count") > 1).count() == 0)
    val again = Dedup.snm(spark, sf)
    assert(s.exceptAll(again).count() == 0)
  }

  test("phash near-dup: pair set equals a scala brute-force replay") {
    val p = Multimodal.phashNearDup(spark, sf).cache()
    val got = p
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    // independent replay: tokens → 15 relative blocks → md5 nibbles →
    // all-pairs Hamming (the LSH banding can only MISS pairs the
    // all-pairs scan finds, never add; equality proves it missed none
    // with hamming under the band-guaranteed bound)
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def phash(tok: Array[String]): Long = {
      val n = tok.length
      (0 until 15).map { i =>
        val st = i * n / 15
        val en = (i + 1) * n / 15
        if (en - st == 0) 0L
        else (h60("graft-ph:" + tok.slice(st, en).mkString(" ")) & 15L) << (4 * i)
      }.sum
    }
    val baseDocs = Tables
      .documents(spark, sf)
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+")))
    val corpus = baseDocs ++ baseDocs
      .filter(_._1 % Multimodal.ReencEvery == 0)
      .map { case (id, tok) =>
        (id + Multimodal.ReencOffset, Array("reenc0") ++ tok.drop(1))
      }
    val hashes = corpus.map { case (id, tok) => (id, phash(tok)) }
    def bands(ph: Long): Seq[Long] = (0 until 4).map(b => (ph >> (b * 15)) & 32767L)
    val exp = (for {
      (ia, pa) <- hashes
      (ib, pb) <- hashes
      if ia < ib
      if bands(pa).zip(bands(pb)).exists { case (x, y) => x == y }
      h = java.lang.Long.bitCount(pa ^ pb).toLong
      if h <= 12
    } yield ((ia, ib), h)).toMap
    assert(got == exp)
    // every planted re-encode is recovered (leading-block edit flips
    // at most one nibble per band, so at least 3 of 4 bands survive)
    val planted = baseDocs.map(_._1).filter(_ % Multimodal.ReencEvery == 0)
    planted.foreach { id =>
      assert(got.contains((id, id + Multimodal.ReencOffset)), s"planted $id missing")
      assert(got((id, id + Multimodal.ReencOffset)) <= 4)
    }
    p.unpersist()
  }

  test("crossmodal topk: modality discipline and bucket-candidate recall") {
    val x = Multimodal.crossModalTopK(spark, sf).cache()
    // sides are strictly image -> audio
    assert(x.filter(col("query_id") % 3 =!= 0).count() == 0)
    assert(x.filter(col("vec_id") % 3 =!= 1).count() == 0)
    // at most k per query, ranks contiguous from 1
    val perQ = x.groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQ.filter(col("n") > 3).count() == 0)
    assert(perQ.filter(col("n") =!= col("mx")).count() == 0)
    // recall vs the exact cross-modal brute force
    import org.apache.spark.sql.expressions.Window
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val exact = vecs
      .filter(col("vec_id") % 3 === 1)
      .crossJoin(
        vecs
          .filter(col("vec_id") % 3 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
      .select(
        col("query_id"),
        col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "vec_id")
    val hit = x.select("query_id", "vec_id").intersect(exact).count().toDouble
    val recall = hit / exact.count()
    assert(recall >= 0.3, s"cross-modal recall@3 = $recall")
    x.unpersist()
  }

  test("containment: pair set equals the all-pairs brute force; excerpts found") {
    val c = Dedup.containment(spark, sf).cache()
    val got = c
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def shingleSet(tok: Array[String]): Set[Long] =
      (if (tok.length < 3) Array(tok.mkString(" "))
       else tok.sliding(3).map(_.mkString(" ")).toArray).map(h60).toSet
    val baseDocs = Tables
      .documents(spark, sf)
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+")))
    val corpus = baseDocs ++ baseDocs
      .filter(_._1 % Dedup.ExcerptEvery == 0)
      .map { case (id, tok) =>
        val lo = math.floor(tok.length * 0.2).toInt
        val len = math.max(
          1,
          math.floor(tok.length * 0.5).toInt - math.floor(tok.length * 0.2).toInt)
        (id + Dedup.ExcerptOffset, tok.slice(lo, lo + len))
      }
    val sets = corpus.map { case (id, tok) => (id, shingleSet(tok)) }
    val exp = (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia != ib
      inter = (sa & sb).size.toLong
      cont = inter * 1000000L / sa.size
      if cont >= 800000L
    } yield ((ia, ib), (sa.size.toLong, inter, cont))).toMap
    assert(got == exp)
    // the planted excerpts are all recovered as contained in their source
    baseDocs.map(_._1).filter(_ % Dedup.ExcerptEvery == 0).foreach { id =>
      assert(got.contains((id + Dedup.ExcerptOffset, id)), s"excerpt of $id missing")
    }
    c.unpersist()
  }

  test("estimator eval: est/exact agree with the standalone #23/#25 queries; error closes") {
    val ev = Dedup.estimatorEval(spark, sf).cache()
    // same candidate pairs as the minhash query (banding is shared)
    val mh = Dedup.minhash(spark, sf)
      .select("doc_a", "doc_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val g = ev.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(g.keySet == mh.keySet, "eval covers exactly the banded candidate pairs")
    g.foreach { case (k, (est, exact, err)) =>
      // est_e6 is the integer-grid version of minhash's 4dp estimate
      assert(math.abs(est / 1e6 - mh(k)) < 5e-4, s"pair $k estimate")
      assert(err == est - exact, "error column closes")
      assert(est >= 0 && est <= 1000000 && exact > 0 && exact <= 1000000)
    }
    // planted near-dups (+1M offsets) must be measured as highly similar
    val planted = g.filter { case ((a, b), _) => b == a + 1000000L }
    assert(planted.nonEmpty)
    assert(planted.values.forall(_._2 >= 500000L), "planted pairs exact-jaccard >= 0.5")
    ev.unpersist()
  }

  test("s-curve table: long-arithmetic replay; endpoints exact; curve dominates the band prob") {
    val got = Dedup.scurveTable(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    def pow(x: Long, p: Int): Long = (2 to p).foldLeft(x)((a, _) => a * x / 1000000L)
    assert(got.length == Dedup.ScurvePoints + 1)
    got.foreach { case (s, pb, pc) =>
      assert(pb == pow(s, Dedup.MinhashRowsPerBand), s"s=$s band")
      assert(pc == 1000000L - pow(1000000L - pb, Dedup.MinhashBands), s"s=$s cand")
      assert(pc >= pb, "banding amplifies: candidate prob dominates one band's")
    }
    assert(got.head == ((0L, 0L, 0L)) && got.last == ((1000000L, 1000000L, 1000000L)))
    // both columns monotone in s
    got.sliding(2).foreach { w =>
      assert(w(0)._2 <= w(1)._2 && w(0)._3 <= w(1)._3)
    }
  }

  test("split leakage: cells partition the pair set; leak rate replays; planted dups leak plausibly") {
    val rows = Dedup.splitLeakage(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    // split replay: md5 of the CANONICAL text, same rule as the op
    def norm(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    def bucket(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100
    }
    def splitOf(text: String): String = {
      val b = bucket(text)
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> norm(r.getString(1)))
    val planted = docs.filter(_._1 % 5 == 0).map { case (id, t) =>
      val tk = t.split(" ")
      (id + 1000000L, tk.take(math.max(1, (tk.length * 0.8).toInt)).mkString(" "))
    }
    val splits = (docs ++ planted).map { case (id, t) => id -> splitOf(t) }.toMap
    val pairs = Dedup.minhash(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val cells = pairs
      .map { case (a, b) =>
        val (sa, sb) = (splits(a), splits(b))
        (Seq(sa, sb).min, Seq(sa, sb).max)
      }
      .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == cells, "cell counts replay")
    val total = cells.values.sum
    val leaked = cells.collect { case ((a, b), n) if a != b => n }.sum
    rows.foreach { case (lo, hi, _, isLeak, nt, nl, rate) =>
      assert(isLeak == (if (lo != hi) 1L else 0L))
      assert(nt == total && nl == leaked && rate == leaked * 1000000L / total)
    }
    // the 80/10/10 content split makes SOME cross-split near-dup pair
    // overwhelmingly likely on this corpus; a zero here means the
    // audit went blind, not that the corpus got lucky
    assert(leaked > 0, "no cross-split near-dup pairs found — audit blind?")
  }

  test("cluster eval: P/R arithmetic pins to the labels; planted recall is high") {
    val row = Dedup.clusterEval(spark, sf).collect().head
    val labels = Dedup.clusters(spark, sf).select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 5 == 0)
      .map(d => (d, d + 1000000L))
    val recovered = planted.count { case (a, b) => labels(a) == labels(b) }.toLong
    assert(row.getAs[Long]("n_planted") == planted.length.toLong)
    assert(row.getAs[Long]("n_recovered") == recovered)
    assert(row.getAs[Long]("recall_e6") == recovered * 1000000L / planted.length)
    val pairsTot = labels.values.groupBy(identity)
      .map { case (_, xs) => xs.size.toLong }.map(sz => sz * (sz - 1) / 2).sum
    assert(row.getAs[Long]("n_cluster_pairs") == pairsTot)
    assert(row.getAs[Long]("precision_e6") == recovered * 1000000L / pairsTot)
    // the banded pipeline should recover MOST 80%-prefix copies
    assert(row.getAs[Long]("recall_e6") > 500000L, "cluster recall collapsed")
  }

  test("source matrix: scala replay from the cluster labels; pair counts conserve") {
    val got = Dedup.sourceMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val srcBase = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // planted copies inherit the base doc's source (shared constants)
    val src = (srcBase ++ srcBase.collect {
      case (d, s) if d % 5 == 0 => (d + 1000000L, s)
    }).toMap
    val labels = Dedup.clusters(spark, sf).select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val cs = labels
      .groupBy { case (d, c) => (c, src(d)) }
      .map { case (k, xs) => k -> xs.length.toLong }
    val want = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    cs.groupBy(_._1._1).foreach { case (_, bySrc) =>
      val counts = bySrc.map { case ((_, s), n) => (s, n) }.toSeq.sortBy(_._1)
      for (i <- counts.indices; j <- i until counts.length) {
        val ((sa, na), (sb, nb)) = (counts(i), counts(j))
        val pairs = if (i == j) na * (na - 1) / 2 else na * nb
        if (i != j || na >= 2) {
          val (c0, p0) = want.getOrElse((sa, sb), (0L, 0L))
          want((sa, sb)) = (c0 + 1, p0 + pairs)
        }
      }
    }
    assert(got == want.toMap)
    // conservation: matrix pair counts partition every within-cluster pair
    val totalPairs = labels.groupBy(_._2)
      .map { case (_, xs) => xs.length.toLong }.map(sz => sz * (sz - 1) / 2).sum
    assert(got.values.map(_._2).sum == totalPairs)
    // the planted copies make at least one diagonal cell non-empty
    assert(got.exists { case ((a, b), (_, p)) => a == b && p > 0 },
      "no within-source duplication found — matrix blind?")
  }

  test("banding advisor: BigInt e6-power replay; pick is the min-area config; curves sane") {
    val got = Dedup.bandingAdvisor(spark)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.keySet == Dedup.BandingConfigs.map { case (b, r) => (b.toLong, r.toLong) }.toSet)
    val step = 1000000L / Dedup.ScurvePoints
    def powE6(x: Long, p: Int): Long = (2 to p).foldLeft(x)((a, _) => a * x / 1000000L)
    val want = Dedup.BandingConfigs.map { case (b, r) =>
      val pts = (0 to Dedup.ScurvePoints).map { i =>
        val s = i * step
        val pb = 1000000L - powE6(s, r)
        (s, 1000000L - powE6(pb, b))
      }
      val pTau = pts.find(_._1 == Dedup.BandingTauE6).get._2
      val fp = pts.collect { case (s, p) if s < Dedup.BandingTauE6 => p * step }.sum / 1000000L
      val fn = pts.collect { case (s, p) if s >= Dedup.BandingTauE6 => (1000000L - p) * step }.sum / 1000000L
      (b.toLong, r.toLong, pTau, fp, fn)
    }
    val bestKey = want.map { case (b, _, _, fp, fn) => (fp + fn) * 64 + b }.min
    want.foreach { case (b, r, pTau, fp, fn) =>
      val g = got((b, r))
      assert(g == ((pTau, fp, fn, fp + fn, if ((fp + fn) * 64 + b == bestKey) 1L else 0L)),
        s"config ($b,$r)")
    }
    // exactly one pick; the production (8,4) config is in the table
    assert(got.values.count(_._5 == 1L) == 1)
    assert(got.contains((8L, 4L)))
  }

  test("FS linkage: estimate-score-decide fold replays over the blocked pairs; planted recall 1.0") {
    // the blocking paths carry their own exactness specs/oracles; this
    // replays the FELLEGI-SUNTER layer end-to-end on the operator's
    // candidate set: fields -> gammas -> hash-drawn u -> init-scored
    // pass -> M-step m -> final ln-odds score -> three-way decision
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val baseDocs = graft.Tables
      .documents(spark, sf)
      .selectExpr("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> norm(r.getString(1)))
    val corpus = (baseDocs ++ baseDocs.collect { case (id, t) if id % 5 == 0 =>
      val tok = t.split(" ")
      (id + 1000000L) -> tok.take(math.max(1, (tok.length * 0.8).floor.toInt)).mkString(" ")
    }).toMap
    val fields = corpus.map { case (id, t) =>
      val tok = t.split(" ", -1)
      id -> Seq[Any](
        t.take(16),
        (tok.length / 8).toLong,
        tok.last,
        tok.take(3).mkString(" "))
    }
    def gamma(a: Long, b: Long): Seq[Long] =
      fields(a).zip(fields(b)).map { case (x, y) => if (x == y) 1L else 0L }
    val nBase = baseDocs.length.toLong
    val uPairs = baseDocs.map { case (id, _) =>
      val draw = hash60(s"fsu:$id") % nBase
      id -> (if (draw == id) (draw + 1) % nBase else draw)
    }
    def smoothed(agrees: Seq[Long], n: Long): Seq[Long] =
      agrees.map(a => (a + 1) * 1000000L / (n + 2))
    val u = smoothed(
      uPairs.toSeq.map { case (a, b) => gamma(a, b) }.transpose.map(_.sum),
      nBase)
    def w(numE6: Long, denE6: Long): Long =
      math.floor(math.log(numE6.toDouble / denE6.toDouble) * 1e6 + 0.5).toLong
    def score(g: Seq[Long], m: Seq[Long]): Long =
      g.lazyZip(m).lazyZip(u).map { (gk, mk, uk) =>
        if (gk == 1L) w(mk, uk) else w(1000000L - mk, 1000000L - uk)
      }.sum
    val got = Dedup
      .fsLinkage(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getString(5)))
    val mInit = Seq.fill(4)(Dedup.FsMInitE6)
    val matches1 = got.map { case (a, b, _, _, _, _) => (a, b) }
      .filter { case (a, b) => score(gamma(a, b), mInit) >= 0 }
    val m = smoothed(
      matches1.toSeq.map { case (a, b) => gamma(a, b) }.transpose.map(_.sum),
      matches1.length.toLong)
    got.foreach { case (a, b, gs, nAgree, scoreE6, decision) =>
      val g = gamma(a, b)
      assert(gs == g.mkString(""), s"gamma mismatch for ($a,$b)")
      assert(nAgree == g.sum)
      val want = score(g, m)
      assert(scoreE6 == want, s"score mismatch for ($a,$b): $scoreE6 vs $want")
      val wantDec =
        if (want >= 0) "match"
        else if (want >= Dedup.FsPossibleFloorE6) "possible_match"
        else "non_match"
      assert(decision == wantDec)
    }
    // §15.4 floors (measured: recall 1.0 at sf0.001/sf0.01; purity
    // 0.637/0.685 — the rest are prefix+head-agreeing blocking
    // survivors, honest non-planted candidates)
    val eval = Dedup
      .fsLinkageEval(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))))
      .toMap
    val (_, _, share, purity) = eval("match")
    assert(share == 1000000L, s"planted recall $share under 1.0 — the linkage lost a planted pair")
    assert(purity >= 600000L, s"match purity $purity under the measured floor")
    assert(eval.values.map(_._1).sum == got.length.toLong)
  }
}
