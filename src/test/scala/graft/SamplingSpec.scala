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
}
