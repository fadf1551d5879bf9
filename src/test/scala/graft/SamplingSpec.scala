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
}
