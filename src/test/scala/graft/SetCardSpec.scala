package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Dedup

class SetCardSpec extends SparkSpec {

  test("rewrite rule fires on the jaccard plan and preserves results") {
    GraftFunctions.register(spark)
    val j = Dedup.jaccardVerify(spark, sf)
    val optimized = j.queryExecution.optimizedPlan.toString
    assert(
      optimized.contains("intersect_card") && optimized.contains("union_card"),
      s"rule did not fire:\n${optimized.take(2000)}")
  }

  test("intersect/union cardinality kernels equal the size(array_*) baselines") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // sequence+xxhash64 yields null-free array<bigint>; mod keeps overlap
    val df = (1 to 200)
      .toDF("i")
      .withColumn("a", expr("transform(sequence(1, 20 + i % 13), j -> xxhash64(j % 25))"))
      .withColumn("b", expr("transform(sequence(1, 25 + i % 7), j -> xxhash64((j + i) % 25))"))
    val checked = df.select(
      expr("size(array_intersect(a, b))").as("si"),
      expr("intersect_card(a, b)").as("ic"),
      expr("size(array_union(a, b))").as("su"),
      expr("union_card(a, b)").as("uc"))
    assert(checked.filter(col("si") =!= col("ic")).count() == 0)
    assert(checked.filter(col("su") =!= col("uc")).count() == 0)
  }
}
