package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Farthest-point traversal invariants: coverage radii are
  * non-increasing (each added center can only shrink max min-dist),
  * centers are distinct, and the reported final radius IS the true
  * corpus coverage radius (independently recomputed brute-force).
  */
class CoresetSpec extends SparkSpec {

  test("k-center coreset: monotone radii, distinct centers, radius verified") {
    graft.functions.GraftFunctions.register(spark)
    val out = Similarity.kCenterCoreset(spark, sf).orderBy("round").collect()
    assert(out.length == 8)
    val radii = out.map(_.getAs[Long]("radius_e6"))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a }, "radii must be non-increasing")
    val centers = out.map(_.getAs[Long]("vec_id"))
    assert(centers.distinct.length == centers.length, "greedy must never re-pick a center")

    // independent brute-force recompute of the final coverage radius
    val e = graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id").isin(centers: _*))
      .select(col("embedding").as("c_emb"))
    val trueRadius = e
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        expr("1000000L - CAST(floor(cosine_sim(embedding, c_emb) * 1000000.0 + 0.5) AS BIGINT)")
          .as("d"))
      .groupBy("vec_id")
      .agg(min("d").as("mind"))
      .agg(max("mind"))
      .head()
      .getLong(0)
    assert(trueRadius == radii.last, s"reported ${radii.last} vs recomputed $trueRadius")
  }
}
