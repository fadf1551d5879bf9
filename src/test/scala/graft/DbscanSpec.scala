package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** LSH-DBSCAN contract over the planted-density corpus: roles
  * partition the corpus; every border attaches to a real core's
  * cluster; labels are min-id canonical; and the planted structure is
  * recovered — family bases become cores with their two anti-jittered
  * copies as borders, sub-threshold pairs and singletons become noise
  * (small tolerance: LSH candidate recall, not clustering logic, is
  * the only probabilistic step).
  */
class DbscanSpec extends SparkSpec {

  test("roles partition; borders attach to cores; planted structure recovered") {
    val out = Similarity.dbscan(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    val nFam = Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 0).count()
    val nPair = Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 5).count()

    // exactly one role per corpus row
    assert(out.count() == n + 2 * nFam + nPair)
    assert(out.select("vec_id").distinct().count() == out.count())

    val cores = out.filter(col("role") === "core").cache()
    val borders = out.filter(col("role") === "border").cache()
    val noise = out.filter(col("role") === "noise")

    // every border's cluster is some core's cluster; core labels are
    // min-id canonical (label <= vec_id)
    assert(
      borders
        .join(cores.select(col("cluster_id")).distinct(), Seq("cluster_id"), "left_anti")
        .count() == 0)
    assert(cores.filter(col("cluster_id") > col("vec_id")).count() == 0)
    // noise carries the sentinel label and degree < minPts or no core neighbor
    assert(noise.filter(col("cluster_id") =!= -1L).count() == 0)

    // planted recovery (>= 90%: LSH recall is the only slack): family
    // bases core, their copies borders labeled by the base, pair
    // members noise
    val famCores = cores.filter(col("vec_id") % 10 === 0 && col("vec_id") < 1000000L)
    assert(famCores.count() >= (nFam * 9) / 10, s"family cores ${famCores.count()} of $nFam")
    val copyBorders = borders.filter(
      (col("vec_id") >= 1000000L && col("vec_id") < 3000000L) &&
        col("cluster_id") === pmod(col("vec_id"), lit(1000000L)))
    assert(copyBorders.count() >= (2 * nFam * 9) / 10,
      s"copy borders ${copyBorders.count()} of ${2 * nFam}")
    val pairNoise = noise.filter(col("vec_id") >= 3000000L).count()
    assert(pairNoise >= (nPair * 9) / 10, s"pair noise $pairNoise of $nPair")

    // deterministic end to end
    val again = Similarity.dbscan(spark, sf)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("triplet mining: planted pos/neg recovered per anchor, bands respected") {
    val t = Similarity.tripletMine(spark, sf).cache()
    val nFam = Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 0).count()
    // >= 90% of families yield a complete (anchor, pos, neg) triple
    // (LSH recall is the only slack, replayed identically by the oracle)
    assert(t.count() >= (nFam * 9) / 10, s"${t.count()} of $nFam families")
    // the planted structure is what gets mined: pos = the tight copy,
    // neg = the moderate copy, for every emitted anchor
    assert(t.filter(col("pos_id") =!= col("anchor_id") + 1000000L).count() == 0)
    assert(t.filter(col("neg_id") =!= col("anchor_id") + 2000000L).count() == 0)
    // band contracts
    assert(t.filter(col("cos_pos") < 0.998).count() == 0)
    assert(t.filter(col("cos_neg") >= 0.998 || col("cos_neg") < 0.97).count() == 0)
    // hard negative is genuinely harder than random: far above the
    // max natural cross-pair cosine (~0.39)
    assert(t.agg(min("cos_neg")).head.getDouble(0) > 0.9)
  }
}
