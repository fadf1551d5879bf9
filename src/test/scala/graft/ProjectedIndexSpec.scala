package graft

import graft.operators.Similarity

/** The bandwidth contract of the materialized projected index: the
  * coarse stage must scan ONLY (vec_id, pvec) from the index table —
  * k/64 of the corpus bytes — with the 64-dim vectors read solely for
  * the per-query survivors. And materializing must change nothing:
  * the indexed search returns row-for-row the inline variant's result.
  */
class ProjectedIndexSpec extends SparkSpec {

  private val path = "/tmp/graft_pindex_spec"

  test("index holds only vec_id + pvec; coarse scan never touches the full vectors") {
    Similarity.buildProjectedIndex(spark, sf, path)
    assert(spark.read.parquet(path).columns.toSet == Set("vec_id", "pvec"))
    val df = Similarity.projectSearchIndexed(spark, sf, path)
    val plan = df.queryExecution.executedPlan.toString
    val indexScan = plan.linesIterator.filter(_.contains("graft_pindex_spec")).mkString("\n")
    assert(indexScan.nonEmpty, s"no scan of the index table in:\n$plan")
    assert(indexScan.contains("pvec"))
    assert(
      !indexScan.contains("embedding"),
      s"coarse stage reads full vectors from the index:\n$indexScan")
  }

  test("indexed search is bit-identical to the inline two-stage search") {
    Similarity.buildProjectedIndex(spark, sf, path)
    val indexed = Similarity.projectSearchIndexed(spark, sf, path)
    val inline = Similarity.projectSearch(spark, sf)
    assert(indexed.exceptAll(inline).count() == 0)
    assert(inline.exceptAll(indexed).count() == 0)
  }

  test("recall@10 vs brute force is unchanged by materialization") {
    Similarity.buildProjectedIndex(spark, sf, path)
    val r = recallAt10(Similarity.projectSearchIndexed(spark, sf, path))
    assert(r >= 0.8, s"recall@10 $r")
  }
}
