package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Hilbert walk's defining properties, proven cell-by-cell over
  * the FULL 256×256 grid (65,536 cells — cheap): the map is a
  * bijection onto 0..65535, and every consecutive pair of curve
  * positions is Manhattan-ADJACENT (|Δx|+|Δy| = 1) — the locality
  * property Morton lacks (its bit-boundary jumps are why Hilbert
  * file extents prune better in `curveCompare`).
  */
class CurveSpec extends SparkSpec {

  private def grid = {
    val n = 256
    spark
      .range(n.toLong * n)
      .select((col("id") / n).cast("long").as("x"), (col("id") % n).cast("long").as("y"))
      .withColumn("d", Scale.hilbert(col("x"), col("y")))
  }

  test("hilbert d is a bijection onto 0..65535") {
    val g = grid.cache()
    assert(g.agg(countDistinct("d")).head.getLong(0) == 65536L)
    assert(g.agg(min("d"), max("d")).head() match {
      case r => r.getLong(0) == 0L && r.getLong(1) == 65535L
    })
    g.unpersist()
  }

  test("consecutive curve positions are Manhattan-adjacent everywhere") {
    val g = grid.cache()
    val bad = g.alias("a")
      .join(g.alias("b"), expr("a.d + 1 = b.d"))
      .filter(expr("abs(a.x - b.x) + abs(a.y - b.y) <> 1"))
    assert(bad.isEmpty, "a non-unit step would mean the walk is not a Hilbert curve")
    g.unpersist()
  }

  test("morton takes long jumps where hilbert does not (the pruning rationale)") {
    val m = grid
      .withColumn("d", Scale.morton(col("x"), col("y")))
      .cache()
    val jumps = m.alias("a")
      .join(m.alias("b"), expr("a.d + 1 = b.d"))
      .filter(expr("abs(a.x - b.x) + abs(a.y - b.y) > 1"))
      .count()
    assert(jumps > 0, "Morton must exhibit non-adjacent steps for the comparison to mean anything")
    m.unpersist()
  }
}
