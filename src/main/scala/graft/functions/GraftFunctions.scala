package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers graft's native Catalyst expressions as SQL functions so
  * operators can use them via `expr("cosine_sim(a, b)")` — the stable
  * way to lift a catalyst Expression into the Column API across Spark
  * versions (Column-from-Expression constructors are internal in 4.x).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteSetCardinality)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteSetCardinality
    }
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim",
      args => CosineSim(args.head, args(1)),
      "built-in")
    reg.createOrReplaceTempFunction("simhash64", args => SimHash64(args.head), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig",
      args => MinHashSig(args.head, 32),
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64w",
      args => SimHash64Weighted(args.head, args(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "intersect_card",
      args => IntersectCard(args.head, args(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "union_card",
      args => UnionCard(args.head, args(1)),
      "built-in")
  }
}
