package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSim, Hash60, MinHashSig, RewriteSetCardinality, SimHash64}

/** SparkSessionExtensions entry point: makes graft's native kernels
  * first-class SQL functions in any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) — no per-session
  * registry call needed, and the functions are visible to plain
  * `spark.sql(...)` users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteSetCardinality)
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
        args => CosineSim(args.head, args(1))))
    ext.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        args => SimHash64(args.head)))
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        args => MinHashSig(args.head, 32)))
    ext.injectFunction(
      (
        FunctionIdentifier("hash60"),
        new ExpressionInfo(classOf[Hash60].getName, "hash60"),
        args => Hash60(args.head)))
  }
}
