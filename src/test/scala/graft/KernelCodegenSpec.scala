package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Round-2 regression for the codegen name-collision bug: with
  * non-nullable inputs `nullSafeCodeGen` inlines the kernel body with no
  * brace scope, so two instances of a kernel fused into one whole-stage
  * projection redefine the same Java locals unless every local is
  * `ctx.freshName`'d. With `spark.sql.codegen.fallback=false` the janino
  * `Redefinition of local variable` error is FATAL instead of a silent
  * interpreted fallback — these tests fail loudly on regression.
  */
class KernelCodegenSpec extends SparkSpec {

  // Array builders made of codegen'd expressions ONLY (CreateArray +
  // XxHash64 + arithmetic). `transform(...)` would NOT do here: higher-
  // order functions are CodegenFallback, and after ProjectCollapse they
  // knock the entire fused projection out of whole-stage codegen.
  private def longArr(seed: Int, len: Int): Column =
    array((0 until len).map(k => xxhash64(pmod(col("i") + lit(k * seed), lit(12)))): _*)
  private def dblArr(len: Int): Column =
    array((0 until len).map(k => lit(1.0) + (col("i") % lit(k + 2)).cast("double")): _*)
  private def fltArr(scale: Double, len: Int): Column =
    array((1 to len).map(j => (col("i") * scale + lit(j)).cast("float")): _*)

  private def withStrictCodegen[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("two instances of every kernel fuse into one codegen'd projection") {
    GraftFunctions.register(spark)
    withStrictCodegen {
      // parquet-backed source: a local Seq would be constant-folded into a
      // LocalTableScan by ConvertToLocalRelation and never reach codegen
      val df = spark.read
        .parquet(s"$sf/documents.parquet")
        .select((expr("abs(hash(doc_id))") % 97).as("i"))
        .limit(50)
        // null-free long arrays (kernel input contract) + float vectors
        .withColumn("a", longArr(1, 10))
        .withColumn("b", longArr(3, 12))
        .withColumn("w", dblArr(10))
        .withColumn("v1", fltArr(0.5, 8))
        .withColumn("v2", fltArr(-0.25, 8))
      // every kernel twice in ONE projection: this is the exact shape that
      // failed janino compilation in round 1 (fixed locals i/j/n/mins/dot...)
      val fused = df.select(
        expr("intersect_card(a, b)").as("ic1"),
        expr("intersect_card(b, a)").as("ic2"),
        expr("union_card(a, b)").as("uc1"),
        expr("union_card(b, a)").as("uc2"),
        expr("cosine_sim(v1, v2)").as("cs1"),
        expr("cosine_sim(v2, v1)").as("cs2"),
        expr("simhash64(a)").as("sh1"),
        expr("simhash64(b)").as("sh2"),
        expr("simhash64w(a, w)").as("sw1"),
        expr("simhash64w(b, w)").as("sw2"),
        expr("minhash_sig(a)").as("mh1"),
        expr("minhash_sig(b)").as("mh2"),
        expr("rp_project(v1, 4)").as("rp1"),
        expr("rp_project(v2, 4)").as("rp2"))
      // the projection must actually be whole-stage codegen'd, otherwise
      // this test proves nothing
      val wholeStage = fused.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(
        wholeStage.nonEmpty,
        s"not codegen'd:\n${fused.queryExecution.executedPlan}")
      val rows = fused.collect()
      assert(rows.length == 50)
      // symmetric kernels agree across their two fused instances
      rows.foreach { r =>
        assert(r.getInt(0) == r.getInt(1), "intersect_card not symmetric")
        assert(r.getInt(2) == r.getInt(3), "union_card not symmetric")
        assert(math.abs(r.getDouble(4) - r.getDouble(5)) < 1e-12, "cosine_sim not symmetric")
      }
    }
  }

  test("codegen'd kernel values match interpreted eval") {
    GraftFunctions.register(spark)
    // orderBy makes the two collect()s row-aligned for the zip compare
    val df = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), (expr("abs(hash(doc_id))") % 97).as("i"))
      .orderBy("doc_id")
      .limit(50)
      .withColumn("a", longArr(1, 10))
      .withColumn("v1", fltArr(0.5, 8))
      .withColumn("v2", fltArr(-0.25, 8))
      .select(
        expr("minhash_sig(a)").as("mh"),
        expr("simhash64(a)").as("sh"),
        expr("cosine_sim(v1, v2)").as("cs"))
    val codegen = withStrictCodegen { df.collect() }
    val prevWs = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try df.collect()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prevWs)
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    codegen.zip(interpreted).foreach { case (c, it) =>
      assert(c.getSeq[Long](0) == it.getSeq[Long](0), "minhash_sig codegen != eval")
      assert(c.getLong(1) == it.getLong(1), "simhash64 codegen != eval")
      assert(math.abs(c.getDouble(2) - it.getDouble(2)) < 1e-12, "cosine_sim codegen != eval")
    }
  }
}
