package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Similarity

class GraftFunctionsSpec extends SparkSpec {

  test("kernel SQL functions reject wrong arity instead of ignoring args") {
    GraftFunctions.register(spark)
    val df = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").as("v"))
    intercept[AnalysisException] { df.select(expr("cosine_sim(v)")).collect() }
    intercept[AnalysisException] { df.select(expr("cosine_sim(v, v, v)")).collect() }
    intercept[AnalysisException] { df.select(expr("simhash64(v, v)")).collect() }
    intercept[AnalysisException] {
      df.select(expr("intersect_card(v)")).collect()
    }
  }

  test("rp_project kernel is bit-identical to the literal signed-sum expansion") {
    GraftFunctions.register(spark)
    val k = 32
    // the pre-kernel textual form: same left-to-right adds, one divide
    val ys = (0 until k).map { j =>
      val terms = (0 until 64)
        .map(i =>
          s"${if (Similarity.rpSign(i, j) > 0) "+" else "-"} CAST(embedding[$i] AS DOUBLE)")
        .mkString(" ")
      s"(0.0d $terms) / sqrt(CAST($k AS DOUBLE))"
    }
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val both = df.select(
      expr(s"rp_project(embedding, $k)").as("kernel"),
      expr(s"array(${ys.mkString(", ")})").as("literal"))
    // exact double equality, element by element — no tolerance
    assert(both.filter(expr("kernel != literal")).count() == 0)
    assert(both.filter(expr("size(kernel) != 32")).count() == 0)
  }

  test("hash60 kernel equals the composed conv(substr(md5)) form on real and unicode text") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val corpus = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(col("text").as("s"))
      .unionAll(Seq("", " ", "héllo wörld", "日本語テキスト", "a\tb\nc", "🚀 emoji").toDF("s"))
    val checked = corpus.select(
      expr("hash60(s)").as("fast"),
      expr("cast(conv(substring(md5(cast(s as binary)), 1, 15), 16, 10) as bigint)").as("composed"))
    assert(checked.filter(col("fast") =!= col("composed")).count() == 0)
    assert(checked.filter(col("fast") < 0).count() == 0, "hash60 must be nonnegative")
    intercept[AnalysisException] { corpus.select(expr("hash60(s, s)")).collect() }
  }

  test("minhash_sig honors a literal numHashes argument") {
    GraftFunctions.register(spark)
    val df = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(expr("transform(split(text, ' '), t -> xxhash64(t))").as("hs"))
      .limit(5)
    val sizes = df
      .select(size(expr("minhash_sig(hs)")).as("d"), size(expr("minhash_sig(hs, 64)")).as("w"))
      .collect()
    sizes.foreach { r =>
      assert(r.getInt(0) == 32, "default signature width")
      assert(r.getInt(1) == 64, "explicit numHashes width")
    }
  }

  test("quantize maps a zero-norm embedding to all-zero qvec, not NaN/null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-quant").toString
    Seq(
      (1L, Array.fill(64)(0.0f), 0),
      (2L, Array.tabulate(64)(i => 0.1f * (i + 1)), 1))
      .toDF("vec_id", "embedding", "label")
      .write
      .mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val rows = Similarity
      .quantize(spark, dir)
      .orderBy("vec_id")
      .collect()
    val zero = rows(0)
    assert(zero.getDouble(zero.fieldIndex("l2_norm")) == 0.0)
    assert(zero.getSeq[Int](zero.fieldIndex("qvec")).forall(_ == 0))
    val nonZero = rows(1)
    assert(nonZero.getSeq[Int](nonZero.fieldIndex("qvec")).exists(_ != 0))
  }
}
