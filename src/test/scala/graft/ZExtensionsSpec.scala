package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Session-extension test: kernels must be callable from plain
  * spark.sql in a session configured with GraftExtensions, with no
  * manual registry call. (Named Z* so the session swap happens after
  * the shared-session suites; it restores an active default session
  * on exit either way.)
  */
class ZExtensionsSpec extends AnyFunSuite {

  test("extensions session exposes cosine_sim/simhash64/minhash_sig to spark.sql") {
    SparkSession.getActiveSession.foreach(_.stop())
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val cos = spark
        .sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
        .head
        .getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      // single all-ones feature: every bit votes +1 → sig = -1
      val sh = spark
        .sql("SELECT simhash64(array(CAST(-1 AS BIGINT))) AS s")
        .head
        .getLong(0)
      assert(sh == -1L)
      val sig = spark
        .sql("SELECT size(minhash_sig(array(CAST(1 AS BIGINT)))) AS n")
        .head
        .getInt(0)
      assert(sig == 32)
      // hash60('hello') = 0x5d41402abc4b2a7 (first 15 md5 hex digits)
      val h = spark.sql("SELECT hash60('hello') AS h").head.getLong(0)
      assert(h == 419982666956583591L)
      // the round-4 kernels are injected too
      val rp = spark
        .sql("SELECT size(rp_project(array(CAST(1.0 AS FLOAT)), 8)) AS n")
        .head
        .getInt(0)
      assert(rp == 8)
      val lb = spark
        .sql("SELECT lsh_bucket(array(CAST(0.5 AS FLOAT)), 0, 4) AS b")
        .head
        .getLong(0)
      // matches the operator-side definition exactly
      val expect = (0 until 4).foldLeft(0L) { (acc, p) =>
        val dot = graft.functions.LshBucket.sign(0, p, 0).toLong *
          math.floor(0.5f.toDouble * 1000000.0).toLong
        if (dot > 0L) acc | (1L << p) else acc
      }
      assert(lb == expect)
      assert(spark.sql("SELECT intersect_card(array(1L,2L), array(2L,3L)) AS c")
        .head.getInt(0) == 1)
      assert(spark.sql("SELECT union_card(array(1L,2L), array(2L,3L)) AS c")
        .head.getInt(0) == 3)
      assert(spark.sql(
        "SELECT simhash64w(array(CAST(-1 AS BIGINT)), array(CAST(2.0 AS DOUBLE))) AS s")
        .head.getLong(0) == -1L)
    } finally {
      spark.stop()
      GraftSession.local(4) // restore an active default for any later suite
    }
  }
}
