package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** The SQL façade contract: after `GraftSession.registerWarehouse`,
  * the reference's own psql queries (`README.md:106-108`,
  * `test-etl-pipeline.sh:244-260`) run VERBATIM through
  * `GraftSession.sql` and agree with the DataFrame operators they
  * shadow.
  */
class GraftSqlSpec extends SparkSpec {

  test("the reference's three psql queries run verbatim and agree with the operators") {
    GraftSession.registerWarehouse(spark, sf)

    // README.md:106 — history tail, newest first
    val q1 = GraftSession
      .sql(spark, "SELECT * FROM bank_accounts_history ORDER BY change_timestamp DESC LIMIT 10")
      .collect()
    assert(q1.length == 10)
    // compare MULTISETS of the ordering key at the view's own (µs)
    // resolution: boundary ties then can't flake the comparison —
    // any valid top-10 has the same key multiset
    val newest = Cdc
      .history(spark, sf)
      .select(expr("ts div 1000").as("us"))
      .orderBy(col("us").desc)
      .limit(10)
      .collect()
      .map(_.getLong(0))
      .sorted
      .toSeq
    val got = q1.map { r =>
      val t = r.getAs[java.sql.Timestamp]("change_timestamp")
      t.getTime * 1000 + t.getNanos / 1000 % 1000
    }.sorted.toSeq
    assert(got == newest)

    // README.md:107 — current state ordered by key
    val q2 = GraftSession
      .sql(spark, "SELECT * FROM bank_accounts_current ORDER BY original_id")
      .collect()
    val cur = Cdc.current(spark, sf).orderBy("user_id").collect()
    assert(q2.length == cur.length)
    assert(q2.map(_.getAs[Long]("original_id")).toSeq == cur.map(_.getAs[Long]("user_id")).toSeq)
    assert(
      q2.map(r => (r.getAs[Long]("original_id"), r.getAs[Double]("account"))).toSeq ==
        cur.map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSeq)

    // README.md:108 — per-user stats table
    val q3 = GraftSession.sql(spark, "SELECT * FROM user_account_stats").collect()
    assert(q3.length == Cdc.stats(spark, sf).count())

    // test-etl-pipeline.sh:255/259 — the summary counts
    val histCount = GraftSession
      .sql(spark, "SELECT COUNT(*) FROM bank_accounts_history")
      .head()
      .getLong(0)
    assert(histCount == Cdc.history(spark, sf).count())
    val curCount = GraftSession
      .sql(spark, "SELECT COUNT(*) FROM bank_accounts_current")
      .head()
      .getLong(0)
    assert(curCount == Cdc.current(spark, sf).count())

    // the star schema is queryable through the same façade
    val joined = GraftSession
      .sql(spark,
        """SELECT r_name, count(*) AS n
           FROM region JOIN nation ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name""")
      .collect()
    assert(joined.length == 5 && joined.map(_.getLong(1)).sum == 25)
  }
}
