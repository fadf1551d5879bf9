package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.Dataset

/** JDBC upsert sink: the terminal state of the reference pipeline is a
  * relational current-state table maintained by per-row upserts and
  * tombstone deletes (`simple_kafka_etl.py:128-163`, the
  * `bank_accounts_current` table of `README.md:34-38`). This sink
  * reproduces those semantics Spark-first: `foreachBatch` stages each
  * micro-batch through Spark's distributed JDBC writer, then issues
  * ONE transactional set-based `MERGE` from staging into the target —
  * not a row-at-a-time loop.
  *
  * Scale design: the per-row Python upsert is the reference's
  * bottleneck; here executors write the staging table in parallel
  * (`numPartitions` JDBC connections) and the warehouse applies one
  * MERGE per batch. Latest-(ts, event_id)-wins guards make redelivered
  * or stale micro-batches no-ops — the idempotence the reference gets
  * from its Kafka-offset uniqueness probe.
  *
  * Tested against in-JVM embedded Derby (`jdbc:derby:memory:...`); in
  * production the same URL/props point at Postgres or any MERGE-capable
  * warehouse.
  */
object JdbcUpsertSink {

  val TargetTable = "current_state"
  val StagingTable = "current_state_staging"
  val LedgerTable = "batch_ledger"

  /** Columns of [[CurrentRow]]; quoted lowercase so DDL matches the
    * identifiers Spark's JDBC writer emits. `op` is VARCHAR (not the
    * dialect-default CLOB) because the MERGE compares it; DOUBLE
    * PRECISION is the spelling Derby and Postgres both accept.
    */
  private val columnsDdl =
    """"user_id" BIGINT NOT NULL, "last_event_id" BIGINT, "last_ts" BIGINT,
       "value" DOUBLE PRECISION, "op" VARCHAR(16)"""

  private def withConnection[T](url: String)(f: Connection => T): T = {
    val conn = DriverManager.getConnection(url)
    try f(conn)
    finally conn.close()
  }

  /** Create target + staging tables if missing. Existence is probed
    * through DatabaseMetaData (portable across Derby/Postgres/etc.)
    * rather than by catching a vendor-specific already-exists
    * SQLState.
    */
  def ensureTables(url: String): Unit = withConnection(url) { conn =>
    def exists(table: String): Boolean = {
      // unquoted DDL identifiers fold per-vendor: Derby up, Postgres down
      val rs = conn.getMetaData.getTables(
        null, null, "%", Array("TABLE"))
      try {
        Iterator
          .continually(rs)
          .takeWhile(_.next())
          .exists(_.getString("TABLE_NAME").equalsIgnoreCase(table))
      } finally rs.close()
    }
    def create(ddl: String): Unit = {
      val st = conn.createStatement()
      try st.executeUpdate(ddl)
      finally st.close()
    }
    if (!exists(TargetTable))
      create(s"""CREATE TABLE $TargetTable ($columnsDdl, PRIMARY KEY ("user_id"))""")
    if (!exists(StagingTable))
      create(s"CREATE TABLE $StagingTable ($columnsDdl)")
    if (!exists(LedgerTable))
      create(s"""CREATE TABLE $LedgerTable ("batch_id" BIGINT NOT NULL PRIMARY KEY)""")
  }

  /** The set-based upsert: latest-change-wins, guarded by
    * (last_ts, last_event_id) so a redelivered or out-of-order batch
    * cannot regress the target. One statement, one transaction.
    *
    * DELETEs are SOFT: the tombstone row is kept (op = 'DELETE') and
    * [[readCurrent]] filters it out. A hard DELETE would let a STALE
    * redelivery of an older non-delete state resurrect the key — the
    * NOT MATCHED arm has no timestamp to guard against. Retained
    * tombstones are bounded by the key space and can be purged once
    * older than the redelivery horizon (the same contract as Kafka
    * log compaction's delete retention).
    */
  private val mergeSql: String =
    s"""MERGE INTO $TargetTable t
       USING $StagingTable s ON t."user_id" = s."user_id"
       WHEN MATCHED
            AND (s."last_ts" > t."last_ts"
                 OR (s."last_ts" = t."last_ts" AND s."last_event_id" >= t."last_event_id"))
         THEN UPDATE SET "last_event_id" = s."last_event_id", "last_ts" = s."last_ts",
                         "value" = s."value", "op" = s."op"
       WHEN NOT MATCHED
         THEN INSERT ("user_id", "last_event_id", "last_ts", "value", "op")
              VALUES (s."user_id", s."last_event_id", s."last_ts", s."value", s."op")"""

  /** The live current-state view: tombstoned keys filtered out. */
  def readCurrent(spark: org.apache.spark.sql.SparkSession, url: String):
      org.apache.spark.sql.DataFrame =
    spark.read
      .jdbc(url, TargetTable, new java.util.Properties())
      .filter(org.apache.spark.sql.functions.col("op") =!= "DELETE")

  /** True iff `batchId` is already committed in the ledger — and
    * because the ledger row commits ATOMICALLY with its MERGE, "in the
    * ledger" means "fully applied", never "half applied".
    */
  def isApplied(url: String, batchId: Long): Boolean = withConnection(url) { conn =>
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"""SELECT 1 FROM $LedgerTable WHERE "batch_id" = $batchId""")
      try rs.next()
      finally rs.close()
    } finally st.close()
  }

  /** `foreachBatch` body for a [[CdcStream.currentState]] stream:
    * truncate staging, land the micro-batch through the distributed
    * JDBC writer (one row per key — what `flatMapGroupsWithState`
    * emits), then MERGE into the target transactionally.
    *
    * Exactly-once: the batch id is INSERTed into [[LedgerTable]] in
    * the SAME transaction as the MERGE (the standard
    * transactional-sink ledger — e.g. Structured Streaming's own
    * foreachBatch epoch pattern). A replayed batch id hits the
    * ledger's primary key and the whole apply is skipped — making
    * replay a no-op INDEPENDENT of the (ts, event_id) ordering guard,
    * which remains as defense for cross-batch staleness. The upfront
    * [[isApplied]] probe is a fast path that also skips the staging
    * write; the in-transaction insert is the authoritative guard.
    */
  /** #173 Enriched JDBC sink: the stream-static enrichment join
    * (#164) promoted to the warehouse terminal-state path — each
    * current-state micro-batch is dimension-attached (broadcast left
    * join, stateless, inside `foreachBatch`) and MERGEd into a WIDE
    * current-state table carrying the dimension columns. This is the
    * standard "enrich before sinking" production shape: the warehouse
    * table serves point reads with the dimension already denormalized,
    * no read-time join.
    *
    * Same transactional discipline as [[upsertBatch]]: staging +
    * set-based MERGE + ledger-in-the-same-transaction (its own ledger
    * — the enriched and plain sinks commit independently). A key with
    * no dimension row lands null-enriched — enrichment never drops or
    * delays data (the #164 contract, preserved through the sink).
    */
  val EnrichedTable = "current_state_enriched"
  val EnrichedStaging = "current_state_enriched_staging"
  val EnrichedLedger = "enriched_batch_ledger"

  private val enrichedColumnsDdl =
    s"""$columnsDdl, "c_nationkey" BIGINT, "c_mktsegment" VARCHAR(16)"""

  def ensureEnrichedTables(url: String): Unit = withConnection(url) { conn =>
    def exists(table: String): Boolean = {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      try {
        Iterator
          .continually(rs)
          .takeWhile(_.next())
          .exists(_.getString("TABLE_NAME").equalsIgnoreCase(table))
      } finally rs.close()
    }
    def create(ddl: String): Unit = {
      val st = conn.createStatement()
      try st.executeUpdate(ddl)
      finally st.close()
    }
    if (!exists(EnrichedTable))
      create(s"""CREATE TABLE $EnrichedTable ($enrichedColumnsDdl, PRIMARY KEY ("user_id"))""")
    if (!exists(EnrichedStaging))
      create(s"CREATE TABLE $EnrichedStaging ($enrichedColumnsDdl)")
    if (!exists(EnrichedLedger))
      create(s"""CREATE TABLE $EnrichedLedger ("batch_id" BIGINT NOT NULL PRIMARY KEY)""")
  }

  private val enrichedMergeSql: String =
    s"""MERGE INTO $EnrichedTable t
       USING $EnrichedStaging s ON t."user_id" = s."user_id"
       WHEN MATCHED
            AND (s."last_ts" > t."last_ts"
                 OR (s."last_ts" = t."last_ts" AND s."last_event_id" >= t."last_event_id"))
         THEN UPDATE SET "last_event_id" = s."last_event_id", "last_ts" = s."last_ts",
                         "value" = s."value", "op" = s."op",
                         "c_nationkey" = s."c_nationkey", "c_mktsegment" = s."c_mktsegment"
       WHEN NOT MATCHED
         THEN INSERT ("user_id", "last_event_id", "last_ts", "value", "op",
                      "c_nationkey", "c_mktsegment")
              VALUES (s."user_id", s."last_event_id", s."last_ts", s."value", s."op",
                      s."c_nationkey", s."c_mktsegment")"""

  private def enrichedApplied(url: String, batchId: Long): Boolean =
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT 1 FROM $EnrichedLedger WHERE "batch_id" = $batchId""")
        try rs.next()
        finally rs.close()
      } finally st.close()
    }

  /** The live enriched view: tombstones filtered, dimension attached. */
  def readCurrentEnriched(spark: org.apache.spark.sql.SparkSession, url: String):
      org.apache.spark.sql.DataFrame =
    spark.read
      .jdbc(url, EnrichedTable, new java.util.Properties())
      .filter(org.apache.spark.sql.functions.col("op") =!= "DELETE")

  /** `foreachBatch` body: enrich the micro-batch against the static
    * dimension (broadcast left join — stateless per the #164
    * contract), stage, MERGE, ledger — one transaction.
    */
  def upsertEnrichedBatch(url: String, dim: org.apache.spark.sql.DataFrame)(
      batch: Dataset[CurrentRow],
      batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    ensureEnrichedTables(url)
    if (enrichedApplied(url, batchId)) return
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DELETE FROM $EnrichedStaging")
      finally st.close()
    }
    val enriched = batch
      .toDF()
      .join(
        broadcast(dim.select(
          col("c_custkey").as("user_id"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"))),
        Seq("user_id"),
        "left")
    enriched.write.mode("append").jdbc(url, EnrichedStaging, new java.util.Properties())
    withConnection(url) { conn =>
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        try st.executeUpdate(s"""INSERT INTO $EnrichedLedger ("batch_id") VALUES ($batchId)""")
        catch {
          case e: java.sql.SQLException if e.getSQLState == "23505" =>
            conn.rollback(); return
        }
        st.executeUpdate(enrichedMergeSql)
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    }
  }

  def upsertBatch(url: String)(batch: Dataset[CurrentRow], batchId: Long): Unit = {
    ensureTables(url)
    if (isApplied(url, batchId)) return
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DELETE FROM $StagingTable")
      finally st.close()
    }
    val props = new java.util.Properties()
    batch.write.mode("append").jdbc(url, StagingTable, props)
    withConnection(url) { conn =>
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        // 23505 = unique-violation in both Derby and Postgres
        try st.executeUpdate(s"""INSERT INTO $LedgerTable ("batch_id") VALUES ($batchId)""")
        catch {
          case e: java.sql.SQLException if e.getSQLState == "23505" =>
            // lost the race to a concurrent/earlier apply of this batch
            conn.rollback(); return
        }
        st.executeUpdate(mergeSql)
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    }
  }
}
