package graft.io

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The relational serving-store connector (reference:
  * etl_project/connectors/postgresql.py:58-91): select-all scan plus the
  * insert / overwrite / upsert load dispatch the pipeline publishes its
  * final analysis through. The parquet lake is the engine's primary
  * storage; this is the LAST-HOP sink to an operational database — and
  * the Spark-first shape is `spark.read/write.jdbc`, not a driver-side
  * row loop: reads partition across executors, writes batch per
  * partition.
  *
  * Semantics mirrored from the reference, one per method:
  *  - `selectAll` == `select_all` (postgresql.py:74-75);
  *  - `insert` == `insert` (:81-84) — appends, creating the table on
  *    first write;
  *  - `overwrite` == `overwrite` (:86-88) — drop-and-recreate, NOT
  *    truncate: the new frame's schema wins;
  *  - `upsert` == `upsert` (:90-103, ON CONFLICT DO UPDATE): per-PK
  *    last-writer-wins merge, composed from [[graft.ops.Upsert.upsert]]
  *    so the null-key and tie-break contracts match the lake operator.
  *
  * Scale notes: the upsert reads the current table, merges in Spark,
  * and overwrites — the right shape for the reference's use case (a
  * bounded serving table refreshed per run) and O(table) otherwise; for
  * a large mutable target, stage the batch to a temp table and issue
  * the database's native MERGE instead. Partitioned reads
  * ([[selectAllPartitioned]]) keep extraction parallel; plain
  * `selectAll` is a single-connection stream by JDBC's nature.
  */
final class JdbcClient(url: String, user: Option[String] = None,
                       password: Option[String] = None) {

  private def props: Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p
  }

  def selectAll(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Parallel extraction: `numPartitions` concurrent range-scans over
    * `partCol` — the scan every >1-executor read should use. */
  def selectAllPartitioned(spark: SparkSession, table: String,
                           partCol: String, lower: Long, upper: Long,
                           numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, props)

  def insert(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  def overwrite(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** Per-PK merge, batch winning conflicts. The merged frame is
    * materialized BEFORE the swap — it lazily reads the table whose
    * rows are about to be replaced.
    *
    * Crash safety: the merged rows land in a STAGING table first, then
    * replace the target's rows inside one transaction (DELETE +
    * INSERT ... SELECT, committed atomically). A drop-and-recreate
    * overwrite here would open a window where the target does not
    * exist at all — a crash inside it would lose every previously
    * served row, and a retry would silently mask the loss by taking
    * the table-absent insert branch. With the transactional swap a
    * crash at any point leaves either the old rows or the new rows,
    * never neither, and readers never see an absent table. */
  def upsert(spark: SparkSession, df: DataFrame, table: String,
             keys: Seq[String]): Unit =
    if (!tableExists(table)) insert(df, table)
    else {
      val existing = selectAll(spark, table)
      // align the batch to the table's column order so the unionByName
      // inside the merge and the staged table keep a stable layout
      // (INSERT ... SELECT below is positional)
      val merged = graft.ops.Upsert
        .upsert(existing, df.select(existing.columns.map(df.col).toSeq: _*), keys)
        .localCheckpoint(true)
      val stage = table + "_graft_stage"
      dropTable(stage) // residue from a crashed previous upsert
      merged.write.mode(SaveMode.Overwrite).jdbc(url, stage, props)
      val conn = DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        try {
          st.executeUpdate(s"DELETE FROM $table")
          st.executeUpdate(s"INSERT INTO $table SELECT * FROM $stage")
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally st.close()
      } finally conn.close()
      dropTable(stage)
    }

  /** Dialect-portable existence probe (`select 1 where 1=0` against the
    * table), the same trick Spark's own JdbcUtils uses — information
    * schema layouts differ per database, failed probes don't. */
  def tableExists(table: String): Boolean = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); true }
      catch { case _: java.sql.SQLException => false }
      finally st.close()
    } finally conn.close()
  }

  /** drop-if-exists (postgresql.py:78-79) — probe first: not every
    * dialect (Derby among them) supports `DROP TABLE IF EXISTS`. */
  def dropTable(table: String): Unit =
    if (tableExists(table)) {
      val conn = DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        try { st.executeUpdate(s"DROP TABLE $table"); () }
        finally st.close()
      } finally conn.close()
    }
}
