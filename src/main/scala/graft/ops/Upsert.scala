package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Load semantics: insert / overwrite / upsert
  * (reference: etl_project/connectors/postgresql.py:70-91).
  *
  * The reference's upsert is a row-at-a-time Postgres
  * `INSERT .. ON CONFLICT (stock, timestamp) DO UPDATE`; the set-oriented
  * Spark equivalent is union + newest-wins dedup keyed on the PK. "Newest"
  * is pinned by an explicit source-priority column, never row order
  * (SURVEY §7.4) — at 100 TB the dedup is one hash exchange on the PK,
  * and applying the same batch twice is idempotent (the invariant the
  * reference's overlapping incremental re-extract relies on,
  * reference: etl_project/pipelines/stock_bars.py:47-57).
  */
object Upsert {

  /** L1: INSERT == append == unionByName. */
  def insert(existing: DataFrame, incoming: DataFrame): DataFrame =
    existing.unionByName(incoming)

  /** L3: upsert: rows from `incoming` replace same-key rows in `existing`.
    * Key = PK columns; priority column is synthesized internally. */
  def upsert(existing: DataFrame, incoming: DataFrame,
             keys: Seq[String]): DataFrame = {
    val cols = existing.columns.toSeq
    val unioned = existing.withColumn("_src", lit(0))
      .unionByName(incoming.select(cols.map(col): _*).withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_src").desc)
    unioned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(cols.map(col): _*)
  }
}
