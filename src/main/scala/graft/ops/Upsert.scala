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

  /** L2: OVERWRITE — the target's new contents are exactly `incoming`
    * (reference: connectors/postgresql.py:75-77, drop-and-recreate,
    * tested at test_postgresql.py:86-108). As a set operator this is the
    * identity on `incoming`; at the storage layer it is
    * `SaveMode.Overwrite` (all-partition replace) — see UpsertSpec for
    * the storage-level semantics test. */
  def overwrite(existing: DataFrame, incoming: DataFrame): DataFrame =
    incoming

  /** L3: upsert: rows from `incoming` replace same-key rows in `existing`.
    * Key = PK columns; priority column is synthesized internally.
    *
    * Determinism: after source priority, ties (duplicate PK rows within
    * one side) are broken by the full non-key row value (struct compare,
    * descending), never by physical row order — so the output is a pure
    * function of the input *sets*, stable across partitionings and
    * re-runs. (The reference's ON CONFLICT applies rows in statement
    * order; DataFrames have no statement order to inherit.)
    *
    * NULL keys NEVER conflict — exactly Postgres's unique-index
    * semantics (the reference's ON CONFLICT backs onto one): a window
    * partition would group null=null and silently collapse distinct
    * null-key rows, so those rows bypass the dedup and are all kept.
    * Consequently idempotent re-application holds for non-null-key rows
    * only, as it does in Postgres. */
  def upsert(existing: DataFrame, incoming: DataFrame,
             keys: Seq[String]): DataFrame = {
    val cols = existing.columns.toSeq
    Reserved.requireAbsent(existing, "upsert", Seq("_src", "_rn"))
    // the tie-break struct can only carry ORDERABLE columns — a map
    // column in it fails the window's orderBy at analysis, breaking
    // upsert for the whole table even though maps are never keys.
    // Excluded columns weaken determinism only for same-PK duplicate
    // rows that differ SOLELY in unorderable columns (documented).
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(dt)
    val rest = cols.filterNot(keys.contains)
      .filter(c => orderable(existing.schema(c).dataType))
    val unioned = existing.withColumn("_src", lit(0))
      .unionByName(incoming.select(cols.map(col): _*).withColumn("_src", lit(1)))
    val anyNullKey = keys.map(col(_).isNull).reduce(_ || _)
    val tie = if (rest.nonEmpty) Seq(struct(rest.map(col): _*).desc) else Nil
    // Null-key rows all share ONE window partition (null=null grouping):
    // at scale, a null-heavy batch would funnel into a single sorted
    // task — so they carry a deterministic content-hash salt that
    // spreads them across the exchange. Their rank is computed within a
    // salt bucket (garbage, but the bypass predicate never consults
    // it); non-null rows get salt 0, i.e. unchanged PK semantics.
    val nullSalt = when(anyNullKey,
      pmod(xxhash64(cols.map(col): _*), lit(1024L))).otherwise(lit(0L))
    val w = Window.partitionBy(keys.map(col) :+ nullSalt: _*)
      .orderBy(col("_src").desc +: tie: _*)
    // One pass over `unioned` (a two-branch union of the input scans
    // would execute both scans twice): every row flows through the one
    // PK exchange, and the null-key bypass predicate keeps ALL rows of
    // a null-key window partition — their _rn is computed but never
    // consulted, so the null=null grouping cannot collapse them.
    unioned
      .withColumn("_rn", row_number().over(w))
      .filter(anyNullKey || col("_rn") === 1)
      .select(cols.map(col): _*)
  }
}
