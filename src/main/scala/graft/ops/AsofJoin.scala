package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row is matched with the latest right row at or
  * before its timestamp, per key — the canonical time-series enrichment
  * (quote-at-trade, latest-bar-at-event). Spark has no native ASOF JOIN;
  * the scalable composition is:
  *
  *   tag both sides -> union -> ONE hash exchange on the key ->
  *   in-partition sort by (ts, side) -> carry the last right value
  *   forward (`last(col, ignoreNulls)` over unbounded-preceding rows)
  *   -> keep left rows.
  *
  * Cost: a single shuffle of left+right (same as any keyed join) and a
  * streaming window pass — never the range cross-product a naive
  * `l.ts >= r.ts` join explodes into. Right rows sort BEFORE left rows
  * at equal timestamps, so a right row exactly at the left timestamp is
  * matched (inclusive as-of, like DuckDB/kdb). The right side must be
  * unique per (key, ts) for deterministic output — pre-aggregate if not.
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry onto left rows. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedRight = right.select(
      (col(key) +: col(rightTs).as("_ts") +: lit(0).as("_side") +:
        valueCols.map(c => col(c).as(s"_r_$c"))) ++
        leftCols.filterNot(c => c == key).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).as("_ts") +: lit(1).as("_side") +:
        valueCols.map(c => lit(null).as(s"_r_$c"))) ++
        leftCols.filterNot(c => c == key).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"_r_$c").as(s"asof_$c")): _*)
  }
}
