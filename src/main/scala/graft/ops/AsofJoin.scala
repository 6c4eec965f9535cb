package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row is matched with the nearest right row per
  * key — the canonical time-series enrichment (quote-at-trade,
  * latest-bar-at-event). Spark has no native ASOF JOIN; the scalable
  * composition is:
  *
  *   tag both sides -> union -> ONE hash exchange on the key ->
  *   in-partition sort by (ts, side) -> carry the adjacent right value
  *   across (`last`/`first` with ignoreNulls over a one-sided row
  *   frame) -> keep left rows.
  *
  * Cost: a single shuffle of left+right (same as any keyed join) and a
  * streaming window pass — never the range cross-product a naive
  * `l.ts >= r.ts` join explodes into. All three pandas `merge_asof`
  * directions are supported, inclusive like DuckDB/kdb:
  *
  *  - `backward` (default): latest right row at or before the left ts
  *    (right rows sort before left at equal ts, so exact hits match);
  *  - `forward`: earliest right row at or after the left ts;
  *  - `nearest`: whichever of the two is closer in time, backward
  *    winning ties (pandas semantics). Both carries ride the SAME
  *    exchange and sort — two window frames, one shuffle.
  *
  * The right side must be unique per (key, ts) for deterministic
  * output — pre-aggregate if not.
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry onto left rows
    * @param direction "backward" | "forward" | "nearest" */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String],
               direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction: $direction")
    val leftCols = left.columns.toSeq
    // at equal ts the right row must fall INSIDE the left row's one-sided
    // frame: before it for backward/nearest, after it for forward.
    // (nearest's forward frame misses the equal-ts right row, but the
    // backward carry matches it at distance 0, which wins every tie.)
    val (rightSide, leftSide) = if (direction == "forward") (1, 0) else (0, 1)
    val carryCols = rightTs +: valueCols
    val taggedRight = right.select(
      (col(key) +: col(rightTs).as("_ts") +: lit(rightSide).as("_side") +:
        carryCols.map(c => col(c).as(s"_r_$c"))) ++
        leftCols.filterNot(c => c == key).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).as("_ts") +: lit(leftSide).as("_side") +:
        carryCols.map(c => lit(null).as(s"_r_$c"))) ++
        leftCols.filterNot(c => c == key).map(col): _*)
    val ordered = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"))
    val bwd = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = taggedRight.unionByName(taggedLeft)

    val carried = direction match {
      case "backward" => carryCols.foldLeft(unioned) { (df, c) =>
        df.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(bwd)) }
      case "forward" => carryCols.foldLeft(unioned) { (df, c) =>
        df.withColumn(s"_r_$c", first(col(s"_r_$c"), ignoreNulls = true).over(fwd)) }
      case "nearest" =>
        val both = carryCols.foldLeft(unioned) { (df, c) =>
          df.withColumn(s"_b_$c", last(col(s"_r_$c"), ignoreNulls = true).over(bwd))
            .withColumn(s"_f_$c", first(col(s"_r_$c"), ignoreNulls = true).over(fwd)) }
        // integral ts compare exactly as long; timestamps as fractional
        // seconds (a long cast would truncate sub-second distances)
        val num = right.schema(rightTs).dataType match {
          case org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType =>
            (c: Column) => c.cast("double")
          case _ => (c: Column) => c.cast("long")
        }
        val bts = num(col(s"_b_$rightTs"))
        val fts = num(col(s"_f_$rightTs"))
        val lts = num(col("_ts"))
        val useBwd = fts.isNull || (bts.isNotNull && (lts - bts) <= (fts - lts))
        carryCols.foldLeft(both) { (df, c) =>
          df.withColumn(s"_r_$c",
            when(useBwd, col(s"_b_$c")).otherwise(col(s"_f_$c"))) }
    }
    carried.filter(col("_side") === leftSide)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"_r_$c").as(s"asof_$c")): _*)
  }
}
