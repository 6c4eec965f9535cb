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
  *   in-partition sort by (ts, side) -> carry the adjacent right ROW
  *   across (`last`/`first` with ignoreNulls over a one-sided row
  *   frame) -> keep left rows.
  *
  * The carried unit is a STRUCT of (right ts, value columns), non-null
  * exactly on right rows: `ignoreNulls` then skips left rows but never
  * a matched right row, so every output column comes from the SAME
  * matched row and a NULL inside a matched row's value column stays
  * NULL (matching pandas merge_asof / DuckDB ASOF) instead of being
  * replaced by a farther row's value.
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
    // the carry plan synthesizes these; a same-named data column would
    // be silently replaced or make references ambiguous (shared guard:
    // case-insensitive, like Spark's resolver)
    val reservedNames = Seq("_r", "_b", "_f", "_ts", "_side", "_rts")
    Reserved.requireAbsent(left, "asofJoin", reservedNames)
    Reserved.requireAbsent(right, "asofJoin", reservedNames)
    // NULL keys never match (SQL equi-join semantics; DuckDB ASOF and
    // pandas merge_asof agree) and a NULL right ts orders before every
    // real ts, which would hand its row to early left rows — both are
    // excluded from the match side. Null-key LEFT rows stay in the
    // output, unmatched, once their null-key partition has no right
    // rows to carry.
    val rightClean = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
    // at equal ts the right row must fall INSIDE the left row's one-sided
    // frame: before it for backward/nearest, after it for forward.
    // (nearest's forward frame misses the equal-ts right row, but the
    // backward carry matches it at distance 0, which wins every tie.)
    val (rightSide, leftSide) = if (direction == "forward") (1, 0) else (0, 1)
    // one struct per right row: the matched row travels as a unit
    val rowStruct = struct(
      col(rightTs).as("_rts") +: valueCols.map(col): _*)
    val structType = right.select(rowStruct.as("_r")).schema.head.dataType
    val taggedRight = rightClean.select(
      (col(key) +: col(rightTs).as("_ts") +: lit(rightSide).as("_side") +:
        rowStruct.as("_r") +: Seq.empty[Column]) ++
        leftCols.filterNot(c => c == key).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).as("_ts") +: lit(leftSide).as("_side") +:
        lit(null).cast(structType).as("_r") +: Seq.empty[Column]) ++
        leftCols.filterNot(c => c == key).map(col): _*)
    val ordered = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"))
    val bwd = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = taggedRight.unionByName(taggedLeft)

    val carried = direction match {
      case "backward" =>
        unioned.withColumn("_r", last(col("_r"), ignoreNulls = true).over(bwd))
      case "forward" =>
        unioned.withColumn("_r", first(col("_r"), ignoreNulls = true).over(fwd))
      case "nearest" =>
        val both = unioned
          .withColumn("_b", last(col("_r"), ignoreNulls = true).over(bwd))
          .withColumn("_f", first(col("_r"), ignoreNulls = true).over(fwd))
        // distances compare in the ts type's OWN domain — native
        // subtraction, no casts: timestamps (TZ and NTZ) subtract to
        // DAY-TIME INTERVALs (exact microseconds, zone-independent —
        // a session-zone cast would let backward/forward candidates
        // straddle a DST transition with different offsets and pick
        // the wrong row), dates subtract to day intervals, integrals
        // to exact longs, and fractional numerics to doubles. A
        // per-operand cast("long") here would TRUNCATE fractional ts
        // before subtracting (ts 10.6 between rows at 10.0 and 11.0:
        // truncated distB = 0 beats the true-nearer forward row).
        val (distB, distF) =
          (col("_ts") - col("_b._rts"), col("_f._rts") - col("_ts"))
        val useBwd = col("_f._rts").isNull ||
          (col("_b._rts").isNotNull && distB <= distF)
        both.withColumn("_r", when(useBwd, col("_b")).otherwise(col("_f")))
    }
    carried.filter(col("_side") === leftSide)
      // a NULL left ts can never satisfy an as-of predicate (l.ts >= r.ts
      // is NULL) — blank any carried match so the row surfaces unmatched
      .withColumn("_r",
        when(col("_ts").isNull, lit(null).cast(structType)).otherwise(col("_r")))
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"_r.$c").as(s"asof_$c")): _*)
  }
}
