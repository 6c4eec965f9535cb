package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 merge.
  *
  * The reference's load surface stops at insert/overwrite/upsert
  * (etl_project/connectors/postgresql.py:70-91); a dimension that must
  * keep HISTORY needs the classic SCD2 shape instead: the current table
  * carries (`valid_from`, `valid_to`, `is_current`) per row, an update
  * batch closes the open row of every key whose tracked attributes
  * changed and opens a new version effective at the batch date.
  *
  * Scale shape: ONE hash exchange. Open rows full-outer-join the batch
  * on the business key; every output branch (pass-through, close, open,
  * brand-new) is decided map-side after the join by building a 1- or
  * 2-element array of result structs and `inline`-ing it — the joined
  * subtree is never evaluated twice, so a changed key costs no second
  * shuffle. History (`is_current = false`) rows never enter the join:
  * they are unioned back from a separate filter of the same scan, and
  * with the dimension partitioned on `is_current` that branch is a
  * pure file-list pass-through at 100 TB.
  *
  * Contract: `updates` has one row per key (dedup upstream — e.g.
  * [[Upsert.upsert]] — otherwise both versions would open), columns =
  * business keys + tracked attributes + `effectiveCol` (a date). The
  * tracked attributes are every `current` column that is not a key and
  * not one of the three SCD bookkeeping columns. Attribute comparison
  * is null-safe (`<=>`): null -> value and value -> null both count as
  * a change, null -> null does not.
  */
object Scd2 {

  private val Meta = Seq("valid_from", "valid_to", "is_current")

  def merge(current: DataFrame, updates: DataFrame, keys: Seq[String],
            effectiveCol: String = "effective_date"): DataFrame = {
    val outCols = current.columns.toSeq
    require(Meta.forall(outCols.contains),
      s"current must carry ${Meta.mkString(", ")}")
    val tracked = outCols.filterNot(c => keys.contains(c) || Meta.contains(c))
    // the _u_<attr> rename namespace is reserved too: a current column
    // literally named "_u_<tracked>" would collide with the renamed
    // update attribute after the join and fail as an opaque
    // ambiguous-reference error instead of this check
    Reserved.requireAbsent(current, "scd2Merge",
      Seq("_eff", "_upd", "_open") ++ tracked.map("_u_" + _))

    // null-safe split: a row with is_current = NULL (externally built
    // dims) must land in the HISTORY branch, not vanish — a plain
    // filter(col) / filter(!col) pair excludes null from BOTH sides
    val open = current.filter(col("is_current") <=> lit(true))
      .withColumn("_open", lit(true))
    val hist = current.filter(!(col("is_current") <=> lit(true)))
    // Updates: tracked attrs renamed so the post-join row carries both
    // versions; `_upd` marks presence (effectiveCol may be null-typed).
    val u = updates.select(
      keys.map(col) ++ tracked.map(c => col(c).as(s"_u_$c")) :+
        col(effectiveCol).cast("date").as("_eff") :+ lit(true).as("_upd"): _*)

    val j = open.join(u, keys, "full_outer")
    val changed = tracked.map(c => !(col(c) <=> col(s"_u_$c")))
      .foldLeft(lit(false))(_ || _)

    def row(trackedFrom: String => org.apache.spark.sql.Column,
            from: org.apache.spark.sql.Column,
            to: org.apache.spark.sql.Column,
            cur: Boolean) =
      struct(keys.map(col) ++ tracked.map(c => trackedFrom(c).as(c)) :+
        from.as("valid_from") :+ to.as("valid_to") :+
        lit(cur).as("is_current"): _*)

    val keep    = row(col, col("valid_from"), col("valid_to"), cur = true)
    val closed  = row(col, col("valid_from"), col("_eff"), cur = false)
    val opened  = row(c => col(s"_u_$c"), col("_eff"),
      lit(null).cast("date"), cur = true)

    val emitted = j.select(inline(
      when(col("_upd").isNull, array(keep))        // no update: as-is
        .when(col("_open").isNull, array(opened))  // brand-new key
        .when(changed, array(closed, opened))      // close + reopen
        .otherwise(array(keep))))                  // no-op update
    hist.select(outCols.map(col): _*)
      .unionByName(emitted.select(outCols.map(col): _*))
  }
}
