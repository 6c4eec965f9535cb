package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. A hash join sends every row of a
  * key to ONE reducer; at 100 TB a hot key (the null user, the default
  * symbol, the crawler domain with 10% of all docs) turns into a single
  * straggler task that runs for hours while 999 executors idle.
  *
  * `saltedJoin` splits each hot key's rows across `salt` reducers:
  * the big (skewed) side gets a uniform salt in `[0, salt)`, the small
  * side is replicated once per salt value, and the join key becomes
  * `(keys..., _salt)`. Cost: `salt`× replication of the small side's
  * shuffle — pay it only when the small side is modest and the big side
  * is skewed. The salt uses a seeded `rand`, deterministic per input
  * partition, and never appears in the output, so results are
  * row-for-row identical to the unsalted join (asserted in SkewSpec).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * solves the same problem post-shuffle for sort-merge joins; explicit
  * salting still wins when the skew is in an aggregation feeding the
  * join, or when AQE's size thresholds miss the hot key.
  */
object Skew {

  /** Join `big` (skewed) with `small` on `keys`, spreading each key's
    * rows over `salt` reducers. Inner and left joins preserve exact
    * semantics (every big-side row keeps exactly its usual matches). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer", s"unsupported join type: $joinType")
    Reserved.requireAbsent(big, "saltedJoin", Seq("_salt"))
    Reserved.requireAbsent(small, "saltedJoin", Seq("_salt"))
    val b = big.withColumn("_salt", (rand(42) * salt).cast("int"))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Skew-safe COUNT(DISTINCT x) per group. The direct form shuffles
    * every row of a group to ONE reducer to deduplicate — a hot group
    * (the null user, the bot account) becomes a straggler, and unlike
    * sums, distinct-counting gets no map-side partial aggregation.
    * Two-phase instead: dedupe on (group, x) — the shuffle key now
    * includes x, spreading the hot group over all reducers — then a
    * plain (partial-agg'd) count per group. Exact same answer, both
    * exchanges skew-free. NULLs match COUNT(DISTINCT x) semantics:
    * the dedup keeps a (group, NULL) row so every group survives, and
    * `count(x)` skips it, so an all-NULL group counts 0 — exactly what
    * COUNT(DISTINCT) returns for it under GROUP BY. */
  def countDistinctSkewSafe(df: DataFrame, groupCols: Seq[String],
                            distinctCol: String): DataFrame =
    df.select((groupCols :+ distinctCol).map(col): _*).distinct()
      .groupBy(groupCols.map(col): _*)
      .agg(count(col(distinctCol)).as(s"n_distinct"))
}
