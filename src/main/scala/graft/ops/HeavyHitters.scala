package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesSketch.{mg_merge, mg_sketch}
import graft.functions.Rounding.roundHalfUp

/** EXACT frequency-threshold detection ("which items make up at least
  * θ of the corpus?") without ever shuffling one row per distinct item.
  * The naive `groupBy(item).count().filter(cnt >= θN)` is correct but
  * its exchange carries every distinct item — billions of singleton
  * typos/ids/URLs at 100 TB, all shuffled only to be discarded. Two
  * passes instead:
  *
  *  1. CANDIDATES — one scan aggregating a mergeable Misra–Gries
  *     summary ([[graft.functions.MisraGriesSketch]]) of capacity
  *     k = slack·⌈1/θ⌉ alongside `count(*)`. Shuffle volume:
  *     partitions × k entries to one reducer, independent of distinct
  *     cardinality. Guarantee: any item with true count > N/(k+1)
  *     survives the merged summary; with slack ≥ 2 and N > 0,
  *     N/(k+1) < θN/2 < ⌈θN⌉, so the summary is a SUPERSET of every
  *     θ-heavy item. The collected candidate list is bounded driver
  *     state (≤ k entries — the k-means-centroid precedent), never the
  *     data.
  *  2. EXACT — a second scan filtered to the candidate literals (an
  *     `IN` over ≤ k values, pushed into the parquet scan) recounts
  *     them exactly; partial aggregation bounds the exchange at
  *     partitions × k. The threshold filter then yields the exact
  *     θ-heavy set — identical under any partitioning, because pass 2
  *     never depends on the sketch's (merge-order-dependent) counts,
  *     only on its guaranteed membership.
  *
  * Scale note: pass 1 merges in TWO levels so no single reducer ever
  * funnels every partition's partial buffer. Level 1 groups partitions
  * into ~√P salt lanes (`pmod(spark_partition_id(), √P)` — each task
  * emits ONE partial, each lane reducer merges ~√P of them); level 2
  * merges the √P lane sketches (`mg_merge`) into the final candidate
  * summary. Max per-task funnel is ~√P×k entries (10⁵ tasks × k=10³
  * ≈ 10 MB) where a single global aggregate would land P×k (~3 GB) on
  * one task. The MG membership guarantee is merge-tree independent
  * (Agarwal et al., PODS'12 — pinned in HeavyHittersSpec), so the lane
  * count never changes the candidate superset, and pass 2's exact
  * recount makes the final answer identical under any partitioning.
  *
  * Returns (item, cnt, share) with share = cnt/N rounded half-up to
  * 6 dp, ordered cnt-desc then item-asc. Null items are excluded from
  * both the count base and the result. */
object HeavyHitters {

  /** @param theta frequency threshold in (0, 1]: report items with
    *              cnt ≥ ⌈θ·N⌉
    * @param slack sketch head-room multiplier (≥ 2 preserves the
    *              superset guarantee; larger trades sketch memory for
    *              fewer pass-2 false candidates) */
  def heavyHitters(df: DataFrame, item: String, theta: Double,
                   slack: Int = 2): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, s"theta must be in (0,1]: $theta")
    require(slack >= 2, s"slack < 2 breaks the superset guarantee: $slack")
    val k = math.max(16, slack * math.ceil(1.0 / theta).toInt)
    // the sketch, the collected candidate list, and the pass-2 IN
    // filter are all O(k) — a θ so small that k explodes means the
    // question is no longer "heavy hitters" and wants the plain
    // groupBy instead; fail loudly rather than melt the driver
    require(k <= (1 << 20),
      s"theta=$theta needs a $k-entry sketch; below ~1e-6 use groupBy")
    val rows = df.filter(col(item).isNotNull)
      .select(col(item).cast("string").as("item"))
    // two-level merge (see scale note): lane count ≈ √(cluster
    // parallelism). defaultParallelism, not rdd.getNumPartitions — the
    // latter materializes an RDD lineage just to size the lanes and
    // breaks the single declarative pass-1 plan. Any lane count keeps
    // the answer identical (MG membership is merge-tree independent +
    // pass-2 exact recount); √parallelism keeps BOTH funnel stages
    // bounded: each lane merges ~tasks/√C buffers, the final reducer
    // merges √C buffers, never the P×k single-reducer funnel.
    val parts = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val lanes = math.max(1, math.ceil(math.sqrt(parts.toDouble)).toInt)
    val lanePartials = rows
      .groupBy(pmod(spark_partition_id(), lit(lanes)).as("_lane"))
      .agg(mg_sketch(col("item"), k).as("s"), count(lit(1)).as("pn"))
    val first = lanePartials
      .agg(mg_merge(col("s"), k).as("cand"), sum("pn").as("n")).head()
    if (first.isNullAt(1)) // zero lanes = empty input
      return rows.groupBy("item").agg(count(lit(1)).as("cnt"))
        .withColumn("share", lit(0.0))
    val n = first.getLong(1)
    val cands = first.getSeq[Row](0).map(_.getString(0))
    exactPass(rows, cands, n, theta)
  }

  /** Pass 2: exact recount of the ≤ k candidate literals against the
    * already-normalized (non-null, string-cast `item` column) rows. */
  private def exactPass(rows: DataFrame, cands: Seq[String], n: Long,
                        theta: Double): DataFrame = {
    val minCnt = math.ceil(theta * n).toLong
    rows.filter(col("item").isInCollection(cands))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(minCnt))
      .withColumn("share", roundHalfUp(col("cnt") / lit(n.toDouble), 6))
      .orderBy(col("cnt").desc, col("item"))
  }

  /** PER-GROUP θ-heavy items ("which tokens dominate each language /
    * domain?") with the whole pipeline plan-side — no driver collect at
    * all, so group cardinality never touches driver memory. Pass 1
    * aggregates one bounded MG summary + count PER GROUP (exchange:
    * partitions × groups-per-partition × k entries, each buffer
    * bounded); candidates explode from the sketch rows and come back
    * to the data as a BROADCAST semi-join on (group, item) — ≤
    * groups×k keys, the dimension-table-sized broadcast stance of
    * [[Quantiles.groupedExactQuantiles]] — so the corpus never
    * shuffles to be filtered. Pass 2 recounts survivors exactly and
    * thresholds against the per-group count (ceil in the plan, the
    * same IEEE arithmetic the oracle runs). Same guarantee as
    * [[heavyHitters]], applied per group: any item with in-group
    * count > N_g/(k+1) survives its group's summary, and
    * k = slack·⌈1/θ⌉ makes that a superset of the θ-heavy set.
    * Rows with a null group key or null item are excluded (the
    * grouped-operator null contract). Output: (key, item, cnt,
    * share), ordered (key, cnt desc, item). */
  def groupedHeavyHitters(df: DataFrame, item: String, key: String,
                          theta: Double, slack: Int = 2): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, s"theta must be in (0,1]: $theta")
    require(slack >= 2, s"slack < 2 breaks the superset guarantee: $slack")
    val k = math.max(16, slack * math.ceil(1.0 / theta).toInt)
    require(k <= (1 << 20),
      s"theta=$theta needs a $k-entry sketch; below ~1e-6 use groupBy")
    val rows = df.filter(col(item).isNotNull && col(key).isNotNull)
      .select(col(key).as("k"), col(item).cast("string").as("item"))
    val sk = rows.groupBy("k")
      .agg(mg_sketch(col("item"), k).as("s"), count(lit(1)).as("n"))
    val cands = sk.select(col("k"), explode(col("s")).as("e"))
      .select(col("k"), col("e.item").as("item"))
    rows.join(broadcast(cands), Seq("k", "item"), "left_semi")
      .groupBy("k", "item").agg(count(lit(1)).as("cnt"))
      .join(broadcast(sk.select(col("k"), col("n"))), Seq("k"))
      .filter(col("cnt") >= ceil(lit(theta) * col("n")))
      .select(col("k").as(key), col("item").as(item), col("cnt"),
        roundHalfUp(col("cnt") / col("n").cast("double"), 6).as("share"))
      .orderBy(col(key), col("cnt").desc, col(item))
  }

  /** θ-heavy items over an ARBITRARY horizon of persisted per-batch MG
    * partials ([[graft.streaming.EventStream.heavyHitterSketchSink]]'s
    * landed table, optionally filtered to a tag subset): the partials
    * merge into one candidate summary (`mg_merge` — bounded rows in,
    * one bounded buffer out; the streaming analogue of the two-level
    * tree), then [[exactPass]] recounts the candidates against `data`,
    * which must be the SAME horizon's rows (the sink's source,
    * re-read). N comes from the recorded per-batch counts — no extra
    * counting scan. The answer is exact and identical to running
    * [[heavyHitters]] over the concatenated horizon, because the MG
    * membership guarantee is merge-tree independent and pass 2 never
    * depends on sketch counts. Requires every partial to share one
    * capacity `k` with k ≥ 2·⌈1/θ⌉ — the superset guarantee's floor
    * (a sink sized for θ₀ serves any θ ≥ θ₀). */
  def heavyHittersFromSketches(sketches: DataFrame, data: DataFrame,
                               item: String, theta: Double): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, s"theta must be in (0,1]: $theta")
    val rows = data.filter(col(item).isNotNull)
      .select(col(item).cast("string").as("item"))
    val ks = sketches.select("k").distinct().collect().map(_.getInt(0))
    if (ks.isEmpty) // empty horizon
      return rows.groupBy("item").agg(count(lit(1)).as("cnt"))
        .withColumn("share", lit(0.0)).limit(0)
    require(ks.length == 1,
      s"heavyHittersFromSketches: mixed sketch capacities ${ks.sorted.toSeq}")
    val k = ks.head
    require(k >= 2 * math.ceil(1.0 / theta).toInt,
      s"stored capacity k=$k cannot guarantee a superset at theta=$theta " +
        s"(needs k >= 2*ceil(1/theta) = ${2 * math.ceil(1.0 / theta).toInt})")
    val first = sketches
      .agg(mg_merge(col("sketch"), k).as("cand"), sum("n").as("n")).head()
    val n = if (first.isNullAt(1)) 0L else first.getLong(1)
    if (n == 0L)
      return rows.groupBy("item").agg(count(lit(1)).as("cnt"))
        .withColumn("share", lit(0.0)).limit(0)
    val cands = first.getSeq[Row](0).map(_.getString(0))
    exactPass(rows, cands, n, theta)
  }
}
