package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Rounding.roundHalfUp

/** EXACT interpolated quantiles without a global sort. The naive exact
  * path (`percentile(...)` / ORDER BY + row-pick) ships every value to
  * the reducers and sorts all of them — a full-data shuffle that at
  * 100 TB makes "what is p99 latency?" cost as much as the heaviest
  * join in the pipeline. The approximate path (`approx_percentile`)
  * avoids the sort but abandons exactness. Two cheap passes give the
  * exact answer:
  *
  *  1. HISTOGRAM — one scan computing (count, min, max) and a
  *     fixed-width `bins`-bucket histogram (a partial-aggregated
  *     `groupBy(bucket).count()` whose exchange carries ≤ `bins` rows
  *     regardless of data volume). The collected histogram is bounded
  *     driver state (≤ `bins` longs — the k-means-centroid precedent),
  *     never the data. Cumulating it locates, for each requested
  *     quantile, the bucket(s) holding the two order statistics the
  *     interpolation needs.
  *  2. REFINE — a second scan filtered to ONLY those buckets (expected
  *     N/bins rows each, and the bucket predicate is a plain range/IN
  *     comparison that pushes into the parquet scan via min/max
  *     row-group stats on clustered data). A per-bucket `row_number`
  *     window turns each global rank into a local pick; only the ≤
  *     2·|ps| selected order statistics ever reach the driver.
  *
  * Exactness: the histogram only ROUTES ranks to buckets (counts are
  * exact longs, so the routing is exact); the values themselves come
  * from pass 2's real rows. Ties across equal values are immaterial —
  * any permutation of equal values yields the same order statistic.
  * Interpolation matches ANSI `percentile_cont`/Spark `percentile`:
  * pos = p·(n−1), result = (⌈pos⌉−pos)·x[⌊pos⌋] + (pos−⌊pos⌋)·x[⌈pos⌉]
  * (evaluated in IEEE double exactly as Spark's Percentile does, so the
  * two agree bit-for-bit).
  *
  * Scale note: pass 2's window sorts one bucket per task. `bins` is the
  * knob — at N rows each bucket holds ~N/bins values, so size bins such
  * that N/bins fits a task's sort budget (skewed value distributions
  * concentrate rows in few buckets; a pathological single-point mass is
  * detected by the all-equal fast path, and anything milder still beats
  * the global sort by bins×). Both collects are O(bins + |ps|).
  */
object Quantiles {

  /** Exact quantiles of `value` (nulls excluded) at fractions `ps`.
    * Returns one row per requested fraction: (p DOUBLE, q DOUBLE with
    * `scale`-digit half-up rounding), ordered by p.
    *
    * @param bins histogram width: pass-2 work is ~|ps|·N/bins rows
    * @param scale half-up rounding digits on q (parity with oracles) */
  def exactQuantiles(df: DataFrame, value: String, ps: Seq[Double],
                     bins: Int = 1024, scale: Int = 4): DataFrame = {
    require(ps.nonEmpty, "exactQuantiles: ps must be non-empty")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"exactQuantiles: fractions must be in [0,1]: $ps")
    require(bins >= 2 && bins <= (1 << 20),
      s"exactQuantiles: bins out of range: $bins")
    val spark = df.sparkSession
    val v = df.select(col(value).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))

    val Row(n: Long, loAny, hiAny) =
      v.agg(count("v"), min("v"), max("v")).head()
    if (n == 0L) return result(spark, ps.map(p => (p, null)), scale)
    val (lo, hi) = (loAny.asInstanceOf[Double], hiAny.asInstanceOf[Double])
    if (lo == hi) // all-equal fast path: every order statistic is lo
      return result(spark, ps.map(p => (p, java.lang.Double.valueOf(lo))), scale)

    // pass 1: fixed-width histogram. Bucket of v = ⌊(v−lo)/width⌋
    // clamped to bins−1 (v == hi, and FP round-up at bucket edges).
    val width = (hi - lo) / bins
    val bucketOf = least(floor((col("v") - lit(lo)) / lit(width)),
      lit(bins - 1)).cast("int")
    val hist = v.groupBy(bucketOf.as("b")).agg(count("*").as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // cumBefore(b) = rows in buckets < b — exact rank routing
    val cumBefore = {
      val m = scala.collection.mutable.LongMap.empty[Long]
      var acc = 0L
      hist.foreach { case (b, c) => m(b.toLong) = acc; acc += c }
      m
    }
    val cnt = hist.map { case (b, c) => b.toLong -> c }.toMap

    // ranks each quantile needs: pos = p·(n−1), lower ⌊pos⌋, upper ⌈pos⌉
    def posOf(p: Double): Double = p * (n - 1)
    val ranks: Seq[Long] = ps.flatMap { p =>
      val pos = posOf(p)
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
    }.distinct.sorted
    // route each global rank to (bucket, local rank)
    val route: Map[Long, (Long, Long)] = ranks.map { g =>
      // last bucket whose cumBefore ≤ g (hist is sorted, ≤ bins entries)
      val b = hist.map(_._1.toLong).filter(b => cumBefore(b) <= g).last
      require(g < cumBefore(b) + cnt(b), s"rank $g routed past bucket $b")
      g -> (b, g - cumBefore(b))
    }.toMap

    // pass 2: order statistics from ONLY the routed buckets
    val neededBuckets = route.values.map(_._1).toSeq.distinct
    val needDf = broadcast(spark.createDataFrame(
      route.toSeq.map { case (g, (b, r)) => (b, r, g) })
      .toDF("b", "r", "g"))
    val w = Window.partitionBy("b").orderBy("v")
    val stats: Map[Long, Double] = v
      .withColumn("b", bucketOf.cast("long"))
      .filter(col("b").isin(neededBuckets: _*))
      .withColumn("r", row_number().over(w).cast("long") - 1)
      .join(needDf, Seq("b", "r"))
      .select("g", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val rows = ps.map { p =>
      val pos = posOf(p)
      val (kLo, kHi) = (math.floor(pos).toLong, math.ceil(pos).toLong)
      val q = if (kLo == kHi) stats(kLo)
      // Spark Percentile's exact double expression — bit-parity anchor
      else (kHi - pos) * stats(kLo) + (pos - kLo) * stats(kHi)
      (p, java.lang.Double.valueOf(q))
    }
    result(spark, rows, scale)
  }

  private def result(spark: SparkSession, rows: Seq[(Double, java.lang.Double)],
                     scale: Int): DataFrame =
    spark.createDataFrame(rows).toDF("p", "q_raw")
      .select(col("p"), roundHalfUp(col("q_raw"), scale).as("q"))
      .orderBy("p")

  /** ONE-pass mergeable quantile sketch with an EXACTLY replayable
    * bucket function — the streaming/pre-aggregation complement to
    * [[exactQuantiles]] (which needs two passes). Values are quantized
    * to integers (`quant` fixed-point digits, the shared HALF_UP
    * formula), then bucketed by (bit-length, top-`prefixBits`-bit
    * prefix): bucket id = q DIV 2^max(blen−B, 0). The mapping is pure
    * integer arithmetic plus a binary-string length — Spark's `bin`
    * and DuckDB's `bin` agree character-for-character, so unlike a
    * log-γ DDSketch bucket there is NO transcendental boundary where
    * two engines can round a value into different buckets: the sketch
    * is bit-replayable, which is what lets the driver gate hash it.
    *
    * Guarantees: counts are exact longs, buckets are disjoint value
    * ranges [b·f, (b+1)·f) totally ordered by (blen, bucket), and any
    * value in a bucket differs from the bucket midpoint by ≤ f/2,
    * giving relative error ≤ 2^−B (top bit set ⇒ b ≥ 2^(B−1)). The
    * sketch MERGES by adding counts per (blen, bucket) — the property
    * that lets 1000 executors (or 1000 days of partial sketches)
    * pre-aggregate before one tiny final combine; the shuffle carries
    * ≤ 63·2^(B−1) rows at ANY data volume. Reported quantiles are the
    * bucket-midpoint of the lower order statistic's bucket
    * (nearest-rank-lower: rank = floor(p·(n−1))).
    *
    * Positive values only (q ≥ 1 after quantization; others dropped —
    * the documented domain, matching every log-bucket sketch). */
  def sketchQuantiles(df: DataFrame, value: String, ps: Seq[Double],
                      prefixBits: Int = 10, quant: Int = 2): DataFrame =
    quantilesFromSketch(bucketCounts(df, value, prefixBits, quant), ps, quant)

  /** The sketch itself: one pass over the data into bounded
    * (blen, f, bucket, c) rows. This IS the mergeable state — any
    * number of partial sketches (per executor, per micro-batch, per
    * day) union and re-aggregate into the same sketch the full data
    * would have produced, because the bucket function is stateless
    * and counts add. */
  def bucketCounts(df: DataFrame, value: String,
                   prefixBits: Int = 10, quant: Int = 2): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 20,
      s"bucketCounts: prefixBits out of range: $prefixBits")
    require(quant >= 0 && quant <= 9,
      s"bucketCounts: quant out of range: $quant")
    val qf = math.pow(10, quant)
    val q = floor(col(value).cast("double") * lit(qf) + lit(0.5)).cast("long")
    df.select(q.as("q")).filter(col("q") >= 1)
      .withColumn("blen", length(bin(col("q"))).cast("int"))
      .withColumn("f", pow(lit(2.0),
        greatest(col("blen") - lit(prefixBits), lit(0))).cast("long"))
      .withColumn("bucket", expr("q DIV f"))
      .groupBy("blen", "f", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Per-group sketch quantiles — the production "p99 per key" ask,
    * same bucket function and guarantees as [[sketchQuantiles]] but
    * entirely plan-side: per-group counts, cumulative rank walks, and
    * rank picks are windows over the (group × bounded-sketch) table,
    * so there is NO driver collect and NO per-group job — one pass
    * over the data, one exchange of sketch rows, regardless of group
    * count. Output: one row per (group, p). */
  def groupedSketchQuantiles(df: DataFrame, value: String, key: String,
                             ps: Seq[Double], prefixBits: Int = 10,
                             quant: Int = 2): DataFrame = {
    require(ps.nonEmpty, "groupedSketchQuantiles: ps must be non-empty")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"groupedSketchQuantiles: fractions must be in [0,1]: $ps")
    require(prefixBits >= 1 && prefixBits <= 20,
      s"groupedSketchQuantiles: prefixBits out of range: $prefixBits")
    require(quant >= 0 && quant <= 9,
      s"groupedSketchQuantiles: quant out of range: $quant")
    val spark = df.sparkSession
    import spark.implicits._
    val qf = math.pow(10, quant)
    val q = floor(col(value).cast("double") * lit(qf) + lit(0.5)).cast("long")
    val buckets = df
      .select(col(key), q.as("q")).filter(col("q") >= 1)
      .withColumn("blen", length(bin(col("q"))).cast("int"))
      .withColumn("f", pow(lit(2.0),
        greatest(col("blen") - lit(prefixBits), lit(0))).cast("long"))
      .withColumn("bucket", expr("q DIV f"))
      .groupBy(col(key), col("blen"), col("f"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy("blen", "bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(key)
    val cum = buckets
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
    // rank pick is JOIN-FREE: explode the literal fraction list onto the
    // bounded (group × sketch) rows and filter map-side — the same rows a
    // theta-join would produce, but as Generate+Filter inside the window
    // stage (a cum>rk AND cum−c<=rk join has no equi key and would plan a
    // BroadcastNestedLoopJoin)
    cum.withColumn("p", explode(typedLit(ps)))
      .withColumn("rk",
        floor(col("p") * (col("n") - lit(1)).cast("double")).cast("long"))
      .filter(col("cum") > col("rk") && col("cum") - col("c") <= col("rk"))
      .select(col(key), col("p"),
        roundHalfUp((col("bucket") * col("f") + expr("f DIV 2"))
          .cast("double") / lit(qf), 6).as("q_est"))
      .orderBy(key, "p")
  }

  /** Per-group EXACT interpolated quantiles — the grouped twin of
    * [[exactQuantiles]] ("exact p99 per key"), with the driver kept out
    * of the group dimension entirely: no collect is proportional to
    * group count (the ungrouped version's O(bins) histogram collect
    * would become O(groups×bins) here, so routing moves plan-side).
    *
    *  1. STATS — per-group (n, lo, hi): one partial-aggregated exchange
    *     of ≤ |groups| rows. All-equal groups (lo == hi, incl. n == 1)
    *     are answered directly from stats — no pass 2, so a degenerate
    *     single-value group of any size never sorts.
    *  2. HISTOGRAM — stats broadcast back onto the rows (map-side; the
    *     corpus does NOT shuffle for the join), per-group fixed-width
    *     bucket of each value, then groupBy(key, bucket): one exchange
    *     of ≤ groups×bins rows. A per-group cumulative window turns
    *     counts into exact rank routing; the fractions explode onto the
    *     bounded histogram rows and filter map-side (the join-free rank
    *     pick — same rewrite as [[groupedSketchQuantiles]]).
    *  3. REFINE — the corpus filters to routed (key, bucket) cells via
    *     a BROADCAST semi-join (≤ groups×2|ps| keys; map-side, the
    *     corpus again does not shuffle to be filtered), survivors
    *     (~2|ps|·N/bins rows total) shuffle once for a per-cell
    *     row_number, and a broadcast join picks the ≤ groups×2|ps|
    *     order statistics. Interpolation is the same IEEE-double
    *     expression as [[exactQuantiles]].
    *
    * Scale bounds: every broadcast here is O(groups×|ps|) — the design
    * holds to millions of groups (a dimension-table-sized broadcast);
    * past that, exact-per-key wants [[groupedSketchQuantiles]] (fully
    * plan-side, no broadcast) or a plain percentile() shuffle, which at
    * that group cardinality is no longer skewed anyway. Rows with a
    * null group key or null/NaN value are excluded (the documented
    * contract — matches `quantile_cont` null handling; key nullability
    * is the caller's).
    *
    * Output: (key, p DOUBLE, q DOUBLE rounded half-up to `scale`),
    * ordered by (key, p). */
  def groupedExactQuantiles(df: DataFrame, value: String, key: String,
                            ps: Seq[Double], bins: Int = 1024,
                            scale: Int = 4): DataFrame = {
    require(ps.nonEmpty, "groupedExactQuantiles: ps must be non-empty")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"groupedExactQuantiles: fractions must be in [0,1]: $ps")
    require(bins >= 2 && bins <= (1 << 20),
      s"groupedExactQuantiles: bins out of range: $bins")
    val v = df.select(col(key).as("k"), col(value).cast("double").as("v"))
      .filter(col("k").isNotNull && col("v").isNotNull && !isnan(col("v")))

    val stats = v.groupBy("k")
      .agg(count("v").as("n"), min("v").as("lo"), max("v").as("hi"))

    // all-equal groups: every order statistic IS lo — answered here
    val flat = stats.filter(col("lo") === col("hi"))
      .select(col("k"), explode(typedLit(ps)).as("p"), col("lo").as("q_raw"))

    val multi = stats.filter(col("lo") < col("hi"))
    // per-group fixed-width bucket, computed map-side under a broadcast
    // of the group-bounded stats table
    val bucket = least(
      floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / lit(bins))),
      lit(bins - 1)).cast("int")
    val withB = v.join(broadcast(multi), "k").withColumn("b", bucket)

    val hist = withB.groupBy("k", "b")
      .agg(count(lit(1)).as("c"), first("n").as("n"))
    val wCum = Window.partitionBy("k").orderBy("b")
    val cum = hist.withColumn("cumBefore",
      coalesce(sum("c").over(wCum.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L)))
    // join-free rank routing: fractions (then their two order-statistic
    // ranks) explode onto the bounded histogram rows; the filter keeps
    // the one bucket that holds each rank. distinct: kLo == kHi on
    // integral positions, and different p can need the same rank.
    val routed = cum
      .withColumn("p", explode(typedLit(ps)))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .select(col("k"), col("b"), col("cumBefore"), col("c"),
        explode(array(floor(col("pos")).cast("long"),
          ceil(col("pos")).cast("long"))).as("g"))
      .filter(col("g") >= col("cumBefore") &&
        col("g") < col("cumBefore") + col("c"))
      .select(col("k"), col("b"), col("g"),
        (col("g") - col("cumBefore")).as("r"))
      .distinct()

    // refine: broadcast-semi filter (corpus stays map-side), one
    // exchange of the ~2|ps|·N/bins survivors for the per-cell sort
    val wPick = Window.partitionBy("k", "b").orderBy("v")
    val picked = withB.select("k", "b", "v")
      .join(broadcast(routed.select("k", "b").distinct()),
        Seq("k", "b"), "left_semi")
      .withColumn("r", row_number().over(wPick).cast("long") - 1)
      .join(broadcast(routed), Seq("k", "b", "r"))
      .select(col("k"), col("g"), col("v"))

    // interpolate: both pick joins are on (k, rank) with group-bounded
    // sides (≤ groups×2|ps| rows each)
    val pk = multi
      .withColumn("p", explode(typedLit(ps)))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("kLo", floor(col("pos")).cast("long"))
      .withColumn("kHi", ceil(col("pos")).cast("long"))
    val xLo = picked.toDF("k", "kLo", "xLo")
    val xHi = picked.toDF("k", "kHi", "xHi")
    val interp = pk.join(broadcast(xLo), Seq("k", "kLo"))
      .join(broadcast(xHi), Seq("k", "kHi"))
      .withColumn("q_raw", when(col("kLo") === col("kHi"), col("xLo"))
        // Spark Percentile's exact double expression — the same
        // bit-parity anchor exactQuantiles uses
        .otherwise((col("kHi") - col("pos")) * col("xLo") +
          (col("pos") - col("kLo")) * col("xHi")))
      .select(col("k"), col("p"), col("q_raw"))

    flat.unionByName(interp)
      .select(col("k").as(key), col("p"),
        roundHalfUp(col("q_raw"), scale).as("q"))
      .orderBy(key, "p")
  }

  /** Quantiles from a (possibly unioned) sketch table: the leading
    * re-aggregation is a no-op on a fresh sketch and THE merge on a
    * history of partial sketches. `quant` must match the value used
    * to build the sketch (it only scales the reported estimate). */
  def quantilesFromSketch(sketch: DataFrame, ps: Seq[Double],
                          quant: Int = 2): DataFrame = {
    require(ps.nonEmpty, "quantilesFromSketch: ps must be non-empty")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantilesFromSketch: fractions must be in [0,1]: $ps")
    val spark = sketch.sparkSession
    import spark.implicits._
    val qf = math.pow(10, quant)
    val buckets = sketch.groupBy("blen", "f", "bucket")
      .agg(sum("c").as("c"))
    val nRow = buckets.agg(sum("c")).head()
    if (nRow.isNullAt(0))
      return spark.createDataFrame(
        ps.map(p => (p, null: java.lang.Double))).toDF("p", "q_est")
        .orderBy("p")
    val n = nRow.getLong(0)
    // cumulative walk over the ≤ 63·2^(B−1)-row bucket table: a single-
    // partition window over BOUNDED state (the sketch, never the data)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("blen", "bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = buckets.withColumn("cum", sum("c").over(w))
    // join-free rank pick (same rewrite as groupedSketchQuantiles):
    // explode literal fractions onto the bounded sketch rows, filter
    // map-side — no BroadcastNestedLoopJoin, no whitelist entry needed
    cum.withColumn("p", explode(typedLit(ps)))
      .withColumn("rk", floor(col("p") * lit((n - 1).toDouble)).cast("long"))
      .filter(col("cum") > col("rk") && col("cum") - col("c") <= col("rk"))
      .select(col("p"),
        roundHalfUp((col("bucket") * col("f") + expr("f DIV 2"))
          .cast("double") / lit(qf), 6).as("q_est"))
      .orderBy("p")
  }
}
