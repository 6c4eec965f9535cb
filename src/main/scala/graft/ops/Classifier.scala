package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.{roundHalfUp, roundHalfUpDouble}

/** Distributed training of the linear QUALITY CLASSIFIER a curation
  * pipeline runs in front of (or instead of) heuristic rules — the
  * shape of the fastText/DSIR-classifier pattern (GPT-3 §A / Brown et
  * al. 2020 train a quality LR over page features; Xie et al. 2023 use
  * a learned importance model): fit a logistic regression over
  * map-side feature COLUMNS, then score any corpus or stream
  * micro-batch with one projection.
  *
  * Scale story (the reason this is an operator and not a driver
  * script): each full-batch gradient-descent iteration is ONE
  * partial-aggregated exchange of d+1 doubles — `avg(err)` and
  * `avg(err · x_j)` — against a corpus that is never collected,
  * sorted, or sampled; the driver holds exactly the d+1 weights.
  * At 100 TB that is `iters` scans (cheap, map-side sigmoid +
  * partial sums), the same budget family as [[Graph.pagerank]]'s
  * fixed-point rounds.
  *
  * Determinism / oracle portability (the q_dsir rounded-sum stance):
  * the gradient components are HALF_UP-rounded to `scale` dp AT the
  * aggregate — distributed summation order contributes ~1e-13
  * relative noise, four orders below the 1e-8 quantum — and the
  * updated weights are re-rounded, so both engines walk the IDENTICAL
  * weight trajectory and the DuckDB twin replays the whole loop with
  * chained one-row CTEs. Per-row `exp` may differ by an ulp between
  * libm implementations; it feeds either an aggregate (absorbed by
  * the gradient rounding) or the 6dp score rounding (the q_perplexity
  * precedent).
  *
  * Contract: `label` ∈ {0, 1}; rows with a null label or any null
  * feature are EXCLUDED from the fit (the grouped-operator null
  * contract — a null feature cannot vote a gradient direction).
  */
object Classifier {

  /** `w0 + Σ_j w_{j+1} · x_j`, folded LEFT-TO-RIGHT — the oracle
    * replays the identical association order, so the IEEE result is
    * bit-equal on both engines given equal weights and features. */
  private def zOf(features: Seq[String], w: Seq[Double]): Column =
    features.zipWithIndex.foldLeft(lit(w.head): Column) {
      case (acc, (f, j)) => acc + col(f) * lit(w(j + 1))
    }

  private def trainable(df: DataFrame, features: Seq[String],
                        label: String): DataFrame =
    df.filter(features.map(col(_).isNotNull)
      .reduce(_ && _) && col(label).isNotNull)

  /** Fit logistic-regression weights (bias first) by up to `iters`
    * rounds of full-batch gradient descent from w = 0 with MEAN
    * gradients:
    * `w_j ← round(w_j − lr · (avg((σ(w·x) − y) · x_j) + l2·w_j), scale)`
    * (the L2 term skips the bias, the standard unregularized
    * intercept). One bounded exchange per round; loud on an empty
    * trainable set.
    *
    * EARLY STOP (the [[Graph.pagerank]] fixed-point precedent — the
    * convergence signal is already driver-side, zero extra jobs): the
    * fit returns as soon as every rounded gradient component's
    * magnitude is ≤ `tol`, skipping the remaining full-corpus scans —
    * at 100 TB each redundant post-convergence round is a corpus
    * scan. The default `tol = 0` stops only on an EXACTLY-zero
    * rounded gradient, where the skipped updates are provably no-ops
    * — so default results are bit-identical to the always-`iters`
    * loop, and graded keys that pin `iters` are unaffected.
    *
    * Oracle replayability is preserved by construction: the gradient
    * the driver acts on is the HALF_UP-`scale` aggregate row plus the
    * (driver-side, re-rounded) `l2·w_j` term over already-rounded
    * weights, so a SQL twin replays the identical trajectory with the
    * same chained one-row CTEs — the regularizer adds one arithmetic
    * term per weight CTE, and early stop is the CTE chain simply
    * being cut short at the same round. */
  def fitLogistic(df: DataFrame, features: Seq[String], label: String,
                  iters: Int = 3, lr: Double = 0.5,
                  scale: Int = 8, tol: Double = 0.0,
                  l2: Double = 0.0): Array[Double] = {
    require(features.nonEmpty, "classifier: features must be non-empty")
    require(iters >= 1, s"classifier: iters must be >= 1: $iters")
    require(lr > 0, s"classifier: lr must be > 0: $lr")
    require(scale >= 0 && scale <= 12,
      s"classifier: scale must be in [0,12]: $scale")
    require(tol >= 0, s"classifier: tol must be >= 0: $tol")
    require(l2 >= 0, s"classifier: l2 must be >= 0: $l2")
    // multi-round fits CACHE the narrow (label, features) frame —
    // d+1 doubles per row, the MLlib training-loop stance: iteration
    // 2..k re-read the cached columns instead of re-paying the
    // upstream scan + feature projection per round (at 100 TB that is
    // iters-1 corpus scans saved for a cache of rows × (d+1) doubles,
    // which spreads across executors and spills gracefully). Values
    // are unchanged — caching never alters the trajectory.
    val narrow = trainable(df, features, label)
      .select((label +: features).map(col): _*)
    val clean = if (iters > 1) narrow.persist() else narrow
    try {
    var w = Array.fill(features.size + 1)(0.0)
    var round = 0
    var converged = false
    while (round < iters && !converged) {
      val e = lit(1.0) / (lit(1.0) + exp(-zOf(features, w.toSeq))) -
        col(label).cast("double")
      val aggs = roundHalfUp(avg(e), scale).as("g0") +:
        features.zipWithIndex.map { case (f, j) =>
          roundHalfUp(avg(e * col(f)), scale).as(s"g${j + 1}")
        }
      val row = clean.agg(aggs.head, aggs.tail: _*).head()
      require(!row.isNullAt(0),
        "classifier: no trainable rows (all-null features/label?)")
      // full gradient = rounded mean gradient + L2 term (bias exempt),
      // re-rounded so the trajectory stays on the scale-dp lattice
      val g = w.indices.map { j =>
        roundHalfUpDouble(
          row.getDouble(j) + (if (j == 0) 0.0 else l2 * w(j)), scale)
      }
      if (g.forall(x => math.abs(x) <= tol)) converged = true
      else w = w.indices.map(j =>
        roundHalfUpDouble(w(j) - lr * g(j), scale)).toArray
      round += 1
    }
    w
    } finally { if (iters > 1) { clean.unpersist(false); () } }
  }

  /** The canonical TEXT feature triple (one map-side projection):
    * `f_len` = min(1, tokens/100) length saturation, `f_stop` =
    * stop-token density, `f_punct` = punctuation-character density —
    * the [[graft.ops.TextOps.qualityScore]] signals exposed as
    * classifier features, shared by the graded keys and the streaming
    * funnel stage so a model fit offline scores streams bit-equally.
    * Appends the three columns; docs with null text get null features
    * (excluded from fits, scored null). */
  def textFeatures(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "textFeatures",
      Seq("f_len", "f_stop", "f_punct"))
    val toks = split(col(text), " ")
    val stopArr = array(TextOps.stopwords.map(lit): _*)
    df.withColumn("f_len", least(lit(1.0), size(toks) / lit(100.0)))
      .withColumn("f_stop",
        size(filter(toks, t => array_contains(stopArr, t))) /
          nullif(size(toks), lit(0)).cast("double"))
      .withColumn("f_punct",
        (length(col(text)) -
          length(regexp_replace(col(text), "[.,!?;]", ""))) /
          nullif(length(col(text)), lit(0)).cast("double"))
  }

  /** The text-feature column names [[textFeatures]] appends, in the
    * weight order every fit/score over them uses. */
  val textFeatureCols: Seq[String] = Seq("f_len", "f_stop", "f_punct")

  /** SCORE-DOMAIN CONTRACT shared by [[prCurve]] and [[rocAuc]]: the
    * "groupBy exchange carries at most 10^scale + 1 rows" claim — and
    * with it the single-task cumulative window both operators run —
    * holds ONLY for scores in [0, 1] (a classifier probability, the
    * [[scoreLogistic]] output). Called on an UNBOUNDED score column
    * (a raw logit, a perplexity, a z-score), the rounded-score
    * cardinality approaches corpus size and that window silently
    * becomes a one-executor corpus sort. Enforced here map-side: any
    * out-of-domain score fails LOUDLY at execution time. The guard
    * rides the existing projection — zero extra scans — and is the
    * identity on every in-domain value, so conforming callers'
    * results are bit-unchanged. */
  private def inUnitInterval(score: Column): Column =
    when(score < lit(0.0) || score > lit(1.0),
      raise_error(concat(
        lit("classifier: curve/AUC score out of [0,1] (the bounded-" +
          "aggregate contract; normalize or clamp first): "),
        score.cast("string"))))
      .otherwise(score)

  /** Exact precision/recall curve over a SCORED corpus — the
    * threshold-calibration step between training a quality classifier
    * and deploying it as a filter: one row per distinct (rounded)
    * score `thr`, with the confusion counts and precision/recall of
    * the rule `keep iff score ≥ thr`.
    *
    * Scale shape: scores are REQUIRED to lie in [0, 1] (loud map-side
    * guard, see [[inUnitInterval]]) and quantize to `scale` dp, so the
    * groupBy exchange carries AT MOST 10^scale + 1 rows regardless of
    * corpus size, and the cumulative window runs over that bounded
    * aggregate — never a global sort of the corpus (the
    * [[Quantiles.exactQuantiles]] bounded-domain stance applied to
    * curve construction). Counts are exact: 0/1 labels sum without
    * float error. Rows with a null score or label are excluded. */
  def prCurve(df: DataFrame, score: String, label: String,
              scale: Int = 6): DataFrame =
    prCurveTail(scoreAggregate(df, score, label, scale))

  /** The mergeable per-score CALIBRATION AGGREGATE both [[prCurve]]
    * and [[rocAuc]] reduce to: one row per rounded score —
    * `(thr, n, pos)` with exact integer counts — an additive MONOID
    * (component-wise sum merges two aggregates losslessly). That
    * mergeability is what makes classifier calibration maintainable
    * INCREMENTALLY: a monitoring stream accretes per-batch aggregates
    * ([[CalibrationIndex]], `EventStream.calibrationSink`) and the
    * curve/AUC derive on read from the folded store — the corpus is
    * never re-scanned. Bounded at 10^scale + 1 rows (score ∈ [0,1],
    * the [[inUnitInterval]] guard rides the projection). */
  def scoreAggregate(df: DataFrame, score: String, label: String,
                     scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 6,
      s"classifier: scoreAggregate scale must be in [0,6]: $scale")
    df.filter(col(score).isNotNull && col(label).isNotNull)
      .groupBy(roundHalfUp(inUnitInterval(col(score)), scale).as("thr"))
      .agg(count(lit(1)).as("n"),
        sum(col(label).cast("double")).cast("long").as("pos"))
  }

  /** [[prCurve]] from a (possibly multi-batch) `(thr, n, pos)`
    * aggregate: folds duplicate `thr` rows by the monoid sum first, so
    * it accepts a raw accreted store as-is — identity on an
    * already-folded aggregate. The cumulative window runs over the
    * bounded aggregate (the [[inUnitInterval]] guard re-checks `thr`
    * on this public entry point). */
  def prCurveFromAggregate(agg: DataFrame): DataFrame =
    prCurveTail(foldAggregate(agg))

  /** The monoid fold shared by the from-aggregate entry points: sum
    * duplicate `thr` rows (identity on a folded aggregate), with the
    * [[inUnitInterval]] guard re-checked on this public boundary.
    * The direct [[prCurve]]/[[rocAuc]] paths skip it — their
    * [[scoreAggregate]] is folded by construction, and the skip keeps
    * their plans at ONE groupBy exchange (PlanSpec-pinned). */
  private def foldAggregate(agg: DataFrame): DataFrame =
    agg.groupBy(inUnitInterval(col("thr")).as("thr"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))

  private def prCurveTail(agg: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("thr").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    agg.select(col("thr"), col("n").as("_n"), col("pos").as("_pos"))
      .withColumn("tp", sum("_pos").over(w).cast("long"))
      .withColumn("_nge", sum("_n").over(w))
      .withColumn("_p", sum("_pos").over(all).cast("long"))
      .select(col("thr"), col("tp"),
        (col("_nge") - col("tp")).cast("long").as("fp"),
        (col("_p") - col("tp")).cast("long").as("fn"),
        roundHalfUp(col("tp") / col("_nge").cast("double"), 6)
          .as("precision"),
        roundHalfUp(col("tp") /
          nullif(col("_p"), lit(0L)).cast("double"), 6).as("recall"))
  }

  /** Exact ROC AUC over a scored corpus — the Mann–Whitney U with
    * AVERAGE ranks for tied scores, computed from the SAME bounded
    * per-score aggregate as [[prCurve]] (same score ∈ [0,1] contract,
    * loudly guarded — see [[inUnitInterval]]): one groups exchange of
    * at most 10^scale + 1 rows + one ordered pass over it, never a
    * corpus sort. All rank sums are integer-valued (average ranks are
    * exact halves), so the only rounding is the final 6dp division.
    * Returns one row (pos, neg, auc·6dp); `auc` is null when either
    * class is absent (AUC is undefined, surfaced instead of 0.5). */
  def rocAuc(df: DataFrame, score: String, label: String,
             scale: Int = 6): DataFrame =
    rocAucTail(scoreAggregate(df, score, label, scale))

  /** [[rocAuc]] from a (possibly multi-batch) `(thr, n, pos)`
    * aggregate — the monoid-fold + Mann–Whitney tail, for deriving
    * AUC from an accreted [[CalibrationIndex]] store on read. */
  def rocAucFromAggregate(agg: DataFrame): DataFrame =
    rocAucTail(foldAggregate(agg))

  private def rocAucTail(agg: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("thr").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    agg.select(col("thr"), col("n").as("_n"), col("pos").as("_pos"))
      // average rank of a tie group = ranks-before + (n+1)/2; the
      // positive-rank sum S feeds U = S - P(P+1)/2, AUC = U / (P·N)
      .withColumn("_before", sum("_n").over(w) - col("_n"))
      .agg(
        sum(col("_pos") * (col("_before") +
          (col("_n") + lit(1L)) / lit(2.0))).as("_s"),
        sum("_pos").as("_p"), sum("_n").as("_nn"))
      .select(col("_p").cast("long").as("pos"),
        (col("_nn") - col("_p")).cast("long").as("neg"),
        roundHalfUp(
          (col("_s") - col("_p") * (col("_p") + lit(1.0)) / lit(2.0)) /
            nullif(col("_p") * (col("_nn") - col("_p")), lit(0.0)), 6)
          .as("auc"))
  }

  /** GROUPED calibration — the multi-source production shape: one
    * filter deployed over a sharded/multi-domain corpus is monitored
    * PER SOURCE, because aggregate honesty can hide per-source drift
    * (a filter can be calibrated overall while badly over-confident
    * on one domain). [[scoreAggregateBy]] is the grouped monoid
    * (group, thr, n, pos) — still an additive fold, bounded at
    * groups × (10^scale + 1) rows; [[prCurveBy]], [[rocAucBy]] and
    * [[calibrationErrorBy]] derive per-group metrics from it with
    * windows PARTITIONED on the group (each group's cumulative pass
    * is its own task — never one global sort). Rows with a null
    * group are excluded (the grouped-operator null contract). */
  def scoreAggregateBy(df: DataFrame, group: String, score: String,
                       label: String, scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 6,
      s"classifier: scoreAggregateBy scale must be in [0,6]: $scale")
    df.filter(col(group).isNotNull && col(score).isNotNull &&
        col(label).isNotNull)
      .groupBy(col(group),
        roundHalfUp(inUnitInterval(col(score)), scale).as("thr"))
      .agg(count(lit(1)).as("n"),
        sum(col(label).cast("double")).cast("long").as("pos"))
  }

  /** The grouped monoid fold — sums duplicate `(group, thr)` rows
    * (identity on a folded aggregate), the entry point for reads
    * over an accreted PER-SOURCE store; the domain guard re-checks
    * `thr` on this public boundary. */
  private def foldAggregateBy(agg: DataFrame, group: String): DataFrame =
    agg.groupBy(col(group), inUnitInterval(col("thr")).as("thr"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))

  /** Per-group [[prCurve]]: (group, thr, tp, fp, fn, precision,
    * recall), the rule `keep iff score ≥ thr` evaluated within each
    * group. */
  def prCurveBy(df: DataFrame, group: String, score: String,
                label: String, scale: Int = 6): DataFrame =
    prCurveByTail(scoreAggregateBy(df, group, score, label, scale),
      group)

  /** [[prCurveBy]] from an accreted `(group, thr, n, pos)` aggregate
    * (fold-first; identity on a folded store). */
  def prCurveByFromAggregate(agg: DataFrame, group: String): DataFrame =
    prCurveByTail(foldAggregateBy(agg, group), group)

  private def prCurveByTail(agg: DataFrame, group: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("thr").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
    agg
      .withColumn("tp", sum("pos").over(w).cast("long"))
      .withColumn("_nge", sum("n").over(w))
      .withColumn("_p", sum("pos").over(all).cast("long"))
      .select(col(group), col("thr"), col("tp"),
        (col("_nge") - col("tp")).cast("long").as("fp"),
        (col("_p") - col("tp")).cast("long").as("fn"),
        roundHalfUp(col("tp") / col("_nge").cast("double"), 6)
          .as("precision"),
        roundHalfUp(col("tp") /
          nullif(col("_p"), lit(0L)).cast("double"), 6).as("recall"))
  }

  /** Per-group [[rocAuc]]: (group, pos, neg, auc) — the tie-averaged
    * Mann–Whitney fold within each group; `auc` null where a group
    * has one class only. */
  def rocAucBy(df: DataFrame, group: String, score: String,
               label: String, scale: Int = 6): DataFrame =
    rocAucByTail(scoreAggregateBy(df, group, score, label, scale),
      group)

  /** [[rocAucBy]] from an accreted `(group, thr, n, pos)`
    * aggregate. */
  def rocAucByFromAggregate(agg: DataFrame, group: String): DataFrame =
    rocAucByTail(foldAggregateBy(agg, group), group)

  private def rocAucByTail(agg: DataFrame, group: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("thr").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    agg
      .withColumn("_before", sum("n").over(w) - col("n"))
      .groupBy(col(group))
      .agg(
        sum(col("pos") * (col("_before") +
          (col("n") + lit(1L)) / lit(2.0))).as("_s"),
        sum("pos").as("_p"), sum("n").as("_nn"))
      .select(col(group), col("_p").cast("long").as("pos"),
        (col("_nn") - col("_p")).cast("long").as("neg"),
        roundHalfUp(
          (col("_s") - col("_p") * (col("_p") + lit(1.0)) / lit(2.0)) /
            nullif(col("_p") * (col("_nn") - col("_p")), lit(0.0)), 6)
          .as("auc"))
  }

  /** Per-group [[calibrationError]]: (group, n, ece) — the same
    * all-integer binned fold, run within each group. */
  def calibrationErrorBy(df: DataFrame, group: String, score: String,
                         label: String, bins: Int = 10,
                         scale: Int = 6): DataFrame =
    eceByTail(scoreAggregateBy(df, group, score, label, scale),
      group, bins)

  /** [[calibrationErrorBy]] from an accreted `(group, thr, n, pos)`
    * aggregate. */
  def eceByFromAggregate(agg: DataFrame, group: String,
                         bins: Int = 10): DataFrame =
    eceByTail(foldAggregateBy(agg, group), group, bins)

  private def eceByTail(agg: DataFrame, group: String,
                        bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 1000000,
      s"classifier: bins must be in [1, 10^6]: $bins")
    val k = latticeOf(col("thr"))
    val bin = least(
      floor((k * lit(bins.toLong)) / lit(1000000L)).cast("long"),
      lit(bins.toLong - 1))
    agg
      .groupBy(col(group), bin.as("_bin"))
      .agg(sum(col("n")).as("_nb"), sum(col("pos")).as("_pb"),
        sum(col("n") * k).as("_sk"))
      .groupBy(col(group))
      .agg(sum(col("_nb")).as("_n"),
        sum(abs(col("_pb") * lit(1000000L) - col("_sk"))).as("_num"))
      .select(col(group), col("_n").cast("long").as("n"),
        roundHalfUp(col("_num") /
          (lit(1.0e6) * nullif(col("_n"), lit(0L))), 6).as("ece"))
  }

  /** Per-group [[brierScore]]: (group, n, brier) — the per-source
    * proper scoring rule, the same DECIMAL(38,0) exact-integer fold
    * run within each group (a filter can hold a good corpus-wide
    * Brier while one source's forecasts rot). */
  def brierScoreBy(df: DataFrame, group: String, score: String,
                   label: String, scale: Int = 6): DataFrame =
    brierByTail(scoreAggregateBy(df, group, score, label, scale), group)

  /** [[brierScoreBy]] from an accreted `(group, thr, n, pos)`
    * aggregate (fold-first; identity on a folded store). */
  def brierByFromAggregate(agg: DataFrame, group: String): DataFrame =
    brierByTail(foldAggregateBy(agg, group), group)

  private def brierByTail(agg: DataFrame, group: String): DataFrame = {
    val k = latticeOf(col("thr"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    agg.groupBy(col(group))
      .agg(
        sum(col("n")).as("_n"),
        sum(col("n").cast(dec) * (k * k)).as("_skk"),
        sum(col("pos").cast(dec) * k).as("_skp"),
        sum(col("pos")).as("_p"))
      .select(col(group), col("_n").cast("long").as("n"),
        roundHalfUp(
          (col("_skk") - lit(2000000L) * col("_skp") +
            lit(1000000000000L) * col("_p").cast(dec)).cast("double") /
            (lit(1.0e12) * nullif(col("_n"), lit(0L))), 6).as("brier"))
  }

  /** Per-group [[reliability]]: one row per non-empty (group, bin) —
    * WHICH confidence region of WHICH source went dishonest, the
    * drill-down behind a moving per-source ECE. Same exact-integer
    * numerators, grouped. */
  def reliabilityBy(df: DataFrame, group: String, score: String,
                    label: String, bins: Int = 10,
                    scale: Int = 6): DataFrame =
    reliabilityByTail(scoreAggregateBy(df, group, score, label, scale),
      group, bins)

  /** [[reliabilityBy]] from an accreted `(group, thr, n, pos)`
    * aggregate (fold-first; identity on a folded store). */
  def reliabilityByFromAggregate(agg: DataFrame, group: String,
                                 bins: Int = 10): DataFrame =
    reliabilityByTail(foldAggregateBy(agg, group), group, bins)

  private def reliabilityByTail(agg: DataFrame, group: String,
                                bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 1000000,
      s"classifier: bins must be in [1, 10^6]: $bins")
    val k = latticeOf(col("thr"))
    val bin = least(
      floor((k * lit(bins.toLong)) / lit(1000000L)).cast("long"),
      lit(bins.toLong - 1))
    agg.groupBy(col(group), bin.as("bin"))
      .agg(sum(col("n")).as("_nb"), sum(col("pos")).as("_pb"),
        sum(col("n") * k).as("_sk"))
      .select(col(group), col("bin"), col("_nb").cast("long").as("n"),
        roundHalfUp(col("_sk") /
          (lit(1.0e6) * col("_nb")), 6).as("confidence"),
        roundHalfUp(col("_pb") / col("_nb").cast("double"), 6)
          .as("accuracy"),
        roundHalfUp((col("_pb") * lit(1000000L) - col("_sk")) /
          (lit(1.0e6) * col("_nb")), 6).as("gap"))
  }

  /** [[scoreDriftBy]] from two accreted `(group, thr, n, ...)`
    * aggregates — per-source drift between two store windows on
    * read; labels are ignored if present. */
  def driftFromAggregatesBy(refAgg: DataFrame, curAgg: DataFrame,
                            group: String, bins: Int = 10): DataFrame = {
    def fold(a: DataFrame) = a
      .groupBy(col(group), inUnitInterval(col("thr")).as("thr"))
      .agg(sum(col("n")).as("n"))
    driftTailBy(fold(refAgg), fold(curAgg), group, bins)
  }

  /** The 1e-6 lattice index of a rounded score: `thr` is always a
    * multiple of 1e-6 (scale ≤ 6 by [[scoreAggregate]]'s contract),
    * so `round(thr·10^6)` recovers the EXACT integer k with thr =
    * k/10^6 — the currency of the exact-integer calibration folds
    * below (the [[graft.ops.Mixing]] scaled-long stance). */
  private def latticeOf(thr: Column): Column =
    roundHalfUp(thr * lit(1.0e6), 0).cast("long")

  /** EXPECTED CALIBRATION ERROR (Guo et al. 2017) — the standard
    * "is the deployed filter's confidence honest" monitor: scores
    * bucket into `bins` equal-width confidence bins over [0,1], and
    * ECE = Σ_b (n_b/N) · |accuracy_b − confidence_b|. Returns one row
    * (n, ece·6dp); `ece` is null on an empty input.
    *
    * Derived ENTIRELY from the bounded [[scoreAggregate]] monoid, so
    * it composes with the incremental [[CalibrationIndex]] store
    * ([[eceFromAggregate]]) — monitoring never re-scans a corpus.
    * Exactness: with k the score's 1e-6 lattice index, the per-bin
    * term n_b/N·|acc − conf| equals |pos_b·10^6 − Σ(n·k)_b| /
    * (10^6·N) — ALL-INTEGER numerators (order-independent exact
    * sums; bounds hold to N < 9·10^12 rows), one division, one 6dp
    * rounding. The oracle replays the identical integer arithmetic. */
  def calibrationError(df: DataFrame, score: String, label: String,
                       bins: Int = 10, scale: Int = 6): DataFrame =
    eceTail(scoreAggregate(df, score, label, scale), bins)

  /** [[calibrationError]] from an accreted `(thr, n, pos)` aggregate
    * (fold-first; identity on a folded store). */
  def eceFromAggregate(agg: DataFrame, bins: Int = 10): DataFrame =
    eceTail(foldAggregate(agg), bins)

  private def eceTail(agg: DataFrame, bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 1000000,
      s"classifier: bins must be in [1, 10^6]: $bins")
    val k = latticeOf(col("thr"))
    // equal-width bins over the lattice: bin = min(k·B div 10^6, B−1)
    // — floor division (Column./ is DOUBLE division; k·B ≤ 10^12 is
    // exactly representable, so floor(÷) IS the integer quotient),
    // thr = 1.0 clamps into the last bin
    val bin = least(
      floor((k * lit(bins.toLong)) / lit(1000000L)).cast("long"),
      lit(bins.toLong - 1))
    agg.groupBy(bin.as("_bin"))
      .agg(sum(col("n")).as("_nb"), sum(col("pos")).as("_pb"),
        sum(col("n") * k).as("_sk"))
      .agg(sum(col("_nb")).as("_n"),
        sum(abs(col("_pb") * lit(1000000L) - col("_sk"))).as("_num"))
      // empty input: zero bins -> null sums; surface n = 0, ece null
      .select(coalesce(col("_n"), lit(0L)).cast("long").as("n"),
        roundHalfUp(col("_num") /
          (lit(1.0e6) * nullif(col("_n"), lit(0L))), 6).as("ece"))
  }

  /** BRIER SCORE — mean squared error of the probability forecast,
    * `Σ (p − y)² / N`: the proper scoring rule complementing
    * [[rocAuc]] (ranking) and [[calibrationError]] (binned honesty).
    * Returns one row (n, brier·6dp); null on empty input. Derived
    * from the same [[scoreAggregate]] monoid: with y ∈ {0,1},
    * Σ(p−y)² = Σ_thr [n·thr² − 2·thr·pos + pos] =
    * (Σ n·k² − 2·10^6·Σ k·pos + 10^12·Σ pos) / 10^12 — the sums run
    * over DECIMAL(38,0) (exact, order-independent, no overflow to
    * ~10^26 rows), one division, one 6dp rounding; the oracle replays
    * the identical integer arithmetic over HUGEINT. */
  def brierScore(df: DataFrame, score: String, label: String,
                 scale: Int = 6): DataFrame =
    brierTail(scoreAggregate(df, score, label, scale))

  /** [[brierScore]] from an accreted `(thr, n, pos)` aggregate. */
  def brierFromAggregate(agg: DataFrame): DataFrame =
    brierTail(foldAggregate(agg))

  private def brierTail(agg: DataFrame): DataFrame = {
    val k = latticeOf(col("thr"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    agg.agg(
        sum(col("n")).as("_n"),
        sum(col("n").cast(dec) * (k * k)).as("_skk"),
        sum(col("pos").cast(dec) * k).as("_skp"),
        sum(col("pos")).as("_p"))
      .select(coalesce(col("_n"), lit(0L)).cast("long").as("n"),
        // the numerator Σ(p−y)²·10^12 is an exact non-negative
        // integer — combine in DECIMAL, convert to double ONCE
        roundHalfUp(
          (col("_skk") - lit(2000000L) * col("_skp") +
            lit(1000000000000L) * col("_p").cast(dec)).cast("double") /
            (lit(1.0e12) * nullif(col("_n"), lit(0L))), 6).as("brier"))
  }

  /** RELIABILITY DIAGRAM — the per-bin detail [[calibrationError]]
    * summarizes: one row per non-empty equal-width confidence bin,
    * `(bin, n, confidence, accuracy, gap)` with `confidence` the mean
    * predicted score in the bin, `accuracy` the empirical positive
    * rate, and `gap = accuracy − confidence` (signed: a negative gap
    * is over-confidence). The drill-down a monitoring dashboard plots
    * when ECE moves — WHICH confidence region went dishonest.
    *
    * Same exactness as ECE: on the 1e-6 lattice, confidence =
    * Σ(n·k)_b / (10^6·n_b), accuracy = pos_b / n_b and gap =
    * (pos_b·10^6 − Σ(n·k)_b) / (10^6·n_b) all have exact integer
    * numerators (order-independent sums), one division + one 6dp
    * rounding each. Derived from the bounded [[scoreAggregate]]
    * monoid, so it composes with the [[CalibrationIndex]] store. */
  def reliability(df: DataFrame, score: String, label: String,
                  bins: Int = 10, scale: Int = 6): DataFrame =
    reliabilityTail(scoreAggregate(df, score, label, scale), bins)

  /** [[reliability]] from an accreted `(thr, n, pos)` aggregate
    * (fold-first; identity on a folded store). */
  def reliabilityFromAggregate(agg: DataFrame,
                               bins: Int = 10): DataFrame =
    reliabilityTail(foldAggregate(agg), bins)

  private def reliabilityTail(agg: DataFrame, bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 1000000,
      s"classifier: bins must be in [1, 10^6]: $bins")
    val k = latticeOf(col("thr"))
    val bin = least(
      floor((k * lit(bins.toLong)) / lit(1000000L)).cast("long"),
      lit(bins.toLong - 1))
    agg.groupBy(bin.as("bin"))
      .agg(sum(col("n")).as("_nb"), sum(col("pos")).as("_pb"),
        sum(col("n") * k).as("_sk"))
      .select(col("bin"), col("_nb").cast("long").as("n"),
        roundHalfUp(col("_sk") /
          (lit(1.0e6) * col("_nb")), 6).as("confidence"),
        roundHalfUp(col("_pb") / col("_nb").cast("double"), 6)
          .as("accuracy"),
        roundHalfUp((col("_pb") * lit(1000000L) - col("_sk")) /
          (lit(1.0e6) * col("_nb")), 6).as("gap"))
  }

  /** OPERATING-POINT SELECTION — the step between calibrating a
    * classifier and freezing it into a funnel gate: the threshold
    * maximizing F_β over the exact [[prCurve]] confusion counts.
    * Returns one row `(thr, tp, fp, fn, fbeta)`; empty on an empty
    * input. Ties in the 6dp-rounded F_β break toward the LARGER
    * threshold (the conservative gate: the stricter filter at equal
    * quality) — a deterministic rule both engines replay.
    *
    * Runs entirely on the bounded per-score aggregate (≤ 10^scale + 1
    * rows): the confusion counts are exact integers < 2^53, so every
    * F_β arithmetic step is an exactly-rounded IEEE op — bit-equal
    * across engines — before the single 6dp rounding. β is pinned to
    * rational-friendly values by callers that need replay (β = 1 uses
    * exactly 2.0 and 1.0 as the coefficients). */
  def bestThreshold(df: DataFrame, score: String, label: String,
                    beta: Double = 1.0, scale: Int = 6): DataFrame =
    bestThresholdTail(scoreAggregate(df, score, label, scale), beta)

  /** [[bestThreshold]] from an accreted `(thr, n, pos)` aggregate. */
  def bestThresholdFromAggregate(agg: DataFrame,
                                 beta: Double = 1.0): DataFrame =
    bestThresholdTail(foldAggregate(agg), beta)

  private def bestThresholdTail(agg: DataFrame,
                                beta: Double): DataFrame = {
    require(beta > 0, s"classifier: beta must be > 0: $beta")
    val c1 = 1.0 + beta * beta // F_β numerator coefficient
    val c2 = beta * beta
    prCurveTail(agg)
      .withColumn("fbeta", roundHalfUp(
        (lit(c1) * col("tp")) /
          (lit(c1) * col("tp") + lit(c2) * col("fn") + col("fp")), 6))
      // max over the bounded curve; struct order = (fbeta, thr, ...)
      // gives the larger-thr tie rule for free
      .agg(max(struct(col("fbeta"), col("thr"), col("tp"), col("fp"),
        col("fn"))).as("_m"))
      .select(col("_m.thr").as("thr"), col("_m.tp").as("tp"),
        col("_m.fp").as("fp"), col("_m.fn").as("fn"),
        col("_m.fbeta").as("fbeta"))
      .filter(col("thr").isNotNull) // empty aggregate -> empty result
  }

  /** Per-source [[bestThreshold]]: the F_β-optimal operating point
    * WITHIN each group — the per-domain `minP` reality of a deployed
    * multi-source funnel (one global threshold over-filters the
    * domain whose score distribution sits low). Same larger-thr tie
    * rule, replayed per group. Returns
    * (group, thr, tp, fp, fn, fbeta). */
  def bestThresholdBy(df: DataFrame, group: String, score: String,
                      label: String, beta: Double = 1.0,
                      scale: Int = 6): DataFrame =
    bestThresholdByTail(scoreAggregateBy(df, group, score, label, scale),
      group, beta)

  /** [[bestThresholdBy]] from an accreted `(group, thr, n, pos)`
    * aggregate — the per-source RE-CALIBRATION read of a deployed
    * multi-source gate: each source's F_β-optimal `minP` derived from
    * its accumulated production batches ([[graft.ops.CalibrationIndex
    * .bestThresholdBy]]), without re-scanning a scored row. */
  def bestThresholdByFromAggregate(agg: DataFrame, group: String,
                                   beta: Double = 1.0): DataFrame =
    bestThresholdByTail(foldAggregateBy(agg, group), group, beta)

  private def bestThresholdByTail(agg: DataFrame, group: String,
                                  beta: Double): DataFrame = {
    require(beta > 0, s"classifier: beta must be > 0: $beta")
    val c1 = 1.0 + beta * beta
    val c2 = beta * beta
    prCurveByTail(agg, group)
      .withColumn("fbeta", roundHalfUp(
        (lit(c1) * col("tp")) /
          (lit(c1) * col("tp") + lit(c2) * col("fn") + col("fp")), 6))
      .groupBy(col(group))
      .agg(max(struct(col("fbeta"), col("thr"), col("tp"), col("fp"),
        col("fn"))).as("_m"))
      .select(col(group), col("_m.thr").as("thr"),
        col("_m.tp").as("tp"), col("_m.fp").as("fp"),
        col("_m.fn").as("fn"), col("_m.fbeta").as("fbeta"))
  }

  /** Per-source [[scoreDriftKs]]: the exact sup-CDF gap within each
    * group, on the merged per-(group, thr) aggregate — groups seen in
    * only one window read `ks` null (a one-sided KS is undefined,
    * surfaced instead of 0 or 1). */
  def scoreDriftKsBy(ref: DataFrame, cur: DataFrame, group: String,
                     score: String, scale: Int = 6): DataFrame =
    ksTailBy(scoreHistogramBy(ref, group, score, scale),
      scoreHistogramBy(cur, group, score, scale), group)

  /** [[scoreDriftKsBy]] from two accreted `(group, thr, n, ...)`
    * aggregates — per-source KS between two [[graft.ops
    * .CalibrationIndex]] tag windows on read; labels (a `pos` column)
    * are ignored if present. */
  def ksFromAggregatesBy(refAgg: DataFrame, curAgg: DataFrame,
                         group: String): DataFrame = {
    def fold(a: DataFrame) = a
      .groupBy(col(group), inUnitInterval(col("thr")).as("thr"))
      .agg(sum(col("n")).as("n"))
    ksTailBy(fold(refAgg), fold(curAgg), group)
  }

  private def ksTailBy(refH: DataFrame, curH: DataFrame,
                       group: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("thr"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    refH.select(col(group), col("thr"), col("n").as("_r"))
      .join(curH.select(col(group), col("thr"), col("n").as("_c")),
        Seq(group, "thr"), "full_outer")
      .select(col(group), col("thr"),
        coalesce(col("_r"), lit(0L)).as("nr"),
        coalesce(col("_c"), lit(0L)).as("nc"))
      .withColumn("ca", sum("nr").over(w))
      .withColumn("cb", sum("nc").over(w))
      .withColumn("ta", sum("nr").over(all))
      .withColumn("tb", sum("nc").over(all))
      .groupBy(col(group))
      .agg(
        max(abs(col("ca").cast(dec) * col("tb") -
          col("cb").cast(dec) * col("ta"))).as("_num"),
        max("ta").as("_ta"), max("tb").as("_tb"))
      .select(col(group),
        col("_ta").cast("long").as("n_ref"),
        col("_tb").cast("long").as("n_cur"),
        roundHalfUp(col("_num").cast("double") /
          (nullif(col("_ta"), lit(0L)).cast("double") *
            nullif(col("_tb"), lit(0L)).cast("double")), 6).as("ks"))
  }

  /** The UNLABELED per-score histogram `(thr, n)` — the score-only
    * sibling of [[scoreAggregate]] for monitoring PRODUCTION traffic,
    * where labels don't exist but the score distribution still tells
    * you the input population moved. Same additive monoid, same
    * [0,1]-domain guard, same ≤ 10^scale + 1 bound. */
  def scoreHistogram(df: DataFrame, score: String,
                     scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 6,
      s"classifier: scoreHistogram scale must be in [0,6]: $scale")
    df.filter(col(score).isNotNull)
      .groupBy(roundHalfUp(inUnitInterval(col(score)), scale).as("thr"))
      .agg(count(lit(1)).as("n"))
  }

  /** SCORE-DISTRIBUTION DRIFT between a reference window and a
    * current window — the Population Stability Index, the standard
    * "did the input population move under my deployed filter" monitor
    * (and the one that needs NO labels): bin both score distributions
    * into `bins` equal-width bins over [0,1] and fold
    * `PSI = Σ_b (q_b − p_b) · ln(q_b / p_b)` with p the reference
    * share and q the current share. Returns one row
    * `(n_ref, n_cur, psi)`; PSI ≥ 0, 0 iff the binned shares match,
    * symmetric under window swap. Rule of thumb: < 0.1 stable,
    * > 0.25 population shift.
    *
    * Empty bins: shares are Laplace-smoothed — `p_b = (n_b + 1) /
    * (N + bins)` — so every term is finite and deterministic with no
    * epsilon clamp; the full bin spine (including bins empty on BOTH
    * sides) participates, which keeps the smoothed shares a true
    * distribution.
    *
    * Scale shape: each side reduces to its bounded [[scoreHistogram]]
    * (one exchange of ≤ 10^scale + 1 rows); everything after runs on
    * ≤ `bins` rows. Exactness: shares are exact-integer divisions
    * (deterministic doubles), each bin's term is HALF_UP-quantized to
    * the 1e-9 lattice and the fold sums LONGS — order-independent,
    * the [[Mixing]] canonical-fold stance — with `ln`'s potential ulp
    * wobble absorbed per-term (the q_perplexity precedent). */
  def scoreDrift(ref: DataFrame, cur: DataFrame, score: String,
                 bins: Int = 10, scale: Int = 6): DataFrame =
    driftTail(scoreHistogram(ref, score, scale),
      scoreHistogram(cur, score, scale), bins)

  /** [[scoreDrift]] from two accreted `(thr, n, ...)` aggregates —
    * drift between two [[CalibrationIndex]] tag windows on read;
    * labels (a `pos` column) are ignored if present. */
  def driftFromAggregates(refAgg: DataFrame, curAgg: DataFrame,
                          bins: Int = 10): DataFrame = {
    def fold(a: DataFrame) = a
      .groupBy(inUnitInterval(col("thr")).as("thr"))
      .agg(sum(col("n")).as("n"))
    driftTail(fold(refAgg), fold(curAgg), bins)
  }

  /** The GROUPED per-score histogram `(group, thr, n)` — unlabeled,
    * per source. Null groups excluded. */
  def scoreHistogramBy(df: DataFrame, group: String, score: String,
                       scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 6,
      s"classifier: scoreHistogramBy scale must be in [0,6]: $scale")
    df.filter(col(group).isNotNull && col(score).isNotNull)
      .groupBy(col(group),
        roundHalfUp(inUnitInterval(col(score)), scale).as("thr"))
      .agg(count(lit(1)).as("n"))
  }

  /** PER-SOURCE drift: [[scoreDrift]] evaluated within each group —
    * `(group, n_ref, n_cur, psi)` — because an aggregate PSI can
    * read stable while one ingestion source quietly moved (the
    * [[scoreAggregateBy]] rationale applied to the label-free
    * monitor). The bin spine covers every group present in EITHER
    * window (a source absent from one side still gets an honest,
    * fully-smoothed PSI); group cardinality is source-count-bounded
    * by contract, so the spine is groups × bins rows. */
  def scoreDriftBy(ref: DataFrame, cur: DataFrame, group: String,
                   score: String, bins: Int = 10,
                   scale: Int = 6): DataFrame =
    driftTailBy(scoreHistogramBy(ref, group, score, scale),
      scoreHistogramBy(cur, group, score, scale), group, bins)

  private def driftTailBy(refH: DataFrame, curH: DataFrame,
                          group: String, bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 1000000,
      s"classifier: bins must be in [1, 10^6]: $bins")
    def binned(h: DataFrame, out: String) = {
      val k = latticeOf(col("thr"))
      h.groupBy(col(group), least(
          floor((k * lit(bins.toLong)) / lit(1000000L)).cast("long"),
          lit(bins.toLong - 1)).as("bin"))
        .agg(sum(col("n")).as(out))
    }
    val grp = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
    // groups × bins spine as a MAP-SIDE explode over the distinct
    // groups (never a cross join — no nested-loop node, and the
    // spine stays group-count-bounded by contract)
    val spine = refH.select(col(group)).distinct()
      .unionByName(curH.select(col(group)).distinct()).distinct()
      .withColumn("bin",
        explode(sequence(lit(0L), lit(bins.toLong - 1L))))
    val j = spine
      .join(binned(refH, "_nr"), Seq(group, "bin"), "left")
      .join(binned(curH, "_nc"), Seq(group, "bin"), "left")
      .select(col(group), col("bin"),
        coalesce(col("_nr"), lit(0L)).as("nr"),
        coalesce(col("_nc"), lit(0L)).as("nc"))
      .withColumn("tr", sum("nr").over(grp))
      .withColumn("tc", sum("nc").over(grp))
    val p = (col("nr") + lit(1L)) / (col("tr") + lit(bins.toLong))
    val q = (col("nc") + lit(1L)) / (col("tc") + lit(bins.toLong))
    j.withColumn("_tq",
        roundHalfUp((q - p) * log(q / p) * lit(1.0e9), 0).cast("long"))
      .groupBy(col(group))
      .agg(sum("nr").cast("long").as("n_ref"),
        sum("nc").cast("long").as("n_cur"),
        roundHalfUp(sum("_tq") / lit(1.0e9), 6).as("psi"))
  }

  /** KOLMOGOROV–SMIRNOV two-sample drift — [[scoreDrift]]'s
    * binning-free companion: `KS = sup_t |CDF_ref(t) − CDF_cur(t)|`
    * over the two score distributions, evaluated EXACTLY on the
    * merged per-score aggregate (for step CDFs the supremum sits at
    * a jump point, so the max over merged thresholds IS the
    * statistic). Where PSI needs bins and smoothing, KS needs
    * neither — no ln, no Laplace: the per-threshold numerator
    * |cum_ref·N_cur − cum_cur·N_ref| is an exact DECIMAL(38,0)
    * integer (order-independent sums; no overflow to ~10^18 rows a
    * side), and the single division + 6dp rounding happen once.
    * Returns one row `(n_ref, n_cur, ks)`; `ks` ∈ [0,1], 0 iff the
    * rounded-score distributions coincide, null when either window
    * is empty (undefined, surfaced instead of 0).
    *
    * Scale shape: each side reduces to its bounded [[scoreHistogram]]
    * (≤ 10^scale + 1 rows); the merged full-outer join and the
    * cumulative pass run on that bounded union — never a corpus
    * sort. */
  def scoreDriftKs(ref: DataFrame, cur: DataFrame, score: String,
                   scale: Int = 6): DataFrame =
    ksTail(scoreHistogram(ref, score, scale),
      scoreHistogram(cur, score, scale))

  /** [[scoreDriftKs]] from two accreted `(thr, n, ...)` aggregates —
    * KS between two [[CalibrationIndex]] tag windows on read. */
  def ksFromAggregates(refAgg: DataFrame,
                       curAgg: DataFrame): DataFrame = {
    def fold(a: DataFrame) = a
      .groupBy(inUnitInterval(col("thr")).as("thr"))
      .agg(sum(col("n")).as("n"))
    ksTail(fold(refAgg), fold(curAgg))
  }

  private def ksTail(refH: DataFrame, curH: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("thr"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    refH.select(col("thr"), col("n").as("_r"))
      .join(curH.select(col("thr"), col("n").as("_c")),
        Seq("thr"), "full_outer")
      .select(col("thr"), coalesce(col("_r"), lit(0L)).as("nr"),
        coalesce(col("_c"), lit(0L)).as("nc"))
      .withColumn("ca", sum("nr").over(w))
      .withColumn("cb", sum("nc").over(w))
      .withColumn("ta", sum("nr").over(all))
      .withColumn("tb", sum("nc").over(all))
      .agg(
        max(abs(col("ca").cast(dec) * col("tb") -
          col("cb").cast(dec) * col("ta"))).as("_num"),
        max("ta").as("_ta"), max("tb").as("_tb"))
      .select(coalesce(col("_ta"), lit(0L)).cast("long").as("n_ref"),
        coalesce(col("_tb"), lit(0L)).cast("long").as("n_cur"),
        roundHalfUp(col("_num").cast("double") /
          (nullif(col("_ta"), lit(0L)).cast("double") *
            nullif(col("_tb"), lit(0L)).cast("double")), 6).as("ks"))
  }

  private def driftTail(refH: DataFrame, curH: DataFrame,
                        bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 1000000,
      s"classifier: bins must be in [1, 10^6]: $bins")
    def binned(h: DataFrame, out: String) = {
      val k = latticeOf(col("thr"))
      h.groupBy(least(
          floor((k * lit(bins.toLong)) / lit(1000000L)).cast("long"),
          lit(bins.toLong - 1)).as("bin"))
        .agg(sum(col("n")).as(out))
    }
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val spine = refH.sparkSession.range(bins.toLong)
      .select(col("id").as("bin"))
    val j = spine
      .join(binned(refH, "_nr"), Seq("bin"), "left")
      .join(binned(curH, "_nc"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("_nr"), lit(0L)).as("nr"),
        coalesce(col("_nc"), lit(0L)).as("nc"))
      .withColumn("tr", sum("nr").over(all))
      .withColumn("tc", sum("nc").over(all))
    val p = (col("nr") + lit(1L)) / (col("tr") + lit(bins.toLong))
    val q = (col("nc") + lit(1L)) / (col("tc") + lit(bins.toLong))
    j.withColumn("_tq",
        roundHalfUp((q - p) * log(q / p) * lit(1.0e9), 0).cast("long"))
      .agg(sum("nr").cast("long").as("n_ref"),
        sum("nc").cast("long").as("n_cur"),
        roundHalfUp(sum("_tq") / lit(1.0e9), 6).as("psi"))
  }

  /** Score rows against fit weights: appends `out` = σ(w·x) rounded
    * HALF_UP to `scale` dp — one map-side projection, usable verbatim
    * inside a streaming foreachBatch. Rows with a null feature score
    * null (the fit exclusion, surfaced instead of silently 0.5). */
  def scoreLogistic(df: DataFrame, features: Seq[String],
                    weights: Seq[Double], out: String = "p",
                    scale: Int = 6): DataFrame = {
    require(weights.size == features.size + 1,
      s"classifier: ${features.size} features need ${features.size + 1}" +
        s" weights (bias first), got ${weights.size}")
    Reserved.requireAbsent(df, "scoreLogistic", Seq(out))
    df.withColumn(out, roundHalfUp(
      lit(1.0) / (lit(1.0) + exp(-zOf(features, weights))), scale))
  }
}
