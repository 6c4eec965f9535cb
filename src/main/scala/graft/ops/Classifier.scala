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

  /** Fit logistic-regression weights (bias first) by `iters` rounds of
    * full-batch gradient descent from w = 0 with MEAN gradients:
    * `w_j ← round(w_j − lr · avg((σ(w·x) − y) · x_j), scale)`.
    * One bounded exchange per round; loud on an empty trainable set. */
  def fitLogistic(df: DataFrame, features: Seq[String], label: String,
                  iters: Int = 3, lr: Double = 0.5,
                  scale: Int = 8): Array[Double] = {
    require(features.nonEmpty, "classifier: features must be non-empty")
    require(iters >= 1, s"classifier: iters must be >= 1: $iters")
    require(lr > 0, s"classifier: lr must be > 0: $lr")
    require(scale >= 0 && scale <= 12,
      s"classifier: scale must be in [0,12]: $scale")
    val clean = trainable(df, features, label)
    var w = Array.fill(features.size + 1)(0.0)
    for (_ <- 1 to iters) {
      val e = lit(1.0) / (lit(1.0) + exp(-zOf(features, w.toSeq))) -
        col(label).cast("double")
      val aggs = roundHalfUp(avg(e), scale).as("g0") +:
        features.zipWithIndex.map { case (f, j) =>
          roundHalfUp(avg(e * col(f)), scale).as(s"g${j + 1}")
        }
      val row = clean.agg(aggs.head, aggs.tail: _*).head()
      require(!row.isNullAt(0),
        "classifier: no trainable rows (all-null features/label?)")
      w = w.indices.map(j =>
        roundHalfUpDouble(w(j) - lr * row.getDouble(j), scale)).toArray
    }
    w
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
