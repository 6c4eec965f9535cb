package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.hashMod
import graft.functions.Rounding.roundHalfUp

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

  /** Driver-collect cardinality caps. The mixing contract is that
    * sources/groups are LANGUAGES or DOMAINS — dozens to hundreds —
    * and every driver collect here is bounded by that contract alone.
    * These caps turn a contract violation (a URL- or id-valued source
    * column, unbounded distinct values) into a loud, fast `require`
    * instead of a silent driver OOM: the source-count aggregate is
    * collected through `limit(cap + 1)` (never more than one row past
    * the cap on the driver), and the histogram aggregate is guarded by
    * a DISTRIBUTED count before any row ships — the 10M-row cap would
    * itself be hundreds of driver MB if collected to check. */
  private[graft] val maxSources = 10000
  private[graft] val maxHistRows = 10000000L

  /** [[selectToBudget]] routing threshold: inputs at or below this
    * row count take the naive per-group window, larger inputs the
    * two-pass histogram shape. Measured (§6, r14 300× probe — 1.5M
    * rows / 7 groups): the naive window stays absolutely faster
    * through the largest feasible probe (1.22 vs 1.89 s; slopes
    * 6.8e-7 vs 9.0e-7 s/row on 32 cores), i.e. there is NO timing
    * crossover while every group's sorted run fits one healthy task —
    * the two-pass's advantage is the regime the probe can't reach,
    * where a single group outgrows one task's sort/memory budget and
    * becomes a spilling straggler. The default therefore bounds the
    * WORST-CASE single-task sort: at or below 8M total rows even a
    * one-group input sorts ≤ 8M rows in one task (seconds, no spill
    * at curation row widths); beyond it the two-pass's per-task work
    * is bounded by bins regardless of group skew. Both paths are
    * bit-identical (MixingSpec pins equality across the switch
    * point). */
  private[graft] val defaultNaiveBelow = 8000000L

  private def requireStringSource(df: DataFrame, sourceCol: String): Unit =
    require(df.schema(sourceCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"mixing: source column '$sourceCol' must be STRING, got " +
        df.schema(sourceCol).dataType)

  private def sourceCounts(df: DataFrame, sourceCol: String): Map[String, Long] = {
    val rows = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .limit(maxSources + 1).collect()
    require(rows.length <= maxSources,
      s"mixing: > $maxSources distinct values in source column " +
        s"'$sourceCol' — mixing sources are languages/domains by " +
        "contract; a URL- or id-valued column would OOM the driver")
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

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
    * Determinism note: DYADIC alpha = k/2^m (m ≤ 20 — covers 0.5,
    * 0.25, 0.75, 0.375, …) routes through [[dyadicPow]]: a product of
    * repeated `math.sqrt` calls, each IEEE-754 CORRECTLY ROUNDED on
    * every conforming engine, combined by correctly-rounded multiplies
    * in a fixed order — so dyadic configurations' thresholds are
    * bit-portable to the DuckDB oracle (which replays the identical
    * sqrt/multiply chain). Non-dyadic alpha falls back to `math.pow`
    * (documented ≤1-ulp platform latitude; a cross-engine ulp could
    * flip a floor at an exact threshold boundary, so oracle-gated
    * configurations should stick to dyadic values). */
  def temperatureSample(df: DataFrame, sourceCol: String, idCol: String,
                        alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"mixing: alpha must be in (0,1]: $alpha")
    requireStringSource(df, sourceCol)
    val counts = sourceCounts(df, sourceCol)
    val weights = counts.collect { case (s, n) if n > 0 =>
      s -> dyadicPow(n.toDouble, alpha).getOrElse(
        math.pow(n.toDouble, alpha))
    }
    thresholdFilter(df, sourceCol, idCol, weights, counts)
  }

  /** x^alpha for dyadic alpha = k/2^m (m ≤ 20) as a bit-portable chain
    * of correctly-rounded operations: walk alpha's binary fraction
    * digits; the i-th set bit contributes sqrt^i(x) (sqrt applied i
    * times), and contributions multiply in INCREASING-i order. Every
    * step (sqrt, multiply) is IEEE-754 correctly rounded, so any
    * engine replaying the same chain — e.g. DuckDB's
    * `sqrt(n) * sqrt(sqrt(n))` for alpha = 0.75 — produces the
    * bit-identical double. alpha = 0.5 degenerates to the single
    * `math.sqrt` this function replaced. None for non-dyadic alpha
    * (the bits don't terminate within m = 20). */
  private[graft] def dyadicPow(x: Double, alpha: Double): Option[Double] = {
    if (alpha == 1.0) return Some(x)
    var frac = alpha
    var root = x
    var acc = 1.0
    var i = 0
    while (frac > 0.0 && i < 20) {
      i += 1
      root = math.sqrt(root)
      frac *= 2 // exact: scaling a binary fraction by 2
      if (frac >= 1.0) { acc *= root; frac -= 1.0 } // 1.0*r == r exactly
    }
    if (frac == 0.0) Some(acc) else None
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

  /** Per-word feature bucket for [[importanceWeights]], PORTABLE
    * variant: polynomial codepoint hash folded left-to-right,
    * `acc = (acc*31 + codepoint) mod 2^20`, then mod `buckets` — pure
    * integer arithmetic both engines replay exactly (DuckDB:
    * `list_reduce` over `unicode(w[i])`). A codegen'd native kernel
    * ([[graft.functions.Kernels.polyBucket]]): one tight per-word
    * loop, no per-char string array — the oracle-parity cost over
    * [[nativeWordBucket]] is the character fold itself, nothing
    * structural. */
  def portableWordBucket(w: Column, buckets: Int): Column =
    graft.functions.Expressions.poly_bucket(w, buckets.toLong)

  /** Engine-native bucket (xxhash64 — fast, NOT oracle-portable): the
    * production default; feature quality only needs hash uniformity. */
  def nativeWordBucket(w: Column, buckets: Int): Column =
    pmod(xxhash64(w), lit(buckets.toLong))

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-unigram bag is under
    * the TARGET distribution than under the RAW distribution —
    * `logweight(doc) = Σ_b c_b · (ln p̂_b − ln q̂_b)` over the doc's
    * feature-bucket counts, with add-k–smoothed bucket distributions
    * p̂ (target corpus) and q̂ (raw corpus). High-weight docs "look
    * like" the target domain; [[importanceResample]] keeps the top
    * fraction.
    *
    * Distribution shape: two corpus scans fold to ≤ `buckets` rows
    * each (partial-aggregated; the collects are bucket-bounded, never
    * data-bounded), the per-bucket log-ratio table broadcasts to an
    * (id, bucket)-aggregated join, and the per-doc fold is one
    * id-keyed exchange of pre-aggregated rows — ~N at any corpus
    * size, no corpus-sized shuffle of raw text. Returns
    * (id, n_feats, logweight·6dp); docs with a null text or no words
    * are excluded (no features = no score — the documented contract).
    * [[importanceWeights]] is the one-shot composition; the
    * model/apply split below is the production (and streaming)
    * decomposition.
    *
    * The learned half, reusable: the per-bucket log-ratio
    * table `(bucket, lw)` fit from a target and a raw sample. At
    * 100 TB this is the production split — fit the model ONCE on
    * bounded samples, then [[applyImportanceWeights]] scores any
    * corpus or stream micro-batch map-side against the broadcast
    * table, with no per-application corpus scans of the fitting
    * data. ≤ `buckets` rows. Buckets never seen in the raw sample are
    * absent (unseen at apply time scores 0 contribution via the inner
    * join — the add-k floor covers them statistically). */
  def importanceModel(raw: DataFrame, target: DataFrame, text: String,
                      buckets: Int = 256, addK: Double = 0.5,
                      portable: Boolean = false): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"mixing: buckets out of range: $buckets")
    require(addK > 0, s"mixing: addK must be > 0: $addK")
    val spark = raw.sparkSession
    def dist(df: DataFrame): (Map[Long, Long], Long) = {
      val rows = featureBuckets(df, text, Nil, buckets, portable)
        .groupBy(col("_b")).agg(count(lit(1)).as("_c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      (rows.toMap, rows.map(_._2).sum)
    }
    val (tc, ttot) = dist(target)
    val (rc, rtot) = dist(raw)
    // per-bucket log-ratio, driver-computed over ≤ buckets entries in
    // a FIXED arithmetic shape the oracle mirrors term for term
    val tDen = ttot + addK * buckets
    val rDen = rtot + addK * buckets
    val lwRows = rc.keys.toSeq.sorted.map { b =>
      (b, math.log((tc.getOrElse(b, 0L) + addK) / tDen) -
        math.log((rc(b) + addK) / rDen))
    }
    import spark.implicits._
    lwRows.toDF("_b", "_lw")
  }

  /** Score `df` against a fit [[importanceModel]]: one (id, bucket)
    * partial-aggregated exchange, a broadcast join of the ≤ buckets
    * model rows, one id-keyed fold — no scan of the fitting corpora.
    * Returns (id, n_feats, logweight·6dp); null-text / wordless docs
    * are excluded.
    *
    * CANONICAL SUMMATION: the per-doc fold sums `c · lwq` over SCALED
    * LONGS (`lwq` = the bucket's log-ratio HALF_UP-quantized to 1e-9),
    * then divides back and rounds to 6dp. Exact integer addition is
    * order-independent, so the logweight is bit-identical under ANY
    * partitioning/merge order — a plain double `sum(c·lw)` varies by
    * ~1e-13 with partial-aggregation order, and a value landing within
    * an ulp of a .5e-6 rounding boundary could flip a keep decision
    * between engines (the carried q_dsir residual risk, now closed;
    * MixingSpec plants an exact-boundary case). The 1e-9 quantum sits
    * three orders below the 6dp output lattice, and per-doc sums stay
    * far under 2^63 (|lw| < 40 ⇒ lwq < 4·10^10; even 10^6 grams per
    * doc keeps the fold < 4·10^16). */
  def applyImportanceWeights(df: DataFrame, model: DataFrame,
                             text: String, id: String,
                             buckets: Int = 256,
                             portable: Boolean = false): DataFrame = {
    val lwq = roundHalfUp(col("_lw") * lit(1.0e9), 0).cast("long")
    featureBuckets(df, text, Seq(col(id)), buckets, portable)
      .groupBy(col(id), col("_b")).agg(count(lit(1)).as("_c"))
      .join(broadcast(model), "_b")
      .groupBy(col(id))
      .agg(sum(col("_c")).as("n_feats"),
        roundHalfUp(sum(col("_c") * lwq) / lit(1.0e9), 6)
          .as("logweight"))
  }

  private def featureBuckets(df: DataFrame, text: String,
                             keep: Seq[Column], buckets: Int,
                             portable: Boolean): DataFrame = {
    val words = df.filter(col(text).isNotNull)
      .select(keep :+ explode(split(col(text), " ")).as("_w"): _*)
      .filter(col("_w") =!= "")
    val b =
      if (portable) portableWordBucket(col("_w"), buckets)
      else nativeWordBucket(col("_w"), buckets)
    words.select(keep :+ b.as("_b"): _*)
  }

  def importanceWeights(raw: DataFrame, target: DataFrame, text: String,
                        id: String, buckets: Int = 256,
                        addK: Double = 0.5,
                        portable: Boolean = false): DataFrame =
    applyImportanceWeights(raw,
      importanceModel(raw, target, text, buckets, addK, portable),
      text, id, buckets, portable)

  /** DSIR selection: keep the raw documents whose [[importanceWeights]]
    * score clears the corpus-wide (1 − frac) quantile — i.e. the
    * most-target-like `frac` of the corpus. The threshold is ONE
    * scalar from [[Quantiles.exactQuantiles]] (histogram route +
    * bucket refine — bounded exchanges, no global sort, the same
    * machinery as `q_quantile_2pass`), rounded to 6dp and compared
    * against the already-rounded weights, so the keep decision is an
    * exact comparison of canonical values on both engines (DuckDB
    * replays the threshold as `quantile_cont`). Ties AT the threshold
    * are all kept (deterministic; slightly more than `frac` under
    * heavy ties — documented). Returns (id, n_feats, logweight) of
    * the kept documents. */
  def importanceResample(raw: DataFrame, target: DataFrame, text: String,
                         id: String, frac: Double, buckets: Int = 256,
                         addK: Double = 0.5,
                         portable: Boolean = false): DataFrame = {
    require(frac > 0 && frac <= 1, s"mixing: frac must be in (0,1]: $frac")
    // pinned: the quantile machinery's histogram + refine jobs and the
    // final keep filter each re-scan the weights — unpinned, every
    // scan re-pays the model join AND the raw corpus's feature
    // explode+aggregate (two corpus passes per scan at 100 TB). The
    // weights frame is (id, n_feats, logweight) — per-doc rows, tiny
    // next to the corpus — so the lineage cut is the right trade.
    val w = importanceWeights(raw, target, text, id, buckets, addK,
      portable).localCheckpoint(true)
    val thrRow = Quantiles.exactQuantiles(w, "logweight",
      Seq(1.0 - frac), scale = 6).select("q").head()
    if (thrRow.isNullAt(0)) return w.filter(lit(false)) // empty corpus
    w.filter(col("logweight") >= lit(thrRow.getDouble(0)))
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
    * PLAN AUTO-SELECT: the two-pass shape wins on GROWTH (its exchange
    * is groups×bins at any corpus size), but the histogram pass is a
    * fixed overhead the naive window doesn't pay — ScaleProbe's honest
    * pair showed the naive window absolutely faster up to at least
    * 4.5M rows / 7 groups (§6). Inputs of ≤ `naiveBelow` rows
    * therefore route through the naive per-group window (the two paths
    * are bit-identical — MixingSpec pins equality across the switch
    * point); the routing count() is one map-side scan, a small
    * fraction of either path's cost. Pass `naiveBelow = 0` to skip the
    * count and FORCE the two-pass shape (what the graded key and
    * ScaleProbe do, pinning the scale plan), or a huge value to force
    * the naive window.
    *
    * Contract: `quality` ∈ [0,1] (the [[TextOps.qualityScore]] range),
    * `tokens` ≥ 0; rows with a null group, quality, or tokens are
    * excluded (the grouped-operator null contract). Groups are
    * languages/domains by contract — the histogram collect is guarded
    * by [[maxSources]]/[[maxHistRows]] and fails loud on a
    * high-cardinality group column. Returns the input columns
    * unchanged. */
  def selectToBudget(df: DataFrame, groupCol: String, qualityCol: String,
                     tokensCol: String, idCol: String, budget: Long,
                     bins: Int = 1024,
                     naiveBelow: Long = defaultNaiveBelow): DataFrame = {
    require(budget >= 0, s"mixing: budget must be >= 0: $budget")
    selectImpl(df, groupCol, qualityCol, tokensCol, idCol,
      Left(budget), bins, naiveBelow)
  }

  /** PER-GROUP budget variant of [[selectToBudget]] — each group keeps
    * its own greedy (quality desc, id) prefix under ITS budget; groups
    * absent from `budgets` are dropped (the [[downsampleToWeights]]
    * absent-source contract). Same two-pass machinery, same
    * bit-identity to the per-group naive window, same auto-select.
    * Pair with [[waterFill]] to derive the budgets from a global
    * token target. */
  def selectToBudgets(df: DataFrame, groupCol: String, qualityCol: String,
                      tokensCol: String, idCol: String,
                      budgets: Map[String, Long],
                      bins: Int = 1024,
                      naiveBelow: Long = defaultNaiveBelow): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      "mixing: budgets must be non-empty and >= 0")
    require(budgets.size <= maxSources,
      s"mixing: > $maxSources budget groups")
    selectImpl(df, groupCol, qualityCol, tokensCol, idCol,
      Right(budgets), bins, naiveBelow)
  }

  /** GLOBAL-budget selection — the production composition the static-
    * budget form approximates: derive the per-group budgets from ONE
    * corpus-wide token target by [[waterFill]]ing over the MEASURED
    * per-group supply, then run [[selectToBudgets]] against them.
    * Supply is one partial-aggregated exchange of ≤ groups rows
    * (groups are languages/domains by contract — the collect is
    * `limit(maxSources+1)`-guarded, the [[sourceCounts]] stance), and
    * measured over exactly the rows the selection considers (the
    * grouped-operator null contract), so a group's budget can never
    * exceed what the selection could spend. The water-filling itself
    * is exact integer driver math over the bounded supply map —
    * deterministic and oracle-portable (the graded key's DuckDB twin
    * replays the pass-by-pass arithmetic with window functions). */
  def selectToBudgetWaterFill(df: DataFrame, groupCol: String,
                              qualityCol: String, tokensCol: String,
                              idCol: String, total: Long,
                              bins: Int = 1024,
                              naiveBelow: Long = defaultNaiveBelow)
      : DataFrame = {
    require(total >= 0, s"mixing: total budget must be >= 0: $total")
    requireStringSource(df, groupCol)
    val rows = df
      .filter(col(groupCol).isNotNull && col(qualityCol).isNotNull &&
        col(tokensCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sum(col(tokensCol).cast("long")).as("_sup"))
      .limit(maxSources + 1).collect()
    require(rows.length <= maxSources,
      s"mixing: > $maxSources distinct groups in '$groupCol' — " +
        "mixing groups are languages/domains by contract; a URL- or " +
        "id-valued column would OOM the driver")
    val supply = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    if (supply.isEmpty) return df.filter(lit(false))
    selectToBudgets(df, groupCol, qualityCol, tokensCol, idCol,
      waterFill(supply, total), bins, naiveBelow)
  }

  /** EPOCH-replication mixing — assemble a training mix by
    * REPLICATING each source's documents: `epochsPct(source)` is the
    * epoch count in integer PERCENT (230 = 2.3 epochs → two full
    * copies of every doc + a deterministic 30% draw of a third), the
    * way LLM mixtures are actually specified (the GPT-3 §2.2 mixture
    * table's "epochs elapsed when training"; up-weighted sources make
    * multiple passes). The up-sampling complement of
    * [[downsampleToWeights]]; sources absent from the map drop
    * wholesale (the same absent-source contract). Returns the input
    * columns plus `epoch` (0-based copy index).
    *
    * Shape: ONE map-side explode of a per-row epoch sequence — no
    * exchange, no driver data, output rows ∝ Σ n_source·epochs. The
    * fractional draw is the portable hash of the DOC id (every
    * source's partial copy selects by the same per-doc draw —
    * deterministic and replay-stable; integer percent keeps the
    * contract exact on any engine). Rows with a null source or id are
    * excluded (the grouped-operator null contract). */
  def replicateEpochs(df: DataFrame, sourceCol: String, idCol: String,
                      epochsPct: Map[String, Int]): DataFrame = {
    requireStringSource(df, sourceCol)
    require(epochsPct.nonEmpty, "mixing: epochsPct must be non-empty")
    require(epochsPct.values.forall(p => p >= 0 && p <= 10000),
      "mixing: epochsPct values must be in [0, 10000] (0..100 epochs)")
    require(epochsPct.size <= maxSources,
      s"mixing: > $maxSources epoch sources")
    Reserved.requireAbsent(df, "replicateEpochs", Seq("epoch"))
    val pct = epochsPct.toSeq.sortBy(_._1).foldLeft(lit(-1)) {
      case (acc, (s, p)) => when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    val full = (pct / lit(100)).cast("int")
    val extra = when(graft.functions.PortableHash
      .hashMod(col(idCol), 100) < pct % lit(100), lit(1)).otherwise(lit(0))
    df.filter(col(sourceCol).isNotNull && col(idCol).isNotNull)
      .filter(pct >= lit(0)) // absent sources drop wholesale
      .withColumn("_cp", full + extra)
      .filter(col("_cp") >= 1)
      .withColumn("epoch",
        explode(sequence(lit(0), col("_cp") - lit(1))))
      .drop("_cp")
  }

  /** Water-filling allocation of a global token target across groups
    * (the balanced-mixing budget rule): start from equal shares;
    * groups whose SUPPLY is below their share keep their whole supply
    * and the surplus re-spreads over the rest, iterating until every
    * remaining group's share is binding. Exact integer arithmetic,
    * deterministic (groups processed in sorted order; the final
    * integer division's remainder goes to the lexicographically first
    * remaining groups, one token each). Σ result = min(total,
    * Σ supply); no group exceeds its supply; all non-capped groups
    * receive within 1 token of each other. */
  def waterFill(supply: Map[String, Long], total: Long): Map[String, Long] = {
    require(total >= 0 && supply.values.forall(_ >= 0),
      "mixing: waterFill needs non-negative supply and total")
    var remaining = supply.toSeq.sortBy(_._1)
    var left = math.min(total, supply.values.sum)
    val out = scala.collection.mutable.Map.empty[String, Long]
    // each pass fixes every group whose supply is under the even
    // share; terminates because the remaining set shrinks (or all fit)
    while (remaining.nonEmpty && left > 0) {
      val share = left / remaining.size
      val capped = remaining.filter { case (_, n) => n <= share }
      if (capped.isEmpty) {
        val rem = (left - share * remaining.size).toInt
        remaining.zipWithIndex.foreach { case ((g, _), i) =>
          out(g) = share + (if (i < rem) 1L else 0L)
        }
        left = 0
      } else {
        capped.foreach { case (g, n) => out(g) = n; left -= n }
        remaining = remaining.filterNot { case (_, n) => n <= share }
      }
    }
    remaining.foreach { case (g, _) => out.getOrElseUpdate(g, 0L) }
    supply.keys.foreach(g => out.getOrElseUpdate(g, 0L))
    out.toMap
  }

  private def selectImpl(df: DataFrame, groupCol: String,
                         qualityCol: String, tokensCol: String,
                         idCol: String,
                         budget: Either[Long, Map[String, Long]],
                         bins: Int, naiveBelow: Long): DataFrame = {
    require(bins >= 2, s"mixing: need >= 2 bins: $bins")
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"mixing: group column '$groupCol' must be STRING, got " +
        df.schema(groupCol).dataType)
    Reserved.requireAbsent(df, "selectToBudget",
      Seq("_g", "_g2", "_b", "_boundary", "_above", "_budget", "_cum"))
    val rows0 = df
      .filter(col(groupCol).isNotNull && col(qualityCol).isNotNull &&
        col(tokensCol).isNotNull)
    // per-group budgets: unbudgeted groups are dropped up front (the
    // membership literal is bounded by the budgets-size guard)
    val rows = budget match {
      case Left(_)  => rows0
      case Right(m) =>
        rows0.filter(col(groupCol).isInCollection(m.keys.toSeq))
    }
    def budgetOf(g: String): Long = budget match {
      case Left(b)  => b
      case Right(m) => m(g)
    }
    if (naiveBelow > 0 && rows.count() <= naiveBelow) {
      // below the measured crossover the histogram is pure overhead:
      // the naive window IS the semantics, bit-identical by spec pin.
      // The budget the filter compares against: a literal for the
      // global form (the graded key's pinned shape), a broadcast
      // column for the per-group form.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol))
        .orderBy(col(qualityCol).desc, col(idCol))
      val cum = rows
        .withColumn("_cum", sum(col(tokensCol).cast("long")).over(w))
      return (budget match {
        case Left(b) => cum.filter(col("_cum") <= b)
        case Right(m) =>
          import df.sparkSession.implicits._
          cum.join(broadcast(m.toSeq.toDF("_g2", "_budget")),
              col(groupCol) === col("_g2"), "inner")
            .filter(col("_cum") <= col("_budget"))
            .drop("_g2", "_budget")
      }).drop("_cum")
    }
    val bin = least(lit(bins - 1),
      floor(col(qualityCol) * lit(bins)).cast("int"))
    // pass 1: token weight per (group, bin) — bounded exchange, the
    // bound enforced by a DISTRIBUTED count of the aggregate BEFORE
    // anything is collected: the failing case (a high-cardinality
    // group column) never ships a single histogram row to the driver,
    // so the guard itself cannot OOM what it guards. The aggregate is
    // persisted across the count + collect pair (groups×bins rows —
    // tiny in every valid case) so pass 1 runs once.
    val histDf = rows.groupBy(col(groupCol).as("_g"), bin.as("_b"))
      .agg(sum(col(tokensCol).cast("long")).as("_w"))
      .persist()
    val histRows = try {
      require(histDf.count() <= maxHistRows,
        s"mixing: histogram exceeds $maxHistRows (groups x bins) rows — " +
          s"groups are languages/domains by contract; check '$groupCol'")
      histDf.collect()
    } finally { histDf.unpersist(); () }
    val hist = histRows.map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    require(hist.size <= maxSources,
      s"mixing: > $maxSources distinct groups in '$groupCol' — " +
        "groups are languages/domains by contract; a URL- or id-valued " +
        "column would OOM the driver")
    // per group: highest bin whose cumulative-from-top crosses ITS
    // budget (boundary = -1 when the whole group fits)
    val spark = df.sparkSession
    import spark.implicits._
    val marks = hist.toSeq.map { case (g, bs) =>
      val gb = budgetOf(g)
      var cum = 0L
      var boundary = -1
      var above = 0L
      val it = bs.sortBy(-_._2).iterator
      while (boundary < 0 && it.hasNext) {
        val (_, b, w) = it.next()
        if (cum + w > gb) { boundary = b; above = cum }
        cum += w
      }
      (g, boundary, above, gb)
    }.toDF("_g", "_boundary", "_above", "_budget")
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
      .filter(col("_cum") <= col("_budget"))
      .drop("_cum")
    keepWhole.unionByName(boundaryKept)
      .drop("_g", "_boundary", "_above", "_budget", "_b")
  }
}
