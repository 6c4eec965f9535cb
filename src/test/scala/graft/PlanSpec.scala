package graft

/** Plan-shape regression tests: the physical plans the scale story
  * depends on, asserted so a refactor cannot silently trade them away.
  * (Formatted explain is used because AQE wraps executed plans.)
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(key: String): String =
    SparkEntry.queries(key)(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  /** Count physical nodes by their formatted-detail header "(n) Name" —
    * the tree section repeats each node, so substring counts double. */
  private def count(plan: String, node: String): Int =
    plan.linesIterator.count(_.matches(raw"\(\d+\) $node( .*)?"))

  /** Formatted-plan operator ids for a node name; ids grow leaf→root,
    * so a smaller id is deeper in the plan. */
  private def nodeIds(plan: String, node: String): Seq[Int] =
    plan.linesIterator.filter(_.matches(raw"\(\d+\) $node( .*)?"))
      .map(l => l.substring(l.indexOf('(') + 1, l.indexOf(')')).toInt)
      .toSeq

  test("flagship: all window columns share ONE exchange") {
    val p = planOf("q_full_analysis")
    // one shuffle for the series key; the final orderBy adds range
    // partitioning — nothing else may shuffle
    assert(count(p, "Exchange") <= 2, s"flagship grew extra exchanges:\n$p")
    assert(count(p, "Window") >= 1)
  }

  test("window family: one key exchange + the final orderBy, nothing else") {
    // every per-series window key shares its (stock) hash exchange
    // across all window columns; only the presentation orderBy may add
    // a range exchange. A third exchange means a window column grew its
    // own partitioning — the q_funnel regression shape.
    for (key <- Seq("q_moving_avg_5", "q_stddev_5", "q_lag_prev",
        "q_daily_return", "q_ohlc_resample", "q_sessionize")) {
      val p = planOf(key)
      assert(count(p, "Exchange") <= 2, s"$key grew extra exchanges:\n$p")
      assert(count(p, "Window") >= 1, s"$key lost its window:\n$p")
    }
  }

  test("as-of join: single-shuffle carry-forward, no sort-merge or nested loop") {
    val p = planOf("q_asof_join")
    // union-tag-carry composition: both sides cross the user_id
    // exchange once (plus the clicks pre-agg and final orderBy); an
    // equi-join rewrite would show SortMergeJoin, a naive as-of shows
    // a range nested-loop — both are regressions
    assert(count(p, "Exchange") <= 3, s"as-of grew extra exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop"),
      s"as-of lost the carry-forward shape:\n$p")
  }

  test("q_join_enrich: dimension join broadcasts, never sort-merges") {
    val p = planOf("q_join_enrich")
    assert(p.contains("BroadcastHashJoin"), s"broadcast join lost:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join sort-merges:\n$p")
  }

  test("filters push into the parquet scan") {
    val p = planOf("q_filter_eq")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"filter not pushed:\n$p")
  }

  test("projection prunes the scan schema") {
    val p = planOf("q_project_rename")
    // lineitem has 16 columns; the scan must read only the 5 projected
    val read = p.linesIterator.find(_.trim.startsWith("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in:\n$p"))
    val cols = read.count(_ == ':') - 1 // "ReadSchema: struct<a:t,b:t,...>"
    assert(cols == 5, s"scan reads $cols columns, want 5: $read")
  }

  test("top-k is TakeOrderedAndProject, not a full sort") {
    val p = planOf("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"topk plans a full sort:\n$p")
  }

  test("funnel: chained stage windows share one user exchange") {
    val p = planOf("q_funnel")
    // user_id exchange (windows + per-user groupBy reuse it), the tiny
    // per-stage count, and the final single-partition orderBy — the
    // events table itself must cross exactly one exchange
    assert(count(p, "Exchange") <= 3, s"funnel re-shuffles events:\n$p")
    assert(count(p, "Window") >= 1, p)
  }

  test("scd2: open rows cross one key exchange; emission is map-side") {
    val p = planOf("q_scd2")
    // full-outer join on k (one exchange per side) + final orderBy;
    // the inline() branch fan-out must not add exchanges
    assert(count(p, "Generate") >= 1, s"inline() emission lost:\n$p")
    assert(count(p, "Exchange") <= 4, s"scd2 grew extra exchanges:\n$p")
  }

  test("exact dedup shuffles the digest, not the text") {
    val p = planOf("q_dedup_exact")
    // the exchange key is the 32-byte sha2 digest; document text must
    // not appear in any exchange's output schema
    assert(p.contains("sha2"), p)
    assert(count(p, "Exchange") <= 3, s"dedup grew extra exchanges:\n$p")
  }

  test("NO query key plans a cartesian or nested-loop join") {
    // Whitelisted dense-scoring steps, each deliberate:
    //  - q_similarity_cosine / q_dedup_embed: brute-force oracle baseline
    //    (tiny broadcast query set × corpus — the documented ground truth);
    //  - q_ngram_jaccard / q_ngram_containment: exact all-pairs overlap
    //    over a bounded candidate set, the ground truth the approximate
    //    dedup keys are tested against;
    //  - q_cluster_assign: the k-means E-step scores every (vector,
    //    centroid) pair by definition — centroids broadcast, map-side;
    //  - q_ann_ivf: the IVF probe step scores every centroid per query
    //    (broadcast of nlist centroid rows) — the same dense centroid scan
    //    FAISS IVF performs; corpus-side scoring is hash-partitioned.
    //  - q_dq_checks: a 1-row x 1-row cross of two aggregate verdicts
    //    (metrics row assembly, not a data-scale join).
    //  - q_ann_pq: the ADC scan scores every (query, encoded row) pair by
    //    definition — the broadcast side is the bounded query-id set and
    //    the per-pair cost is m map lookups, never a vector; the corpus
    //    side stays map-side (the FAISS ADC loop shape).
    //  - q_ann_ivfpq / q_ann_ivfpq_index: only the PROBE step is dense
    //    — |Q| × nlist centroid rows, both bounded (the q_ann_ivf
    //    shape); the ADC scan itself joins the probed lists on the
    //    cluster equi key (broadcast hash), never all-pairs. The
    //    _index twin additionally pushes the probe set into the
    //    encoded scan as an IN literal (file pruning).
    // (q_quantile_sketch / q_quantile_sketch_grouped used to be here:
    // the rank pick was a no-equi-key theta-join; both now explode the
    // literal fraction list and filter map-side — zero joins.)
    val bruteForce = Set("q_similarity_cosine", "q_dedup_embed",
      "q_ngram_jaccard", "q_ngram_containment", "q_ann_ivf", "q_dq_checks",
      "q_cluster_assign", "q_ann_pq", "q_ann_ivfpq", "q_ann_ivfpq_index")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(bruteForce)
      .filter { key =>
        val p = planOf(key)
        p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
      }
    assert(offenders.isEmpty,
      s"nested-loop plans in: ${offenders.mkString(", ")}")
  }

  test("incremental components: the resolved export is one agg, no joins") {
    // the probe/merge machinery runs eagerly inside the key; the plan
    // under test is the currentLabels export — a min-fold over byid/
    // plus the presentation orderBy, nothing else. A join or a third
    // exchange means label resolution stopped being a pure min-lattice
    // fold.
    val p = planOf("q_dedup_components_incremental")
    assert(!p.contains("Join"), s"label resolve grew a join:\n$p")
    assert(count(p, "Exchange") <= 2, s"label resolve re-shuffles:\n$p")
    // the apply twin: the drop set (non-representatives) is bounded by
    // the pair count, so it must come back to the corpus as a BROADCAST
    // anti join — a sort-merge would shuffle the corpus to be filtered
    val pa = planOf("q_dedup_apply_incremental")
    assert(pa.contains("BroadcastHashJoin"), s"drop-set broadcast lost:\n$pa")
    assert(!pa.contains("SortMergeJoin") && !pa.contains("ShuffledHashJoin"),
      s"apply shuffles the corpus for the drop set:\n$pa")
    // the digest store's export is the same pure-fold contract: one
    // groupBy over bounded summary rows + the presentation orderBy
    val pd = planOf("q_dedup_exact_incremental")
    assert(!pd.contains("Join"), s"digest groups export grew a join:\n$pd")
    assert(count(pd, "Exchange") <= 2, s"digest export re-shuffles:\n$pd")
  }

  test("grouped heavy hitters: candidate filter broadcasts, no corpus join shuffle") {
    // the (group, item) candidate set is groups×k-bounded and must come
    // back to the token stream as a broadcast semi-join — a sort-merge
    // would shuffle every token to be filtered
    val p = planOf("q_heavy_hitters_grouped")
    assert(p.contains("BroadcastHashJoin"), s"broadcast joins lost:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"grouped heavy hitters shuffles the corpus for a join:\n$p")
  }

  test("grouped exact quantiles: the corpus never shuffles for a join") {
    // every corpus-touching join (stats re-attach, refine semi-filter,
    // rank pick) must broadcast its group-bounded side — a sort-merge
    // anywhere means the full value stream is shuffling to be filtered,
    // the exact cost the histogram routing exists to avoid
    val p = planOf("q_quantile_grouped_2pass")
    assert(p.contains("BroadcastHashJoin"), s"broadcast joins lost:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"grouped quantiles shuffles the corpus for a join:\n$p")
  }

  test("star join broadcasts the whole dimension chain") {
    val p = planOf("q_star_join")
    assert(count(p, "BroadcastHashJoin") >= 3,
      s"dimension chain not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") ||
      count(p, "SortMergeJoin") <= 1, // only the fact-fact join may merge
      s"dims sort-merging:\n$p")
  }

  test("interval-overlap join is a hash join on the bucket") {
    val p = planOf("q_interval_overlap")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"overlap join lost its equi-key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.toLowerCase.contains("cartesian"), p)
  }

  test("rank filters push a WindowGroupLimit below the sort") {
    // rk <= k over row_number/rank must become a per-group top-k
    // (partial limit map-side, final limit after the shuffle) — without
    // it every group's full contents sort and materialize before the
    // filter drops them
    for (key <- Seq("q_tfidf", "q_window_rank")) {
      val p = planOf(key)
      assert(p.contains("WindowGroupLimit"),
        s"$key lost window group-limit pushdown:\n$p")
    }
  }

  test("text/dedup family: exchange budgets hold, no Expand ever") {
    // The LLM-pipeline keys' scale story is "few exchanges of small
    // keys/hashes, partial-aggregated": pin each key's exchange budget
    // so a rewrite cannot silently re-shuffle the corpus, and assert no
    // Expand node anywhere — a count-distinct that regresses into an
    // Expand multiplies the exploded token/shingle stream before the
    // exchange (the q_line_dedup rewrite this family deliberately
    // avoids).
    val budgets = Map(
      "q_token_count" -> 1, "q_dedup_exact" -> 2, "q_boilerplate" -> 2,
      "q_repeated_ngrams" -> 3, "q_line_dedup" -> 4, "q_tfidf" -> 4,
      // r16: +3 for the collision-proof exactRecount second pass in
      // the funnels' decontamination stage (benchmark-string distinct
      // + survivor semi + survivor recount groupBy) — every one of
      // them SURVIVOR-bounded, never corpus-scale
      "q_decontaminate" -> 4, "q_curate" -> 8,
      // r11 additions: perplexity = bigram groups + 2 LM windows +
      // doc fold + tercile window (a groupBy+join tercile branch
      // re-derived the whole bigram pipeline: 8); sketch = bucket agg
      // + bounded-state window + presentation sort; encode = doc fold
      // + sort (vocab joins broadcast); 2-pass quantiles = histogram
      // (refine runs in its own jobs, exchange <= bins rows)
      "q_perplexity" -> 5, "q_quantile_sketch" -> 3,
      "q_bpe_encode" -> 2, "q_bpe_encode_oov" -> 2,
      "q_quantile_2pass" -> 1,
      // r12: the incremental funnel — store fold (digest groupBy) +
      // reps semi + contamination hash join + presentation sort; the
      // quality stage itself is map-side, one exchange fewer than
      // q_curate's in-plan window dedup
      // r17: the dedup survivors pin (localCheckpoint) hides the
      // store fold + semi join from this single-plan view — the
      // lazy tail is the contamination chain + anti join + sort
      "q_curate_incremental" -> 5,
      // r15: the FULL composed funnel. Its two localCheckpoint cuts
      // (survivors before DSIR, gated before dedup) hide the upstream
      // stages from this single-plan view, so the budget pins the
      // TAIL only: the dedup window computed on both sides of the
      // decontamination anti join (2×2), the contamination shingle
      // aggregate + broadcast (3), the anti-join exchanges (2), the
      // presentation sort (1) — the upstream c4/gopher/quality chain
      // is map-side by construction (spec'd via the streaming twin)
      // and DSIR's budget is q_dsir's
      "q_curate_full" -> 17, // r16: +3, the exactRecount pass
      // r15: per-group selection against water-filled budgets. The
      // supply aggregate and the two-pass histogram walk run EAGERLY
      // at key construction (driver-bounded collects), so the lazy
      // plan this test sees is the boundary-bin window + the
      // presentation sort — one exchange each, plus slack for AQE
      "q_token_budget_waterfill" -> 3,
      // r15: logistic-regression quality classifier — the fit's
      // per-iteration gradient aggregates run eagerly (d+1 doubles
      // each); the lazy plan is the map-side scoring projection +
      // the presentation sort
      "q_quality_classifier" -> 1,
      // r15: the PR curve — scores quantize to 6dp so the groupBy
      // exchange is bounded at 10^6+1 rows at ANY corpus size, then
      // one single-partition exchange feeds the cumulative windows
      // (the final sort rides the same partition, exchange-free)
      "q_pr_curve" -> 3,
      // r15: AUC — the same bounded per-score aggregate + the ranked
      // window + the final one-row fold
      "q_roc_auc" -> 4,
      // r15: epoch replication is scan -> filter -> explode -> the
      // presentation sort; the ONE exchange is the sort
      "q_mix_epochs" -> 1,
      // r16: the composed mixture — the water-fill selection's lazy
      // tail (boundary-bin window + slack, as q_token_budget_waterfill)
      // plus the presentation sort; the replication explode must stay
      // MAP-SIDE (no exchange of its own)
      "q_mix_budget_epochs" -> 3,
      // r16: grouped calibration — the (shard, thr) aggregate, the
      // shard-partitioned window pass, the per-shard fold (AUC/ECE),
      // the presentation sort; every exchange carries
      // groups x bounded-aggregate rows, never the corpus
      "q_pr_curve_grouped" -> 3, "q_roc_auc_grouped" -> 4,
      "q_ece_grouped" -> 4,
      // r16: monitoring completion. reliability = bounded score
      // aggregate + bin fold + presentation sort; threshold = score
      // aggregate + the single-partition curve window (the argmax agg
      // rides the same partition); drift = two bounded histograms +
      // two bin folds + the single-partition spine window/fold (the
      // spine joins broadcast — no shuffle of their own)
      "q_reliability" -> 3, "q_threshold_f1" -> 2,
      "q_drift_psi" -> 5,
      // r16: per-source drift (two grouped histograms + two bin
      // folds + the shard-partitioned spine window/fold + the
      // presentation sort) and champion/challenger AUC (the grouped
      // aggregate + per-model window + fold) — all bounded rows
      "q_drift_psi_grouped" -> 7, "q_filter_ab" -> 3,
      // r16: grouped-store reads (every exchange carries batches x
      // groups x bounded-aggregate rows — the store, never a corpus)
      // and the per-source drift read's fold+bin+spine chain; the
      // contamination matrix = corpus shingle aggregate + broadcast
      // suite join + the survivor-bounded recount pass + sort
      // r16: KS drift — two bounded histograms, the merged full-outer
      // spine (sort-merge on thr over bounded rows), the single-
      // partition cumulative pass + final fold
      "q_drift_ks" -> 5,
      // ... and the grouped twins: per-shard argmax rides the grouped
      // curve windows; per-shard KS adds the merged (shard, thr)
      // sort-merge spine
      "q_threshold_f1_grouped" -> 3, "q_drift_ks_grouped" -> 6,
      // r16: the composite dashboard read — six metric branches, each
      // its own chain of store-bounded folds (the store is batches x
      // <= 10^6+1 rows; NO branch touches a corpus); the union itself
      // is exchange-free. r17: the two window folds are pinned
      // (localCheckpoint) before the branches fan out, so the store
      // is read twice, not ~13x — budget 27 -> 19
      "q_monitor_report" -> 19,
      "q_pr_curve_grouped_incremental" -> 3,
      "q_roc_auc_grouped_incremental" -> 3,
      "q_ece_grouped_incremental" -> 4,
      "q_drift_psi_grouped_incremental" -> 9,
      "q_decontam_matrix" -> 5,
      // r17: the COMPLETE grouped store read surface — every exchange
      // carries batches x groups x bounded-aggregate rows (the store,
      // never a corpus): threshold/brier/reliability = store fold +
      // grouped tail + presentation sort; grouped-window KS adds the
      // two pruned window folds + the merged (group, thr) spine
      "q_threshold_f1_grouped_incremental" -> 3,
      "q_brier_grouped" -> 3, "q_brier_grouped_incremental" -> 3,
      "q_reliability_grouped" -> 3,
      "q_reliability_grouped_incremental" -> 3,
      "q_drift_ks_grouped_incremental" -> 8,
      // r17: the per-source dashboard — the grouped monitorReport
      // union over the two PINNED grouped window folds (store read
      // twice; six branches of groups x bounded rows)
      "q_monitor_report_grouped" -> 21,
      // r17: deploy-loop actuation — the operating point collects
      // eagerly from the bounded store fold (one driver row); the
      // lazy plan is the map-side re-gate + the presentation sort.
      // Promotion: the 2-row grouped AUC fold + the 2-row sort
      "q_recalibrate_gate" -> 1, "q_ab_promote" -> 2,
      // promotion actuated: winner + threshold collect eagerly
      // (bounded rows); the lazy plan is the winner's map-side
      // re-gate + the presentation sort
      "q_promote_gate" -> 1,
      // ... and its multi-source twin: the per-shard operating points
      // (store fold + grouped curve window + argmax) derive INSIDE
      // the broadcast side; the gate itself stays map-side
      "q_recalibrate_gate_grouped" -> 3,
      // r17: the capstone. The funnel's localCheckpoint cuts hide the
      // curate stages (budgeted via q_curate_full); this plan is the
      // survivor-lang broadcast join, the selection's boundary-bin
      // window, the map-side replication explode, the 16-byte-row
      // pack window, and the presentation sort — plus AQE slack
      "q_pipeline_full" -> 21,
      // r17: the incremental capstone — the survivor frame pins
      // before selection (the funnel is budgeted via
      // q_curate_incremental), so this plan is the selection's
      // boundary-bin window + the map-side explode + the pack window
      // + the presentation sort
      "q_pipeline_incremental" -> 3)
    for ((key, maxEx) <- budgets) {
      val p = planOf(key)
      assert(count(p, "Exchange") <= maxEx,
        s"$key exceeded its exchange budget ($maxEx):\n$p")
      assert(count(p, "Expand") == 0,
        s"$key grew an Expand (count-distinct regression):\n$p")
    }
  }

  test("capped buckets: the cap filter gates BEFORE the member collect") {
    // The 100 TB skew guard (DedupOps.cappedBuckets): bucket weight is
    // a windowed sum (spillable WindowExec buffer), the cap filter
    // drops over-cap keys, and only then does collect_list materialize
    // members — no aggregation buffer ever exceeds maxBucket entries.
    // The obvious post-aggregate cap filter instead materializes a
    // ubiquitous key's whole bucket in one unspillable buffer first:
    // executor OOM on a boilerplate anchor context or degenerate LSH
    // band at scale. Pin: a Window computing the `_raw` weight sits
    // BELOW the collect aggregate (smaller formatted-plan id = deeper),
    // with the cap filter on `_raw` in between, and the groupBy reuses
    // the window's exchange (budgets unchanged — the family tests).
    for (key <- Seq("q_dedup_minhash", "q_dedup_simhash",
        "q_exact_substr", "q_exact_substr_apply")) {
      val p = planOf(key)
      assert(count(p, "Window") >= 1, s"$key lost the bucket window:\n$p")
      assert(p.linesIterator.exists(l =>
        l.trim.startsWith("Condition") && l.contains("_raw")),
        s"$key lost the pre-collect cap filter:\n$p")
      val winId = nodeIds(p, "Window").min
      val aggIds = nodeIds(p, "ObjectHashAggregate") ++
        nodeIds(p, "SortAggregate") ++ nodeIds(p, "HashAggregate")
      assert(aggIds.nonEmpty && winId < aggIds.min,
        s"$key collects members below the cap window:\n$p")
    }
  }

  test("kmeans assignment: map-side kernel, one presentation exchange, no join") {
    // the whole scale story of Clustering.kmeans is that assignment
    // never shuffles the corpus: the trained centroids ride inside the
    // BestCentroid kernel expression, so the final-assignment plan must
    // be scan -> filter -> project (+ the presentation orderBy's range
    // exchange) with no join of any kind
    val p = planOf("q_kmeans")
    assert(count(p, "Exchange") <= 1, s"kmeans assignment shuffled:\n$p")
    assert(!p.contains("Join"), s"kmeans assignment grew a join:\n$p")
  }

  test("medoids: one partial-aggregated exchange over the map-side assignment") {
    // struct-max per cluster_id partial-aggregates map-side, so the
    // only exchanges are the k-row aggregate and the presentation
    // orderBy; a window-rank rewrite would exchange every member row
    val p = planOf("q_cluster_medoids")
    assert(count(p, "Exchange") <= 2, s"medoids re-shuffled members:\n$p")
    assert(!p.contains("Join") && count(p, "Window") == 0,
      s"medoids lost the aggregate shape:\n$p")
  }

  test("semdedup: pair search confined to clusters — no cartesian, no nested loop") {
    // the quadratic term must stay local to a cluster: the self-join
    // keys on cluster_id (hash or broadcast are both fine), and nothing
    // may regress into the all-pairs shapes. The scaled-k key is the
    // production configuration — same invariant must hold there.
    for (key <- Seq("q_semdedup", "q_semdedup_scaled")) {
      val p = planOf(key)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$key regressed to an all-pairs join:\n$p")
    }
  }

  test("exact-substr spans: two aggregations, in-bucket pairs, no join") {
    // the operator's scale story: duplicate (h, pre, post) contexts
    // collapse INSIDE the AnchorContexts kernel (map-side, before any
    // exchange), anchors shuffle ONCE to buckets (groupBy on h,
    // carrying distinct bounded context windows only), pairs are
    // generated INSIDE the bucket aggregate (no self-join shuffle), and
    // the weighted pair aggregate + presentation orderBy close it out.
    // A join anywhere means the in-array combinatorics regressed to the
    // self-join the design exists to avoid; a third shuffle means the
    // kernel-side dedup regressed to a groupBy exchange.
    val p = planOf("q_exact_substr")
    assert(!p.contains("Join"), s"exact_substr grew a self-join:\n$p")
    assert(count(p, "Exchange") <= 3, // bucket groupBy + pair agg +
      // presentation orderBy
      s"exact_substr exceeded its exchange budget:\n$p")
    assert(count(p, "Expand") == 0, s"exact_substr grew an Expand:\n$p")
  }

  test("exact-substr apply: interval side broadcasts, document text never shuffles") {
    // detection chain = the spans shape (dedup agg + bucket agg), then
    // the pair-bounded interval aggregate comes back to the corpus as a
    // BROADCAST outer join — a sort-merge here would shuffle every
    // document's text, the exact cost the operator's design avoids
    val p = planOf("q_exact_substr_apply")
    assert(p.contains("BroadcastHashJoin"),
      s"interval join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Cartesian"),
      s"apply shuffles document text:\n$p")
    assert(count(p, "Exchange") <= 3, // bucket agg + interval agg +
      // presentation orderBy (context dedup is kernel-side)
      s"exact_substr_apply exceeded its exchange budget:\n$p")
  }

  test("kmeanspp final assignment keeps the map-side kernel shape") {
    // seeding runs driver-side at construction; the RETURNED plan must
    // be exactly the q_kmeans shape — scan -> kernel project (+ the
    // presentation orderBy), no join, regardless of init
    val p = planOf("q_kmeans_pp")
    assert(count(p, "Exchange") <= 1, s"kmeanspp assignment shuffled:\n$p")
    assert(!p.contains("Join"), s"kmeanspp assignment grew a join:\n$p")
  }

  test("temperature sampling: the kept corpus is a map-side filter, no join") {
    // counts are one driver-collected aggregate at CONSTRUCTION; the
    // returned plan must be scan -> hash-threshold filter (+ the
    // presentation orderBy) — a per-source rank or a weights join
    // would put the biggest source through one sorted task
    val p = planOf("q_sample_temperature")
    assert(!p.contains("Join"), s"temperature sample grew a join:\n$p")
    assert(count(p, "Window") == 0, s"temperature sample grew a rank:\n$p")
    assert(count(p, "Exchange") <= 1,
      s"temperature sample shuffled beyond the orderBy:\n$p")
  }

  test("quality rules are ONE map-side projection: no exchange beyond the presentation orderBy") {
    // gopherQuality and c4Filters are per-row expression work by
    // design — a Window, a join, or a second Exchange here means
    // someone turned a scan-bound rule into a shuffle
    for (key <- Seq("q_gopher_quality", "q_c4_filters")) {
      val p = planOf(key)
      assert(count(p, "Exchange") <= 1, s"$key grew an exchange:\n$p")
      assert(count(p, "Window") == 0, s"$key grew a window:\n$p")
      assert(!p.contains("Join"), s"$key grew a join:\n$p")
    }
  }

  test("DSIR: weights plan has no corpus sort-merge and no window; the model joins broadcast") {
    // r15: importanceResample PINS its weights frame (localCheckpoint
    // ahead of the quantile jobs), so the graded key's lazy plan is a
    // filter over the cut — assert on the WEIGHTS plan itself, the
    // shape this pin protects: a (id, bucket) partial-aggregated
    // exchange + a BROADCAST join of the ≤ buckets model rows + the
    // per-doc fold. A SortMergeJoin means the model stopped
    // broadcasting; a Window means someone re-introduced a rank; both
    // are the 100 TB regressions.
    val d = graft.io.Tables.read(spark, sf, "documents")
    val p = graft.ops.Mixing.importanceWeights(d,
        d.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
        "text", "doc_id", portable = true)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("SortMergeJoin"),
      s"DSIR model join stopped broadcasting:\n$p")
    assert(count(p, "Window") == 0, s"DSIR grew a window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the broadcast model join:\n$p")
    // the GRADED key's lazy plan — the post-checkpoint tail (threshold
    // filter + presentation orderBy over the cut) — must stay
    // Exchange-bounded: a SortMergeJoin or Window re-introduced between
    // the cut and the key's output would be invisible to the weights
    // assertions above, so budget it here too
    val kp = planOf("q_dsir")
    assert(count(kp, "Exchange") <= 1,
      s"q_dsir's post-cut tail grew an exchange beyond the orderBy:\n$kp")
    assert(count(kp, "Window") == 0, s"q_dsir tail grew a window:\n$kp")
    assert(!kp.contains("SortMergeJoin"),
      s"q_dsir tail grew a sort-merge join:\n$kp")
  }

  test("token budget: the Window sits under the boundary-bin filter") {
    // pass 2's window may only see the boundary bin's slice — a Window
    // whose input is the whole corpus is the naive straggler shape.
    // The boundary filter (_b = _boundary) must appear DEEPER in the
    // plan (smaller operator id) than the Window that consumes it.
    val p = planOf("q_token_budget")
    val windows = nodeIds(p, "Window")
    assert(windows.nonEmpty, s"token budget lost its boundary window:\n$p")
    val filterIds = p.linesIterator.zipWithIndex.collect {
      case (l, _) if l.matches(raw"\(\d+\) Filter( .*)?") =>
        l.substring(l.indexOf('(') + 1, l.indexOf(')')).toInt
    }.toSeq
    // at least one Filter deeper than the deepest Window, and the
    // boundary predicate text must exist in the plan details
    assert(filterIds.exists(_ < windows.min),
      s"no filter below the boundary window:\n$p")
    assert(p.contains("_boundary"),
      s"boundary-bin predicate missing from the plan:\n$p")
  }

  test("incremental watermark filter prunes with pushdown") {
    // on a natively-typed order column the watermark predicate reaches
    // the scan (events.ts is a ns->µs conversion, so its filter runs
    // post-scan by construction — the Runner target contract instead
    // prunes on the dt partition column)
    import org.apache.spark.sql.functions.{col, lit}
    val p = graft.ops.Restructure.filterFrom(
      graft.io.Tables.read(spark, sf, "lineitem"), "l_shipdate",
      lit("1995-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_shipdate")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual"),
      s"watermark filter not pushed:\n$p")
  }
}
