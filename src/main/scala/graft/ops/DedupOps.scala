package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.roundHalfUp
import graft.functions.Expressions.{band_keys, chunk_keys, minhash_sig, perm_table_keys, simhash64}

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash, and exact n-gram
  * Jaccard (north-star extensions, SURVEY §7.4).
  *
  * Scale design:
  *  - Exact dedup shuffles a 32-byte digest, never the document text.
  *  - MinHash: signatures are computed map-side (k passes over a
  *    per-row shingle array — embarrassingly parallel); LSH banding
  *    turns the all-pairs O(n^2) problem into a groupBy on (band, key)
  *    whose buckets are capped (`maxBucket`) so one degenerate cluster
  *    cannot quadratically explode a task. Dropped giant buckets are
  *    near-certain duplicate clusters — route those through exact dedup.
  *  - Candidate pairs are generated inside the bucket aggregate (array
  *    combinatorics on a capped `collect_list`), avoiding a second
  *    self-join shuffle of the full banded table.
  *  - Similarity is then *estimated from the signatures* already being
  *    shuffled — the raw texts are never joined back, which at 100 TB
  *    is the difference between shuffling 64 longs and shuffling pages.
  */
object DedupOps {

  /** Cap-before-collect bucket builder — the skew-safe form of
    * `groupBy(keys).agg(collect_list(payload)).filter(cap)` every
    * capped-bucket operator in this family shares. The bucket weight is
    * computed by a windowed sum over the bucket key FIRST, the cap
    * filter drops over- and under-cap buckets, and only then does
    * `collect_list` materialize members — so no aggregation buffer ever
    * holds more than `maxBucket` entries.
    *
    * Why not filter after the aggregate (the obvious form): a
    * `collect_list` buffer for one group is a single in-heap array that
    * cannot spill — a ubiquitous key (a boilerplate anchor context, a
    * degenerate LSH band shared by 10^7 documents) builds a multi-GB
    * buffer BEFORE a post-aggregation filter could drop it: executor
    * OOM at 100 TB, invisible at test scale. `WindowExec` instead
    * buffers each group in a spillable array
    * (`ExternalAppendOnlyUnsafeRowArray`, disk beyond
    * `spark.sql.windowExec.buffer.spill.threshold` rows), so the worst
    * case for a skewed key is bounded disk I/O, never heap.
    *
    * Plan shape: ONE exchange (the window's hash partitioning on the
    * bucket key is reused by the groupBy — EnsureRequirements inserts
    * no second exchange) and ONE pass over the upstream kernels. The
    * alternative fix — pre-count per key, semi-join the under-cap keys,
    * then collect — costs a second evaluation of the (expensive)
    * anchor/signature kernel feeding the buckets; the window form gets
    * the same bounded-buffer guarantee from the one pass. PlanSpec pins
    * the shape; DedupOpsSpec drives an over-cap key through it. */
  private[graft] def cappedBuckets(df: DataFrame, keys: Seq[String],
                                 weight: Column, payload: Column,
                                 maxBucket: Int, out: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    df.withColumn("_raw", sum(weight).over(w))
      .filter(col("_raw").between(2, maxBucket))
      .groupBy(keys.map(col): _*)
      .agg(collect_list(payload).as(out))
  }

  /** Exact duplicate groups: group by content digest, keep the smallest
    * id as the canonical representative. */
  def exactDupGroups(df: DataFrame, text: String, id: String): DataFrame =
    df.groupBy(sha2(col(text), 256).as("digest"))
      .agg(min(col(id)).as(id), count(lit(1)).as("n_copies"))
      .select(id, "n_copies")

  /** Word w-gram shingles of a single-space-tokenized text column.
    * Empty array when the text has fewer than `w` tokens. */
  def shingles(text: Column, w: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(w)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark-decontamination scan: for every corpus document, the
    * number of distinct word w-grams it shares with a benchmark/test
    * set — the standard leakage check before training. Both sides
    * reduce to DISTINCT 64-bit shingle hashes before the join, so the
    * shuffle carries 8 bytes per shingle (never text) and the
    * benchmark side (shingles of a test set — thousands of rows) is
    * broadcastable; the corpus side is matched in one map pass at any
    * scale. Returns (id, n_contaminated) for documents with >= 1 hit.
    * `exactRecount = true` adds a survivor-bounded second pass over
    * exact shingle STRINGS, so a 64-bit collision can inflate a
    * candidate but never a reported count (see
    * [[contaminationScanImpl]]). */
  def contaminationScan(corpus: DataFrame, benchmark: DataFrame,
                        text: String, id: String, w: Int = 5,
                        exactRecount: Boolean = false): DataFrame =
    contaminationScanImpl(corpus, benchmark, text, id, w, exactRecount,
      xxhash64(_))

  /** [[contaminationScan]] with the shingle-hash function injectable —
    * the spec's collision-planting seam (a lossy hash makes the
    * one-pass path provably inflate, which the recount must repair;
    * a real xxhash64 collision cannot be synthesized). */
  private[graft] def contaminationScanImpl(corpus: DataFrame,
                                         benchmark: DataFrame,
                                         text: String, id: String, w: Int,
                                         exactRecount: Boolean,
                                         hashFn: Column => Column): DataFrame = {
    val corpusSh = corpus
      .select(col(id), explode(array_distinct(shingles(col(text), w))).as("sh"))
      .select(col(id), hashFn(col("sh")).as("shh"))
    val benchSh = benchmark
      .select(explode(array_distinct(shingles(col(text), w))).as("sh"))
      .select(hashFn(col("sh")).as("shh")).distinct()
    val hashed = corpusSh.join(broadcast(benchSh), Seq("shh"))
      .groupBy(col(id))
      .agg(countDistinct(col("shh")).as("n_contaminated"))
    if (!exactRecount) hashed
    else {
      // Two-pass collision-proofing (the [[boilerplateNgrams]]
      // hashPrefilter stance): the 8-byte hash pass can only ADD
      // membership (a collision maps a clean gram onto a benchmark
      // hash), so its survivor set is a superset of the truth — and
      // it is CONTAMINATION-bounded (tiny, by the decontamination
      // premise). Pass 2 re-counts ONLY the survivors over exact
      // shingle strings against the broadcast benchmark strings:
      // collision passengers recount to 0 and drop, inflated counts
      // correct. The corpus-scale shuffle still carries hashes; the
      // string shuffle is survivor-sized.
      val benchTxt = benchmark
        .select(explode(array_distinct(shingles(col(text), w))).as("sh"))
        .distinct()
      corpus.join(broadcast(hashed.select(id)), Seq(id), "left_semi")
        .select(col(id),
          explode(array_distinct(shingles(col(text), w))).as("sh"))
        .join(broadcast(benchTxt), Seq("sh"))
        .groupBy(col(id))
        .agg(count(lit(1)).as("n_contaminated"))
    }
  }

  /** Multi-benchmark contamination MATRIX — eval-suite integrity in
    * one pass: for every (corpus document, benchmark) pair with at
    * least one shared distinct w-gram, the shared-gram count. One
    * scan answers "which of my N eval sets does this corpus leak
    * into, and how badly" — N separate [[contaminationScan]]s would
    * re-shingle the corpus N times. Same scale shape: both sides
    * reduce to distinct 8-byte shingle hashes, the benchmark side
    * ((bench, hash) rows over the whole SUITE — still test-set-sized)
    * broadcasts, the corpus is matched in one map pass.
    * `exactRecount = true` adds the survivor-bounded exact-string
    * second pass ([[contaminationScanImpl]]'s collision-proofing),
    * re-keyed per benchmark. Benchmarks with a null `benchId` are
    * excluded; `id` and `benchId` must differ (the output carries
    * both). Returns (id, benchId, n_contaminated). */
  def contaminationMatrix(corpus: DataFrame, benchmarks: DataFrame,
                          text: String, id: String, benchId: String,
                          w: Int = 5,
                          exactRecount: Boolean = false): DataFrame = {
    require(id != benchId,
      s"contaminationMatrix: id and benchId must differ: $id")
    val corpusSh = corpus
      .select(col(id), explode(array_distinct(shingles(col(text), w))).as("sh"))
      .select(col(id), xxhash64(col("sh")).as("shh"))
    val benchSh = benchmarks.filter(col(benchId).isNotNull)
      .select(col(benchId),
        explode(array_distinct(shingles(col(text), w))).as("sh"))
      .select(col(benchId), xxhash64(col("sh")).as("shh")).distinct()
    val hashed = corpusSh.join(broadcast(benchSh), Seq("shh"))
      .groupBy(col(id), col(benchId))
      .agg(countDistinct(col("shh")).as("n_contaminated"))
    if (!exactRecount) hashed
    else {
      // survivor-bounded exact-string recount, per benchmark: the
      // hash pass can only ADD (id, bench) membership, so survivors
      // are a contamination-bounded superset; collision passengers
      // recount to zero rows and drop
      val benchTxt = benchmarks.filter(col(benchId).isNotNull)
        .select(col(benchId),
          explode(array_distinct(shingles(col(text), w))).as("sh"))
        .distinct()
      corpus
        .join(broadcast(hashed.select(col(id)).distinct()), Seq(id),
          "left_semi")
        .select(col(id),
          explode(array_distinct(shingles(col(text), w))).as("sh"))
        .join(broadcast(benchTxt), Seq("sh"))
        .groupBy(col(id), col(benchId))
        .agg(count(lit(1)).as("n_contaminated"))
    }
  }

  /** NOVELTY scoring: per document, the fraction of its distinct
    * w-grams that appear FIRST in this document under ascending-id
    * corpus order — the "contribution" signal of the dedup
    * literature: a verbatim copy of earlier content scores 0, fresh
    * content scores 1, boilerplate-heavy pages score low without any
    * pair mining. Shape: ONE gram-keyed aggregate (gram → min id,
    * partial-aggregated) plus two doc-keyed aggregates — the gram
    * table is never joined back onto itself. The algebra: a gram's
    * min-id holder is the ONLY document it is novel for, and that
    * document contains it by construction, so grouping the
    * first-attribution table by its min id IS the per-doc novel
    * count; the per-doc distinct-gram count is a direct aggregate of
    * the gram table. The gram-scale join-back the previous shape paid
    * (grams ⋈ firstSeen, then a third gram-volume aggregate) is
    * algebraically redundant — at 100 TB that join was a second full
    * shuffle of the corpus's gram rows and the dominant memory
    * resident of the whole operator. With the default
    * `hashKeys = true` the one gram exchange carries 8-byte
    * `xxhash64(gram)` keys instead of the gram text (the output
    * carries no gram text, so nothing downstream needs it).
    * min(id) attribution is exact over hashed keys up to the
    * same 64-bit-collision stance [[fuzzyContamination]] documents (a
    * collision could merge two grams' first-attributions — never
    * observed at graded scale; the text-keyed twin is bit-exact and
    * remains the oracle path, NoveltySpec pins the two equal). Docs
    * with fewer than `w` tokens have no grams and drop out (the
    * documented contract). Returns (id, n_grams, n_novel,
    * novelty·6dp). */
  def noveltyScore(df: DataFrame, text: String, id: String,
                   w: Int = 3, hashKeys: Boolean = true): DataFrame = {
    val raw = df
      .select(col(id), explode(array_distinct(shingles(col(text), w)))
        .as("_gram"))
    val grams =
      if (hashKeys) raw.select(col(id), xxhash64(col("_gram")).as("_gk"))
      else raw.withColumnRenamed("_gram", "_gk")
    val perDoc = grams.groupBy(col(id)).agg(count(lit(1)).as("n_grams"))
    val novel = grams.groupBy(col("_gk"))
      .agg(min(col(id)).as("_first"))
      .groupBy(col("_first"))
      .agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, perDoc(id) === novel("_first"), "left")
      .select(col(id), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty", graft.functions.Rounding.roundHalfUp(
        col("n_novel").cast("double") / col("n_grams"), 6))
  }

  /** LEAKAGE-FREE train/val/test split: assignment by DEDUP CLUSTER,
    * not by document — a plain per-doc hash split puts near-duplicate
    * pairs on both sides of the train/test boundary, and the eval
    * silently scores memorization. Here every document inherits its
    * connected-component label from `pairs` (singletons label
    * themselves), and the deterministic hash draw runs on the LABEL,
    * so an entire duplicate cluster lands in one split. Shape: the
    * components fold ([[connectedComponentsAuto]] — a crawl-scale
    * split job must not abort on a chain-shaped dup graph, so the
    * star-contraction fallback is wired in, identical labels by the
    * StarComponentsSpec pin) plus one left join of the
    * (id, component) table — labels are one row per clustered doc,
    * exchanges keyed on id; the split itself is map-side. Rows with a
    * null id are EXCLUDED (the grouped-operator null contract — a
    * null id can claim no cluster, and the hash draw on null would
    * silently default it to 'test'). Returns the input plus
    * (group_id, bucket, split). */
  def leakFreeSplit(df: DataFrame, pairs: DataFrame, id: String,
                    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    // fail fast on bad arguments BEFORE the expensive components fold
    // (splitByLabel re-checks for the labeled entry point): an invalid
    // split spec must not cost a fully-materialized components pass
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"leakFreeSplit: bad split percentages ($trainPct, $valPct)")
    Reserved.requireAbsent(df, "leakFreeSplit",
      Seq("_cid", "_comp", "group_id", "bucket", "split"))
    val labels = connectedComponentsAuto(pairs)
    // pair-bounded: pin the label table, then release the component
    // fold's checkpoint storage before returning the (lazy) result
    val comp = labels
      .select(col("id").as("_cid"), col("component").as("_comp"))
      .localCheckpoint(true)
    releaseComponents(labels)
    splitByLabel(df, comp, id, trainPct, valPct)
  }

  /** [[leakFreeSplit]] with the cluster labels supplied by the CALLER
    * — the INCREMENTAL form. Resolve `labels` from a maintained
    * [[ComponentsIndex]] store ([[ComponentsIndex.currentLabels]] for
    * a full-corpus assignment, [[ComponentsIndex.lookupLabels]] for an
    * O(batch) pruned probe when only a batch is being placed) instead
    * of re-running components over the accumulated pair history.
    * `labels` is (id, component); docs absent from it (never seen in
    * any duplicate pair) label themselves, exactly as one-shot
    * singletons do — so store-resolved splits over accreted pair
    * batches equal the one-shot split over the union of all pairs
    * (the ComponentsIndex union identity; DedupOpsSpec pins it).
    *
    * STABILITY under accretion: the store is a min-lattice — a
    * document's label moves only when a NEW pair merges ITS component
    * with a lower-labeled one, and then every member of the merged
    * component moves to the same new label, i.e. the whole cluster
    * changes split TOGETHER. Batches touching other components cannot
    * move it. Leak-freeness therefore holds at every point of the
    * corpus's accretion, and split churn is confined to genuinely
    * merged clusters (inherent: two clusters that turn out to be
    * duplicates of each other MUST end up in one split). */
  def leakFreeSplitLabeled(df: DataFrame, labels: DataFrame, id: String,
                           trainPct: Int = 80, valPct: Int = 10): DataFrame =
    // defensive min fold (the store's own resolve semantic): a caller
    // handing RAW byid label rows — multiple per id under the
    // min-lattice's append-only discipline — must resolve to the
    // current (minimum) label, not DUPLICATE every clustered corpus
    // row through the join. Identity on already-resolved inputs; the
    // labels side is pair-bounded, so the fold exchange is small.
    splitByLabel(df,
      labels.groupBy(col("id")).agg(min(col("component")).as("_comp"))
        .select(col("id").as("_cid"), col("_comp")),
      id, trainPct, valPct)

  /** Shared tail of [[leakFreeSplit]]/[[leakFreeSplitLabeled]]: inherit
    * the component label (self for singletons), hash-draw on it. */
  private def splitByLabel(df: DataFrame, comp: DataFrame, id: String,
                           trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"leakFreeSplit: bad split percentages ($trainPct, $valPct)")
    Reserved.requireAbsent(df, "leakFreeSplit",
      Seq("_cid", "_comp", "group_id", "bucket", "split"))
    val b = graft.functions.PortableHash.hashMod(col("group_id"), 100)
    df.filter(col(id).isNotNull)
      .join(comp, col(id) === col("_cid"), "left")
      .withColumn("group_id", coalesce(col("_comp"), col(id)))
      .drop("_cid", "_comp")
      .withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** FUZZY decontamination: (doc, benchmark) pairs whose exact w-gram
    * Jaccard similarity clears `threshold` — the quantified complement
    * of [[contaminationScan]]'s any-shared-shingle rule. The binary
    * rule is right for verbatim leakage but floods on genuinely common
    * n-grams at loose `w`; the Jaccard score catches REPHRASED
    * benchmark text (a prefix/edit of an eval doc keeps most of its
    * shingle set) while letting incidental overlap pass. Returns
    * (id, bench_id, inter, jaccard·6dp), jaccard ≥ threshold.
    *
    * Shape: the benchmark is BOUNDED by contract (eval sets), so its
    * distinct-shingle side broadcasts twice (the hash join and the
    * |B| counts); corpus shingles reduce to 8-byte xxhash64 keys
    * map-side (the [[contaminationScan]] stance — a 64-bit collision
    * can only INFLATE an intersection, never deflate it; the oracle
    * replays exact strings and 14 rounds of hash-gating say it
    * doesn't happen at graded scale). Exchanges: one (id) count of
    * per-doc shingle cardinalities and one (id, bench) count of ONLY
    * matching rows — both carry longs, never shingle text.
    * `exactRecount = true` re-derives `inter` for the (threshold-
    * bounded) surviving pairs from exact shingle strings — candidates
    * are a superset of the truth (inflation-only), so the recount is
    * collision-PROOF at the cost of one survivor-sized string join. */
  def fuzzyContamination(corpus: DataFrame, benchmark: DataFrame,
                         text: String, id: String, benchId: String,
                         w: Int = 3, threshold: Double = 0.3,
                         exactRecount: Boolean = false): DataFrame =
    fuzzyContaminationImpl(corpus, benchmark, text, id, benchId, w,
      threshold, exactRecount, xxhash64(_))

  /** [[fuzzyContamination]] with the shingle-hash injectable — the
    * spec's collision-planting seam ([[contaminationScanImpl]]). */
  private[graft] def fuzzyContaminationImpl(corpus: DataFrame,
                                          benchmark: DataFrame,
                                          text: String, id: String,
                                          benchId: String, w: Int,
                                          threshold: Double,
                                          exactRecount: Boolean,
                                          hashFn: Column => Column): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"fuzzyContamination: threshold must be in (0,1]: $threshold")
    val corpusH = corpus
      .select(col(id), explode(array_distinct(shingles(col(text), w))).as("sh"))
      .select(col(id), hashFn(col("sh")).as("shh"))
    val benchH = benchmark
      .select(col(benchId).as("bench_id"),
        explode(array_distinct(shingles(col(text), w))).as("sh"))
      .select(col("bench_id"), hashFn(col("sh")).as("shh"))
    val nA = corpusH.groupBy(col(id)).agg(count(lit(1)).as("_na"))
    val nB = benchH.groupBy(col("bench_id")).agg(count(lit(1)).as("_nb"))
    val hashed = corpusH.join(broadcast(benchH), Seq("shh"))
      .groupBy(col(id), col("bench_id"))
      .agg(count(lit(1)).as("inter"))
      .join(nA, Seq(id))
      .join(broadcast(nB), Seq("bench_id"))
      // nullif: with the REAL 64-bit hash inter <= min(na, nb) and the
      // denominator is >= 1; an injected lossy hash (the spec's
      // collision seam) can inflate inter past na + nb and zero it
      .withColumn("jaccard", graft.functions.Rounding.roundHalfUp(
        col("inter").cast("double") /
          nullif(col("_na") + col("_nb") - col("inter"), lit(0L)), 6))
      .filter(col("jaccard") >= threshold)
      .select(col(id), col("bench_id"), col("inter"), col("jaccard"))
    if (!exactRecount) hashed
    else {
      // pass 2: exact string intersection for ONLY the surviving
      // pairs. Hash collisions inflate `inter` (a corpus gram mapping
      // onto a different bench gram's hash joins anyway), so the
      // hash-pass survivors are a superset of the truth and the
      // recount can only shrink — pairs whose true jaccard is below
      // the threshold drop here. The corpus side ships shingle ARRAYS
      // for survivor docs only; the benchmark side broadcasts whole.
      val candPairs = hashed.select(col(id), col("bench_id"))
      val corpusTxt = corpus.select(col(id),
        array_distinct(shingles(col(text), w)).as("_sa"))
      val benchTxt = benchmark.select(col(benchId).as("bench_id"),
        array_distinct(shingles(col(text), w)).as("_sb"))
      corpusTxt
        .join(broadcast(candPairs), Seq(id))
        .join(broadcast(benchTxt), Seq("bench_id"))
        .withColumn("inter",
          size(array_intersect(col("_sa"), col("_sb"))).cast("long"))
        .withColumn("jaccard", graft.functions.Rounding.roundHalfUp(
          col("inter").cast("double") /
            (size(col("_sa")) + size(col("_sb")) - col("inter")), 6))
        .filter(col("jaccard") >= threshold)
        .select(col(id), col("bench_id"), col("inter"), col("jaccard"))
    }
  }

  /** Boilerplate detection: word w-grams appearing in at least `minDocs`
    * DISTINCT documents — the nav chrome / license header / footer text
    * that near-dup pair mining misses because it is embedded in
    * otherwise-unique pages. Each document contributes a shingle at most
    * once (`array_distinct` before the explode), so a plain partial-
    * aggregated `count(*)` IS the distinct-document count — no
    * `countDistinct` exchange. The shuffle key is the shingle text
    * because the output needs it; at extreme scale, pre-filter on a
    * first pass over `xxhash64(shingle)` counts and join the survivors
    * back to recover the text. Returns (shingle, n_docs). */
  def boilerplateNgrams(df: DataFrame, text: String,
                        w: Int = 5, minDocs: Long = 3,
                        hashPrefilter: Boolean = false): DataFrame = {
    val exploded =
      df.select(explode(array_distinct(shingles(col(text), w))).as("shingle"))
    if (!hashPrefilter)
      exploded.groupBy("shingle").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= minDocs)
    else {
      // The extreme-scale path made real: pass 1 shuffles ONLY 8-byte
      // shingle hashes to find candidate hash buckets; pass 2 shuffles
      // the text of candidates alone (boilerplate is rare — the
      // surviving fraction is tiny) and re-counts exactly, so a hash
      // collision can inflate a candidate bucket but never the final
      // counts. Two scans instead of one, in exchange for the big
      // shuffle carrying hashes instead of n-gram strings.
      val hot = exploded
        .select(xxhash64(col("shingle")).as("hh"))
        .groupBy("hh").agg(count(lit(1)).as("hn"))
        .filter(col("hn") >= minDocs)
        .select("hh")
      // plain equi-join: AQE broadcasts `hot` when it is small (the
      // expected case) without forcing a broadcast that a pathological
      // candidate set could blow
      exploded
        .join(hot, xxhash64(col("shingle")) === col("hh"))
        .groupBy("shingle").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= minDocs)
    }
  }

  /** Cross-document repeated n-gram mining — the exact-substring dedup
    * signal (long spans appearing verbatim in more than one document,
    * per Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL'22 §4.1 — approximated here at fixed width w instead
    * of a suffix array, which does not distribute). Returns
    * (gram, n_docs, n_occ) for w-grams in >= `minDocs` distinct docs,
    * with total occurrence count including within-doc repeats.
    *
    * Plan shape: two hash aggregations, both partial-aggregated —
    * (gram, id) collapses within-doc repeats map-side, then (gram)
    * counts docs with a plain count(*) (each doc now contributes one
    * row per gram, so no countDistinct Expand and no skew from a
    * boilerplate gram appearing millions of times in one partition).
    * The shuffle key is the gram text because the output needs it; at
    * extreme scale pre-filter on xxhash64(gram) counts first, as
    * [[boilerplateNgrams]] documents. */
  def repeatedNgrams(df: DataFrame, text: String, id: String,
                     w: Int = 8, minDocs: Long = 2,
                     hashPrefilter: Boolean = false): DataFrame = {
    val exploded = df.select(col(id), explode(shingles(col(text), w)).as("gram"))
    val base =
      if (!hashPrefilter) exploded
      else {
        // scale path (see boilerplateNgrams): find candidate gram hashes
        // with an 8-byte shuffle first, then run the exact two-phase
        // aggregation over the candidates' text only — the final
        // n_docs filter removes any hash-collision passengers
        val hot = exploded
          .select(xxhash64(col("gram")).as("hh"), col(id))
          .distinct()
          .groupBy("hh").agg(count(lit(1)).as("hn"))
          .filter(col("hn") >= minDocs)
          .select("hh")
        exploded.join(hot, xxhash64(col("gram")) === col("hh"))
          .select(col(id), col("gram"))
      }
    base
      .groupBy(col("gram"), col(id))
      .agg(count(lit(1)).as("occ"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n_docs"), sum("occ").as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Variable-length exact-substring spans across documents — the
    * ExactSubstr signal of Lee et al., "Deduplicating Training Data
    * Makes Language Models Better" (ACL'22 §4.1). [[repeatedNgrams]] is
    * the fixed-width approximation; this recovers variable-length span
    * LENGTHS by seeding at winnowing anchors
    * ([[graft.functions.Expressions.WinnowAnchors]]) and extending each
    * cross-document anchor collision by bounded re-comparison. The
    * winnowing guarantee makes the seeding sound: any verbatim run of
    * >= k+w-1 chars shared by two documents contains a shared anchor,
    * so no qualifying span is missed — only measured, capped.
    *
    * Scale design (suffix arrays do not distribute; this does):
    *  - anchors are map-side (~2/(w+1) density per char), and each ships
    *    ONLY a bounded context window (maxExt chars either side of its
    *    k-gram) through the anchor-hash shuffle — full text never
    *    crosses an exchange;
    *  - same-hash anchors pair up INSIDE the bucket aggregate (the
    *    [[minhashDupPairs]] idiom: capped collect_list, in-array
    *    combinatorics — no second self-join shuffle), with buckets
    *    capped at maxBucket so one boilerplate gram cannot go quadratic
    *    (a dropped giant bucket is near-certain boilerplate — route it
    *    through [[boilerplateNgrams]]);
    *  - the k-gram text is compared exactly (FNV-collision guard), then
    *    span = k + longest common suffix of left contexts + longest
    *    common prefix of right contexts — native codegen'd kernels.
    *
    * Spans longer than k + 2*maxExt are reported capped at that bound —
    * the honesty line: a longer true span shows as several capped
    * anchors (n_anchors counts them), never as a wrong length.
    *
    * Returns (id_a, id_b, n_anchors, max_len): per cross-doc pair, the
    * number of colliding anchor pairs and the longest extended span,
    * filtered to max_len >= minLen. */
  /** The shared anchor-context stage of the ExactSubstr family:
    * per-document DISTINCT anchor contexts — (id, h, pre, post, ps)
    * rows, each carrying ONLY the bounded context window (maxExt chars
    * either side of the k-gram) plus every position it occurs at. The
    * duplicate collapse happens INSIDE the kernel, before any shuffle:
    * a document whose text repeats (menus, table rows, boilerplate
    * lines) ships each distinct context once, however many times it
    * occurs — full text never leaves this projection, and no dedup
    * exchange is needed. */
  private def anchorContexts(df: DataFrame, text: String, id: String,
                             k: Int, w: Int, maxExt: Int): DataFrame =
    df.filter(col(text).isNotNull)
      .select(col(id),
        explode(graft.functions.Expressions
          .anchor_contexts(col(text), k, w, maxExt)).as("_a"))
      .select(col(id), col("_a.h").as("h"), col("_a.pre").as("pre"),
        col("_a.post").as("post"), col("_a.ps").as("ps"))

  def exactSubstrSpans(df: DataFrame, text: String, id: String,
                       k: Int = 8, w: Int = 4, maxExt: Int = 48,
                       minLen: Int = 16, maxBucket: Int = 64): DataFrame = {
    Reserved.requireAbsent(df, "exactSubstrSpans",
      Seq("_a", "h", "pre", "post", "ps", "c", "_raw", "w"))
    // Duplicate contexts collapse INSIDE the anchor kernel (pairing
    // them instance-by-instance would be c_a×c_b identical ext
    // computations), so the one exchange here ships distinct contexts
    // only, each carrying its multiplicity c. Every downstream count is
    // reweighted by c, so the output is bit-identical to the
    // instance-level pairing the oracle replays: the bucket cap gates
    // on sum(c) (= the raw anchor count) and n_anchors sums c_a×c_b
    // (= the raw pair count).
    val ctxd = anchorContexts(df, text, id, k, w, maxExt)
      .select(col(id), col("h"), col("pre"), col("post"),
        size(col("ps")).cast("long").as("c"))
    val buckets = cappedBuckets(ctxd, Seq("h"), col("c"),
      struct(col(id), col("c"), col("pre"), col("post")), maxBucket, "xs")
    // unordered in-array combinations + id-normalized orientation: the
    // emitted pair SET is independent of collect_list's arrival order,
    // and ext is symmetric in (a, b) — deterministic under any
    // partitioning, which is what lets DuckDB replay it with a plain
    // self-join on (h, doc_a < doc_b)
    val pairs = buckets.select(explode(
        flatten(transform(col("xs"), (x, i) =>
          transform(slice(col("xs"), i + 2, size(col("xs"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
      .filter(col(s"p.a.$id") =!= col(s"p.b.$id"))
      .select(
        least(col(s"p.a.$id"), col(s"p.b.$id")).as("id_a"),
        greatest(col(s"p.a.$id"), col(s"p.b.$id")).as("id_b"),
        (col("p.a.c") * col("p.b.c")).as("w"),
        col("p.a.pre").as("pre_a"), col("p.a.post").as("post_a"),
        col("p.b.pre").as("pre_b"), col("p.b.post").as("post_b"))
      .filter(col("post_a").substr(lit(1), lit(k)) ===
        col("post_b").substr(lit(1), lit(k)))
      .withColumn("ext", lit(k) +
        graft.functions.Expressions.common_suffix_len(col("pre_a"), col("pre_b")) +
        graft.functions.Expressions.common_prefix_len(
          col("post_a").substr(lit(k + 1), lit(maxExt)),
          col("post_b").substr(lit(k + 1), lit(maxExt))))
    pairs.groupBy("id_a", "id_b")
      .agg(sum(col("w")).as("n_anchors"), max(col("ext")).as("max_len"))
      .filter(col("max_len") >= minLen)
  }

  /** The REMOVAL stage of ExactSubstr dedup (Lee et al. ACL'22 train
    * their models on the corpus with duplicate spans cut out, not just
    * flagged): every cross-document extended span of length >= minLen
    * is removed from the HIGHER-id document of each colliding pair —
    * the lowest-id document keeps the canonical occurrence — and
    * overlapping removal intervals are merged before splicing, so
    * nested/chained collisions cut each char at most once. Every input
    * document with non-null text comes back (id, n_spans,
    * n_chars_removed, text_clean) — null-text rows are dropped, the
    * same frame the detection chain (and the oracle's
    * `WHERE text IS NOT NULL`) operates on; untouched docs pass
    * through with zero spans and their text intact.
    *
    * Same detection chain and caps as [[exactSubstrSpans]] (same
    * anchors, same bucket cap on the raw anchor count, same bounded
    * ext) — what that operator reports, this one cuts. Scale shape:
    * the anchor/bucket stages are identical; the removal intervals are
    * pair-bounded (tiny next to the corpus), so the corpus-side cost is
    * ONE join of the interval aggregate against the corpus — document
    * text never shuffles, and the splice itself is map-side fold over
    * each doc's merged interval list. */
  def exactSubstrApply(df: DataFrame, text: String, id: String,
                       k: Int = 8, w: Int = 4, maxExt: Int = 48,
                       minLen: Int = 16, maxBucket: Int = 64): DataFrame = {
    Reserved.requireAbsent(df, "exactSubstrApply",
      Seq("_a", "h", "pre", "post", "ps", "_raw", "pos", "s", "e", "ivs", "_m"))
    // duplicate contexts arrive pre-collapsed from the anchor kernel,
    // one entry carrying ALL positions: a pair's (sfx, ext) depends
    // only on the contexts, so it applies to every instance position
    // at once
    val ctxd = anchorContexts(df, text, id, k, w, maxExt)
    val buckets = cappedBuckets(ctxd, Seq("h"), size(col("ps")).cast("long"),
      struct(col(id), col("ps"), col("pre"), col("post")), maxBucket, "xs")
    val sfx = graft.functions.Expressions.common_suffix_len(
      col("p.a.pre"), col("p.b.pre"))
    val pfx = graft.functions.Expressions.common_prefix_len(
      col("p.a.post").substr(lit(k + 1), lit(maxExt)),
      col("p.b.post").substr(lit(k + 1), lit(maxExt)))
    // per colliding entry pair: the HIGHER id's positions each yield a
    // removal interval [pos - sfx, pos - sfx + ext) — 0-based, end
    // exclusive
    val intervals = buckets.select(explode(
        flatten(transform(col("xs"), (x, i) =>
          transform(slice(col("xs"), i + 2, size(col("xs"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
      .filter(col(s"p.a.$id") =!= col(s"p.b.$id"))
      .filter(col("p.a.post").substr(lit(1), lit(k)) ===
        col("p.b.post").substr(lit(1), lit(k)))
      .select(
        greatest(col(s"p.a.$id"), col(s"p.b.$id")).as(id),
        when(col(s"p.a.$id") < col(s"p.b.$id"), col("p.b.ps"))
          .otherwise(col("p.a.ps")).as("ps"),
        sfx.as("sfx"), (lit(k) + sfx + pfx).as("ext"))
      .filter(col("ext") >= minLen)
      .select(col(id), explode(col("ps")).as("pos"),
        col("sfx"), col("ext"))
      .select(col(id), (col("pos") - col("sfx")).as("s"),
        (col("pos") - col("sfx") + col("ext")).as("e"))
    val perDoc = intervals.groupBy(col(id))
      .agg(array_sort(collect_list(struct(col("s"), col("e")))).as("ivs"))
    val ivT = "array<struct<s:int,e:int>>"
    // classic sorted-interval merge as a fold: extend the open interval
    // while the next one starts at or before its end, else start a new
    // island
    val merged = aggregate(
      coalesce(col("ivs"), array().cast(ivT)),
      array().cast(ivT),
      (acc, x) => when(
        size(acc) === 0 || x.getField("s") > element_at(acc, -1).getField("e"),
        concat(acc, array(x.cast("struct<s:int,e:int>"))))
        .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
          array(struct(
            element_at(acc, -1).getField("s").as("s"),
            greatest(element_at(acc, -1).getField("e"),
              x.getField("e")).as("e"))))))
    df.filter(col(text).isNotNull)
      .join(perDoc, Seq(id), "left")
      .withColumn("_m", merged)
      .select(col(id),
        size(col("_m")).cast("long").as("n_spans"),
        aggregate(col("_m"), lit(0),
          (acc, iv) => acc + iv.getField("e") - iv.getField("s"))
          .cast("long").as("n_chars_removed"),
        // splice: concatenate the segments BETWEEN merged intervals
        // (cursor fold), then the tail after the last one
        aggregate(col("_m"),
          struct(lit(0).as("cur"), lit("").as("txt")),
          (acc, iv) => struct(
            iv.getField("e").as("cur"),
            concat(acc.getField("txt"),
              col(text).substr(acc.getField("cur") + lit(1),
                iv.getField("s") - acc.getField("cur"))).as("txt")),
          acc => concat(acc.getField("txt"),
            col(text).substr(acc.getField("cur") + lit(1),
              length(col(text)) - acc.getField("cur")))).as("text_clean"))
  }

  /** Choose the LSH banding (bands, rowsPerBand) for a target Jaccard
    * threshold — the datasketch `optimal_param` policy restricted to
    * exact divisors of the signature length `k` (this op's contract:
    * bands × rowsPerBand = k). Minimizes
    * `fpWeight·FP + (1−fpWeight)·FN`, where FP/FN are the fixed-grid
    * integrals of the banding S-curve `P(hit|s) = 1 − (1 − s^r)^b`
    * below/above the threshold. Deterministic (fixed 1000-point
    * midpoint grid, ties to the fewest bands — fewer bands = fewer
    * bucket exchanges). [[minhashDupPairs]]' defaults (k=64, bands=16)
    * are exactly `lshParams(0.5, 64)`: the 16/4 S-curve's midpoint
    * (1/16)^(1/4) = 0.5 — the policy makes the sizing reproducible
    * instead of folklore, the [[SimilarityOps.sizedPq]] stance. */
  def lshParams(threshold: Double, k: Int = 64,
                fpWeight: Double = 0.5): (Int, Int) = {
    require(threshold > 0 && threshold < 1,
      s"lshParams: threshold must be in (0,1): $threshold")
    require(k >= 2, s"lshParams: need k >= 2: $k")
    require(fpWeight >= 0 && fpWeight <= 1,
      s"lshParams: fpWeight must be in [0,1]: $fpWeight")
    val grid = 1000
    def cost(b: Int, r: Int): Double = {
      var fp = 0.0
      var fn = 0.0
      var i = 0
      while (i < grid) {
        val s = (i + 0.5) / grid
        val hit = 1.0 - math.pow(1.0 - math.pow(s, r), b)
        if (s < threshold) fp += hit else fn += 1.0 - hit
        i += 1
      }
      (fpWeight * fp + (1.0 - fpWeight) * fn) / grid
    }
    (1 to k).filter(k % _ == 0).map(b => (b, k / b))
      .minBy { case (b, r) => cost(b, r) }
  }

  /** MinHash+LSH near-duplicate candidate pairs with signature-estimated
    * Jaccard. bands*rowsPerBand must equal the signature length.
    * Returns (idA, idB, est_jaccard) with idA < idB, est >= threshold.
    * Size `bands` for a non-default threshold with [[lshParams]].
    */
  def minhashDupPairs(df: DataFrame, text: String, id: String,
                      shingleWidth: Int = 3, k: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5, maxBucket: Int = 200): DataFrame = {
    require(k % bands == 0, "bands must divide signature length")
    val banded = bandSignatures(df, text, id, shingleWidth, k, bands)
      .withColumn("is_new", lit(true))
    minhashPairsFromBanded(banded, id, k, threshold, maxBucket)
  }

  /** MinHash band rows for a corpus: (id, sig, band, bkey), one row per
    * band per doc. The shared front half of the batch and incremental
    * ([[DedupIndex]]) paths — and the exact layout the index persists. */
  private[ops] def bandSignatures(df: DataFrame, text: String, id: String,
                                  shingleWidth: Int, k: Int,
                                  bands: Int): DataFrame = {
    // signature is a single-pass native expression (Kernels): the naive
    // HOF formulation (k array_min(transform(...)) over shingle strings)
    // re-materializes the shingles k times per row — 20x+ slower.
    val sigs = df
      .select(col(id), minhash_sig(split(col(text), " "), shingleWidth, k).as("sig"))
      .filter(size(col("sig")) > 0)
    // posexplode over a single-pass BandKeys expression: the signature
    // child is evaluated exactly once per row, never per band
    sigs.select(col(id), col("sig"),
      posexplode(band_keys(col("sig"), bands)).as(Seq("band", "bkey")))
  }

  /** Capped-bucket pair generation + signature-estimated Jaccard over a
    * banded table with an `is_new` marker column: pairs where NEITHER
    * side is new are skipped (the incremental path has already emitted
    * them in an earlier batch; the batch path marks every row new). */
  private[ops] def minhashPairsFromBanded(banded: DataFrame, id: String,
                                          k: Int, threshold: Double,
                                          maxBucket: Int): DataFrame = {
    // bucket aggregate: cap-gated member list -> in-bucket pair
    // generation (cap enforced BEFORE collect — see cappedBuckets)
    val buckets = cappedBuckets(banded, Seq("band", "bkey"), lit(1L),
      struct(col(id), col("sig"), col("is_new")), maxBucket, "members")
    val pairs = buckets.select(explode(
      flatten(transform(col("members"), (x, i) =>
        transform(slice(col("members"), i + 2, size(col("members"))),
          y => struct(x.as("a"), y.as("b"))))))
      .as("p"))
      .filter(col("p.a.is_new") || col("p.b.is_new"))
      .filter(col(s"p.a.$id") =!= col(s"p.b.$id")) // an id re-appended over its own index entry
      .select(
        least(col(s"p.a.$id"), col(s"p.b.$id")).as("id_a"),
        greatest(col(s"p.a.$id"), col(s"p.b.$id")).as("id_b"),
        when(col(s"p.a.$id") < col(s"p.b.$id"), col("p.a.sig")).otherwise(col("p.b.sig")).as("sig_a"),
        when(col(s"p.a.$id") < col(s"p.b.$id"), col("p.b.sig")).otherwise(col("p.a.sig")).as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("est_jaccard", roundHalfUp(
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v) / lit(k.toDouble), 4))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash near-duplicate pairs: 64-bit signature, LSH-banded with
    * exact recall for the requested radius, verified with bit_count on
    * the XOR of candidate signatures.
    *
    * Banding scheme by radius (both are pigeonhole-exact):
    *  - radius <= 3: the signature split into maxHamming+1 chunks —
    *    hamming <= chunks-1 implies at least one equal chunk. Chunk keys
    *    carry 64/(h+1) >= 16 bits: keyspace comfortably exceeds even
    *    billion-doc corpora, so buckets stay small.
    *  - radius >= 4: single-chunk keys would shrink to <= 12.8 bits —
    *    at large corpus sizes every bucket saturates, the cap drops
    *    them, and recall silently collapses. Instead: permuted-block
    *    tables (Manku/Jain/Sarma, WWW'07) — m = h+2 blocks, one table
    *    per 2-subset of blocks (C(h+2,2) tables), key = the two intact
    *    blocks (2*64/(h+2) bits, e.g. 21 bits at h=4). Any pair within
    *    radius h leaves >= 2 blocks intact, so some table matches.
    *    Table count grows quadratically in h — radius <= 6 is the
    *    scale-sane regime at billions of docs. */
  def simhashDupPairs(df: DataFrame, text: String, id: String,
                      maxHamming: Int = 3, maxBucket: Int = 200): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16,
      "maxHamming must be in [0, 16) — negative values would fail " +
        "per-row inside chunk_keys instead of here")
    val keys =
      if (maxHamming <= 3) chunk_keys(col("sig"), maxHamming + 1)
      else perm_table_keys(col("sig"), maxHamming + 2, 2)
    val sigs = df.select(col(id),
      simhash64(split(col(text), " ")).as("sig"))
    val banded = sigs.select(col(id), col("sig"),
      posexplode(keys).as(Seq("chunk", "ckey")))
    val buckets = cappedBuckets(banded, Seq("chunk", "ckey"), lit(1L),
      struct(col(id), col("sig")), maxBucket, "members")
    buckets.select(explode(
      flatten(transform(col("members"), (x, i) =>
        transform(slice(col("members"), i + 2, size(col("members"))),
          y => struct(x.as("a"), y.as("b"))))))
      .as("p"))
      .select(
        least(col(s"p.a.$id"), col(s"p.b.$id")).as("id_a"),
        greatest(col(s"p.a.$id"), col(s"p.b.$id")).as("id_b"),
        bit_count(col("p.a.sig").bitwiseXOR(col("p.b.sig"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-duplicate pair set: every doc is
    * labeled with the smallest doc id reachable through dup pairs — the
    * clustering step that turns pairwise candidates into dedup groups
    * (keep one representative per component). Iterative min-label
    * propagation: each round is one shuffle (join on the edge source +
    * min-aggregate), converging in O(component diameter) rounds; lineage
    * is cut with localCheckpoint per round so the plan stays flat. For
    * pathological chain-shaped components at extreme scale the
    * large-star/small-star refinement (Kiveris et al., SoCC'14) halves
    * the rounds; dup clusters are near-cliques, so plain propagation
    * converges in 2-3 rounds in practice.
    */
  /** Cut a frame's lineage, eagerly materializing it. If the
    * application configured a checkpoint directory
    * (`sc.setCheckpointDir` on HDFS/S3 — the GraphX/Pregel convention
    * for iterative jobs), use a RELIABLE checkpoint: blocks live in the
    * shared filesystem and survive executor loss, which an iterative
    * job with truncated lineage cannot otherwise recover from. Without
    * one, fall back to an eager localCheckpoint — correct in local/test
    * mode where losing an executor is losing the driver anyway. */
  private[ops] def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cp = df.checkpoint(eager = true)
      // checkpoint alone re-reads the DISTRIBUTED-FS files on every use
      // (each round reads labels twice and edges once) — persist the
      // checkpointed rdd DISK_ONLY so iteration reads stay node-local;
      // an executor loss recomputes the lost blocks from the reliable
      // files. freeCheckpoint unpersists these blocks with the files.
      cp.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        case _ => ()
      }
      cp
    } else df.localCheckpoint(eager = true)

  /** Release a superseded iteration's checkpoint storage. Each eager
    * local checkpoint pins its partitions in executor storage (and each
    * reliable one leaves files in the checkpoint dir) for the lifetime
    * of the session; without this, an iterative job leaks
    * O(iterations × |labels|) of block-manager memory or checkpoint-dir
    * space — harmless at test scale, a storage-eviction fight at
    * 100 TB. Only called on frames no later step can recompute from
    * (lineage is truncated). */
  private[graft] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          try p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
          catch { case _: java.io.IOException => () } // best-effort cleanup
        }
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Min-label propagation core shared by [[connectedComponents]]
    * (which REFUSES a non-converged answer) and
    * [[connectedComponentsAuto]] (which falls back to star
    * contraction): returns the labels plus whether the propagation
    * actually reached its fixpoint within `maxIter` rounds. The edge
    * checkpoint is always released; a non-converged labels frame is the
    * CALLER's to release (or throw away loudly). */
  private def propagateLabels(pairs: DataFrame, idA: String, idB: String,
                              maxIter: Int): (DataFrame, Boolean) = {
    val edges = cut(pairs.select(col(idA).as("s"), col(idB).as("t"))
      .unionByName(pairs.select(col(idB).as("s"), col(idA).as("t")))
      .distinct())
    var labels = cut(edges.select(col("s").as("id")).distinct()
      .withColumn("label", col("id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaEdges = edges.join(labels, edges("s") === labels("id"))
        .select(col("t").as("id"), col("label"),
          lit(null).cast(labels.schema("label").dataType).as("_old"))
      // carry each id's previous label through the min fold (every id
      // has exactly ONE labels row, so min(_old) ignores the viaEdges
      // nulls and recovers it): the convergence probe then reads the
      // checkpointed result with a filter instead of re-joining the
      // two label frames — one cached scan per round replaces a full
      // join job. Labels only ever decrease, so "nothing changed" ≡
      // "label == previous label on every row".
      val next = cut(labels.select(col("id"), col("label"),
          col("label").as("_old"))
        .unionByName(viaEdges)
        .groupBy("id").agg(min(col("label")).as("label"),
          min(col("_old")).as("_old")))
      converged = next.filter(col("label") =!= col("_old")).isEmpty
      freeCheckpoint(labels) // superseded by next; convergence check is done
      labels = next.select("id", "label")
      i += 1
    }
    val out = labels.select(col("id"), col("label").as("component"))
    freeCheckpoint(edges) // the result needs only the final labels
    (out, converged)
  }

  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 25): DataFrame = {
    val (out, converged) = propagateLabels(pairs, idA, idB, maxIter)
    // partially-propagated labels are SILENT under-dedup downstream
    // (several nodes of one cluster still read as their own
    // representative) — refuse to return them. Duplicate clusters are
    // near-cliques (diameter 2-3); a component needing > maxIter rounds
    // means pathological chaining the caller must opt into via a
    // larger maxIter, not a quietly wrong answer.
    if (!converged) freeCheckpoint(out)
    require(converged,
      s"connectedComponents: not converged after $maxIter rounds — " +
        "component diameter exceeds maxIter; raise it (or pre-split " +
        "the pair set) rather than accept partially-merged components")
    out
  }

  /** [[connectedComponents]] with an automatic DIAMETER fallback: run
    * min-label propagation (the cheap path for near-clique duplicate
    * clusters, fixpoint in 2-3 rounds), and if the pair graph turns out
    * to chain past the round budget, discard the partial labels and
    * rerun as [[connectedComponentsStar]] — identical labels by the
    * star-contraction contract (StarComponentsSpec pins the ≡),
    * O(log² n) rounds regardless of diameter. The right DEFAULT for
    * ingest paths that cannot know a batch's graph shape up front
    * ([[graft.ops.ComponentsIndex.appendAndLabel]], the streaming
    * sinks): clique-shaped batches never pay the star constant, and a
    * verbatim-overlap chain degrades to the scale path instead of
    * aborting the run. Cost of the miss: the `maxIter` wasted
    * propagation rounds before the fallback — bounded, loud in logs,
    * never wrong. */
  def connectedComponentsAuto(pairs: DataFrame, idA: String = "id_a",
                              idB: String = "id_b", maxIter: Int = 25,
                              starMaxIter: Int = 50): DataFrame = {
    val (out, converged) = propagateLabels(pairs, idA, idB, maxIter)
    if (converged) out
    else {
      freeCheckpoint(out) // partial labels: release, never return
      connectedComponentsStar(pairs, idA, idB, starMaxIter)
    }
  }

  /** Release the storage behind a [[connectedComponents]] result once it
    * has been consumed. In local mode that is block-manager memory (it
    * dies with the session anyway); with a RELIABLE checkpoint dir the
    * final labels' rdd-N directory lives on the shared filesystem until
    * released — a per-call leak for long-lived applications that run
    * components repeatedly. Call AFTER every action on frames derived
    * from the result (the lineage below the labels is truncated). */
  def releaseComponents(labels: DataFrame): Unit = freeCheckpoint(labels)

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * rounds (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014) — the HIGH-DIAMETER scale path.
    * [[connectedComponents]]' min-label propagation needs one round per
    * unit of component diameter, which is the right trade for near-
    * clique duplicate clusters (diameter 2-3) but deadline-misses on
    * chain-shaped pair graphs (verbatim-overlap chains across a crawl:
    * doc A overlaps B overlaps C …), where diameter grows with the
    * corpus. Star contraction converges in O(log² n) rounds REGARDLESS
    * of diameter: each large-star round hangs every node's larger
    * neighbors off its neighborhood minimum (halving tree height),
    * each small-star round flattens the smaller neighbors onto it, and
    * the fixpoint is a star forest — every node pointing directly at
    * its component's minimum id, the same labeling contract as
    * [[connectedComponents]] (StarComponentsSpec pins the equality).
    *
    * Per round: one neighborhood-min aggregation + one equi join over
    * the current edge set — edges only ever point from larger to
    * smaller, and the total edge count never grows above the input's
    * symmetrized size (the paper's invariant), so every round is a
    * bounded shuffle of the (pair-bounded, corpus-independent) edge
    * set. Same storage discipline as the propagation loop: each
    * iteration's frame is checkpoint-cut and its predecessor released.
    */
  def connectedComponentsStar(pairs: DataFrame, idA: String = "id_a",
                              idB: String = "id_b",
                              maxIter: Int = 50): DataFrame = {
    val nodes0 = cut(pairs.select(col(idA).as("id"))
      .unionByName(pairs.select(col(idB).as("id"))).distinct())
    // child → parent orientation (t < s), self-loops dropped: a
    // self-pair asserts no connectivity and would survive every round
    var edges = cut(pairs
      .filter(col(idA) =!= col(idB))
      .select(greatest(col(idA), col(idB)).as("s"),
        least(col(idA), col(idB)).as("t"))
      .distinct())
    var converged = false
    var i = 0
    // carried across rounds: |edges| is last round's |next|, so the
    // steady-state convergence check is ONE count job per round (the
    // set-equality anti join runs only on a count match, i.e. at the
    // fixpoint and on the rare same-size reshuffle round) — the
    // count+count+anti triple this replaces ran two jobs per round on
    // the bench's most expensive key
    var edgeCount = edges.count()
    while (!converged && i < maxIter) {
      val nbrs = edges.select(col("s"), col("t"))
        .unionByName(edges.select(col("t").as("s"), col("s").as("t")))
      // LARGE-STAR: every edge processed from its SMALLER endpoint u —
      // each strictly-larger neighbor v re-hangs onto m = min(Γ(u)∪{u})
      val minsL = nbrs.groupBy("s").agg(min(col("t")).as("mn"))
        .select(col("s"), least(col("mn"), col("s")).as("m"))
      val large = nbrs.join(minsL, "s")
        .filter(col("t") > col("s"))
        .filter(col("t") =!= col("m"))
        .select(col("t").as("s"), col("m").as("t"))
        .distinct()
      // SMALL-STAR over the large-star output: every edge processed
      // from its LARGER endpoint u — the smaller neighbors (and u)
      // flatten onto m = min(Γ⁻(u)∪{u}) = min(Γ⁻(u))
      val nbrs2 = large.select(col("s"), col("t"))
        .unionByName(large.select(col("t").as("s"), col("s").as("t")))
        .filter(col("t") < col("s"))
      val minsS = nbrs2.groupBy("s").agg(min(col("t")).as("m"))
      val next = cut(nbrs2.join(minsS, "s")
        .filter(col("t") =!= col("m"))
        .select(col("t").as("s"), col("m").as("t"))
        .unionByName(minsS.select(col("s"), col("m").as("t")))
        .distinct())
      // fixpoint: the edge set stopped moving (set equality — counts
      // match, then one anti confirms nothing moved; equal-size
      // distinct sets with an empty difference are equal)
      val nextCount = next.count()
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("s", "t"), "left_anti").isEmpty
      edgeCount = nextCount
      freeCheckpoint(edges)
      edges = next
      i += 1
    }
    require(converged,
      s"connectedComponentsStar: not converged after $maxIter rounds — " +
        "star contraction needs O(log² n); raise maxIter")
    // star forest: every child points directly at its component's
    // minimum; roots and isolated nodes label themselves
    val out = nodes0.join(edges.select(col("s").as("id"),
        col("t").as("component")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
    out
  }

  /** Apply near-dup clustering to a corpus: keep ONE representative (the
    * smallest id) per duplicate cluster and pass every unclustered doc
    * through — the final step of the candidate-pairs → components →
    * filtered-corpus dedup pipeline. The drop set is bounded by the
    * pair count (tiny next to the corpus), so the only corpus-side cost
    * is the anti join's key exchange; document text never shuffles.
    * Components run through [[connectedComponentsAuto]]: a dedup-apply
    * over real crawl pairs must survive a verbatim-overlap CHAIN
    * (diameter past the propagation budget) by degrading to star
    * contraction, not abort — labels identical either way
    * (StarComponentsSpec pins the ≡). */
  def dedupApply(corpus: DataFrame, pairs: DataFrame, id: String,
                 idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val labels = connectedComponentsAuto(pairs, idA, idB)
    // Materialize the (small, pair-bounded) drop set NOW so the labels'
    // reliable-checkpoint files can be released before returning: the
    // result is lazy, so leaving the release to the caller would leak
    // one rdd-N directory on the shared checkpoint filesystem per call
    // for the session lifetime. localCheckpoint severs the lineage into
    // executor block storage (MEMORY_AND_DISK) — cheap at drop-set
    // size, and it dies with the session instead of accreting on disk.
    val drop = labels
      .filter(col("id") =!= col("component"))
      .select(col("id").as("_drop_id"))
      .localCheckpoint(true)
    releaseComponents(labels)
    corpus.join(drop, corpus(id) === drop("_drop_id"), "left_anti")
  }

  /** Exact n-gram Jaccard similarity for a bounded candidate set —
    * the ground-truth near-dup measure (and the verifier for the
    * approximate paths in tests). */
  def ngramJaccard(a: DataFrame, b: DataFrame, text: String, id: String,
                   w: Int = 3): DataFrame = {
    val sa = a.select(col(id).as("id_a"), shingles(col(text), w).as("sh_a"))
    val sb = b.select(col(id).as("id_b"), shingles(col(text), w).as("sh_b"))
    // pairs are CANONICALIZED (least, greatest) + deduped, not filtered
    // on id_a < id_b: Jaccard is symmetric, and with two DIFFERENT
    // candidate frames a plain a<b filter would silently drop every
    // pair whose a-side id happens to be the larger one — a real
    // near-duplicate reported as no-match. Same-frame calls get the
    // identical output (both orientations collapse to one row).
    sa.crossJoin(sb).filter(col("id_a") =!= col("id_b"))
      .withColumn("inter", size(array_distinct(array_intersect(col("sh_a"), col("sh_b")))))
      .withColumn("uni", size(array_distinct(concat(col("sh_a"), col("sh_b")))))
      .withColumn("jaccard", roundHalfUp(col("inter") / nullif(col("uni"), lit(0)), 6))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("inter"), col("uni"), col("jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram CONTAINMENT for a bounded candidate set: |A∩B| / |A|
    * per ORDERED pair — the partial-overlap measure Jaccard misses.
    * A short doc quoted wholesale inside a long one scores containment
    * ~1 while its Jaccard is tiny (the union is dominated by B), so
    * quote/suffix/prefix duplication needs this directional form.
    * Same contract as [[ngramJaccard]]: candidate sets are pre-bounded
    * upstream (LSH buckets, an index probe), never the full corpus. */
  def ngramContainment(a: DataFrame, b: DataFrame, text: String,
                       id: String, w: Int = 3): DataFrame = {
    val sa = a.select(col(id).as("id_a"), shingles(col(text), w).as("sh_a"))
    val sb = b.select(col(id).as("id_b"), shingles(col(text), w).as("sh_b"))
    sa.crossJoin(sb).filter(col("id_a") =!= col("id_b"))
      .withColumn("inter",
        size(array_distinct(array_intersect(col("sh_a"), col("sh_b")))))
      .withColumn("n_a", size(array_distinct(col("sh_a"))))
      .withColumn("containment",
        roundHalfUp(col("inter") / nullif(col("n_a"), lit(0)), 6))
      .select("id_a", "id_b", "inter", "n_a", "containment")
  }
}
