package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Expressions.cosine_sim
import graft.functions.Rounding.roundHalfUp

/** Distributed k-means over an embedding column, plus the SemDeDup-style
  * semantic dedup built on it (cluster the corpus, then drop near-identical
  * pairs WITHIN a cluster — Abbas et al. 2023, "SemDeDup": all-pairs cosine
  * is intractable at corpus scale, but pairs across clusters are almost
  * never near-dups, so confining the pair search to clusters makes the
  * quadratic term local and bounded).
  *
  * This is the FULL-CORPUS counterpart of
  * [[SimilarityOps.buildIvfIndex]]'s driver-side sampled trainer: every
  * vector votes in every Lloyd round. Use the sampled trainer when
  * centroids only need to be representative (IVF routing); use this when
  * the assignment itself is the product (semantic dedup, corpus curation,
  * diversity sampling) and must be reproducible.
  *
  * Determinism contract (the [[Graph.pagerank]] policy applied to
  * clustering): classic float k-means is not reproducible across engines
  * or partitionings — float summation order differs per partition layout.
  * Here every Lloyd round is exact-integer:
  *  - assignment: cosine in double, HALF_UP-rounded to 6 digits BEFORE
  *    the arg-max (ties to the smallest centroid id) — the exact
  *    comparison the DuckDB oracle replays; an unrounded arg-max could
  *    flip on last-ulp noise between engines.
  *  - update: each component is quantized to a long at `quantScale`
  *    (floor(x*scale+0.5), round-half-up), per-cluster component sums are
  *    exact long adds (order-independent), and the mean is one long
  *    division (Java truncation-toward-zero — identical to DuckDB `//`)
  *    re-scaled to float32. Bit-identical on any cluster size, any
  *    partitioning, any engine replaying the same integer ops.
  *
  * Scale design (the 100 TB story):
  *  - The corpus NEVER shuffles. Assignment is a map-side expression
  *    against k broadcast centroid literals (k×dim floats — tiny);
  *    the update's posexplode is map-side and partial-aggregated, so the
  *    per-round exchange is partitions × k × dim partial-sum rows —
  *    independent of corpus size.
  *  - Driver state is k × dim floats per round (the collected sums are
  *    k × dim rows) — bounded by the model, not the data.
  *  - Overflow headroom: a component sum is bounded by
  *    |cluster| × quantScale × max|x|. At quantScale = 1e6 and unit-norm
  *    embeddings, clusters up to ~10^12 vectors fit a long.
  *  - Iteration count is a fixed hyperparameter (SemDeDup uses a handful
  *    of Lloyd rounds), so there is no unbounded-lineage concern: each
  *    round starts from a fresh scan plus a driver-held centroid array.
  */
object Clustering {

  /** The `routing = "auto"` crossover for [[semdedup]]: tree routing
    * above this k, flat at or below it. Per-row training+assignment
    * flops are ~k·(iters+1) flat vs ~3·sqrt(k)·(iters+1) tree at
    * g = sqrt(k) (coarse stage g cosines + routed stage g + k/g), so
    * tree wins on arithmetic from k ≈ 16 — but it also runs a second
    * Lloyd stage (more driver rounds, more small jobs), so the switch
    * sits at 32, where the ~2× per-row flop advantage dominates the
    * fixed stage overhead at any realistic corpus size. The Abbas et
    * al. k ≈ corpus/10^3..10^4 policy puts every at-scale caller far
    * above it. */
  val AutoTreeK = 32

  /** Trained model: the final centroids (driver-side, k × dim — bounded
    * by the model) and the final hard assignment of every corpus vector
    * (id, cluster_id, sim), computed against those centroids. */
  final case class KmeansModel(centroids: Seq[(Long, Array[Float])],
                               assignments: DataFrame)

  /** Arg-max-cosine against driver-held centroids as ONE map-side
    * native kernel call per row returning struct(sim, cid):
    * [[SimilarityOps.assignToCentroids]]'s total order (rounded sim
    * DESC, cid ASC) without its aggregate — no exchange at all. A
    * plan-level CASE-WHEN fold over k struct candidates was measured to
    * blow the janino method-size limit at k=8/dims=64 and drop the map
    * stage out of whole-stage codegen; the kernel keeps it compiled. */
  private def bestCentroid(vec: Column,
                           cents: Seq[(Long, Array[Float])]): Column =
    graft.functions.Expressions.best_centroid(vec, cents)

  /** Deterministic distance-weighted seeding (the k-means++ shape made
    * oracle-replayable): seed 1 = the smallest id; each later seed is
    * the unchosen vector maximizing the EXACT-INTEGER draw key
    * `dq² · (1 + hash)` where `dq = 10^6 − round(maxsim·10^6)` (maxsim
    * = best rounded cosine against the seeds so far — zero for an
    * already-chosen vector, so re-picks are impossible even without
    * the explicit exclusion) and `hash = ((id + round) · 2654435761)
    * mod 2^20` (PortableHash, varied per round). The hash factor
    * spreads picks across similarly-far vectors instead of pure
    * farthest-first outlier-chasing; the integer key keeps the argmax
    * bit-identical on any engine (ties → smallest id). Fixes the
    * smallest-k-ids degeneracy on corpora where id order correlates
    * with content (crawl order does). Cost: k−1 map-side corpus scans,
    * each exchanging one partial-max row per partition — for large k
    * seed on a sample instead. Bound check: dq ≤ 2·10^6, so
    * dq²·(1+2^20) < 2^63 — no wrap on either engine. */
  private def seedPlusPlus(base: DataFrame, k: Int): Seq[(Long, Array[Float])] = {
    val first = base.orderBy("_kid").limit(1).collect()
    require(first.nonEmpty, "kmeans: corpus has no non-null vectors")
    var chosen: Seq[(Long, Array[Float])] =
      Seq((first(0).getLong(0), first(0).getSeq[Float](1).toArray))
    for (j <- 2 to k) {
      val sorted = chosen.sortBy(_._1) // best_centroid's ascending-ids contract
      val best = graft.functions.Expressions.best_centroid(col("_kvec"), sorted)
      val dq = lit(1000000L) -
        round(best.getField("sim") * lit(1000000d)).cast("long")
      val h = graft.functions.PortableHash.hashMod(
        col("_kid") + lit(j.toLong), 1048576L)
      val key = dq * dq * (lit(1L) + h)
      val picked = base
        .filter(!col("_kid").isInCollection(chosen.map(_._1)))
        .agg(max(struct(key.as("_key"), (-col("_kid")).as("_nid"),
          col("_kvec"))).as("_b"))
        .head().getStruct(0)
      require(picked != null,
        s"kmeans: corpus exhausted after ${chosen.length} seeds, need k=$k")
      chosen :+= (-picked.getLong(1), picked.getSeq[Float](2).toArray)
    }
    chosen
  }

  /** One Lloyd update's exact-integer sufficient statistics: quantize
    * map-side, partial-aggregate the long sums — the exchange is
    * partitions × k × dim rows, never the corpus. `best` must evaluate
    * to the struct(sim, cid) assignment of `_kvec`. */
  private def lloydSums(base: DataFrame, best: Column,
      quantScale: Long): Map[Long, Array[org.apache.spark.sql.Row]] =
    base
      .select(best.getField("cid").as("_cid"), posexplode(col("_kvec")))
      .select(col("_cid"), col("pos"),
        floor(col("col").cast("double") * lit(quantScale.toDouble) + lit(0.5d))
          .cast("long").as("_q"))
      .groupBy("_cid", "pos")
      .agg(sum(col("_q")).as("_s"), count(lit(1)).as("_n"))
      .collect()
      .groupBy(_.getLong(0))

  /** The centroid for `cid` after one Lloyd round: the truncating
    * integer mean of its members re-scaled to float32, or `old` when
    * the cluster went empty. Java long division truncates toward zero —
    * the exact semantics of DuckDB's integer `//` (verified both
    * signs). */
  private def updatedCentroid(byCid: Map[Long, Array[org.apache.spark.sql.Row]],
      cid: Long, old: Array[Float], quantScale: Long): Array[Float] =
    byCid.get(cid) match {
      case None => old // empty cluster: keep its centroid
      case Some(rows) =>
        val arr = new Array[Float](old.length)
        rows.foreach { r =>
          val q = r.getLong(2) / r.getLong(3)
          arr(r.getInt(1)) = (q.toDouble / quantScale).toFloat
        }
        arr
    }

  /** Lloyd's k-means: deterministic seeding (`init = "minid"`: the k
    * smallest-id vectors; `init = "kmeanspp"`: the distance-weighted
    * [[seedPlusPlus]] draw — both oracle-replayable), `iters`
    * exact-integer update rounds, then a final hard assignment against
    * the trained centroids. Null vectors are dropped; ragged vectors
    * fail fast in the cosine kernel; `id` must be unique (duplicate ids
    * would make the seed order ambiguous). An empty cluster keeps its
    * previous centroid. Centroids always carry ascending seed ids, so
    * the kernel's first-max tie-break IS the smallest-cid tie-break the
    * oracle replays — regardless of the order seeding chose them. */
  def kmeans(corpus: DataFrame, vec: String, id: String, k: Int, iters: Int,
             quantScale: Long = 1000000L,
             init: String = "minid"): KmeansModel = {
    require(k >= 1, s"kmeans: k must be >= 1, got $k")
    require(iters >= 0, s"kmeans: iters must be >= 0, got $iters")
    require(quantScale > 0, s"kmeans: quantScale must be positive, got $quantScale")
    require(init == "minid" || init == "kmeanspp",
      s"kmeans: init must be minid or kmeanspp, got $init")
    Reserved.requireAbsent(corpus, "kmeans", Seq("_kid", "_kvec"))
    val base = corpus.filter(col(vec).isNotNull)
      .select(col(id).cast("long").as("_kid"), col(vec).as("_kvec"))
    var cents: Seq[(Long, Array[Float])] =
      if (init == "kmeanspp") seedPlusPlus(base, k).sortBy(_._1)
      else {
        val rows = base.orderBy("_kid").limit(k).collect()
        require(rows.length == k,
          s"kmeans: corpus has only ${rows.length} non-null vectors, need k=$k")
        rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      }
    for (_ <- 1 to iters) {
      val best = bestCentroid(col("_kvec"), cents)
      val byCid = lloydSums(base, best, quantScale)
      cents = cents.map { case (cid, old) =>
        (cid, updatedCentroid(byCid, cid, old, quantScale))
      }
    }
    val best = bestCentroid(col("_kvec"), cents)
    val assignments = base.select(col("_kid").as(id),
      best.getField("cid").as("cluster_id"),
      best.getField("sim").as("sim"))
    KmeansModel(cents, assignments)
  }

  /** Two-level tree model: the g coarse routing centroids, the fine
    * centroids tagged with their coarse group (`(cid, gid, vec)`,
    * cid-ascending), and the final routed hard assignment. */
  final case class TreeKmeansModel(coarse: Seq[(Long, Array[Float])],
                                   fine: Seq[(Long, Long, Array[Float])],
                                   assignments: DataFrame) {
    /** Map-side routed assignment of an arbitrary vector column —
      * g + |group| cosines per row (see
      * [[graft.functions.Kernels.bestCentroidRouted]]). */
    def assignColumn(vec: Column): Column =
      graft.functions.Expressions.best_centroid_routed(vec, coarse, fine)
  }

  /** Hierarchical (tree) k-means — the scale answer to [[kmeans]]'s
    * flat k-cosine assignment, and the "assign against a centroid
    * tree" move SemDeDup needs once k scales with the corpus (Abbas et
    * al. use k ≈ corpus/10^3..10^4, so flat assignment is k×N flops):
    *
    *  1. Stage 1 trains `g` COARSE centroids with the plain
    *     deterministic [[kmeans]] (g ≈ sqrt(k)); every row's group is
    *     its rounded-arg-max coarse centroid, fixed from here on.
    *  2. Stage 2 seeds ceil(k/g) fine centroids per reachable group
    *     (the group's smallest member ids — minid per group) and runs
    *     `iters` Lloyd rounds where each row competes ONLY against its
    *     own group's fine centroids, via one map-side
    *     [[graft.functions.Kernels.bestCentroidRouted]] kernel call:
    *     g + ceil(k/g) ≈ 2·sqrt(k) cosines per row instead of k.
    *
    * Same determinism contract as [[kmeans]] (rounded arg-max at both
    * levels, exact-integer updates) — the DuckDB oracle replays both
    * stages. Same scale shape too: the corpus never shuffles for
    * assignment or update (the per-round exchange is partitions × fine
    * × dim partial sums); the one extra linear shuffle is stage 2's
    * seed selection, a window over (gid, id) PAIRS — 16 bytes/row, no
    * vectors. Fine cluster count is min(ceil(k/g), |group|) per group,
    * so up to g·ceil(k/g) total (slightly above k when g ∤ k).
    *
    * Approximation note (the IVF trade-off, stated not hidden): a row
    * whose nearest fine centroid lives OUTSIDE its coarse group is
    * routed to its in-group best instead — same policy as
    * [[SimilarityOps]]'s IVF probe with nprobe=1. SemDeDup tolerates
    * this by construction (near-identical pairs co-route: their
    * rounded coarse sims agree). Driver state: (g + fine) × dim
    * floats — bounded by the model. */
  def kmeansTree(corpus: DataFrame, vec: String, id: String, k: Int, g: Int,
                 iters: Int, quantScale: Long = 1000000L): TreeKmeansModel = {
    require(g >= 1, s"kmeansTree: g must be >= 1, got $g")
    require(k >= g, s"kmeansTree: k ($k) must be >= g ($g)")
    require(iters >= 0, s"kmeansTree: iters must be >= 0, got $iters")
    val coarseModel = kmeans(corpus, vec, id, k = g, iters = iters, quantScale)
    val coarse = coarseModel.centroids
    val base = corpus.filter(col(vec).isNotNull)
      .select(col(id).cast("long").as("_kid"), col(vec).as("_kvec"))
    val gidOf = bestCentroid(col("_kvec"), coarse).getField("cid")
    val perGroup = (k + g - 1) / g
    // seed ids per group: a window over 16-byte (gid, id) pairs — the
    // only corpus-wide shuffle in the whole operator, and a narrow one
    val seedPairs = base.select(col("_kid"), gidOf.as("_gid"))
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("_gid").orderBy("_kid")))
      .filter(col("_rn") <= perGroup)
      .select(col("_kid"), col("_gid")).collect()
    require(seedPairs.nonEmpty, "kmeansTree: corpus has no non-null vectors")
    val gidOfSeed = seedPairs.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fetch the ≤ g·perGroup seed vectors map-side (ids broadcast)
    val seedVecs = base.filter(col("_kid").isInCollection(gidOfSeed.keys.toSeq))
      .collect()
    var fine: Seq[(Long, Long, Array[Float])] = seedVecs
      .map(r => (r.getLong(0), gidOfSeed(r.getLong(0)),
        r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq // ascending cids: first-max-wins = smallest-id ties
    for (_ <- 1 to iters) {
      val best = graft.functions.Expressions
        .best_centroid_routed(col("_kvec"), coarse, fine)
      val byCid = lloydSums(base, best, quantScale)
      fine = fine.map { case (cid, gid, old) =>
        (cid, gid, updatedCentroid(byCid, cid, old, quantScale))
      }
    }
    val best = graft.functions.Expressions
      .best_centroid_routed(col("_kvec"), coarse, fine)
    val assignments = base.select(col("_kid").as(id),
      best.getField("cid").as("cluster_id"),
      best.getField("sim").as("sim"))
    TreeKmeansModel(coarse, fine, assignments)
  }

  /** One representative per cluster — the diversity-sampling /
    * curation primitive (pick the most central member of each semantic
    * cluster): the member with the highest rounded similarity to its
    * centroid, ties to the smallest id. Input is a [[KmeansModel]]'s
    * `assignments` frame (or anything shaped (id, cluster_id, sim)).
    * Scale: one partial-aggregated struct-max — the exchange carries k
    * rows per partition, never members. */
  def medoids(assignments: DataFrame, id: String): DataFrame =
    assignments
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("sim"), (-col(id)).as("nid"))).as("_b"))
      .select(col("cluster_id"), (-col("_b.nid")).as("medoid_id"),
        col("_b.sim").as("sim"))

  /** SemDeDup: k-means the corpus, then inside each cluster drop the
    * LARGER id of every pair with rounded cosine >= `threshold` (greedy
    * single pass, the paper's policy — not transitive closure; use
    * [[DedupOps.connectedComponents]] when cluster-level transitivity is
    * wanted). Returns the survivors as (id, cluster_id), i.e. the
    * semantically-deduplicated corpus keyed to its cluster.
    *
    * Scale: the only corpus-wide exchanges are (a) one shuffle of
    * (cluster, id, vec) per side for the intra-cluster self-join and
    * (b) the id-keyed anti-join of the drop set — both linear. The pair
    * comparison is quadratic ONLY within a cluster: size k to the corpus
    * (SemDeDup uses k ≈ corpus/10^3..10^4) so clusters stay bounded; a
    * degenerate cluster shows up as a straggler task, the signal to
    * raise k — the same explicit-cap philosophy as
    * [[DedupOps.minhashDupPairs]]'s maxBucket.
    *
    * `routing = "flat"` trains with [[kmeans]] and assigns at k cosines
    * per row; `routing = "tree"` trains with [[kmeansTree]] (g =
    * `treeG`, or round(sqrt(k)) when 0) and assigns at ~2·sqrt(k)
    * cosines per row — the move to make once k scales with the corpus,
    * because the Abbas et al. k-policy that keeps the pair term linear
    * makes FLAT assignment the k×N bottleneck (ScaleProbe: 13.8-19×
    * growth at 30× under scaled-k for flat vs 4-5× for tree).
    * `routing = "auto"` (default) picks tree when k > [[AutoTreeK]] and
    * flat below it, so a caller who scales k with the corpus — the
    * paper's policy — lands on the scale-safe path without knowing the
    * variant exists. */
  def semdedup(corpus: DataFrame, vec: String, id: String, k: Int,
               iters: Int, threshold: Double,
               quantScale: Long = 1000000L,
               routing: String = "auto", treeG: Int = 0): DataFrame = {
    require(routing == "auto" || routing == "flat" || routing == "tree",
      s"semdedup: routing must be auto, flat or tree, got $routing")
    val resolved =
      if (routing == "auto") { if (k > AutoTreeK) "tree" else "flat" }
      else routing
    // cluster recomputed MAP-SIDE from the driver-held centroids rather
    // than joining model.assignments back by id: same deterministic
    // arg-max, k×dim (tree: ~2·sqrt(k)×dim) flops per row instead of an
    // id-keyed corpus shuffle
    val best =
      if (resolved == "tree") {
        val g = if (treeG > 0) treeG
          else math.max(1, math.round(math.sqrt(k.toDouble)).toInt)
        kmeansTree(corpus, vec, id, k, g, iters, quantScale)
          .assignColumn(col("_svec"))
      } else {
        val model = kmeans(corpus, vec, id, k, iters, quantScale)
        bestCentroid(col("_svec"), model.centroids)
      }
    val vecs = corpus.filter(col(vec).isNotNull)
      .select(col(id).cast("long").as("_sid"), col(vec).as("_svec"))
      .withColumn("cluster_id", best.getField("cid"))
    // Each side's norm is computed once per VECTOR before the
    // within-cluster self-join, so the quadratic pair stage pays one
    // dot per pair instead of cosine's dot + two norms (3x the flops on
    // the only superlinear term SemDeDup has). Bit-faithful to
    // cosine_sim by construction: Kernels.dot/norm reuse cosine's exact
    // accumulation order, sqrt(0) is exact so the zero-norm guard
    // reproduces cosine's 0.0 branch, and dot/(na*nb) is the very
    // expression cosine evaluates — the DuckDB oracle needed the same
    // rewrite to survive sf1, with the same bit-identity argument.
    val withN = vecs.withColumn("_snrm",
      graft.functions.Expressions.vec_norm(col("_svec")))
    val a = withN.select(col("_sid").as("_ida"), col("_svec").as("_va"),
      col("_snrm").as("_na"), col("cluster_id"))
    val b = withN.select(col("_sid").as("_idb"), col("_svec").as("_vb"),
      col("_snrm").as("_nb"), col("cluster_id"))
    val pairSim = when(col("_na") === 0.0 || col("_nb") === 0.0, lit(0.0))
      .otherwise(graft.functions.Expressions.dot_product(col("_va"), col("_vb"))
        / (col("_na") * col("_nb")))
    val drops = a.join(b, Seq("cluster_id"))
      .filter(col("_ida") < col("_idb") &&
        roundHalfUp(pairSim, 6) >= lit(threshold))
      .select(col("_idb").as("_sid")).distinct()
    vecs.join(drops, Seq("_sid"), "left_anti")
      .select(col("_sid").as(id), col("cluster_id"))
  }
}
