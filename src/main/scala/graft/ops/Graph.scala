package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation. Web-scale training
  * pipelines rank hosts/documents by link centrality (the CommonCrawl
  * lineage: harmonic/PageRank centrality as a crawl-frontier and
  * quality signal) — this is that operator, Spark-first.
  *
  * Determinism contract: the classic float PageRank is NOT
  * reproducible across engines or even across runs — double summation
  * order differs per partitioning, and a hash-compare oracle would
  * flap. This implementation runs in FIXED-POINT INTEGER arithmetic
  * (`scale` ≈ 1e9 means pr carries 9 fractional digits): every
  * per-edge contribution is an integer `div`, every reduce is an exact
  * long sum (order-independent), so the result is bit-identical on any
  * cluster size, any partitioning, any engine that replays the same
  * integer ops — which is exactly what the DuckDB oracle does
  * (RelQueries.pagerankOracleSql unrolls the iterations in SQL).
  * Mass is NOT exactly conserved (each `div` floors; dangling nodes
  * drop their mass — the standard simplification): the contract is
  * determinism and ranking fidelity, not stochastic-matrix exactness.
  *
  * Scale design (the 100 TB story):
  *  - One shuffle per iteration: the (dst, contribution) partial
  *    aggregate. The rank table is |V| rows of two longs — for
  *    billion-node graphs that's ~16 GB, far under shuffle capacity,
  *    and typically broadcast-able per iteration at the 10^7 scale.
  *  - Out-degrees are joined onto the edge list ONCE, outside the
  *    loop; iterations never recompute degree.
  *  - Lineage is truncated every `checkpointEvery` iterations and on
  *    the final one (reliable checkpoint when a checkpoint dir is set,
  *    eager localCheckpoint otherwise — the [[DedupOps.cut]] policy
  *    shared with connectedComponents), and superseded cuts release
  *    their storage immediately: an unbounded plan tree or
  *    O(iters × |V|) of pinned blocks is the classic iterative-Spark
  *    failure at scale. Between cuts the plan is deep but LINEAR (each
  *    rank frame feeds exactly one successor), so batching rounds into
  *    one job trades no recomputation for far fewer job launches.
  *  - Overflow headroom: a node's contribution sum is bounded by total
  *    mass |V| × scale, and the damping step multiplies by `damp`
  *    (≤ 100). Keep |V| × scale × 100 < 2^63 — for |V| up to ~10^9,
  *    scale = 10^7 still leaves 7 fractional digits. The default
  *    scale = 10^9 is sized for |V| ≤ ~10^8.
  */
object Graph {

  /** Fixed-point PageRank over a directed edge list. Edges are
    * deduplicated; nodes are the union of both endpoint columns; every
    * node starts at `pr = scale`. Per iteration:
    * `pr'(v) = base + (damp * Σ_{(u,v)∈E} (pr(u) div outdeg(u))) div 100`
    * with `base = ((100 - damp) * scale) div 100`, all in exact long
    * arithmetic. Returns (node: long, pr: long), pr in units of
    * 1/scale. Release the result's checkpoint storage with
    * [[releaseRanks]] when done. */
  def pagerank(edges: DataFrame, src: String = "src", dst: String = "dst",
               iters: Int = 5, scale: Long = 1000000000L,
               damp: Int = 85, checkpointEvery: Int = 8): DataFrame =
    core(edges, src, dst, iters, scale, damp, checkpointEvery, tol = None)._1

  /** Convergence-reporting / early-stopping variant: per round, the L1
    * rank movement Σ|pr_i − pr_{i−1}| is computed as an EXACT long sum
    * (units of 1/scale — order-independent, so the stop round is
    * deterministic under any partitioning, the [[pagerank]] contract
    * extended to the stopping rule). Runs at most `maxIters` rounds,
    * stopping after the first whose delta < `tolL1`; `tolL1 = 0` never
    * stops early and just reports. Stopping after round r returns
    * BIT-IDENTICAL ranks to `pagerank(iters = r)` (GraphSpec pins it),
    * so an oracle replay just unrolls to the reported round count.
    * Returns (ranks, deltas) — `deltas.length` = rounds actually run.
    * Cost: one extra |V|-row join-aggregate per round (both sides read
    * from cache; the delta is the round's second |V|-row job). */
  def pagerankWithDeltas(edges: DataFrame, src: String = "src",
                         dst: String = "dst", maxIters: Int = 20,
                         tolL1: Long = 0L, scale: Long = 1000000000L,
                         damp: Int = 85, checkpointEvery: Int = 8)
      : (DataFrame, Seq[Long]) = {
    require(tolL1 >= 0L, s"pagerank: tolL1 must be >= 0, got $tolL1")
    core(edges, src, dst, maxIters, scale, damp, checkpointEvery,
      tol = Some(tolL1))
  }

  private def core(edges: DataFrame, src: String, dst: String,
                   iters: Int, scale: Long, damp: Int,
                   checkpointEvery: Int, tol: Option[Long])
      : (DataFrame, Seq[Long]) = {
    require(iters >= 1, s"pagerank: iters must be >= 1, got $iters")
    require(scale > 0, s"pagerank: scale must be positive, got $scale")
    require(damp >= 0 && damp <= 100,
      s"pagerank: damp is a percentage, got $damp")
    require(checkpointEvery >= 1,
      s"pagerank: checkpointEvery must be >= 1, got $checkpointEvery")
    val base = (100L - damp) * scale / 100L
    // Loop invariants, cached once — and built in as FEW Spark jobs as
    // possible: an iterative operator's local-mode cost is dominated
    // by job launches, not rows, so every separate materialization
    // here is a fixed tax. Two jobs build everything: (1) ewd — the
    // deduplicated edge list with its source's out-degree joined on
    // (the degree aggregate deliberately joins rather than
    // collect_set-ing adjacency: a hub's full neighbor array in one
    // row is the classic web-graph skew bomb); (2) nodes — endpoint
    // union read back off the ewd CACHE, never re-deriving the input.
    val e = edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .distinct()
    // degree joined on once — the loop below never touches raw edges.
    // The cache is HASH-PARTITIONED ON src before persisting: every
    // round joins edges to ranks on src = node, and the rank side
    // always arrives hash-partitioned on node (round 0 is the
    // `distinct` node cache; later rounds end in the per-node
    // aggregate), so with a co-partitioned shuffled-hash join the edge
    // cache is NEVER re-exchanged — the round's only shuffle is the
    // |V|-row contribution aggregate. One hot partition per
    // super-hub source is the accepted cost (probe-side work is linear
    // in its edges); the alternative — re-exchanging |E| rows every
    // round once ranks outgrow the broadcast threshold — is strictly
    // worse at graph scale.
    val ewd = e.join(
        e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .repartition(col("src")).persist()
    val nodes = ewd.select(col("src").as("node"))
      .unionByName(ewd.select(col("dst").as("node"))).distinct().persist()
    // Per-round join strategy: the rank side (|V| rows of two longs)
    // is the SHUFFLE_HASH build side — its partition slice is tiny in
    // every regime (16 bytes x |V| / partitions), it needs no sort,
    // and unlike a broadcast it involves no per-round driver collect
    // and no single-executor memory ceiling at billion-node |V|.
    // round 0 is just the node cache with a literal column — no
    // materialization job of its own; iteration 1 reads it through
    // nodes' cache.
    def round(ranks: DataFrame): DataFrame = {
      // per-edge integer contribution, summed exactly per target
      val contrib = ewd.join(ranks.hint("shuffle_hash"),
          ewd("src") === ranks("node"))
        .select(col("dst").as("node"), expr("pr div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($damp * coalesce(c, 0L)) div 100")).as("pr"))
    }
    nodes.count() // one job materializes ewd (its parent) and nodes
    if (tol.isEmpty) {
      // Fixed-iteration path: rounds are chained LAZILY and the frame
      // is only materialized at lineage-cut boundaries (every
      // `checkpointEvery` rounds and on the last), so a 5-round run is
      // ONE job of five cascading two-stage rounds instead of five
      // driver-sequenced jobs — job-launch latency, not rows, is the
      // dominant per-round cost (measured 4.7 s -> 3.2 s for the
      // 5-round sf0.1 bench loop, bit-identical result). Between cuts
      // the lazy plan is LINEAR (each rank frame feeds exactly one
      // successor) and at most `checkpointEvery` rounds deep, so the
      // optimizer never sees an unbounded tree and executor loss
      // replays at most one batch.
      var ranks: DataFrame = nodes.withColumn("pr", lit(scale))
      var lastCut: Option[DataFrame] = None
      var done = 0
      while (done < iters) {
        val batch = math.min(checkpointEvery, iters - done)
        var r = ranks
        for (_ <- 1 to batch) r = round(r)
        val next = DedupOps.cut(r)
        // lineage is now truncated past the previous cut: free it
        lastCut.foreach(DedupOps.freeCheckpoint)
        lastCut = Some(next)
        ranks = next
        done += batch
      }
      // the result is checkpointed: its inputs' storage can go now
      ewd.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      return (ranks, Nil)
    }
    // Early-stopping path: each round IS materialized eagerly — the
    // driver must read the round's L1 movement to decide whether to
    // stop, so per-round job latency is inherent here, the price of
    // the convergence probe.
    var ranks = nodes.withColumn("pr", lit(scale))
    var ranksIsCut = false
    var lastCut: Option[DataFrame] = None
    val deltas = scala.collection.mutable.ArrayBuffer.empty[Long]
    var stopped = false
    var i = 1
    while (i <= iters && !stopped) {
      val next0 = round(ranks)
      // persist materializes blocks but leaves lineage in place, so the
      // plan tree grows ~linearly with rounds: truncate it with a real
      // checkpoint every `checkpointEvery` rounds (unbounded trees
      // stall the optimizer and, at cluster scale, cannot survive
      // executor loss once ancestors are unpersisted) — and ALWAYS on
      // the last round, so the returned frame stands alone and the
      // loop invariants' storage can be released below.
      val doCut = i % checkpointEvery == 0 || i == iters
      val next = if (doCut) DedupOps.cut(next0)
        else { val p = next0.persist(); p.count(); p }
      // L1 movement BEFORE the predecessor is unpersisted: both sides
      // read caches, and the exact long sum makes the stop decision
      // identical on any partition layout
      tol.foreach { t =>
        val d = next.join(
            ranks.select(col("node"), col("pr").as("_prev")), Seq("node"))
          .agg(coalesce(sum(abs(col("pr") - col("_prev"))), lit(0L)).as("d"))
          .head().getLong(0)
        deltas += d
        if (t > 0L && d < t) stopped = true
      }
      // Storage release discipline: a persist-only predecessor may be
      // unpersisted as soon as its successor is materialized (eviction
      // just recomputes through it, down to the last live checkpoint).
      // A CHECKPOINTED predecessor must stay alive until the NEXT cut
      // truncates lineage past it: persist-only successors still root
      // their recompute path in it, and freeing it early would turn an
      // executor-loss (or block-eviction) recompute into a read of
      // deleted checkpoint files — the exact failure the reliable-
      // checkpoint path exists to survive.
      if (!ranksIsCut && i > 1) ranks.unpersist(blocking = false) // round 0 IS nodes
      if (doCut) {
        lastCut.foreach(DedupOps.freeCheckpoint) // lineage now truncated past it
        lastCut = Some(next)
      }
      ranks = next
      ranksIsCut = doCut
      i += 1
    }
    // an early stop can land on a persist-only round: give the result
    // its own checkpoint so it stands alone (the same
    // survive-without-ancestors contract the final-round cut provides),
    // THEN release the superseded cut — freeing it before the new cut
    // materializes would strand the recompute path
    if (!ranksIsCut) {
      val c = DedupOps.cut(ranks)
      ranks.unpersist(blocking = false)
      lastCut.foreach(DedupOps.freeCheckpoint)
      lastCut = Some(c)
      ranks = c
      ranksIsCut = true
    }
    // the result is checkpointed: its inputs' storage can go now
    ewd.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    (ranks, deltas.toSeq)
  }

  /** Release the checkpoint storage behind a [[pagerank]] result once
    * every action on frames derived from it has run. */
  def releaseRanks(ranks: DataFrame): Unit = DedupOps.freeCheckpoint(ranks)
}
