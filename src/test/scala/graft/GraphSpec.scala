package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank: hand-computed fixed points and
  * two-iteration traces, plus the determinism properties the oracle
  * relies on (partitioning-independence, exact integer arithmetic). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // default scale

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val r = Graph.pagerank(df, iters = iters)
    val out = r.as[(Long, Long)].collect().toMap
    Graph.releaseRanks(r)
    out
  }

  test("a cycle is a fixed point at pr = scale") {
    // 3-cycle: outdeg 1 everywhere, so pr' = 0.15*S + 0.85*S = S exactly
    // (the damping split 150000000 + 850000000 has no floor loss)
    val r = ranksOf(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 7)
    assert(r == Map(1L -> S, 2L -> S, 3L -> S))
  }

  test("two-iteration star trace matches hand arithmetic") {
    // leaves 2..4 each point at hub 1; hub points at leaf 2.
    // outdeg: every node 1. base = 150000000.
    // iter1: hub <- 3 leaves: base + (85 * 3S) div 100 = 150e6 + 2550e6
    //        leaf2 <- hub:    base + (85 * S)  div 100 = 1e9
    //        leaf3, leaf4 <- nothing: base
    // iter2: hub <- leaves (1e9 + 150e6 + 150e6):
    //          base + (85 * 1300e6) div 100 = 150e6 + 1105e6
    //        leaf2 <- hub(2700e6): base + (85 * 2700e6) div 100
    val r = ranksOf(Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)), iters = 2)
    assert(r(1L) == 150000000L + 85L * 1300000000L / 100L)
    assert(r(2L) == 150000000L + 85L * 2700000000L / 100L)
    assert(r(3L) == 150000000L)
    assert(r(4L) == 150000000L)
  }

  test("duplicate and unordered edges do not change the result") {
    val base = ranksOf(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)))
    val dup = ranksOf(Seq((3L, 1L), (1L, 3L), (1L, 2L), (1L, 2L),
      (2L, 3L), (3L, 1L)))
    assert(dup == base)
  }

  test("result is identical across partitioning choices") {
    // the determinism contract behind the hash-compare oracle: integer
    // sums are order-independent, so repartitioning cannot move a bit
    val edges = (1L to 200L).map(i => (i, (i * 7) % 200 + 1))
    val one = Graph.pagerank(edges.toDF("src", "dst").repartition(1))
    val many = Graph.pagerank(edges.toDF("src", "dst").repartition(13))
    val a = one.as[(Long, Long)].collect().toMap
    val b = many.as[(Long, Long)].collect().toMap
    Graph.releaseRanks(one); Graph.releaseRanks(many)
    assert(a == b)
    assert(a.size == 200)
  }

  test("dangling nodes keep the base rank and drop their mass") {
    // 1 -> 2 only: node 2 has no out-edges (dangling, standard
    // simplification: its mass leaves the system, it still receives)
    val r = ranksOf(Seq((1L, 2L)), iters = 2)
    // iter1: pr(1) = base; pr(2) = base + 85*S div 100
    // iter2: pr(2) = base + 85*base div 100
    assert(r(1L) == 150000000L)
    assert(r(2L) == 150000000L + 85L * 150000000L / 100L)
  }

  test("mid-run checkpoint cadence does not change the result") {
    // exercises batch-boundary invariance in the lazily-batched
    // fixed-iteration path: iters=5 runs as batches of 2+2+1 here vs
    // one batch of 5 at the default cadence, and a superseded batch
    // checkpoint must survive until the next cut truncates lineage
    // past it; the ranks must be identical either way
    val edges = (1L to 150L).map(i => (i, (i * 11) % 150 + 1))
    val a = Graph.pagerank(edges.toDF("src", "dst"), iters = 5)
    val b = Graph.pagerank(edges.toDF("src", "dst"), iters = 5,
      checkpointEvery = 2)
    val ra = a.as[(Long, Long)].collect().toMap
    val rb = b.as[(Long, Long)].collect().toMap
    Graph.releaseRanks(a); Graph.releaseRanks(b)
    assert(ra == rb)
  }

  test("parameter validation rejects nonsense") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pagerank(e, iters = 0))
    intercept[IllegalArgumentException](Graph.pagerank(e, scale = 0L))
    intercept[IllegalArgumentException](Graph.pagerank(e, damp = 101))
    intercept[IllegalArgumentException](Graph.pagerankWithDeltas(e, tolL1 = -1L))
  }

  private val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
    (1L, 3L), (2L, 4L))

  test("deltas are reported per round and a cycle converges to delta 0") {
    val (r, ds) = Graph.pagerankWithDeltas(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"),
      maxIters = 4, tolL1 = 0L)
    r.count(); Graph.releaseRanks(r)
    assert(ds.length == 4, "tolL1 = 0 must never stop early")
    // the 3-cycle is a fixed point from round 1: every later delta is 0
    assert(ds.tail.forall(_ == 0L), s"expected zero movement, got $ds")
  }

  test("early stop after round r is bit-identical to pagerank(iters = r)") {
    val e = chain.toDF("src", "dst")
    // deltas shrink ~damp^round from ~|V|·scale: 1e8 trips well inside
    // 20 rounds on this 4-node graph, 2e6 would not
    val tol = 100000000L
    val (r, ds) = Graph.pagerankWithDeltas(e, maxIters = 20, tolL1 = tol)
    val stopped = r.as[(Long, Long)].collect().toMap
    Graph.releaseRanks(r)
    assert(ds.length < 20, "tolerance should trip before maxIters on a small graph")
    assert(ds.last < tol && ds.init.forall(_ >= tol),
      s"stop must fire on exactly the first sub-tolerance round: $ds")
    val fixed = Graph.pagerank(e, iters = ds.length)
    val ref = fixed.as[(Long, Long)].collect().toMap
    Graph.releaseRanks(fixed)
    assert(stopped == ref)
  }

  test("early stop round and deltas are identical across partitionings") {
    val e = chain.toDF("src", "dst")
    val (r1, d1) = Graph.pagerankWithDeltas(e.repartition(1), tolL1 = 100000000L)
    val (r2, d2) = Graph.pagerankWithDeltas(e.repartition(13), tolL1 = 100000000L)
    val m1 = r1.as[(Long, Long)].collect().toMap
    val m2 = r2.as[(Long, Long)].collect().toMap
    Graph.releaseRanks(r1); Graph.releaseRanks(r2)
    assert(d1 == d2, "exact-integer L1 deltas must not depend on layout")
    assert(m1 == m2)
  }
}
