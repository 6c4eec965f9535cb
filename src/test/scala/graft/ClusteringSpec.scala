package graft

import org.apache.spark.sql.functions._
import graft.ops.{Clustering, SimilarityOps}

/** Distributed deterministic k-means + SemDeDup: planted-cluster
  * recovery, partitioning invariance (the determinism contract), empty-
  * cluster survival, and the dedup drop policy. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight planted clusters around orthogonal axes plus a little
    * deterministic per-id jitter — far enough apart that any sane
    * Lloyd's run separates them. */
  private def planted() = {
    val rows = (0L until 40L).map { i =>
      val axis = (i % 2).toInt // even ids cluster 0, odd ids cluster 1
      val jitter = 0.01f * ((i % 7).toInt - 3)
      val v = Array.fill(4)(0.0f)
      v(axis) = 1.0f
      v(2 + axis) = jitter
      (i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeans recovers planted clusters and converges") {
    val m = Clustering.kmeans(planted(), "embedding", "vec_id", k = 2, iters = 4)
    val byCluster = m.assignments.select("vec_id", "cluster_id")
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(byCluster.size == 2)
    // every cluster is parity-pure: the planted structure was found
    byCluster.values.foreach { ids =>
      assert(ids.map(_ % 2).size == 1, s"mixed-parity cluster: $ids")
    }
    assert(byCluster.values.map(_.size).sum == 40)
  }

  test("kmeans is invariant to input partitioning (determinism contract)") {
    val base = planted()
    def runAt(parts: Int) = {
      val m = Clustering.kmeans(base.repartition(parts), "embedding",
        "vec_id", k = 3, iters = 3)
      (m.centroids.map { case (cid, v) => (cid, v.toSeq) },
        m.assignments.orderBy("vec_id")
          .as[(Long, Long, Double)].collect().toSeq)
    }
    val (c1, a1) = runAt(1)
    val (c13, a13) = runAt(13)
    assert(c1 == c13, "centroids must be bit-identical across partitionings")
    assert(a1 == a13, "assignments must be bit-identical across partitionings")
  }

  test("kmeans survives an empty cluster by keeping its previous centroid") {
    // seed 0 and seed 1 are IDENTICAL vectors: every point scores them
    // equally and ties go to the smaller cid, so cluster 1 starves
    val dup = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.8f, 0.2f))
    ).toDF("vec_id", "embedding")
    val m = Clustering.kmeans(dup, "embedding", "vec_id", k = 2, iters = 3)
    // the starved centroid survives untouched (= its seed vector) —
    // no crash, no NaN centroid
    assert(m.centroids.exists { case (cid, v) =>
      cid == 1L && v.toSeq == Seq(1.0f, 0.0f) })
    // Lloyd's then puts the preserved centroid back to work: once
    // cluster 0's mean drifts toward (0.925, 0.075), the exact (1,0)
    // vectors re-assign to the untouched centroid 1
    val byId = m.assignments.select("vec_id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    assert(byId(0L) == 1L && byId(1L) == 1L)
    assert(byId(2L) == 0L && byId(3L) == 0L)
  }

  test("kmeans rejects a corpus smaller than k and null vectors are dropped") {
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeans(tiny, "embedding", "vec_id", k = 2, iters = 1)
    }
    assert(e.getMessage.contains("need k=2"))
    // with k=1 the null row is silently dropped, not scored
    val m = Clustering.kmeans(tiny, "embedding", "vec_id", k = 1, iters = 1)
    assert(m.assignments.count() == 1)
  }

  test("BestCentroid kernel matches assignToCentroids on every vector (shared total order)") {
    // two independent implementations claim (rounded sim DESC, cid ASC):
    // the map-side kernel (Clustering's hot path) and the struct-max
    // aggregate (SimilarityOps.assignToCentroids). Pin them to each
    // other on data with planted exact ties (duplicate centroid vectors)
    // and near-ties (jittered vectors).
    val corpus = planted().unionByName(
      Seq((500L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val cents = corpus.filter(col("vec_id") < 6)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val viaKernel = {
      val b = graft.functions.Expressions.best_centroid(col("embedding"), cents)
      corpus.select(col("vec_id"), b.getField("cid").as("cluster_id"),
        b.getField("sim").as("sim"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    }
    val viaAgg = {
      val cdf = cents.toDF("vec_id", "embedding")
      SimilarityOps.assignToCentroids(corpus, cdf,
        "embedding", "vec_id", "vec_id")
        .select(col("vec_id"), col("cluster_id"), col("sim"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    }
    assert(viaKernel == viaAgg)
  }

  /** Id-SORTED skewed corpus: the first k ids all live in one tight
    * blob (crawl order correlating with content — the minid-seeding
    * failure mode), with three more well-separated blobs behind them. */
  private def idSorted() = {
    val rows = (0L until 80L).map { i =>
      val blob = if (i < 20) 0 else 1 + ((i - 20) % 3).toInt // ids 0..19 all blob 0
      val v = Array.fill(8)(0.0f)
      v(blob * 2) = 1.0f
      v(blob * 2 + 1) = 0.02f * ((i % 5).toInt - 2)
      (i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeanspp seeding beats minid on an id-sorted skewed corpus") {
    def meanSim(init: String): Double = {
      val m = Clustering.kmeans(idSorted(), "embedding", "vec_id",
        k = 4, iters = 2, init = init)
      m.assignments.agg(avg("sim")).head().getDouble(0)
    }
    val minid = meanSim("minid")
    val pp = meanSim("kmeanspp")
    // minid puts all 4 seeds inside blob 0 (ids 0..3); Lloyd's from a
    // degenerate start cannot split the other three blobs apart, so
    // mean within-cluster similarity stays low. kmeans++ spreads seeds
    // across blobs and lands near 1.0.
    assert(pp > minid + 0.05,
      s"kmeanspp ($pp) should clearly beat minid ($minid) here")
    assert(pp > 0.95, s"kmeanspp should recover the blob structure, got $pp")
  }

  test("kmeanspp seeding is invariant to input partitioning") {
    def runAt(parts: Int) = {
      val m = Clustering.kmeans(idSorted().repartition(parts), "embedding",
        "vec_id", k = 4, iters = 2, init = "kmeanspp")
      (m.centroids.map { case (cid, v) => (cid, v.toSeq) },
        m.assignments.orderBy("vec_id")
          .as[(Long, Long, Double)].collect().toSeq)
    }
    assert(runAt(1) == runAt(7))
  }

  test("kmeans rejects an unknown init name") {
    intercept[IllegalArgumentException](
      Clustering.kmeans(planted(), "embedding", "vec_id", k = 2, iters = 1,
        init = "random"))
  }

  test("medoids picks the most-central member per cluster, ties to smallest id") {
    val m = Clustering.kmeans(planted(), "embedding", "vec_id", k = 2, iters = 4)
    val med = Clustering.medoids(m.assignments, "vec_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(med.length == 2)
    // each medoid must be a member of its own cluster with the cluster's max sim
    val asg = m.assignments.as[(Long, Long, Double)].collect()
      .groupBy(_._2).view.mapValues(_.map(r => (r._1, r._3))).toMap
    med.foreach { case (cid, mid, sim) =>
      val members = asg(cid)
      assert(members.exists(_._1 == mid))
      assert(sim == members.map(_._2).max)
      // ties broken to the smallest id
      assert(mid == members.filter(_._2 == sim).map(_._1).min)
    }
  }

  /** Many well-separated planted clusters (one per axis of a dim-wide
    * space) with per-id jitter — enough structure that centroid COUNT
    * visibly moves assignment quality. */
  private def plantedMany(nClusters: Int, perCluster: Int) = {
    val rows = (0 until nClusters * perCluster).map { i =>
      val c = i % nClusters
      val v = Array.fill(nClusters)(0.0f)
      v(c) = 1.0f
      v((c + 1) % nClusters) = 0.02f * ((i % 5) - 2)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeansTree with g=1 degenerates to flat kmeans exactly") {
    // one coarse group => every row competes against ALL fine
    // centroids, which are the k smallest ids — the flat minid
    // configuration; the routed kernel must then be bit-identical
    val base = plantedMany(8, 10)
    val flat = Clustering.kmeans(base, "embedding", "vec_id",
      k = 8, iters = 2).assignments.orderBy("vec_id")
      .as[(Long, Long, Double)].collect().toSeq
    val tree = Clustering.kmeansTree(base, "embedding", "vec_id",
      k = 8, g = 1, iters = 2).assignments.orderBy("vec_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(flat == tree)
  }

  test("kmeansTree is invariant to input partitioning (determinism contract)") {
    val base = plantedMany(9, 8)
    def runAt(parts: Int) = {
      val m = Clustering.kmeansTree(base.repartition(parts), "embedding",
        "vec_id", k = 9, g = 3, iters = 2)
      (m.coarse.map { case (cid, v) => (cid, v.toSeq) },
        m.fine.map { case (cid, gid, v) => (cid, gid, v.toSeq) },
        m.assignments.orderBy("vec_id")
          .as[(Long, Long, Double)].collect().toSeq)
    }
    assert(runAt(1) == runAt(13),
      "tree model + assignments must be bit-identical across partitionings")
  }

  test("kmeansTree quality pin: tree at ~2*sqrt(k) cosines/row beats flat at the same budget") {
    // the operator's reason to exist: for the SAME per-row cosine
    // budget, routing through a coarse stage affords k fine centroids
    // where flat assignment affords only ~2*sqrt(k) — on a corpus with
    // k real clusters the extra centroids must show up as tighter
    // assignments (higher mean within-cluster sim)
    val base = plantedMany(16, 12)
    val tree = Clustering.kmeansTree(base, "embedding", "vec_id",
      k = 16, g = 4, iters = 2) // 4 + 4 = 8 cosines per row
    val flat = Clustering.kmeans(base, "embedding", "vec_id",
      k = 8, iters = 2) // same 8 cosines per row
    def meanSim(a: org.apache.spark.sql.DataFrame) =
      a.agg(avg("sim")).as[Double].head()
    val (tSim, fSim) = (meanSim(tree.assignments), meanSim(flat.assignments))
    assert(tSim > fSim,
      s"tree mean within-cluster sim $tSim must beat equal-budget flat $fSim")
    // sanity floor, not full separation: minid seeding on a mutually-
    // orthogonal corpus seeds fine centroids from whatever low ids the
    // coarse routing grouped, so some planted clusters share a fine
    // centroid (cosine ~0 members) — the pin is the BUDGET comparison
    // above; this floor just catches a degenerate collapse
    assert(tSim > 0.5, s"tree assignment quality collapsed: $tSim")
  }

  test("semdedup with tree routing drops the planted near-dups, keeps originals") {
    val corpus = plantedMany(9, 8).unionByName(
      Seq((1000L, {
        val v = Array.fill(9)(0.0f); v(0) = 1.0f; v(1) = 0.0001f; v
      })).toDF("vec_id", "embedding"))
    val out = Clustering.semdedup(corpus, "embedding", "vec_id",
      k = 9, iters = 2, threshold = 0.9999, routing = "tree", treeG = 3)
    val survivors = out.select("vec_id").as[Long].collect().toSet
    assert(!survivors.contains(1000L),
      "the high-id near-dup of vec 0 must co-route with it and be dropped")
    assert(survivors.contains(0L), "the original must survive")
  }

  test("semdedup auto routing: flat at or below AutoTreeK, tree above it") {
    // the default must route a scaled-k caller (the Abbas et al.
    // k ≈ corpus/10^3..10^4 policy) onto the tree path without them
    // knowing the variant exists, while small-k callers keep the
    // cheaper flat path — pinned by bit-equality against the explicit
    // routings on either side of the threshold.
    val corpus = plantedMany(8, 10) // 80 vectors, dim 8
    def run(k: Int, routing: String) =
      Clustering.semdedup(corpus, "embedding", "vec_id", k = k,
          iters = 1, threshold = 0.9999, routing = routing)
        .as[(Long, Long)].collect().toSet
    val kSmall = Clustering.AutoTreeK
    assert(run(kSmall, "auto") == run(kSmall, "flat"),
      "auto at k = AutoTreeK must be the flat path")
    val kBig = Clustering.AutoTreeK + 1
    assert(run(kBig, "auto") == run(kBig, "tree"),
      "auto above AutoTreeK must be the tree path")
    // discrimination guard: the two explicit routings must actually
    // differ here (tree's fine cids are per-group minid seeds, flat's
    // are the k global minids), or the equality above proves nothing
    assert(run(kBig, "flat") != run(kBig, "tree"),
      "fixture does not separate the routings — pick a corpus where it does")
  }

  test("semdedup drops the larger id of a near-identical pair, keeps the rest") {
    val corpus = planted().unionByName(
      // near-identical copies of ids 0 and 1 at high ids
      Seq((1000L, Array(1.0f, 0.0f, 0.0001f, 0.0f)),
        (1001L, Array(0.0f, 1.0f, 0.0f, 0.0001f)))
        .toDF("vec_id", "embedding"))
    val out = Clustering.semdedup(corpus, "embedding", "vec_id",
      k = 2, iters = 3, threshold = 0.9999)
    val survivors = out.select("vec_id").as[Long].collect().toSet
    assert(!survivors.contains(1000L) && !survivors.contains(1001L),
      "planted near-dup copies must be dropped")
    assert(survivors.contains(0L) && survivors.contains(1L),
      "originals (smaller ids) must survive")
  }
}
