package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.ops.SimilarityOps

/** Cosine expression correctness + ANN behavior: brute force is exact;
  * LSH achieves full recall on planted near-identical vectors. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("CosineSim matches a scalar reference implementation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(4.0f, 5.0f, 6.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(Expressions.cosine_sim($"a", $"b")).as[Double].head()
    val expected = (4.0 + 10.0 + 18.0) /
      (math.sqrt(1 + 4 + 9) * math.sqrt(16 + 25 + 36))
    assert(math.abs(got - expected) < 1e-12)
    // orthogonal and identical
    val o = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(Expressions.cosine_sim($"a", $"b")).as[Double].head()
    assert(o == 0.0)
    val i = Seq((a, a)).toDF("a", "b")
      .select(Expressions.cosine_sim($"a", $"b")).as[Double].head()
    assert(math.abs(i - 1.0) < 1e-12)
    // zero vector -> defined 0.0, not NaN
    val z = Seq((Array(0.0f, 0.0f), a.take(2))).toDF("a", "b")
      .select(Expressions.cosine_sim($"a", $"b")).as[Double].head()
    assert(z == 0.0)
  }

  test("dot/(norm*norm) with zero-norm guard is BIT-identical to CosineSim") {
    // the contract SemDeDup's pair stage rides on: precomputing each
    // vector's norm once and reconstructing cosine as dot/(na*nb) must
    // reproduce CosineSim's doubles exactly (same accumulation order in
    // the kernels), including the zero-vector 0.0 branch — any drift
    // here would silently flip threshold comparisons after rounding
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(40)(Array.fill(32)(
      (rnd.nextGaussian() * (1 + rnd.nextInt(3))).toFloat)) :+
      Array.fill(32)(0.0f) // zero vector exercises the guard branch
    val pairs = for (x <- vecs; y <- vecs) yield (x, y)
    val df = pairs.toDF("a", "b").select(
      Expressions.cosine_sim($"a", $"b").as("ref"),
      when(Expressions.vec_norm($"a") === 0.0 ||
          Expressions.vec_norm($"b") === 0.0, lit(0.0))
        .otherwise(Expressions.dot_product($"a", $"b") /
          (Expressions.vec_norm($"a") * Expressions.vec_norm($"b")))
        .as("pre"))
    val rows = df.as[(Double, Double)].collect()
    assert(rows.length == 41 * 41)
    rows.foreach { case (ref, pre) =>
      assert(java.lang.Double.doubleToRawLongBits(ref) ==
        java.lang.Double.doubleToRawLongBits(pre),
        s"bit drift: cosine=$ref reconstructed=$pre")
    }
    // strictness parity: a null element fails DotProduct the same way
    // CosineSim's floatsStrict does
    val bad = Seq((Array(1.0f, 2.0f), Seq[java.lang.Float](1.0f, null)))
      .toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(Expressions.dot_product($"a", $"b")).collect()
    }
    assert(e.getMessage != null)
  }

  test("top-k aggregate == window rank exactly; no Window in the plan") {
    val rnd = new scala.util.Random(5)
    val corpus = Seq.tabulate(500)(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 4)
    val got = SimilarityOps.bruteForceTopK(corpus, queries,
      "embedding", "vec_id", 7)
    // the window-rank formulation the aggregate replaced, inlined
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Rounding.roundHalfUp
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val c = corpus.select($"vec_id".as("neighbor_id"), $"embedding".as("nvec"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"sim".desc, $"neighbor_id")
    val viaWindow = c.crossJoin(broadcast(q))
      .withColumn("sim", roundHalfUp(
        Expressions.cosine_sim($"qvec", $"nvec"), 6))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 7)
      .select("query_id", "neighbor_id", "sim", "rk")
    val a = got.as[(Long, Long, Double, Int)].collect().toSet
    val b = viaWindow.as[(Long, Long, Double, Int)].collect().toSet
    assert(a == b, "aggregate diverged from window rank")
    // plan shape: partial+final aggregate, no Window materialization
    val plan = got.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"no object aggregate:\n$plan")
  }

  test("top-k buffer: duplicate ids keep the best sim; NaN totally ordered") {
    import graft.functions.TopKBuffer
    val b = new TopKBuffer(3)
    b.add(0.2, 5); b.add(0.99, 5) // dedup must keep max, not first-seen
    assert(b.n == 1 && b.sims(0) == 0.99)
    // merge-order independence of the dedup
    val x = new TopKBuffer(2); x.add(0.2, 5)
    val y = new TopKBuffer(2); y.add(0.99, 5)
    assert(x.merge(y).sims(0) == 0.99)
    val x2 = new TopKBuffer(2); x2.add(0.99, 5)
    val y2 = new TopKBuffer(2); y2.add(0.2, 5)
    assert(x2.merge(y2).sims(0) == 0.99)
    // NaN ranks greatest (Spark's total double order); worst evicted
    val c = new TopKBuffer(3)
    c.add(Double.NaN, 1); c.add(0.5, 2); c.add(0.7, 3); c.add(0.6, 4)
    assert(c.ranked.map(j => c.ids(j)).toSeq == Seq(1L, 3L, 4L))
  }

  private def planted = {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]) = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val bases = Seq.fill(5)(vec())
    // ids 0-4: queries; 100-104: near-identical partners; 200+: noise
    (bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      bases.zipWithIndex.map { case (v, i) => (100L + i, jitter(v)) } ++
      (0 until 50).map(i => (200L + i, vec()))).toDF("vec_id", "embedding")
  }

  test("brute-force top-k: self first, planted partner second") {
    val df = planted
    val out = SimilarityOps.bruteForceTopK(df, df.filter($"vec_id" < 5),
      "embedding", "vec_id", 3).collect()
    for (q <- 0L until 5L) {
      val rows = out.filter(_.getLong(0) == q).sortBy(_.getInt(3))
      assert(rows(0).getLong(1) == q)          // self at rank 1
      assert(rows(1).getLong(1) == 100L + q)   // planted partner at rank 2
    }
  }

  test("IVF ANN: planted partners recalled; index reusable across queries") {
    val df = planted
    val idx = SimilarityOps.buildIvfIndex(df, "embedding", "vec_id", nlist = 8)
    assert(idx.centroids.count() == 8)
    // every corpus vector is assigned to exactly one cluster
    assert(idx.assigned.count() == df.count())
    val out = SimilarityOps.ivfSearch(idx, df.filter($"vec_id" < 5),
      "embedding", "vec_id", k = 3, nprobe = 4).collect()
    for (q <- 0L until 5L) {
      val rows = out.filter(_.getLong(0) == q).sortBy(_.getInt(3))
      assert(rows.nonEmpty && rows(0).getLong(1) == q, s"query $q lost itself")
      assert(rows.exists(_.getLong(1) == 100L + q),
        s"query $q lost its planted near-duplicate")
    }
    // the same index serves a second query set without retraining
    val out2 = SimilarityOps.ivfSearch(idx,
      df.filter($"vec_id" >= 100 && $"vec_id" < 105),
      "embedding", "vec_id", k = 1, nprobe = 2)
    assert(out2.count() == 5)
  }

  test("IVF index is deterministic across builds") {
    val df = planted
    val a = SimilarityOps.buildIvfIndex(df, "embedding", "vec_id", nlist = 8)
      .assigned.select("neighbor_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = SimilarityOps.buildIvfIndex(df.repartition(7), "embedding", "vec_id",
      nlist = 8)
      .assigned.select("neighbor_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("LSH ANN: full recall of near-identical partners; subset of brute scores") {
    val df = planted
    val out = SimilarityOps.lshTopK(df, df.filter($"vec_id" < 5),
      "embedding", "vec_id", 3, bits = 8).collect()
    for (q <- 0L until 5L) {
      val rows = out.filter(_.getLong(0) == q).sortBy(_.getInt(3))
      assert(rows.nonEmpty && rows(0).getLong(1) == q)
      // jittered partner lands in the same (or 1-bit-probed) bucket
      assert(rows.exists(_.getLong(1) == 100L + q),
        s"query $q lost its planted near-duplicate")
    }
  }

  test("hyperplane buckets use the full keyspace, not parity classes") {
    // regression: a rademacher sign taken from the LOW bit of an
    // FNV-style fold depends only on the parity of (plane, dim) — odd
    // multiplies preserve the low bit — which collapses EVERY corpus
    // into <= 3 buckets regardless of the requested bits
    // scattered fixture (splitmix-mixed), NOT an affine curve: points on
    // a line cross few hyperplanes and would legitimately share buckets
    def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val vecs = (0 until 256).map { i =>
      Array.tabulate(16)(d => (mix(i * 16L + d) % 1000L).toFloat)
    }
    val distinct = vecs
      .map(v => graft.functions.Expressions.HyperplaneLsh.bucket(v, 12))
      .distinct.length
    assert(distinct > 64, s"bucket keyspace collapsed to $distinct values")
  }

  test("centroid assignment: best cosine wins, ties to the smallest centroid id") {
    val df = Seq(
      (0L, Array(1f, 0f)),   // centroid 0
      (1L, Array(0f, 1f)),   // centroid 1
      (2L, Array(1f, 0f)),   // centroid 2: duplicate of centroid 0
      (10L, Array(2f, 0f)),  // ties centroids 0 and 2 -> 0 wins
      (11L, Array(0f, 3f)),  // -> centroid 1
      (12L, Array(1f, 1f))   // equidistant from 0/1/2 -> 0 wins
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.assignToCentroids(
      df.filter($"vec_id" >= 10), df.filter($"vec_id" < 3),
      "embedding", "vec_id", "vec_id")
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("LSH ANN: duplicate query ids are deduped, never cross-joined") {
    val df = planted
    val queries = df.filter($"vec_id" < 3)
    val doubled = queries.union(queries) // same ids delivered twice
    val once = SimilarityOps.lshTopK(df, queries, "embedding", "vec_id",
      3, bits = 8).collect()
    val deduped = SimilarityOps.lshTopK(df, doubled, "embedding", "vec_id",
      3, bits = 8).collect()
    // identical result set: one probe set + one vector per id, and no
    // probe×vector blowup from the id collision
    assert(deduped.length == once.length)
    assert(deduped.map(_.toString).sorted.sameElements(once.map(_.toString).sorted))
  }

  test("PQ ANN: partners recalled; reported sims are EXACT brute-force sims") {
    val df = planted
    val out = SimilarityOps.pqTopK(df, df.filter($"vec_id" < 5),
      "embedding", "vec_id", k = 3, m = 4, ksub = 8, iters = 2, cands = 16)
      .collect()
    val brute = SimilarityOps.bruteForceTopK(df, df.filter($"vec_id" < 5),
      "embedding", "vec_id", 60).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (q <- 0L until 5L) {
      val rows = out.filter(_.getLong(0) == q).sortBy(_.getInt(3))
      assert(rows.length == 3)
      // rerank is exact: self (sim 1.0 after rounding) must win rank 1,
      // the near-identical partner must survive ADC candidacy
      assert(rows(0).getLong(1) == q, s"query $q lost itself")
      assert(rows.exists(_.getLong(1) == 100L + q),
        s"query $q lost its planted near-duplicate")
      // every reported sim is the true cosine, not the ADC estimate
      rows.foreach { r =>
        assert(r.getDouble(2) == brute((q, r.getLong(1))),
          s"PQ sim for (${q},${r.getLong(1)}) is not the exact cosine")
      }
    }
  }

  test("PQ ANN is deterministic across partitionings") {
    val df = planted
    def run(c: org.apache.spark.sql.DataFrame) =
      SimilarityOps.pqTopK(c, c.filter($"vec_id" < 5), "embedding", "vec_id",
        k = 3, m = 4, ksub = 8, iters = 2, cands = 16)
        .collect().map(_.toString).sorted.toSeq
    assert(run(df) == run(df.repartition(7)))
  }

  test("PQ ANN rejects a dimension not divisible by m") {
    val df = planted // 32-dim
    intercept[IllegalArgumentException] {
      SimilarityOps.pqTopK(df, df.filter($"vec_id" < 2), "embedding",
        "vec_id", k = 1, m = 5)
    }
  }

  test("IVFPQ: partners recalled through routed ADC; index reusable") {
    val df = planted
    val idx = SimilarityOps.buildPqIndex(df, "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8)
    val out = SimilarityOps.pqSearch(idx, df.filter($"vec_id" < 5),
      "embedding", "vec_id", k = 3, cands = 16, nprobe = 4).collect()
    for (q <- 0L until 5L) {
      val rows = out.filter(_.getLong(0) == q).sortBy(_.getInt(3))
      assert(rows.nonEmpty && rows(0).getLong(1) == q, s"query $q lost itself")
      assert(rows.exists(_.getLong(1) == 100L + q),
        s"query $q lost its planted near-duplicate")
    }
    // the same index serves a second query set without retraining
    val out2 = SimilarityOps.pqSearch(idx,
      df.filter($"vec_id" >= 100 && $"vec_id" < 105),
      "embedding", "vec_id", k = 1, cands = 16, nprobe = 2)
    assert(out2.count() == 5)
  }

  test("IVFPQ probing every list equals flat PQ exactly") {
    // nprobe = nlist makes routing a no-op: the ADC scored set is the
    // whole corpus on both paths, so candidates, rerank, and ranks
    // must be IDENTICAL — pins that routing only prunes, never alters
    val df = planted
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted.toSeq
    val full = norm(SimilarityOps.ivfpqTopK(df, df.filter($"vec_id" < 5),
      "embedding", "vec_id", k = 3, nlist = 8, nprobe = 8,
      m = 4, ksub = 8, iters = 2, cands = 16).collect())
    val flat = norm(SimilarityOps.pqTopK(df, df.filter($"vec_id" < 5),
      "embedding", "vec_id", k = 3, m = 4, ksub = 8, iters = 2,
      cands = 16).collect())
    assert(full == flat)
  }

  test("IVFPQ is deterministic across partitionings") {
    val df = planted
    def run(c: org.apache.spark.sql.DataFrame) =
      SimilarityOps.ivfpqTopK(c, c.filter($"vec_id" < 5), "embedding",
        "vec_id", k = 3, nlist = 8, nprobe = 4, m = 4, ksub = 8,
        iters = 2, cands = 16)
        .collect().map(_.toString).sorted.toSeq
    assert(run(df) == run(df.repartition(7)))
  }

  test("sizedPq pins the measured §6 recall configurations") {
    import graft.ops.SimilarityOps.sizedPq
    // the ScaleProbe reference corpus (2000 vectors) and its 30× twin:
    // exactly the configurations the recall table measured at 1.000
    assert(sizedPq(2000L) == ((8, 16)))
    assert(sizedPq(30L * 2000L) == ((40, 80))) // floor(sqrt(30)) = 5
    // sub-reference corpora never shrink below the base config
    assert(sizedPq(100L) == ((8, 16)))
    assert(sizedPq(0L) == ((8, 16)))
    // growth is ~sqrt(corpus): 100x corpus -> 10x codewords/lists
    assert(sizedPq(100L * 2000L) == ((80, 160)))
    // the driver-side codebook cap binds ksub (nlist keeps scaling
    // at the capped factor, never past it)
    val (k, n) = sizedPq(4000000L * 2000L)
    assert(k == 4096 && n == 16 * (4096 / 8),
      s"cap mis-applied: ($k, $n)")
  }
}
