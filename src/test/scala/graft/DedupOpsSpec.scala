package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Approximate-dedup correctness against exact ground truth: MinHash
  * estimates track exact Jaccard; SimHash separates near-dups from
  * unrelated docs; LSH banding finds planted duplicates. */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 8
  private def corpus = Seq(
    (0L, base),
    (1L, base + "extra tail tokens appended here"),          // near-dup of 0
    (2L, "completely different words about spark engines " * 10),
    (3L, "completely different words about spark engines " * 10 + "slightly changed"),
    (4L, "an unrelated short document")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val dup = corpus.unionByName(corpus.filter($"doc_id" === 0)
      .withColumn("doc_id", lit(10L)))
    val out = DedupOps.exactDupGroups(dup, "text", "doc_id")
    assert(out.count() == 5) // 5 distinct texts
    assert(out.filter($"doc_id" === 0).select("n_copies").as[Long].head() == 2)
  }

  test("minhash est_jaccard tracks exact jaccard within 0.15") {
    val pairs = DedupOps.minhashDupPairs(corpus, "text", "doc_id",
      bands = 32, threshold = 0.2).collect()
    val exact = DedupOps.ngramJaccard(corpus, corpus, "text", "doc_id")
      .filter($"jaccard" >= 0.2)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.contains(key), s"minhash found non-near-dup pair $key")
      assert(math.abs(r.getDouble(2) - exact(key)) < 0.15,
        s"estimate ${r.getDouble(2)} far from exact ${exact(key)} for $key")
    }
    // both planted near-dup pairs found
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((0L, 1L)) && found.contains((2L, 3L)))
  }

  test("cappedBuckets: a 10^5-member key is dropped by the pre-collect cap") {
    // the executor-OOM regression guard: one ubiquitous bucket key
    // (10^5 members — a boilerplate anchor context / degenerate LSH
    // band at corpus scale) must be dropped by the windowed cap BEFORE
    // collect_list materializes it, while normal keys pass untouched.
    // Sibling plan pin: PlanSpec "capped buckets" asserts the filter
    // sits below the aggregate, so this cannot silently regress into a
    // collect-then-filter that happens to return the same rows.
    val rows = spark.range(100000L)
      .select(lit("hot").as("k"), col("id"))
      .unionByName(spark.range(3L)
        .select(lit("cold").as("k"), col("id")))
    val out = DedupOps.cappedBuckets(rows, Seq("k"), lit(1L),
        struct(col("id")), maxBucket = 200, out = "members")
      .select(col("k"), size(col("members")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(!out.contains("hot"), s"over-cap bucket survived: $out")
    assert(out("cold") == 3)
    // and a singleton key is dropped by the lower bound (raw < 2)
    val single = DedupOps.cappedBuckets(
      Seq(("solo", 1L)).toDF("k", "id"), Seq("k"), lit(1L),
      struct(col("id")), maxBucket = 200, out = "members")
    assert(single.isEmpty)
  }

  test("containment: subset doc scores 1.0 against its superset, not vice versa") {
    val docs = Seq(
      (1L, "a b c d e"),          // 3-grams: abc bcd cde
      (2L, "a b c d e f g")       // 3-grams: + def efg
    ).toDF("doc_id", "text")
    val out = DedupOps.ngramContainment(docs, docs, "text", "doc_id")
      .select("id_a", "id_b", "inter", "n_a", "containment")
      .as[(Long, Long, Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out((1L, 2L)) == ((1L, 2L, 3, 3, 1.0)))   // A fully inside B
    assert(out((2L, 1L)) == ((2L, 1L, 3, 5, 0.6)))   // B only 3/5 in A
  }

  test("simhash: near-dups at small hamming, unrelated docs not paired") {
    val pairs = DedupOps.simhashDupPairs(corpus, "text", "doc_id",
      maxHamming = 12)  // adaptive banding: recall exact up to hamming 12
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 4L)))
  }

  test("permuted-block keys: any pair within radius shares a table key") {
    // pigeonhole property of the Manku-style tables, checked exhaustively
    // over seeded random signatures and bit-flip sets
    val rnd = new scala.util.Random(7)
    for (h <- Seq(4, 6, 12)) {
      val m = h + 2
      for (_ <- 0 until 200) {
        val sig = rnd.nextLong()
        val flipped = (0 until 64).toArray
        val nFlips = 1 + rnd.nextInt(h)
        var mutated = sig
        rnd.shuffle(flipped.toSeq).take(nFlips)
          .foreach(b => mutated ^= (1L << b))
        val ka = graft.functions.Kernels.permTableKeys(sig, m, 2).toLongArray()
        val kb = graft.functions.Kernels.permTableKeys(mutated, m, 2).toLongArray()
        assert(ka.indices.exists(i => ka(i) == kb(i)),
          s"radius-$h pair with $nFlips flips shares no table key")
      }
    }
  }

  test("simhash radius>=4 recall survives a 10x larger corpus") {
    // the planted near-dup pairs must still surface when the corpus is
    // padded with 10x unrelated docs (the regime where narrow chunk
    // keyspaces saturate buckets and silently drop recall)
    val rnd = new scala.util.Random(13)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val noise = (0 until 50).map { i =>
      (1000L + i, Seq.fill(60)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val big = corpus.unionByName(noise.toDF("doc_id", "text"))
    val pairs = DedupOps.simhashDupPairs(big, "text", "doc_id", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("connected components: chain + triangle + isolated pair label by min id") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val labels = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: superseded checkpoint blocks are released") {
    // a 12-node chain needs several label-propagation rounds; each round
    // local-checkpoints, and every superseded round's blocks must be
    // unpersisted — only the final labels may stay pinned
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val labels = DedupOps.connectedComponents(chain)
    assert(labels.select(countDistinct($"component")).as[Long].head() == 1L)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"checkpoint blocks leaked: $before persistent RDDs -> $after")
  }

  test("connected components: reliable checkpoint mode — same labels, files cleaned") {
    // with a checkpoint dir configured (the cluster deployment), lineage
    // cuts go through reliable checkpoints that survive executor loss;
    // superseded iterations' checkpoint files must be deleted
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "test expects no prior checkpoint dir")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
        .toDF("id_a", "id_b")
      val labels = DedupOps.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L))
      // at most the final labels' checkpoint may remain on disk
      import scala.jdk.CollectionConverters._
      val remaining = java.nio.file.Files.walk(dir).iterator().asScala
        .count(p => p.getFileName.toString.startsWith("rdd-"))
      assert(remaining <= 1, s"superseded checkpoint dirs not cleaned: $remaining")
    } finally {
      // a shared session: later suites must get local-checkpoint behavior
      sc.setCheckpointDir(null)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("dedupApply releases its reliable checkpoint files before returning") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "test expects no prior checkpoint dir")
    val dir = java.nio.file.Files.createTempDirectory("graft-da-ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
      val kept = DedupOps.dedupApply(docs, pairs, "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 4L, 5L))
      // the drop set is materialized inside dedupApply, so the labels'
      // rdd-N checkpoint dirs must already be gone — a lazy result that
      // left the release to the caller would leak one per call for the
      // session lifetime
      import scala.jdk.CollectionConverters._
      val remaining = java.nio.file.Files.walk(dir).iterator().asScala
        .count(p => p.getFileName.toString.startsWith("rdd-"))
      assert(remaining == 0, s"dedupApply leaked checkpoint dirs: $remaining")
    } finally {
      sc.setCheckpointDir(null)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("hash-prefilter scale path == direct path for boilerplate and repeated n-grams") {
    val docs = corpus.toDF("doc_id", "text")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(
      sorted(DedupOps.boilerplateNgrams(docs, "text", w = 5, minDocs = 2)) ==
      sorted(DedupOps.boilerplateNgrams(docs, "text", w = 5, minDocs = 2,
        hashPrefilter = true)),
      "boilerplate: prefiltered path diverged")
    assert(
      sorted(DedupOps.repeatedNgrams(docs, "text", "doc_id", w = 5, minDocs = 2)) ==
      sorted(DedupOps.repeatedNgrams(docs, "text", "doc_id", w = 5, minDocs = 2,
        hashPrefilter = true)),
      "repeated n-grams: prefiltered path diverged")
  }

  test("shingles: fewer tokens than width -> empty array, no crash") {
    val out = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(DedupOps.shingles($"text", 3).as("sh"))
    assert(out.select(size($"sh")).as[Int].head() == 0)
  }

  test("contamination scan: planted benchmark phrase is found, clean docs are not") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon entirely clean text"),
      (2L, "xx the secret benchmark phrase yy zz"),
      (3L, "no overlap here at all whatsoever")).toDF("doc_id", "text")
    val bench = Seq((100L, "contains the secret benchmark phrase verbatim"))
      .toDF("doc_id", "text")
    val got = DedupOps.contaminationScan(corpus, bench, "text", "doc_id", w = 3)
      .as[(Long, Long)].collect().toMap
    // doc 2 shares 3-grams "the secret benchmark" + "secret benchmark phrase"
    assert(got == Map(2L -> 2L))
  }

  test("contamination matrix: one pass == a per-benchmark scan; recount form agrees; null bench ids excluded") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon entirely clean text"),
      (2L, "xx the secret benchmark phrase yy zz"),
      (3L, "aa unrelated eval question stem bb cc"),
      (4L, "xx the secret benchmark phrase and unrelated eval question stem"))
      .toDF("doc_id", "text")
    val suite = Seq(
      (Some(0L), "contains the secret benchmark phrase verbatim"),
      (Some(1L), "an unrelated eval question stem appears here"),
      (Option.empty[Long], "null bench never counts the secret benchmark phrase"))
      .toDF("bench", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "bench").collect().map(_.toSeq).toSeq
    val got = rows(DedupOps.contaminationMatrix(corpus, suite, "text",
      "doc_id", "bench", w = 3))
    // doc 2 -> bench 0 (2 shared 3-grams); doc 3 -> bench 1 (2);
    // doc 4 leaks into BOTH; the null-bench row never contributes
    assert(got == Seq(
      Seq(2L, 0L, 2L), Seq(3L, 1L, 2L),
      Seq(4L, 0L, 2L), Seq(4L, 1L, 2L)), got.toString)
    // matrix slice b == contaminationScan against benchmark b alone
    for (b <- Seq(0L, 1L)) {
      val slice = got.filter(_(1) == b).map(r => Seq(r(0), r(2)))
      val one = DedupOps.contaminationScan(corpus,
          suite.filter(col("bench") === b), "text", "doc_id", w = 3)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(slice == one, s"matrix slice diverged for bench $b")
    }
    // the collision-proof recount is the identity absent collisions
    assert(rows(DedupOps.contaminationMatrix(corpus, suite, "text",
      "doc_id", "bench", w = 3, exactRecount = true)) == got,
      "exactRecount must be the identity on clean data")
  }

  test("giant buckets are capped (quadratic-blowup guard)") {
    // 300 identical docs -> one bucket of 300 > maxBucket=200 -> dropped
    val many = (0L until 300L).map(i => (i, base)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashDupPairs(many, "text", "doc_id", maxBucket = 200)
    assert(pairs.count() == 0)
  }

  test("repeated n-grams: cross-doc spans found, within-doc occs counted") {
    val span = "one two three four five six seven eight" // exactly 8 tokens
    val docs = Seq(
      (0L, s"$span and some trailing context"),
      (1L, s"prefix words then $span"),               // same 8-gram, 2nd doc
      (2L, s"$span middle filler $span"),             // twice in ONE doc
      (3L, "unique eight token span nothing shares this one")
    ).toDF("doc_id", "text")
    val out = DedupOps.repeatedNgrams(docs, "text", "doc_id", w = 8, minDocs = 2)
      .as[(String, Long, Long)].collect()
      .map { case (g, a, b) => g -> ((a, b)) }.toMap
    // the planted span is in docs 0, 1, 2 with 4 total occurrences
    assert(out(span) == ((3L, 4L)))
    // doc 3's gram appears in one doc only -> filtered by minDocs
    assert(!out.contains("unique eight token span nothing shares this one"))
    // every surviving gram is in >= 2 distinct docs
    assert(out.values.forall(_._1 >= 2))
  }

  test("novelty: a verbatim later copy scores 0, fresh content 1, partial overlap in between") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // verbatim copy, later id
      (3L, "totally fresh unrelated content words here"),
      // shares its first 3-gram with doc 1, adds 3 new grams
      (4L, "alpha beta gamma omicron sigma tau")
    ).toDF("doc_id", "text")
    val out = graft.ops.DedupOps.noveltyScore(docs, "text", "doc_id")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((4L, 4L, 1.0)))
    assert(out(2L) == ((4L, 0L, 0.0)), "verbatim copy must score 0")
    assert(out(3L) == ((4L, 4L, 1.0)))
    assert(out(4L) == ((4L, 3L, 0.75)), s"partial overlap: ${out(4L)}")
  }

  test("leak-free split: a whole dup cluster shares one split; singletons self-label") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "shared near duplicate content body text here today"),
      (2L, "shared near duplicate content body text here today extra"),
      (3L, "completely different island document standing alone")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = graft.ops.DedupOps.leakFreeSplit(docs, pairs, "doc_id")
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // clustered docs share the min-label group and therefore the split
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L)
    assert(out(1L)._3 == out(2L)._3,
      "near-dup pair straddled the split boundary")
    // the singleton labels itself and draws independently
    assert(out(3L)._2 == 3L)
    // bucket is the portable hash of the LABEL, not the doc id: doc 2
    // must get doc 1's draw, not its own
    val ownDraw = (2L * 2654435761L) % 100
    val labelDraw = (1L * 2654435761L) % 100
    if (ownDraw != labelDraw) {
      val b2 = graft.ops.DedupOps.leakFreeSplit(docs, pairs, "doc_id")
        .filter(col("doc_id") === 2L).select("bucket")
        .as[Long].head()
      assert(b2 == labelDraw, s"doc 2 drew on its own id: $b2")
    }
  }

  test("leak-free split and dedupApply survive a 40-link chain under default config (auto star fallback)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a verbatim-overlap CHAIN past the propagation budget: doc i
    // overlaps doc i+1 — the crawl-scale shape that used to abort both
    // entry points at maxIter; auto routing degrades to star contraction
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val docs = (0L to 45L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    val split = graft.ops.DedupOps.leakFreeSplit(docs, chain, "doc_id")
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // the whole chain is ONE cluster labeled by its minimum, one split
    assert((0L to 40L).forall(i => split(i)._2 == 0L))
    assert((0L to 40L).map(split(_)._3).distinct.size == 1,
      "chain members straddled a split boundary")
    assert((41L to 45L).forall(i => split(i)._2 == i), "singletons self-label")
    val kept = graft.ops.DedupOps.dedupApply(docs, chain, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    // one representative (the min) for the chain + the singletons
    assert(kept.toSeq == (0L +: (41L to 45L)), s"got ${kept.toSeq}")
  }

  test("leak-free split excludes null-id rows (grouped-operator null contract)") {
    import spark.implicits._
    val docs = Seq((Some(1L), "alpha"), (None, "orphan"), (Some(2L), "beta"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = graft.ops.DedupOps.leakFreeSplit(docs, pairs, "doc_id")
    assert(out.count() == 2 &&
      out.filter(org.apache.spark.sql.functions.col("doc_id").isNull).isEmpty,
      "a null-id row must not silently land in the 'test' split")
  }

  test("leakFreeSplitLabeled over an accreted ComponentsIndex == one-shot split over the pair union; stable under unrelated batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0L to 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // batch 1: {1,2,3} and {10,11}; batch 2 (UNRELATED): {20,21};
    // batch 3 (MERGING): bridges 3-10
    val b1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val b2 = Seq((20L, 21L)).toDF("id_a", "id_b")
    val b3 = Seq((3L, 10L)).toDF("id_a", "id_b")
    val idx = tmpDir() + "/cidx"
    def splitNow() = graft.ops.DedupOps.leakFreeSplitLabeled(docs,
        graft.ops.ComponentsIndex.currentLabels(spark, idx), "doc_id")
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    graft.ops.ComponentsIndex.appendAndLabel(spark, b1, idx,
      batchTag = Some("b1"))
    val s1 = splitNow()
    graft.ops.ComponentsIndex.appendAndLabel(spark, b2, idx,
      batchTag = Some("b2"))
    val s2 = splitNow()
    // STABILITY: the unrelated batch moved nobody already assigned
    assert(s1.keys.forall(k => k == 20L || k == 21L || s1(k) == s2(k)),
      "an unrelated batch flipped an existing doc's split")
    graft.ops.ComponentsIndex.appendAndLabel(spark, b3, idx,
      batchTag = Some("b3"))
    val s3 = splitNow()
    // the merge moved the WHOLE {10,11} cluster to label 1's split
    assert(s3(10L)._2 == 1L && s3(11L)._2 == 1L &&
      s3(10L)._3 == s3(1L)._3 && s3(11L)._3 == s3(1L)._3,
      "merged cluster did not move together")
    // store-resolved == the one-shot split over the union of all pairs
    val oneShot = graft.ops.DedupOps.leakFreeSplit(docs,
        b1.unionByName(b2).unionByName(b3), "doc_id")
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(s3 == oneShot, s"store=$s3 oneShot=$oneShot")
    // the O(batch) probe path resolves the same labels for a batch
    val probe = graft.ops.DedupOps.leakFreeSplitLabeled(
        docs.filter(col("doc_id") <= 11L),
        graft.ops.ComponentsIndex.lookupLabels(spark, idx,
          docs.filter(col("doc_id") <= 11L), "doc_id"), "doc_id")
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(probe.forall { case (k, v) => oneShot(k) == v },
      "lookupLabels-resolved batch split diverged from the one-shot")
    // RAW (unresolved) label rows — multiple per id under the
    // min-lattice's append-only discipline — must min-fold to the
    // current label, never duplicate the joined corpus row
    val raw = Seq((10L, 10L), (10L, 3L), (10L, 1L)).toDF("id", "component")
    val viaRaw = graft.ops.DedupOps.leakFreeSplitLabeled(
      docs.filter(col("doc_id") === 10L), raw, "doc_id")
    assert(viaRaw.count() == 1 &&
      viaRaw.select("group_id").as[Long].head() == 1L,
      "raw label rows must min-fold, not duplicate the joined row")
  }

  test("novelty: hash-keyed exchanges produce the exact text-keyed scores on the mutant corpus") {
    import spark.implicits._
    val base = (0L until 60L).map { i =>
      (i, s"token${i % 7} word${i % 11} common phrase body ${i} tail${i % 5} end${i % 3}")
    }
    // 80%-prefix mutants with later ids — the q_novelty planting shape
    val mutants = base.take(30).map { case (i, t) =>
      (i + 1000000L, t.split(" ").take(6).mkString(" "))
    }
    val docs = (base ++ mutants).toDF("doc_id", "text")
    val hashed = graft.ops.DedupOps.noveltyScore(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val text = graft.ops.DedupOps
      .noveltyScore(docs, "text", "doc_id", hashKeys = false)
      .orderBy("doc_id").collect().toSeq
    assert(hashed == text, "hash-keyed novelty diverged from the text-keyed twin")
  }

  test("fuzzy decontamination: rephrased benchmark found with exact jaccard; unrelated passes; threshold cuts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    // the 6-token prefix of doc 1 — a "rephrased" eval doc
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("bench_id", "text")
    val out = graft.ops.DedupOps.fuzzyContamination(docs, bench,
        "text", "doc_id", "bench_id", w = 3, threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: 8 shingles, bench: 4, intersection 4 -> j = 4/8 = 0.5;
    // doc 2 shares nothing
    assert(out == Seq((1L, 100L, 4L, 0.5)), s"got $out")
    // a tighter threshold cuts the same pair
    assert(graft.ops.DedupOps.fuzzyContamination(docs, bench,
      "text", "doc_id", "bench_id", w = 3, threshold = 0.6).count() == 0)
  }

  test("exact recount is collision-proof: a lossy hash inflates the one-pass scan, the two-pass repairs it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a real xxhash64 collision cannot be synthesized — plant collisions
    // through the injectable hash seam instead: pmod(xxhash64, 4) makes
    // cross-gram collisions near-certain, so the one-pass scan MUST
    // report clean docs / inflated intersections, and the recount must
    // reproduce the exact string-level truth regardless
    val lossy: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => pmod(xxhash64(c), lit(4L))
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "mu nu xi omicron pi rho sigma tau upsilon phi")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("bench_id", "text")
    // string truth: only doc 1 shares 3-grams (4 of them)
    val onePass = graft.ops.DedupOps.contaminationScanImpl(docs, bench,
        "text", "doc_id", 3, exactRecount = false, lossy)
      .as[(Long, Long)].collect().toMap
    assert(onePass.keySet != Set(1L) || onePass(1L) != 4L,
      s"lossy hash failed to corrupt the one-pass scan: $onePass")
    val recounted = graft.ops.DedupOps.contaminationScanImpl(docs, bench,
        "text", "doc_id", 3, exactRecount = true, lossy)
      .as[(Long, Long)].collect().toMap
    assert(recounted == Map(1L -> 4L),
      s"recount must equal the string truth: $recounted")
    // same seam on the Jaccard form: survivors recount to exact inter,
    // collision passengers fall below the threshold and drop
    val fuzzOne = graft.ops.DedupOps.fuzzyContaminationImpl(docs, bench,
        "text", "doc_id", "bench_id", 3, 0.3, exactRecount = false, lossy)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fuzzOne != Set((1L, 100L, 4L, 0.5)),
      s"lossy hash failed to corrupt the one-pass jaccard: $fuzzOne")
    val fuzzTwo = graft.ops.DedupOps.fuzzyContaminationImpl(docs, bench,
        "text", "doc_id", "bench_id", 3, 0.3, exactRecount = true, lossy)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fuzzTwo == Set((1L, 100L, 4L, 0.5)),
      s"recounted jaccard must equal the string truth: $fuzzTwo")
    // with the REAL hash, recount ≡ one-pass on clean data (both forms)
    val a = graft.ops.DedupOps.contaminationScan(docs, bench,
      "text", "doc_id", w = 3).orderBy("doc_id").collect().toSeq
    val b = graft.ops.DedupOps.contaminationScan(docs, bench,
      "text", "doc_id", w = 3, exactRecount = true)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    val fa = graft.ops.DedupOps.fuzzyContamination(docs, bench,
      "text", "doc_id", "bench_id").orderBy("doc_id").collect().toSeq
    val fb = graft.ops.DedupOps.fuzzyContamination(docs, bench,
      "text", "doc_id", "bench_id", exactRecount = true)
      .orderBy("doc_id").collect().toSeq
    assert(fa == fb)
  }

  test("lshParams: pins the op defaults at t=0.5; threshold moves bands the right way") {
    import graft.ops.DedupOps.lshParams
    // the 16/4 S-curve midpoint (1/16)^(1/4) = 0.5 exactly — the
    // op's documented defaults must be the policy's answer
    assert(lshParams(0.5, 64) == ((16, 4)))
    // a HIGHER threshold needs a steeper curve further right: fewer
    // bands, more rows per band — and vice versa
    val (bHi, rHi) = lshParams(0.8, 64)
    val (bLo, rLo) = lshParams(0.2, 64)
    assert(bHi < 16 && rHi > 4, s"t=0.8 -> ($bHi, $rHi)")
    assert(bLo > 16 && rLo < 4, s"t=0.2 -> ($bLo, $rLo)")
    // every answer satisfies the op's divisibility contract
    for (t <- Seq(0.1, 0.3, 0.5, 0.7, 0.9); k <- Seq(16, 64, 128)) {
      val (b, r) = lshParams(t, k)
      assert(b * r == k && b >= 1 && r >= 1, s"t=$t k=$k -> ($b, $r)")
    }
    // weighting: caring only about false positives never picks MORE
    // bands (more bands = more accidental bucket hits)
    val (bFp, _) = lshParams(0.5, 64, fpWeight = 1.0)
    assert(bFp <= 16, s"fp-only picked more bands: $bFp")
  }
}
