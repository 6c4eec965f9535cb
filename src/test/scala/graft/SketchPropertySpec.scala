package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Bpe, Quantiles}

/** Property tests: the guarantees the fixed-fixture specs pin are
  * asserted here over RANDOM (seeded, reproducible) inputs — the
  * sketch's error bound and merge identity, and BPE's distributed ==
  * reference equality, must hold for any data, not just the fixtures
  * someone thought of. Raw scalacheck Gens drawn with fixed seeds
  * (the scalatest-scalacheck bridge isn't a declared dependency);
  * a failing seed reproduces exactly. */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(60), Seed(seed))

  private val valuesGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0.01, 9.99e7)
      .map(v => math.rint(v * 100) / 100))

  test("property: sketch quantiles always within 2^-B of the true rank value") {
    for (s <- 1L to 8L) {
      val vals = sample(valuesGen, s)
      val p = sample(Gen.chooseNum(0.0, 1.0), s + 100)
      val est = Quantiles.sketchQuantiles(vals.toDF("v"), "v", Seq(p),
        prefixBits = 10).head().getDouble(1)
      val sortedQ = vals.map(v => math.floor(v * 100 + 0.5)).sorted
      val truth = sortedQ((p * (sortedQ.length - 1)).toLong.toInt) / 100.0
      assert(truth > 0 && math.abs(est - truth) / truth <=
        math.pow(2, -10) + 1e-12,
        s"seed=$s p=$p est=$est truth=$truth n=${vals.length}")
    }
  }

  test("property: splitting data arbitrarily and merging sketches is lossless") {
    for (s <- 1L to 6L) {
      val vals = sample(valuesGen, s + 200)
      val cut = sample(Gen.chooseNum(1, 5), s + 300)
      val ps = Seq(0.1, 0.5, 0.9)
      val whole = Quantiles.sketchQuantiles(vals.toDF("v"), "v", ps)
        .collect().map(_.toString).toSeq
      val merged = Quantiles.quantilesFromSketch(
        vals.grouped(math.max(1, vals.length / cut)).toSeq
          .map(part => Quantiles.bucketCounts(part.toDF("v"), "v"))
          .reduce(_ unionByName _), ps)
        .collect().map(_.toString).toSeq
      assert(merged == whole, s"seed=$s split at $cut diverged")
    }
  }

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  private val corpusGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" "))))

  /** Reference Sennrich trainer (the BpeSpec one, kept local). */
  private def refMerges(corpus: Seq[String], merges: Int)
      : Seq[(Int, String, String, Long)] = {
    var segs: Map[Seq[String], Long] = corpus
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toSeq -> ws.length.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (syms, cnt) =>
        syms.sliding(2).filter(_.length == 2).foreach { pr =>
          counts((pr(0), pr(1))) = counts.getOrElse((pr(0), pr(1)), 0L) + cnt }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((rank, a, b, c))
        segs = segs.map { case (syms, cnt) =>
          val m = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              m += (a + b); i += 2
            } else { m += syms(i); i += 1 }
          }
          m.toSeq -> cnt
        }
      }
    }
    out.toSeq
  }

  test("property: waterFill invariants over random supplies and totals") {
    import graft.ops.Mixing
    val supplyGen: Gen[Map[String, Long]] =
      Gen.choose(1, 12).flatMap(k => Gen.listOfN(k,
        Gen.chooseNum(0L, 100000L)).map(ns =>
          ns.zipWithIndex.map { case (n, i) => s"g$i" -> n }.toMap))
    for (s <- 1L to 20L) {
      val supply = sample(supplyGen, s + 400)
      val total = sample(Gen.chooseNum(0L, 250000L), s + 500)
      val alloc = Mixing.waterFill(supply, total)
      assert(alloc.keySet == supply.keySet, s"seed=$s: lost a group")
      assert(alloc.values.sum == math.min(total, supply.values.sum),
        s"seed=$s: allocation must spend exactly min(total, supply)")
      assert(supply.forall { case (g, n) => alloc(g) <= n },
        s"seed=$s: a group exceeded its supply")
      // every non-capped group receives within 1 token of the others
      val open = supply.collect {
        case (g, n) if alloc(g) < n => alloc(g) }.toSeq
      assert(open.isEmpty || open.max - open.min <= 1,
        s"seed=$s: open groups unbalanced: $alloc vs supply $supply")
    }
  }

  test("property: rocAuc == brute-force pairwise concordance on random tied scores") {
    import graft.ops.Classifier
    val ptsGen: Gen[List[(Double, Double)]] =
      Gen.nonEmptyListOf(for {
        y <- Gen.oneOf(0.0, 1.0)
        sc <- Gen.choose(0, 9).map(_ / 10.0) // coarse grid forces ties
      } yield (y, sc))
    for (s <- 1L to 12L) {
      val pts = sample(ptsGen, s + 600)
      val pos = pts.filter(_._1 == 1.0)
      val neg = pts.filter(_._1 == 0.0)
      val auc = Classifier.rocAuc(
        pts.zipWithIndex.map { case ((y, sc), i) => (i.toLong, y, sc) }
          .toDF("id", "y", "s"), "s", "y")
        .select("auc").head()
      if (pos.isEmpty || neg.isEmpty)
        assert(auc.isNullAt(0), s"seed=$s: one-class AUC must be null")
      else {
        val pairs = for ((_, sp) <- pos; (_, sn) <- neg)
          yield if (sp > sn) 1.0 else if (sp == sn) 0.5 else 0.0
        val brute = pairs.sum / pairs.size
        assert(math.abs(auc.getDouble(0) - brute) < 1e-6,
          s"seed=$s: auc=${auc.getDouble(0)} brute=$brute n=${pts.size}")
      }
    }
  }

  test("property: PSI >= 0 on random windows, 0 iff the binned shares match, symmetric") {
    import graft.ops.Classifier
    val winGen: Gen[List[Double]] =
      Gen.nonEmptyListOf(Gen.choose(0, 100).map(_ / 100.0))
    for (s <- 1L to 10L) {
      val a = sample(winGen, s + 700)
      val b = sample(winGen, s + 800)
      def df(xs: List[Double]) = xs.zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
      val ab = Classifier.scoreDrift(df(a), df(b), "p").head()
      val ba = Classifier.scoreDrift(df(b), df(a), "p").head()
      // each term (q-p)ln(q/p) is >= 0 (signs agree), so PSI >= 0
      assert(ab.getDouble(2) >= 0.0, s"seed=$s: PSI must be >= 0: $ab")
      assert(math.abs(ab.getDouble(2) - ba.getDouble(2)) <= 1e-6,
        s"seed=$s: PSI must be symmetric: $ab vs $ba")
      // equal binned histograms (same counts, same totals) make
      // every term vanish EXACTLY — zero, not epsilon (the converse
      // is not asserted: a sub-quantum difference may round to 0)
      def binned(xs: List[Double]) = xs
        .groupBy(p => math.min((p * 1e6).round * 10 / 1000000, 9L))
        .view.mapValues(_.size).toMap
      if (a.length == b.length && binned(a) == binned(b))
        assert(ab.getDouble(2) == 0.0,
          s"seed=$s: equal shares must read PSI 0, got $ab")
      // the self-window always reads exactly zero
      assert(Classifier.scoreDrift(df(a), df(a), "p")
        .head().getDouble(2) == 0.0, s"seed=$s: self-PSI must be 0")
      // KS on the same windows: in [0,1], EXACTLY symmetric (integer
      // numerators), zero on the self-window, and equal to the
      // brute-force sup-CDF gap over the merged support
      val ksAb = Classifier.scoreDriftKs(df(a), df(b), "p")
        .head().getDouble(2)
      assert(ksAb >= 0.0 && ksAb <= 1.0, s"seed=$s: KS out of [0,1]")
      assert(ksAb == Classifier.scoreDriftKs(df(b), df(a), "p")
        .head().getDouble(2), s"seed=$s: KS must be symmetric")
      assert(Classifier.scoreDriftKs(df(a), df(a), "p")
        .head().getDouble(2) == 0.0, s"seed=$s: self-KS must be 0")
      val thrs = (a ++ b).map(p => (p * 1e6).round / 1e6).distinct
      val brute = thrs.map { t =>
        math.abs(a.count(p => (p * 1e6).round / 1e6 <= t).toDouble / a.length -
          b.count(p => (p * 1e6).round / 1e6 <= t).toDouble / b.length)
      }.max
      assert(math.abs(ksAb - brute) <= 1e-6,
        s"seed=$s: KS $ksAb != brute sup-CDF gap $brute")
    }
  }

  test("property: reliability's per-bin gaps fold back to ECE; bestThreshold == brute-force F1 argmax") {
    import graft.ops.Classifier
    val ptsGen: Gen[List[(Double, Double)]] =
      Gen.nonEmptyListOf(for {
        y <- Gen.oneOf(0.0, 1.0)
        sc <- Gen.choose(0, 20).map(_ / 20.0)
      } yield (y, sc))
    for (s <- 1L to 10L) {
      val pts = sample(ptsGen, s + 900)
      val df = pts.zipWithIndex
        .map { case ((y, sc), i) => (i.toLong, y, sc) }
        .toDF("id", "y", "s")
      // ECE == sum_b (n_b/N)|gap_b| over the reliability rows (each
      // side rounds once, so agreement is to bins x 1e-6)
      val rel = Classifier.reliability(df, "s", "y")
        .select("n", "gap").collect()
      val n = rel.map(_.getLong(0)).sum
      val folded = rel.map(r => r.getLong(0) *
        math.abs(r.getDouble(1))).sum / n
      val ece = Classifier.calibrationError(df, "s", "y")
        .head().getDouble(1)
      assert(math.abs(folded - ece) <= rel.length * 1e-6 + 1e-12,
        s"seed=$s: reliability gaps ($folded) must fold to ECE ($ece)")
      // bestThreshold == the F1 argmax recomputed from prCurve rows,
      // with the larger-thr tie rule
      val curve = Classifier.prCurve(df, "s", "y")
        .select("thr", "tp", "fp", "fn").collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      val f1 = curve.map { case (thr, tp, fp, fn) =>
        (thr, graft.functions.Rounding.roundHalfUpDouble(
          2.0 * tp / (2.0 * tp + 1.0 * fn + fp), 6)) }
      val bestBrute = f1.maxBy { case (thr, f) => (f, thr) }
      val got = Classifier.bestThreshold(df, "s", "y").head()
      assert((got.getDouble(0), got.getDouble(4)) == bestBrute,
        s"seed=$s: bestThreshold ${got.toSeq} != brute $bestBrute")
    }
  }

  test("property: every grouped calibration metric row == the ungrouped metric on that group's slice") {
    // the grouped family's defining identity: partitioning the fold
    // on the group must change NOTHING about each group's answer —
    // for any data, not just the 4-shard fixtures
    import graft.ops.Classifier
    import org.apache.spark.sql.functions.col
    val ptsGen: Gen[List[(String, Double, Double)]] =
      Gen.nonEmptyListOf(for {
        g <- Gen.oneOf("a", "b", "c")
        y <- Gen.oneOf(0.0, 1.0)
        sc <- Gen.choose(0, 20).map(_ / 20.0)
      } yield (g, y, sc))
    for (s <- 1L to 8L) {
      val pts = sample(ptsGen, s + 1500)
      val df = pts.zipWithIndex
        .map { case ((g, y, sc), i) => (i.toLong, g, y, sc) }
        .toDF("id", "g", "y", "s")
      def slice(g: String) = df.filter(col("g") === g)
      val groups = pts.map(_._1).distinct.sorted
      def byGroup(rows: Array[org.apache.spark.sql.Row]) =
        rows.groupBy(_.getString(0)).view
          .mapValues(_.map(_.toSeq.drop(1)).toSeq.sortBy(_.toString))
          .toMap
      val brierBy = byGroup(
        Classifier.brierScoreBy(df, "g", "s", "y").collect())
      val relBy = byGroup(
        Classifier.reliabilityBy(df, "g", "s", "y").collect())
      val thrBy = byGroup(
        Classifier.bestThresholdBy(df, "g", "s", "y").collect())
      val aucBy = byGroup(
        Classifier.rocAucBy(df, "g", "s", "y").collect())
      for (g <- groups) {
        assert(brierBy(g) ==
          Seq(Classifier.brierScore(slice(g), "s", "y").head().toSeq),
          s"seed=$s g=$g: grouped Brier != slice Brier")
        assert(relBy(g) ==
          Classifier.reliability(slice(g), "s", "y").collect()
            .map(_.toSeq).toSeq.sortBy(_.toString),
          s"seed=$s g=$g: grouped reliability != slice reliability")
        assert(thrBy(g) ==
          Classifier.bestThreshold(slice(g), "s", "y").collect()
            .map(_.toSeq).toSeq,
          s"seed=$s g=$g: grouped operating point != slice argmax")
        assert(aucBy(g) ==
          Seq(Classifier.rocAuc(slice(g), "s", "y").head().toSeq),
          s"seed=$s g=$g: grouped AUC != slice AUC")
      }
      // grouped KS between the even/odd id windows == per-slice KS
      val even = df.filter(col("id") % 2 === 0)
      val odd = df.filter(col("id") % 2 =!= 0)
      val ksBy = byGroup(
        Classifier.scoreDriftKsBy(even, odd, "g", "s").collect())
      for (g <- ksBy.keys)
        assert(ksBy(g) == Seq(Classifier.scoreDriftKs(
            even.filter(col("g") === g), odd.filter(col("g") === g),
            "s").head().toSeq),
          s"seed=$s g=$g: grouped KS != slice KS")
    }
  }

  test("property: distributed BPE == reference Sennrich on random corpora") {
    // a,b,c,d words of length <= 6: dense pair collisions, frequent
    // left==right runs, frequent early fusion — the adversarial zone
    // for the fold and the tie-break
    for (s <- 1L to 6L) {
      val corpus = sample(corpusGen, s + 400)
      val got = Bpe.train(corpus.toDF("text"), "text", merges = 6)
        .merges.collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got == refMerges(corpus, 6), s"seed=$s corpus=$corpus")
    }
  }
}
