package graft

import org.apache.spark.sql.functions._
import graft.ops.Classifier

/** The distributed quality-classifier trainer: learns separable data,
  * walks a deterministic weight trajectory, honors the null contract,
  * and fails loud on an untrainable input. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable by x1 (positive class sits at x1 ~ 1, negative
  // at x1 ~ 0); x2 is an uninformative constant-ish nuisance feature
  private def separable = (
    (0 until 50).map(i => (i.toLong, 1.0, 0.9 + (i % 5) * 0.02, 0.5)) ++
    (50 until 100).map(i => (i.toLong, 0.0, 0.1 + (i % 5) * 0.02, 0.5))
  ).toDF("id", "y", "x1", "x2")

  test("fit separates planted classes; scoring ranks every positive above every negative") {
    val w = Classifier.fitLogistic(separable, Seq("x1", "x2"), "y",
      iters = 25, lr = 0.5)
    assert(w(1) > 0, s"separating weight must be positive: ${w.toSeq}")
    val scored = Classifier.scoreLogistic(separable, Seq("x1", "x2"),
        w.toSeq)
      .select("y", "p").as[(Double, Double)].collect()
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    assert(pos.min > neg.max,
      s"classes not separated: pos.min=${pos.min} neg.max=${neg.max}")
    // decision accuracy at the 0.5 threshold is perfect on this set
    assert(pos.forall(_ >= 0.5) && neg.forall(_ < 0.5),
      "threshold decisions missed the planted separation")
  }

  test("weight trajectory is deterministic across fits and partitionings") {
    val a = Classifier.fitLogistic(separable, Seq("x1", "x2"), "y")
    val b = Classifier.fitLogistic(separable.repartition(7), Seq("x1", "x2"), "y")
    assert(a.toSeq == b.toSeq,
      s"fit must be partitioning-invariant: ${a.toSeq} vs ${b.toSeq}")
  }

  test("null features/labels are excluded from the fit; null feature scores null") {
    val withNulls = separable.unionByName(Seq(
      (900L, Some(1.0), None: Option[Double], Some(0.5)),
      (901L, None: Option[Double], Some(0.9), Some(0.5)))
      .toDF("id", "y", "x1", "x2"))
    val a = Classifier.fitLogistic(separable, Seq("x1", "x2"), "y")
    val b = Classifier.fitLogistic(withNulls, Seq("x1", "x2"), "y")
    assert(a.toSeq == b.toSeq, "null rows perturbed the gradient")
    val p = Classifier.scoreLogistic(withNulls, Seq("x1", "x2"), a.toSeq)
      .filter(col("id") === 900L).select("p").head()
    assert(p.isNullAt(0), "a null feature must score null, not 0.5")
  }

  test("prCurve matches brute force at every threshold; confusion identities hold") {
    val scored = Classifier.scoreLogistic(separable, Seq("x1", "x2"),
      Classifier.fitLogistic(separable, Seq("x1", "x2"), "y",
        iters = 10).toSeq)
    val rows = Classifier.prCurve(scored, "p", "y")
      .select("thr", "tp", "fp", "fn", "precision", "recall")
      .as[(Double, Long, Long, Long, Double, Double)].collect()
    val pts = scored.select("p", "y").as[(Double, Double)].collect()
    val pTot = pts.count(_._2 == 1.0)
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length,
      "one row per distinct threshold")
    for ((thr, tp, fp, fn, prec, rec) <- rows) {
      val ge = pts.filter(_._1 >= thr)
      assert(tp == ge.count(_._2 == 1.0) && fp == ge.count(_._2 == 0.0),
        s"confusion counts at thr=$thr diverge from brute force")
      assert(tp + fn == pTot, s"tp+fn must equal total positives at $thr")
      assert(math.abs(prec - tp.toDouble / (tp + fp)) < 1e-6 &&
        math.abs(rec - tp.toDouble / pTot) < 1e-6,
        s"precision/recall arithmetic at $thr")
    }
  }

  test("rocAuc: 1.0 on separated classes, brute-force concordance with ties, null when a class is absent") {
    val w = Classifier.fitLogistic(separable, Seq("x1", "x2"), "y",
      iters = 25, lr = 0.5)
    val scored = Classifier.scoreLogistic(separable, Seq("x1", "x2"),
      w.toSeq)
    val perfect = Classifier.rocAuc(scored, "p", "y")
      .select("pos", "neg", "auc")
      .as[(Long, Long, Double)].head()
    assert(perfect == ((50L, 50L, 1.0)), s"separated AUC: $perfect")
    // ties and interleaving: brute-force pairwise concordance
    val mixed = Seq((1L, 1.0, 0.9), (2L, 1.0, 0.7), (3L, 1.0, 0.5),
      (4L, 0.0, 0.7), (5L, 0.0, 0.5), (6L, 0.0, 0.1))
      .toDF("id", "y", "s")
    val got = Classifier.rocAuc(mixed, "s", "y")
      .select("auc").as[Double].head()
    val pts = Seq((1.0, 0.9), (1.0, 0.7), (1.0, 0.5), (0.0, 0.7),
      (0.0, 0.5), (0.0, 0.1))
    val pairs = for {
      (yp, sp) <- pts if yp == 1.0
      (yn, sn) <- pts if yn == 0.0
    } yield if (sp > sn) 1.0 else if (sp == sn) 0.5 else 0.0
    val brute = pairs.sum / pairs.size
    assert(math.abs(got - brute) < 1e-6, s"auc=$got brute=$brute")
    // one-class input: AUC undefined, surfaced as null
    val oneClass = Classifier.rocAuc(
      mixed.filter(col("y") === 1.0), "s", "y")
    assert(oneClass.select("auc").head().isNullAt(0),
      "single-class AUC must be null, not 0.5")
  }

  test("untrainable input fails loud; bad arguments are rejected") {
    val empty = separable.filter(lit(false))
    val e = intercept[IllegalArgumentException] {
      Classifier.fitLogistic(empty, Seq("x1"), "y")
    }
    assert(e.getMessage.contains("no trainable rows"))
    intercept[IllegalArgumentException] {
      Classifier.fitLogistic(separable, Seq.empty, "y")
    }
    intercept[IllegalArgumentException] {
      Classifier.scoreLogistic(separable, Seq("x1"), Seq(0.0)) // needs 2
    }
  }

  test("early stop: converged fixture yields bit-identical weights with fewer rounds; a coarse tol stops at zero updates") {
    // saturating fixture: |x1| large enough that once the separating
    // weight grows, sigma(z) saturates and every rounded gradient
    // component hits EXACTLY zero at 8dp — from there on, updates are
    // provably no-ops, so stop-at-convergence == full-iters weights
    val sat = (
      (0 until 40).map(i => (i.toLong, 1.0, 40.0 + (i % 3), 0.5)) ++
      (40 until 80).map(i => (i.toLong, 0.0, -40.0 - (i % 3), 0.5))
    ).toDF("id", "y", "x1", "x2")
    val full = Classifier.fitLogistic(sat, Seq("x1", "x2"), "y",
      iters = 60, lr = 0.5)
    val stopped = Classifier.fitLogistic(sat, Seq("x1", "x2"), "y",
      iters = 60, lr = 0.5, tol = 1e-9)
    assert(full.toSeq == stopped.toSeq,
      s"early stop drifted off the full trajectory: ${full.toSeq} vs ${stopped.toSeq}")
    // the default tol = 0 walks the identical trajectory too (its
    // skipped post-zero updates are no-ops by construction)
    val dflt = Classifier.fitLogistic(sat, Seq("x1", "x2"), "y",
      iters = 60, lr = 0.5)
    assert(dflt.toSeq == full.toSeq)
    // a tol above the first round's gradient magnitude stops before
    // ANY update — proof the mechanism actually fires
    val zeros = Classifier.fitLogistic(separable, Seq("x1", "x2"), "y",
      iters = 10, tol = 1.0)
    assert(zeros.forall(_ == 0.0),
      s"tol=1.0 must stop at the zero vector: ${zeros.toSeq}")
  }

  test("L2 regularization shrinks the separating weight, stays deterministic and partitioning-invariant") {
    val plain = Classifier.fitLogistic(separable, Seq("x1", "x2"), "y",
      iters = 25)
    val reg = Classifier.fitLogistic(separable, Seq("x1", "x2"), "y",
      iters = 25, l2 = 0.5)
    assert(math.abs(reg(1)) < math.abs(plain(1)),
      s"L2 must shrink the separating weight: ${reg(1)} vs ${plain(1)}")
    assert(reg(1) > 0, "regularized fit must still separate")
    val regB = Classifier.fitLogistic(separable.repartition(7),
      Seq("x1", "x2"), "y", iters = 25, l2 = 0.5)
    assert(reg.toSeq == regB.toSeq,
      "regularized fit must be partitioning-invariant")
    intercept[IllegalArgumentException] {
      Classifier.fitLogistic(separable, Seq("x1"), "y", l2 = -0.1)
    }
    intercept[IllegalArgumentException] {
      Classifier.fitLogistic(separable, Seq("x1"), "y", tol = -1.0)
    }
  }

  test("calibrationError matches the brute-force binned definition; boundary scores clamp into the last bin") {
    // hand-scored rows across several bins, with thr = 1.0 planted to
    // exercise the last-bin clamp and duplicated scores to exercise
    // the per-score aggregate
    val rows = Seq(
      (1L, 0.05, 0.0), (2L, 0.05, 0.0), (3L, 0.12, 1.0),
      (4L, 0.48, 0.0), (5L, 0.52, 1.0), (6L, 0.52, 1.0),
      (7L, 0.87, 1.0), (8L, 0.87, 0.0), (9L, 1.0, 1.0), (10L, 1.0, 1.0))
    val df = rows.toDF("id", "p", "y")
    val got = Classifier.calibrationError(df, "p", "y")
      .select("n", "ece").as[(Long, Double)].head()
    // brute force: bin by floor(p*10) clamped to 9; per-bin
    // |mean(y) - mean(p)| weighted by n/N
    val byBin = rows.groupBy(r => math.min((r._2 * 10).toInt, 9))
    val eceBf = graft.functions.Rounding.roundHalfUpDouble(
      byBin.values.map { g =>
        val n = g.size.toDouble
        n / rows.size * math.abs(
          g.map(_._3).sum / n - g.map(_._2).sum / n)
      }.sum, 6)
    assert(got._1 == 10L)
    assert(math.abs(got._2 - eceBf) <= 1e-6,
      s"ECE diverged from brute force: ${got._2} vs $eceBf")
    // from-aggregate over a SPLIT store folds to the same answer
    val agg1 = Classifier.scoreAggregate(df.filter(col("id") <= 5), "p", "y")
    val agg2 = Classifier.scoreAggregate(df.filter(col("id") > 5), "p", "y")
    val inc = Classifier.eceFromAggregate(agg1.unionByName(agg2))
      .select("ece").as[Double].head()
    assert(inc == got._2, s"accreted ECE diverged: $inc vs ${got._2}")
    // empty input: n = 0, ece null — never a division blow-up
    val empty = Classifier.calibrationError(df.filter(lit(false)), "p", "y")
      .head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }

  test("brierScore matches the brute-force mean squared error; accreted store folds to the same value") {
    val rows = Seq(
      (1L, 0.1, 0.0), (2L, 0.9, 1.0), (3L, 0.4, 1.0),
      (4L, 0.4, 0.0), (5L, 0.75, 1.0), (6L, 1.0, 0.0))
    val df = rows.toDF("id", "p", "y")
    val got = Classifier.brierScore(df, "p", "y")
      .select("n", "brier").as[(Long, Double)].head()
    val bf = graft.functions.Rounding.roundHalfUpDouble(
      rows.map(r => math.pow(r._2 - r._3, 2)).sum / rows.size, 6)
    assert(got._1 == 6L)
    assert(got._2 == bf,
      s"Brier diverged from brute force: ${got._2} vs $bf")
    val inc = Classifier.brierFromAggregate(
        Classifier.scoreAggregate(df.filter(col("id") <= 3), "p", "y")
          .unionByName(
            Classifier.scoreAggregate(df.filter(col("id") > 3), "p", "y")))
      .select("brier").as[Double].head()
    assert(inc == got._2, s"accreted Brier diverged: $inc vs ${got._2}")
    val empty = Classifier.brierScore(df.filter(lit(false)), "p", "y").head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }

  test("grouped calibration == each group's one-shot metric; null groups are excluded") {
    val rows = Seq(
      (1L, "a", 0.91, 1.0), (2L, "a", 0.34, 0.0), (3L, "a", 0.91, 0.0),
      (4L, "b", 0.34, 1.0), (5L, "b", 0.77, 0.0), (6L, "b", 0.77, 1.0),
      (7L, "b", 0.05, 0.0))
    val df = rows.toDF("id", "g", "p", "y")
    val withNull = df.unionByName(
      Seq((9L, Option.empty[String], 0.5, Some(1.0)))
        .toDF("id", "g", "p", "y"))
    def dump(d: org.apache.spark.sql.DataFrame, drop: String) =
      d.drop(drop).orderBy(d.columns.filterNot(_ == drop).map(col): _*)
        .collect().map(_.toSeq).toSeq
    for (g <- Seq("a", "b")) {
      val slice = df.filter(col("g") === g)
      assert(dump(Classifier.prCurveBy(withNull, "g", "p", "y")
          .filter(col("g") === g), "g")
        == dump(Classifier.prCurve(slice, "p", "y"), ""),
        s"grouped PR curve diverged for group $g")
      assert(dump(Classifier.rocAucBy(withNull, "g", "p", "y")
          .filter(col("g") === g), "g")
        == dump(Classifier.rocAuc(slice, "p", "y"), ""),
        s"grouped AUC diverged for group $g")
      assert(dump(Classifier.calibrationErrorBy(withNull, "g", "p", "y")
          .filter(col("g") === g), "g")
        == dump(Classifier.calibrationError(slice, "p", "y"), ""),
        s"grouped ECE diverged for group $g")
    }
    // the null-group row contributed to NO group
    assert(Classifier.prCurveBy(withNull, "g", "p", "y")
      .select("g").distinct().count() == 2)
  }

  test("reliability diagram: exact per-bin confidence/accuracy/gap; fromAggregate is the identity on a raw store") {
    // bin 2 holds 0.20, 0.25; bin 9 holds 0.95, 1.00 (the clamp), 0.95
    val df = Seq((1L, 0.20, 0.0), (2L, 0.25, 1.0), (3L, 0.95, 1.0),
      (4L, 1.00, 1.0), (5L, 0.95, 0.0)).toDF("id", "p", "y")
    val got = Classifier.reliability(df, "p", "y").orderBy("bin")
      .collect().map(_.toSeq).toSeq
    // bin 2: conf = 450000/2e6, acc = 1/2, gap = (1e6-450000)/2e6
    // bin 9: conf = 2.9e6/3e6, acc = 2/3, gap = (2e6-2.9e6)/3e6 < 0
    assert(got == Seq(
      Seq(2L, 2L, 0.225, 0.5, 0.275),
      Seq(9L, 3L, 0.966667, 0.666667, -0.3)), got.toString)
    // an UNFOLDED two-batch aggregate folds first — same diagram
    val raw = Classifier.scoreAggregate(
        df.filter(col("id") <= 2), "p", "y")
      .unionByName(Classifier.scoreAggregate(
        df.filter(col("id") > 2), "p", "y"))
    assert(Classifier.reliabilityFromAggregate(raw).orderBy("bin")
      .collect().map(_.toSeq).toSeq == got,
      "fromAggregate must fold a raw store to the one-shot diagram")
  }

  test("bestThreshold: F-beta argmax over exact counts; rounded ties break to the LARGER threshold; beta moves the pick") {
    // F1 by threshold: .9 -> 2/3, .7 -> 1/2, .5 -> 2/5, .3 -> 2/3 —
    // a planted tie; the conservative rule must pick thr = 0.9
    val df = Seq((1L, 0.9, 1.0), (2L, 0.7, 0.0), (3L, 0.5, 0.0),
      (4L, 0.3, 1.0)).toDF("id", "p", "y")
    val f1 = Classifier.bestThreshold(df, "p", "y").collect()
    assert(f1.map(_.toSeq).toSeq ==
      Seq(Seq(0.9, 1L, 0L, 1L, 0.666667)), f1.mkString)
    // recall-weighted beta = 2: F2(.9) = 5/9 < F2(.3) = 10/12 — the
    // operating point slides down to capture both positives
    val f2 = Classifier.bestThreshold(df, "p", "y", beta = 2.0).collect()
    assert(f2.head.getDouble(0) == 0.3 && f2.head.getLong(1) == 2L,
      f2.mkString)
    // fromAggregate identity + empty input -> empty result
    assert(Classifier.bestThresholdFromAggregate(
      Classifier.scoreAggregate(df, "p", "y")).collect().map(_.toSeq)
      .toSeq == f1.map(_.toSeq).toSeq)
    assert(Classifier.bestThreshold(df.filter(col("id") < 0), "p", "y")
      .collect().isEmpty, "empty input must yield an empty pick")
  }

  test("scoreDrift: zero on identical windows, large under a real shift, symmetric; aggregate-fed drift matches") {
    val lo = Seq((1L, 0.11, 1.0), (2L, 0.12, 0.0), (3L, 0.23, 1.0),
      (4L, 0.08, 0.0)).toDF("id", "p", "y")
    val hi = Seq((5L, 0.91, 1.0), (6L, 0.88, 0.0), (7L, 0.77, 1.0),
      (8L, 0.95, 0.0)).toDF("id", "p", "y")
    def psi(a: org.apache.spark.sql.DataFrame,
            b: org.apache.spark.sql.DataFrame) =
      Classifier.scoreDrift(a, b, "p").collect().head
    val same = psi(lo, lo)
    assert(same.getDouble(2) == 0.0 && same.getLong(0) == 4L,
      s"identical windows must read PSI 0: $same")
    val moved = psi(lo, hi)
    assert(moved.getDouble(2) > 0.25,
      s"a wholesale shift must cross the 0.25 alarm: $moved")
    // symmetric up to the 1e-9 term quantization: each bin's term is
    // algebraically invariant under swap, but ln(p/q) is not bit-
    // exactly -ln(q/p), so a boundary-landing term may quantize 1 off
    assert(math.abs(moved.getDouble(2) - psi(hi, lo).getDouble(2))
      <= 1e-6, "PSI must be symmetric under window swap")
    // label-bearing aggregates feed driftFromAggregates unchanged
    val viaAgg = Classifier.driftFromAggregates(
      Classifier.scoreAggregate(lo, "p", "y"),
      Classifier.scoreAggregate(hi, "p", "y")).collect().head
    assert(viaAgg.toSeq == moved.toSeq,
      s"aggregate-fed drift diverged: $viaAgg vs $moved")
    // the histogram path carries the same loud [0,1] domain guard
    val bad = Seq((9L, 1.5)).toDF("id", "p")
    val e = intercept[Exception] {
      Classifier.scoreDrift(bad, bad, "p").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("score out of [0,1]")),
      s"expected the loud domain guard, got: $e")
  }

  test("KS drift: exact sup-CDF gap — 0 on identical windows, 1 on disjoint supports, hand-checked in between; empty window reads null") {
    def df(xs: Seq[Double]) = xs.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
    def ks(a: Seq[Double], b: Seq[Double]) =
      Classifier.scoreDriftKs(df(a), df(b), "p").collect().head
    val same = ks(Seq(0.1, 0.2, 0.2), Seq(0.1, 0.2, 0.2))
    assert(same.getDouble(2) == 0.0, s"identical windows: $same")
    val disjoint = ks(Seq(0.1, 0.2, 0.2), Seq(0.8, 0.9))
    assert(disjoint.getDouble(2) == 1.0 && disjoint.getLong(0) == 3L &&
      disjoint.getLong(1) == 2L, s"disjoint supports: $disjoint")
    // CDFs: ref jumps to 1/2 at .1, 1 at .5; cur 1/2 at .5, 1 at .9 —
    // the sup gap is exactly 0.5 (at any t in [.1, .5))
    assert(ks(Seq(0.1, 0.5), Seq(0.5, 0.9)).getDouble(2) == 0.5)
    // an empty window leaves KS undefined — null, never a silent 0
    val empty = Classifier.scoreDriftKs(
      df(Seq(0.1)).filter(col("id") < 0), df(Seq(0.5)), "p")
      .collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(2),
      s"empty ref window must read null: $empty")
  }

  test("grouped drift == each group's one-shot PSI; a group seen in only one window still reads; null groups excluded") {
    val ref = Seq((1L, Some("a"), 0.10), (2L, Some("a"), 0.20),
      (3L, Some("b"), 0.90), (4L, Some("b"), 0.80),
      (5L, Option.empty[String], 0.50)).toDF("id", "g", "p")
    val cur = Seq((6L, Some("a"), 0.90), (7L, Some("a"), 0.85))
      .toDF("id", "g", "p")
    val got = Classifier.scoreDriftBy(ref, cur, "g", "p").orderBy("g")
      .collect().map(_.toSeq).toSeq
    assert(got.map(_.head) == Seq("a", "b"),
      s"expected groups a and b only (null excluded): $got")
    for (g <- Seq("a", "b")) {
      val one = Classifier.scoreDrift(
        ref.filter(col("g") === g), cur.filter(col("g") === g), "p")
        .collect().head.toSeq
      assert(got.find(_.head == g).get.tail == one,
        s"grouped PSI diverged for group $g: $got vs $one")
    }
    // group b is ref-only: its PSI reads against the smoothed-empty
    // current window (all-Laplace shares) — finite and positive
    val b = got.find(_.head == "b").get
    assert(b(2) == 0L && b(3).asInstanceOf[Double] > 0.0,
      s"one-sided group must read a finite positive PSI: $b")
    // grouped KS over the same windows: group a == its one-shot KS;
    // the one-sided group b reads ks NULL (undefined, never 0 or 1)
    val ksg = Classifier.scoreDriftKsBy(ref, cur, "g", "p")
      .orderBy("g").collect()
    assert(ksg.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(ksg(0).toSeq.tail == Classifier.scoreDriftKs(
        ref.filter(col("g") === "a"), cur.filter(col("g") === "a"), "p")
      .collect().head.toSeq,
      s"grouped KS diverged for group a: ${ksg(0)}")
    assert(ksg(1).getLong(2) == 0L && ksg(1).isNullAt(3),
      s"one-sided group must read KS null: ${ksg(1)}")
  }

  test("grouped operating points == each group's one-shot bestThreshold") {
    val df = Seq(
      (1L, "a", 0.9, 1.0), (2L, "a", 0.7, 0.0), (3L, "a", 0.5, 0.0),
      (4L, "a", 0.3, 1.0),
      (5L, "b", 0.8, 1.0), (6L, "b", 0.6, 1.0), (7L, "b", 0.2, 0.0))
      .toDF("id", "g", "p", "y")
    val got = Classifier.bestThresholdBy(df, "g", "p", "y")
      .orderBy("g").collect().map(_.toSeq).toSeq
    for (g <- Seq("a", "b")) {
      val one = Classifier.bestThreshold(
        df.filter(col("g") === g), "p", "y").collect().head.toSeq
      assert(got.find(_.head == g).get.tail == one,
        s"grouped operating point diverged for group $g")
    }
    // group a carries the planted (2/3, 2/3) tie -> larger thr 0.9;
    // group b's best keeps both positives at thr 0.6 (F1 = 1.0)
    assert(got(0)(1) == 0.9 && got(1)(1) == 0.6 &&
      got(1)(5) == 1.0, got.toString)
  }

  test("prCurve/rocAuc score-domain contract: out-of-[0,1] scores fail LOUD, never a silent corpus sort") {
    // the bounded-aggregate claim (<= 10^scale + 1 groupBy rows, hence
    // the single-task cumulative window) holds only for probability
    // scores; a raw logit / perplexity column must be rejected at
    // execution, not silently degrade into a one-executor corpus sort
    val logits = Seq((1L, 1.0, 3.7), (2L, 0.0, -2.1), (3L, 1.0, 0.4))
      .toDF("id", "y", "s")
    for (run <- Seq(
        () => Classifier.prCurve(logits, "s", "y").collect(),
        () => Classifier.rocAuc(logits, "s", "y").collect())) {
      val e = intercept[Exception] { run() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("score out of [0,1]")),
        s"expected the loud domain guard, got: $e")
    }
    // boundary values are IN domain — the guard is identity on [0,1]
    val edge = Seq((1L, 1.0, 1.0), (2L, 0.0, 0.0), (3L, 1.0, 0.5))
      .toDF("id", "y", "s")
    assert(Classifier.prCurve(edge, "s", "y").count() == 3)
    assert(Classifier.rocAuc(edge, "s", "y").count() == 1)
  }
}
