package graft

import graft.ops.Mixing

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 300L).map { i =>
    (i, if (i < 100) "a" else if (i < 200) "b" else "c")
  }.toDF("id", "source")

  test("binding source kept whole; others thinned toward the target ratio") {
    val out = Mixing.downsampleToWeights(corpus, "source", "id",
      Map("a" -> 0.8, "b" -> 0.2))
    val by = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // T = min(100/0.8, 100/0.2) = 125 -> a keeps 100% (binding),
    // b keeps 25% (hash-uniform, so approximately)
    assert(by("a") == 100L, s"binding source thinned: $by")
    assert(by("b") > 10 && by("b") < 45, s"b far from 25%: $by")
    assert(!by.contains("c"), "unweighted source must be dropped")
  }

  test("deterministic: same input -> identical kept set") {
    val w = Map("a" -> 0.5, "b" -> 0.5)
    val first = Mixing.downsampleToWeights(corpus, "source", "id", w)
      .select("id").as[Long].collect().sorted.toSeq
    val again = Mixing.downsampleToWeights(corpus, "source", "id", w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(first == again && first.nonEmpty)
  }

  test("temperature sampling: alpha=1 keeps the natural mix whole, alpha=0.5 boosts the tail") {
    // skewed corpus: 400 of 'big', 25 of 'small'
    val skew = ((0L until 400L).map((_, "big")) ++
      (1000L until 1025L).map((_, "small"))).toDF("id", "source")
    // alpha = 1: weights == counts, every source is binding -> all kept
    val nat = Mixing.temperatureSample(skew, "source", "id", alpha = 1.0)
    assert(nat.count() == 425, "alpha=1 must keep the natural mix whole")
    // alpha = 0.5: targets ∝ sqrt(n) -> small (rarer) is binding and
    // kept whole; big thins toward sqrt(400)/sqrt(25) = 4x small
    val temp = Mixing.temperatureSample(skew, "source", "id", alpha = 0.5)
    val by = temp.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(by("small") == 25L, s"binding (rare) source thinned: $by")
    assert(by("big") > 60 && by("big") < 140,
      s"big source far from 4x small (=100): $by")
    // deterministic
    assert(Mixing.temperatureSample(skew, "source", "id", alpha = 0.5)
      .select("id").as[Long].collect().sorted.toSeq ==
      temp.select("id").as[Long].collect().sorted.toSeq)
  }

  private def naiveBudget(df: org.apache.spark.sql.DataFrame,
                          budget: Long) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    df.withColumn("_cum", sum(col("toks")).over(
        Window.partitionBy("g").orderBy(col("q").desc, col("id"))))
      .filter(col("_cum") <= budget).drop("_cum")
  }

  private def budgetCorpus(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, if (i % 3 == 0) "x" else "y",
        // coarse grid ON PURPOSE: quality ties across docs exercise
        // the within-bin (quality desc, id) tie order
        math.rint(rnd.nextDouble() * 50) / 50.0,
        rnd.nextInt(40).toLong)
    }.toDF("id", "g", "q", "toks")
  }

  test("selectToBudget == the naive per-group window, including ties and zero-token docs") {
    for (seed <- Seq(1, 2, 3)) {
      val df = budgetCorpus(seed, 400)
      for (budget <- Seq(0L, 500L, 2000L, 1000000L)) {
        // naiveBelow = 0 forces the two-pass path — the one under test
        val got = Mixing.selectToBudget(df, "g", "q", "toks", "id", budget,
            naiveBelow = 0L)
          .select("id").as[Long].collect().sorted.toSeq
        val want = naiveBudget(df, budget)
          .select("id").as[Long].collect().sorted.toSeq
        assert(got == want,
          s"seed=$seed budget=$budget: got=${got.size} want=${want.size} " +
            s"diff=${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
      }
    }
    // the huge-budget case must keep everything (boundary = -1 path)
    val df = budgetCorpus(4, 100)
    assert(Mixing.selectToBudget(df, "g", "q", "toks", "id", 1000000L,
      naiveBelow = 0L).count() == 100)
  }

  test("selectToBudget: auto-select keeps the result identical across the switch point") {
    // the SAME input through both routes: naiveBelow = 0 forces the
    // two-pass histogram plan, a huge naiveBelow forces the naive
    // window — the kept sets must be identical row for row (this is
    // the contract that makes the crossover threshold a pure
    // performance knob)
    val df = budgetCorpus(6, 400)
    for (budget <- Seq(300L, 1500L)) {
      val twoPass = Mixing.selectToBudget(df, "g", "q", "toks", "id",
        budget, naiveBelow = 0L).select("id").as[Long].collect().sorted.toSeq
      val naive = Mixing.selectToBudget(df, "g", "q", "toks", "id",
        budget, naiveBelow = Long.MaxValue)
        .select("id").as[Long].collect().sorted.toSeq
      assert(twoPass == naive && twoPass.nonEmpty,
        s"budget=$budget: two-pass=${twoPass.size} naive=${naive.size}")
    }
    // and the default routes this small input through the naive window
    // (no _boundary machinery in the plan)
    val defPlan = Mixing.selectToBudget(df, "g", "q", "toks", "id", 500L)
      .queryExecution.executedPlan.toString
    assert(!defPlan.contains("_boundary"),
      s"small input did not route naive under the default:\n$defPlan")
  }

  test("selectToBudget: corpus never sorts globally — only the boundary bin pays a window") {
    val df = budgetCorpus(5, 400)
    val plan = Mixing.selectToBudget(df, "g", "q", "toks", "id", 500L,
        naiveBelow = 0L)
      .queryExecution.executedPlan.toString
    // the window must sit under a boundary-bin filter, never over the
    // whole corpus: assert the plan's Window input carries the _b
    // equality filter
    assert(plan.contains("Window"), "expected the boundary window")
    val windowIdx = plan.indexOf("Window")
    assert(plan.indexOf("_boundary", windowIdx) >= 0,
      s"boundary filter not below the window:\n$plan")
    // null contract: null group/quality/tokens rows are excluded
    val withNulls = df.unionByName(Seq(
      (9001L, null.asInstanceOf[String], 0.5, 3L),
      (9002L, "x", Double.NaN, 3L)).toDF("id", "g", "q", "toks"))
      .withColumn("q", org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("id") === 9002L,
          org.apache.spark.sql.functions.lit(null)).otherwise(
          org.apache.spark.sql.functions.col("q")))
    val kept = Mixing.selectToBudget(withNulls, "g", "q", "toks", "id", 500L)
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(9001L) && !kept.contains(9002L))
  }

  test("dyadicPow: bit-equal to the correctly-rounded sqrt chain; None off the lattice") {
    // each dyadic alpha must reproduce the EXACT composition an oracle
    // replays — compare against hand-written chains, not math.pow
    for (n <- Seq(7.0, 400.0, 123456.0)) {
      assert(Mixing.dyadicPow(n, 0.5).contains(math.sqrt(n)))
      assert(Mixing.dyadicPow(n, 0.25).contains(math.sqrt(math.sqrt(n))))
      assert(Mixing.dyadicPow(n, 0.75).contains(
        math.sqrt(n) * math.sqrt(math.sqrt(n))))
      assert(Mixing.dyadicPow(n, 0.375).contains(
        math.sqrt(math.sqrt(n)) * math.sqrt(math.sqrt(math.sqrt(n)))))
      assert(Mixing.dyadicPow(n, 1.0).contains(n))
    }
    // non-dyadic values (0.3 is an infinite binary fraction) fall off
    // the lattice -> None -> temperatureSample falls back to pow
    assert(Mixing.dyadicPow(400.0, 0.3).isEmpty)
    assert(Mixing.dyadicPow(400.0, 1.0 / 3.0).isEmpty)
  }

  test("temperature sampling at alpha=0.25 flattens harder than 0.5; rare source stays whole") {
    val skew = ((0L until 400L).map((_, "big")) ++
      (1000L until 1025L).map((_, "small"))).toDF("id", "source")
    val t25 = Mixing.temperatureSample(skew, "source", "id", alpha = 0.25)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // targets ∝ n^0.25: big/small = (400/25)^0.25 ≈ 2x (vs 4x at 0.5)
    assert(t25("small") == 25L, s"binding (rare) source thinned: $t25")
    assert(t25("big") > 25 && t25("big") < 80,
      s"big source far from 2x small (=50): $t25")
  }

  test("per-group budgets == per-group naive windows; waterFill allocates exactly") {
    import org.apache.spark.sql.functions._
    val df = budgetCorpus(7, 400) // groups x (2/3) and y (1/3)
    val budgets = Map("x" -> 700L, "y" -> 2500L)
    for (nb <- Seq(0L, Long.MaxValue)) { // both plans, same rows
      val got = Mixing.selectToBudgets(df, "g", "q", "toks", "id",
          budgets, naiveBelow = nb)
        .select("id").as[Long].collect().sorted.toSeq
      val want = df.withColumn("_c", sum(col("toks")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")
            .orderBy(col("q").desc, col("id"))))
        .filter(col("_c") <= when(col("g") === "x", 700L).otherwise(2500L))
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == want && got.nonEmpty, s"naiveBelow=$nb")
    }
    // a group absent from the budgets map is dropped wholesale
    val dropped = Mixing.selectToBudgets(df, "g", "q", "toks", "id",
      Map("x" -> 100000L), naiveBelow = 0L)
    assert(dropped.filter(col("g") === "y").count() == 0)
    // waterFill: capped groups keep their supply, the rest split evenly
    val alloc = Mixing.waterFill(
      Map("a" -> 100L, "b" -> 5000L, "c" -> 5000L), total = 4100L)
    assert(alloc == Map("a" -> 100L, "b" -> 2000L, "c" -> 2000L), s"$alloc")
    // total beyond supply: everyone keeps everything
    assert(Mixing.waterFill(Map("a" -> 10L, "b" -> 20L), 1000L) ==
      Map("a" -> 10L, "b" -> 20L))
    // indivisible remainder goes one token each to the first groups
    val odd = Mixing.waterFill(Map("p" -> 100L, "q" -> 100L), 101L)
    assert(odd("p") + odd("q") == 101L && (odd("p") - odd("q")).abs <= 1,
      s"$odd")
    // zero total: all zeros, every group present
    assert(Mixing.waterFill(Map("a" -> 5L), 0L) == Map("a" -> 0L))
  }

  test("waterFill composes with selectToBudgets: kept tokens respect every budget and the global target") {
    import org.apache.spark.sql.functions._
    val df = budgetCorpus(8, 300)
    val supply = df.groupBy("g").agg(sum("toks").as("n"))
      .as[(String, Long)].collect().toMap
    val total = 2000L
    val budgets = Mixing.waterFill(supply, total)
    assert(budgets.values.sum == math.min(total, supply.values.sum))
    val kept = Mixing.selectToBudgets(df, "g", "q", "toks", "id",
      budgets, naiveBelow = 0L)
    val keptTokens = kept.groupBy("g").agg(sum("toks").as("n"))
      .as[(String, Long)].collect().toMap
    for ((g, n) <- keptTokens)
      assert(n <= budgets(g), s"group $g kept $n > budget ${budgets(g)}")
    // doc granularity can undershoot a budget, never overshoot the target
    assert(keptTokens.values.sum <= total)
    assert(keptTokens.values.sum > 0)
  }

  test("replicateEpochs: full copies + deterministic fractional draw; dense epoch indices; absent sources drop") {
    import org.apache.spark.sql.functions._
    val df = ((0L until 100L).map((_, "a")) ++
      (100L until 200L).map((_, "b")) ++
      (200L until 250L).map((_, "x"))).toDF("id", "src")
    val out = Mixing.replicateEpochs(df, "src", "id",
      Map("a" -> 230, "b" -> 50))
    assert(out.filter(col("src") === "x").isEmpty,
      "a source absent from the epoch map must drop wholesale")
    val byId = out.groupBy("id", "src").count()
      .as[(Long, String, Long)].collect()
    // copy counts match the integer-percent rule EXACTLY per doc
    for ((id, s, n) <- byId) {
      val pct = if (s == "a") 230 else 50
      val want = pct / 100 +
        (if ((id * 2654435761L) % 100 < pct % 100) 1 else 0)
      assert(n == want, s"doc $id ($s): got $n copies, want $want")
    }
    // 'b' at 0.5 epochs keeps roughly half, never more than one copy
    val bIds = byId.filter(_._2 == "b")
    assert(bIds.forall(_._3 == 1L) &&
      bIds.length > 25 && bIds.length < 75, s"b kept ${bIds.length}")
    // epoch indices are dense 0..cp-1
    val sample = byId.filter(_._2 == "a").head
    val eps = out.filter(col("id") === sample._1)
      .select("epoch").as[Int].collect().sorted.toSeq
    assert(eps == (0 until sample._3.toInt), s"epochs not dense: $eps")
    // deterministic across invocations and partitionings
    val again = Mixing.replicateEpochs(df.repartition(7), "src", "id",
        Map("a" -> 230, "b" -> 50))
      .groupBy("id", "src").count().as[(Long, String, Long)]
      .collect().toSet
    assert(again == byId.toSet, "replication must be deterministic")
  }

  test("selectToBudgetWaterFill == waterFill-then-selectToBudgets; caps and remainder both exercised") {
    import org.apache.spark.sql.functions._
    // three groups: 'a' tiny (caps below the even share), 'b'/'c' big
    // (split the rest), and a total that leaves an odd remainder
    val df = (
      (0L until 5L).map(i => (i, "a", 1.0 - i * 0.01, 10L)) ++ // supply 50
      (100L until 180L).map(i => (i, "b", 1.0 - (i - 100) * 0.01, 25L)) ++
      (200L until 280L).map(i => (i, "c", 1.0 - (i - 200) * 0.01, 25L))
    ).toDF("id", "g", "q", "toks")
    val total = 1101L // a caps at 50; b,c get (1051/2 = 525) + 1 rem
    val supply = Map("a" -> 50L, "b" -> 2000L, "c" -> 2000L)
    val budgets = Mixing.waterFill(supply, total)
    assert(budgets == Map("a" -> 50L, "b" -> 526L, "c" -> 525L),
      s"cap+remainder shape broke: $budgets")
    val composed = Mixing.selectToBudgets(df, "g", "q", "toks", "id",
        budgets, naiveBelow = 0L)
      .select("id").as[Long].collect().sorted.toSeq
    val direct = Mixing.selectToBudgetWaterFill(df, "g", "q", "toks",
        "id", total, naiveBelow = 0L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(direct == composed && direct.nonEmpty,
      "selectToBudgetWaterFill diverged from the explicit composition")
    // null-group rows are excluded from supply AND selection alike
    val withNull = df.unionByName(
      Seq((900L, null.asInstanceOf[String], 0.99, 1000000L))
        .toDF("id", "g", "q", "toks"))
    val direct2 = Mixing.selectToBudgetWaterFill(withNull, "g", "q",
        "toks", "id", total, naiveBelow = 0L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(direct2 == direct,
      "a null-group row perturbed the measured supply or the selection")
  }

  test("DSIR: target-like docs outweigh off-target; resample keeps the top fraction under both hashes") {
    import org.apache.spark.sql.functions._
    val a = "alpha beta gamma delta epsilon"
    val b = "omega psi chi phi upsilon"
    val raw = ((0L until 40L).map((_, a)) ++
      (100L until 140L).map((_, b))).toDF("doc_id", "text")
    val target = (1000L until 1010L).map((_, a)).toDF("doc_id", "text")
    // weights: every target-vocab doc strictly above every off-target doc
    val w = Mixing.importanceWeights(raw, target, "text", "doc_id",
      portable = true).as[(Long, Long, Double)].collect()
    val wa = w.filter(_._1 < 40L).map(_._3).distinct.toSeq
    val wb = w.filter(_._1 >= 100L).map(_._3).distinct.toSeq
    assert(wa.size == 1 && wb.size == 1 && wa.head > wb.head,
      s"weights not separated: a=$wa b=$wb")
    // frac = 0.5 keeps exactly the target-like half — under BOTH the
    // portable polynomial bucket and the native xxhash bucket (the
    // numeric weights differ, the selection must not)
    for (portable <- Seq(true, false)) {
      val kept = Mixing.importanceResample(raw, target, "text", "doc_id",
          frac = 0.5, portable = portable)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == (0L until 40L).toSet, s"portable=$portable: $kept")
    }
    // empty raw corpus: empty result, no NPE on the null threshold
    assert(Mixing.importanceResample(raw.filter(lit(false)), target,
      "text", "doc_id", frac = 0.5).count() == 0)
    // model/apply split: a model fit ONCE scores an unseen micro-batch
    // map-side (the streaming stance) — target-vocab batch doc above
    // the off-vocab one; fully-unseen words carry no features
    val model = Mixing.importanceModel(raw, target, "text",
      portable = true)
    val batch = Seq((7000L, a), (7001L, b), (7002L, "zzz yyy xxx www"))
      .toDF("doc_id", "text")
    val scored = Mixing.applyImportanceWeights(batch, model, "text",
        "doc_id", portable = true)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scored(7000L) > scored(7001L))
    assert(!scored.contains(7002L),
      "unseen-vocab doc must carry no features, not a fake score")
  }

  test("DSIR logweight fold is canonical: an exact .5e-6 boundary sum is partition-invariant and rounds HALF_UP") {
    import org.apache.spark.sql.functions._
    // hand-built model whose quantized contributions sum to EXACTLY
    // 500 scaled-long units = 5e-7 — the .5e-6 HALF_UP boundary. A
    // double fold could land an ulp below depending on merge order
    // (the carried q_dsir residual risk); the scaled-long fold sums
    // integers, so the boundary value — and its HALF_UP round to
    // 1e-6 — is bit-identical under any partitioning.
    val words = Seq("wa", "wb", "wc", "wd")
    val doc = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val bks = words.toDF("w")
      .select(Mixing.portableWordBucket(col("w"), 256).as("b"))
      .as[Long].collect().distinct.toSeq
    // every bucket our words land in carries lw = 1.25e-7 -> lwq = 125;
    // 4 word occurrences x 125 = 500 exactly, however they collide
    val model = bks.map(b => (b, 1.25e-7)).toDF("_b", "_lw")
    def lwOf(df: org.apache.spark.sql.DataFrame): Double =
      Mixing.applyImportanceWeights(df, model, "text", "doc_id",
          portable = true)
        .select("logweight").as[Double].head()
    val a = lwOf(doc)
    val b = lwOf(doc.repartition(13))
    assert(a == 1.0e-6, s"boundary sum must round HALF_UP to 1e-6: $a")
    assert(a == b, s"partitioning moved a boundary logweight: $a vs $b")
  }

  test("driver-collect guards fail loud on high-cardinality misuse") {
    import org.apache.spark.sql.functions._
    // a URL-like source column: > maxSources distinct values must fail
    // FAST in the bounded collect, not OOM the driver
    val urls = spark.range(Mixing.maxSources + 1).select(
      col("id"), concat(lit("https://site"), col("id"), lit(".com"))
        .as("source"))
    val e1 = intercept[IllegalArgumentException] {
      Mixing.downsampleToWeights(urls, "source", "id",
        Map("https://site0.com" -> 1.0))
    }
    assert(e1.getMessage.contains("distinct values"), e1.getMessage)
    // same contract on selectToBudget's histogram groups
    val g = spark.range(Mixing.maxSources + 1).select(
      col("id"), concat(lit("g"), col("id")).as("g"),
      lit(0.5).as("q"), lit(3L).as("toks"))
    val e2 = intercept[IllegalArgumentException] {
      Mixing.selectToBudget(g, "g", "q", "toks", "id", 100L,
        naiveBelow = 0L)
    }
    assert(e2.getMessage.contains("distinct groups"), e2.getMessage)
  }
}
